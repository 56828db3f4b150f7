"""Exact Jaccard-threshold join vs a brute-force reference: random
corpora with duplicates, whitespace-only docs, and threshold edges."""

from __future__ import annotations

import random

import numpy as np
import pyarrow as pa
import pytest

from patito_ray.functions.setjoin import jaccard_threshold_pairs


def _re2_token_set(s: str) -> frozenset[str]:
    out, cur = [], []
    for ch in s.lower():
        if ch in "\t\n\f\r ":
            if cur:
                out.append("".join(cur))
                cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return frozenset(out)


def _brute(texts: dict[int, str], t: float) -> dict[tuple[int, int], float]:
    sets = {i: _re2_token_set(s) for i, s in texts.items()}
    out = {}
    ids = sorted(texts)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = ids[i], ids[j]
            sa, sb = sets[a], sets[b]
            if not sa or not sb:
                continue  # token-empty docs never pair (documented)
            jac = len(sa & sb) / len(sa | sb)
            if jac >= t:
                out[(a, b)] = jac
    return out


def _collect(out) -> dict[tuple[int, int], float]:
    return {(r["a"], r["b"]): r["jaccard"] for r in out.take_all()}


@pytest.mark.parametrize("threshold", [0.5, 0.8, 1.0])
def test_jaccard_join_matches_brute_force(ray_session, threshold):
    import ray.data as rd

    rng = random.Random(13)
    vocab = [f"w{k}" for k in range(40)]
    texts = {}
    for i in range(120):
        n = rng.randint(1, 12)
        texts[i] = " ".join(rng.choice(vocab) for _ in range(n))
    # exact duplicates (identity groups) and whitespace-only docs
    texts[200] = texts[0]
    texts[201] = texts[0]
    texts[202] = "   "
    texts[203] = "\t\t"
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(sorted(texts), type=pa.int64()),
                "text": [texts[k] for k in sorted(texts)],
            }
        )
    ).repartition(5)
    got = _collect(jaccard_threshold_pairs(ds, threshold=threshold))
    exp = _brute(texts, threshold)
    assert set(got) == set(exp)
    for k, v in exp.items():
        assert abs(got[k] - v) < 1e-12


def test_jaccard_join_bigram_sets(ray_session):
    """shingle_n=2: word-bigram set jaccard, checked on a planted pair."""
    import ray.data as rd

    a = "the quick brown fox jumps over the lazy dog again today"
    b = "the quick brown fox jumps over the lazy dog again tonight"
    c = "completely different words everywhere nothing shared at all"
    ds = rd.from_arrow(
        pa.table(
            {"doc_id": pa.array([1, 2, 3], type=pa.int64()), "text": [a, b, c]}
        )
    )
    got = _collect(jaccard_threshold_pairs(ds, threshold=0.5, shingle_n=2))
    assert set(got) == {(1, 2)}
    # 10 bigrams each ("the quick", ..., "again today/tonight"), 9 shared
    assert abs(got[(1, 2)] - 9 / 11) < 1e-12


def test_jaccard_join_threshold_guard(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array([1], type=pa.int64()), "text": ["x"]})
    )
    with pytest.raises(ValueError, match="threshold"):
        jaccard_threshold_pairs(ds, threshold=0.0)


def test_jaccard_join_preflight_raises_on_dense_corpus(ray_session):
    """Round-5 guard: a dense tiny-vocab corpus (every doc shares the
    same few tokens, candidates ~ C(n,2)) must raise the pre-flight
    ValueError pointing at the MinHash path BEFORE any pair forms —
    while an explicit max_candidates=None opt-in still runs exactly."""
    import ray.data as rd

    n = 60  # C(60,2) = 1770 candidates per shared prefix token
    # each doc distinct (identity_groups would compact exact dups)
    texts = [f"alpha beta gamma delta u{i}" for i in range(n)]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n), type=pa.int64()),
                "text": pa.array(texts),
            }
        )
    )
    with pytest.raises(ValueError, match="minhash"):
        jaccard_threshold_pairs(ds, threshold=0.8, max_candidates=100)

    # opt-out still exact: at threshold 0.6 every pair shares 4 of 6
    # tokens (jaccard 2/3), so all C(n,2) pairs qualify
    out = _collect(
        jaccard_threshold_pairs(ds, threshold=0.6, max_candidates=None)
    )
    assert len(out) == n * (n - 1) // 2
    assert all(abs(j - 2.0 / 3.0) < 1e-9 for j in out.values())


def test_jaccard_join_preflight_sparse_corpus_unaffected(ray_session):
    """Rare-token regime: disjoint vocabularies produce zero colliding
    prefixes, so the default budget never triggers."""
    import ray.data as rd

    n = 40
    texts = [f"u{i}a u{i}b u{i}c u{i}d" for i in range(n)]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n), type=pa.int64()),
                "text": pa.array(texts),
            }
        )
    )
    out = _collect(jaccard_threshold_pairs(ds, threshold=0.8))
    assert out == {}


def test_jaccard_join_preflight_respects_max_bucket(ray_session):
    """A finite max_bucket already bounds enumeration, so the capped
    estimate must not spuriously trip the default budget (review
    finding r5): the same dense corpus that raises uncapped runs fine
    with a tight per-bucket cap."""
    import ray.data as rd

    n = 60
    texts = [f"alpha beta gamma delta u{i}" for i in range(n)]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n), type=pa.int64()),
                "text": pa.array(texts),
            }
        )
    )
    with pytest.raises(ValueError, match="minhash"):
        jaccard_threshold_pairs(ds, threshold=0.6, max_candidates=100)
    # capped mode: estimate uses min(count, max_bucket) and passes
    out = _collect(
        jaccard_threshold_pairs(
            ds, threshold=0.6, max_bucket=5, max_candidates=100
        )
    )
    assert isinstance(out, dict)  # ran (lossy by contract, no raise)
