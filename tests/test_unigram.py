"""Unigram-LM tokenizer: hand-computed Viterbi cases, an independent
pure-Python reference implementation (parity on vocab, log-probs and
encodings), planted learnability, and local-vs-distributed parity."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pytest

from patito_ray.functions.unigram import (
    _viterbi,
    train_unigram,
    unigram_encode_dataset,
)

# ---------------------------------------------------------------------------
# independent reference implementation (plain dicts + recursion, no
# shared kernels with the library module)
# ---------------------------------------------------------------------------


def _ref_viterbi(word, logp, max_len):
    import functools

    @functools.lru_cache(maxsize=None)
    def go(i):
        # returns (score, n_pieces, pieces) for word[i:]
        if i == len(word):
            return (0.0, 0, ())
        best = None
        for j in range(i + 1, min(len(word), i + max_len) + 1):
            p = word[i:j]
            if p not in logp:
                continue
            rest = go(j)
            if rest is None:
                continue
            cand = (logp[p] + rest[0], 1 + rest[1], (p,) + rest[2])
            if best is None or (cand[0], -cand[1]) > (best[0], -best[1]) or (
                cand[0] == best[0] and cand[1] == best[1] and cand[2] < best[2]
            ):
                best = cand
        return best

    out = go(0)
    return None if out is None else list(out[2])


def _ref_train(word_counts, vocab_size, seed_size, max_len, rounds, frac):
    seed = {}
    for w, c in word_counts.items():
        for i in range(len(w)):
            for j in range(i + 1, min(len(w), i + max_len) + 1):
                seed[w[i : j]] = seed.get(w[i : j], 0) + c
    chars = sorted(p for p in seed if len(p) == 1)
    multi = sorted(
        ((p, c) for p, c in seed.items() if len(p) > 1),
        key=lambda x: (-x[1], x[0]),
    )[: max(0, seed_size - len(chars))]
    counts = {c: seed[c] for c in chars} | dict(multi)

    def norm(d):
        tot = sum(d.values())
        return {p: math.log(c) - math.log(tot) for p, c in d.items() if c > 0}

    logp = norm(counts)
    target = max(0, vocab_size - len(chars))
    for _ in range(max(1, rounds)):
        exp = {}
        for w, c in word_counts.items():
            segs = _ref_viterbi(w, logp, max_len)
            if segs is None:
                continue
            for p in segs:
                exp[p] = exp.get(p, 0) + c
        nc = {ch: max(1, exp.get(ch, 0)) for ch in chars}
        cm = sorted(
            ((p, exp.get(p, 0)) for p in logp if len(p) > 1 and exp.get(p, 0) > 0),
            key=lambda x: (-x[1], x[0]),
        )
        if len(cm) > target:
            cm = cm[: max(target, int(len(cm) * frac))]
        nc.update(dict(cm))
        logp = norm(nc)
    fin = sorted(
        ((p, lp) for p, lp in logp.items() if len(p) > 1),
        key=lambda x: (-x[1], x[0]),
    )[:target]
    pieces = chars + [p for p, _ in fin]
    return {p: logp[p] for p in pieces}


# ---------------------------------------------------------------------------


def test_viterbi_hand_computed():
    # logp chosen so "ab" beats "a"+"b": -1 > -1.5 + -1.5
    logp = {"a": -1.5, "b": -1.5, "ab": -1.0}
    assert _viterbi("aab", logp, 2) == ["a", "ab"]
    assert _viterbi("abab", logp, 2) == ["ab", "ab"]
    # tie on score -> fewer pieces: make "ab" == "a"+"b" exactly
    logp2 = {"a": -1.0, "b": -1.0, "ab": -2.0}
    assert _viterbi("ab", logp2, 2) == ["ab"]
    # unknown character -> unsegmentable
    assert _viterbi("axb", logp, 2) is None


def _corpus_table(texts):
    return pa.table({"text": pa.array(texts, pa.string())})


def test_reference_parity(ray_session):
    import ray.data as rd

    texts = (
        ["the banana stand"] * 20
        + ["banana bread recipe"] * 12
        + ["stand up and read the recipe"] * 5
        + ["bread and water"] * 7
    )
    ds = rd.from_arrow(_corpus_table(texts))
    model = train_unigram(
        ds, vocab_size=40, seed_size=300, max_piece_len=6, em_rounds=3
    )
    got = dict(
        zip(model.column("piece").to_pylist(), model.column("logp").to_pylist())
    )

    # independent reference over the same word counts
    wc = {}
    for t in texts:
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1
    want = _ref_train(wc, 40, 300, 6, 3, 0.75)
    assert set(got) == set(want)
    for p in got:
        assert got[p] == pytest.approx(want[p], abs=1e-12), p

    # encodings agree with the reference Viterbi
    enc = unigram_encode_dataset(
        rd.from_arrow(_corpus_table(["banana bread"])), model, ids=True
    ).take_all()[0]["piece_ids"]
    id_of = dict(
        zip(model.column("piece").to_pylist(), model.column("id").to_pylist())
    )
    ref_ids = []
    for w in "banana bread".split():
        ref_ids.extend(id_of[p] for p in _ref_viterbi(w, want, 6))
    assert list(enc) == ref_ids


def test_learnability_frequent_words_become_pieces(ray_session):
    import ray.data as rd

    texts = ["tokenizer"] * 50 + ["token maker"] * 3
    model = train_unigram(
        rd.from_arrow(_corpus_table(texts)),
        vocab_size=30,
        seed_size=500,
        max_piece_len=9,
        em_rounds=3,
    )
    pieces = set(model.column("piece").to_pylist())
    assert "tokenizer" in pieces  # the dominant word is one piece
    enc = unigram_encode_dataset(
        rd.from_arrow(_corpus_table(["tokenizer"])), model, ids=False,
        out_col="n",
    ).take_all()
    assert enc[0]["n"] == 1


def test_local_vs_distributed_parity(ray_session):
    import ray.data as rd

    texts = ["alpha beta gamma"] * 9 + ["beta gamma delta"] * 6
    ds = rd.from_arrow(_corpus_table(texts))
    local = train_unigram(ds, vocab_size=25, em_rounds=2)
    dist = train_unigram(ds, vocab_size=25, em_rounds=2, _force_distributed=True)
    assert local.column("piece").to_pylist() == dist.column("piece").to_pylist()
    lv = local.column("logp").to_numpy(zero_copy_only=False)
    dv = dist.column("logp").to_numpy(zero_copy_only=False)
    assert np.array_equal(lv, dv)


def test_unknown_chars_skipped_in_encode(ray_session):
    import ray.data as rd

    model = train_unigram(
        rd.from_arrow(_corpus_table(["abc abc ab"])), vocab_size=10, em_rounds=1
    )
    out = unigram_encode_dataset(
        rd.from_arrow(_corpus_table(["abXc"])), model, ids=True
    ).take_all()[0]["piece_ids"]
    id_of = dict(
        zip(model.column("piece").to_pylist(), model.column("id").to_pylist())
    )
    # X is unknown: encodable characters survive
    assert all(i in set(id_of.values()) for i in out)
    assert len(out) >= 2
