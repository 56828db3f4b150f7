"""Hashed-n-gram logistic regression: feature correctness vs a python
reference, learnability on separable data, driver-vs-distributed
training parity, and guards."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from patito_ray.functions.classifier import (
    featurize,
    hashed_gram_features,
    score_logreg,
    train_logreg,
)


def _ref_features(texts: list[str], dim: int) -> list[dict[int, float]]:
    """Pure-python unigram+bigram hashed counts, L2-normalized."""
    from patito_ray.state.sketches import hash64

    out = []
    for t in texts:
        toks = [w for w in __import__("re").split(r"[\t\n\f\r ]+", t) if w]
        h = hash64(pa.array(toks, type=pa.string())) if toks else np.array([], dtype=np.uint64)
        feats: dict[int, float] = {}
        for v in h:
            feats[int(v % np.uint64(dim))] = feats.get(int(v % np.uint64(dim)), 0) + 1
        for a, b in zip(h[:-1], h[1:]):
            k = int(((a * np.uint64(0x9E3779B97F4A7C15)) ^ b) % np.uint64(dim))
            feats[k] = feats.get(k, 0) + 1
        norm = float(np.sqrt(sum(v * v for v in feats.values()))) or 1.0
        out.append({k: v / norm for k, v in feats.items()})
    return out


def test_hashed_gram_features_match_reference():
    texts = ["a b a", "", "solo", "x  y\tz", None]
    dim = 256
    par, col, val, n = hashed_gram_features(
        pa.array(texts, type=pa.string()), dim=dim
    )
    assert n == 5
    got: list[dict[int, float]] = [{} for _ in range(n)]
    for p, c, v in zip(par, col, val):
        got[p][int(c)] = float(v)
    want = _ref_features([t or "" for t in texts], dim)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert set(g) == set(w)
        for k in g:
            assert g[k] == pytest.approx(w[k])


def _toy_corpus(n: int = 200) -> tuple[pa.Table, int]:
    """Separable: positives speak vocab {spam,junk,ads}, negatives
    {news,facts,data} — plus shared filler tokens."""
    rng = np.random.default_rng(7)
    texts, ys = [], []
    for i in range(n):
        y = i % 2
        vocab = ["spam", "junk", "ads"] if y else ["news", "facts", "data"]
        words = list(rng.choice(vocab, size=8)) + ["the", "and"]
        rng.shuffle(words)
        texts.append(" ".join(words))
        ys.append(y)
    return pa.table(
        {"doc_id": list(range(n)), "text": texts, "y01": pa.array(ys, pa.int8())}
    ), n


def test_train_separable_reaches_full_accuracy(ray_session):
    import ray.data as rd

    tab, n = _toy_corpus()
    ds = rd.from_arrow(tab).repartition(4)
    dim = 1 << 12
    feats = featurize(ds, "text", "y01", dim=dim)
    w = train_logreg(feats, dim=dim)
    scored = score_logreg(ds, w, "text", dim=dim).take_all()
    acc = np.mean([(r["score"] > 0.5) == bool(r["y01"]) for r in scored])
    assert acc == 1.0


def test_driver_vs_distributed_parity(ray_session):
    import ray.data as rd

    tab, _ = _toy_corpus(80)
    ds = rd.from_arrow(tab).repartition(3)
    dim = 1 << 10
    feats = featurize(ds, "text", "y01", dim=dim)
    w_driver = train_logreg(feats, dim=dim, epochs=15)
    w_dist = train_logreg(feats, dim=dim, epochs=15, driver_limit_bytes=0)
    # same math; partial-gradient sums may reorder float additions
    assert np.allclose(w_driver, w_dist, atol=1e-12)


def test_empty_corpus_rejected_and_empty_text_scored(ray_session):
    import ray.data as rd

    empty = rd.from_arrow(
        pa.table(
            {"text": pa.array([], pa.string()), "y01": pa.array([], pa.int8())}
        )
    )
    with pytest.raises(ValueError, match="empty"):
        train_logreg(featurize(empty, "text", "y01", dim=64), dim=64)

    tab, _ = _toy_corpus(40)
    ds = rd.from_arrow(tab)
    dim = 1 << 10
    w = train_logreg(featurize(ds, "text", "y01", dim=dim), dim=dim, epochs=5)
    blank = rd.from_arrow(pa.table({"text": ["", None]}))
    out = score_logreg(blank, w, "text", dim=dim).take_all()
    # featureless docs get the bias-only score, one per row
    assert len(out) == 2 and out[0]["score"] == out[1]["score"]


def test_ngrams_above_two_rejected():
    with pytest.raises(ValueError, match="ngrams"):
        hashed_gram_features(pa.array(["a b c"]), dim=64, ngrams=3)
