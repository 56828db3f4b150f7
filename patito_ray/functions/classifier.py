"""Hashed-n-gram linear classifier (fastText-style) with distributed
training — the model-based quality/domain filter of a training-data
pipeline (reference has no counterpart; public technique: Joulin et
al., "Bag of Tricks for Efficient Text Classification", 2017, plus the
hashing trick of Weinberger et al., 2009).

Execution shape (100-TB framing):
- featurize ONCE into a narrow materialized Dataset (y, cols, vals):
  tokenization and hashing never repeat across epochs. At crawl scale
  you train on a deterministic sample
  (``sampling.deterministic_sample``) — a linear classifier saturates
  at millions of docs — then score the FULL corpus in one streaming
  pass; only the sample is ever materialized.
- each epoch is one map_batches computing a dense partial gradient per
  batch (vectorized scatter-adds, no per-row Python) against the
  current weights, broadcast ONCE per epoch via ray.put; the driver
  sums the (dim+1)-float partials and takes the full-batch GD step.
  Weights are dim*8 bytes (default 2^16 -> 512 KiB): broadcast-cheap.
- scoring is stateless: broadcast final weights, per-batch sparse
  matvec + sigmoid, stream to the sink.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from patito_ray.state.sketches import hash64

_SIG_CLIP = 30.0  # sigmoid saturates: exp beyond +-30 over/underflows float64


def _sigmoid(z: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-np.clip(z, -_SIG_CLIP, _SIG_CLIP)))


def hashed_gram_features(
    text: "pa.Array | pa.ChunkedArray",
    dim: int = 1 << 16,
    ngrams: int = 2,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Per-doc L2-normalized hashed token-gram counts (unigrams, plus
    bigrams when ngrams=2) in flat CSR-ish form -> (parent_row, col,
    val, n_docs), sorted by (parent_row, col). One RE2 split, one flat
    hash pass per gram order, one global lexsort + run-length dedup —
    no per-doc Python."""
    if ngrams not in (1, 2):
        raise ValueError(
            f"ngrams must be 1 or 2, got {ngrams} (higher orders are "
            "not implemented — rejecting rather than silently capping)"
        )
    from patito_ray.functions.tfidf import re2_split_tokens

    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    if pa.types.is_large_string(text.type):
        text = pc.cast(text, pa.string())
    # the shared RE2-exact tokenizer (CLAUDE.md tokenization invariant:
    # one kernel, not per-module copies that can drift)
    flat, parents, n_docs = re2_split_tokens(pc.fill_null(text, ""))
    h1 = hash64(flat)
    feats_idx = [h1 % np.uint64(dim)]
    feats_parent = [parents]
    if ngrams >= 2 and len(h1) > 1:
        # bigram hash: mix adjacent token hashes, valid only where both
        # tokens share a doc
        same = parents[1:] == parents[:-1]
        pair = (h1[:-1] * np.uint64(0x9E3779B97F4A7C15)) ^ h1[1:]
        feats_idx.append(pair[same] % np.uint64(dim))
        feats_parent.append(parents[:-1][same])
    idx = np.concatenate(feats_idx).astype(np.int64)
    par = np.concatenate(feats_parent).astype(np.int64)
    if len(par) == 0:
        return (
            np.array([], dtype=np.int64),
            np.array([], dtype=np.int64),
            np.array([], dtype=np.float64),
            n_docs,
        )
    order = np.lexsort((idx, par))
    idx, par = idx[order], par[order]
    # run-length count of duplicate (doc, feature) pairs
    new = np.ones(len(par), dtype=bool)
    new[1:] = (par[1:] != par[:-1]) | (idx[1:] != idx[:-1])
    starts = np.nonzero(new)[0]
    cnt = np.diff(np.concatenate([starts, [len(par)]])).astype(np.float64)
    par_u, idx_u = par[starts], idx[starts]
    # L2-normalize per doc
    norm = np.sqrt(np.bincount(par_u, weights=cnt * cnt, minlength=n_docs))
    val = cnt / norm[par_u]
    return par_u, idx_u, val, n_docs


def featurize(
    ds: Any,
    text_col: str,
    label_col: str,
    dim: int = 1 << 16,
    ngrams: int = 2,
) -> Any:
    """One-time feature pass -> materialized narrow Dataset
    (y int8, cols list<int32>, vals list<float32>). Labels must be
    0/1."""

    def fn(batch: pa.Table) -> pa.Table:
        par, col, val, n = hashed_gram_features(
            batch.column(text_col), dim, ngrams
        )
        counts = np.bincount(par, minlength=n) if len(par) else np.zeros(n, int)
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        off32 = pa.array(offsets, type=pa.int64()).cast(pa.int32())
        return pa.table(
            {
                "y": pc.cast(batch.column(label_col), pa.int8()),
                "cols": pa.ListArray.from_arrays(
                    off32, pa.array(col.astype(np.int32), type=pa.int32())
                ),
                "vals": pa.ListArray.from_arrays(
                    off32, pa.array(val.astype(np.float32), type=pa.float32())
                ),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None).materialize()


def _csr(batch: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    cols = batch.column("cols")
    vals = batch.column("vals")
    if isinstance(cols, pa.ChunkedArray):
        cols = cols.combine_chunks()
    if isinstance(vals, pa.ChunkedArray):
        vals = vals.combine_chunks()
    flat_c = pc.list_flatten(cols).to_numpy(zero_copy_only=False).astype(np.int64)
    flat_v = pc.list_flatten(vals).to_numpy(zero_copy_only=False).astype(np.float64)
    par = pc.list_parent_indices(cols).to_numpy(zero_copy_only=False)
    y = batch.column("y").to_numpy(zero_copy_only=False).astype(np.float64)
    return flat_c, flat_v, par, y


class _Adagrad:
    """Full-batch Adagrad step shared by the driver and distributed
    training paths — per-coordinate scaling is what lets rare sparse
    features (the interesting ones in a quality filter) catch up with
    the bias in a few hundred epochs."""

    def __init__(self, dim: int, lr: float, l2: float) -> None:
        self.w = np.zeros(dim + 1, dtype=np.float64)
        self.G = np.zeros(dim + 1, dtype=np.float64)
        self.lr, self.l2 = lr, l2

    def step(self, g: np.ndarray) -> None:
        g = g.copy()
        g[:-1] += self.l2 * self.w[:-1]  # no penalty on the bias
        self.G += g * g
        self.w -= self.lr * g / np.sqrt(self.G + 1e-8)


_DRIVER_TRAIN_BYTES = 256 * 1024 * 1024


def train_logreg(
    feats: Any,
    dim: int = 1 << 16,
    epochs: int = 200,
    lr: float = 0.5,
    l2: float = 1e-6,
    driver_limit_bytes: int = _DRIVER_TRAIN_BYTES,
) -> np.ndarray:
    """Full-batch logistic regression with Adagrad. Adaptive, like the
    repo's other finalizes: a featurized sample <= driver_limit_bytes
    is pulled once and iterated locally (epochs are then free —
    Ray's fixed per-round task latency would otherwise dominate, the
    'fixed-overhead facts' lesson); beyond it, each epoch is ONE
    map_batches emitting dense partial gradients
    (X^T(sigmoid(Xw+b)-y) via two bincount scatter-adds) against the
    ray.put-broadcast weights, summed on the driver. Identical math on
    both paths up to float associativity of the partial sums.

    -> weight vector of length dim+1 (bias last)."""
    import ray

    m = feats.materialize()
    n_total = m.count()
    if n_total == 0:
        raise ValueError("cannot train a classifier on an empty dataset")
    opt = _Adagrad(dim, lr, l2)

    if m.size_bytes() <= driver_limit_bytes:
        parts = [_csr(t) for t in ray.get(m.to_arrow_refs()) if t.num_rows]
        off = np.concatenate([[0], np.cumsum([len(p[3]) for p in parts])])
        c = np.concatenate([p[0] for p in parts])
        v = np.concatenate([p[1] for p in parts])
        par = np.concatenate(
            [p[2] + o for p, o in zip(parts, off[:-1])]
        ).astype(np.int64)
        y = np.concatenate([p[3] for p in parts])
        for _ in range(epochs):
            w = opt.w
            z = np.bincount(par, weights=w[c] * v, minlength=n_total) + w[-1]
            d = _sigmoid(z) - y
            g = np.zeros(dim + 1, dtype=np.float64)
            g[:-1] = np.bincount(c, weights=d[par] * v, minlength=dim)
            g[-1] = d.sum()
            opt.step(g / n_total)
        return opt.w

    for _ in range(epochs):
        w_ref = ray.put(opt.w)

        def grad(batch: pa.Table, _ref=w_ref) -> pa.Table:
            wv = ray.get(_ref)  # zero-copy object-store read
            c, v, par, y = _csr(batch)
            z = np.bincount(par, weights=wv[c] * v, minlength=len(y)) + wv[-1]
            d = _sigmoid(z) - y
            g = np.zeros(len(wv), dtype=np.float64)
            g[:-1] = np.bincount(c, weights=d[par] * v, minlength=len(wv) - 1)
            g[-1] = d.sum()
            return pa.table({"g": pa.array([g.tobytes()], type=pa.binary())})

        parts = m.map_batches(
            grad, batch_format="pyarrow", batch_size=None
        ).take_all()
        g = np.zeros(dim + 1, dtype=np.float64)
        for p in parts:
            g += np.frombuffer(p["g"], dtype=np.float64)
        opt.step(g / n_total)
    return opt.w


def score_logreg(
    ds: Any,
    w: np.ndarray,
    text_col: str,
    dim: int = 1 << 16,
    ngrams: int = 2,
    out_col: str = "score",
) -> Any:
    """Stateless streaming scoring pass: broadcast final weights once,
    per-batch featurize + one bincount sparse matvec + sigmoid ->
    appends ``out_col`` (float64 P(label=1)) to every row."""
    import ray

    w_ref = ray.put(np.asarray(w, dtype=np.float64))

    def fn(batch: pa.Table) -> pa.Table:
        wv = ray.get(w_ref)
        par, col, val, n = hashed_gram_features(batch.column(text_col), dim, ngrams)
        z = np.full(n, wv[-1], dtype=np.float64)
        if len(par):
            z += np.bincount(par, weights=wv[col] * val, minlength=n)
        return batch.append_column(
            out_col, pa.array(_sigmoid(z), type=pa.float64())
        )

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)
