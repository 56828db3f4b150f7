"""Distributed PCA over an embedding column.

One streaming pass computes mergeable second-moment partials — per
batch: row count n, per-dim sums Σx (d values) and the upper triangle
of the Gram matrix Σ x_i x_j (d(d+1)/2 values, one (d × d) matmul per
batch, no per-row Python). The partial volume is O(#batches × d²)
regardless of row count, so the adaptive ``merge_partial_sums`` driver
branch almost always applies and the eigendecomposition (d × d — tiny)
runs on the driver. This is the classic "covariance from sufficient
statistics" layout; at 100 TB the corpus is read once and only the
d²-sized partials move.

Two moment modes:

- float64 (``quantize=None``): the real PCA path.
- integer grid (``quantize=g``): components are quantized to
  ``floor(x·g + 0.5)`` int64 first, making every sum EXACT and
  engine-order-independent (int64 bound: corpus Σ q_i·q_j must stay
  under 2^63 — with |q| <= 10^3 that is ~10^12 rows; lower ``g`` or
  shard the moment pass beyond that) — the oracle-comparable covariance used by
  the ``embed_covariance`` query (``v*g + 0.5`` and ``floor`` are the
  same IEEE ops in DuckDB and numpy, so both engines see identical
  integers).
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def moment_partials(
    ds: Any,
    col: str,
    dim: int,
    quantize: float | None = None,
    limit_bytes: int | None = None,
) -> pa.Table:
    """Second-moment sufficient statistics of ``col`` (list<float>,
    fixed width ``dim``) -> local pa.Table[i, j, s] where

    - (i=-1, j=-1): row count n
    - (i, j=-1):    Σ x_i        (per-dim sum)
    - (i, j>=i):    Σ x_i·x_j    (upper-triangle Gram entries)

    Always returns a LOCAL table: the merged key space is
    d(d+1)/2 + d + 1 rows, bounded by the dimension, never the corpus.
    ``limit_bytes=0`` forces the distributed merge branch (test hook).
    """
    from patito_ray.functions.similarity import _to_matrix
    from patito_ray.stages.agg import collect_table, merge_partial_sums

    if dim < 1:
        raise ValueError(f"dim must be >= 1, got {dim}")
    iu, ju = np.triu_indices(dim)
    val_t = pa.int64() if quantize is not None else pa.float64()
    _schema = pa.schema([("i", pa.int64()), ("j", pa.int64()), ("s", val_t)])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _schema.empty_table()
        m = _to_matrix(t.column(col))
        if m.shape[1] != dim:
            raise ValueError(
                f"embedding width {m.shape[1]} != declared dim {dim}"
            )
        if quantize is not None:
            m = np.floor(m * quantize + 0.5).astype(np.int64)
        sx = m.sum(axis=0)
        gram = m.T @ m
        i_all = np.concatenate([[-1], np.arange(dim, dtype=np.int64), iu])
        j_all = np.concatenate(
            [[-1], np.full(dim, -1, dtype=np.int64), ju]
        )
        s_all = np.concatenate([[t.num_rows], sx, gram[iu, ju]])
        return pa.table(
            {
                "i": pa.array(i_all, type=pa.int64()),
                "j": pa.array(j_all, type=pa.int64()),
                "s": pa.array(s_all.astype(m.dtype), type=val_t),
            },
            schema=_schema,
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    kwargs = {} if limit_bytes is None else {"limit_bytes": limit_bytes}
    merged = merge_partial_sums(partials, ["i", "j"], ["s"], **kwargs)
    if not isinstance(merged, pa.Table):
        # key space is O(d^2) — tiny at any corpus size
        merged = collect_table(merged, empty_schema=_schema)
    return merged


def _unpack_moments(
    tab: pa.Table, dim: int
) -> "tuple[int, np.ndarray, np.ndarray]":
    i = tab.column("i").to_numpy(zero_copy_only=False)
    j = tab.column("j").to_numpy(zero_copy_only=False)
    s = tab.column("s").to_numpy(zero_copy_only=False)
    n = int(s[(i == -1) & (j == -1)][0]) if ((i == -1) & (j == -1)).any() else 0
    sx = np.zeros(dim, dtype=np.float64)
    mask = (i >= 0) & (j == -1)
    sx[i[mask]] = s[mask]
    gram = np.zeros((dim, dim), dtype=np.float64)
    mask = (i >= 0) & (j >= 0)
    gram[i[mask], j[mask]] = s[mask]
    gram[j[mask], i[mask]] = s[mask]
    return n, sx, gram


def pca_embeddings(
    ds: Any,
    col: str,
    dim: int,
    k: int,
    limit_bytes: int | None = None,
) -> "dict[str, Any]":
    """Top-``k`` principal components from the one-pass moment
    partials: sample covariance C = (G − n·μμᵀ)/(n−1), then a driver
    ``eigh`` over the d × d matrix. Returns eigenvalues (descending),
    explained-variance ratios and the (k × d) component matrix with a
    sign convention (largest-|.| coordinate positive) so results are
    deterministic across eigensolver sign flips.
    """
    if k < 1 or k > dim:
        raise ValueError(f"k must be in [1, {dim}], got {k}")
    tab = moment_partials(ds, col, dim, limit_bytes=limit_bytes)
    n, sx, gram = _unpack_moments(tab, dim)
    if n < 2:
        raise ValueError(f"PCA needs >= 2 rows, got {n}")
    mu = sx / n
    cov = (gram - n * np.outer(mu, mu)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    evals_k = evals[order]
    comps = evecs[:, order].T  # (k, d)
    flip = np.sign(comps[np.arange(k), np.abs(comps).argmax(axis=1)])
    flip[flip == 0] = 1.0
    comps = comps * flip[:, None]
    total = float(evals.sum())
    return {
        "n": n,
        "mean": mu,
        "eigenvalues": evals_k,
        "explained_variance_ratio": evals_k / total if total else evals_k * 0.0,
        "components": comps,
    }


def pca_project(
    ds: Any,
    col: str,
    dim: int,
    k: int,
    id_col: str | None = None,
    limit_bytes: int | None = None,
) -> Any:
    """Fit top-``k`` PCA (one moment pass + driver d x d ``eigh``) and
    PROJECT every embedding onto the components in a second streaming
    pass -> Dataset[[id_col,] pc1..pck:float64]. The (mean, components)
    pair is broadcast ONCE via ``ray.put`` and resolved lazily inside
    the batch fn (zero-copy object-store read per task — never pickled
    into task specs; the topk_cosine lesson); each batch is ONE
    (rows x d) @ (d x k) float64 matmul. Deterministic across
    eigensolver sign flips via pca_embeddings' sign convention."""
    import ray

    fit = pca_embeddings(ds, col, dim, k, limit_bytes=limit_bytes)
    ref = ray.put(
        {
            "mu": np.asarray(fit["mean"], dtype=np.float64),
            "comps": np.asarray(fit["components"], dtype=np.float64).T,  # (d, k)
        }
    )
    names = [f"pc{i + 1}" for i in range(k)]
    fields = ([(id_col, pa.int64())] if id_col else []) + [
        (nm, pa.float64()) for nm in names
    ]
    out_schema = pa.schema(fields)

    def project(t: pa.Table, _ref=ref) -> pa.Table:
        if t.num_rows == 0 or col not in t.column_names:
            return out_schema.empty_table()
        from patito_ray.functions.similarity import _to_matrix

        m = _to_matrix(t.column(col))
        p = ray.get(_ref)
        coords = (m - p["mu"]) @ p["comps"]
        cols: "dict[str, Any]" = {}
        if id_col:
            cols[id_col] = pc.cast(t.column(id_col), pa.int64())
        for i, nm in enumerate(names):
            cols[nm] = pa.array(coords[:, i], pa.float64())
        return pa.table(cols, schema=out_schema)

    return ds.map_batches(project, batch_format="pyarrow", batch_size=None)
