"""Distributed k-means over embedding columns.

Clustering is the backbone of several public curation techniques
(SemDeDup's cluster-then-dedup, cluster-balanced sampling, topic
pruning): group a corpus's embeddings into k buckets, then operate
per bucket. This is Lloyd's algorithm expressed Ray-Data-first:

- **Assignment** is a per-batch float64 matmul against a centroid
  matrix broadcast ONCE per iteration via ``ray.put`` (k x d floats —
  KBs), never reshipped per batch: workers read it zero-copy from the
  object store.
- **Update** is a classic partial-aggregate: each batch emits one
  (k x d sum, k count) pair — k*(d+1) floats regardless of batch size
  — and the driver folds them. No shuffle at any step; per iteration
  the corpus is scanned once, streaming.

At 100 TB the per-iteration cost is exactly one pass over the
embedding column (pruned at the read) plus a per-batch k x d partial;
the driver's fold is O(#batches * k * d) floats. That is the same
shape the public large-scale implementations use.

Determinism contract (what the exact SQL oracle relies on):
initial centroids are the vectors of the k smallest ids, distances
are squared L2 computed in float64 on the float32 values' exact
float64 images, ties broken by smallest cluster id, and an empty
cluster keeps its previous centroid.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa

from patito_ray.functions.similarity import _to_matrix


def _assign(vecs: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    """Argmin squared-L2 cluster per row; ties -> smallest cluster id
    (np.argmin picks the first maximum, which is the smallest index)."""
    # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; the ||x||^2 term is
    # constant per row and drops out of the argmin
    scores = vecs @ centroids.T * -2.0 + (centroids * centroids).sum(axis=1)
    return np.argmin(scores, axis=1)


def _exact_dists(vecs: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    """(n, k) squared distances via the exact per-pair formula — used
    by the parity query so the float64 arithmetic mirrors the SQL
    oracle's sum((x_i-c_i)^2) form term-for-term."""
    diff = vecs[:, None, :] - centroids[None, :, :]
    return (diff * diff).sum(axis=2)


def initial_centroids(
    ds: Any, k: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> np.ndarray:
    """Deterministic seed: the vectors of the k smallest ids."""
    import pyarrow.compute as pc

    rows = ds.map_batches(
        lambda t: t.filter(pc.less(t.column(id_col), k)).select(
            [id_col, vec_col]
        ),
        batch_format="pyarrow",
        batch_size=None,
    ).take_all()
    distinct = {int(r[id_col]) for r in rows}
    if distinct != set(range(k)) or len(rows) != k:
        # a raw row-count check would pass with duplicate ids below k
        # and silently seed identical (or order-dependent) centroids
        raise ValueError(
            f"kmeans: need ids 0..{k - 1} present exactly once to seed "
            f"{k} centroids, found {len(rows)} rows over ids "
            f"{sorted(distinct)}"
        )
    rows.sort(key=lambda r: r[id_col])
    return np.asarray(
        [np.asarray(r[vec_col], dtype=np.float64) for r in rows]
    )


def kmeans_fit(
    ds: Any,
    k: int,
    n_iter: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    init: np.ndarray | None = None,
    exact_dists: bool = False,
) -> np.ndarray:
    """Lloyd's iterations; returns the final (k, d) centroid matrix.

    ``exact_dists=True`` uses the expanded per-pair distance form for
    bit-level parity with the SQL oracle; the default matmul form is
    the fast path (identical assignments away from exact ties).
    """
    import ray

    centroids = initial_centroids(ds, k, id_col, vec_col) if init is None else init

    for _ in range(n_iter):
        ref = ray.put(centroids)

        def partial(t: pa.Table, _ref=ref) -> pa.Table:
            c = ray.get(_ref)
            vecs = _to_matrix(t.column(vec_col)).astype(np.float64)
            if not len(vecs):
                kk, d = c.shape
                return pa.table(
                    {
                        "cid": pa.array([], type=pa.int64()),
                        "n": pa.array([], type=pa.int64()),
                        "vsum": pa.array([], type=pa.list_(pa.float64())),
                    }
                )
            if exact_dists:
                assign = np.argmin(_exact_dists(vecs, c), axis=1)
            else:
                assign = _assign(vecs, c)
            kk, d = c.shape
            counts = np.bincount(assign, minlength=kk)
            sums = np.zeros((kk, d))
            np.add.at(sums, assign, vecs)
            live = np.flatnonzero(counts)
            return pa.table(
                {
                    "cid": pa.array(live, type=pa.int64()),
                    "n": pa.array(counts[live], type=pa.int64()),
                    "vsum": pa.array(list(sums[live])),
                }
            )

        parts = ds.map_batches(
            partial, batch_format="pyarrow", batch_size=None
        ).take_all()
        kk, d = centroids.shape
        counts = np.zeros(kk, dtype=np.int64)
        sums = np.zeros((kk, d))
        for row in parts:
            counts[row["cid"]] += row["n"]
            sums[row["cid"]] += np.asarray(row["vsum"])
        live = counts > 0
        centroids = centroids.copy()
        centroids[live] = sums[live] / counts[live, None]
    return centroids


def semantic_dedup(
    ds: Any,
    cluster_col: str = "cluster_id",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
) -> Any:
    """SemDeDup (public technique): flag semantic near-duplicates
    WITHIN each cluster — a row is dropped when some same-cluster row
    with a smaller id has cosine similarity above ``threshold``. The
    predicate is order-independent (no sequential greedy), so results
    are deterministic under any partitioning and SQL-expressible.

    Partitioning assumption (the one SemDeDup itself makes): ``k`` is
    sized so a single cluster's vectors fit one worker — the per-group
    cost is O(|c|^2) dot products as a single matmul. Pair this with
    ``kmeans_fit(k ~ corpus/expected_cluster_size)``; clusters are the
    unit of parallelism via the groupby exchange.

    Returns (id_col, cluster_col, kept) — the caller joins/filters.
    """
    import pyarrow.compute as pc

    def prune(group: pa.Table) -> pa.Table:
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        n = len(ids)
        order = np.argsort(ids, kind="stable")
        vecs = _to_matrix(group.column(vec_col)).astype(np.float64)[order]
        norms = np.linalg.norm(vecs, axis=1)
        norms[norms == 0.0] = 1.0  # zero vectors: cos defined as 0
        unit = vecs / norms[:, None]
        # earlier-id neighbor above threshold -> dropped. Only the
        # strict lower triangle is ever inspected, so compute it in
        # row chunks: half the flops of a full gram matrix and O(CH*n)
        # peak memory instead of O(n^2).
        dup = np.zeros(n, dtype=bool)
        CH = 1024
        for s in range(1, n, CH):
            e = min(s + CH, n)
            block = unit[s:e] @ unit[:e].T  # rows s..e vs cols 0..e
            hit = block > threshold
            hit &= np.arange(e)[None, :] < np.arange(s, e)[:, None]
            dup[s:e] = hit.any(axis=1)
        kept = np.empty(n, dtype=bool)
        kept[order] = ~dup
        return pa.table(
            {
                id_col: group.column(id_col),
                cluster_col: group.column(cluster_col),
                "kept": pa.array(kept),
            }
        )

    # int64 group keys (Ray block-building invariant)
    ds = ds.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index(cluster_col),
            cluster_col,
            pc.cast(t.column(cluster_col), pa.int64()),
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
    return ds.groupby(cluster_col).map_groups(
        prune, batch_format="pyarrow"
    )


def kmeans_assign(
    ds: Any,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "cluster_id",
    exact_dists: bool = False,
) -> Any:
    """Append the nearest-centroid id per row (broadcast centroids,
    per-batch matmul — the streaming scoring stage)."""
    import ray

    ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def score(t: pa.Table) -> pa.Table:
        c = ray.get(ref)
        vecs = _to_matrix(t.column(vec_col)).astype(np.float64)
        if not len(vecs):
            return t.append_column(out_col, pa.array([], type=pa.int64()))
        if exact_dists:
            assign = np.argmin(_exact_dists(vecs, c), axis=1)
        else:
            assign = _assign(vecs, c)
        return t.append_column(out_col, pa.array(assign, type=pa.int64()))

    return ds.map_batches(score, batch_format="pyarrow", batch_size=None)


def kmeans_scalable_init(
    ds: Any,
    k: int,
    l: int | None = None,
    rounds: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 0x5CA1AB1E,
    max_candidates: int = 100_000,
) -> np.ndarray:
    """k-means|| (scalable k-means++, Bahmani et al. 2012) seeding —
    the init for corpora where "vectors of the k smallest ids" lands
    all seeds in one region and Lloyd stalls in a bad local optimum.

    Each round is two streaming passes (no shuffle anywhere):
      1. cost pass — per-batch partial Σ min-dist²(x, C) against the
         centroid set broadcast via ``ray.put``;
      2. sample pass — every row keeps itself with probability
         min(1, l·d²/cost) decided by a DETERMINISTIC splitmix64 coin
         keyed on (id, round, seed), so the run is reproducible and
         retry-safe (a re-executed batch draws identical coins).
    After ``rounds``, one weighting pass counts how many corpus points
    each candidate owns, and the driver reduces the ≤ l·rounds+1
    weighted candidates to k seeds by deterministic weighted
    farthest-first (max w·d²; ties -> smaller candidate index).

    Returns a (k, d) float64 centroid matrix for ``kmeans_fit(init=)``.
    ``max_candidates`` is the loud guard against a degenerate l·rounds
    blow-up — candidates live on the driver by design (KBs per row).
    """
    import ray

    from patito_ray.functions.dedup import _splitmix

    if l is None:
        l = 2 * k
    two64 = float(2**64)

    centroids = initial_centroids(ds, 1, id_col, vec_col)  # 1 x d

    def _cost_and_sample(c: np.ndarray, rnd: int, cost: float | None):
        """cost is None -> cost pass; else sample pass at that cost."""
        ref = ray.put(c)

        def fn(t: pa.Table, _ref=ref, _cost=cost, _rnd=rnd) -> pa.Table:
            import pyarrow.compute as pc

            cc = ray.get(_ref)
            vecs = _to_matrix(t.column(vec_col)).astype(np.float64)
            if not len(vecs):
                if _cost is None:
                    return pa.table({"s": pa.array([], pa.float64())})
                return pa.table(
                    {
                        id_col: pa.array([], pa.int64()),
                        vec_col: pa.array([], pa.list_(pa.float64())),
                    }
                )
            d2 = _exact_dists(vecs, cc).min(axis=1)
            if _cost is None:
                return pa.table({"s": pa.array([float(d2.sum())], pa.float64())})
            ids = (
                pc.cast(t.column(id_col), pa.int64())
                .to_numpy(zero_copy_only=False)
                .astype(np.uint64)
            )
            h = _splitmix(
                ids * np.uint64(1013) + np.uint64(_rnd) ^ np.uint64(seed)
            )
            u = h.astype(np.float64) / two64
            keep = u < np.minimum(1.0, l * d2 / _cost)
            return pa.table(
                {
                    id_col: pa.array(ids[keep].astype(np.int64), pa.int64()),
                    vec_col: pa.array(list(vecs[keep])),
                }
            )

        return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)

    for rnd in range(rounds):
        cost_rows = _cost_and_sample(centroids, rnd, None).take_all()
        cost = float(sum(r["s"] for r in cost_rows))
        if cost <= 0.0:
            break  # every point already a centroid
        picked = _cost_and_sample(centroids, rnd, cost).take_all()
        if not picked:
            continue
        if len(picked) + len(centroids) > max_candidates:
            raise ValueError(
                f"kmeans||: candidate set would exceed {max_candidates} "
                f"(l={l}, round {rnd} drew {len(picked)}) — lower l"
            )
        picked.sort(key=lambda r: r[id_col])  # deterministic order
        new = np.asarray(
            [np.asarray(r[vec_col], dtype=np.float64) for r in picked]
        )
        centroids = np.vstack([centroids, new])

    # weight pass: corpus points owned by each candidate
    ref = ray.put(centroids)

    def wpart(t: pa.Table, _ref=ref) -> pa.Table:
        cc = ray.get(_ref)
        vecs = _to_matrix(t.column(vec_col)).astype(np.float64)
        if not len(vecs):
            return pa.table(
                {"cid": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        assign = np.argmin(_exact_dists(vecs, cc), axis=1)
        counts = np.bincount(assign, minlength=len(cc))
        live = np.flatnonzero(counts)
        return pa.table(
            {
                "cid": pa.array(live, pa.int64()),
                "n": pa.array(counts[live], pa.int64()),
            }
        )

    w = np.zeros(len(centroids), dtype=np.int64)
    for row in ds.map_batches(
        wpart, batch_format="pyarrow", batch_size=None
    ).take_all():
        w[row["cid"]] += row["n"]

    # driver: weighted farthest-first down to k (deterministic)
    if len(centroids) < k:
        raise ValueError(
            f"kmeans||: only {len(centroids)} candidates sampled for k={k} "
            f"— raise l (now {l}) or rounds (now {rounds})"
        )
    if len(centroids) == k:
        return centroids
    chosen = [int(np.argmax(w))]  # heaviest candidate first
    d2 = ((centroids - centroids[chosen[0]]) ** 2).sum(axis=1)
    while len(chosen) < k:
        score = w.astype(np.float64) * d2
        score[chosen] = -1.0
        nxt = int(np.argmax(score))  # first max -> smallest index tie-break
        chosen.append(nxt)
        d2 = np.minimum(d2, ((centroids - centroids[nxt]) ** 2).sum(axis=1))
    return centroids[sorted(chosen)]
