"""Similarity search over an embedding column (``list<float>``).

Baseline: brute-force cosine top-k — the query matrix is broadcast once
(``ray.put``), each batch does one float64 matmul against it and emits
its local top-k (a few rows per query per batch); the driver folds the
tiny partials into the global top-k. No shuffle at all: the scan is the
only data motion, so this scales linearly with corpus size.

Scale path: ``topk_cosine_lsh`` prunes each batch to rows whose
random-hyperplane code is within a Hamming radius of some query code
before the exact matmul — same output contract, smaller matmul.
"""

from __future__ import annotations

import heapq
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _to_matrix(column: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """list<float> column -> (n, d) float64 matrix without per-row loops
    (flatten + reshape; embedding dims are fixed-width)."""
    import pyarrow.compute as pc

    if isinstance(column, pa.ChunkedArray):
        column = column.combine_chunks()
    if column.null_count:
        raise ValueError(
            f"embedding column contains {column.null_count} null row(s); "
            "filter or impute nulls before similarity/dedup operators"
        )
    flat = pc.list_flatten(column).to_numpy(zero_copy_only=False)
    lengths = pc.list_value_length(column).to_numpy(zero_copy_only=False)
    if len(lengths) == 0:
        return np.empty((0, 0), dtype=np.float64)
    d = int(lengths[0])
    if not (lengths == d).all():
        raise ValueError("ragged embedding column")
    return flat.astype(np.float64).reshape(len(lengths), d)


def _unit(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


class BatchTopK:
    """Batch scorer: broadcast query matrix resolved LAZILY on the first
    batch — the pickled callable (task spec / actor constructor args)
    carries only the ObjectRef, so the matrix travels through the object
    store exactly once per worker regardless of task count (round-2
    advice: resolving in ``__init__`` on the driver pickled the full
    matrix into every stateless task spec)."""

    def __init__(self, queries_ref: Any, k: int, id_col: str, vec_col: str) -> None:
        self._ref = queries_ref
        self.q_ids: np.ndarray | None = None
        self.q_unit: np.ndarray | None = None
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def _resolve(self) -> None:
        if self.q_ids is None:
            import ray

            q = self._ref
            if not isinstance(q, dict):
                q = ray.get(q)
            self.q_ids = np.asarray(q["ids"])
            self.q_unit = _unit(np.asarray(q["vecs"], dtype=np.float64))

    def __call__(self, batch: pa.Table) -> pa.Table:
        self._resolve()
        vecs = _to_matrix(batch.column(self.vec_col))
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        if vecs.size == 0:
            return pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "neighbor_id": pa.array([], type=pa.int64()),
                    "cosine": pa.array([], type=pa.float64()),
                }
            )
        sims = self.q_unit @ _unit(vecs).T  # (q, n)
        k = min(self.k + 1, sims.shape[1])  # +1 headroom for self-match
        part = np.argpartition(-sims, k - 1, axis=1)[:, :k]  # (q, k)
        out_q = np.repeat(self.q_ids.astype(np.int64), part.shape[1])
        out_n = ids[part.ravel()].astype(np.int64)
        out_s = np.take_along_axis(sims, part, axis=1).ravel()
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "neighbor_id": pa.array(out_n, type=pa.int64()),
                "cosine": pa.array(out_s, type=pa.float64()),
            }
        )


#: Above this many queries the driver heap-merge (a Python loop over
#: #blocks x #queries x k partial rows) loses to a distributed
#: grouped-top-k exchange over the tiny partials.
_DISTRIBUTED_FINALIZE_QUERIES = 1024


def topk_cosine(
    ds: Any,
    query_ids: np.ndarray,
    query_vecs: np.ndarray,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
    concurrency: int | None = None,
    finalize: str = "auto",
) -> pa.Table:
    """Global cosine top-k: broadcast queries, per-batch local top-k,
    then merge the partials. Ties break on neighbor id ascending
    (deterministic, oracle-matchable).

    ``finalize``: ``"driver"`` heap-merges partial rows on the driver
    (fastest for few queries — partials are #blocks x #queries x k tiny
    rows); ``"distributed"`` runs ``stages.topk.grouped_top_k`` over
    ``(query_id, cosine)`` so the merge itself scales with query count;
    ``"auto"`` picks distributed at ≥1024 queries. Both paths share the
    exact ordering contract (cosine desc, neighbor_id asc)."""
    import ray

    ref = ray.put({"ids": np.asarray(query_ids), "vecs": np.asarray(query_vecs, dtype=np.float64)})
    if concurrency:
        # actor pool: per-actor __init__ loads/normalizes the query
        # matrix once — worth it when the matrix is large
        partials = ds.map_batches(
            BatchTopK,
            fn_constructor_args=(ref, k, id_col, vec_col),
            batch_format="pyarrow",
            batch_size=None,
            concurrency=concurrency,
        )
    else:
        # stateless tasks (default): the broadcast ref is a zero-copy
        # object-store read per task; skips actor-pool startup latency
        partials = ds.map_batches(
            BatchTopK(ref, k, id_col, vec_col),
            batch_format="pyarrow",
            batch_size=None,
        )
    if finalize == "distributed" or (
        finalize == "auto" and len(query_ids) >= _DISTRIBUTED_FINALIZE_QUERIES
    ):
        from patito_ray.stages.topk import grouped_top_k

        flt = partials
        if exclude_self:
            flt = flt.map_batches(
                lambda t: t.filter(
                    pc.not_equal(t.column("neighbor_id"), t.column("query_id"))
                ),
                batch_format="pyarrow",
                batch_size=None,
            )
        topk_ds = grouped_top_k(
            flt, group="query_id", value="cosine", k=k, tie="neighbor_id"
        )
        tables = [
            t.select(["query_id", "neighbor_id", "cosine", "rank"])
            for t in topk_ds.iter_batches(batch_format="pyarrow")
            if t.num_rows
        ]
        if not tables:
            return pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "neighbor_id": pa.array([], type=pa.int64()),
                    "cosine": pa.array([], type=pa.float64()),
                    "rank": pa.array([], type=pa.int64()),
                }
            )
        out = pa.concat_tables(tables)
        return out.sort_by([("query_id", "ascending"), ("rank", "ascending")])

    heaps: dict[int, list[tuple[float, int]]] = {int(q): [] for q in query_ids}
    for b in partials.iter_batches(batch_format="pyarrow"):
        for row in b.to_pylist():
            qid, nid, sim = row["query_id"], row["neighbor_id"], row["cosine"]
            if exclude_self and nid == qid:
                continue
            # heap orders by (sim, -nid) so ties keep the SMALLER id
            heapq.heappush(heaps[qid], (sim, -nid))
            if len(heaps[qid]) > k:
                heapq.heappop(heaps[qid])
    out_q, out_n, out_s, out_r = [], [], [], []
    for qid in sorted(heaps):
        ranked = sorted(heaps[qid], key=lambda t: (-t[0], -t[1]))
        for rank, (sim, neg_nid) in enumerate(ranked, 1):
            out_q.append(qid)
            out_n.append(-neg_nid)
            out_s.append(sim)
            out_r.append(rank)
    return pa.table(
        {
            "query_id": pa.array(out_q, type=pa.int64()),
            "neighbor_id": pa.array(out_n, type=pa.int64()),
            "cosine": pa.array(out_s, type=pa.float64()),
            "rank": pa.array(out_r, type=pa.int64()),
        }
    )


def ivf_build(
    ds: Any,
    n_centroids: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_size: int = 20_000,
    iters: int = 10,
    seed: int = 17,
) -> tuple[np.ndarray, Any]:
    """Build an IVF (inverted-file) index: k-means coarse centroids from
    a corpus sample + the corpus re-keyed by nearest-centroid id.

    Returns ``(centroids, assigned)`` where ``centroids`` is a
    (n_centroids, d) unit matrix and ``assigned`` is the input Dataset
    with an int64 ``_ivf_list`` column — write it with
    ``assigned.write_parquet(path, partition_cols=["_ivf_list"])`` so a
    later search only READS the probed lists (partition pruning), the
    way a 100 TB index must work.

    Scale shape: k-means runs on a bounded uniform sample on the
    driver (numpy — centroids are tiny); assignment is one vectorized
    matmul per batch. Spherical k-means (cosine geometry): vectors and
    centroids are unit-normalized, assignment maximizes dot product.
    """
    n = max(1, ds.count())
    frac = min(1.0, sample_size / n)
    sample_rows = []
    for b in (
        ds.random_sample(frac, seed=seed) if frac < 1.0 else ds
    ).iter_batches(batch_format="pyarrow"):
        m = _to_matrix(b.column(vec_col))
        if m.size:
            sample_rows.append(m)
    if not sample_rows:
        raise ValueError(
            "cannot build an IVF index over an empty dataset (the sample "
            f"yielded no '{vec_col}' rows); check the input and vec_col"
        )
    sample = _unit(np.concatenate(sample_rows))
    rng = np.random.default_rng(seed)
    k = min(n_centroids, len(sample))
    centroids = sample[rng.choice(len(sample), size=k, replace=False)]
    for _ in range(iters):
        assign = np.argmax(sample @ centroids.T, axis=1)
        for c in range(k):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids = _unit(centroids)
    cref_holder = centroids.copy()

    def assign_batch(batch: pa.Table) -> pa.Table:
        m = _to_matrix(batch.column(vec_col))
        if m.size == 0:
            return batch.append_column("_ivf_list", pa.array([], type=pa.int64()))
        lists = np.argmax(_unit(m) @ cref_holder.T, axis=1).astype(np.int64)
        return batch.append_column("_ivf_list", pa.array(lists, type=pa.int64()))

    assigned = ds.map_batches(assign_batch, batch_format="pyarrow", batch_size=None)
    return centroids, assigned


def topk_cosine_ivf(
    assigned: Any,
    centroids: np.ndarray,
    query_ids: np.ndarray,
    query_vecs: np.ndarray,
    k: int = 5,
    n_probe: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """IVF search: each query probes its ``n_probe`` nearest centroid
    lists; only rows in probed lists are exactly scored (when
    ``assigned`` is a partitioned-parquet read, that pruning happens at
    the STORAGE layer). Same output contract as ``topk_cosine``;
    approximate recall controlled by n_probe/n_centroids."""
    q_vecs = _unit(np.asarray(query_vecs, dtype=np.float64))
    sims_qc = q_vecs @ centroids.T  # (q, c)
    n_probe = min(n_probe, centroids.shape[0])
    probe = np.argpartition(-sims_qc, n_probe - 1, axis=1)[:, :n_probe]
    wanted = pa.array(sorted({int(c) for row in probe for c in row}), type=pa.int64())

    pruned = assigned.map_batches(
        lambda t: t.filter(pc.is_in(t.column("_ivf_list"), value_set=wanted)),
        batch_format="pyarrow",
        batch_size=None,
    )
    return topk_cosine(
        pruned, query_ids, query_vecs, k=k, id_col=id_col, vec_col=vec_col
    )


def topk_cosine_lsh(
    ds: Any,
    query_ids: np.ndarray,
    query_vecs: np.ndarray,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
    radius: int = 2,
    seed: int = 9,
    concurrency: int | None = None,
) -> pa.Table:
    """Approximate top-k: per batch, keep only rows whose hyperplane
    code is within ``radius`` Hamming bits of any query code, then score
    exactly. Same output schema as ``topk_cosine`` (approximate recall)."""
    import ray

    q_vecs = np.asarray(query_vecs, dtype=np.float64)
    rng = np.random.default_rng(seed)
    d = q_vecs.shape[1]
    planes = rng.standard_normal((d, n_planes))

    def code(m: np.ndarray) -> np.ndarray:
        signs = (m @ planes) > 0
        c = np.zeros(len(m), dtype=np.uint64)
        for b in range(n_planes):
            c |= signs[:, b].astype(np.uint64) << np.uint64(b)
        return c

    q_codes = code(q_vecs)
    ref = ray.put({"ids": np.asarray(query_ids), "vecs": q_vecs})

    popcount = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)

    def prune(batch: pa.Table) -> pa.Table:
        vecs = _to_matrix(batch.column(vec_col))
        if vecs.size == 0:
            return batch
        c = code(vecs)
        keep = np.zeros(len(c), dtype=bool)
        for qc in q_codes:
            x = c ^ qc
            dist = np.zeros(len(c), dtype=np.int64)
            for shift in range(0, 64, 8):
                dist += popcount[((x >> np.uint64(shift)) & np.uint64(0xFF)).astype(np.int64)]
            keep |= dist <= radius
        return batch.filter(pa.array(keep))

    pruned = ds.map_batches(prune, batch_format="pyarrow", batch_size=None)
    # identical scoring/merge/tie-break contract as the exact path —
    # delegate instead of duplicating the heap-merge block
    return topk_cosine(
        pruned,
        query_ids,
        query_vecs,
        k=k,
        id_col=id_col,
        vec_col=vec_col,
        concurrency=concurrency,
    )


class _BatchArgmaxNN:
    """Per-batch exact top-1 neighbor against a broadcast corpus matrix.

    The ObjectRef is resolved lazily on the first batch (same contract
    as ``BatchTopK``): the pickled callable carries only the ref, the
    matrix travels through the object store once per worker. The
    broadcast matrix is sorted by id ascending so ``np.argmax``'s
    first-hit semantics break similarity ties toward the SMALLER
    neighbor id — the same contract as SQL
    ``row_number() OVER (ORDER BY sim DESC, id ASC)``.
    """

    def __init__(self, corpus_ref: Any, id_col: str, vec_col: str) -> None:
        self._ref = corpus_ref
        self.ids: np.ndarray | None = None
        self.unit: np.ndarray | None = None
        self.id_col = id_col
        self.vec_col = vec_col

    def _resolve(self) -> None:
        if self.ids is None:
            import ray

            c = self._ref
            if not isinstance(c, dict):
                c = ray.get(c)
            self.ids = c["ids"]
            self.unit = c["vecs"]

    def __call__(self, batch: pa.Table) -> pa.Table:
        self._resolve()
        vecs = _to_matrix(batch.column(self.vec_col))
        bids = batch.column(self.id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if vecs.size == 0 or len(self.ids) < 2:
            return pa.table(
                {"a": pa.array([], type=pa.int64()), "b": pa.array([], type=pa.int64())}
            )
        sims = _unit(vecs) @ self.unit.T  # (n_batch, n_corpus)
        # mask self-similarity: the corpus ids are sorted, so each
        # batch row's own column is found with one searchsorted
        pos = np.searchsorted(self.ids, bids)
        pos = np.clip(pos, 0, len(self.ids) - 1)
        own = self.ids[pos] == bids
        sims[np.arange(len(bids))[own], pos[own]] = -np.inf
        nn = np.argmax(sims, axis=1)  # first hit == smallest id on ties
        return pa.table(
            {
                "a": pa.array(bids, type=pa.int64()),
                "b": pa.array(self.ids[nn], type=pa.int64()),
            }
        )


def mutual_nn_pairs(
    ds: Any,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    limit_bytes: int = 256 << 20,
) -> pa.Table | Any:
    """Mutual nearest-neighbor (reciprocal best match) pairs under
    cosine: (a, b) with a < b where b is a's exact top-1 neighbor AND
    a is b's — the standard high-precision entity/record-match filter.

    Shape: one pass. The corpus matrix is broadcast once (``ray.put``;
    tasks read it zero-copy from the object store), each batch computes
    its rows' argmax in a single float64 matmul, emitting exactly ONE
    (a, b) direction row per vector. Mutuality is then a count==2 group
    over the unordered pair key — merged through the adaptive
    partial-sum spine (driver polars below ``limit_bytes``, hash
    exchange beyond), so the driver never holds more than the n-row
    direction table's aggregate. Exact-NN inherently needs the matrix
    resident (n*d*8 bytes in the object store); past that, route
    candidates through ``topk_cosine_ivf``'s partition-pruned lists
    and keep the same mutuality merge.
    """
    import ray

    from patito_ray.stages.agg import merge_partial_sums

    mat = ds.materialize()
    ids_l: list[np.ndarray] = []
    vecs_l: list[np.ndarray] = []
    for t in ray.get(mat.to_arrow_refs()):
        if t.num_rows == 0:
            continue
        ids_l.append(t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64))
        m = _to_matrix(t.column(vec_col))
        if m.size:
            vecs_l.append(m)
    empty = pa.table(
        {"a": pa.array([], type=pa.int64()), "b": pa.array([], type=pa.int64())}
    )
    if not ids_l:
        return empty
    ids = np.concatenate(ids_l)
    if len(ids) < 2:
        return empty
    order = np.argsort(ids, kind="stable")
    ref = ray.put({"ids": ids[order], "vecs": _unit(np.concatenate(vecs_l))[order]})

    def to_pair_counts(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        keep = a != b  # degenerate all--inf argmax guard
        a, b = a[keep], b[keep]
        return pa.table(
            {
                "a": pa.array(np.minimum(a, b), type=pa.int64()),
                "b": pa.array(np.maximum(a, b), type=pa.int64()),
                "cnt": pa.array(np.ones(len(a), dtype=np.int64), type=pa.int64()),
            }
        )

    directions = mat.map_batches(
        _BatchArgmaxNN(ref, id_col, vec_col), batch_format="pyarrow", batch_size=None
    ).map_batches(to_pair_counts, batch_format="pyarrow", batch_size=None)
    merged = merge_partial_sums(
        directions, keys=["a", "b"], sums=["cnt"], limit_bytes=limit_bytes
    )

    def finish(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("cnt"), 2))
        return t.select(["a", "b"])

    if isinstance(merged, pa.Table):
        return finish(merged)
    return merged.map_batches(finish, batch_format="pyarrow", batch_size=None)


class _BatchHardNegative:
    """Per-batch argmax over DIFFERENT-label corpus columns only —
    contrastive hard-negative mining. Same lazy-broadcast / sorted-id
    tie-break contract as ``_BatchArgmaxNN``."""

    def __init__(self, corpus_ref: Any, id_col: str, vec_col: str, label_col: str) -> None:
        self._ref = corpus_ref
        self.ids: np.ndarray | None = None
        self.unit: np.ndarray | None = None
        self.labels: np.ndarray | None = None
        self.id_col = id_col
        self.vec_col = vec_col
        self.label_col = label_col

    def _resolve(self) -> None:
        if self.ids is None:
            import ray

            c = self._ref
            if not isinstance(c, dict):
                c = ray.get(c)
            self.ids, self.unit, self.labels = c["ids"], c["vecs"], c["labels"]

    def __call__(self, batch: pa.Table) -> pa.Table:
        self._resolve()
        vecs = _to_matrix(batch.column(self.vec_col))
        bids = batch.column(self.id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        blab = batch.column(self.label_col).to_numpy(zero_copy_only=False)
        if vecs.size == 0 or len(self.ids) == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], type=pa.int64()),
                    "neg_id": pa.array([], type=pa.int64()),
                }
            )
        sims = _unit(vecs) @ self.unit.T
        sims[blab[:, None] == self.labels[None, :]] = -np.inf
        nn = np.argmax(sims, axis=1)  # first hit == smallest id on ties
        best = sims[np.arange(len(bids)), nn]
        keep = np.isfinite(best)  # rows whose label covers the whole corpus drop
        return pa.table(
            {
                "vec_id": pa.array(bids[keep], type=pa.int64()),
                "neg_id": pa.array(self.ids[nn[keep]], type=pa.int64()),
            }
        )


def hard_negative_mining(
    ds: Any,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> Any:
    """Contrastive hard negatives: for every vector, the highest-cosine
    corpus vector with a DIFFERENT label (ties toward the smaller id).

    Scan-only shape — the corpus (ids, unit vectors, labels) is
    broadcast once via ``ray.put``, each batch is one masked float64
    matmul + argmax, output is exactly one row per eligible vector, and
    there is NO shuffle. Same residency assumption as
    ``mutual_nn_pairs``; at corpus sizes past object-store residency,
    route candidates through ``topk_cosine_ivf`` lists per label
    bucket."""
    import ray

    mat = ds.materialize()
    ids_l: list[np.ndarray] = []
    vecs_l: list[np.ndarray] = []
    lab_l: list[np.ndarray] = []
    for t in ray.get(mat.to_arrow_refs()):
        if t.num_rows == 0:
            continue
        ids_l.append(t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64))
        lab_l.append(t.column(label_col).to_numpy(zero_copy_only=False))
        m = _to_matrix(t.column(vec_col))
        if m.size:
            vecs_l.append(m)
    if not ids_l:
        return mat.map_batches(
            lambda t: pa.table(
                {"vec_id": pa.array([], pa.int64()), "neg_id": pa.array([], pa.int64())}
            ),
            batch_format="pyarrow",
        )
    ids = np.concatenate(ids_l)
    labels = np.concatenate(lab_l)
    order = np.argsort(ids, kind="stable")
    ref = ray.put(
        {
            "ids": ids[order],
            "vecs": _unit(np.concatenate(vecs_l))[order],
            "labels": labels[order],
        }
    )
    return mat.map_batches(
        _BatchHardNegative(ref, id_col, vec_col, label_col),
        batch_format="pyarrow",
        batch_size=None,
    )


class BatchTopKInt8:
    """Int8-quantized batch scorer: queries and corpus vectors are
    unit-normalized then quantized to ``round(x * 127)`` int8; scores
    are exact int32 dot products of the quantized vectors (int8
    storage, widened accumulate — the memory layout real engines use:
    4x less vector RAM/network than float32, 8x less than float64).
    Ranking is approximate relative to float cosine (recall@k is
    pytested); scores are INTEGERS so ordering is bit-deterministic.
    Same lazy-ObjectRef broadcast contract as BatchTopK."""

    def __init__(self, queries_ref: Any, k: int, id_col: str, vec_col: str) -> None:
        self._ref = queries_ref
        self.q_ids: "np.ndarray | None" = None
        self.q_int8: "np.ndarray | None" = None
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    @staticmethod
    def quantize(m: np.ndarray) -> np.ndarray:
        u = _unit(np.asarray(m, dtype=np.float64))
        return np.clip(np.round(u * 127.0), -127, 127).astype(np.int8)

    def _resolve(self) -> None:
        if self.q_ids is None:
            import ray

            q = self._ref
            if not isinstance(q, dict):
                q = ray.get(q)
            self.q_ids = np.asarray(q["ids"])
            self.q_int8 = self.quantize(np.asarray(q["vecs"]))

    def __call__(self, batch: pa.Table) -> pa.Table:
        self._resolve()
        vecs = _to_matrix(batch.column(self.vec_col))
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        empty = pa.table(
            {
                "query_id": pa.array([], type=pa.int64()),
                "neighbor_id": pa.array([], type=pa.int64()),
                "score_q": pa.array([], type=pa.int64()),
            }
        )
        if vecs.size == 0:
            return empty
        c = self.quantize(vecs)
        # int8 storage, int32 accumulate (an int8@int8 matmul would
        # overflow at d > 2 — the widening is the accumulator, the
        # broadcast/storage stays int8)
        sims = self.q_int8.astype(np.int32) @ c.astype(np.int32).T  # (q, n)
        k = min(self.k + 1, sims.shape[1])
        part = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        out_q = np.repeat(self.q_ids.astype(np.int64), part.shape[1])
        out_n = ids[part.ravel()].astype(np.int64)
        out_s = np.take_along_axis(sims, part, axis=1).ravel().astype(np.int64)
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "neighbor_id": pa.array(out_n, type=pa.int64()),
                "score_q": pa.array(out_s, type=pa.int64()),
            }
        )


def topk_cosine_int8(
    ds: Any,
    query_ids: np.ndarray,
    query_vecs: np.ndarray,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> pa.Table:
    """Approximate global top-k via int8 quantization: the scale path
    when 10^9+ float vectors don't fit — quantized broadcast + integer
    matmuls per batch, then ONE grouped-top-k merge over integer
    scores (bit-deterministic ordering: score desc, neighbor id asc).
    Recall@k vs exact float cosine is pytested (tests/test_pca.py
    sibling file tests/test_functions.py pattern)."""
    import ray
    import ray.data as rd

    from patito_ray.stages.agg import collect_table

    ref = ray.put({"ids": np.asarray(query_ids), "vecs": np.asarray(query_vecs)})
    partials = ds.map_batches(
        BatchTopKInt8(ref, k=k, id_col=id_col, vec_col=vec_col),
        batch_format="pyarrow",
        batch_size=None,
    )
    tab = collect_table(
        partials,
        empty_schema=pa.schema(
            [
                ("query_id", pa.int64()),
                ("neighbor_id", pa.int64()),
                ("score_q", pa.int64()),
            ]
        ),
    )
    import polars as pl

    df = pl.from_arrow(tab)
    if exclude_self:
        df = df.filter(pl.col("query_id") != pl.col("neighbor_id"))
    out = (
        df.sort(["score_q", "neighbor_id"], descending=[True, False])
        .group_by("query_id", maintain_order=True)
        .head(k)
        .sort(["query_id", "score_q", "neighbor_id"], descending=[False, True, False])
    )
    return out.to_arrow()
