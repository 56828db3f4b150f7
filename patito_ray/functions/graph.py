"""Distributed graph operators over edge Datasets.

The link-analysis layer of a web-crawl pipeline: PageRank (power
iteration) and connected components over a ``ray.data.Dataset`` of
directed int64 edges ``(src, dst)``. The reference (JakobGM/patito) has
no graph surface; these are engine additions following the house
exchange patterns — ``copartition_apply`` for the one per-iteration
rank↔edge co-location, ``merge_partial_sums`` for every aggregation,
with the usual ≤256 MB adaptive driver fast path (same formula,
exercised separately in tests via ``limit_bytes=0``).

Scale shape (10^12-page crawl):

- edges are materialized ONCE (16 B/row in the object store, spillable)
  and re-read each power iteration; per-iteration state is one narrow
  ``(node, outdeg, rank)`` table — ~20 B/node;
- each iteration moves rank rows (never edges) through ONE co-partition
  exchange, pre-aggregates contributions per ``dst`` INSIDE each
  partition (polars groupby — the combiner before anything moves), and
  merges the partials adaptively;
- dangling mass (rank parked on outdeg==0 nodes) is a per-block partial
  sum — one scalar row per block reaches the driver, never the state.
"""

from __future__ import annotations

import logging
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from patito_ray.stages.agg import (
    _DRIVER_MERGE_BYTES,
    collect_table,
    merge_partial_sums,
    round_half_away,
)

_LOG = logging.getLogger(__name__)

_EDGE_SCHEMA_HINT = (
    "graph edges must be a Dataset with int64 columns %r and %r "
    "(got schema %s) — hash non-integer node ids to int64 first "
    "(the engine's group keys are int64 by invariant)"
)


def _check_edges(edges: Any, src: str, dst: str) -> None:
    schema = edges.schema()
    if schema is None:
        raise ValueError(
            "edge dataset has no schema (zero blocks) — pass "
            "from_arrow(...) of an empty typed table instead"
        )
    names = list(schema.names)
    for col in (src, dst):
        if col not in names:
            raise ValueError(_EDGE_SCHEMA_HINT % (src, dst, schema))
        if not pa.types.is_integer(schema.types[names.index(col)]):
            raise TypeError(_EDGE_SCHEMA_HINT % (src, dst, schema))


_PR_SCHEMA = pa.schema([("node", pa.int64()), ("pr", pa.float64())])
_CC_SCHEMA = pa.schema([("node", pa.int64()), ("root", pa.int64())])


def _coalesce_state(state: Any, num_partitions: int) -> Any:
    """Fold an iteratively-rebuilt narrow state Dataset back to
    partition granularity. Every co-partition / union round MULTIPLIES
    block count (map_groups emits per-group + empty blocks, union
    concatenates block lists) and each later exchange pays per-block
    scheduling: 3 pagerank rounds took a 20k-row state to 975 blocks
    of ~20 rows and made iteration wall time grow 3x per round.
    The guard makes the extra repartition self-limiting — it only
    fires once fragmentation exceeds 2x the partition count."""
    if state.num_blocks() > 2 * num_partitions:
        return state.repartition(num_partitions).materialize()
    return state


def _pagerank_local(
    src: np.ndarray,
    dst: np.ndarray,
    num_iters: int,
    damping: float,
    seed_arr: "np.ndarray | None" = None,
    w_arr: "np.ndarray | None" = None,
) -> pa.Table:
    """Driver fast path: identical formula, vectorized numpy.

    ``bincount`` plays the role of the distributed groupby-sum; the
    dangling-mass and base terms use the exact same float expression
    tree as the distributed path so both land within summation-order
    noise of each other. The uniform branch keeps its original
    expressions byte-for-byte (the pagerank oracle is 1e-9-rounded —
    re-associating ``(1-d)/n`` would shift ulps); the personalized
    branch (``seed_arr``) restarts to ``1/|S|`` on seeds, 0 elsewhere.
    """
    nodes = np.unique(np.concatenate([src, dst]))
    if len(nodes) == 0:
        return _PR_SCHEMA.empty_table()
    n = len(nodes)
    src_idx = np.searchsorted(nodes, src)
    dst_idx = np.searchsorted(nodes, dst)
    if w_arr is None:
        outdeg = np.bincount(src_idx, minlength=n).astype(np.float64)
    else:
        if w_arr.size and int(w_arr.min()) <= 0:
            raise ValueError(
                "pagerank weights must be strictly positive — a zero "
                "weight would make rank*w/out_weight evaluate 0/0=NaN "
                "and poison every downstream rank"
            )
        # total out-WEIGHT per node (exact: int64 sums represented in f64)
        outdeg = np.bincount(src_idx, weights=w_arr.astype(np.float64), minlength=n)
    sender = outdeg > 0

    def _contrib(rank: np.ndarray) -> np.ndarray:
        if w_arr is None:
            per_edge = rank[src_idx] / outdeg[src_idx]
        else:
            # same expression order as the distributed polars kernel:
            # (rank * w) / out_weight
            per_edge = rank[src_idx] * w_arr / outdeg[src_idx]
        return np.bincount(dst_idx, weights=per_edge, minlength=n)

    if seed_arr is None:
        rank = np.full(n, 1.0 / n, dtype=np.float64)
        base = (1.0 - damping) / n
        for _ in range(num_iters):
            w = _contrib(rank)
            dangling = float(rank[~sender].sum())
            rank = base + damping * (w + dangling / n)
    else:
        inv_s = 1.0 / len(seed_arr)
        s_vec = np.where(np.isin(nodes, seed_arr), inv_s, 0.0)
        rank = s_vec.copy()
        base_vec = (1.0 - damping) * s_vec
        for _ in range(num_iters):
            w = _contrib(rank)
            dangling = float(rank[~sender].sum())
            rank = base_vec + damping * (w + dangling * s_vec)
    return pa.table(
        {
            "node": pa.array(nodes.astype(np.int64), type=pa.int64()),
            "pr": pa.array(rank, type=pa.float64()),
        }
    )


def pagerank(
    edges: Any,
    num_iters: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    num_partitions: int | None = None,
    limit_bytes: int = _DRIVER_MERGE_BYTES,
    seeds: Any = None,
    weight: "str | None" = None,
) -> "pa.Table | Any":
    """PageRank by power iteration over a directed edge Dataset.

    ``rank'(v) = (1-d)/N + d * (Σ_{(u,v)∈E} rank(u)/outdeg(u)
    + dangling/N)`` where ``dangling`` is the rank mass parked on
    nodes with no out-edges. Node universe = every id appearing as
    ``src`` or ``dst``; parallel edges and self-loops count like any
    other edge (same as an unrolled SQL formulation).

    ``seeds`` switches to PERSONALIZED PageRank (the TrustRank family:
    propagate trust from a vetted seed set; Gyöngyi et al. 2004):
    restart mass ``s(v) = 1/|S|`` on seeds and 0 elsewhere replaces
    every ``1/N`` — init, base and dangling redistribution — so rank
    can only enter the graph through seeds. The seed id array is
    broadcast once (``ray.put``); the uniform branch's float
    expression tree is untouched.

    ``weight`` names an int64 edge-weight column: contributions become
    ``rank(u)·w(e)/Σw_out(u)`` (anchor-weighted link analysis).
    Weights must be strictly positive (a zero weight would put 0/0=NaN
    into the contribution fold — rejected loudly); only nodes with NO
    out-edges are dangling. Composes with ``seeds``.

    Returns a driver ``pa.Table(node, pr)`` when the edge set fits
    ``limit_bytes``, else a lazy Ray ``Dataset`` with the same columns
    (callers handle both, like :func:`merge_partial_sums`).
    """
    import ray
    import ray.data as rd

    from patito_ray.stages.join import (
        copartition_apply,
        copartition_join,
        default_num_partitions,
    )

    if num_iters < 0:
        raise ValueError(f"num_iters must be >= 0, got {num_iters}")
    if not (0.0 <= damping < 1.0):
        raise ValueError(f"damping must be in [0, 1), got {damping}")
    _check_edges(edges, src, dst)

    seed_arr = None
    if seeds is not None:
        seed_arr = np.unique(np.asarray(list(seeds), dtype=np.int64))
        if len(seed_arr) == 0:
            raise ValueError("personalized pagerank needs a non-empty seed set")

    edges_m = edges.materialize()
    if edges_m.size_bytes() <= limit_bytes:
        cols = [(src, pa.int64()), (dst, pa.int64())]
        if weight is not None:
            cols.append((weight, pa.int64()))
        t = collect_table(edges_m, empty_schema=pa.schema(cols))
        return _pagerank_local(
            t.column(src).to_numpy(zero_copy_only=False).astype(np.int64),
            t.column(dst).to_numpy(zero_copy_only=False).astype(np.int64),
            num_iters,
            damping,
            seed_arr,
            t.column(weight).to_numpy(zero_copy_only=False).astype(np.int64)
            if weight is not None
            else None,
        )

    if num_partitions is None:
        num_partitions = default_num_partitions()

    # one pass → (node, outdeg) for every node in the universe: src rows
    # carry their batch-local out-counts, dst rows a 0 so sink-only
    # nodes exist in the state table (np.unique is the per-batch combiner)
    def deg_partials(t: pa.Table) -> pa.Table:
        s = t.column(src).to_numpy(zero_copy_only=False).astype(np.int64)
        d = t.column(dst).to_numpy(zero_copy_only=False).astype(np.int64)
        if weight is None:
            su, sc = np.unique(s, return_counts=True)
        else:
            w = t.column(weight).to_numpy(zero_copy_only=False).astype(np.int64)
            if w.size and int(w.min()) <= 0:
                raise ValueError(
                    "pagerank weights must be strictly positive — a zero "
                    "weight would make rank*w/out_weight evaluate 0/0=NaN "
                    "and poison every downstream rank"
                )
            su, inv = np.unique(s, return_inverse=True)
            sc = np.bincount(inv, weights=w).astype(np.int64)
        du = np.unique(d)
        return pa.table(
            {
                "node": pa.array(np.concatenate([su, du]), type=pa.int64()),
                "outdeg": pa.array(
                    np.concatenate([sc, np.zeros(len(du), np.int64)]),
                    type=pa.int64(),
                ),
            }
        )

    deg = merge_partial_sums(
        edges_m.map_batches(deg_partials, batch_format="pyarrow", batch_size=None),
        ["node"],
        ["outdeg"],
        limit_bytes=limit_bytes,
    )
    state = rd.from_arrow(deg) if isinstance(deg, pa.Table) else deg
    n = state.count()
    if n == 0:
        return _PR_SCHEMA.empty_table()
    init_rank = 1.0 / n
    base = (1.0 - damping) / n
    if seed_arr is not None:
        _seed_ref = ray.put(seed_arr)
        _inv_s = 1.0 / len(seed_arr)

        def _seed_vec(node_np: np.ndarray) -> np.ndarray:
            import ray as _ray

            return np.where(np.isin(node_np, _ray.get(_seed_ref)), _inv_s, 0.0)

    def add_rank(t: pa.Table) -> pa.Table:
        if seed_arr is None:
            rank0 = np.full(t.num_rows, init_rank, np.float64)
        else:
            rank0 = _seed_vec(
                pc.cast(t.column("node"), pa.int64()).to_numpy(zero_copy_only=False)
            )
        return pa.table(
            {
                "node": pc.cast(t.column("node"), pa.int64()),
                "outdeg": pc.cast(t.column("outdeg"), pa.int64()),
                "rank": pa.array(rank0, type=pa.float64()),
            }
        )

    state = state.map_batches(
        add_rank, batch_format="pyarrow", batch_size=None
    ).materialize()

    def contrib_fn(lt: pa.Table, rt: pa.Table) -> pa.Table:
        # lt = edges (src, dst); rt = state (node, outdeg, rank) — the
        # per-partition combiner: sum contributions per dst BEFORE the
        # partial-merge exchange
        import polars as pl

        contrib = (
            (pl.col("rank") / pl.col("outdeg"))
            if weight is None
            else (pl.col("rank") * pl.col(weight) / pl.col("outdeg"))
        )
        out = (
            pl.from_arrow(lt)
            .join(pl.from_arrow(rt), left_on=src, right_on="node", how="inner")
            .with_columns(contrib.alias("w"))
            .group_by(dst)
            .agg(pl.col("w").sum())
            .select(pl.col(dst).alias("cdst"), pl.col("w"))
        )
        return out.to_arrow()

    def dangle_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "outdeg" not in t.column_names:
            return pa.schema([("w", pa.float64())]).empty_table()
        deg_arr = t.column("outdeg").to_numpy(zero_copy_only=False)
        r = t.column("rank").to_numpy(zero_copy_only=False)
        return pa.table({"w": pa.array([float(r[deg_arr == 0].sum())], type=pa.float64())})

    dangle_schema = pa.schema([("w", pa.float64())])

    for _it in range(num_iters):
        contribs = copartition_apply(
            edges_m,
            state,
            by=src,
            right_by="node",
            part_fn=contrib_fn,
            num_partitions=num_partitions,
        )
        merged = merge_partial_sums(
            contribs, ["cdst"], ["w"], limit_bytes=limit_bytes
        )
        dangling = float(
            collect_table(
                state.map_batches(
                    dangle_partial, batch_format="pyarrow", batch_size=None
                ),
                empty_schema=dangle_schema,
            )
            .column("w")
            .to_numpy(zero_copy_only=False)
            .sum()
        )

        if isinstance(merged, pa.Table):
            # contribution table fits the driver: broadcast it once via
            # the object store instead of a second exchange
            order = pc.sort_indices(merged.column("cdst"))
            cdst = merged.column("cdst").take(order).to_numpy(zero_copy_only=False)
            w_arr = merged.column("w").take(order).to_numpy(zero_copy_only=False)
            ref = ray.put((cdst.astype(np.int64), w_arr.astype(np.float64)))

            def upd_bcast(
                t: pa.Table, _ref=ref, _d=dangling
            ) -> pa.Table:
                keys, ws = ray.get(_ref)
                node = t.column("node").to_numpy(zero_copy_only=False)
                pos = np.searchsorted(keys, node)
                pos_c = np.minimum(pos, max(len(keys) - 1, 0))
                hit = (
                    (keys[pos_c] == node) if len(keys) else np.zeros(len(node), bool)
                )
                w = np.where(hit, ws[pos_c] if len(keys) else 0.0, 0.0)
                if seed_arr is None:
                    rank = base + damping * (w + _d / n)
                else:
                    sv = _seed_vec(np.asarray(node))
                    rank = (1.0 - damping) * sv + damping * (w + _d * sv)
                return pa.table(
                    {
                        "node": t.column("node"),
                        "outdeg": t.column("outdeg"),
                        "rank": pa.array(rank, type=pa.float64()),
                    }
                )

            state = state.map_batches(
                upd_bcast, batch_format="pyarrow", batch_size=None
            ).materialize()
        else:
            # merged is a lazy exchange pipeline consumed by the join's
            # schema fetch AND its tagged-union pass AND (transitively)
            # the state materialize — without this it re-executes ~3x
            # per iteration (dev notes: lazy dataset per-consumer
            # re-execution)
            merged = merged.materialize()
            joined = copartition_join(
                state,
                merged,
                on="node",
                right_on="cdst",
                how="left",
                num_partitions=num_partitions,
            )

            def upd_join(t: pa.Table, _d=dangling) -> pa.Table:
                # joined is a map_groups output — guard the ()-schema
                # empty blocks it can interleave (see dev notes)
                if t.num_rows == 0 or "node" not in t.column_names:
                    return pa.schema(
                        [
                            ("node", pa.int64()),
                            ("outdeg", pa.int64()),
                            ("rank", pa.float64()),
                        ]
                    ).empty_table()
                w = pc.fill_null(pc.cast(t.column("w"), pa.float64()), 0.0)
                w_np = w.to_numpy(zero_copy_only=False)
                if seed_arr is None:
                    rank = base + damping * (w_np + _d / n)
                else:
                    sv = _seed_vec(
                        pc.cast(t.column("node"), pa.int64()).to_numpy(
                            zero_copy_only=False
                        )
                    )
                    rank = (1.0 - damping) * sv + damping * (w_np + _d * sv)
                return pa.table(
                    {
                        "node": pc.cast(t.column("node"), pa.int64()),
                        "outdeg": pc.cast(t.column("outdeg"), pa.int64()),
                        "rank": pa.array(rank, type=pa.float64()),
                    }
                )

            state = joined.map_batches(
                upd_join, batch_format="pyarrow", batch_size=None
            ).materialize()
        state = _coalesce_state(state, num_partitions)

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _PR_SCHEMA.empty_table()
        return pa.table(
            {
                "node": pc.cast(t.column("node"), pa.int64()),
                "pr": pc.cast(t.column("rank"), pa.float64()),
            }
        )

    return state.map_batches(finish, batch_format="pyarrow", batch_size=None)


def connected_components(
    edges: Any,
    src: str = "src",
    dst: str = "dst",
    num_partitions: int | None = None,
    max_iters: int = 100,
    limit_bytes: int = _DRIVER_MERGE_BYTES,
) -> "pa.Table | Any":
    """Connected components of the UNDIRECTED view of an edge Dataset →
    ``(node, root)`` where root = min node id of the component.

    Adaptive like the dedup clustering it generalizes
    (``functions/dedup.py:dedup_near``): an edge set that fits
    ``limit_bytes`` runs driver union-find (any component diameter,
    zero exchanges); larger sets go through the distributed min-label
    propagation (``cluster_pairs_distributed`` — one co-partition join
    + one groupby-Min per round, rounds = component diameter).
    """
    from patito_ray.functions.dedup import cluster_pairs, cluster_pairs_distributed
    from patito_ray.stages.join import default_num_partitions

    _check_edges(edges, src, dst)
    edges_m = edges.materialize()
    if edges_m.size_bytes() <= limit_bytes:
        t = collect_table(
            edges_m, empty_schema=pa.schema([(src, pa.int64()), (dst, pa.int64())])
        )
        if t.num_rows == 0:
            return _CC_SCHEMA.empty_table()
        a = t.column(src).to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column(dst).to_numpy(zero_copy_only=False).astype(np.int64)
        roots = cluster_pairs(list(zip(a.tolist(), b.tolist())))
        nodes = np.fromiter(roots.keys(), dtype=np.int64, count=len(roots))
        order = np.argsort(nodes)
        root_arr = np.fromiter(roots.values(), dtype=np.int64, count=len(roots))
        return pa.table(
            {
                "node": pa.array(nodes[order], type=pa.int64()),
                "root": pa.array(root_arr[order], type=pa.int64()),
            }
        )

    def as_pairs(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "a": pc.cast(t.column(src), pa.int64()),
                "b": pc.cast(t.column(dst), pa.int64()),
            }
        )

    pairs = edges_m.map_batches(as_pairs, batch_format="pyarrow", batch_size=None)
    return cluster_pairs_distributed(
        pairs,
        num_partitions=num_partitions or default_num_partitions(),
        max_iters=max_iters,
    )


def _run_pairs(sorted_keys: np.ndarray, sorted_vals: np.ndarray):
    """All within-run ordered pairs of ``sorted_vals`` (runs = equal
    ``sorted_keys``; input sorted by (key, val)). Vectorized over the
    pair OFFSET, not the pairs: iteration k emits every (v[i], v[i+k])
    whose run still has k elements ahead — max-out-degree iterations of
    O(n) numpy work, no per-run Python. After degree orientation the
    max out-degree is O(sqrt(2m)), which bounds the loop."""
    n = sorted_keys.size
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    _, starts, counts = np.unique(sorted_keys, return_index=True, return_counts=True)
    pos_in_run = np.arange(n, dtype=np.int64) - np.repeat(starts, counts)
    run_count = np.repeat(counts, counts)
    out_a: list[np.ndarray] = []
    out_b: list[np.ndarray] = []
    max_c = int(counts.max())
    for k in range(1, max_c):
        ok = pos_in_run + k < run_count
        if not ok.any():
            break
        idx = np.flatnonzero(ok)
        out_a.append(sorted_vals[idx])
        out_b.append(sorted_vals[idx + k])
    if not out_a:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    return np.concatenate(out_a), np.concatenate(out_b)


def triangle_count(
    edges: Any,
    src: str = "src",
    dst: str = "dst",
    num_partitions: int | None = None,
    limit_bytes: int = _DRIVER_MERGE_BYTES,
    with_wedges: bool = False,
) -> pa.Table:
    """Exact triangle count of the UNDIRECTED simple graph underlying
    an edge Dataset (directions, duplicates and self-loops are
    normalized away). Returns a one-row table ``(triangles, n_edges)``.

    The classic degree-ordered algorithm, expressed in the house
    exchange patterns:

    1. distinct undirected edges — per-batch canonicalize (lo, hi) +
       local dedup, then the adaptive partial-sum merge (16 B/edge,
       driver fast path <= ``limit_bytes``);
    2. degrees — a second partial-sum merge over edge endpoints;
    3. orientation — every node becomes ``(degree << 32) | id`` and
       each edge points low->high in that total order, so max
       out-degree is O(sqrt(2m)) and a hot vertex (a crawl hub with
       10^7 neighbors) generates wedges on its LOW-degree side only —
       the skew defuser that makes step 4 safe at scale. Degrees
       attach via broadcast below ``limit_bytes``, else through two
       co-partition joins;
    4. wedges — one exchange of oriented edges on the source, per-
       partition vectorized pair runs (``_run_pairs``) pre-aggregated
       to (u, v, count) before anything moves;
    5. probe — wedge counts meet oriented edges in ONE composite-key
       co-partition (``copartition_apply``); a wedge is a triangle iff
       its (u, v) is an edge. Partial sums -> one scalar per partition.

    Node ids must be int64 in [0, 2^32) with degree < 2^31 (the packed
    orientation key) — hash bigger id spaces down first.

    ``with_wedges`` adds a ``wedges`` column (Σ d(d−1)/2, the open +
    closed 2-path count) computed from the degree table step 2 already
    built — the global clustering coefficient 3T/wedges then costs no
    extra pass over the edges.
    """
    import polars as pl

    from patito_ray.stages.join import copartition_apply, default_num_partitions

    _check_edges(edges, src, dst)
    if num_partitions is None:
        num_partitions = default_num_partitions()

    # ---- 1. distinct undirected edges ----
    def canon(t: pa.Table) -> pa.Table:
        a = t.column(src).to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column(dst).to_numpy(zero_copy_only=False).astype(np.int64)
        keep = a != b
        a, b = a[keep], b[keep]
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        pairs = np.stack([lo, hi], axis=1)
        pairs = np.unique(pairs, axis=0)
        return pa.table(
            {
                "lo": pa.array(pairs[:, 0], type=pa.int64()),
                "hi": pa.array(pairs[:, 1], type=pa.int64()),
                "one": pa.array(np.ones(len(pairs), dtype=np.int64)),
            }
        )

    canonical = edges.map_batches(canon, batch_format="pyarrow", batch_size=None)
    distinct = merge_partial_sums(canonical, ["lo", "hi"], ["one"], limit_bytes=limit_bytes)
    if isinstance(distinct, pa.Table):
        import ray.data as rd

        distinct = rd.from_arrow(distinct.select(["lo", "hi"]))
    else:
        _lohi = pa.schema([("lo", pa.int64()), ("hi", pa.int64())])
        distinct = distinct.map_batches(
            lambda t: t.select(["lo", "hi"])
            if t.num_rows and "lo" in t.column_names
            else _lohi.empty_table(),
            batch_format="pyarrow",
            batch_size=None,
        )
    distinct = distinct.materialize()
    n_edges = distinct.count()
    if n_edges == 0:
        cols = {"triangles": pa.array([0], type=pa.int64()),
                "n_edges": pa.array([0], type=pa.int64())}
        if with_wedges:
            cols["wedges"] = pa.array([0], type=pa.int64())
        return pa.table(cols)

    # ---- 2. degrees over the simple graph ----
    def deg_partial(t: pa.Table) -> pa.Table:
        v = np.concatenate(
            [
                t.column("lo").to_numpy(zero_copy_only=False),
                t.column("hi").to_numpy(zero_copy_only=False),
            ]
        )
        uniq, counts = np.unique(v, return_counts=True)
        return pa.table(
            {"node": pa.array(uniq.astype(np.int64)),
             "deg": pa.array(counts.astype(np.int64))}
        )

    degrees = merge_partial_sums(
        distinct.map_batches(deg_partial, batch_format="pyarrow", batch_size=None),
        ["node"],
        ["deg"],
        limit_bytes=limit_bytes,
    )

    wedge_total = None
    if with_wedges:
        if isinstance(degrees, pa.Table):
            dd = degrees.column("deg").to_numpy(zero_copy_only=False).astype(np.int64)
            wedge_total = int((dd * (dd - 1) // 2).sum())
        else:
            degrees = degrees.materialize()  # consumed twice below

            def _wedge_partial(t: pa.Table) -> pa.Table:
                if t.num_rows == 0 or "deg" not in t.column_names:
                    return pa.schema([("w", pa.int64())]).empty_table()
                dd = t.column("deg").to_numpy(zero_copy_only=False).astype(np.int64)
                return pa.table({"w": pa.array([int((dd * (dd - 1) // 2).sum())])})

            wt = collect_table(
                degrees.map_batches(
                    _wedge_partial, batch_format="pyarrow", batch_size=None
                ),
                pa.schema([("w", pa.int64())]),
            )
            wedge_total = int(pc.sum(wt.column("w")).as_py() or 0)

    def _pack(deg: np.ndarray, node: np.ndarray) -> np.ndarray:
        if deg.size and int(deg.max()) >= 1 << 31:
            raise ValueError("triangle_count: degree >= 2^31 cannot pack")
        if node.size and (int(node.min()) < 0 or int(node.max()) >= 1 << 32):
            raise ValueError(
                "triangle_count: node ids must be in [0, 2^32) for the "
                "packed orientation key — hash larger id spaces first"
            )
        return ((deg.astype(np.uint64) << np.uint64(32)) | node.astype(np.uint64)).view(
            np.int64
        )

    # ---- 3. orient low->high in (degree, id) order ----
    if isinstance(degrees, pa.Table):
        import ray

        nodes_np = degrees.column("node").to_numpy(zero_copy_only=False)
        degs_np = degrees.column("deg").to_numpy(zero_copy_only=False)
        sort_idx = np.argsort(nodes_np)  # searchsorted needs sorted nodes
        deg_ref = ray.put({"node": nodes_np[sort_idx], "deg": degs_np[sort_idx]})

        def orient(t: pa.Table) -> pa.Table:
            import ray as _ray

            d = _ray.get(deg_ref)
            lo = t.column("lo").to_numpy(zero_copy_only=False)
            hi = t.column("hi").to_numpy(zero_copy_only=False)
            dlo = d["deg"][np.searchsorted(d["node"], lo)]
            dhi = d["deg"][np.searchsorted(d["node"], hi)]
            plo = _pack(dlo, lo)
            phi = _pack(dhi, hi)
            return pa.table(
                {
                    "ea": pa.array(np.minimum(plo, phi), type=pa.int64()),
                    "eb": pa.array(np.maximum(plo, phi), type=pa.int64()),
                }
            )

        oriented = distinct.map_batches(orient, batch_format="pyarrow", batch_size=None)
    else:
        deg_ds = degrees.map_batches(
            lambda t: t.rename_columns(["node", "deg"]),
            batch_format="pyarrow",
            batch_size=None,
        )

        def attach_lo(lt: pa.Table, rt: pa.Table) -> pa.Table:
            j = pl.from_arrow(lt).join(
                pl.from_arrow(rt), left_on="lo", right_on="node", how="inner"
            )
            return j.rename({"deg": "dlo"}).to_arrow()

        with_lo = copartition_apply(
            distinct, deg_ds, "lo", "node", attach_lo, num_partitions=num_partitions
        )

        deg_ds2 = degrees.map_batches(
            lambda t: t.rename_columns(["node2", "deg2"]),
            batch_format="pyarrow",
            batch_size=None,
        )

        def attach_hi(lt: pa.Table, rt: pa.Table) -> pa.Table:
            j = pl.from_arrow(lt).join(
                pl.from_arrow(rt), left_on="hi", right_on="node2", how="inner"
            )
            return j.rename({"deg2": "dhi"}).to_arrow()

        with_both = copartition_apply(
            with_lo, deg_ds2, "hi", "node2", attach_hi, num_partitions=num_partitions
        )

        def pack_both(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table(
                    {"ea": pa.array([], type=pa.int64()),
                     "eb": pa.array([], type=pa.int64())}
                )
            plo = _pack(
                t.column("dlo").to_numpy(zero_copy_only=False),
                t.column("lo").to_numpy(zero_copy_only=False),
            )
            phi = _pack(
                t.column("dhi").to_numpy(zero_copy_only=False),
                t.column("hi").to_numpy(zero_copy_only=False),
            )
            return pa.table(
                {
                    "ea": pa.array(np.minimum(plo, phi), type=pa.int64()),
                    "eb": pa.array(np.maximum(plo, phi), type=pa.int64()),
                }
            )

        oriented = with_both.map_batches(pack_both, batch_format="pyarrow", batch_size=None)

    oriented = oriented.materialize()

    # ---- 4. wedges: exchange on source, vectorized pair runs ----
    def add_part(t: pa.Table) -> pa.Table:
        from patito_ray.stages.exchange import hash_partition_ids

        part = hash_partition_ids(t.column("ea"), num_partitions, "triangle wedge key")
        return t.append_column("part", pa.array(part, type=pa.int64()))

    def wedge_partials(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table(
                {"wa": pa.array([], type=pa.int64()),
                 "wb": pa.array([], type=pa.int64()),
                 "wc": pa.array([], type=pa.int64())}
            )
        k = group.column("ea").to_numpy(zero_copy_only=False)
        v = group.column("eb").to_numpy(zero_copy_only=False)
        order = np.lexsort((v, k))
        a, b = _run_pairs(k[order], v[order])
        if a.size == 0:
            return pa.table(
                {"wa": pa.array([], type=pa.int64()),
                 "wb": pa.array([], type=pa.int64()),
                 "wc": pa.array([], type=pa.int64())}
            )
        # pre-aggregate wedge multiplicities before the probe exchange
        return (
            pl.DataFrame({"wa": a, "wb": b})
            .group_by(["wa", "wb"])
            .agg(pl.len().cast(pl.Int64).alias("wc"))
            .to_arrow()
        )

    # materialize: copartition_apply fetches .schema(), which EXECUTES
    # an all-to-all pipeline (dev notes) — unmaterialized, the wedge
    # exchange would run twice
    wedges = (
        oriented.map_batches(add_part, batch_format="pyarrow", batch_size=None)
        .groupby("part")
        .map_groups(wedge_partials, batch_format="pyarrow")
        .materialize()
    )

    # ---- 5. probe wedges against oriented edges ----
    def probe(lt: pa.Table, rt: pa.Table) -> pa.Table:
        if lt.num_rows == 0 or rt.num_rows == 0:
            return pa.table({"tri": pa.array([0], type=pa.int64())})
        j = pl.from_arrow(lt).join(
            pl.from_arrow(rt),
            left_on=["wa", "wb"],
            right_on=["ea", "eb"],
            how="inner",
        )
        return pa.table(
            {"tri": pa.array([int(j["wc"].sum()) if j.height else 0], type=pa.int64())}
        )

    partial_tris = copartition_apply(
        wedges, oriented, ["wa", "wb"], ["ea", "eb"], probe,
        num_partitions=num_partitions,
    )
    total = collect_table(partial_tris, pa.schema([("tri", pa.int64())]))
    tri = int(pc.sum(total.column("tri")).as_py() or 0)
    cols = {"triangles": pa.array([tri], type=pa.int64()),
            "n_edges": pa.array([n_edges], type=pa.int64())}
    if with_wedges:
        cols["wedges"] = pa.array([wedge_total], type=pa.int64())
    return pa.table(cols)


_KC_SCHEMA = pa.schema([("node", pa.int64())])

#: per-round peeled-node sets above this count switch from an is_in
#: broadcast to a co-partitioned semi filter (8 B/id, ~256 MB)
_KCORE_BROADCAST_IDS = 32_000_000


def k_core(
    edges: Any,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 1000,
) -> Any:
    """Nodes of the ``k``-core (the maximal subgraph where every node
    has >= k DISTINCT neighbours, self-loops ignored) ->
    Dataset[node:int64].

    Distributed iterative peeling: symmetrize + simple-graph dedup once
    (one hash-partition exchange); each round computes distinct-neighbour
    degrees as mergeable partials (exchange bounded by the node count),
    peels nodes below ``k``, and drops their edges. The peeling FRONTIER
    (that round's removed set) is broadcast via ``ray.put`` while it
    fits ~256 MB — past that the filter switches to a co-partitioned
    semi pass, so a first round that sheds most of a power-law graph
    still never lands on the driver. Converges in core-number rounds
    (<< ``max_iters``; loud error if exceeded).
    """
    import ray

    from patito_ray.functions.dedup import _splitmix
    from patito_ray.stages.join import default_num_partitions

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    _check_edges(edges, src, dst)
    P = default_num_partitions()

    def sym(t: pa.Table) -> pa.Table:
        u = pc.cast(t.column(src), pa.int64()).to_numpy(zero_copy_only=False)
        v = pc.cast(t.column(dst), pa.int64()).to_numpy(zero_copy_only=False)
        keep = u != v
        u, v = u[keep], v[keep]
        uu = np.concatenate([u, v])
        vv = np.concatenate([v, u])
        part = (
            _splitmix(uu.view(np.uint64)) % np.uint64(P)
        ).view(np.int64)
        return pa.table(
            {
                "part": pa.array(part, type=pa.int64()),
                "u": pa.array(uu, type=pa.int64()),
                "v": pa.array(vv, type=pa.int64()),
            }
        )

    def dedup_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "u" not in t.column_names:
            return pa.schema([("u", pa.int64()), ("v", pa.int64())]).empty_table()
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        order = np.lexsort((v, u))
        u, v = u[order], v[order]
        keep = np.empty(len(u), dtype=bool)
        keep[0] = True
        keep[1:] = (u[1:] != u[:-1]) | (v[1:] != v[:-1])
        return pa.table(
            {"u": pa.array(u[keep], type=pa.int64()), "v": pa.array(v[keep], type=pa.int64())}
        )

    und = (
        edges.map_batches(sym, batch_format="pyarrow", batch_size=None)
        .groupby("part")
        .map_groups(dedup_part, batch_format="pyarrow")
        .materialize()
    )

    from patito_ray.stages.agg import collect_table, merge_partial_sums

    def deg_partial(t: pa.Table) -> pa.Table:
        import polars as pl

        if t.num_rows == 0 or "u" not in t.column_names:
            return pa.schema([("u", pa.int64()), ("deg", pa.int64())]).empty_table()
        return (
            pl.from_arrow(t.select(["u"]))
            .group_by("u")
            .agg(pl.len().cast(pl.Int64).alias("deg"))
            .to_arrow()
        )

    for _round in range(max_iters):
        degs = merge_partial_sums(
            und.map_batches(deg_partial, batch_format="pyarrow", batch_size=None),
            ["u"],
            ["deg"],
        )
        if not isinstance(degs, pa.Table):
            degs = degs.map_batches(
                lambda t: t.filter(pc.less(t.column("deg"), k))
                if t.num_rows
                else t,
                batch_format="pyarrow",
                batch_size=None,
            )
            bad_tab = collect_table(
                degs,
                empty_schema=pa.schema([("u", pa.int64()), ("deg", pa.int64())]),
            )
            bad = bad_tab.column("u").combine_chunks()
        else:
            bad = degs.filter(
                pc.less(degs.column("deg"), k)
            ).column("u").combine_chunks()
        if len(bad) == 0:
            break
        if len(bad) <= _KCORE_BROADCAST_IDS:
            ref = ray.put(bad)

            def drop(t: pa.Table, _ref=ref) -> pa.Table:
                # map_groups upstream can interleave empty ()-schema
                # blocks (see dev notes) — same guard as deg_partial
                if t.num_rows == 0 or "u" not in t.column_names:
                    return pa.schema(
                        [("u", pa.int64()), ("v", pa.int64())]
                    ).empty_table()
                bad_ids = ray.get(_ref)
                keep = pc.and_(
                    pc.invert(pc.is_in(t.column("u"), value_set=bad_ids)),
                    pc.invert(pc.is_in(t.column("v"), value_set=bad_ids)),
                )
                return t.filter(keep)

            und = _coalesce_state(
                und.map_batches(
                    drop, batch_format="pyarrow", batch_size=None
                ).materialize(),
                P,
            )
        else:
            # frontier too big to broadcast: two co-partitioned anti
            # passes (u side, then v side)
            import ray.data as rd

            from patito_ray.stages.join import copartition_apply

            bad_ds = rd.from_arrow(pa.table({"_bad": bad}))

            def anti(side: str):
                def fn(lt: pa.Table, rt: pa.Table) -> pa.Table:
                    return lt.filter(
                        pc.invert(
                            pc.is_in(
                                lt.column(side),
                                value_set=rt.column("_bad").combine_chunks(),
                            )
                        )
                    )

                return fn

            # materialize between passes: the second copartition_apply
            # fetches .schema(), which EXECUTES the first pass's
            # all-to-all (dev notes) — unmaterialized it would run twice
            und = copartition_apply(
                und, bad_ds, by="u", right_by="_bad", part_fn=anti("u")
            ).materialize()
            und = _coalesce_state(
                copartition_apply(
                    und, bad_ds, by="v", right_by="_bad", part_fn=anti("v")
                ).materialize(),
                P,
            )
    else:
        raise RuntimeError(
            f"k_core did not converge within max_iters={max_iters} rounds"
        )

    def nodes(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "u" not in t.column_names:
            return _KC_SCHEMA.empty_table()
        return pa.table(
            {"node": pc.unique(t.column("u").combine_chunks())}, schema=_KC_SCHEMA
        )

    def nodes_dedup(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "node" not in t.column_names:
            return _KC_SCHEMA.empty_table()
        return pa.table(
            {"node": pc.unique(t.column("node").combine_chunks())},
            schema=_KC_SCHEMA,
        )

    def add_node_part(t: pa.Table) -> pa.Table:
        n = t.column("node").to_numpy(zero_copy_only=False)
        part = (_splitmix(n.view(np.uint64)) % np.uint64(P)).view(np.int64)
        return t.append_column("part", pa.array(part, type=pa.int64()))

    return (
        und.map_batches(nodes, batch_format="pyarrow", batch_size=None)
        .map_batches(add_node_part, batch_format="pyarrow", batch_size=None)
        .groupby("part")
        .map_groups(nodes_dedup, batch_format="pyarrow")
    )


_BFS_SCHEMA = pa.schema([("node", pa.int64()), ("dist", pa.int64())])
_BFS_BROADCAST_IDS = 32_000_000


def bfs_hops(
    edges: Any,
    seeds: Any,
    max_hops: int,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "node",
    broadcast_limit_ids: int = _BFS_BROADCAST_IDS,
) -> Any:
    """Multi-source BFS over the DIRECTED edge set: minimum hop
    distance (0..``max_hops``) from any seed to every reachable node ->
    Dataset[node:int64, dist:int64] (one row per reached node).

    Frontier expansion runs ``max_hops`` rounds, each adaptive like
    ``k_core``'s peel filter:

    - while visited+frontier fit ``broadcast_limit_ids`` the round is
      ONE streaming pass over the (once-materialized) edges with the
      frontier broadcast via ``ray.put`` — per-batch unique dsts merge
      on the driver with numpy set ops, ZERO all-to-all exchanges;
    - past the limit the round switches permanently to co-partitioned
      semi expansion + hash-partition dedup + co-partitioned anti
      against the visited Dataset, so nothing ever lands on the driver.

    Hub-heavy graphs whose single-round expansion exceeds driver memory
    even with a small frontier should lower ``broadcast_limit_ids``
    (0 forces the distributed branch — the test hook).
    """
    import ray
    import ray.data as rd

    from patito_ray.functions.dedup import _splitmix
    from patito_ray.stages.agg import collect_table
    from patito_ray.stages.join import copartition_apply, default_num_partitions

    if max_hops < 0:
        raise ValueError(f"max_hops must be >= 0, got {max_hops}")
    _check_edges(edges, src, dst)
    P = default_num_partitions()
    edges = edges.materialize()

    def _uniq_nodes(t: pa.Table, col: str) -> pa.Table:
        if t.num_rows == 0 or col not in t.column_names:
            return pa.schema([("node", pa.int64())]).empty_table()
        return pa.table(
            {"node": pc.unique(pc.cast(t.column(col), pa.int64()).combine_chunks())}
        )

    # ---- seed frontier ----------------------------------------------
    seed_count = seeds.count()
    driver_mode = seed_count <= broadcast_limit_ids
    levels_np: "list[tuple[int, np.ndarray]]" = []
    levels_ds: "list[Any]" = []

    def _node_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "node" not in t.column_names:
            return pa.schema(
                [("part", pa.int64()), ("node", pa.int64())]
            ).empty_table()
        n = t.column("node").to_numpy(zero_copy_only=False)
        part = (_splitmix(n.view(np.uint64)) % np.uint64(P)).view(np.int64)
        return pa.table(
            {
                "part": pa.array(part, type=pa.int64()),
                "node": pa.array(n, type=pa.int64()),
            }
        )

    def _dedup_nodes(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "node" not in t.column_names:
            return pa.schema([("node", pa.int64())]).empty_table()
        return pa.table({"node": pc.unique(t.column("node").combine_chunks())})

    if driver_mode:
        seed_tab = collect_table(
            seeds.map_batches(
                lambda t, c=seed_col: _uniq_nodes(t, c),
                batch_format="pyarrow",
                batch_size=None,
            ),
            empty_schema=pa.schema([("node", pa.int64())]),
        )
        frontier_np = np.unique(
            seed_tab.column("node").to_numpy(zero_copy_only=False)
        )
        visited_np = frontier_np
        levels_np.append((0, frontier_np))
        frontier_ds = visited_ds = None
        frontier_count = visited_count = len(frontier_np)
    else:
        frontier_ds = (
            seeds.map_batches(
                lambda t, c=seed_col: _uniq_nodes(t, c),
                batch_format="pyarrow",
                batch_size=None,
            )
            .map_batches(_node_part, batch_format="pyarrow", batch_size=None)
            .groupby("part")
            .map_groups(_dedup_nodes, batch_format="pyarrow")
            .materialize()
        )
        visited_ds = frontier_ds
        levels_ds.append((0, frontier_ds))
        frontier_np = visited_np = None
        frontier_count = visited_count = frontier_ds.count()

    for dist in range(1, max_hops + 1):
        if frontier_count == 0:
            break
        if driver_mode and visited_count + frontier_count > broadcast_limit_ids:
            # one-way switch: lift driver state into Datasets
            driver_mode = False
            frontier_ds = rd.from_arrow(
                pa.table({"node": pa.array(frontier_np, type=pa.int64())})
            )
            visited_ds = rd.from_arrow(
                pa.table({"node": pa.array(visited_np, type=pa.int64())})
            )
            frontier_np = visited_np = None

        if driver_mode:
            ref = ray.put(pa.array(frontier_np, type=pa.int64()))

            def expand(t: pa.Table, _ref=ref) -> pa.Table:
                if t.num_rows == 0:
                    return pa.schema([("node", pa.int64())]).empty_table()
                hit = pc.is_in(
                    pc.cast(t.column(src), pa.int64()), value_set=ray.get(_ref)
                )
                return pa.table(
                    {
                        "node": pc.unique(
                            pc.cast(
                                t.filter(hit).column(dst), pa.int64()
                            ).combine_chunks()
                        )
                    }
                )

            out = collect_table(
                edges.map_batches(
                    expand, batch_format="pyarrow", batch_size=None
                ),
                empty_schema=pa.schema([("node", pa.int64())]),
            )
            reached = np.unique(out.column("node").to_numpy(zero_copy_only=False))
            frontier_np = reached[
                ~np.isin(reached, visited_np, assume_unique=True)
            ]
            frontier_count = len(frontier_np)
            if frontier_count:
                visited_np = np.union1d(visited_np, frontier_np)
                visited_count = len(visited_np)
                levels_np.append((dist, frontier_np))
        else:

            def semi_dst(lt: pa.Table, rt: pa.Table) -> pa.Table:
                if lt.num_rows == 0 or rt.num_rows == 0:
                    return pa.schema([("node", pa.int64())]).empty_table()
                hit = pc.is_in(
                    pc.cast(lt.column(src), pa.int64()),
                    value_set=rt.column("_front").combine_chunks(),
                )
                return pa.table(
                    {
                        "node": pc.unique(
                            pc.cast(
                                lt.filter(hit).column(dst), pa.int64()
                            ).combine_chunks()
                        )
                    }
                )

            def _as_front(t: pa.Table) -> pa.Table:
                if t.num_rows == 0 or "node" not in t.column_names:
                    return pa.schema([("_front", pa.int64())]).empty_table()
                return pa.table({"_front": t.column("node")})

            front_r = frontier_ds.map_batches(
                _as_front, batch_format="pyarrow", batch_size=None
            )
            # semi_dst already dedups per partition; the cross-partition
            # dedup FUSES into the anti exchange below (both hash on
            # node), saving one all-to-all per round
            reached_ds = copartition_apply(
                edges, front_r, by=src, right_by="_front", part_fn=semi_dst
            ).materialize()

            def anti(lt: pa.Table, rt: pa.Table) -> pa.Table:
                if lt.num_rows == 0 or "node" not in lt.column_names:
                    return pa.schema([("node", pa.int64())]).empty_table()
                uniq = pc.unique(lt.column("node").combine_chunks())
                if rt.num_rows == 0:
                    return pa.table({"node": uniq})
                return pa.table(
                    {
                        "node": uniq.filter(
                            pc.invert(
                                pc.is_in(
                                    uniq,
                                    value_set=rt.column("_vis").combine_chunks(),
                                )
                            )
                        )
                    }
                )

            def _as_vis(t: pa.Table) -> pa.Table:
                if t.num_rows == 0 or "node" not in t.column_names:
                    return pa.schema([("_vis", pa.int64())]).empty_table()
                return pa.table({"_vis": t.column("node")})

            vis_r = visited_ds.map_batches(
                _as_vis, batch_format="pyarrow", batch_size=None
            )
            frontier_ds = copartition_apply(
                reached_ds, vis_r, by="node", right_by="_vis", part_fn=anti
            ).materialize()
            frontier_count = frontier_ds.count()
            if frontier_count:
                visited_ds = _coalesce_state(
                    visited_ds.union(frontier_ds).materialize(), P
                )
                visited_count += frontier_count
                levels_ds.append((dist, frontier_ds))

    # ---- assemble [node, dist] --------------------------------------
    parts: "list[Any]" = []
    if levels_np:
        tab = pa.table(
            {
                "node": pa.array(
                    np.concatenate([f for _, f in levels_np]), type=pa.int64()
                ),
                "dist": pa.array(
                    np.concatenate(
                        [np.full(len(f), d, dtype=np.int64) for d, f in levels_np]
                    ),
                    type=pa.int64(),
                ),
            },
            schema=_BFS_SCHEMA,
        )
        parts.append(rd.from_arrow(tab))
    for d, fds in levels_ds:

        def tag(t: pa.Table, _d=d) -> pa.Table:
            if t.num_rows == 0 or "node" not in t.column_names:
                return _BFS_SCHEMA.empty_table()
            return pa.table(
                {
                    "node": t.column("node"),
                    "dist": pa.array(
                        np.full(t.num_rows, _d, dtype=np.int64), type=pa.int64()
                    ),
                },
                schema=_BFS_SCHEMA,
            )

        parts.append(
            fds.map_batches(tag, batch_format="pyarrow", batch_size=None)
        )
    if not parts:
        return rd.from_arrow(_BFS_SCHEMA.empty_table())
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def sssp_hops(
    edges: Any,
    seeds: Any,
    max_hops: int,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    seed_col: str = "node",
    broadcast_limit_ids: int = _BFS_BROADCAST_IDS,
) -> Any:
    """Multi-source bounded-hop WEIGHTED shortest path (Bellman-Ford,
    ``max_hops`` relaxation rounds) over the directed edge set with
    int64 edge weights -> Dataset[node:int64, dist:int64] (minimum
    total weight over any path of <= ``max_hops`` edges from any seed).

    Same adaptive two-branch shape as :func:`bfs_hops`:

    - while the distance table fits ``broadcast_limit_ids`` ids, each
      round is ONE streaming pass over the (once-materialized) edges
      with the frontier broadcast via ``ray.put``; batches pre-min
      candidates per dst before a bounded driver merge;
    - past the limit the round switches permanently to co-partitioned
      relaxation (edges x frontier on ``hash(src)``) followed by ONE
      fused improvement exchange (candidates x distance table on
      ``hash(node)``) that both updates the table and extracts the new
      frontier — 2 all-to-alls per round, nothing corpus-sized on the
      driver. ``broadcast_limit_ids=0`` forces this branch (test hook).

    Unlike BFS, a node can be re-relaxed in a later round with a
    smaller total weight, so rounds track IMPROVEMENTS (strict ``<``),
    not first-visits.
    """
    import polars as pl
    import ray
    import ray.data as rd

    from patito_ray.stages.agg import collect_table
    from patito_ray.stages.join import copartition_apply

    if max_hops < 0:
        raise ValueError(f"max_hops must be >= 0, got {max_hops}")
    _check_edges(edges, src, dst)
    if weight not in edges.schema().names:
        raise ValueError(f"edges has no weight column {weight!r}")
    edges = edges.materialize()

    def _seed_tab(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or seed_col not in t.column_names:
            return _BFS_SCHEMA.empty_table()
        u = pc.unique(pc.cast(t.column(seed_col), pa.int64()).combine_chunks())
        return pa.table(
            {"node": u, "dist": pa.array(np.zeros(len(u), np.int64))},
            schema=_BFS_SCHEMA,
        )

    seeds_p = seeds.map_batches(_seed_tab, batch_format="pyarrow", batch_size=None)
    seed_count = seeds.count()
    driver_mode = seed_count <= broadcast_limit_ids

    def _min_per_node(nodes: np.ndarray, dists: np.ndarray):
        order = np.lexsort((dists, nodes))
        n, d = nodes[order], dists[order]
        first = np.ones(len(n), dtype=bool)
        first[1:] = n[1:] != n[:-1]
        return n[first], d[first]

    if driver_mode:
        st = collect_table(seeds_p, empty_schema=_BFS_SCHEMA)
        dn, dd = _min_per_node(
            st.column("node").to_numpy(zero_copy_only=False),
            st.column("dist").to_numpy(zero_copy_only=False),
        )
        fn, fd = dn, dd
        d_ds = f_ds = None
        frontier_count = table_count = len(dn)
    else:
        from patito_ray.stages.agg import merge_partial_mins

        merged0 = merge_partial_mins(seeds_p, ["node"], ["dist"], limit_bytes=0)
        d_ds = f_ds = (
            merged0 if not isinstance(merged0, pa.Table) else rd.from_arrow(merged0)
        ).materialize()
        dn = dd = fn = fd = None
        frontier_count = table_count = d_ds.count()

    for _ in range(max_hops):
        if frontier_count == 0:
            break
        if driver_mode and table_count + frontier_count > broadcast_limit_ids:
            driver_mode = False
            d_ds = rd.from_arrow(
                pa.table(
                    {"node": pa.array(dn, pa.int64()), "dist": pa.array(dd, pa.int64())},
                    schema=_BFS_SCHEMA,
                )
            )
            f_ds = rd.from_arrow(
                pa.table(
                    {"node": pa.array(fn, pa.int64()), "dist": pa.array(fd, pa.int64())},
                    schema=_BFS_SCHEMA,
                )
            )
            dn = dd = fn = fd = None

        if driver_mode:
            ref = ray.put({"n": fn, "d": fd})

            def relax(t: pa.Table, _ref=ref) -> pa.Table:
                if t.num_rows == 0:
                    return _BFS_SCHEMA.empty_table()
                f = ray.get(_ref)
                if len(f["n"]) == 0:
                    return _BFS_SCHEMA.empty_table()
                s = pc.cast(t.column(src), pa.int64()).to_numpy(zero_copy_only=False)
                idx = np.minimum(
                    np.searchsorted(f["n"], s), len(f["n"]) - 1
                )
                hit = f["n"][idx] == s
                if not hit.any():
                    return _BFS_SCHEMA.empty_table()
                dsts = pc.cast(t.column(dst), pa.int64()).to_numpy(
                    zero_copy_only=False
                )[hit]
                cand = (
                    f["d"][idx[hit]]
                    + pc.cast(t.column(weight), pa.int64()).to_numpy(
                        zero_copy_only=False
                    )[hit]
                )
                cn, cd = _min_per_node(dsts, cand)
                return pa.table(
                    {"node": pa.array(cn, pa.int64()), "dist": pa.array(cd, pa.int64())},
                    schema=_BFS_SCHEMA,
                )

            out = collect_table(
                edges.map_batches(relax, batch_format="pyarrow", batch_size=None),
                empty_schema=_BFS_SCHEMA,
            )
            cn, cd = _min_per_node(
                out.column("node").to_numpy(zero_copy_only=False),
                out.column("dist").to_numpy(zero_copy_only=False),
            )
            if len(cn) == 0:
                frontier_count = 0
                continue
            pos = np.minimum(np.searchsorted(dn, cn), len(dn) - 1)
            known = dn[pos] == cn
            imp_known = known & (cd < dd[pos])
            dd[pos[imp_known]] = cd[imp_known]
            new = ~known
            if new.any():
                dn = np.concatenate([dn, cn[new]])
                dd = np.concatenate([dd, cd[new]])
                order = np.argsort(dn)
                dn, dd = dn[order], dd[order]
            keep = imp_known | new
            fn, fd = cn[keep], cd[keep]
            frontier_count = len(fn)
            table_count = len(dn)
        else:

            def _as_front(t: pa.Table) -> pa.Table:
                if t.num_rows == 0 or "node" not in t.column_names:
                    return pa.schema(
                        [("_fnode", pa.int64()), ("_fdist", pa.int64())]
                    ).empty_table()
                return pa.table(
                    {"_fnode": t.column("node"), "_fdist": t.column("dist")}
                )

            def relax_part(lt: pa.Table, rt: pa.Table) -> pa.Table:
                if lt.num_rows == 0 or rt.num_rows == 0:
                    return pa.schema(
                        [("_cnode", pa.int64()), ("_cdist", pa.int64())]
                    ).empty_table()
                e = pl.from_arrow(lt).select(
                    pl.col(src).cast(pl.Int64).alias("_s"),
                    pl.col(dst).cast(pl.Int64).alias("_cnode"),
                    pl.col(weight).cast(pl.Int64).alias("_w"),
                )
                f = pl.from_arrow(rt)
                j = e.join(f, left_on="_s", right_on="_fnode", how="inner")
                return (
                    j.select(
                        "_cnode", (pl.col("_w") + pl.col("_fdist")).alias("_cdist")
                    )
                    .group_by("_cnode")
                    .agg(pl.col("_cdist").min())
                    .to_arrow()
                )

            # materialize: the improvement exchange below fetches this
            # dataset's schema, which would EXECUTE the whole relax
            # all-to-all once, and .materialize() would run it AGAIN
            # (dev-notes schema-fetch fact; bfs_hops does the same)
            cands = copartition_apply(
                edges,
                f_ds.map_batches(_as_front, batch_format="pyarrow", batch_size=None),
                by=src,
                right_by="_fnode",
                part_fn=relax_part,
            ).materialize()

            def improve(ct: pa.Table, dt: pa.Table) -> pa.Table:
                imp_schema = pa.schema(
                    [("node", pa.int64()), ("dist", pa.int64()), ("imp", pa.bool_())]
                )
                have_c = ct.num_rows > 0 and "_cnode" in ct.column_names
                have_d = dt.num_rows > 0 and "node" in dt.column_names
                if not have_c and not have_d:
                    return imp_schema.empty_table()
                if not have_c:
                    d = pl.from_arrow(dt)
                    return (
                        d.with_columns(imp=pl.lit(False)).to_arrow().cast(imp_schema)
                    )
                c = (
                    pl.from_arrow(ct)
                    .group_by("_cnode")
                    .agg(pl.col("_cdist").min())
                )
                d = (
                    pl.from_arrow(dt)
                    if have_d
                    else pl.DataFrame(
                        schema={"node": pl.Int64, "dist": pl.Int64}
                    )
                )
                j = d.join(c, left_on="node", right_on="_cnode", how="full")
                out = j.select(
                    node=pl.coalesce(pl.col("node"), pl.col("_cnode")),
                    dist=pl.min_horizontal("dist", "_cdist"),
                    imp=(
                        pl.col("dist").is_null()
                        | (pl.col("_cdist") < pl.col("dist"))
                    ).fill_null(False),
                )
                return out.to_arrow().cast(imp_schema)

            merged = copartition_apply(
                cands, d_ds, by="_cnode", right_by="node", part_fn=improve
            ).materialize()

            def _keep_table(t: pa.Table) -> pa.Table:
                if t.num_rows == 0 or "node" not in t.column_names:
                    return _BFS_SCHEMA.empty_table()
                return pa.table(
                    {"node": t.column("node"), "dist": t.column("dist")},
                    schema=_BFS_SCHEMA,
                )

            def _keep_front(t: pa.Table) -> pa.Table:
                if t.num_rows == 0 or "node" not in t.column_names:
                    return _BFS_SCHEMA.empty_table()
                f = t.filter(t.column("imp").combine_chunks())
                return pa.table(
                    {"node": f.column("node"), "dist": f.column("dist")},
                    schema=_BFS_SCHEMA,
                )

            from patito_ray.stages.join import default_num_partitions as _dnp

            d_ds = _coalesce_state(
                merged.map_batches(
                    _keep_table, batch_format="pyarrow", batch_size=None
                ).materialize(),
                _dnp(),
            )
            f_ds = _coalesce_state(
                merged.map_batches(
                    _keep_front, batch_format="pyarrow", batch_size=None
                ).materialize(),
                _dnp(),
            )
            frontier_count = f_ds.count()
            table_count = d_ds.count()

    if driver_mode:
        return rd.from_arrow(
            pa.table(
                {"node": pa.array(dn, pa.int64()), "dist": pa.array(dd, pa.int64())},
                schema=_BFS_SCHEMA,
            )
        )
    return d_ds


def degree_assortativity(
    edges: Any,
    src: str = "src",
    dst: str = "dst",
    limit_bytes: int = _DRIVER_MERGE_BYTES,
) -> pa.Table:
    """Bipartite degree assortativity: Pearson correlation between the
    two endpoint degrees across the DISTINCT edge set (src and dst live
    in separate node spaces — a customer×item or order×part graph).
    Returns one row of the six exact integer moments
    ``(m, sx, sy, sxy, sxx, syy)`` plus ``assortativity`` (the one
    float expression, rounded once at 1e-6).

    Shape for scale: three of the five moments never touch an edge
    join — ``Σ deg_x`` over edges equals ``Σ deg²`` over src nodes (a
    node of degree d appears on d edges), and ``Σ deg_x²`` equals
    ``Σ deg³`` — so they ride the narrow degree tables. Only
    ``Σ deg_x·deg_y`` needs degrees attached to edges: broadcast
    (``ray.put`` once, searchsorted per batch) when the degree tables
    fit ``limit_bytes``, else two co-partition exchanges with a
    materialize between them (a copartition output feeding another must
    be materialized — dev notes). Driver state is O(1): six integers.
    """
    import ray

    from patito_ray.stages.join import copartition_apply

    _check_edges(edges, src, dst)

    # ---- 1. distinct edges (per-batch local dedup, one narrow merge) ----
    def ded(t: pa.Table) -> pa.Table:
        a = t.column(src).to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column(dst).to_numpy(zero_copy_only=False).astype(np.int64)
        pairs = np.unique(np.stack([a, b], axis=1), axis=0)
        return pa.table(
            {
                "s": pa.array(pairs[:, 0], type=pa.int64()),
                "d": pa.array(pairs[:, 1], type=pa.int64()),
                "one": pa.array(np.ones(len(pairs), dtype=np.int64)),
            }
        )

    _sd = pa.schema([("s", pa.int64()), ("d", pa.int64())])
    distinct = merge_partial_sums(
        edges.map_batches(ded, batch_format="pyarrow", batch_size=None),
        ["s", "d"],
        ["one"],
        limit_bytes=limit_bytes,
    )
    if isinstance(distinct, pa.Table):
        import ray.data as rd

        distinct = rd.from_arrow(
            distinct.select(["s", "d"]) if distinct.num_rows else _sd.empty_table()
        )
    else:
        distinct = distinct.map_batches(
            lambda t: t.select(["s", "d"])
            if t.num_rows and "s" in t.column_names
            else _sd.empty_table(),
            batch_format="pyarrow",
            batch_size=None,
        )
    distinct = distinct.materialize()

    # ---- 2. per-side degrees (one tagged merge) ----
    def deg_partial(t: pa.Table) -> pa.Table:
        out_s = pa.schema(
            [("side", pa.int64()), ("node", pa.int64()), ("deg", pa.int64())]
        )
        if t.num_rows == 0 or "s" not in t.column_names:
            return out_s.empty_table()
        su, sc = np.unique(t.column("s").to_numpy(zero_copy_only=False), return_counts=True)
        du, dc = np.unique(t.column("d").to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table(
            {
                "side": pa.array(
                    np.concatenate(
                        [np.zeros(len(su), np.int64), np.ones(len(du), np.int64)]
                    )
                ),
                "node": pa.array(np.concatenate([su, du]).astype(np.int64)),
                "deg": pa.array(np.concatenate([sc, dc]).astype(np.int64)),
            },
            schema=out_s,
        )

    degrees = merge_partial_sums(
        distinct.map_batches(deg_partial, batch_format="pyarrow", batch_size=None),
        ["side", "node"],
        ["deg"],
        limit_bytes=limit_bytes,
    )

    empty = pa.table(
        {
            "m": pa.array([0], pa.int64()),
            "sx": pa.array([0], pa.int64()),
            "sy": pa.array([0], pa.int64()),
            "sxy": pa.array([0], pa.int64()),
            "sxx": pa.array([0], pa.int64()),
            "syy": pa.array([0], pa.int64()),
            "assortativity": pa.array([None], pa.float64()),
        }
    )

    def _moment_partial(t: pa.Table) -> pa.Table:
        """Per-block (side, Σdeg, Σdeg², Σdeg³) — the joinless moments."""
        out_s = pa.schema(
            [
                ("side", pa.int64()),
                ("s1", pa.int64()),
                ("s2", pa.int64()),
                ("s3", pa.int64()),
            ]
        )
        if t.num_rows == 0 or "deg" not in t.column_names:
            return out_s.empty_table()
        side = t.column("side").to_numpy(zero_copy_only=False)
        deg = t.column("deg").to_numpy(zero_copy_only=False).astype(np.int64)
        rows = []
        for sv in (0, 1):
            dd = deg[side == sv]
            rows.append(
                (sv, int(dd.sum()), int((dd * dd).sum()), int((dd * dd * dd).sum()))
            )
        return pa.table(
            {
                "side": pa.array([r[0] for r in rows], pa.int64()),
                "s1": pa.array([r[1] for r in rows], pa.int64()),
                "s2": pa.array([r[2] for r in rows], pa.int64()),
                "s3": pa.array([r[3] for r in rows], pa.int64()),
            },
            schema=out_s,
        )

    if isinstance(degrees, pa.Table):
        deg_local = degrees
    else:
        deg_local = None

    if deg_local is not None:
        side = deg_local.column("side").to_numpy(zero_copy_only=False)
        node = deg_local.column("node").to_numpy(zero_copy_only=False)
        deg = deg_local.column("deg").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(side) == 0:
            return empty
        moments = {}
        for sv in (0, 1):
            dd = deg[side == sv]
            moments[sv] = (
                int(dd.sum()),
                int((dd * dd).sum()),
                int((dd * dd * dd).sum()),
            )
        # broadcast attach for the one cross moment
        s_mask = side == 0
        s_order = np.argsort(node[s_mask])
        d_order = np.argsort(node[~s_mask])
        ref = ray.put(
            {
                "sn": node[s_mask][s_order],
                "sd": deg[s_mask][s_order],
                "dn": node[~s_mask][d_order],
                "dd": deg[~s_mask][d_order],
            }
        )

        def cross_partial(t: pa.Table, _ref=ref) -> pa.Table:
            if t.num_rows == 0 or "s" not in t.column_names:
                return pa.schema([("k", pa.int64()), ("sxy", pa.int64())]).empty_table()
            d = ray.get(_ref)
            a = t.column("s").to_numpy(zero_copy_only=False)
            b = t.column("d").to_numpy(zero_copy_only=False)
            dx = d["sd"][np.searchsorted(d["sn"], a)]
            dy = d["dd"][np.searchsorted(d["dn"], b)]
            return pa.table(
                {
                    "k": pa.array([0], pa.int64()),
                    "sxy": pa.array([int(np.dot(dx, dy))], pa.int64()),
                }
            )

        cross = merge_partial_sums(
            distinct.map_batches(cross_partial, batch_format="pyarrow", batch_size=None),
            ["k"],
            ["sxy"],
            limit_bytes=max(limit_bytes, 1 << 20),
        )
        if not isinstance(cross, pa.Table):
            cross = collect_table(
                cross, empty_schema=pa.schema([("k", pa.int64()), ("sxy", pa.int64())])
            )
        sxy = int(cross.column("sxy")[0].as_py()) if cross.num_rows else 0
        # m == Σ_src deg == #edges
        m = moments[0][0]
        sx, sxx = moments[0][1], moments[0][2]
        sy, syy = moments[1][1], moments[1][2]
    else:
        # degrees is a lazy exchange pipeline consumed by three stages
        # below (moment merge + two side attaches, whose copartition
        # schema fetch executes the plan) — materialize ONCE
        degrees = degrees.materialize()
        mom = merge_partial_sums(
            degrees.map_batches(_moment_partial, batch_format="pyarrow", batch_size=None),
            ["side"],
            ["s1", "s2", "s3"],
            limit_bytes=max(limit_bytes, 1 << 20),
        )
        if not isinstance(mom, pa.Table):
            mom = collect_table(mom)
        if mom.num_rows == 0:
            return empty
        by_side = {
            int(sv): (int(a), int(b), int(cc))
            for sv, a, b, cc in zip(
                mom.column("side").to_pylist(),
                mom.column("s1").to_pylist(),
                mom.column("s2").to_pylist(),
                mom.column("s3").to_pylist(),
            )
        }
        m = by_side[0][0]
        sx, sxx = by_side[0][1], by_side[0][2]
        sy, syy = by_side[1][1], by_side[1][2]

        # cross moment through two co-partition attaches
        def _side_ds(sv: int, kcol: str, vcol: str):
            sch = pa.schema([(kcol, pa.int64()), (vcol, pa.int64())])

            def pick(t: pa.Table) -> pa.Table:
                if t.num_rows == 0 or "side" not in t.column_names:
                    return sch.empty_table()
                mask = pc.equal(t.column("side"), sv)
                ft = t.filter(mask)
                return pa.table(
                    {kcol: ft.column("node"), vcol: ft.column("deg")}, schema=sch
                )

            return degrees.map_batches(pick, batch_format="pyarrow", batch_size=None)

        def attach(lt: pa.Table, rt: pa.Table) -> pa.Table:
            if lt.num_rows == 0:
                cols = list(lt.column_names) + [rt.column_names[1]]
                return pa.schema(
                    [(c, pa.int64()) for c in cols]
                ).empty_table()
            kcol, vcol = rt.column_names[0], rt.column_names[1]
            kn = rt.column(kcol).to_numpy(zero_copy_only=False)
            kv = rt.column(vcol).to_numpy(zero_copy_only=False)
            o = np.argsort(kn)
            kn, kv = kn[o], kv[o]
            join_on = "s" if kcol == "sn" else "d"
            keys = lt.column(join_on).to_numpy(zero_copy_only=False)
            vals = kv[np.searchsorted(kn, keys)]
            return lt.append_column(vcol, pa.array(vals.astype(np.int64)))

        with_dx = copartition_apply(
            distinct, _side_ds(0, "sn", "dx"), "s", "sn", attach
        ).materialize()
        with_both = copartition_apply(
            with_dx, _side_ds(1, "dn", "dy"), "d", "dn", attach
        )

        def cross_partial2(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "dx" not in t.column_names:
                return pa.schema([("k", pa.int64()), ("sxy", pa.int64())]).empty_table()
            dx = t.column("dx").to_numpy(zero_copy_only=False)
            dy = t.column("dy").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "k": pa.array([0], pa.int64()),
                    "sxy": pa.array([int(np.dot(dx, dy))], pa.int64()),
                }
            )

        cross = merge_partial_sums(
            with_both.map_batches(cross_partial2, batch_format="pyarrow", batch_size=None),
            ["k"],
            ["sxy"],
            limit_bytes=max(limit_bytes, 1 << 20),
        )
        if not isinstance(cross, pa.Table):
            cross = collect_table(
                cross, empty_schema=pa.schema([("k", pa.int64()), ("sxy", pa.int64())])
            )
        sxy = int(cross.column("sxy")[0].as_py()) if cross.num_rows else 0

    if m == 0:
        return empty
    num = float(m * sxy - sx * sy)
    den = float(m * sxx - sx * sx) ** 0.5 * float(m * syy - sy * sy) ** 0.5
    if den == 0.0:
        r = None
    else:
        v = num / den
        r = float(np.floor(abs(v) * 1e6 + 0.5) / 1e6) * (1.0 if v >= 0 else -1.0)
    return pa.table(
        {
            "m": pa.array([m], pa.int64()),
            "sx": pa.array([sx], pa.int64()),
            "sy": pa.array([sy], pa.int64()),
            "sxy": pa.array([sxy], pa.int64()),
            "sxx": pa.array([sxx], pa.int64()),
            "syy": pa.array([syy], pa.int64()),
            "assortativity": pa.array([r], pa.float64()),
        }
    )


def edge_jaccard(
    edges: Any,
    src: str = "src",
    dst: str = "dst",
    num_partitions: int | None = None,
    limit_bytes: int = _DRIVER_MERGE_BYTES,
) -> Any:
    """Out-neighbor Jaccard similarity for every distinct directed edge
    (u, v): |N(u) ∩ N(v)| / |N(u) ∪ N(v)| over out-neighbor SETS — the
    co-citation/structural-similarity signal (do linked pages link to
    the same places?).

    Scale shape: candidate pairs are the EDGES themselves (never a
    shared-neighbor self-join, whose wedge volume is quadratic in a hub
    target's in-degree). Distinct edges merge adaptively (16 B/row);
    each side's neighbor set attaches through one co-partition exchange
    (adjacency grouped in-task from the same edge rows, so total moved
    volume is O(E·outdeg) narrow rows); the per-row set intersection is
    a vectorized polars list kernel. Two chained co-partitions — the
    intermediate is materialized (dev-notes invariant: a co-partition
    feeding another must not re-execute its upstream all-to-all).

    Returns a Dataset with columns (src, dst, common, du, dv, jaccard);
    ``jaccard`` is rounded half-away at 6 decimals.
    """
    import polars as pl
    import ray.data as rd

    from patito_ray.stages.join import copartition_apply, default_num_partitions

    _check_edges(edges, src, dst)
    if num_partitions is None:
        num_partitions = default_num_partitions()

    def canon(t: pa.Table) -> pa.Table:
        a = t.column(src).to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column(dst).to_numpy(zero_copy_only=False).astype(np.int64)
        keep = a != b
        pairs = np.unique(np.stack([a[keep], b[keep]], axis=1), axis=0)
        return pa.table(
            {
                "u": pa.array(pairs[:, 0], type=pa.int64()),
                "v": pa.array(pairs[:, 1], type=pa.int64()),
                "one": pa.array(np.ones(len(pairs), dtype=np.int64)),
            }
        )

    distinct = merge_partial_sums(
        edges.map_batches(canon, batch_format="pyarrow", batch_size=None),
        ["u", "v"],
        ["one"],
        limit_bytes=limit_bytes,
    )
    _uv = pa.schema([("u", pa.int64()), ("v", pa.int64())])
    if isinstance(distinct, pa.Table):
        distinct = rd.from_arrow(distinct.select(["u", "v"]))
    else:
        distinct = distinct.map_batches(
            lambda t: t.select(["u", "v"])
            if t.num_rows and "u" in t.column_names
            else _uv.empty_table(),
            batch_format="pyarrow",
            batch_size=None,
        )
    distinct = distinct.materialize()

    adj1 = distinct.map_batches(
        lambda t: t.rename_columns(["a1", "n1"]),
        batch_format="pyarrow",
        batch_size=None,
    )

    _wu = pa.schema(
        [("u", pa.int64()), ("v", pa.int64()), ("nu", pa.large_list(pa.int64()))]
    )

    def attach_u(lt: pa.Table, rt: pa.Table) -> pa.Table:
        if lt.num_rows == 0:
            return _wu.empty_table()
        adf = (
            pl.from_arrow(rt)
            .group_by("a1")
            .agg(pl.col("n1").sort().alias("nu"))
            if rt.num_rows
            else pl.DataFrame(
                {"a1": pl.Series([], dtype=pl.Int64)}
            ).with_columns(nu=pl.lit([], dtype=pl.List(pl.Int64)))
        )
        j = pl.from_arrow(lt).join(adf, left_on="u", right_on="a1", how="left")
        return j.select(["u", "v", "nu"]).to_arrow().cast(_wu)

    with_u = copartition_apply(
        distinct, adj1, "u", "a1", attach_u, num_partitions=num_partitions
    ).materialize()

    adj2 = distinct.map_batches(
        lambda t: t.rename_columns(["a2", "n2"]),
        batch_format="pyarrow",
        batch_size=None,
    )

    _out = pa.schema(
        [
            (src, pa.int64()),
            (dst, pa.int64()),
            ("common", pa.int64()),
            ("du", pa.int64()),
            ("dv", pa.int64()),
            ("jaccard", pa.float64()),
        ]
    )

    def attach_v(lt: pa.Table, rt: pa.Table) -> pa.Table:
        if lt.num_rows == 0:
            return _out.empty_table()
        adf = (
            pl.from_arrow(rt)
            .group_by("a2")
            .agg(pl.col("n2").sort().alias("nv"))
            if rt.num_rows
            else pl.DataFrame(
                {"a2": pl.Series([], dtype=pl.Int64)}
            ).with_columns(nv=pl.lit([], dtype=pl.List(pl.Int64)))
        )
        j = (
            pl.from_arrow(lt)
            .join(adf, left_on="v", right_on="a2", how="left")
            .with_columns(
                pl.col("nu").fill_null([]),
                pl.col("nv").fill_null([]),
            )
            .with_columns(
                common=pl.col("nu")
                .list.set_intersection(pl.col("nv"))
                .list.len()
                .cast(pl.Int64),
                du=pl.col("nu").list.len().cast(pl.Int64),
                dv=pl.col("nv").list.len().cast(pl.Int64),
            )
        )
        common = j.get_column("common").to_numpy().astype(np.int64)
        du = j.get_column("du").to_numpy().astype(np.int64)
        dv = j.get_column("dv").to_numpy().astype(np.int64)
        union = du + dv - common
        jac = np.where(union > 0, common / np.maximum(union, 1), 0.0)
        jac = np.floor(jac * 1e6 + 0.5) / 1e6  # half-away, jac >= 0
        return pa.table(
            {
                src: j.get_column("u").to_numpy().astype(np.int64),
                dst: j.get_column("v").to_numpy().astype(np.int64),
                "common": common,
                "du": du,
                "dv": dv,
                "jaccard": jac,
            },
            schema=_out,
        )

    return copartition_apply(
        with_u, adj2, "v", "a2", attach_v, num_partitions=num_partitions
    )


def moran_i(
    edges: Any,
    values: Any,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
    x: str = "x",
    limit_bytes: int = _DRIVER_MERGE_BYTES,
) -> pa.Table:
    """Moran's I spatial autocorrelation of an integer node attribute
    over a directed graph (w_ij = 1 per edge, self-loops excluded):

        I = (n / W) * sum_edges (n*x_s - S)(n*x_d - S)
                    / sum_nodes (n*x_i - S)^2

    re-expressed so every term is an exact integer — the centered
    products expand to n^2*sum(x_s*x_d) - n*S*(sum x_s + sum x_d)
    + S^2*W over edges and n^2*sum(x^2) - n*S^2 over nodes, with the
    final assembly in unbounded Python ints and ONE float expression.

    Shape for scale: node moments (n, S, sum x^2) ride a 24-byte
    partial merge; the edge pass needs x attached to both endpoints —
    broadcast (``ray.put`` once, searchsorted per batch) when the
    values table fits ``limit_bytes``, else two co-partition exchanges
    with a materialize between them (the assortativity pattern). Edge
    moments are 32-byte per-block partials either way; driver state is
    O(1). Per-edge int64 partials are safe while x < 2^31 and a block
    holds < 2^31 edges; the cross-block accumulation is Python-int."""
    import ray

    from patito_ray.stages.join import copartition_apply

    # ---- node moments: one tiny merge ----
    def node_partial(t: pa.Table) -> pa.Table:
        sch = pa.schema(
            [("k", pa.int64()), ("n", pa.int64()), ("s", pa.int64()),
             ("sq", pa.int64())]
        )
        if t.num_rows == 0:
            return sch.empty_table()
        xv = t.column(x).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "k": pa.array([0], pa.int64()),
                "n": pa.array([len(xv)], pa.int64()),
                "s": pa.array([int(xv.sum())], pa.int64()),
                "sq": pa.array([int((xv * xv).sum())], pa.int64()),
            },
            schema=sch,
        )

    nm = merge_partial_sums(
        values.map_batches(node_partial, batch_format="pyarrow", batch_size=None),
        ["k"],
        ["n", "s", "sq"],
        limit_bytes=max(limit_bytes, 1 << 20),
    )
    if not isinstance(nm, pa.Table):
        nm = collect_table(nm)
    empty = pa.table(
        {
            "n_nodes": pa.array([0], pa.int64()),
            "n_edges": pa.array([0], pa.int64()),
            "i": pa.array([None], pa.float64()),
        }
    )
    if nm.num_rows == 0:
        return empty
    n = int(nm.column("n")[0].as_py())
    s = int(nm.column("s")[0].as_py())
    sq = int(nm.column("sq")[0].as_py())

    edge_sch = pa.schema(
        [("k", pa.int64()), ("m", pa.int64()), ("sxs", pa.int64()),
         ("sxd", pa.int64()), ("sxx", pa.int64())]
    )

    def _edge_moments(xs: "np.ndarray", xd: "np.ndarray") -> pa.Table:
        return pa.table(
            {
                "k": pa.array([0], pa.int64()),
                "m": pa.array([len(xs)], pa.int64()),
                "sxs": pa.array([int(xs.sum())], pa.int64()),
                "sxd": pa.array([int(xd.sum())], pa.int64()),
                "sxx": pa.array([int(np.dot(xs, xd))], pa.int64()),
            },
            schema=edge_sch,
        )

    vals = merge_partial_sums(
        values.map_batches(
            lambda t: pa.table(
                {
                    "vn": pc.cast(t.column(node), pa.int64()),
                    "vx": pc.cast(t.column(x), pa.int64()),
                }
            ),
            batch_format="pyarrow",
            batch_size=None,
        ),
        ["vn"],
        ["vx"],
        limit_bytes=limit_bytes,
    )

    if isinstance(vals, pa.Table):
        kn = vals.column("vn").to_numpy(zero_copy_only=False)
        kv = vals.column("vx").to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.argsort(kn)
        ref = ray.put({"kn": kn[o], "kv": kv[o]})

        def edge_partial(t: pa.Table, _ref=ref) -> pa.Table:
            if t.num_rows == 0:
                return edge_sch.empty_table()
            d = ray.get(_ref)
            a = t.column(src).to_numpy(zero_copy_only=False).astype(np.int64)
            b = t.column(dst).to_numpy(zero_copy_only=False).astype(np.int64)
            keep = a != b
            a, b = a[keep], b[keep]
            if len(a) == 0 or len(d["kn"]) == 0:
                return edge_sch.empty_table()
            # inner-join semantics: an endpoint absent from the values
            # table drops the edge (matches the SQL oracle's JOIN) —
            # a raw searchsorted would read a neighbor's value or raise
            # IndexError at the insertion end.
            hi = len(d["kn"]) - 1
            ia = np.minimum(np.searchsorted(d["kn"], a), hi)
            ib = np.minimum(np.searchsorted(d["kn"], b), hi)
            ok = (d["kn"][ia] == a) & (d["kn"][ib] == b)
            if not ok.any():
                return edge_sch.empty_table()
            xs = d["kv"][ia[ok]]
            xd = d["kv"][ib[ok]]
            return _edge_moments(xs, xd)

        em = merge_partial_sums(
            edges.map_batches(edge_partial, batch_format="pyarrow", batch_size=None),
            ["k"],
            ["m", "sxs", "sxd", "sxx"],
            limit_bytes=max(limit_bytes, 1 << 20),
        )
    else:
        vals = vals.materialize()
        e_sch = pa.schema([("es", pa.int64()), ("ed", pa.int64())])

        def loopless(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or src not in t.column_names:
                return e_sch.empty_table()
            a = pc.cast(t.column(src), pa.int64())
            b = pc.cast(t.column(dst), pa.int64())
            tt = pa.table({"es": a, "ed": b}, schema=e_sch)
            return tt.filter(pc.invert(pc.equal(tt.column("es"), tt.column("ed"))))

        eds = edges.map_batches(loopless, batch_format="pyarrow", batch_size=None)

        def _side(kcol: str, vcol: str):
            sch = pa.schema([(kcol, pa.int64()), (vcol, pa.int64())])

            def pick(t: pa.Table) -> pa.Table:
                if t.num_rows == 0 or "vn" not in t.column_names:
                    return sch.empty_table()
                return pa.table(
                    {kcol: t.column("vn"), vcol: t.column("vx")}, schema=sch
                )

            return vals.map_batches(pick, batch_format="pyarrow", batch_size=None)

        def attach(lt: pa.Table, rt: pa.Table) -> pa.Table:
            kcol, vcol = rt.column_names[0], rt.column_names[1]
            out_cols = list(lt.column_names) + [vcol]
            empty = pa.schema([(c, pa.int64()) for c in out_cols]).empty_table()
            if lt.num_rows == 0 or rt.num_rows == 0:
                return empty
            kn = rt.column(kcol).to_numpy(zero_copy_only=False)
            kv = rt.column(vcol).to_numpy(zero_copy_only=False)
            o = np.argsort(kn)
            kn, kv = kn[o], kv[o]
            join_on = "es" if kcol == "an" else "ed"
            keys = lt.column(join_on).to_numpy(zero_copy_only=False)
            # inner-join semantics (see edge_partial): drop edges whose
            # endpoint is missing from the values side.
            idx = np.minimum(np.searchsorted(kn, keys), len(kn) - 1)
            ok = kn[idx] == keys
            if not ok.any():
                return empty
            lt = lt.filter(pa.array(ok))
            vv = kv[idx[ok]]
            return lt.append_column(vcol, pa.array(vv.astype(np.int64)))

        with_xs = copartition_apply(
            eds, _side("an", "xs"), "es", "an", attach
        ).materialize()
        with_both = copartition_apply(
            with_xs, _side("bn", "xd"), "ed", "bn", attach
        )

        def edge_partial2(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "xs" not in t.column_names:
                return edge_sch.empty_table()
            xs = t.column("xs").to_numpy(zero_copy_only=False).astype(np.int64)
            xd = t.column("xd").to_numpy(zero_copy_only=False).astype(np.int64)
            return _edge_moments(xs, xd)

        em = merge_partial_sums(
            with_both.map_batches(
                edge_partial2, batch_format="pyarrow", batch_size=None
            ),
            ["k"],
            ["m", "sxs", "sxd", "sxx"],
            limit_bytes=max(limit_bytes, 1 << 20),
        )

    if not isinstance(em, pa.Table):
        em = collect_table(em, empty_schema=edge_sch)
    if em.num_rows == 0:
        return empty
    m = int(em.column("m")[0].as_py())
    sxs = int(em.column("sxs")[0].as_py())
    sxd = int(em.column("sxd")[0].as_py())
    sxx = int(em.column("sxx")[0].as_py())
    num = n * n * sxx - n * s * (sxs + sxd) + s * s * m
    den = n * n * sq - n * s * s
    if m == 0 or den <= 0:
        return pa.table(
            {
                "n_nodes": pa.array([n], pa.int64()),
                "n_edges": pa.array([m], pa.int64()),
                "i": pa.array([None], pa.float64()),
            }
        )
    i_val = float(n) * float(num) / (float(m) * float(den))
    i_val = round_half_away(i_val, 6)
    return pa.table(
        {
            "n_nodes": pa.array([n], pa.int64()),
            "n_edges": pa.array([m], pa.int64()),
            "i": pa.array([i_val], pa.float64()),
        }
    )
