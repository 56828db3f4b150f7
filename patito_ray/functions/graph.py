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


def _pagerank_local(
    src: np.ndarray, dst: np.ndarray, num_iters: int, damping: float
) -> pa.Table:
    """Driver fast path: identical formula, vectorized numpy.

    ``bincount`` plays the role of the distributed groupby-sum; the
    dangling-mass and base terms use the exact same float expression
    tree as the distributed path so both land within summation-order
    noise of each other.
    """
    nodes = np.unique(np.concatenate([src, dst]))
    if len(nodes) == 0:
        return _PR_SCHEMA.empty_table()
    n = len(nodes)
    src_idx = np.searchsorted(nodes, src)
    dst_idx = np.searchsorted(nodes, dst)
    outdeg = np.bincount(src_idx, minlength=n).astype(np.float64)
    rank = np.full(n, 1.0 / n, dtype=np.float64)
    base = (1.0 - damping) / n
    sender = outdeg > 0
    for _ in range(num_iters):
        contrib = rank[src_idx] / outdeg[src_idx]
        w = np.bincount(dst_idx, weights=contrib, minlength=n)
        dangling = float(rank[~sender].sum())
        rank = base + damping * (w + dangling / n)
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
) -> "pa.Table | Any":
    """PageRank by power iteration over a directed edge Dataset.

    ``rank'(v) = (1-d)/N + d * (Σ_{(u,v)∈E} rank(u)/outdeg(u)
    + dangling/N)`` where ``dangling`` is the rank mass parked on
    nodes with no out-edges. Node universe = every id appearing as
    ``src`` or ``dst``; parallel edges and self-loops count like any
    other edge (same as an unrolled SQL formulation).

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

    edges_m = edges.materialize()
    if edges_m.size_bytes() <= limit_bytes:
        t = collect_table(edges_m, empty_schema=pa.schema([(src, pa.int64()), (dst, pa.int64())]))
        return _pagerank_local(
            t.column(src).to_numpy(zero_copy_only=False).astype(np.int64),
            t.column(dst).to_numpy(zero_copy_only=False).astype(np.int64),
            num_iters,
            damping,
        )

    if num_partitions is None:
        num_partitions = default_num_partitions()

    # one pass → (node, outdeg) for every node in the universe: src rows
    # carry their batch-local out-counts, dst rows a 0 so sink-only
    # nodes exist in the state table (np.unique is the per-batch combiner)
    def deg_partials(t: pa.Table) -> pa.Table:
        s = t.column(src).to_numpy(zero_copy_only=False).astype(np.int64)
        d = t.column(dst).to_numpy(zero_copy_only=False).astype(np.int64)
        su, sc = np.unique(s, return_counts=True)
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

    def add_rank(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pc.cast(t.column("node"), pa.int64()),
                "outdeg": pc.cast(t.column("outdeg"), pa.int64()),
                "rank": pa.array(
                    np.full(t.num_rows, init_rank, np.float64), type=pa.float64()
                ),
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

        out = (
            pl.from_arrow(lt)
            .join(pl.from_arrow(rt), left_on=src, right_on="node", how="inner")
            .with_columns((pl.col("rank") / pl.col("outdeg")).alias("w"))
            .group_by(dst)
            .agg(pl.col("w").sum())
            .select(pl.col(dst).alias("cdst"), pl.col("w"))
        )
        return out.to_arrow()

    def dangle_partial(t: pa.Table) -> pa.Table:
        deg_arr = t.column("outdeg").to_numpy(zero_copy_only=False)
        r = t.column("rank").to_numpy(zero_copy_only=False)
        return pa.table({"w": pa.array([float(r[deg_arr == 0].sum())], type=pa.float64())})

    dangle_schema = pa.schema([("w", pa.float64())])

    for _ in range(num_iters):
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
                rank = base + damping * (w + _d / n)
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
            joined = copartition_join(
                state,
                merged,
                on="node",
                right_on="cdst",
                how="left",
                num_partitions=num_partitions,
            )

            def upd_join(t: pa.Table, _d=dangling) -> pa.Table:
                w = pc.fill_null(pc.cast(t.column("w"), pa.float64()), 0.0)
                w_np = w.to_numpy(zero_copy_only=False)
                rank = base + damping * (w_np + _d / n)
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
