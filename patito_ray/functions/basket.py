"""Market-basket co-occurrence: item pairs that appear together in the
same group (order, session, document), counted across groups.

Scale shape: ONE hash-partition exchange co-locates each group's items
(narrow 16 B/row projection), every partition generates its within-run
pairs with the vectorized offset scan (``graph._run_pairs`` — no
per-group Python), pre-counts them locally, and the (a, b, n) partials
merge adaptively (driver polars <= 256 MB, distributed groupby beyond).
Pair volume is sum-of-C(L,2) per group — bounded when basket sizes are
(as in real carts/orders) small; a hot group with L items emits O(L^2)
pairs, which is inherent to the operator's output, not a skew artifact.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def cooccurrence_pairs(
    ds: Any,
    group_col: str,
    item_col: str,
    min_count: int = 2,
    limit_bytes: int | None = None,
) -> Any:
    """Pairs of DISTINCT items sharing a group, with the number of
    groups containing both -> [item_a, item_b, n_groups], item_a <
    item_b, filtered to ``n_groups >= min_count``.

    Returns a local ``pa.Table`` (driver merge) or a lazy ``Dataset``
    (distributed merge) — same dual contract as ``merge_partial_sums``.
    ``limit_bytes=0`` forces the distributed branch (test hook).
    """
    from patito_ray.functions.dedup import _splitmix
    from patito_ray.functions.graph import _run_pairs
    from patito_ray.stages.agg import merge_partial_sums
    from patito_ray.stages.join import default_num_partitions

    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    # validate key dtypes up front: a string column would otherwise
    # fail with an obscure cast error deep inside a Ray task. Best
    # effort only — fetching an unknown schema would EXECUTE an
    # all-to-all upstream plan (dev-notes rule), so never force it.
    try:
        schema = ds.schema(fetch_if_missing=False)
    except TypeError:
        schema = None
    base = getattr(schema, "base_schema", None)
    if base is not None:
        for col in (group_col, item_col):
            typ = base.field(col).type
            if not pa.types.is_integer(typ):
                raise TypeError(
                    f"cooccurrence_pairs needs integer {col!r} "
                    f"(got {typ}); hash64 string keys first"
                )
    P = default_num_partitions()

    def narrow(t: pa.Table) -> pa.Table:
        g = pc.cast(t.column(group_col), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        part = (_splitmix(g.view(np.uint64)) % np.uint64(P)).view(np.int64)
        return pa.table(
            {
                "part": pa.array(part, type=pa.int64()),
                "g": pa.array(g, type=pa.int64()),
                "i": pc.cast(t.column(item_col), pa.int64()),
            }
        )

    _partial_schema = pa.schema(
        [("item_a", pa.int64()), ("item_b", pa.int64()), ("n_groups", pa.int64())]
    )

    def pairs_partial(t: pa.Table) -> pa.Table:
        import polars as pl

        if t.num_rows == 0 or "g" not in t.column_names:
            return _partial_schema.empty_table()
        g = t.column("g").to_numpy(zero_copy_only=False)
        i = t.column("i").to_numpy(zero_copy_only=False)
        order = np.lexsort((i, g))
        g, i = g[order], i[order]
        keep = np.empty(len(g), dtype=bool)
        keep[0] = True
        keep[1:] = (g[1:] != g[:-1]) | (i[1:] != i[:-1])
        g, i = g[keep], i[keep]
        a, b = _run_pairs(g, i)
        if a.size == 0:
            return _partial_schema.empty_table()
        return (
            pl.DataFrame({"item_a": a, "item_b": b})
            .group_by(["item_a", "item_b"])
            .agg(pl.len().cast(pl.Int64).alias("n_groups"))
            .to_arrow()
            .cast(_partial_schema)
        )

    partials = (
        ds.map_batches(narrow, batch_format="pyarrow", batch_size=None)
        .groupby("part")
        .map_groups(pairs_partial, batch_format="pyarrow")
    )
    kwargs = {} if limit_bytes is None else {"limit_bytes": limit_bytes}
    merged = merge_partial_sums(
        partials, ["item_a", "item_b"], ["n_groups"], **kwargs
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _partial_schema.empty_table()
        return t.select(["item_a", "item_b", "n_groups"]).filter(
            pc.greater_equal(t.column("n_groups"), min_count)
        )

    if isinstance(merged, pa.Table):
        return finish(merged)
    return merged.map_batches(finish, batch_format="pyarrow", batch_size=None)
