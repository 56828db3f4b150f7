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


_RULE_SCHEMA = pa.schema(
    [
        ("ante", pa.int64()),
        ("cons", pa.int64()),
        ("n_ab", pa.int64()),
        ("n_ante", pa.int64()),
        ("n_cons", pa.int64()),
        ("support", pa.float64()),
        ("confidence", pa.float64()),
        ("lift", pa.float64()),
    ]
)


def association_rules(
    ds: Any,
    group_col: str,
    item_col: str,
    min_pair_count: int = 2,
    limit_bytes: int | None = None,
) -> Any:
    """Directed association rules ante -> cons over group baskets:
    ``support = n_ab/N``, ``confidence = n_ab/n_ante``,
    ``lift = n_ab*N / (n_ante*n_cons)`` with N = #distinct groups.
    Each unordered co-occurring pair (>= ``min_pair_count`` shared
    groups) yields both directions. Measures are raw IEEE doubles from
    exact int64 counts — the op sequence mirrors the SQL oracle
    expression so no rounding is needed for bit-parity.

    Scale shape: the SAME single hash-partition exchange as
    ``cooccurrence_pairs`` — groups are co-located, so one tagged
    partial per partition carries pair counts (kind 0), per-item group
    counts (kind 1) and the partition's distinct-group count (kind 2);
    partials merge adaptively. Rule assembly broadcasts only the item
    marginals (|items| rows — the small side by construction; the
    pair->rule expansion itself is embarrassingly parallel).
    """
    from patito_ray.functions.dedup import _splitmix
    from patito_ray.functions.graph import _run_pairs
    from patito_ray.stages.agg import merge_partial_sums
    from patito_ray.stages.join import default_num_partitions

    if min_pair_count < 1:
        raise ValueError(f"min_pair_count must be >= 1, got {min_pair_count}")
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
                    f"association_rules needs integer {col!r} "
                    f"(got {typ}); hash64 string keys first"
                )
    P = default_num_partitions()

    def narrow(t: pa.Table) -> pa.Table:
        g = pc.cast(t.column(group_col), pa.int64()).to_numpy(zero_copy_only=False)
        part = (_splitmix(g.view(np.uint64)) % np.uint64(P)).view(np.int64)
        return pa.table(
            {
                "part": pa.array(part, type=pa.int64()),
                "g": pa.array(g, type=pa.int64()),
                "i": pc.cast(t.column(item_col), pa.int64()),
            }
        )

    _partial_schema = pa.schema(
        [
            ("kind", pa.int64()),
            ("item_a", pa.int64()),
            ("item_b", pa.int64()),
            ("n", pa.int64()),
        ]
    )

    def tagged_partial(t: pa.Table) -> pa.Table:
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
        g, i = g[keep], i[keep]  # globally distinct: groups co-located here
        parts: list[pa.Table] = []
        a, b = _run_pairs(g, i)
        if a.size:
            pair_counts = (
                pl.DataFrame({"item_a": a, "item_b": b})
                .group_by(["item_a", "item_b"])
                .agg(pl.len().cast(pl.Int64).alias("n"))
            )
            parts.append(
                pair_counts.with_columns(pl.lit(0, pl.Int64).alias("kind"))
                .select(["kind", "item_a", "item_b", "n"])
                .to_arrow()
                .cast(_partial_schema)
            )
        items, icnt = np.unique(i, return_counts=True)
        parts.append(
            pa.table(
                {
                    "kind": np.full(items.size, 1, np.int64),
                    "item_a": items,
                    "item_b": np.zeros(items.size, np.int64),
                    "n": icnt.astype(np.int64),
                }
            ).cast(_partial_schema)
        )
        n_groups = int(np.count_nonzero(g[1:] != g[:-1]) + 1) if g.size else 0
        parts.append(
            pa.table(
                {
                    "kind": pa.array([2], pa.int64()),
                    "item_a": pa.array([0], pa.int64()),
                    "item_b": pa.array([0], pa.int64()),
                    "n": pa.array([n_groups], pa.int64()),
                }
            )
        )
        return pa.concat_tables(parts)

    partials = (
        ds.map_batches(narrow, batch_format="pyarrow", batch_size=None)
        .groupby("part")
        .map_groups(tagged_partial, batch_format="pyarrow")
    )
    kwargs = {} if limit_bytes is None else {"limit_bytes": limit_bytes}
    merged = merge_partial_sums(
        partials, ["kind", "item_a", "item_b"], ["n"], **kwargs
    )

    def rules_from(
        a: np.ndarray,
        b: np.ndarray,
        nab: np.ndarray,
        items_sorted: np.ndarray,
        item_counts: np.ndarray,
        total: float,
    ) -> pa.Table:
        ante = np.concatenate([a, b])
        cons = np.concatenate([b, a])
        n_ab = np.concatenate([nab, nab])
        n_ante = item_counts[np.searchsorted(items_sorted, ante)]
        n_cons = item_counts[np.searchsorted(items_sorted, cons)]
        fab = n_ab.astype(np.float64)
        fa = n_ante.astype(np.float64)
        fc = n_cons.astype(np.float64)
        return pa.table(
            {
                "ante": ante,
                "cons": cons,
                "n_ab": n_ab,
                "n_ante": n_ante,
                "n_cons": n_cons,
                "support": fab / total,
                "confidence": fab / fa,
                "lift": (fab * total) / (fa * fc),
            }
        ).cast(_RULE_SCHEMA)

    def split_table(t: pa.Table):
        kind = t.column("kind").to_numpy(zero_copy_only=False)
        a = t.column("item_a").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False)
        im = kind == 1
        items = a[im]
        icnt = n[im]
        order = np.argsort(items)
        total = float(n[kind == 2].sum())
        return items[order], icnt[order], total

    if isinstance(merged, pa.Table):
        items_sorted, item_counts, total = split_table(merged)
        if total == 0.0:
            return _RULE_SCHEMA.empty_table()
        kind = merged.column("kind").to_numpy(zero_copy_only=False)
        pm = (kind == 0) & (
            merged.column("n").to_numpy(zero_copy_only=False) >= min_pair_count
        )
        return rules_from(
            merged.column("item_a").to_numpy(zero_copy_only=False)[pm],
            merged.column("item_b").to_numpy(zero_copy_only=False)[pm],
            merged.column("n").to_numpy(zero_copy_only=False)[pm],
            items_sorted,
            item_counts,
            total,
        )

    # distributed branch: materialize ONCE (two consumers — dev-notes
    # re-execution rule), pull only the tiny item-marginal slice to the
    # driver, broadcast it into a per-batch rule assembly.
    m = merged.materialize()
    import ray

    side = [
        t.filter(pc.not_equal(t.column("kind"), 0))
        for t in ray.get(m.to_arrow_refs())
        if t.num_rows and "kind" in t.column_names
    ]
    side = [t for t in side if t.num_rows]
    if not side:
        return _RULE_SCHEMA.empty_table()
    items_sorted, item_counts, total = split_table(pa.concat_tables(side))
    if total == 0.0:
        return _RULE_SCHEMA.empty_table()

    def assemble(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "kind" not in t.column_names:
            return _RULE_SCHEMA.empty_table()
        kind = t.column("kind").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False)
        pm = (kind == 0) & (n >= min_pair_count)
        return rules_from(
            t.column("item_a").to_numpy(zero_copy_only=False)[pm],
            t.column("item_b").to_numpy(zero_copy_only=False)[pm],
            n[pm],
            items_sorted,
            item_counts,
            total,
        )

    return m.map_batches(assemble, batch_format="pyarrow", batch_size=None)
