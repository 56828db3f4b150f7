"""Exact grouped quantiles (SQL ``quantile-by-selection`` per group).

Selection semantics, not interpolation: the ``q``-quantile of a group
is the element at 1-based sorted rank ``max(1, ceil(q * n))`` over the
group's ``n`` non-null values. Picking an existing element keeps the
result bit-exact (no float interpolation arithmetic), so the DuckDB
oracle — ``ROW_NUMBER() OVER (PARTITION BY k ORDER BY v)`` matched
against ``CEIL(q * cnt)`` — reproduces it exactly even on double
columns.

Scale shape: ONE hash exchange on the group key (same
:func:`patito_ray.stages.exchange.hash_partition_ids` spine as
window_over / grouped_top_k), then one vectorized polars
``group_by().agg`` per partition — P Python calls total, never one per
group. Below 256 MB of narrowed (key, value) pairs the exchange is
skipped entirely (one driver-side kernel call — the all-to-all's fixed
cost dominates at that size). A group's cost is its own row count; the output is one row per
group, so everything downstream is tiny. At 10^12 rows this is the
minimum movement for an exact holistic aggregate: quantiles cannot be
partially aggregated (unlike sums/sketches), so the group's values
must meet once — t-digest (``validation/stats.py``) remains the
single-pass approximate alternative when rank error is acceptable.

The reference (JakobGM/patito) delegates quantiles to polars on one
machine; this is the distributed equivalent.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa

from patito_ray.stages.agg import _DRIVER_MERGE_BYTES


def _adaptive_grouped_holistic(
    ds: Any,
    add_part: Any,
    per_partition: Any,
    limit_bytes: int,
) -> Any:
    """Adaptive spine shared by grouped_quantiles / grouped_mad.

    The narrowed (key, value, part) stream materializes once; below
    ``limit_bytes`` the whole thing is one driver-side polars kernel
    call (the all-to-all costs seconds even on a 10 MB side — same
    rationale as ``stages.agg.merge_partial_sums``), beyond it the
    hash exchange runs as before. ``add_part`` stays on BOTH paths so
    the null-key / dtype validation happens in the workers either way.
    """
    import ray
    import ray.data as rd

    m = ds.map_batches(add_part, batch_format="pyarrow", batch_size=None).materialize()
    if m.size_bytes() <= limit_bytes:
        tabs = [t for t in ray.get(m.to_arrow_refs()) if t.num_rows]
        if tabs:
            return rd.from_arrow(per_partition(pa.concat_tables(tabs)))
        # empty input: the (cheap) exchange yields the typed empty result
    return m.groupby("part").map_groups(per_partition, batch_format="pyarrow")


def grouped_quantiles(
    ds: Any,
    by: str,
    value: str,
    qs: dict[str, float],
    num_partitions: int | None = None,
    limit_bytes: int = _DRIVER_MERGE_BYTES,
) -> Any:
    """One row per ``by`` group: ``by``, ``n`` (non-null value count),
    and one column per ``qs`` entry (name -> q in (0, 1]) holding the
    group's value at sorted rank ``max(1, ceil(q * n))``.

    Null ``value`` rows are ignored (SQL aggregate semantics); groups
    with only null values are dropped. Null ``by`` keys are rejected
    (same contract as window_over / grouped_top_k). Below
    ``limit_bytes`` of narrowed pairs the merge happens driver-side in
    one kernel call (``limit_bytes=0`` forces the exchange — tests
    cover both paths).
    """
    import polars as pl

    for name, q in qs.items():
        if not (0.0 < q <= 1.0):
            raise ValueError(f"quantile {name!r}={q} not in (0, 1]")
    if num_partitions is None:
        from patito_ray.stages.join import default_num_partitions

        num_partitions = default_num_partitions()

    def add_part(t: pa.Table) -> pa.Table:
        from patito_ray.stages.exchange import hash_partition_ids

        import pyarrow.compute as pc

        t = pa.table({by: t.column(by), value: t.column(value)})
        if t.column(value).null_count:
            # null values never contribute (SQL aggregate semantics) —
            # drop them before they ride the exchange
            t = t.filter(pc.is_valid(t.column(value)))
        part = hash_partition_ids(
            t.column(by), num_partitions, f"grouped_quantiles key column {by!r}"
        )
        return t.append_column("part", pa.array(part, type=pa.int64()))

    def per_partition(group_table: pa.Table) -> pa.Table:
        df = pl.from_arrow(group_table.drop_columns(["part"]))
        # drop null values up front (SQL aggregate semantics); groups
        # with only nulls then never form, so the rank index below is
        # always in bounds
        df = df.filter(pl.col(value).is_not_null())
        n = pl.len()
        aggs = [n.cast(pl.Int64).alias("n")]
        for name, q in qs.items():
            # 1-based rank ceil(q*n) — identical IEEE double product /
            # ceil as the SQL oracle, then clipped to >= 1
            idx = (
                (n.cast(pl.Float64) * q).ceil().cast(pl.Int64).clip(lower_bound=1)
                - 1
            )
            aggs.append(pl.col(value).sort().get(idx).alias(name))
        return df.group_by(by).agg(aggs).to_arrow()

    return _adaptive_grouped_holistic(ds, add_part, per_partition, limit_bytes)


def global_quantiles(
    ds: Any,
    value: str,
    qs: dict[str, float],
    delta: int = 500,
    band_limit: int = 50_000_000,
) -> "pa.Table":
    """EXACT global selection quantiles (element at 1-based rank
    ``max(1, ceil(q*n))``) WITHOUT a global sort.

    A constant-key :func:`grouped_quantiles` would funnel the whole
    column into one partition; sorting 10^12 values for one number is
    the classic anti-pattern. Instead:

    1. one streaming pass builds a t-digest + the exact non-null count;
    2. the digest brackets each target rank with a value band
       [lo, hi]; one more streaming pass counts ``v < lo`` exactly and
       collects ONLY the band's values (digest rank error ~1/delta, so
       the band is a tiny slice of the column);
    3. the true quantile is selected from the sorted band on the
       driver: rank r sits at band[r - count_below - 1]. If the digest
       error exceeded the margin (rank not inside the band), the margin
       doubles and step 2 repeats — exactness never depends on sketch
       accuracy, only the number of passes does.

    Returns a one-row pa.Table: ``n`` plus one column per ``qs``.
    ``band_limit`` caps how many band values may be pulled driver-side
    per attempt (loud error instead of a silent OOM).
    """
    import pickle

    import pyarrow.compute as pc

    from patito_ray.state.sketches import TDigest

    for name, q in qs.items():
        if not (0.0 < q <= 1.0):
            raise ValueError(f"quantile {name!r}={q} not in (0, 1]")

    def digest_batch(t: pa.Table) -> pa.Table:
        col = t.column(value)
        arr = col.to_numpy(zero_copy_only=False).astype(np.float64)
        arr = arr[~np.isnan(arr)]
        d = TDigest(delta)
        d.add(arr)
        return pa.table(
            {
                "blob": pa.array([pickle.dumps(d)], pa.large_binary()),
                "n": pa.array([len(arr)], pa.int64()),
            }
        )

    from patito_ray.stages.agg import collect_table

    parts = collect_table(
        ds.map_batches(digest_batch, batch_format="pyarrow", batch_size=None),
        pa.schema([("blob", pa.large_binary()), ("n", pa.int64())]),
    )
    n = int(pc.sum(parts.column("n")).as_py() or 0)
    out_cols: dict[str, Any] = {"n": pa.array([n], pa.int64())}
    if n == 0:
        for name in qs:
            out_cols[name] = pa.array([None], pa.float64())
        return pa.table(out_cols)
    digest = pickle.loads(parts.column("blob")[0].as_py())
    for blob in parts.column("blob").to_pylist()[1:]:
        digest.merge(pickle.loads(blob))

    margin = 4.0 / delta  # a few times the k1 tail error
    targets = {name: max(1, int(np.ceil(q * n))) for name, q in qs.items()}
    unresolved = dict(qs)
    results: dict[str, float] = {}
    while unresolved:
        # t-digest end quantiles are CENTROID MEANS and can sit strictly
        # inside the true min/max — once the margin crosses an end, the
        # band edge must open to infinity or the retry loop could never
        # cover rank 1 / rank n
        bands = {
            name: (
                -np.inf if q - margin <= 0.0 else digest.quantile(q - margin),
                np.inf if q + margin >= 1.0 else digest.quantile(q + margin),
            )
            for name, q in unresolved.items()
        }

        def band_pass(t: pa.Table, bands=bands) -> pa.Table:
            col = t.column(value)
            arr = col.to_numpy(zero_copy_only=False).astype(np.float64)
            arr = arr[~np.isnan(arr)]
            cols: dict[str, Any] = {}
            for name, (lo, hi) in bands.items():
                cols[f"below_{name}"] = pa.array(
                    [int((arr < lo).sum())], pa.int64()
                )
                band = arr[(arr >= lo) & (arr <= hi)]
                cols[f"band_{name}"] = pa.array(
                    [band], pa.large_list(pa.float64())
                )
            return pa.table(cols)

        bp = collect_table(
            ds.map_batches(band_pass, batch_format="pyarrow", batch_size=None),
            pa.schema(
                [(f"below_{m}", pa.int64()) for m in bands]
                + [(f"band_{m}", pa.large_list(pa.float64())) for m in bands]
            ),
        )
        still: dict[str, float] = {}
        for name, q in unresolved.items():
            below = int(pc.sum(bp.column(f"below_{name}")).as_py() or 0)
            band = pc.list_flatten(bp.column(f"band_{name}")).to_numpy(
                zero_copy_only=False
            )
            if len(band) > band_limit:
                raise ValueError(
                    f"global_quantiles band for {name!r} holds {len(band)} "
                    f"values (> band_limit={band_limit}); raise delta or "
                    "band_limit"
                )
            r = targets[name]
            if below < r <= below + len(band):
                band = np.sort(band)  # flatten output may be read-only
                results[name] = float(band[r - below - 1])
            else:
                still[name] = q  # digest error exceeded margin: widen
        unresolved = still
        margin *= 2.0

    for name in qs:
        out_cols[name] = pa.array([results[name]], pa.float64())
    return pa.table(out_cols)


def grouped_mad(
    ds: Any,
    by: str,
    value: str,
    num_partitions: int | None = None,
    limit_bytes: int = _DRIVER_MERGE_BYTES,
) -> Any:
    """One row per group: ``by``, ``n``, selection-median ``med`` and
    median absolute deviation ``mad`` (selection-median of
    ``|x - med|``) — the robust-statistics pair behind outlier gates
    that don't blow up on heavy tails like mean/stddev do.

    Both statistics are SELECTION quantiles (rank ``max(1, ceil(n/2))``),
    and the deviation is one IEEE subtraction + abs, so the whole row is
    bit-exact against the SQL ROW_NUMBER oracle with zero rounding.

    Scale shape: ONE hash exchange (the ``grouped_quantiles`` spine) —
    MAD needs the group's values twice (med first, deviations second),
    so computing both inside the same partition task costs no second
    exchange. Null values drop (SQL aggregate semantics); null keys are
    rejected by the shared partition kernel.
    """
    import polars as pl

    if num_partitions is None:
        from patito_ray.stages.join import default_num_partitions

        num_partitions = default_num_partitions()

    def add_part(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from patito_ray.stages.exchange import hash_partition_ids

        t = pa.table({by: t.column(by), value: t.column(value)})
        if t.column(value).null_count:
            t = t.filter(pc.is_valid(t.column(value)))
        part = hash_partition_ids(
            t.column(by), num_partitions, f"grouped_mad key column {by!r}"
        )
        return t.append_column("part", pa.array(part, type=pa.int64()))

    def per_partition(group_table: pa.Table) -> pa.Table:
        df = pl.from_arrow(group_table.drop_columns(["part"]))
        df = df.filter(pl.col(value).is_not_null())
        n = pl.len()
        idx = (n.cast(pl.Float64) * 0.5).ceil().cast(pl.Int64).clip(lower_bound=1) - 1
        med = df.group_by(by).agg(
            [n.cast(pl.Int64).alias("n"), pl.col(value).sort().get(idx).alias("med")]
        )
        dev = df.join(med.select([by, "med"]), on=by, how="inner").with_columns(
            (pl.col(value) - pl.col("med")).abs().alias("_ad")
        )
        mad = dev.group_by(by).agg(pl.col("_ad").sort().get(idx).alias("mad"))
        return med.join(mad, on=by, how="inner").to_arrow()

    return _adaptive_grouped_holistic(ds, add_part, per_partition, limit_bytes)


def grouped_weighted_median(
    ds: Any,
    by: str,
    value: str,
    weight: str,
    num_partitions: int | None = None,
    limit_bytes: int = _DRIVER_MERGE_BYTES,
) -> Any:
    """Lower weighted median per ``by`` group: the smallest value v
    whose cumulative weight (values sorted ascending) reaches half the
    group's total weight — one row per group ``[by, wmedian]``.

    Selection-based, so bit-exact against SQL's running-SUM-window
    formulation (no interpolation, no rounding; ties within equal
    values cannot change the answer — the crossing row's value is the
    minimum among all satisfying rows). Weights must be non-negative
    (enforced loudly); null value OR weight rows are ignored. Rides
    the same adaptive driver-vs-exchange spine as grouped_quantiles.
    """
    import polars as pl

    if num_partitions is None:
        from patito_ray.stages.join import default_num_partitions

        num_partitions = default_num_partitions()

    def add_part(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from patito_ray.stages.exchange import hash_partition_ids

        t = pa.table(
            {by: t.column(by), value: t.column(value), weight: t.column(weight)}
        )
        ok = pc.and_(
            pc.is_valid(t.column(value)), pc.is_valid(t.column(weight))
        )
        if t.num_rows and not pc.all(ok).as_py():
            t = t.filter(ok)
        if t.num_rows and pc.min(t.column(weight)).as_py() < 0:
            raise ValueError(
                f"grouped_weighted_median weights ({weight!r}) must be "
                "non-negative"
            )
        part = hash_partition_ids(
            t.column(by),
            num_partitions,
            f"grouped_weighted_median key column {by!r}",
        )
        return t.append_column("part", pa.array(part, type=pa.int64()))

    def per_partition(group_table: pa.Table) -> pa.Table:
        df = pl.from_arrow(group_table.drop_columns(["part"]))
        df = df.sort([by, value], maintain_order=True)
        cum = pl.col(weight).cum_sum().over(by)
        tot = pl.col(weight).sum().over(by)
        return (
            df.filter(2 * cum >= tot)
            .group_by(by, maintain_order=True)
            .agg(pl.col(value).first().alias("wmedian"))
            .to_arrow()
        )

    return _adaptive_grouped_holistic(ds, add_part, per_partition, limit_bytes)
