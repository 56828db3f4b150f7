"""Per-column statistics: null counts, min/max/mean, HLL cardinality,
t-digest quantiles, and distribution-drift checks.

North-star component (BASELINE.json): "per-column statistics ...
accumulated per partition by stateful actor-pool aggregators, then
merged in a tree-reduce". Execution shape:

- stage 1: ``map_batches(SketchBatch, concurrency=N)`` — a callable
  CLASS, so Ray runs an actor pool; per-actor ``__init__`` builds the
  column plan once (which columns are numeric, reusable buffers), and
  each ``__call__`` emits one tiny pickled sketch-delta row per batch.
  Per-batch deltas (instead of unbounded actor-held state) keep
  outputs idempotent under task retry — Ray Data has no end-of-stream
  flush for map_batches actors, and mergeable monoids make the
  distinction irrelevant.
- stage 2: the same associative tree-merge as validation Partials.

Drift check: t-digest distance between a current profile and a
reference profile (max CDF gap at the merged centroid support — a
sketch-level Kolmogorov–Smirnov statistic).
"""

from __future__ import annotations

import pickle
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from patito_ray.state.sketches import HyperLogLog, TDigest, hash64

_NUMERIC = (
    pa.types.is_integer,
    pa.types.is_floating,
)


def _is_numeric(t: pa.DataType) -> bool:
    return any(f(t) for f in _NUMERIC)


class ColumnStats:
    """Mergeable per-column statistic state."""

    __slots__ = ("count", "nulls", "min", "max", "sum", "hll", "tdigest")

    def __init__(self, numeric: bool) -> None:
        self.count = 0
        self.nulls = 0
        self.min: Any = None
        self.max: Any = None
        self.sum = 0.0
        self.hll = HyperLogLog()
        self.tdigest = TDigest() if numeric else None

    def update(self, arr: pa.ChunkedArray | pa.Array) -> None:
        self.count += len(arr)
        self.nulls += arr.null_count
        if len(arr) == arr.null_count:
            return
        mn = pc.min(arr).as_py()
        mx = pc.max(arr).as_py()
        self.min = mn if self.min is None else min(self.min, mn)
        self.max = mx if self.max is None else max(self.max, mx)
        self.hll.add_hashes(hash64(arr))
        if self.tdigest is not None:
            vals = pc.cast(arr, pa.float64())
            np_vals = (
                vals.combine_chunks() if isinstance(vals, pa.ChunkedArray) else vals
            ).to_numpy(zero_copy_only=False)
            self.sum += float(np.nansum(np_vals))
            self.tdigest.add(np_vals)

    def merge(self, other: "ColumnStats") -> "ColumnStats":
        self.count += other.count
        self.nulls += other.nulls
        self.sum += other.sum
        for attr, fn in (("min", min), ("max", max)):
            a, b = getattr(self, attr), getattr(other, attr)
            if a is None:
                setattr(self, attr, b)
            elif b is not None:
                setattr(self, attr, fn(a, b))
        self.hll.merge(other.hll)
        if self.tdigest is not None and other.tdigest is not None:
            self.tdigest.merge(other.tdigest)
        return self

    def summary(self) -> dict[str, Any]:
        valid = self.count - self.nulls
        out: dict[str, Any] = {
            "count": self.count,
            "nulls": self.nulls,
            "min": self.min,
            "max": self.max,
            "approx_distinct": int(round(self.hll.estimate())) if valid else 0,
        }
        if self.tdigest is not None:
            out["mean"] = self.sum / valid if valid else None
            for q in (0.5, 0.9, 0.99):
                out[f"p{int(q*100)}"] = self.tdigest.quantile(q) if valid else None
        return out


class SketchBatch:
    """Actor-pool batch fn: one sketch-delta row per batch."""

    def __init__(self, columns: list[str] | None = None) -> None:
        self.columns = columns

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = self.columns or batch.column_names
        states: dict[str, ColumnStats] = {}
        for name in cols:
            if name not in batch.column_names:
                continue
            arr = batch.column(name)
            if (
                pa.types.is_struct(arr.type)
                or pa.types.is_list(arr.type)
                or pa.types.is_large_list(arr.type)
                or pa.types.is_fixed_size_list(arr.type)
            ):
                continue
            st = ColumnStats(_is_numeric(arr.type))
            st.update(arr)
            states[name] = st
        return pa.table({"stats": [pickle.dumps(states)]})


def _merge_state_rows(rows: list[dict[str, Any]]) -> dict[str, ColumnStats]:
    acc: dict[str, ColumnStats] = {}
    for row in rows:
        states = pickle.loads(row["stats"])
        for name, st in states.items():
            if name in acc:
                acc[name].merge(st)
            else:
                acc[name] = st
    return acc


def column_stats(
    ds: Any,
    columns: list[str] | None = None,
    concurrency: int | None = None,
) -> dict[str, dict[str, Any]]:
    """Distributed per-column stats over a Dataset."""
    kwargs: dict[str, Any] = {"batch_format": "pyarrow", "batch_size": None}
    if concurrency:
        # callable CLASS -> Ray actor pool (per-actor __init__ builds the
        # column plan once); plain instance -> stateless tasks
        deltas = ds.map_batches(
            SketchBatch,
            fn_constructor_args=(columns,),
            concurrency=concurrency,
            **kwargs,
        )
    else:
        deltas = ds.map_batches(SketchBatch(columns), **kwargs)

    def merge_block(batch: pa.Table) -> pa.Table:
        acc = _merge_state_rows(batch.to_pylist())
        return pa.table({"stats": [pickle.dumps(acc)]})

    # materialize: deltas are tiny; avoids re-running the scan per consume
    deltas = deltas.materialize()
    count = deltas.count()
    while count > 1024:
        deltas = deltas.repartition(max(1, count // 64)).map_batches(
            merge_block, batch_format="pyarrow", batch_size=None
        ).materialize()
        count = deltas.count()
    merged = _merge_state_rows(deltas.take_all())
    return {name: st.summary() for name, st in merged.items()}


def column_stats_table(table: pa.Table, columns: list[str] | None = None) -> dict[str, dict[str, Any]]:
    """Local-path stats (same kernels, one batch)."""
    row = SketchBatch(columns)(table)
    merged = _merge_state_rows(row.to_pylist())
    return {name: st.summary() for name, st in merged.items()}


def profile_dataset(
    ds: Any, columns: list[str] | None = None
) -> dict[str, "ColumnStats"]:
    """Full mergeable column profile (the reusable artifact for drift
    checks): run the sketch stage, return raw ColumnStats per column.
    Picklable — persist alongside checkpoints as the reference profile.
    """
    deltas = ds.map_batches(
        SketchBatch(columns), batch_format="pyarrow", batch_size=None
    ).materialize()
    return _merge_state_rows(deltas.take_all())


def frequent_items(
    ds: Any, column: str, capacity: int = 64
) -> "MisraGries":
    """Distributed heavy-hitter summary of a column (skew diagnostics:
    which keys would melt a groupby partition?). One streaming pass of
    per-batch Misra-Gries deltas — each a few KiB — merged on the
    driver; bounds per ``MisraGries`` (exact when the column's distinct
    count stays within ``capacity``)."""
    from patito_ray.state.sketches import MisraGries

    def delta(batch: pa.Table) -> pa.Table:
        mg = MisraGries(capacity)
        mg.add(batch.column(column))
        return pa.table({"mg": pa.array([pickle.dumps(mg)], type=pa.binary())})

    acc = MisraGries(capacity)
    for row in ds.map_batches(
        delta, batch_format="pyarrow", batch_size=None
    ).take_all():
        acc.merge(pickle.loads(row["mg"]))
    return acc


def fd_violations(
    ds: Any,
    lhs: str,
    rhs: str,
    limit_bytes: int | None = None,
) -> pa.Table:
    """Functional-dependency audit ``lhs -> rhs``: does every ``lhs``
    value map to exactly one distinct non-null ``rhs``? Returns one
    row — ``n_keys`` (distinct lhs with any non-null rhs),
    ``n_violating_keys`` (lhs values with >1 distinct rhs) and
    ``max_distinct_rhs``. The discovery/verification primitive for
    schema constraints SQL cannot declare (ANSI has no ASSERT FD).

    Scale shape: rides :func:`patito_ray.stages.agg.distinct_per_group`
    — only DISTINCT (lhs, rhs) pairs move, then tiny per-key counts
    through the adaptive merge; the final reduction is a one-row
    aggregate over counts (driver table or one more streaming pass).
    """
    from patito_ray.stages.agg import collect_table, distinct_per_group

    kwargs = {} if limit_bytes is None else {"limit_bytes": limit_bytes}
    res = distinct_per_group(ds, by=lhs, value=rhs, **kwargs)

    _schema = pa.schema(
        [
            ("n_keys", pa.int64()),
            ("n_violating_keys", pa.int64()),
            ("max_distinct_rhs", pa.int64()),
        ]
    )

    def sizes(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _schema.empty_table()
        c = t.column("n_distinct").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n_keys": pa.array([len(c)], type=pa.int64()),
                "n_violating_keys": pa.array([int((c > 1).sum())], type=pa.int64()),
                "max_distinct_rhs": pa.array([int(c.max())], type=pa.int64()),
            }
        )

    _zeros = pa.table(
        {name: pa.array([0], type=pa.int64()) for name in _schema.names}
    )
    if isinstance(res, pa.Table):
        out = sizes(res)
        return out if out.num_rows else _zeros
    # distributed merge output is key-disjoint across blocks (post-
    # groupby), so per-block size partials sum exactly
    parts = collect_table(
        res.map_batches(sizes, batch_format="pyarrow", batch_size=None),
        empty_schema=_schema,
    )
    if parts.num_rows == 0:
        return _zeros
    return pa.table(
        {
            "n_keys": pa.array(
                [int(pc.sum(parts.column("n_keys")).as_py() or 0)], type=pa.int64()
            ),
            "n_violating_keys": pa.array(
                [int(pc.sum(parts.column("n_violating_keys")).as_py() or 0)],
                type=pa.int64(),
            ),
            "max_distinct_rhs": pa.array(
                [int(pc.max(parts.column("max_distinct_rhs")).as_py() or 0)],
                type=pa.int64(),
            ),
        }
    )


def inclusion_audit(
    ds_a: Any,
    col_a: str,
    ds_b: Any,
    col_b: str,
    num_partitions: int | None = None,
) -> pa.Table:
    """Inclusion-dependency audit ``A ⊆ B`` (foreign-key-candidate
    discovery): how many distinct non-null values of ``ds_a[col_a]``
    also appear in ``ds_b[col_b]``? Returns one row —
    ``n_distinct`` (distinct non-null A values) and ``n_contained``
    (of those, present in B). Exact (real values compared, not hashes).

    Scale shape: each side emits only its batch-DISTINCT values tagged
    with a side bit; one hash-partition exchange co-locates equal
    values; each partition reduces to two integers with vectorized set
    membership. The driver sums ``num_partitions`` rows — never values.
    """
    import numpy as np
    import polars as pl

    from patito_ray.stages.exchange import hash_partition_ids

    if num_partitions is None:
        from patito_ray.stages.join import default_num_partitions

        num_partitions = default_num_partitions()
    P = num_partitions

    def emit(col: str, side: int):
        def f(t: pa.Table) -> pa.Table:
            v = t.column(col)
            if isinstance(v, pa.ChunkedArray):
                v = v.combine_chunks()
            v = v.drop_null()
            v = pc.unique(v)
            part = (
                hash_partition_ids(v, P, f"inclusion_audit column {col!r}")
                if len(v)
                else np.empty(0, np.int64)
            )
            return pa.table(
                {
                    "part": pa.array(part, type=pa.int64()),
                    "v": v,
                    "side": pa.array(
                        np.full(len(v), side, dtype=np.int8), type=pa.int8()
                    ),
                }
            )

        return f

    rows_a = ds_a.map_batches(emit(col_a, 0), batch_format="pyarrow", batch_size=None)
    rows_b = ds_b.map_batches(emit(col_b, 1), batch_format="pyarrow", batch_size=None)

    _schema = pa.schema([("n_distinct", pa.int64()), ("n_contained", pa.int64())])

    def part_counts(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "v" not in t.column_names:
            return _schema.empty_table()
        df = pl.from_arrow(t.select(["v", "side"]))
        a = df.filter(pl.col("side") == 0)["v"].unique()
        if len(a) == 0:
            return _schema.empty_table()
        b = df.filter(pl.col("side") == 1)["v"].unique()
        contained = int(a.is_in(b).sum()) if len(b) else 0
        return pa.table(
            {
                "n_distinct": pa.array([len(a)], type=pa.int64()),
                "n_contained": pa.array([contained], type=pa.int64()),
            }
        )

    from patito_ray.stages.agg import collect_table

    parts = collect_table(
        rows_a.union(rows_b).groupby("part").map_groups(
            part_counts, batch_format="pyarrow"
        ),
        empty_schema=_schema,
    )
    return pa.table(
        {
            "n_distinct": pa.array(
                [int(pc.sum(parts.column("n_distinct")).as_py() or 0)],
                type=pa.int64(),
            ),
            "n_contained": pa.array(
                [int(pc.sum(parts.column("n_contained")).as_py() or 0)],
                type=pa.int64(),
            ),
        }
    )


_BENFORD_SCHEMA = pa.schema([("digit", pa.int64()), ("cnt", pa.int64())])


def benford_counts(ds: Any, column: str) -> pa.Table:
    """Leading-significant-digit counts of the POSITIVE values in an
    integer column (the Benford's-law fraud/corruption audit input).
    Exact integer arithmetic — the digit comes from a power-of-ten
    ``searchsorted``, never ``log10`` (whose float edge at 10^k could
    disagree with SQL's string route). Per-batch 9-bin bincount
    partials, 9-row driver merge: O(1) exchange at any corpus size."""
    import numpy as np

    powers = np.power(
        np.uint64(10), np.arange(19, dtype=np.uint64), dtype=np.uint64
    )

    def partial(t: pa.Table) -> pa.Table:
        v = t.column(column)
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        if not pa.types.is_integer(v.type):
            raise TypeError(
                f"benford_counts needs an integer column, got {column!r}: {v.type}"
            )
        x = v.drop_null().to_numpy(zero_copy_only=False).astype(np.int64)
        x = x[x > 0].view(np.uint64)
        if len(x) == 0:
            return _BENFORD_SCHEMA.empty_table()
        nd = np.searchsorted(powers, x, side="right")
        lead = (x // powers[nd - 1]).astype(np.int64)
        cnt = np.bincount(lead, minlength=10)[1:10]
        return pa.table(
            {
                "digit": pa.array(np.arange(1, 10, dtype=np.int64)),
                "cnt": pa.array(cnt.astype(np.int64)),
            }
        )

    from patito_ray.stages.agg import collect_table, merge_partial_sums

    merged = merge_partial_sums(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["digit"],
        ["cnt"],
    )
    if not isinstance(merged, pa.Table):
        # <= 9 distinct digits: always safe to localize
        merged = collect_table(merged, empty_schema=_BENFORD_SCHEMA)
    # drop zero-count digits: the result states what was OBSERVED,
    # matching plain GROUP BY semantics
    merged = merged.filter(pc.greater(merged.column("cnt"), 0))
    return merged.sort_by("digit")


def heavy_hitters(
    ds: Any,
    column: str,
    phi: float,
    capacity: int | None = None,
    limit_bytes: int | None = None,
) -> pa.Table:
    """EXACT φ-heavy hitters: every value whose count is at least
    ``ceil(phi * n)`` (n = non-null rows), with its exact count — a
    full ``GROUP BY`` would move every (value, row) pair; this moves
    two tiny summaries instead.

    Pass 1: per-batch Misra-Gries deltas (capacity ``ceil(2/phi)``;
    merged undercount ≤ n/(k+1) < phi·n/2, so every true φ-heavy value
    SURVIVES the summary — the candidate set is a guaranteed superset).
    Pass 2: exact counts restricted to the ≤-capacity candidate set
    (per-batch ``is_in`` + value_counts partials through the adaptive
    partial-sum merge), then the threshold filter. Both passes stream;
    the exchange is bounded by the candidate-set size, independent of
    the column's distinct count.

    The threshold is ``ceil(phi * n)`` in IEEE double arithmetic —
    oracles must use ``CEIL(CAST(phi AS DOUBLE) * COUNT(*))`` so both
    engines round the same product (a DECIMAL literal would not).
    """
    from patito_ray.state.sketches import MisraGries

    if not 0.0 < phi < 1.0:
        raise ValueError(f"phi must be in (0, 1), got {phi}")
    k = capacity if capacity is not None else max(8, int(np.ceil(2.0 / phi)))

    def delta(batch: pa.Table) -> pa.Table:
        col = batch.column(column)
        mg = MisraGries(k)
        mg.add(col)
        n = len(col) - col.null_count
        return pa.table(
            {
                "mg": pa.array([pickle.dumps(mg)], type=pa.binary()),
                "n": pa.array([n], type=pa.int64()),
            }
        )

    acc = MisraGries(k)
    total = 0
    for row in ds.map_batches(
        delta, batch_format="pyarrow", batch_size=None
    ).take_all():
        acc.merge(pickle.loads(row["mg"]))
        total += int(row["n"])

    empty = pa.table(
        {"value": pa.array([], type=pa.string()), "cnt": pa.array([], type=pa.int64())}
    )
    if total == 0:
        return empty
    thresh = int(np.ceil(np.float64(phi) * np.float64(total)))
    # candidate iff its count UPPER bound can reach the threshold
    cand = [v for v, c in acc.counts.items() if c + acc.decremented >= thresh]
    if not cand:
        return empty

    def cnt_partial(t: pa.Table) -> pa.Table:
        col = t.column(column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        value_set = pa.array(cand, type=col.type)
        vals = col.filter(pc.fill_null(pc.is_in(col, value_set=value_set), False))
        if len(vals) == 0:
            return pa.table(
                {
                    "value": pa.array([], type=col.type),
                    "cnt": pa.array([], type=pa.int64()),
                }
            )
        vc = pc.value_counts(vals)
        return pa.table(
            {"value": vc.field("values"), "cnt": pc.cast(vc.field("counts"), pa.int64())}
        )

    from patito_ray.stages.agg import collect_table, merge_partial_sums

    partials = ds.map_batches(cnt_partial, batch_format="pyarrow", batch_size=None)
    merge_kwargs = {} if limit_bytes is None else {"limit_bytes": limit_bytes}
    merged = merge_partial_sums(partials, ["value"], ["cnt"], **merge_kwargs)
    if not isinstance(merged, pa.Table):
        # bounded: at most len(cand) <= capacity distinct rows survive
        merged = collect_table(merged, empty_schema=empty.schema)
    keep = pc.greater_equal(merged.column("cnt"), thresh)
    out = merged.filter(keep)
    order = pc.sort_indices(
        out, sort_keys=[("cnt", "descending"), ("value", "ascending")]
    )
    return out.take(order)


def quantile_threshold(ds: Any, column: str, q: float) -> float:
    """Approximate q-quantile of a numeric column via the mergeable
    t-digest sketch pass (one scan, tiny deltas to the driver)."""
    if not 0.0 <= q <= 1.0:
        raise ValueError(f"quantile must be in [0, 1], got {q}")
    prof = profile_dataset(ds, [column]).get(column)
    if prof is None or prof.tdigest is None or prof.count - prof.nulls == 0:
        raise ValueError(
            f"cannot compute a quantile of {column!r}: column missing, "
            "non-numeric, or all-null"
        )
    cut = float(prof.tdigest.quantile(q))
    if np.isnan(cut):
        # all-NaN float columns pass the null-count guard but leave the
        # digest empty; a NaN cut would silently drop every row
        raise ValueError(
            f"cannot compute a quantile of {column!r}: no non-NaN values"
        )
    return cut


def quantile_filter(
    ds: Any, column: str, keep_fraction: float, side: str = "top"
) -> Any:
    """Keep approximately the top (or bottom) ``keep_fraction`` of rows
    by a numeric column — the 'train on the best-scoring X% of the
    corpus' curation step.

    Two streaming passes, no shuffle: (1) the t-digest sketch pass
    finds the cut value, (2) a vectorized threshold filter applies it.
    The CUT is approximate (t-digest quantile error, typically <<1% in
    rank); the FILTER is exact — every kept row's value beats every
    dropped row's (nulls always drop). The threshold is returned on the
    Dataset as ``.quantile_cut`` for reporting."""
    if side not in ("top", "bottom"):
        raise ValueError(f"side must be 'top' or 'bottom', got {side!r}")
    if not 0.0 < keep_fraction <= 1.0:
        raise ValueError(
            f"keep_fraction must be in (0, 1], got {keep_fraction}"
        )
    q = 1.0 - keep_fraction if side == "top" else keep_fraction
    cut = quantile_threshold(ds, column, q)
    op = pc.greater_equal if side == "top" else pc.less_equal

    def keep(batch: pa.Table) -> pa.Table:
        mask = pc.fill_null(op(batch.column(column), cut), False)
        return batch.filter(mask)

    out = ds.map_batches(keep, batch_format="pyarrow", batch_size=None)
    out.quantile_cut = cut
    return out


def profile_dataset_split(
    ds: Any,
    split: "Any",
    columns: list[str] | None = None,
) -> dict[Any, dict[str, "ColumnStats"]]:
    """Profile disjoint row groups of ONE dataset in a single scan.

    ``split`` maps a pyarrow batch to a per-row group-label array; each
    batch emits one pickled sketch-delta row per label present, and the
    tiny deltas merge per label on the driver. One pass over the input
    replaces one full scan per group — the drift check's
    reference/current halves are the canonical caller.
    """
    kern = SketchBatch(columns)

    def fn(batch: pa.Table) -> pa.Table:
        labels = split(batch)
        if isinstance(labels, pa.ChunkedArray):
            labels = labels.combine_chunks()
        groups: list[Any] = []
        blobs: list[bytes] = []
        for lab in pc.unique(labels).to_pylist():
            mask = pc.is_null(labels) if lab is None else pc.equal(labels, lab)
            sub = batch.filter(mask)
            groups.append(lab)
            blobs.append(kern(sub).column("stats")[0].as_py())
        return pa.table(
            {
                "group": pa.array(groups, type=labels.type),
                "stats": pa.array(blobs, type=pa.binary()),
            }
        )

    deltas = ds.map_batches(fn, batch_format="pyarrow", batch_size=None)
    by_group: dict[Any, list[dict[str, Any]]] = {}
    for row in deltas.take_all():
        by_group.setdefault(row["group"], []).append(row)
    return {lab: _merge_state_rows(rows) for lab, rows in by_group.items()}


def drift_check(
    ds: Any,
    reference_profile: dict[str, "ColumnStats"],
    columns: list[str] | None = None,
    max_drift: float = 0.1,
    current_profile: dict[str, "ColumnStats"] | None = None,
) -> dict[str, dict[str, Any]]:
    """Distribution-drift check (north-star component): profile the
    current dataset and compare per numeric column against a reference
    profile via the t-digest KS distance; also reports the relative
    cardinality shift from the HLL sketches. ``ok`` = drift below
    ``max_drift``. Pass ``current_profile`` (e.g. one already computed
    by the same sketch pass that produced the reference) to skip
    re-profiling — profiles are the mergeable artifact, the check is
    pure sketch arithmetic."""
    if current_profile is not None:
        current = current_profile
    else:
        current = profile_dataset(ds, columns or list(reference_profile))
    out: dict[str, dict[str, Any]] = {}
    for name, ref in reference_profile.items():
        cur = current.get(name)
        if cur is None:
            out[name] = {"ok": False, "reason": "column missing"}
            continue
        entry: dict[str, Any] = {}
        if ref.tdigest is not None and cur.tdigest is not None:
            ks = drift_distance(cur.tdigest, ref.tdigest)
            entry["ks_distance"] = round(ks, 4)
            entry["ok"] = ks <= max_drift
        else:
            entry["ok"] = True
        ref_card = ref.hll.estimate()
        cur_card = cur.hll.estimate()
        if ref_card > 0:
            entry["cardinality_ratio"] = round(cur_card / ref_card, 4)
        out[name] = entry
    return out


def drift_distance(current: TDigest, reference: TDigest) -> float:
    """Max CDF gap between two t-digest profiles (sketch-level KS
    statistic) — the distribution-drift check of the north star."""
    cm, cw = current.state()
    rm, rw = reference.state()
    if len(cm) == 0 or len(rm) == 0:
        return float("nan")
    support = np.unique(np.concatenate([cm, rm]))

    def cdf(means: np.ndarray, weights: np.ndarray, xs: np.ndarray) -> np.ndarray:
        cum = np.cumsum(weights) - weights / 2
        total = weights.sum()
        return np.interp(xs, means, cum / total, left=0.0, right=1.0)

    return float(np.abs(cdf(cm, cw, support) - cdf(rm, rw, support)).max())


def k_anonymity(
    ds: Any,
    quasi_identifiers: list[str],
    k: int,
    limit_bytes: int | None = None,
) -> pa.Table:
    """Privacy audit: does every quasi-identifier combination appear at
    least ``k`` times? Returns one row — ``n_rows`` (non-null-tuple
    rows), ``n_groups``, ``n_small_groups`` (size < k), ``violating_rows``
    (rows inside those groups — the re-identifiable population) and
    ``min_group_size``.

    Scale shape: per-batch vectorized DISTINCT-tuple partial counts ->
    the adaptive partial-sum merge (a hot combination costs one row per
    block) -> a tiny second aggregation over group sizes. Null tuples
    (any null member) are excluded — SQL GROUP BY would keep them, so
    the oracle filters identically."""
    import polars as pl
    import pyarrow.compute as pc

    from patito_ray.stages.agg import collect_table, merge_partial_sums

    if k < 1:
        raise ValueError(f"k_anonymity needs k >= 1, got {k}")
    if not quasi_identifiers:
        raise ValueError("k_anonymity needs at least one quasi-identifier")

    def partial(t: pa.Table) -> pa.Table:
        sub = t.select(quasi_identifiers)
        mask = None
        for c in quasi_identifiers:
            v = pc.is_valid(sub.column(c))
            mask = v if mask is None else pc.and_(mask, v)
        sub = sub.filter(mask)
        return (
            pl.from_arrow(sub)
            .group_by(quasi_identifiers)
            .agg(pl.len().cast(pl.Int64).alias("c"))
            .to_arrow()
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    merge_kwargs = {} if limit_bytes is None else {"limit_bytes": limit_bytes}
    merged = merge_partial_sums(partials, quasi_identifiers, ["c"], **merge_kwargs)

    _sizes_schema = pa.schema(
        [
            ("n_rows", pa.int64()),
            ("n_groups", pa.int64()),
            ("n_small_groups", pa.int64()),
            ("violating_rows", pa.int64()),
            ("min_group_size", pa.int64()),
        ]
    )

    def sizes_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            # Ray's groupby can emit empty blocks; a 0-size row here
            # would poison the driver's min_group_size reduction
            return _sizes_schema.empty_table()
        c = t.column("c").to_numpy(zero_copy_only=False)
        small = c < k
        return pa.table(
            {
                "n_rows": pa.array([int(c.sum())], type=pa.int64()),
                "n_groups": pa.array([len(c)], type=pa.int64()),
                "n_small_groups": pa.array([int(small.sum())], type=pa.int64()),
                "violating_rows": pa.array([int(c[small].sum())], type=pa.int64()),
                "min_group_size": pa.array([int(c.min())], type=pa.int64()),
            }
        )

    _zeros = pa.table(
        {name: pa.array([0], type=pa.int64()) for name in _sizes_schema.names}
    )
    if isinstance(merged, pa.Table):
        out = sizes_partial(merged)
        return out if out.num_rows else _zeros
    parts = collect_table(
        merged.map_batches(sizes_partial, batch_format="pyarrow", batch_size=None),
        empty_schema=_sizes_schema,
    )
    if parts.num_rows == 0:
        return _zeros
    return pa.table(
        {
            "n_rows": pa.array([int(pc.sum(parts.column("n_rows")).as_py() or 0)], type=pa.int64()),
            "n_groups": pa.array([int(pc.sum(parts.column("n_groups")).as_py() or 0)], type=pa.int64()),
            "n_small_groups": pa.array(
                [int(pc.sum(parts.column("n_small_groups")).as_py() or 0)], type=pa.int64()
            ),
            "violating_rows": pa.array(
                [int(pc.sum(parts.column("violating_rows")).as_py() or 0)], type=pa.int64()
            ),
            "min_group_size": pa.array(
                [int(pc.min(parts.column("min_group_size")).as_py() or 0)], type=pa.int64()
            ),
        }
    )


def gini_key_skew(
    ds: Any,
    key_col: str,
    limit_bytes: int | None = None,
) -> pa.Table:
    """Key-distribution skew audit -> one row: ``n_keys``, ``total``
    (non-null-key rows), ``max_cnt``, ``gini`` (Gini coefficient of the
    per-key count distribution, 0 = uniform, ->1 = one hot key) and
    ``max_share`` (hot-key fraction). The inputs a shuffle planner
    needs before picking salting/broadcast strategy (see
    ``stages.join.skew_join``).

    Scale shape: per-batch vectorized partial counts -> the adaptive
    partial-sum merge (one narrow row per distinct key per block).
    Below ``limit_bytes`` the Gini rank sum is one driver numpy kernel;
    beyond it the ranks come from ``ordered_prefix_sum`` (one narrow
    exchange over (count, key) — the numerator is rank-arithmetic on
    int64, so both branches are exact and tie-order-invariant: equal
    counts occupy a contiguous rank range whose weight sum is fixed).
    Null keys are excluded on both engines.
    """
    import polars as pl
    import pyarrow.compute as pc

    from patito_ray.stages.agg import collect_table, merge_partial_sums

    def partial(t: pa.Table) -> pa.Table:
        sub = t.select([key_col])
        col = sub.column(key_col)
        if col.null_count:
            sub = sub.filter(pc.is_valid(col))
        return (
            pl.from_arrow(sub)
            .group_by(key_col)
            .agg(pl.len().cast(pl.Int64).alias("c"))
            .to_arrow()
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    merge_kwargs = {} if limit_bytes is None else {"limit_bytes": limit_bytes}
    merged = merge_partial_sums(partials, [key_col], ["c"], **merge_kwargs)

    if isinstance(merged, pa.Table):
        c = np.sort(merged.column("c").to_numpy(zero_copy_only=False))
        n, s = len(c), int(c.sum())
        if n == 0:
            return pa.table(
                {
                    "n_keys": pa.array([], pa.int64()),
                    "total": pa.array([], pa.int64()),
                    "max_cnt": pa.array([], pa.int64()),
                    "gini": pa.array([], pa.float64()),
                    "max_share": pa.array([], pa.float64()),
                }
            )
        mx = int(c[-1])
        i = np.arange(1, n + 1, dtype=np.int64)
        num = int(((2 * i - n - 1) * c).sum())
    else:
        from patito_ray.stages.prefix import ordered_prefix_sum

        m = merged.materialize()
        n = m.count()
        _p_schema = pa.schema(
            [("num", pa.int64()), ("s", pa.int64()), ("mx", pa.int64())]
        )
        if n == 0:
            return pa.table(
                {
                    "n_keys": pa.array([], pa.int64()),
                    "total": pa.array([], pa.int64()),
                    "max_cnt": pa.array([], pa.int64()),
                    "gini": pa.array([], pa.float64()),
                    "max_share": pa.array([], pa.float64()),
                }
            )

        def narrow(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "c" not in t.column_names:
                return pa.table(
                    {
                        key_col: pa.array([], pa.int64()),
                        "c": pa.array([], pa.int64()),
                        "_one": pa.array([], pa.int64()),
                    }
                )
            t = t.select([key_col, "c"])
            return t.append_column(
                "_one", pa.array(np.ones(t.num_rows, dtype=np.int64))
            )

        plan = m.map_batches(narrow, batch_format="pyarrow", batch_size=None)
        ranked = ordered_prefix_sum(
            plan, "c", "_one", out_col="_rank", tie_col=key_col
        )

        def contrib(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "_rank" not in t.column_names:
                return _p_schema.empty_table()
            cc = t.column("c").to_numpy(zero_copy_only=False)
            r = t.column("_rank").to_numpy(zero_copy_only=False)
            i1 = r + 1  # _rank is the 0-based exclusive prefix of ones
            return pa.table(
                {
                    "num": pa.array([int(((2 * i1 - n - 1) * cc).sum())]),
                    "s": pa.array([int(cc.sum())]),
                    "mx": pa.array([int(cc.max())]),
                },
                schema=_p_schema,
            )

        parts = collect_table(
            ranked.map_batches(contrib, batch_format="pyarrow", batch_size=None),
            empty_schema=_p_schema,
        )
        num = int(pc.sum(parts.column("num")).as_py() or 0)
        s = int(pc.sum(parts.column("s")).as_py() or 0)
        mx = int(pc.max(parts.column("mx")).as_py() or 0)

    gini = float(num) / (float(n) * float(s))
    return pa.table(
        {
            "n_keys": pa.array([n], pa.int64()),
            "total": pa.array([s], pa.int64()),
            "max_cnt": pa.array([mx], pa.int64()),
            "gini": pa.array([gini], pa.float64()),
            "max_share": pa.array([float(mx) / float(s)], pa.float64()),
        }
    )
