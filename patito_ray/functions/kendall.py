"""Exact grouped Kendall tau-b — rank correlation with integer pair
counts, the robust trend statistic (Mann-Kendall tests, concordance
audits) that SQL can only express as an O(n²) self-join.

Per group the kernel is Knight's O(n log n) algorithm, fully
vectorized: sort by (x, y), then the discordant count D is exactly the
number of inversions of y in that order (x-tied pairs contribute
nothing because their y's are sorted; y-tied pairs are excluded by the
strict comparison). Inversions are counted by a bottom-up mergesort
whose per-level merge + cross-count is ONE ``np.lexsort`` + cumsum over
the whole array — no per-run Python. Tie groups come from run lengths
over sorted x / sorted y / the lexsorted (x, y) pairs. All outputs are
exact int64 pair counts; the only float is the final tau expression.

Distribution: one hash exchange on the group key (the
``_adaptive_grouped_holistic`` spine shared with grouped_quantiles /
grouped_mad) — a group must fit one partition task, the standard
grouped-holistic contract here. At crawl scale the group key is a
bounded dimension (language, source, event type), never a document id.

No reference counterpart (JakobGM/patito has no correlation surface);
parity target is the SQL pairwise definition, verified bit-exact.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa

from patito_ray.stages.agg import _DRIVER_MERGE_BYTES


def count_inversions(y: np.ndarray) -> int:
    """Number of pairs i < j with ``y[i] > y[j]`` (strict), counted by
    a fully-vectorized bottom-up mergesort: each level sorts within
    blocks via one lexsort (value ascending, left half before right on
    ties) and credits every right-half element with the count of
    STRICTLY greater left-half elements via a per-block cumulative sum.

    Padding to a power of two uses +INF sentinels; they are a
    contiguous global suffix, so a left half containing a sentinel
    implies an all-sentinel right half — sentinel contributions are
    masked and can never inflate a real element's count.
    """
    y = np.asarray(y)
    n = len(y)
    if n < 2:
        return 0
    size = 1 << int(np.ceil(np.log2(n)))
    inf = np.iinfo(np.int64).max
    arr = np.full(size, inf, dtype=np.int64)
    arr[:n] = y.astype(np.int64)
    pad = np.zeros(size, dtype=bool)
    pad[n:] = True
    idx = np.arange(size)
    total = 0
    run = 1
    while run < size:
        width = 2 * run
        block = idx // width
        half = (idx // run) & 1
        order = np.lexsort((half, arr, block))
        vals = arr[order]
        pads = pad[order]
        halves = half[order]
        left = (halves == 0).astype(np.int64)
        cum = np.cumsum(left)
        starts = np.arange(0, size, width)
        base = np.where(starts > 0, cum[np.maximum(starts - 1, 0)], 0)
        cum_within = cum - np.repeat(base, width)
        # right-half real elements: strictly-greater left count
        mask = (halves == 1) & (~pads)
        if mask.any():
            total += int((run - cum_within[mask]).sum())
        arr = vals
        pad = pads
        run = width
    return total


def _tie_sum(sorted_runs_breaks: np.ndarray, n: int) -> int:
    """Σ c·(c−1)/2 over runs delimited by break positions."""
    bounds = np.concatenate([[0], sorted_runs_breaks + 1, [n]])
    runs = np.diff(bounds)
    return int((runs * (runs - 1) // 2).sum())


def kendall_counts(x: np.ndarray, y: np.ndarray) -> dict[str, int]:
    """Exact pair classification for one group: concordant /
    discordant / x-only ties / y-only ties / both-ties over all
    unordered pairs. Both inputs must be int64-representable (hash or
    grid-quantize first — the exactness contract)."""
    x = np.asarray(x).astype(np.int64)
    y = np.asarray(y).astype(np.int64)
    n = len(x)
    if n > 4_000_000_000:
        # n(n-1)/2 would overflow the int64 pair-count columns (and the
        # group wouldn't fit one partition task long before that)
        raise ValueError(
            f"kendall_counts: group of {n} rows exceeds the exact int64 "
            "pair-count range — shard or sample the group first"
        )
    n0 = n * (n - 1) // 2
    if n < 2:
        return dict(n=n, concordant=0, discordant=0, ties_x=0, ties_y=0, ties_xy=0)
    order = np.lexsort((y, x))
    xs, ys = x[order], y[order]
    d = count_inversions(ys)
    tx = _tie_sum(np.nonzero(np.diff(xs))[0], n)
    ty = _tie_sum(np.nonzero(np.diff(np.sort(y)))[0], n)
    both_breaks = np.nonzero((np.diff(xs) != 0) | (np.diff(ys) != 0))[0]
    txy = _tie_sum(both_breaks, n)
    c = n0 - d - tx - ty + txy
    return dict(
        n=n,
        concordant=c,
        discordant=d,
        ties_x=tx - txy,
        ties_y=ty - txy,
        ties_xy=txy,
    )


def tau_b(counts: dict[str, int], ndigits: int = 6) -> float | None:
    """The one float expression, shared with the SQL oracle:
    (C − D) / (√(n0 − tx) · √(n0 − ty)), rounded half-away once."""
    n = counts["n"]
    n0 = n * (n - 1) // 2
    tx = counts["ties_x"] + counts["ties_xy"]
    ty = counts["ties_y"] + counts["ties_xy"]
    dx = n0 - tx
    dy = n0 - ty
    if dx <= 0 or dy <= 0:
        return None
    from patito_ray.stages.agg import round_half_away

    v = float(counts["concordant"] - counts["discordant"]) / (
        float(dx) ** 0.5 * float(dy) ** 0.5
    )
    return round_half_away(v, ndigits)


_OUT_SCHEMA = [
    ("n", pa.int64()),
    ("concordant", pa.int64()),
    ("discordant", pa.int64()),
    ("ties_x", pa.int64()),
    ("ties_y", pa.int64()),
    ("ties_xy", pa.int64()),
    ("tau_b", pa.float64()),
]


def grouped_kendall(
    ds: Any,
    by: str,
    x: str,
    y: str,
    num_partitions: int | None = None,
    limit_bytes: int = _DRIVER_MERGE_BYTES,
) -> Any:
    """One row per ``by`` group: the five exact pair counts plus tau-b.
    Rows with a null x or y drop (SQL aggregate semantics) BEFORE the
    exchange, which also shrinks it. Rides the shared grouped-holistic
    spine: driver fast path under ``limit_bytes``, else one hash
    exchange with the kernel inside each partition task."""
    import polars as pl
    import pyarrow.compute as pc

    from patito_ray.stages.join import default_num_partitions
    from patito_ray.stages.quantiles import _adaptive_grouped_holistic

    if num_partitions is None:
        num_partitions = default_num_partitions()

    def add_part(t: pa.Table) -> pa.Table:
        from patito_ray.stages.exchange import hash_partition_ids

        t = pa.table({by: t.column(by), x: t.column(x), y: t.column(y)})
        valid = pc.and_kleene(pc.is_valid(t.column(x)), pc.is_valid(t.column(y)))
        if pc.any(pc.invert(valid)).as_py():
            t = t.filter(valid)
        part = hash_partition_ids(
            t.column(by), num_partitions, f"grouped_kendall key column {by!r}"
        )
        return t.append_column("part", pa.array(part, type=pa.int64()))

    def per_partition(group_table: pa.Table) -> pa.Table:
        kt = group_table.schema.field(by).type
        out_schema = pa.schema([(by, kt)] + _OUT_SCHEMA)
        if group_table.num_rows == 0:
            return out_schema.empty_table()
        df = pl.from_arrow(group_table.drop_columns(["part"]))
        rows: list[tuple] = []
        for (key,), sub in df.group_by(by, maintain_order=False):
            counts = kendall_counts(sub[x].to_numpy(), sub[y].to_numpy())
            rows.append(
                (
                    key,
                    counts["n"],
                    counts["concordant"],
                    counts["discordant"],
                    counts["ties_x"],
                    counts["ties_y"],
                    counts["ties_xy"],
                    tau_b(counts),
                )
            )
        cols = list(zip(*rows))
        return pa.table(
            {
                by: pa.array(cols[0], kt),
                "n": pa.array(cols[1], pa.int64()),
                "concordant": pa.array(cols[2], pa.int64()),
                "discordant": pa.array(cols[3], pa.int64()),
                "ties_x": pa.array(cols[4], pa.int64()),
                "ties_y": pa.array(cols[5], pa.int64()),
                "ties_xy": pa.array(cols[6], pa.int64()),
                "tau_b": pa.array(cols[7], pa.float64()),
            },
            schema=out_schema,
        )

    return _adaptive_grouped_holistic(ds, add_part, per_partition, limit_bytes)


def avg_rank2(a: np.ndarray) -> np.ndarray:
    """Twice the average (midrank) of each element — lo+hi of its tie
    run in 1-based sorted order — so tied ranks stay EXACT integers
    (the .5 grid scaled by 2). Vectorized: one argsort + run bounds."""
    a = np.asarray(a)
    n = len(a)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    order = np.argsort(a, kind="stable")
    s = a[order]
    newrun = np.concatenate([[0], (np.diff(s) != 0).astype(np.int64)])
    run_id = np.cumsum(newrun)
    breaks = np.nonzero(np.diff(s))[0]
    starts = np.concatenate([[0], breaks + 1])
    ends = np.concatenate([breaks, [n - 1]])
    r2_sorted = (starts[run_id] + 1) + (ends[run_id] + 1)
    out = np.empty(n, dtype=np.int64)
    out[order] = r2_sorted
    return out


def spearman_moments(x: np.ndarray, y: np.ndarray) -> dict[str, int]:
    """Exact integer moments of the doubled midranks: Σrx·ry, Σrx²,
    Σry² (Σrx = Σry = n(n+1), constant, folded into the rho formula).
    Valid while 4n³ < 2^63 (n ≲ 1.3 M per group) — beyond that the
    int64 moment itself overflows; raise loudly."""
    n = len(x)
    if n > 1_300_000:
        raise ValueError(
            "spearman_moments: group too large for exact int64 rank "
            f"moments (n={n} > 1.3e6) — sample or shard the group first"
        )
    rx = avg_rank2(x)
    ry = avg_rank2(y)
    return dict(
        n=n,
        sxy=int(np.dot(rx, ry)),
        sxx=int(np.dot(rx, rx)),
        syy=int(np.dot(ry, ry)),
    )


def spearman_rho(m: dict[str, int], ndigits: int = 6) -> float | None:
    """(nΣxy − ΣxΣy) / (√(nΣxx−Σx²)·√(nΣyy−Σy²)) over the doubled
    midranks, with Σx = Σy = n(n+1); arbitrary-precision integers feed
    one float expression, rounded half-away once (SQL ROUND parity)."""
    n = m["n"]
    s1 = n * (n + 1)
    num = n * m["sxy"] - s1 * s1
    dx = n * m["sxx"] - s1 * s1
    dy = n * m["syy"] - s1 * s1
    if dx <= 0 or dy <= 0:
        return None
    from patito_ray.stages.agg import round_half_away

    v = float(num) / (float(dx) ** 0.5 * float(dy) ** 0.5)
    return round_half_away(v, ndigits)


def grouped_spearman(
    ds: Any,
    by: str,
    x: str,
    y: str,
    num_partitions: int | None = None,
    limit_bytes: int = _DRIVER_MERGE_BYTES,
) -> Any:
    """One row per group: ``(by, n, sxy, sxx, syy, rho)`` — Spearman
    rank correlation with midrank tie handling, exact to the last
    integer. Same grouped-holistic spine and null semantics as
    :func:`grouped_kendall`."""
    import polars as pl
    import pyarrow.compute as pc

    from patito_ray.stages.join import default_num_partitions
    from patito_ray.stages.quantiles import _adaptive_grouped_holistic

    if num_partitions is None:
        num_partitions = default_num_partitions()

    def add_part(t: pa.Table) -> pa.Table:
        from patito_ray.stages.exchange import hash_partition_ids

        t = pa.table({by: t.column(by), x: t.column(x), y: t.column(y)})
        valid = pc.and_kleene(pc.is_valid(t.column(x)), pc.is_valid(t.column(y)))
        if pc.any(pc.invert(valid)).as_py():
            t = t.filter(valid)
        part = hash_partition_ids(
            t.column(by), num_partitions, f"grouped_spearman key column {by!r}"
        )
        return t.append_column("part", pa.array(part, type=pa.int64()))

    def per_partition(group_table: pa.Table) -> pa.Table:
        kt = group_table.schema.field(by).type
        out_schema = pa.schema(
            [
                (by, kt),
                ("n", pa.int64()),
                ("sxy", pa.int64()),
                ("sxx", pa.int64()),
                ("syy", pa.int64()),
                ("rho", pa.float64()),
            ]
        )
        if group_table.num_rows == 0:
            return out_schema.empty_table()
        df = pl.from_arrow(group_table.drop_columns(["part"]))
        rows: list[tuple] = []
        for (key,), sub in df.group_by(by, maintain_order=False):
            m = spearman_moments(sub[x].to_numpy(), sub[y].to_numpy())
            rows.append((key, m["n"], m["sxy"], m["sxx"], m["syy"], spearman_rho(m)))
        cols = list(zip(*rows))
        return pa.table(
            {
                by: pa.array(cols[0], kt),
                "n": pa.array(cols[1], pa.int64()),
                "sxy": pa.array(cols[2], pa.int64()),
                "sxx": pa.array(cols[3], pa.int64()),
                "syy": pa.array(cols[4], pa.int64()),
                "rho": pa.array(cols[5], pa.float64()),
            },
            schema=out_schema,
        )

    return _adaptive_grouped_holistic(ds, add_part, per_partition, limit_bytes)
