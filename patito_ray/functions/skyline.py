"""2-D skyline (Pareto-frontier) filter: the rows no other row
dominates — e.g. "keep documents on the quality-vs-cost frontier" or
"parts no cheaper-and-larger part beats".

Row ``q`` dominates ``p`` when ``q`` is <= on the minimized column and
>= on the maximized column, with at least one strict inequality. The
skyline is every non-dominated row (ties on BOTH columns all survive —
neither dominates the other).

Scale shape: the skyline operator distributes through the classic
union-of-local-skylines identity — ``skyline(A ∪ B) =
skyline(skyline(A) ∪ skyline(B))`` — so ONE map_batches prunes each
block to its local frontier (for randomly ordered 2-D data the local
frontier is O(log block_rows) expected rows) and only those survivors
are merged and pruned once more. Nothing else ever moves; there is no
exchange at all. The merge is adaptive: driver numpy below
``limit_bytes`` (frontiers are tiny), one extra distributed fold
beyond it. The per-block kernel is a single lexsort + prefix-max scan
— no Python over rows.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_DRIVER_MERGE_BYTES = 256 << 20


def _skyline_mask(minimize: np.ndarray, maximize: np.ndarray) -> np.ndarray:
    """Boolean keep-mask of the 2-D skyline (minimize col1, maximize
    col2) over int64 arrays. Vectorized: sort by (min asc, max desc),
    then per distinct ``minimize`` value compare against the prefix
    max of the strictly-cheaper groups.

    Dominated(p) ⟺ (∃q: q.min <  p.min ∧ q.max >= p.max)
                  ∨ (∃q: q.min <= p.min ∧ q.max >  p.max).
    After grouping by the minimize value, with ``gmax`` the group's
    best maximize value and ``m_strict`` the running max of earlier
    (strictly smaller minimize) groups' ``gmax``:
    dominated ⟺ m_strict >= max  ∨  np.maximum(m_strict, gmax) > max.
    """
    n = minimize.shape[0]
    if n == 0:
        return np.zeros(0, dtype=bool)
    order = np.lexsort((-maximize, minimize))
    mn = minimize[order]
    mx = maximize[order]
    # group boundaries over equal minimize values (sorted asc)
    starts = np.empty(n, dtype=bool)
    starts[0] = True
    np.not_equal(mn[1:], mn[:-1], out=starts[1:])
    gidx = np.cumsum(starts) - 1  # group id per sorted row
    gmax = mx[starts]  # first row of each group = its max (sorted desc)
    # prefix max of gmax over STRICTLY earlier groups
    run = np.maximum.accumulate(gmax)
    m_strict = np.empty_like(run)
    m_strict[0] = np.iinfo(np.int64).min
    m_strict[1:] = run[:-1]
    ms_row = m_strict[gidx]
    gm_row = gmax[gidx]
    dominated = (ms_row >= mx) | (np.maximum(ms_row, gm_row) > mx)
    keep_sorted = ~dominated
    keep = np.zeros(n, dtype=bool)
    keep[order] = keep_sorted
    return keep


def _prune(t: pa.Table, minimize: str, maximize: str) -> pa.Table:
    if t.num_rows == 0 or minimize not in t.column_names:
        # ()-schema empty blocks interleave out of upstream exchanges
        return t
    mn = pc.cast(t.column(minimize), pa.int64()).to_numpy(zero_copy_only=False)
    mx = pc.cast(t.column(maximize), pa.int64()).to_numpy(zero_copy_only=False)
    return t.filter(pa.array(_skyline_mask(mn, mx)))


def skyline_2d(
    ds: Any,
    minimize: str,
    maximize: str,
    limit_bytes: int = _DRIVER_MERGE_BYTES,
) -> "pa.Table | Any":
    """Rows of ``ds`` on the 2-D Pareto frontier (``minimize`` asc /
    ``maximize`` desc dominance). Both columns must be integer-typed
    and non-null (snap floats to a grid first — exactness contract).

    Returns a local ``pa.Table`` when the merged local frontiers fit
    under ``limit_bytes`` (the expected case: 2-D frontiers of random
    data are logarithmic), else one more distributed fold then a final
    driver prune — ``limit_bytes=0`` forces that branch (test hook).
    """
    from patito_ray.stages.agg import collect_table

    for col in (minimize, maximize):
        # best-effort dtype validation without forcing plan execution
        try:
            schema = ds.schema(fetch_if_missing=False)
        except TypeError:
            schema = None
        base = getattr(schema, "base_schema", None)
        if base is not None and col in base.names:
            typ = base.field(col).type
            if not pa.types.is_integer(typ):
                raise TypeError(
                    f"skyline_2d needs integer {col!r} (got {typ}); "
                    "snap float columns to an integer grid first"
                )

    def local(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        if t.column(minimize).null_count or t.column(maximize).null_count:
            raise ValueError(
                f"skyline_2d: null values in {minimize!r}/{maximize!r} "
                "(dominance is undefined for nulls; filter them first)"
            )
        return _prune(t, minimize, maximize)

    pruned = ds.map_batches(local, batch_format="pyarrow", batch_size=None)
    m = pruned.materialize()
    if m.size_bytes() > limit_bytes:
        # fold once more at coarse granularity before the driver pass
        m = (
            m.repartition(8)
            .map_batches(
                lambda t: _prune(t, minimize, maximize),
                batch_format="pyarrow",
                batch_size=None,
            )
            .materialize()
        )
    t = collect_table(m)
    return _prune(t, minimize, maximize)
