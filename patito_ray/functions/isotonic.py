"""Grouped isotonic regression via pool-adjacent-violators (PAVA).

The monotone-calibration primitive (public technique: Zadrozny &
Elkan, "Transforming classifier scores into accurate multiclass
probability estimates", KDD 2002; Best & Chakravarti 1990 for PAVA's
optimality): per group, the best nondecreasing fit of y over ordered
levels of x in weighted least squares.

Scale shape: the corpus-sized pass reduces to EXACT integer
``(group, x_level, sum_y_quantized, n)`` partials (one polars
group_by per batch) through the adaptive partial-sum merge, so the
exchange carries one row per (group, level) — never per input row.
PAVA itself runs on the driver over the collected level table, which
is bounded by ``groups x distinct x levels`` (the operator's
documented assumption: x is a BINNED/low-cardinality axis — model
scores bucketed to 1e-3, integer quantities, ages; re-bin a
continuous x first). Pool means are single IEEE divisions of exact
ints, so results are partition-independent and bit-deterministic.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def pava(sums: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Weighted PAVA over one group's x-ordered level aggregates:
    ``sums[i]``/``counts[i]`` are the level's y total and weight.
    Returns the nondecreasing fitted mean per level. Stack-based
    O(levels); exact integer pooling, one division per pool."""
    n = len(sums)
    if n == 0:
        return np.empty(0, np.float64)
    # pool stack: (sum, count, width)
    ps: "list[int]" = []
    pc_: "list[int]" = []
    pw: "list[int]" = []
    for i in range(n):
        ps.append(int(sums[i]))
        pc_.append(int(counts[i]))
        pw.append(1)
        # merge while the last pool's mean < previous pool's mean
        while len(ps) > 1 and ps[-1] * pc_[-2] < ps[-2] * pc_[-1]:
            s, c, w = ps.pop(), pc_.pop(), pw.pop()
            ps[-1] += s
            pc_[-1] += c
            pw[-1] += w
    out = np.empty(n, np.float64)
    pos = 0
    for s, c, w in zip(ps, pc_, pw):
        out[pos : pos + w] = float(s) / float(c)
        pos += w
    return out


def grouped_isotonic(
    ds: Any,
    group_col: str,
    x_col: str,
    y_col: str,
    quantize: float = 100.0,
    limit_bytes: int | None = None,
) -> pa.Table:
    """Isotonic fit of y on x per group -> pa.Table[group, x, n, iso]
    (one row per (group, distinct x level), x ascending within group,
    ``iso`` nondecreasing). y is quantized to ``floor(y*quantize+0.5)``
    int64 first so every aggregate is exact; ``iso`` is the pooled
    mean on the ORIGINAL y scale. x must be integer-valued (bin a
    continuous axis first — this keeps the level table bounded)."""
    import polars as pl

    from patito_ray.stages.agg import collect_table, merge_partial_sums

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema(
                [
                    ("g", pa.large_string()),
                    ("x", pa.int64()),
                    ("s", pa.int64()),
                    ("n", pa.int64()),
                ]
            ).empty_table()
        y = t.column(y_col).to_numpy(zero_copy_only=False)
        q = np.floor(y * quantize + 0.5).astype(np.int64)
        x = pc.cast(t.column(x_col), pa.int64()).to_numpy(zero_copy_only=False)
        g = pc.cast(t.column(group_col), pa.large_string())
        return (
            pl.DataFrame({"g": pl.Series(g.to_pylist()), "x": x, "s": q})
            .group_by(["g", "x"])
            .agg(pl.col("s").sum(), pl.len().cast(pl.Int64).alias("n"))
            .to_arrow()
            .select(["g", "x", "s", "n"])
        )

    kwargs = {} if limit_bytes is None else {"limit_bytes": limit_bytes}
    merged = merge_partial_sums(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["g", "x"],
        ["s", "n"],
        **kwargs,
    )
    if not isinstance(merged, pa.Table):
        merged = collect_table(  # level-bounded: groups x distinct x
            merged,
            empty_schema=pa.schema(
                [
                    ("g", pa.large_string()),
                    ("x", pa.int64()),
                    ("s", pa.int64()),
                    ("n", pa.int64()),
                ]
            ),
        )

    import polars as pl

    df = pl.from_arrow(merged).sort(["g", "x"])
    g = df.get_column("g").to_numpy()
    x = df.get_column("x").to_numpy()
    s = df.get_column("s").to_numpy()
    n = df.get_column("n").to_numpy()
    iso = np.empty(len(g), np.float64)
    _, starts, counts = np.unique(g, return_index=True, return_counts=True)
    # driver loop over GROUPS (level-bounded, not corpus-sized)
    for st, ct in zip(starts, counts):
        iso[st : st + ct] = pava(s[st : st + ct], n[st : st + ct]) / quantize
    return pa.table(
        {
            "g": pa.array(g.tolist(), pa.string()),
            "x": pa.array(x, pa.int64()),
            "n": pa.array(n, pa.int64()),
            "iso": pa.array(iso, pa.float64()),
        }
    )
