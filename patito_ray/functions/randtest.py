"""Distributed Monte-Carlo randomization test (the big-data
permutation test).

Classic permutation tests shuffle labels globally — a full shuffle per
replicate, R shuffles total. The streaming formulation relabels each
row with an independent fair splitmix64 coin per (row, replicate):
under the exchangeable null the replicate statistic has the same
distribution family, and the whole test is ONE `map_batches` pass that
emits R partial-sum rows per batch (no replicate ever materializes, no
exchange beyond the adaptive partial merge over R keys).

Everything through the exceedance count is exact integer arithmetic:
|T_rep| >= |T_obs| is compared cross-multiplied onto the integer grid
with Python ints (no overflow at any corpus size), so the p-value
numerator is bit-determined — the same replicas replayed in SQL via
splitmix64-in-HUGEINT give the identical count (see
`pipelines/q_wave7.py` oracle).
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def randomization_test(
    ds: Any,
    *,
    id_col: str,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    reps: int = 64,
    seed: int = 29,
    cents_scale: float = 100.0,
    limit_bytes: int | None = None,
) -> dict[str, Any]:
    """Two-sample mean-difference randomization test between
    ``group_a`` and ``group_b`` rows of ``ds``.

    Returns ``{"na", "nb", "sa", "sb", "exceed", "reps", "t_obs", "p"}``
    with exact integer counts/sums (values quantized by
    ``cents_scale``); ``t_obs`` and ``p`` are the only floats.
    """
    from patito_ray.functions.dedup import _splitmix
    from patito_ray.stages.agg import collect_table, merge_partial_sums

    half = np.uint64(1) << np.uint64(63)
    schema = pa.schema(
        [
            ("rep", pa.int64()),
            ("sa", pa.int64()),
            ("na", pa.int64()),
            ("sb", pa.int64()),
            ("nb", pa.int64()),
        ]
    )

    def partials(t: pa.Table) -> pa.Table:
        mask = pc.and_kleene(
            pc.is_valid(t.column(value_col)),
            pc.is_in(
                t.column(group_col), value_set=pa.array([group_a, group_b])
            ),
        )
        t = t.filter(mask)
        if t.num_rows == 0:
            return schema.empty_table()
        rid = (
            pc.cast(t.column(id_col), pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype(np.uint64)
        )
        cents = np.floor(
            t.column(value_col).to_numpy(zero_copy_only=False) * cents_scale
            + 0.5
        ).astype(np.int64)
        is_a = np.asarray(t.column(group_col).to_pylist()) == group_a
        out_rep = np.arange(-1, reps, dtype=np.int64)
        sa = np.zeros(out_rep.size, dtype=np.int64)
        na = np.zeros(out_rep.size, dtype=np.int64)
        sb = np.zeros(out_rep.size, dtype=np.int64)
        nb = np.zeros(out_rep.size, dtype=np.int64)
        sa[0] = int(cents[is_a].sum())
        na[0] = int(is_a.sum())
        sb[0] = int(cents[~is_a].sum())
        nb[0] = int((~is_a).sum())
        base = rid * np.uint64(reps)
        for b in range(reps):
            h = _splitmix((base + np.uint64(b)) ^ np.uint64(seed))
            a = h < half
            sa[b + 1] = int(cents[a].sum())
            na[b + 1] = int(a.sum())
            sb[b + 1] = int(cents[~a].sum())
            nb[b + 1] = int((~a).sum())
        return pa.table(
            {"rep": out_rep, "sa": sa, "na": na, "sb": sb, "nb": nb},
            schema=schema,
        )

    _kw = {} if limit_bytes is None else {"limit_bytes": limit_bytes}
    merged = merge_partial_sums(
        ds.map_batches(partials, batch_format="pyarrow", batch_size=None),
        ["rep"],
        ["sa", "na", "sb", "nb"],
        **_kw,
    )
    if not isinstance(merged, pa.Table):
        merged = collect_table(merged, empty_schema=schema)
    rows = {
        int(r["rep"]): (int(r["sa"]), int(r["na"]), int(r["sb"]), int(r["nb"]))
        for r in merged.to_pylist()
    }
    sa_o, na_o, sb_o, nb_o = rows.pop(-1, (0, 0, 0, 0))
    if na_o == 0 or nb_o == 0:
        return {
            "na": na_o,
            "nb": nb_o,
            "sa": sa_o,
            "sb": sb_o,
            "exceed": 0,
            "reps": reps,
            "t_obs": None,
            "p": None,
        }
    lhs_scale = na_o * nb_o  # Python ints: exact at any magnitude
    obs_num = abs(sa_o * nb_o - sb_o * na_o)
    exceed = 0
    for b in range(reps):
        sa, na, sb, nb = rows.get(b, (0, 0, 0, 0))
        if na == 0 or nb == 0:
            exceed += 1  # degenerate relabel counts as extreme
        elif abs(sa * nb - sb * na) * lhs_scale >= obs_num * (na * nb):
            exceed += 1
    return {
        "na": na_o,
        "nb": nb_o,
        "sa": sa_o,
        "sb": sb_o,
        "exceed": exceed,
        "reps": reps,
        "t_obs": float(sa_o) / na_o - float(sb_o) / nb_o,
        "p": (1.0 + exceed) / (reps + 1.0),
    }
