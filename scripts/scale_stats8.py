"""Scale harness for the wave-8 statistical operators — every section
asserts against EXTERNAL ground truth derived independently from the
deterministic generator (the BH lesson: cross-engine agreement alone
cannot catch a symmetric bug).

1. Moran's I on a 2M-node ring graph: smooth signal (x = node index)
   must match a driver-side numpy evaluation of the textbook formula
   to 1e-5 and exceed 0.9; a splitmix permutation of the same values
   must collapse toward 0. Runs BOTH attach paths (broadcast and
   forced co-partition).
2. Jonckheere + decision stump over one synthetic 5M-row orders table
   whose priority level is a deterministic function of the price band:
   perfect level separation => 2JT equals its closed-form maximum
   2*sum n_i*n_j EXACTLY, and the Gini stump must recover the exact
   planted split threshold with total purity score == n.
3. KM + log-rank over a 2M-user events table (two rows per user,
   uniform 0..15-day time-to-purchase, no censoring): the KM curve
   telescopes to the empirical survival counts — at_risk/deaths must
   EQUAL the generator's bincounts and the survival product must match
   the exact ratio within 1e-9 — and the log-rank terms must equal a
   numpy replica of the hypergeometric grid arithmetic.

Usage: taskset -c 0-7 python scripts/scale_stats8.py [n_nodes] [n_orders] [n_users]
Prints one JSON line per section.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from patito_ray.functions.dedup import _splitmix  # noqa: E402

OUT = "/tmp/scale_stats8"


def main() -> None:
    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_orders = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000_000
    n_users = int(sys.argv[3]) if len(sys.argv) > 3 else 2_000_000

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=8, include_dashboard=False,
            logging_level="ERROR",
        )
    import ray.data as rd

    from patito_ray.functions.graph import moran_i

    # ---- 1. Moran's I on a ring ----
    def edge_batch(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "src": pa.array(ids, pa.int64()),
                "dst": pa.array((ids + 1) % n_nodes, pa.int64()),
            }
        )

    def val_batch(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"node": pa.array(ids, pa.int64()), "x": pa.array(ids, pa.int64())}
        )

    def perm_batch(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
        x = (_splitmix(ids.view(np.uint64) ^ np.uint64(0x5151))
             % np.uint64(n_nodes)).astype(np.int64)
        return pa.table(
            {"node": pa.array(ids, pa.int64()), "x": pa.array(x, pa.int64())}
        )

    edges = (
        rd.range(n_nodes, override_num_blocks=64)
        .map_batches(edge_batch, batch_format="pyarrow", batch_size=None)
        .materialize()
    )
    values = (
        rd.range(n_nodes, override_num_blocks=64)
        .map_batches(val_batch, batch_format="pyarrow", batch_size=None)
        .materialize()
    )
    t0 = time.time()
    smooth = moran_i(edges, values, node="node", x="x").to_pydict()
    wall_b = time.time() - t0
    ids = np.arange(n_nodes, dtype=np.float64)
    z = ids - ids.mean()
    i_brute = (
        n_nodes
        / float(n_nodes)
        * float((z * np.roll(z, -1)).sum())
        / float((z * z).sum())
    )
    assert smooth["n_edges"] == [n_nodes]
    assert abs(smooth["i"][0] - i_brute) < 1e-5, (smooth, i_brute)
    assert smooth["i"][0] > 0.9
    t0 = time.time()
    forced = moran_i(edges, values, node="node", x="x", limit_bytes=0).to_pydict()
    wall_c = time.time() - t0
    assert forced == smooth
    values_p = (
        rd.range(n_nodes, override_num_blocks=64)
        .map_batches(perm_batch, batch_format="pyarrow", batch_size=None)
        .materialize()
    )
    perm = moran_i(edges, values_p, node="node", x="x").to_pydict()
    assert abs(perm["i"][0]) < 0.05, perm
    print(json.dumps({
        "section": "moran_ring", "n_nodes": n_nodes,
        "i_smooth": smooth["i"][0], "i_perm": perm["i"][0],
        "broadcast_sec": round(wall_b, 2), "copartition_sec": round(wall_c, 2),
    }))

    # ---- 2. jonckheere + decision stump on planted orders ----
    os.makedirs(OUT, exist_ok=True)
    odir = f"{OUT}/orders_sf"
    shutil.rmtree(odir, ignore_errors=True)
    os.makedirs(odir)

    def order_batch(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
        cents = (_splitmix(ids.view(np.uint64) ^ np.uint64(0x0DD5))
                 % np.uint64(10_000_000)).astype(np.int64)
        # level = price band (perfect separation, bands of 2M cents)
        w = np.minimum(cents // 2_000_000, 4) + 1
        prio = np.array(["1-A", "2-B", "3-C", "4-D", "5-E"])[w - 1]
        return pa.table(
            {
                "o_orderkey": pa.array(ids, pa.int64()),
                "o_orderpriority": pa.array(prio, pa.string()),
                "o_totalprice": pa.array(
                    cents.astype(np.float64) / 100.0, pa.float64()
                ),
            }
        )

    (
        rd.range(n_orders, override_num_blocks=256)
        .map_batches(order_batch, batch_format="pyarrow", batch_size=None)
        .write_parquet(f"{odir}/orders.parquet")
    )
    from patito_ray.pipelines.q_wave8 import q_decision_stump, q_jonckheere

    t0 = time.time()
    jt = q_jonckheere(odir).to_pydict()
    wall_jt = time.time() - t0
    ids = np.arange(n_orders, dtype=np.int64)
    cents = (_splitmix(ids.view(np.uint64) ^ np.uint64(0x0DD5))
             % np.uint64(10_000_000)).astype(np.int64)
    w = np.minimum(cents // 2_000_000, 4) + 1
    n_i = np.bincount(w, minlength=6)[1:]
    # ties sit INSIDE bands only; cross-band pairs are all concordant,
    # minus the tie corrections for equal cents in DIFFERENT bands
    # (impossible: equal cents => same band) => closed-form max
    maxjt = 2 * sum(
        int(n_i[i]) * int(n_i[j]) for i in range(5) for j in range(i + 1, 5)
    )
    assert jt["n"] == [n_orders]
    assert jt["jt2"] == [maxjt], (jt["jt2"], maxjt)
    assert jt["z"][0] > 100.0
    t0 = time.time()
    st = q_decision_stump(odir).to_pydict()
    wall_st = time.time() - t0
    # the best Gini split for the 5-band label is a band edge; purity
    # is NOT total (5 classes vs binary pos='1-A'), but pos/neg
    # separation IS total at the first band edge
    band1_max = int(cents[w == 1].max())
    assert st["split_cents"] == [band1_max], (st, band1_max)
    assert st["pos_left"] == [int(n_i[0])]
    assert st["score"] == [float(n_orders)]
    print(json.dumps({
        "section": "orders_planted", "n_orders": n_orders,
        "jonckheere_sec": round(wall_jt, 2), "stump_sec": round(wall_st, 2),
        "jt2": jt["jt2"][0], "z": jt["z"][0],
    }))

    # ---- 3. KM + log-rank on uniform time-to-purchase ----
    edir = f"{OUT}/events_sf"
    shutil.rmtree(edir, ignore_errors=True)
    os.makedirs(edir)
    DAY = 86_400_000_000

    def user_batch(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
        join_day = ids % 30
        di = (_splitmix(ids.view(np.uint64) ^ np.uint64(0xAB1E))
              % np.uint64(16)).astype(np.int64)
        first = join_day * DAY
        buy = first + di * DAY
        n = len(ids)
        return pa.table(
            {
                "event_id": pa.array(
                    np.concatenate([2 * ids, 2 * ids + 1]), pa.int64()
                ),
                "ts": pa.array(
                    np.concatenate([first, buy]), pa.int64()
                ).cast(pa.timestamp("us")),
                "user_id": pa.array(np.concatenate([ids, ids]), pa.int64()),
                "event_type": pa.array(
                    ["view"] * n + ["purchase"] * n, pa.string()
                ),
                "value": pa.array(np.ones(2 * n), pa.float64()),
                "props": pa.array([""] * (2 * n), pa.string()),
            }
        )

    (
        rd.range(n_users, override_num_blocks=256)
        .map_batches(user_batch, batch_format="pyarrow", batch_size=None)
        .write_parquet(f"{edir}/events.parquet")
    )
    from patito_ray.pipelines.q_wave8 import q_km_survival, q_logrank_test

    t0 = time.time()
    km = q_km_survival(edir).to_pylist()
    wall_km = time.time() - t0
    ids = np.arange(n_users, dtype=np.int64)
    di = (_splitmix(ids.view(np.uint64) ^ np.uint64(0xAB1E))
          % np.uint64(16)).astype(np.int64)
    cnt = np.bincount(di, minlength=16)
    at_risk = cnt[::-1].cumsum()[::-1]
    assert [r["dur_days"] for r in km] == [t for t in range(16) if cnt[t]]
    assert [r["deaths"] for r in km] == [int(c) for c in cnt if c]
    assert [r["at_risk"] for r in km] == [int(a) for a, c in
                                          zip(at_risk, cnt) if c]
    s = 1.0
    from patito_ray.pipelines.qcommon import _rf
    for r, d, n in zip(km, cnt[cnt > 0], at_risk[cnt > 0]):
        s = s * (1.0 - float(d) / float(n))
        # the query rounds at 1e-6; replicate the identical rounding
        assert r["survival"] == _rf(s, 6), (r, s)
        # no censoring => KM telescopes to the empirical survival ratio
        exact = float(n - d) / float(n_users)
        assert abs(r["survival"] - exact) < 2e-6
    t0 = time.time()
    lr = q_logrank_test(edir).to_pydict()
    wall_lr = time.time() - t0
    # numpy replica of the hypergeometric grid (g1 = join day <= mid)
    mn_us = (ids % 30) * DAY
    mx_us = mn_us + di * DAY
    w0, w1 = int(mn_us.min()), int(mx_us.max())
    g1 = mn_us <= (w0 + w1) // 2
    o1 = e_nano = v_nano = 0
    n1cnt = np.bincount(di[g1], minlength=16)
    for t in range(16):
        d = int(cnt[t])
        if d == 0:
            continue
        d1 = int(n1cnt[t])
        n = int(cnt[t:].sum())
        n1 = int(n1cnt[t:].sum())
        o1 += d1
        e_nano += int(np.floor(float(d) * float(n1) / float(n) * 1e9 + 0.5))
        if n > 1:
            v_nano += int(np.floor(
                float(d) * (float(n1) / n) * (float(n - n1) / n)
                * (float(n - d) / (n - 1)) * 1e9 + 0.5))
    assert lr["o1"] == [o1] and lr["e1_nano"] == [e_nano]
    assert lr["v_nano"] == [v_nano]
    print(json.dumps({
        "section": "survival_uniform", "n_users": n_users,
        "km_sec": round(wall_km, 2), "logrank_sec": round(wall_lr, 2),
        "chi2": lr["chi2"][0],
    }))

    ray.shutdown()


if __name__ == "__main__":
    main()
