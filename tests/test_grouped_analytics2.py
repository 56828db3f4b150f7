"""top_values_per_group / dup-cluster histogram / inverted index vs
pure references under arbitrary partitioning and both merge paths."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pytest

from patito_ray.stages.agg import top_values_per_group


def _collect(ds) -> pa.Table:
    import ray

    if isinstance(ds, pa.Table):
        return ds
    tabs = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    return pa.concat_tables(tabs)


def _topk_reference(keys, vals, k):
    counts = collections.Counter(zip(keys, vals))
    per_group: dict = {}
    for (g, v), c in counts.items():
        per_group.setdefault(g, []).append((c, v))
    rows = []
    for g, items in per_group.items():
        items.sort(key=lambda cv: (-cv[0], cv[1]))
        for rank, (c, v) in enumerate(items[:k], start=1):
            rows.append((g, v, c, rank))
    return sorted(rows)


@pytest.mark.parametrize("limit_bytes", [256 << 20, 0])
def test_top_values_per_group_reference(ray_session, limit_bytes):
    import ray.data as rd

    rng = np.random.default_rng(7)
    n = 5000
    keys = rng.integers(0, 12, n)
    vals = rng.choice(np.array(["a", "b", "c", "d", "e", "f"]), n)
    ds = rd.from_arrow(
        pa.table({"g": pa.array(keys, type=pa.int64()), "v": vals})
    ).repartition(7)

    out = _collect(top_values_per_group(ds, "g", "v", k=3, limit_bytes=limit_bytes))
    got = sorted(
        zip(
            out.column("g").to_pylist(),
            out.column("v").to_pylist(),
            out.column("cnt").to_pylist(),
            out.column("rank").to_pylist(),
        )
    )
    assert got == _topk_reference(keys.tolist(), vals.tolist(), 3)


def test_top_values_per_group_nulls_and_k1_matches_mode(ray_session):
    import ray.data as rd

    from patito_ray.stages.agg import mode_per_group

    t = pa.table(
        {
            "g": pa.array([1, 1, 1, 2, 2, 2, 2], type=pa.int64()),
            "v": pa.array(["x", "x", None, "y", "z", "z", None]),
        }
    )
    ds = rd.from_arrow(t).repartition(3)
    top = _collect(top_values_per_group(ds, "g", "v", k=1))
    mode = mode_per_group(rd.from_arrow(t), "g", "v")
    if not isinstance(mode, pa.Table):
        mode = _collect(mode)
    top_rows = sorted(
        zip(top.column("g").to_pylist(), top.column("v").to_pylist(),
            top.column("cnt").to_pylist())
    )
    mode_rows = sorted(
        zip(mode.column("g").to_pylist(), mode.column("mode_value").to_pylist(),
            mode.column("mode_count").to_pylist())
    )
    assert top_rows == mode_rows
    with pytest.raises(ValueError):
        top_values_per_group(ds, "g", "v", k=0)


def _docs_dir(tmp_path, texts, ids=None):
    import pyarrow.parquet as pq

    ids = ids if ids is not None else list(range(len(texts)))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * len(texts)),
                "source": pa.array(["t"] * len(texts)),
                "n_chars": pa.array(
                    [len(t) if t else 0 for t in texts], type=pa.int64()
                ),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    return str(tmp_path)


def test_dup_cluster_sizes_constructed(ray_session, tmp_path):
    from patito_ray.pipelines.queries import q_dup_cluster_sizes

    # 3 singletons, one pair, one triple, one null (dropped)
    texts = ["a", "b", "c", "dup one", "dup one", "tri", "tri", "tri", None]
    out = q_dup_cluster_sizes(_docs_dir(tmp_path, texts))
    out = _collect(out)
    got = dict(
        zip(out.column("cluster_size").to_pylist(), out.column("n_clusters").to_pylist())
    )
    assert got == {1: 3, 2: 1, 3: 1}


def test_inverted_index_reference(ray_session, tmp_path):
    from patito_ray.pipelines.queries import q_inverted_index

    texts = [
        "the cat sat",
        "the dog\tsat  twice",
        "",
        None,
        "cat cat cat",  # df counts docs, not occurrences
        "\x0bweird",  # \x0b is NOT RE2 whitespace: token stays intact
    ]
    out = _collect(q_inverted_index(_docs_dir(tmp_path, texts)))
    got = {
        t: (p, d)
        for t, p, d in zip(
            out.column("term").to_pylist(),
            out.column("postings").to_pylist(),
            out.column("df").to_pylist(),
        )
    }
    assert got["the"] == ("0000000000,0000000001", 2)
    assert got["cat"] == ("0000000000,0000000004", 2)
    assert got["sat"] == ("0000000000,0000000001", 2)
    assert got["twice"] == ("0000000001", 1)
    assert got["\x0bweird"] == ("0000000005", 1)
    assert "" not in got


def _ntile_reference(order_keys, k):
    n = len(order_keys)
    size, rem = divmod(n, k)
    out = {}
    for r, key in enumerate(sorted(order_keys)):
        if r < rem * (size + 1):
            b = r // (size + 1)
        else:
            b = rem + (r - rem * (size + 1)) // size
        out[key] = b + 1
    return out


@pytest.mark.parametrize("n,k", [(1000, 8), (5, 8), (8, 8), (1001, 7)])
def test_global_ntile_reference(ray_session, n, k):
    import ray.data as rd

    from patito_ray.stages.prefix import global_ntile

    rng = np.random.default_rng(n * 31 + k)
    keys = rng.permutation(rng.choice(10**9, size=n, replace=False)).astype(np.int64)
    ds = rd.from_arrow(pa.table({"x": pa.array(keys)})).repartition(min(5, n))
    out = _collect(global_ntile(ds, "x", k=k))
    got = dict(
        zip(out.column("x").to_pylist(), out.column("bucket").to_pylist())
    )
    assert got == _ntile_reference(keys.tolist(), k)


def test_global_ntile_rejects_bad_k(ray_session):
    import ray.data as rd

    from patito_ray.stages.prefix import global_ntile

    ds = rd.from_arrow(pa.table({"x": pa.array([1, 2, 3], type=pa.int64())}))
    with pytest.raises(ValueError):
        global_ntile(ds, "x", k=0)


def test_welch_ttest_vs_reference(ray_session, tmp_path):
    """q_welch_ttest vs the textbook Welch formula on constructed data
    (unequal n, unequal variance; other event types ignored)."""
    import math

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from patito_ray.pipelines.queries import q_welch_ttest

    rng = np.random.default_rng(7)
    a = np.round(rng.normal(50, 5, 400), 2)   # purchase
    b = np.round(rng.normal(48, 9, 150), 2)   # view
    noise = np.round(rng.normal(0, 1, 100), 2)  # ignored type
    vals = np.concatenate([a, b, noise])
    types = ["purchase"] * 400 + ["view"] * 150 + ["error"] * 100
    t = pa.table(
        {
            "event_type": pa.array(types, pa.string()),
            "value": pa.array(vals, pa.float64()),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "events.parquet")

    out = q_welch_ttest(str(d))
    got_t = out.column("t_stat")[0].as_py()
    got_df = out.column("df")[0].as_py()

    # reference on the exact cents grid
    ca = np.rint(a * 100).astype(np.int64)
    cb = np.rint(b * 100).astype(np.int64)
    m1, m2 = ca.mean(), cb.mean()
    v1, v2 = ca.var(ddof=1), cb.var(ddof=1)
    u1, u2 = v1 / len(ca), v2 / len(cb)
    ref_t = (m1 - m2) / math.sqrt(u1 + u2)
    ref_df = (u1 + u2) ** 2 / (u1**2 / (len(ca) - 1) + u2**2 / (len(cb) - 1))
    assert abs(got_t - ref_t) < 1e-5
    assert abs(got_df - ref_df) < 1e-4
    assert out.column("n_purchase")[0].as_py() == 400
    assert out.column("n_view")[0].as_py() == 150


def test_psi_drift_vs_reference(ray_session, tmp_path):
    """q_psi_drift vs the textbook PSI on constructed bins (zero-count
    bins on either side excluded by convention)."""
    import math

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from patito_ray.pipelines.queries import q_psi_drift

    # purchase in bins {0,1,2}, view in bins {1,2,3}: bins 0 and 3
    # are one-sided and must be excluded
    vals_p = [5.0] * 10 + [15.0] * 30 + [25.0] * 60
    vals_v = [15.0] * 50 + [25.0] * 40 + [35.0] * 10
    noise = [15.0] * 7  # other event type, ignored
    t = pa.table(
        {
            "event_type": pa.array(
                ["purchase"] * len(vals_p)
                + ["view"] * len(vals_v)
                + ["error"] * len(noise)
            ),
            "value": pa.array(vals_p + vals_v + noise, pa.float64()),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "events.parquet")

    out = q_psi_drift(str(d))
    ref = 0.0
    for pn, vn in [(30, 50), (60, 40)]:  # bins 1 and 2 only
        p, q = pn / 100.0, vn / 100.0
        ref += (p - q) * math.log(p / q)
    assert out.column("n_bins")[0].as_py() == 2
    assert abs(out.column("psi")[0].as_py() - ref) < 1e-6


def _welch_oracle(d):
    """Run SQL_WELCH_TTEST through DuckDB over the same parquet dir."""
    import duckdb

    from patito_ray.pipelines.queries import SQL_WELCH_TTEST

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')"
    )
    return con.execute(SQL_WELCH_TTEST).fetch_arrow_table()


def test_welch_ttest_missing_group(ray_session, tmp_path):
    """No 'view' rows at all: SQL's CROSS JOIN yields zero rows — the
    engine must return an empty table, not KeyError."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from patito_ray.pipelines.queries import q_welch_ttest

    t = pa.table(
        {
            "event_type": pa.array(["purchase"] * 5 + ["error"] * 3),
            "value": pa.array([1.0, 2.0, 3.0, 4.0, 5.0, 9.0, 9.0, 9.0]),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "events.parquet")

    out = q_welch_ttest(str(d))
    assert out.num_rows == 0
    assert _welch_oracle(d).num_rows == 0


def test_welch_ttest_n1_group(ray_session, tmp_path):
    """A single-row group divides by (n-1)=0: DuckDB DOUBLE/0 yields
    NULL — the engine must emit NULL t_stat/df, not ZeroDivisionError."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from patito_ray.pipelines.queries import q_welch_ttest

    t = pa.table(
        {
            "event_type": pa.array(["purchase"] * 4 + ["view"]),
            "value": pa.array([1.0, 2.0, 3.0, 4.0, 7.5]),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "events.parquet")

    out = q_welch_ttest(str(d))
    ref = _welch_oracle(d)
    assert out.num_rows == ref.num_rows == 1
    assert out.column("n_purchase")[0].as_py() == 4
    assert out.column("n_view")[0].as_py() == 1
    assert out.column("t_stat")[0].as_py() is None
    assert out.column("df")[0].as_py() is None
    assert ref.column("t_stat")[0].as_py() is None
    assert ref.column("df")[0].as_py() is None


def test_welch_ttest_zero_variance(ray_session, tmp_path):
    """Both groups constant: u1+u2=0, so t = md/0 and df = 0/0 — NULL
    on both engines."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from patito_ray.pipelines.queries import q_welch_ttest

    t = pa.table(
        {
            "event_type": pa.array(["purchase"] * 3 + ["view"] * 3),
            "value": pa.array([5.0, 5.0, 5.0, 2.0, 2.0, 2.0]),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "events.parquet")

    out = q_welch_ttest(str(d))
    ref = _welch_oracle(d)
    assert out.column("t_stat")[0].as_py() is None
    assert out.column("df")[0].as_py() is None
    assert ref.column("t_stat")[0].as_py() is None
    assert ref.column("df")[0].as_py() is None


# ---------------------------------------------------- round-3 additions


def test_rolling_zscore_oracle_parity(ray_session):
    """Ray pipeline vs an in-process DuckDB window query on sf0.001."""
    import duckdb
    import ray

    from patito_ray.pipelines.queries import QUERIES, SQL_ROLLING_ZSCORE

    sf = "/root/testdata/sf0.001"
    out = QUERIES["rolling_zscore"][0](sf)
    tabs = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    got = pa.concat_tables(tabs) if tabs else None
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    exp = con.execute(SQL_ROLLING_ZSCORE).arrow()
    assert got is not None and got.num_rows == exp.num_rows > 0
    key = lambda t: sorted(
        zip(*(t.column(c).to_pylist() for c in sorted(t.column_names)))
    )
    assert key(got) == key(exp)


def test_survival_counts_monotone(ray_session):
    from patito_ray.pipelines.queries import QUERIES

    t = QUERIES["survival_counts"][0]("/root/testdata/sf0.001")
    n = t.column("n_surviving").to_pylist()
    assert len(n) == 31
    assert all(a >= b for a, b in zip(n, n[1:]))  # survival never rises
    assert n[0] > 0


def test_event_moments_matches_scipy_style_reference(ray_session):
    """Moment formulas vs a direct per-group numpy computation."""
    import pyarrow.parquet as pq

    from patito_ray.pipelines.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    out = QUERIES["event_moments"][0](sf)
    if not isinstance(out, pa.Table):
        import ray

        out = pa.concat_tables(
            [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
        )
    raw = pq.read_table(f"{sf}/events.parquet", columns=["event_type", "value"])
    x_all = np.floor(raw.column("value").to_numpy()).astype(np.float64)
    types = np.asarray(raw.column("event_type").to_pylist())
    for row in out.to_pylist():
        x = x_all[types == row["event_type"]]
        m2 = x.var()
        skew = ((x - x.mean()) ** 3).mean() / m2**1.5
        kurt = ((x - x.mean()) ** 4).mean() / m2**2
        assert row["n"] == x.size
        assert abs(row["skewness"] - skew) < 1e-9
        assert abs(row["kurtosis"] - kurt) < 1e-9
