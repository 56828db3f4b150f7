"""Property-based tests for the co-partitioned custom operators:
asof_join / range_join / grouped_top_k must match their single-machine
polars / numpy references on arbitrary inputs, regardless of block
boundaries or partition counts — the invariant that makes the
copartition_apply execution correct.
"""

import datetime as dt

import hypothesis.strategies as st
import numpy as np
import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings

BASE = dt.datetime(2024, 1, 1)


def _ts(minutes: int) -> dt.datetime:
    return BASE + dt.timedelta(minutes=int(minutes))


left_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # key
        st.integers(min_value=0, max_value=500),  # minutes
    ),
    min_size=0,
    max_size=25,
)
right_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),
        st.integers(min_value=0, max_value=500),
    ),
    min_size=0,
    max_size=25,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(left_rows, right_rows)
def test_asof_join_matches_polars_reference(ray_session, lrows, rrows):
    import polars as pl
    import ray.data as rd

    from patito_ray.stages.join import asof_join

    lt = pa.table(
        {
            "lid": pa.array(range(len(lrows)), pa.int64()),
            "ts": pa.array([_ts(m) for _k, m in lrows], pa.timestamp("us")),
            "k": pa.array([k for k, _m in lrows], pa.int64()),
        }
    )
    rt = pa.table(
        {
            "rid": pa.array(range(len(rrows)), pa.int64()),
            "rts": pa.array([_ts(m) for _k, m in rrows], pa.timestamp("us")),
            "rk": pa.array([k for k, _m in rrows], pa.int64()),
        }
    )
    if lt.num_rows == 0 or rt.num_rows == 0:
        return  # empty sides lose their schema through repartition
    got = asof_join(
        rd.from_arrow(lt).repartition(3),
        rd.from_arrow(rt).repartition(2),
        on="ts",
        right_on="rts",
        by="k",
        right_by="rk",
        num_partitions=4,
    ).take_all()
    # reference: single-machine polars join_asof. rid can be ambiguous
    # when two right rows share (key, ts) — compare the matched TS only.
    ref = (
        pl.from_arrow(lt)
        .sort("ts")
        .join_asof(
            pl.from_arrow(rt).sort("rts"),
            left_on="ts",
            right_on="rts",
            by_left="k",
            by_right="rk",
            strategy="backward",
        )
    )
    ref_ts = {r["lid"]: r["rts"] for r in ref.to_dicts()}
    got_map = {}
    for r in got:
        rrid = r["rid"]
        got_map[r["lid"]] = None if rrid is None else rt.column("rts")[rrid].as_py()
    assert set(got_map) == set(ref_ts)
    for lid, ts in ref_ts.items():
        assert got_map[lid] == ts


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(left_rows, right_rows)
def test_range_join_matches_bruteforce(ray_session, lrows, rrows):
    import ray.data as rd

    from patito_ray.stages.join import range_join

    lt = pa.table(
        {
            "lid": pa.array(range(len(lrows)), pa.int64()),
            "ts": pa.array([_ts(m) for _k, m in lrows], pa.timestamp("us")),
            "k": pa.array([k for k, _m in lrows], pa.int64()),
        }
    )
    rt = pa.table(
        {
            "rid": pa.array(range(len(rrows)), pa.int64()),
            "lo": pa.array([_ts(m) for _k, m in rrows], pa.timestamp("us")),
            "hi": pa.array([_ts(m + 60) for _k, m in rrows], pa.timestamp("us")),
            "rk": pa.array([k for k, _m in rrows], pa.int64()),
        }
    )
    if lt.num_rows == 0 or rt.num_rows == 0:
        return
    got = sorted(
        (r["lid"], r["rid"])
        for r in range_join(
            rd.from_arrow(lt).repartition(3),
            rd.from_arrow(rt).repartition(2),
            on="ts",
            right_lo="lo",
            right_hi="hi",
            by="k",
            right_by="rk",
            num_partitions=4,
        ).take_all()
    )
    truth = sorted(
        (li, ri)
        for li, (lk, lm) in enumerate(lrows)
        for ri, (rk, rm) in enumerate(rrows)
        if lk == rk and rm <= lm < rm + 60
    )
    assert got == truth


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),
            st.integers(min_value=-50, max_value=50),
        ),
        min_size=1,
        max_size=40,
    ),
    st.integers(min_value=1, max_value=4),
)
def test_grouped_top_k_matches_reference(ray_session, rows, k):
    import ray.data as rd

    from patito_ray.stages.topk import grouped_top_k

    t = pa.table(
        {
            "g": pa.array([g for g, _v in rows], pa.int64()),
            "v": pa.array([float(v) for _g, v in rows]),
            "id": pa.array(range(len(rows)), pa.int64()),
        }
    )
    got = sorted(
        (r["g"], r["rank"], r["id"])
        for r in grouped_top_k(
            rd.from_arrow(t).repartition(3),
            group="g",
            value="v",
            k=k,
            tie="id",
            num_partitions=4,
        ).take_all()
    )
    truth = []
    by_g: dict[int, list[tuple[float, int]]] = {}
    for i, (g, v) in enumerate(rows):
        by_g.setdefault(g, []).append((float(v), i))
    for g, vals in by_g.items():
        ranked = sorted(vals, key=lambda p: (-p[0], p[1]))[:k]
        for rank, (_v, i) in enumerate(ranked, 1):
            truth.append((g, rank, i))
    assert got == sorted(truth)


# includes tokens with non-RE2 whitespace (\x0b, NBSP): python
# str.split() and arrow's unicode splitter would break them apart,
# _re2_tokens (and the vectorized verify kernel) must keep them intact
words = st.sampled_from(
    "alpha beta gamma delta epsilon zeta".split() + ["a\x0bb", "n\u00a0b", "\x0b"]
)
docs = st.lists(
    st.lists(words, min_size=0, max_size=8).map(" ".join),
    min_size=2,
    max_size=10,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(docs, st.floats(min_value=0.1, max_value=0.9))
def test_verify_pairs_dataset_matches_bruteforce(ray_session, texts, threshold):
    """The two-exchange pair verification must equal a direct
    ngram_jaccard over every submitted pair, for any texts (including
    short and empty docs) and any partitioning."""
    import itertools as it

    import ray.data as rd

    from patito_ray.functions.dedup import ngram_jaccard, verify_pairs_dataset

    ds = rd.from_arrow(
        pa.table({"doc_id": list(range(len(texts))), "text": texts})
    ).repartition(3)
    all_pairs = list(it.combinations(range(len(texts)), 2))
    pairs = rd.from_arrow(
        pa.table(
            {
                "a": pa.array([p[0] for p in all_pairs], pa.int64()),
                "b": pa.array([p[1] for p in all_pairs], pa.int64()),
            }
        )
    ).repartition(2)
    got = {
        (r["a"], r["b"]): r["jaccard"]
        for r in verify_pairs_dataset(ds, pairs, threshold=threshold).take_all()
    }
    want = {
        (a, b): ngram_jaccard(texts[a], texts[b])
        for a, b in all_pairs
        if ngram_jaccard(texts[a], texts[b]) >= threshold
    }
    assert got == want


def test_copartition_string_keys(ray_session):
    """String by-keys co-partition through the canonical-bytes Rust
    hash: an inner join per partition must equal the global join."""
    import polars as pl
    import ray.data as rd

    from patito_ray.stages.join import copartition_apply

    lt = pa.table(
        {
            "dom": pa.array([f"site-{i % 7}.org" for i in range(40)]),
            "lval": pa.array(range(40), pa.int64()),
        }
    )
    rt = pa.table(
        {
            "rdom": pa.array([f"site-{i}.org" for i in range(7)]),
            "rval": pa.array(range(7), pa.int64()),
        }
    )

    def part_join(l, r):
        return (
            pl.from_arrow(l)
            .join(pl.from_arrow(r), left_on="dom", right_on="rdom", how="inner")
            .to_arrow()
        )

    out = copartition_apply(
        rd.from_arrow(lt).repartition(3),
        rd.from_arrow(rt),
        by="dom",
        right_by="rdom",
        part_fn=part_join,
        num_partitions=5,
    )
    got = sorted(
        (r["dom"], r["lval"], r["rval"]) for r in out.take_all()
    )
    want = sorted(
        (f"site-{i % 7}.org", i, i % 7) for i in range(40)
    )
    assert got == want


def test_copartition_rejects_float_keys(ray_session):
    import ray.data as rd

    from patito_ray.stages.join import copartition_apply

    lt = pa.table({"fk": pa.array([1.0, 2.0]), "x": pa.array([1, 2], pa.int64())})
    rt = pa.table({"rfk": pa.array([1.0]), "y": pa.array([9], pa.int64())})
    with pytest.raises(TypeError, match="key type"):
        copartition_apply(
            rd.from_arrow(lt),
            rd.from_arrow(rt),
            by="fk",
            right_by="rfk",
            part_fn=lambda l, r: l,
        )


def test_copartition_rejects_mismatched_key_classes(ray_session):
    import ray.data as rd

    from patito_ray.stages.join import copartition_apply

    lt = pa.table({"k": pa.array(["a"]), "x": pa.array([1], pa.int64())})
    rt = pa.table({"rk": pa.array([1], pa.int64()), "y": pa.array([9], pa.int64())})
    with pytest.raises(TypeError, match="classes differ"):
        copartition_apply(
            rd.from_arrow(lt),
            rd.from_arrow(rt),
            by="k",
            right_by="rk",
            part_fn=lambda l, r: l,
        )


def test_asof_join_date32_by_key(ray_session):
    """Temporal by-keys (date32/time32 are 32-bit storage — Arrow cannot
    cast them to int64 directly) must co-partition without crashing and
    match a local polars join_asof (round-3 review regression)."""
    import datetime as dt

    import polars as pl
    import ray.data as rd

    from patito_ray.stages.join import asof_join

    d0 = dt.date(2024, 1, 1)
    lt = pa.table(
        {
            "day": pa.array([d0 + dt.timedelta(days=i % 5) for i in range(30)], pa.date32()),
            "t": pa.array([i * 7 % 40 for i in range(30)], pa.int64()),
            "lv": pa.array(range(30), pa.int64()),
        }
    )
    rt = pa.table(
        {
            "rday": pa.array([d0 + dt.timedelta(days=i % 5) for i in range(15)], pa.date32()),
            "rt": pa.array([i * 3 % 40 for i in range(15)], pa.int64()),
            "rv": pa.array(range(15), pa.int64()),
        }
    )
    out = asof_join(
        rd.from_arrow(lt).repartition(3),
        rd.from_arrow(rt),
        on="t",
        right_on="rt",
        by="day",
        right_by="rday",
        num_partitions=4,
    ).take_all()
    want = (
        pl.from_arrow(lt)
        .sort("t")
        .join_asof(
            pl.from_arrow(rt).sort("rt"),
            left_on="t",
            right_on="rt",
            by_left="day",
            by_right="rday",
            strategy="backward",
        )
        .to_dicts()
    )
    got = sorted((r["day"], r["t"], r["lv"], r["rv"]) for r in out)
    exp = sorted((r["day"], r["t"], r["lv"], r["rv"]) for r in want)
    assert got == exp


def test_skew_join_matches_polars_reference(ray_session):
    import polars as pl
    import ray.data as rd

    from patito_ray.stages.join import detect_hot_keys, skew_join

    rng = np.random.default_rng(11)
    n = 5000
    # 60% of fact rows hit key 7 (the hot key); the rest spread over 0-24
    hot_mask = rng.random(n) < 0.6
    k = np.where(hot_mask, 7, rng.integers(0, 25, n)).astype(np.int64)
    fact_t = pa.table(
        {
            "fid": pa.array(np.arange(n, dtype=np.int64)),
            "k": pa.array(k),
            "v": pa.array(rng.random(n)),
        }
    )
    dim_t = pa.table(
        {
            "dk": pa.array(np.arange(25, dtype=np.int64)),
            "name": pa.array([f"d{i}" for i in range(25)]),
        }
    )
    want = sorted(
        pl.from_arrow(fact_t)
        .join(pl.from_arrow(dim_t), left_on="k", right_on="dk", how="inner")
        .select(["fid", "k", "v", "name"])
        .rows()
    )

    fact = rd.from_arrow(fact_t).repartition(6)
    dim = rd.from_arrow(dim_t).repartition(2)

    # detection finds the hot key (and only keys that are actually hot),
    # through BOTH the driver merge and the forced-distributed merge
    hot = detect_hot_keys(fact, "k", hot_count=1000)
    assert 7 in hot.to_pylist()
    hot_dist = detect_hot_keys(fact, "k", hot_count=1000, limit_bytes=0)
    assert sorted(hot_dist.to_pylist()) == sorted(hot.to_pylist())
    assert all(
        (k == h).sum() >= 200 for h in hot.to_pylist()
    )  # nothing cold mislabeled enough to matter

    # detection path, explicit path, deliberately-wrong hot set, and
    # empty hot set all produce the exact inner join
    for kwargs in (
        {"hot_count": 1000},
        {"hot_keys": [7]},
        {"hot_keys": [23456]},  # not a real key: routing only, still exact
        {"hot_keys": []},
        {"hot_keys": [7], "salt": 1},
        {"hot_keys": [7], "num_partitions": 3, "salt": 16},  # salt > P clamps
    ):
        out = skew_join(fact, dim, on="k", right_on="dk", **kwargs).take_all()
        got = sorted((r["fid"], r["k"], r["v"], r["name"]) for r in out)
        assert got == want, kwargs


def test_skew_join_null_keys_and_clashes(ray_session):
    import ray.data as rd

    from patito_ray.stages.join import skew_join

    fact_t = pa.table(
        {
            "fid": pa.array([0, 1, 2], type=pa.int64()),
            "k": pa.array([1, None, 2], type=pa.int64()),
        }
    )
    dim_t = pa.table(
        {
            "dk": pa.array([1, 2, None], type=pa.int64()),
            "name": ["a", "b", "c"],
        }
    )
    out = skew_join(
        rd.from_arrow(fact_t), rd.from_arrow(dim_t), on="k", right_on="dk",
        hot_keys=[],
    ).take_all()
    assert sorted((r["fid"], r["name"]) for r in out) == [(0, "a"), (2, "b")]

    clash = pa.table({"fid": pa.array([1], type=pa.int64()), "name": ["x"]})
    with pytest.raises(ValueError, match="clash"):
        skew_join(
            rd.from_arrow(fact_t), rd.from_arrow(clash), on="k", right_on="fid",
            hot_keys=[],
        )
    with pytest.raises(ValueError, match="hot_keys or hot_count"):
        skew_join(rd.from_arrow(fact_t), rd.from_arrow(dim_t), on="k", right_on="dk")


def test_string_agg_per_group_matches_reference(ray_session):
    import polars as pl
    import ray.data as rd

    from patito_ray.stages.agg import string_agg_per_group

    rng = np.random.default_rng(3)
    n = 3000
    t = pa.table(
        {
            "g": pa.array(rng.integers(0, 40, n).astype(np.int64)),
            "s": pa.array(
                [
                    None if rng.random() < 0.05 else f"w{rng.integers(0, 99)}"
                    for _ in range(n)
                ]
            ),
        }
    )
    want = {
        r["g"]: (r["agg"], r["n"])
        for r in pl.from_arrow(t)
        .filter(pl.col("s").is_not_null())
        .group_by("g")
        .agg(
            pl.col("s").sort().str.join("|").alias("agg"),
            pl.len().cast(pl.Int64).alias("n"),
        )
        .to_dicts()
    }
    for parts in (2, 9):
        out = string_agg_per_group(
            rd.from_arrow(t).repartition(5), "g", "s", sep="|",
            num_partitions=parts,
        ).take_all()
        got = {r["g"]: (r["agg"], r["n"]) for r in out}
        assert got == want


def test_copartition_join_outer_matches_polars(ray_session):
    import polars as pl
    import ray.data as rd

    from patito_ray.stages.join import copartition_join

    rng = np.random.default_rng(5)
    lt = pa.table(
        {
            "lk": pa.array(rng.integers(0, 30, 200).astype(np.int64)),
            "lv": pa.array(rng.random(200)),
        }
    )
    rt = pa.table(
        {
            "rk": pa.array(rng.integers(15, 45, 120).astype(np.int64)),
            "rv": pa.array([f"r{i}" for i in range(120)]),
        }
    )
    left = rd.from_arrow(lt).repartition(4)
    right = rd.from_arrow(rt).repartition(3)
    for how in ("inner", "left", "full"):
        out = copartition_join(
            left, right, on="lk", right_on="rk", how=how, num_partitions=5
        ).take_all()
        ref = pl.from_arrow(lt).join(
            pl.from_arrow(rt), left_on="lk", right_on="rk", how=how,
            coalesce=False if how == "full" else True,
        )
        nkey = lambda row: tuple((v is None, v) for v in row)  # noqa: E731
        got = sorted(
            (
                (r["lk"], r["lv"], r.get("rk"), r["rv"]) if how == "full"
                else (r["lk"], r["lv"], r["rv"])
                for r in out
            ),
            key=nkey,
        )
        exp = sorted(
            (
                (r["lk"], r["lv"], r.get("rk"), r["rv"]) if how == "full"
                else (r["lk"], r["lv"], r["rv"])
                for r in ref.to_dicts()
            ),
            key=nkey,
        )
        assert got == exp, how
    with pytest.raises(ValueError, match="inner/left/full"):
        copartition_join(left, right, on="lk", right_on="rk", how="cross")


def test_melt_reshape(ray_session):
    import ray.data as rd

    from patito_ray.stages.transform import melt

    t = pa.table(
        {
            "id": pa.array([1, 2], type=pa.int64()),
            "a": pa.array([10, 20], type=pa.int64()),
            "b": pa.array([1.5, 2.5], type=pa.float64()),
        }
    )
    out = melt(
        rd.from_arrow(t), id_vars=["id"], value_vars=["a", "b"],
        var_name="m", value_name="v",
    ).take_all()
    got = sorted((r["id"], r["m"], r["v"]) for r in out)
    # int column unifies with float64
    assert got == [
        (1, "a", 10.0), (1, "b", 1.5), (2, "a", 20.0), (2, "b", 2.5)
    ]
    with pytest.raises(TypeError, match="incompatible"):
        melt(
            rd.from_arrow(pa.table({"id": [1], "a": [1], "b": ["x"]})),
            id_vars=["id"], value_vars=["a", "b"],
        )
    with pytest.raises(ValueError, match="at least one"):
        melt(rd.from_arrow(t), id_vars=["id"], value_vars=[])


def test_copartition_join_composite_keys(ray_session):
    import polars as pl
    import ray.data as rd

    from patito_ray.stages.join import copartition_join

    rng = np.random.default_rng(9)
    n = 400
    lt = pa.table(
        {
            "a": pa.array(rng.integers(0, 6, n).astype(np.int64)),
            "b": pa.array([f"s{i}" for i in rng.integers(0, 5, n)]),
            "lv": pa.array(np.arange(n, dtype=np.int64)),
        }
    )
    # right includes swapped-value rows: (a=x, b=sy) vs (a=y, b=sx)
    # must NOT collide — order sensitivity of the hash fold matters
    rt = pa.table(
        {
            "ra": pa.array(rng.integers(0, 6, 60).astype(np.int64)),
            "rb": pa.array([f"s{i}" for i in rng.integers(0, 5, 60)]),
            "rv": pa.array(np.arange(60, dtype=np.int64) * 100),
        }
    )
    out = copartition_join(
        rd.from_arrow(lt).repartition(4),
        rd.from_arrow(rt).repartition(3),
        on=["a", "b"],
        right_on=["ra", "rb"],
        how="inner",
        num_partitions=7,
    ).take_all()
    ref = (
        pl.from_arrow(lt)
        .join(pl.from_arrow(rt), left_on=["a", "b"], right_on=["ra", "rb"], how="inner")
        .to_dicts()
    )
    got = sorted((r["a"], r["b"], r["lv"], r["rv"]) for r in out)
    exp = sorted((r["a"], r["b"], r["lv"], r["rv"]) for r in ref)
    assert got == exp

    with pytest.raises(ValueError, match="key lists differ"):
        copartition_join(
            rd.from_arrow(lt), rd.from_arrow(rt), on=["a", "b"], right_on=["ra"]
        )
