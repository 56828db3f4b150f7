"""Sources, join strategies, violation-row extraction."""

import os
from typing import Literal, Optional

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import patito_ray as pr


class Item(pr.Model):
    item_id: int
    name: str
    price: float = pr.Field(ge=0)
    total: float = pr.Field(derived_from=pr.col("price") * 2)


def test_read_csv_with_model(ray_session, tmp_path):
    from patito_ray.sources.readers import read_csv

    p = tmp_path / "items.csv"
    p.write_text("item_id,name,price\n1,a,2.5\n2,b,3.5\n")
    frame = read_csv(str(p), Item)
    t = frame.as_table()
    # streaming executor does not preserve row order
    assert sorted(t.column("total").to_pylist()) == [5.0, 7.0]
    assert t.column("item_id").type == pa.int64()


def test_read_csv_headerless(ray_session, tmp_path):
    from patito_ray.sources.readers import read_csv

    p = tmp_path / "items.csv"
    p.write_text("1,a,2.5\n")
    frame = read_csv(str(p), Item, has_header=False)
    t = frame.as_table()
    assert t.column("name").to_pylist() == ["a"]


def test_read_json_with_model(ray_session, tmp_path):
    from patito_ray.sources.readers import read_json

    p = tmp_path / "items.jsonl"
    p.write_text(
        '{"item_id": 1, "name": "a", "price": 2.5}\n'
        '{"item_id": 2, "name": "b", "price": 3.5}\n'
    )
    frame = read_json(str(p), Item)
    t = frame.as_table()
    assert sorted(t.column("total").to_pylist()) == [5.0, 7.0]
    assert t.column("item_id").type == pa.int64()
    # explicit schema pins dtypes even when a shard is all-null for a
    # column (no cross-block inference drift)
    p2 = tmp_path / "items2.jsonl"
    p2.write_text('{"item_id": 3, "name": null, "price": 1.0}\n')
    t2 = read_json([str(p), str(p2)], Item).as_table()
    assert t2.column("name").type in (pa.string(), pa.large_string())
    assert t2.num_rows == 3


def test_read_parquet_projection(ray_session, tmp_path):
    from patito_ray.sources.readers import read_parquet

    pq.write_table(
        pa.table({"item_id": [1], "name": ["a"], "price": [1.0], "junk": ["x"]}),
        tmp_path / "f.parquet",
    )
    frame = read_parquet(str(tmp_path / "f.parquet"), Item)
    t = frame.as_table()
    assert set(t.column_names) == {"item_id", "name", "price"}


def test_broadcast_join(ray_session):
    import ray.data as rd

    from patito_ray.stages.join import broadcast_join

    left = rd.from_arrow(pa.table({"k": [1, 2, 3, 2], "v": ["a", "b", "c", "d"]}))
    right = pa.table({"k": [1, 2], "dim": ["x", "y"]})
    out = broadcast_join(left, right, on="k")
    rows = sorted((r["k"], r["v"], r["dim"]) for r in out.take_all())
    assert rows == [(1, "a", "x"), (2, "b", "y"), (2, "d", "y")]
    out_left = broadcast_join(left, right, on="k", how="left")
    assert out_left.count() == 4


def test_hash_join(ray_session):
    import ray.data as rd

    from patito_ray.stages.join import hash_join

    left = rd.from_arrow(pa.table({"k": list(range(100)), "v": list(range(100))}))
    right = rd.from_arrow(pa.table({"k": list(range(0, 100, 2)), "w": list(range(50))}))
    out = hash_join(left, right, on="k", num_partitions=4)
    assert out.count() == 50


def test_hash_join_empty_side_safe(ray_session):
    """Regression: Ray's native join aggregator dies with ArrowInvalid
    when a side's blocks are all empty (hash_shuffle never ships the
    schema for 0-row blocks). hash_join's safe armor (drop empty
    blocks + null-key sentinel) must survive every such shape."""
    import ray.data as rd

    from patito_ray.stages.join import hash_join

    right = rd.from_arrow(pa.table({"k": [2, 3, 4], "w": [10, 20, 30]}))

    # left filtered to nothing -> inner join is empty, correct schema
    left_empty = rd.from_items([{"k": i, "v": i} for i in range(100)]).filter(
        lambda r: r["k"] < 0
    )
    out = hash_join(left_empty, right, on="k", num_partitions=2)
    assert out.take_all() == []

    # right filtered to nothing (schema-less empty: Ray's filter erases
    # it) -> left outer preserves all left rows; the vanished side's
    # columns are unknowable and absent (documented best effort)
    left = rd.from_arrow(pa.table({"k": [1, 2], "v": ["a", "b"]}))
    right_empty = right.filter(lambda r: r["k"] < 0)
    rows = sorted(
        (r["k"], r["v"])
        for r in hash_join(
            left, right_empty, on="k", how="left_outer", num_partitions=2
        ).take_all()
    )
    assert rows == [(1, "a"), (2, "b")]

    # right empty but schema-ful (arrow empty block keeps its schema)
    # -> full join semantics incl. the null-filled right columns
    right_schemaful = rd.from_arrow(
        pa.table({"k": pa.array([], type=pa.int64()), "w": pa.array([], type=pa.int64())})
    )
    rows = sorted(
        (r["k"], r["v"], r["w"])
        for r in hash_join(
            left, right_schemaful, on="k", how="left_outer", num_partitions=2
        ).take_all()
    )
    assert rows == [(1, "a", None), (2, "b", None)]

    # both sides empty -> empty result, no crash
    out = hash_join(
        left_empty, right_empty, on="k", how="full_outer", num_partitions=2
    )
    assert out.take_all() == []


def test_hash_join_safe_matches_polars(ray_session):
    """safe=True must not change results on dense inputs: all four join
    types against a polars oracle, including unmatched rows and a block
    that a filter empties mid-stream."""
    import polars as pl
    import ray.data as rd

    from patito_ray.stages.join import hash_join

    lt = pa.table({"k": [1, 2, 2, 5, 7], "v": ["a", "b", "c", "d", "e"]})
    rt = pa.table({"k": [2, 5, 5, 9], "w": [10, 20, 30, 40]})
    # two blocks each; the second left block is emptied by a filter
    left = rd.from_arrow([lt.slice(0, 3), lt.slice(3)]).filter(lambda r: r["k"] != 5)
    lt_f = lt.filter(pa.compute.not_equal(lt.column("k"), 5))
    for how, pl_how in [
        ("inner", "inner"),
        ("left_outer", "left"),
        ("right_outer", "right"),
        ("full_outer", "full"),
    ]:
        got = hash_join(
            left, rd.from_arrow(rt), on="k", how=how, num_partitions=2
        ).take_all()
        want = (
            pl.from_arrow(lt_f)
            .join(pl.from_arrow(rt), on="k", how=pl_how, coalesce=True)
            .to_dicts()
        )
        key = lambda r: tuple(
            (v is None, v) for v in (r.get("k"), r.get("v"), r.get("w"))
        )
        got_n = sorted(({"k": r.get("k"), "v": r.get("v"), "w": r.get("w")} for r in got), key=key)
        want_n = sorted(({"k": r.get("k"), "v": r.get("v"), "w": r.get("w")} for r in want), key=key)
        assert got_n == want_n, how


def test_semi_anti_join(ray_session):
    import ray.data as rd

    from patito_ray.stages.join import anti_join, semi_join

    ds = rd.from_arrow(pa.table({"k": [1, 2, 3, 4], "v": "a b c d".split()}))
    keys = pa.table({"k": [2, 4]})
    assert sorted(r["k"] for r in semi_join(ds, keys, on="k").take_all()) == [2, 4]
    assert sorted(r["k"] for r in anti_join(ds, keys, on="k").take_all()) == [1, 3]


class Page(pr.Model):
    url: str = pr.Field(unique=True, pattern=r"^https?://")
    lang: Literal["en", "de"]
    score: Optional[float] = pr.Field(default=None, ge=0)
    text: str


def _bad_table():
    return pa.table(
        {
            "url": ["https://a/1", "https://a/2", "ftp://bad", "https://a/1"],
            "lang": ["en", "xx", "de", "en"],
            "score": pa.array([1.0, -2.0, None, 0.5]),
            "text": pa.array(["t1", "t2", None, "t4"]),
        }
    )


def test_violation_rows_local_masks():
    from patito_ray.validation.violations import violation_masks

    masks = {(l, k): m for l, k, m in violation_masks(_bad_table(), Page._spec())}
    assert masks[("url", "out_of_bounds")].to_pylist() == [False, False, True, False]
    assert masks[("lang", "invalid_value")].to_pylist() == [False, True, False, False]
    assert masks[("score", "out_of_bounds")].to_pylist() == [False, True, False, False]
    assert masks[("text", "missing_value")].to_pylist() == [False, False, True, False]


def test_violations_dataset_and_write(ray_session, tmp_path):
    import ray.data as rd

    from patito_ray.validation.violations import violations_dataset, write_violations

    ds = rd.from_arrow(_bad_table())
    v = violations_dataset(ds, Page)
    rows = v.take_all()
    tags = {(r["violation_loc"], r["violation_kind"]) for r in rows}
    assert ("url", "out_of_bounds") in tags
    assert ("lang", "invalid_value") in tags
    counts = write_violations(rd.from_arrow(_bad_table()), Page, str(tmp_path / "viol"))
    assert counts["invalid_value"] >= 1
    assert os.path.isdir(tmp_path / "viol")


def test_duplicate_rows_dataset(ray_session):
    import ray.data as rd

    from patito_ray.validation.violations import duplicate_rows_dataset

    ds = rd.from_arrow(_bad_table())
    dups = duplicate_rows_dataset(ds, "url").take_all()
    assert sorted(r["url"] for r in dups) == ["https://a/1", "https://a/1"]


def test_anti_join_count_large_dims(ray_session):
    import ray.data as rd

    from patito_ray.validation.referential import anti_join_count

    fact = rd.from_arrow(
        pa.table({"fk": [1, 2, 3, 99, 98, 99], "v": list("abcdef")})
    ).repartition(3)
    dim = rd.from_arrow(pa.table({"pk": list(range(50))})).repartition(2)
    assert anti_join_count(fact, "fk", dim, "pk") == 3  # 99, 98, 99

    # agrees with the broadcast path
    import patito_ray as pr

    class F(pr.Model):
        fk: int

    rep = pr.validate_report(
        rd.from_arrow(pa.table({"fk": [1, 2, 3, 99, 98, 99]})),
        F,
        references={"fk": list(range(50))},
    )
    assert rep.merged.ref_fail["fk"] == 3


def test_anti_join_count_ignores_null_fact_keys(ray_session):
    """Null fact keys are the null-check's business, not referential
    misses — both referential paths agree on that semantics."""
    import ray.data as rd

    from patito_ray.validation.referential import anti_join_count

    fact = rd.from_arrow(
        pa.table({"fk": pa.array([1, None, 99, None, 2], type=pa.int64())})
    ).repartition(2)
    dim = rd.from_arrow(pa.table({"pk": list(range(10))}))
    assert anti_join_count(fact, "fk", dim, "pk") == 1  # only 99


def test_asof_join(ray_session):
    import datetime as dt

    import ray.data as rd

    from patito_ray.stages.join import asof_join

    def ts(h):
        return dt.datetime(2024, 1, 1, h)

    left = rd.from_arrow(
        pa.table(
            {
                "eid": pa.array([1, 2, 3, 4], pa.int64()),
                "ts": pa.array([ts(1), ts(5), ts(9), ts(2)], pa.timestamp("us")),
                "uid": pa.array([7, 7, 7, 8], pa.int64()),
            }
        )
    ).repartition(2)
    right = rd.from_arrow(
        pa.table(
            {
                "okey": pa.array([100, 101, 102], pa.int64()),
                "ots": pa.array([ts(0), ts(4), ts(3)], pa.timestamp("us")),
                "ouid": pa.array([7, 7, 9], pa.int64()),
            }
        )
    ).repartition(2)
    out = asof_join(left, right, on="ts", right_on="ots", by="uid", right_by="ouid")
    rows = {r["eid"]: r["okey"] for r in out.take_all()}
    # uid 7: event@1h -> order@0h(100); @5h -> order@4h(101); @9h -> 101
    # uid 8: no orders -> null (left-join semantics)
    assert rows == {1: 100, 2: 101, 3: 101, 4: None}

    fwd = asof_join(
        left, right, on="ts", right_on="ots", by="uid", right_by="ouid",
        direction="forward",
    )
    rows = {r["eid"]: r["okey"] for r in fwd.take_all()}
    assert rows == {1: 101, 2: None, 3: None, 4: None}

    clash = rd.from_arrow(pa.table({"eid": pa.array([1], pa.int64()), "z": [1.0]}))
    with pytest.raises(ValueError, match="clash"):
        asof_join(left, clash, on="ts", by="uid", right_by="eid")


def test_range_join(ray_session):
    import datetime as dt

    import ray.data as rd

    from patito_ray.stages.join import range_join

    def ts(h):
        return dt.datetime(2024, 1, 1, h)

    left = rd.from_arrow(
        pa.table(
            {
                "eid": pa.array([1, 2, 3], pa.int64()),
                "ts": pa.array([ts(1), ts(5), ts(3)], pa.timestamp("us")),
                "uid": pa.array([7, 7, 8], pa.int64()),
            }
        )
    ).repartition(2)
    right = rd.from_arrow(
        pa.table(
            {
                "okey": pa.array([100, 101], pa.int64()),
                "lo": pa.array([ts(0), ts(4)], pa.timestamp("us")),
                "hi": pa.array([ts(2), ts(6)], pa.timestamp("us")),
                "ouid": pa.array([7, 7], pa.int64()),
            }
        )
    )
    out = range_join(
        left, right, on="ts", right_lo="lo", right_hi="hi", by="uid", right_by="ouid"
    )
    pairs = sorted((r["eid"], r["okey"]) for r in out.take_all())
    # eid1@1h in [0,2) of okey100; eid2@5h in [4,6) of okey101; eid3 uid 8 no match
    assert pairs == [(1, 100), (2, 101)]


def test_violation_masks_nested_parity():
    """violation_masks covers list enums and struct / list-of-struct
    recursion like check_batch (round-2 review finding: these were
    silently omitted from the violation-row sink)."""
    from patito_ray.validation.violations import violation_masks

    class Inner(pr.Model):
        v: int = pr.Field(ge=0)
        tag: Literal["a", "b"]

    class M(pr.Model):
        tags: list[Literal["a", "b"]]
        s: Inner
        items: list[Inner]

    t = pa.table(
        {
            "tags": pa.array([["a"], ["a", "zzz"], ["b"]]),
            "s": pa.array(
                [
                    {"v": 1, "tag": "a"},
                    {"v": -5, "tag": "a"},
                    {"v": 2, "tag": "q"},
                ]
            ),
            "items": pa.array(
                [
                    [{"v": 1, "tag": "a"}],
                    [],
                    [{"v": -9, "tag": "a"}, {"v": 3, "tag": "b"}],
                ]
            ),
        }
    )
    masks = {
        (loc, kind): m.to_pylist() for loc, kind, m in violation_masks(t, M._spec())
    }
    assert masks[("tags", "invalid_value")] == [False, True, False]
    assert masks[("s.v", "out_of_bounds")] == [False, True, False]
    assert masks[("s.tag", "invalid_value")] == [False, False, True]
    assert masks[("items.v", "out_of_bounds")] == [False, False, True]


def test_read_parquet_evolved(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import pytest

    from patito_ray.sources.readers import read_parquet_evolved

    gen1 = pa.table(
        {
            "id": pa.array([1, 2], pa.int32()),       # narrower int
            "v": pa.array([10, 20], pa.int64()),
        }
    )
    gen2 = pa.table(
        {
            "id": pa.array([3, 4], pa.int64()),
            "v": pa.array([30, 40], pa.int64()),
            "tag": pa.array(["x", "y"]),               # added column
        }
    )
    d = tmp_path / "evo"
    d.mkdir()
    pq.write_table(gen1, d / "gen1.parquet")
    pq.write_table(gen2, d / "gen2.parquet")

    ds = read_parquet_evolved(str(d))
    rows = sorted(ds.take_all(), key=lambda r: r["id"])
    assert [r["id"] for r in rows] == [1, 2, 3, 4]
    assert [r["tag"] for r in rows] == [None, None, "x", "y"]
    # int32 generation promoted to int64
    assert ds.schema().base_schema.field("id").type == pa.int64()

    # column projection, including a column one generation lacks
    ds2 = read_parquet_evolved(str(d), columns=["tag"])
    assert sorted(
        (r["tag"] is None) for r in ds2.take_all()
    ) == [False, False, True, True]

    # un-unifiable types raise loudly
    bad = pa.table({"id": pa.array(["a"]), "v": pa.array([1], pa.int64())})
    pq.write_table(bad, d / "gen3.parquet")
    with pytest.raises(ValueError, match="cannot unify"):
        read_parquet_evolved(str(d))
