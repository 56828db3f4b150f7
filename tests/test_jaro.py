"""Jaro-Winkler kernel (functions/jaro.py): bit-parity with DuckDB's
jaro_winkler_similarity (byte semantics), edge cases, blocked linkage."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _jw_duck(pairs):
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE p(a VARCHAR, b VARCHAR)")
    con.executemany("INSERT INTO p VALUES (?, ?)", pairs)
    return np.array(
        [r[0] for r in con.sql("SELECT jaro_winkler_similarity(a,b) FROM p").fetchall()]
    )


def test_jw_bit_parity_random_and_unicode():
    import random

    from patito_ray.functions.jaro import jaro_winkler_batch

    random.seed(4)
    alph = "abcdé日"
    pairs = [
        (
            "".join(random.choice(alph) for _ in range(random.randint(0, 10))),
            "".join(random.choice(alph) for _ in range(random.randint(0, 10))),
        )
        for _ in range(2000)
    ]
    pairs += [("same", "same"), ("", ""), ("x", ""), ("", "x"),
              ("Customer#000000042", "Supplier#000000042")]
    got = jaro_winkler_batch(
        pa.array([p[0] for p in pairs]), pa.array([p[1] for p in pairs])
    )
    ref = _jw_duck(pairs)
    assert (got == ref).all(), np.flatnonzero(got != ref)[:5]


def test_jw_errors():
    from patito_ray.functions.jaro import jaro_winkler_batch

    with pytest.raises(ValueError, match="null"):
        jaro_winkler_batch(pa.array(["a", None]), pa.array(["a", "b"]))
    with pytest.raises(ValueError, match="SHORT keys"):
        jaro_winkler_batch(pa.array(["x" * 200]), pa.array(["y"]))
    with pytest.raises(ValueError, match="length mismatch"):
        jaro_winkler_batch(pa.array(["a", "b"]), pa.array(["a"]))
    assert len(jaro_winkler_batch(pa.array([], pa.string()), pa.array([], pa.string()))) == 0


def test_jw_sliced_chunked_input():
    """Arrow offset handling: a sliced chunked column must score the
    same as a fresh one."""
    from patito_ray.functions.jaro import jaro_winkler_batch

    vals = ["alpha", "beta", "gamma", "delta", "epsilon"]
    whole = pa.chunked_array([vals[:2], vals[2:]])
    sliced = whole.slice(1, 3)
    fresh = pa.array(vals[1:4])
    other = pa.array(["alppa", "betta", "gamm"])
    assert (
        jaro_winkler_batch(sliced, other) == jaro_winkler_batch(fresh, other)
    ).all()


def test_blocked_name_link(ray_session):
    import ray.data as rd

    from patito_ray.functions.jaro import blocked_name_link, jaro_winkler_batch

    left = pa.table(
        {
            "lid": pa.array([1, 2, 3], pa.int64()),
            "blk": pa.array([0, 0, 1], pa.int64()),
            "lname": pa.array(["martha", "jonathan", "zed"]),
        }
    )
    right = pa.table(
        {
            "rid": pa.array([10, 11, 12], pa.int64()),
            "rblk": pa.array([0, 1, 2], pa.int64()),
            "rname": pa.array(["marhta", "zedd", "jonathan"]),
        }
    )
    out = blocked_name_link(
        rd.from_arrow(left),
        rd.from_arrow(right),
        left_key="lid",
        right_key="rid",
        left_block="blk",
        right_block="rblk",
        left_name="lname",
        right_name="rname",
        threshold=0.9,
        num_partitions=4,
    ).take_all()
    got = {(r["lid"], r["rid"]): r["jw"] for r in out}
    # only within-block pairs: (1,10) martha~marhta; (3,11) zed~zedd.
    # jonathan's exact twin is in block 2 — blocked away.
    exp_mm = float(jaro_winkler_batch(pa.array(["martha"]), pa.array(["marhta"]))[0])
    exp_zz = float(jaro_winkler_batch(pa.array(["zed"]), pa.array(["zedd"]))[0])
    assert got == {(1, 10): exp_mm, (3, 11): exp_zz}
