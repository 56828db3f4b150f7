"""Ordered prefix sum + sequence packing: the distributed plan must
equal a sequential pure-Python reference regardless of partitioning,
and the explode kernel must be exact on arbitrary inputs."""

import hypothesis.strategies as st
import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings

from patito_ray.functions.packing import explode_segments


@settings(max_examples=200, deadline=None)
@given(
    toks=st.lists(st.integers(min_value=0, max_value=50), min_size=0, max_size=30),
    L=st.integers(min_value=1, max_value=17),
    base=st.integers(min_value=0, max_value=1000),
)
def test_explode_segments_matches_reference(toks, L, base):
    n = len(toks)
    offs, cum = [], base
    for t in toks:
        offs.append(cum)
        cum += t
    tab = pa.table(
        {
            "doc_id": pa.array(range(n), type=pa.int64()),
            "n_tokens": pa.array(toks, type=pa.int64()),
            "_off": pa.array(offs, type=pa.int64()),
        }
    )
    got = [
        (r["doc_id"], r["seq_id"], r["doc_begin"], r["seq_begin"], r["n_tok"])
        for r in explode_segments(tab, "doc_id", "n_tokens", L, "_off").to_pylist()
    ]
    want = []
    for i, t in enumerate(toks):
        if t == 0:
            continue
        b = offs[i]
        for s in range(b // L, (b + t - 1) // L + 1):
            gs, ge = max(b, s * L), min(b + t, (s + 1) * L)
            want.append((i, s, gs - b, gs - s * L, ge - gs))
    assert got == want
    # segments of one doc tile it exactly, in order
    for i, t in enumerate(toks):
        segs = [(db, k) for (d, _s, db, _sb, k) in got if d == i]
        assert sum(k for _, k in segs) == t
        pos = 0
        for db, k in segs:
            assert db == pos
            pos += k


def test_ordered_prefix_sum_partition_stable(ray_session):
    import ray.data as rd

    from patito_ray.stages.prefix import ordered_prefix_sum

    rng = np.random.default_rng(7)
    n = 800
    ids = (rng.permutation(n).astype(np.int64) * 13 + 5) * rng.choice(
        [1, -1], n
    )  # unique, unsorted, negative keys too
    vals = rng.integers(0, 100, n).astype(np.int64)
    tab = pa.table({"k": ids, "v": vals})

    order = np.argsort(ids)
    want_off = np.zeros(n, dtype=np.int64)
    want_off[order] = np.cumsum(vals[order]) - vals[order]
    want = sorted(zip(ids.tolist(), want_off.tolist()))

    for blocks in (1, 11):
        ds = rd.from_arrow(tab).repartition(blocks)
        out = ordered_prefix_sum(ds, "k", "v").take_all()
        got = sorted((r["k"], r["offset"]) for r in out)
        assert got == want, f"blocks={blocks}"


def test_ordered_prefix_sum_rejects_duplicate_keys(ray_session):
    import ray.data as rd

    from patito_ray.stages.prefix import ordered_prefix_sum

    tab = pa.table(
        {
            "k": pa.array([1, 2, 2, 3], type=pa.int64()),
            "v": pa.array([1, 1, 1, 1], type=pa.int64()),
        }
    )
    with pytest.raises(Exception, match="duplicate"):
        ordered_prefix_sum(rd.from_arrow(tab), "k", "v").take_all()


def test_pack_sequences_empty_and_validation(ray_session):
    import ray.data as rd

    from patito_ray.functions.packing import pack_sequences

    empty = pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "n_tokens": pa.array([], type=pa.int64()),
        }
    )
    assert pack_sequences(rd.from_arrow(empty), "doc_id", "n_tokens", 8).count() == 0

    with pytest.raises(ValueError, match="seq_len"):
        pack_sequences(rd.from_arrow(empty), "doc_id", "n_tokens", 0)


def test_pack_sequences_fills_every_sequence(ray_session):
    import ray.data as rd

    from patito_ray.functions.packing import pack_sequences

    rng = np.random.default_rng(3)
    n, L = 500, 32
    toks = rng.integers(0, 90, n).astype(np.int64)  # docs longer than L too
    tab = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64) * 3),
            "n_tokens": pa.array(toks),
        }
    )
    rows = pack_sequences(
        rd.from_arrow(tab).repartition(7), "doc_id", "n_tokens", L
    ).take_all()
    per_seq: dict = {}
    for r in rows:
        per_seq[r["seq_id"]] = per_seq.get(r["seq_id"], 0) + r["n_tok"]
        assert 0 < r["n_tok"] <= L
        assert 0 <= r["seq_begin"] < L
    seqs = sorted(per_seq)
    assert seqs == list(range(len(seqs)))  # contiguous sequence ids
    assert all(per_seq[s] == L for s in seqs[:-1])  # all but last full
    assert sum(per_seq.values()) == int(toks.sum())


def test_ordered_prefix_sum_tie_col(ray_session):
    import ray.data as rd

    from patito_ray.stages.prefix import ordered_prefix_sum

    # duplicate order keys are fine when the tie column disambiguates
    tab = pa.table(
        {
            "k": pa.array([5, 5, 5, 1, 1], type=pa.int64()),
            "t": pa.array([30, 10, 20, 2, 1], type=pa.int64()),
            "v": pa.array([1, 2, 4, 8, 16], type=pa.int64()),
        }
    )
    out = ordered_prefix_sum(
        rd.from_arrow(tab).repartition(3), "k", "v", tie_col="t"
    ).take_all()
    got = {(r["k"], r["t"]): r["offset"] for r in out}
    # order: (1,1)v16 (1,2)v8 (5,10)v2 (5,20)v4 (5,30)v1
    assert got == {(1, 1): 0, (1, 2): 16, (5, 10): 24, (5, 20): 26, (5, 30): 30}

    dup = pa.table(
        {
            "k": pa.array([5, 5], type=pa.int64()),
            "t": pa.array([7, 7], type=pa.int64()),
            "v": pa.array([1, 1], type=pa.int64()),
        }
    )
    with pytest.raises(Exception, match="duplicate"):
        ordered_prefix_sum(
            rd.from_arrow(dup), "k", "v", tie_col="t"
        ).take_all()


def test_epoch_shuffle_positions(ray_session):
    import ray.data as rd

    from patito_ray.functions.dedup import _splitmix
    from patito_ray.functions.sampling import epoch_shuffle_positions

    n = 400
    ids = (np.random.default_rng(2).permutation(n) * 9 + 1).astype(np.int64)
    tab = pa.table({"doc_id": pa.array(ids), "payload": pa.array(["p"] * n)})

    got = {}
    for blocks in (1, 6):
        rows = epoch_shuffle_positions(
            rd.from_arrow(tab).repartition(blocks), "doc_id", epoch=3
        ).take_all()
        got[blocks] = sorted((r["doc_id"], r["pos"]) for r in rows)
    assert got[1] == got[6]

    h = _splitmix(ids.view(np.uint64) ^ np.uint64(3))
    order = np.lexsort((ids, h))
    want = sorted((int(ids[i]), int(p)) for p, i in enumerate(order))
    assert got[1] == want
    # different epoch => different permutation
    rows2 = epoch_shuffle_positions(
        rd.from_arrow(tab), "doc_id", epoch=4
    ).take_all()
    assert sorted((r["doc_id"], r["pos"]) for r in rows2) != got[1]


def test_materialize_sequences_exact(ray_session):
    import ray.data as rd

    from patito_ray.functions.packing import materialize_sequences

    rng = np.random.default_rng(9)
    n, L = 200, 16
    ids = rng.permutation(n).astype(np.int64) * 5 + 1
    texts, w = [], 0
    for _ in range(n):
        k = int(rng.integers(0, 30))
        texts.append(" " + "  ".join(f"w{w + j}" for j in range(k)))
        w += k
    tab = pa.table({"doc_id": pa.array(ids), "text": pa.array(texts)})

    rows = materialize_sequences(
        rd.from_arrow(tab).repartition(5), L
    ).take_all()
    rows.sort(key=lambda r: r["seq_id"])

    order = np.argsort(ids)
    all_toks: list = []
    for i in order:
        all_toks.extend(texts[i].split())
    want = [" ".join(all_toks[s : s + L]) for s in range(0, len(all_toks), L)]
    assert [r["seq_text"] for r in rows] == want
    assert all(r["n_tok"] == L for r in rows[:-1])
    assert rows[-1]["n_tok"] == len(all_toks) - (len(rows) - 1) * L
