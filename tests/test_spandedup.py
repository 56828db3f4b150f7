"""duplicated_span_stats vs a pure-python reference under arbitrary
partitioning, stride sampling, and both merge paths."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

from patito_ray.functions.spandedup import duplicated_span_stats


def _collect(out) -> dict:
    import ray

    if not isinstance(out, pa.Table):
        tabs = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
        out = pa.concat_tables(tabs) if tabs else None
    if out is None:
        return {}
    return {
        r["doc_id"]: (r["n_grams"], r["n_dup_grams"]) for r in out.to_pylist()
    }


def _reference(texts: list[str], L: int, stride: int = 1) -> dict:
    per = {
        i: {t[j : j + L] for j in range(0, len(t) - L + 1, stride)}
        for i, t in enumerate(texts)
    }
    c = Counter(g for s in per.values() for g in s)
    return {
        i: (len(s), sum(1 for g in s if c[g] > 1))
        for i, s in per.items()
        if s
    }


def _corpus(n: int = 150) -> list[str]:
    rng = np.random.default_rng(3)
    shared = "shared-boilerplate-span-which-repeats-verbatim"
    texts = []
    for i in range(n):
        t = "".join(rng.choice(list("abcdefgh "), size=int(rng.integers(5, 90))))
        if i % 5 == 0:
            t = t[:3] + shared + t[3:]
        texts.append(t)
    # a doc that duplicates a span WITHIN itself only (not cross-doc):
    # self-repeats must NOT count as duplicated
    texts.append("xyzqwertyuiopasdfghjklzz" * 2)
    return texts


@pytest.mark.parametrize("num_buckets", [4, 64])
def test_span_stats_reference(ray_session, num_buckets):
    import ray.data as rd

    texts = _corpus()
    ds = rd.from_arrow(
        pa.table(
            {"doc_id": pa.array(range(len(texts)), type=pa.int64()), "text": texts}
        )
    ).repartition(6)
    got = _collect(duplicated_span_stats(ds, L=20, num_buckets=num_buckets))
    assert got == _reference(texts, 20)


def test_span_stats_stride_and_short_docs(ray_session):
    import ray.data as rd

    texts = _corpus(60) + ["tiny", ""]  # below L: no windows, no row
    ds = rd.from_arrow(
        pa.table(
            {"doc_id": pa.array(range(len(texts)), type=pa.int64()), "text": texts}
        )
    ).repartition(4)
    got = _collect(duplicated_span_stats(ds, L=20, stride=4))
    assert got == _reference(texts, 20, stride=4)
    assert len(texts) - 1 not in got and len(texts) - 2 not in got


def test_span_stats_hash_rate_content_keyed(ray_session):
    """hash_rate sampling vs a python reference that applies the SAME
    content-hash keep rule; and the property stride cannot give: a span
    duplicated at UNALIGNED offsets is still caught (both copies make
    the same keep decisions), while stride=k at those offsets misses."""
    import ray.data as rd

    from patito_ray.functions.spandedup import (
        _R1,
        _R1_INV,
        _rolling_hashes,
    )

    L, k = 20, 4

    def ref_hash_rate(texts: list[str]) -> dict:
        thr = np.uint64(2**64 // k)
        per = {}
        for i, t in enumerate(texts):
            data = np.frombuffer(t.encode(), np.uint8)
            if len(data) < L:
                continue
            starts = np.arange(len(data) - L + 1, dtype=np.int64)
            h = _rolling_hashes(data, starts, L, _R1, _R1_INV)
            per[i] = {t[j : j + L] for j in starts[h < thr]}
        c = Counter(g for s in per.values() for g in s)
        return {
            i: (len(s), sum(1 for g in s if c[g] > 1))
            for i, s in per.items()
            if s
        }

    texts = [t for t in _corpus(120) if len(t.encode()) == len(t)]
    ds = rd.from_arrow(
        pa.table(
            {"doc_id": pa.array(range(len(texts)), type=pa.int64()), "text": texts}
        )
    ).repartition(5)
    got = _collect(duplicated_span_stats(ds, L=L, hash_rate=k))
    assert got == ref_hash_rate(texts)

    # unaligned duplicated span: offsets 0 and 3 (3 % 4 != 0); pads are
    # per-doc distinct so the span is the ONLY shared content
    span = "the-exact-duplicated-span-of-sixty-characters-in-two-docs!!"
    t2 = [span + "left-pad-one-0123456789abcdef", "xyz" + span + "other-pad-ghijklmnopqrstuvw"]
    ds2 = rd.from_arrow(
        pa.table({"doc_id": pa.array([0, 1], type=pa.int64()), "text": t2})
    ).repartition(2)
    winnow = _collect(duplicated_span_stats(ds2, L=L, hash_rate=k))
    assert all(nd > 0 for (_, nd) in winnow.values())  # both docs flagged
    strided = _collect(duplicated_span_stats(ds2, L=L, stride=k))
    assert all(nd == 0 for (_, nd) in strided.values())  # stride misses


def test_span_stats_guards(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({"doc_id": pa.array([1]), "text": ["x"]}))
    with pytest.raises(ValueError):
        duplicated_span_stats(ds, L=1)
    with pytest.raises(ValueError):
        duplicated_span_stats(ds, stride=0)
    with pytest.raises(ValueError):
        duplicated_span_stats(ds, num_buckets=48)
    with pytest.raises(ValueError):
        duplicated_span_stats(ds, hash_rate=0)


def test_span_stats_duplicate_doc_id_rows(ray_session):
    """The same doc_id split across TWO rows/batches: its grams union
    (not double-count), and a gram shared only by the two same-id rows
    is NOT a cross-document duplicate."""
    import ray.data as rd

    shared = "abcdefghijklmnopqrstuv"  # 22 chars -> 3 distinct windows
    t = pa.table(
        {
            "doc_id": pa.array([7, 7], type=pa.int64()),
            "text": [shared + "x" * 30, shared + "y" * 30],
        }
    )
    ds = rd.from_arrow(t).repartition(2)
    got = _collect(duplicated_span_stats(ds, L=20))
    n_grams, n_dup = got[7]
    ref = {s[i : i + 20] for s in (shared + "x" * 30, shared + "y" * 30) for i in range(len(s) - 19)}
    assert n_grams == len(ref)
    assert n_dup == 0


def test_span_positions_reference(ray_session):
    """duplicated_span_positions vs pure python: every stride-aligned
    position whose window occurs in >= 2 distinct documents."""
    import ray.data as rd

    from patito_ray.functions.spandedup import duplicated_span_positions

    texts = _corpus(60)
    L, stride = 20, 3
    ds = rd.from_arrow(
        pa.table(
            {"doc_id": pa.array(range(len(texts)), type=pa.int64()), "text": texts}
        )
    ).repartition(5)
    got = {
        (r["doc_id"], r["pos"])
        for r in duplicated_span_positions(ds, L=L, stride=stride).take_all()
    }
    owners: dict[str, set[int]] = {}
    for d, s in enumerate(texts):
        for j in range(0, len(s) - L + 1, stride):
            owners.setdefault(s[j : j + L], set()).add(d)
    exp = {
        (d, j + 1)
        for d, s in enumerate(texts)
        for j in range(0, len(s) - L + 1, stride)
        if len(owners[s[j : j + L]]) >= 2
    }
    assert got == exp


def test_cut_duplicated_spans_reference(ray_session):
    """cut_duplicated_spans vs pure python: strip every char covered by
    a cross-document duplicated window, keep the rest stitched."""
    import ray.data as rd

    from patito_ray.functions.spandedup import cut_duplicated_spans

    texts = _corpus(60)
    L, stride = 20, 3
    ds = rd.from_arrow(
        pa.table(
            {"doc_id": pa.array(range(len(texts)), type=pa.int64()), "text": texts}
        )
    ).repartition(5)
    got = {
        r["doc_id"]: r["clean_text"]
        for r in cut_duplicated_spans(ds, L=L, stride=stride).take_all()
    }
    owners: dict[str, set[int]] = {}
    for d, s in enumerate(texts):
        for j in range(0, len(s) - L + 1, stride):
            owners.setdefault(s[j : j + L], set()).add(d)
    exp = {}
    for d, s in enumerate(texts):
        cov = [False] * len(s)
        for j in range(0, len(s) - L + 1, stride):
            if len(owners[s[j : j + L]]) >= 2:
                for k in range(j, j + L):
                    cov[k] = True
        exp[d] = "".join(ch for ch, c in zip(s, cov) if not c)
    assert got == exp
    # broadcast_limit_bytes=0 forces the co-partition branch — the
    # broadcast fast path (default, taken above) must match it exactly
    forced = {
        r["doc_id"]: r["clean_text"]
        for r in cut_duplicated_spans(
            ds, L=L, stride=stride, broadcast_limit_bytes=0
        ).take_all()
    }
    assert forced == exp
