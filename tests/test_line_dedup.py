"""Cross-document line dedup (CCNet-style boilerplate removal):
property test vs a pure-Python reference under arbitrary batching,
plus edge-case and guard tests."""

from __future__ import annotations

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from patito_ray.functions.dedup import frequent_line_hashes, remove_frequent_lines


def _reference(texts: list[str | None], min_count: int, sep: str) -> list[tuple[str, int]]:
    """Single-machine oracle: count line occurrences, drop lines with
    count >= min_count, rejoin. Null text behaves as ''."""
    from collections import Counter

    split = [("" if t is None else t).split(sep) for t in texts]
    counts = Counter(line for lines in split for line in lines)
    out = []
    for lines in split:
        kept = [l for l in lines if counts[l] < min_count]
        out.append((sep.join(kept), len(lines) - len(kept)))
    return out


_line = st.text(alphabet="ab \t", max_size=4)
_doc = st.lists(_line, min_size=0, max_size=6).map(lambda ls: "\n".join(ls))


@settings(max_examples=20, deadline=None)
@given(
    docs=st.lists(_doc, min_size=1, max_size=30),
    min_count=st.integers(min_value=2, max_value=5),
    num_blocks=st.integers(min_value=1, max_value=4),
)
def test_remove_frequent_lines_matches_reference(ray_session, docs, min_count, num_blocks):
    import ray.data as rd

    ds = rd.from_arrow(
        pa.table({"doc_id": list(range(len(docs))), "text": docs})
    ).repartition(num_blocks)
    got = sorted(
        remove_frequent_lines(ds, min_count=min_count).take_all(),
        key=lambda r: r["doc_id"],
    )
    want = _reference(docs, min_count, "\n")
    assert [(r["text"], r["n_removed"]) for r in got] == want


def test_line_dedup_edges(ray_session):
    import ray.data as rd

    docs = [
        "NAV\nkeep me\nFOOT",
        "NAV\nother\nFOOT",
        "NAV\nFOOT",  # all lines removed -> empty text
        None,  # null text -> '' (one empty line, below threshold)
        "a||b",  # multi-char content untouched by default sep
    ]
    ds = rd.from_arrow(pa.table({"doc_id": list(range(5)), "text": docs}))
    got = {r["doc_id"]: r for r in remove_frequent_lines(ds, min_count=2).take_all()}
    assert (got[0]["text"], got[0]["n_removed"]) == ("keep me", 2)
    assert (got[2]["text"], got[2]["n_removed"]) == ("", 2)
    assert (got[3]["text"], got[3]["n_removed"]) == ("", 0)
    assert (got[4]["text"], got[4]["n_removed"]) == ("a||b", 0)


def test_line_dedup_custom_sep(ray_session):
    import ray.data as rd

    docs = ["x||dup||y", "z||dup||y", "dup||solo"]
    ds = rd.from_arrow(pa.table({"doc_id": [0, 1, 2], "text": docs}))
    got = {
        r["doc_id"]: r
        for r in remove_frequent_lines(ds, min_count=2, sep="||").take_all()
    }
    assert got[0]["text"] == "x"  # 'dup' x3 and 'y' x2 removed
    assert got[1]["text"] == "z"
    assert got[2]["text"] == "solo"


def test_frequent_line_hashes_guards(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({"doc_id": [0], "text": ["a"]}))
    with pytest.raises(ValueError, match="min_count"):
        frequent_line_hashes(ds, min_count=1)
    # nothing frequent -> empty flagged set, docs unchanged
    out = remove_frequent_lines(ds, min_count=2).take_all()
    assert out[0]["text"] == "a" and out[0]["n_removed"] == 0
