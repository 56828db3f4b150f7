import pyarrow as pa
import pytest

from patito_ray.functions.invindex import build_token_index, search_index


def _docs():
    return pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "text": pa.array(
                [
                    "red fox jumps",
                    "red red dog",          # repeated token -> one posting
                    "fox\tdog\x0bred",      # \x0b is NOT RE2 whitespace:
                                            # "dog\x0bred" is ONE token
                    "lazy dog sleeps",
                    None,                   # null doc contributes nothing
                ]
            ),
        }
    )


def _ids(res):
    if isinstance(res, pa.Table):
        return sorted(res.column("doc_id").to_pylist())
    return sorted(r["doc_id"] for r in res.take_all())


def test_build_and_search(ray_session, tmp_path):
    import ray.data as rd

    out = str(tmp_path / "idx")
    stats = build_token_index(
        rd.from_arrow(_docs()).repartition(3), out, num_partitions=8
    )
    # postings are DISTINCT (token, doc) pairs:
    # d1: red fox jumps (3) d2: red dog (2) d3: fox dog\x0bred (2)
    # d4: lazy dog sleeps (3)
    assert stats["postings"] == 10
    assert _ids(search_index(out, ["red"])) == [1, 2]
    assert _ids(search_index(out, ["red", "fox"])) == [1]
    assert _ids(search_index(out, ["red", "fox"], mode="or")) == [1, 2, 3]
    # \x0b token semantics: "dog" alone does NOT match doc 3
    assert _ids(search_index(out, ["dog"])) == [2, 4]
    assert _ids(search_index(out, ["dog\x0bred"])) == [3]
    # unknown term
    assert _ids(search_index(out, ["zebra"])) == []
    assert _ids(search_index(out, ["zebra", "red"])) == []
    assert _ids(search_index(out, ["zebra", "red"], mode="or")) == [1, 2]
    # duplicate terms collapse (AND of {red, red} == AND of {red})
    assert _ids(search_index(out, ["red", "red"])) == [1, 2]

    with pytest.raises(ValueError, match="non-empty"):
        search_index(out, [])
    with pytest.raises(ValueError, match="mode"):
        search_index(out, ["red"], mode="xor")
    with pytest.raises(FileExistsError):
        build_token_index(rd.from_arrow(_docs()), out)


def test_refresh_token_index(ray_session, tmp_path):
    import json

    import ray.data as rd

    from patito_ray.functions.invindex import refresh_token_index

    docs = _docs()
    out_full = str(tmp_path / "idx_full")
    out_inc = str(tmp_path / "idx_inc")
    build_token_index(rd.from_arrow(docs), out_full, num_partitions=8)
    build_token_index(rd.from_arrow(docs.slice(0, 2)), out_inc, num_partitions=8)
    r = refresh_token_index(out_inc, rd.from_arrow(docs.slice(2)))
    assert r["new_postings"] == 5  # docs 3-4 postings (doc 5 is null)

    for terms, mode in ([["red"], "and"], [["red", "fox"], "or"], [["dog"], "and"]):
        assert _ids(search_index(out_inc, terms, mode=mode)) == _ids(
            search_index(out_full, terms, mode=mode)
        )

    # re-adding already-indexed docs is a no-op (distinct postings)
    r2 = refresh_token_index(out_inc, rd.from_arrow(docs.slice(0, 2)))
    assert r2["new_postings"] == 0
    assert _ids(search_index(out_inc, ["red"])) == [1, 2]

    # crash-rerun: revert the counter, re-run the same delta -> skipped
    meta = json.load(open(f"{out_inc}/_INDEX.json"))
    meta["refreshes"] -= 1
    open(f"{out_inc}/_INDEX.json", "w").write(json.dumps(meta))
    r3 = refresh_token_index(out_inc, rd.from_arrow(docs.slice(0, 2)))
    assert r3["new_postings"] == 0
    assert _ids(search_index(out_inc, ["red"])) == [1, 2]

    # empty delta no-op
    r4 = refresh_token_index(out_inc, rd.from_arrow(docs.schema.empty_table()))
    assert r4 == {"partitions_touched": 0, "new_postings": 0}
