"""Benchmark decontamination: planted-overlap reference tests.

Reference semantics (= the SQL oracle): a corpus document's
``n_overlap`` is the number of its token n-gram POSITIONS whose gram
appears anywhere in the benchmark's distinct gram set; tokens are RE2
``\\S+`` (ASCII whitespace only).
"""

import re

import numpy as np
import pyarrow as pa
import pytest

ASCII_WS = re.compile(r"[^\t\n\f\r ]+")


def _ref_overlap(corpus: list[str | None], bench: list[str], n: int) -> list[int]:
    def grams(s):
        toks = ASCII_WS.findall(s) if s is not None else []
        return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]

    bset = {g for b in bench for g in grams(b)}
    return [sum(g in bset for g in grams(d)) for d in corpus]


@pytest.fixture(scope="module")
def planted(ray_session):
    import ray.data as rd

    bench_texts = [
        "the quick brown fox jumps over the lazy dog tonight",
        "colorless green ideas sleep furiously under a pale moon glow",
    ]
    corpus = [
        # exact benchmark copy -> every 8-gram overlaps
        bench_texts[0],
        # embeds an 8-token benchmark span mid-document
        "intro words here quick brown fox jumps over the lazy dog closing remarks",
        # only a 7-token span -> NOT flagged at n=8
        "prefix quick brown fox jumps over the lazy suffix tail words",
        # clean
        "completely unrelated text about distributed dataframes and arrow batches ok",
        # too short for any 8-gram
        "tiny doc",
        # null text
        None,
        # second benchmark doc, \x0b is NOT RE2 whitespace: token differs
        "colorless green ideas sleep furiously under a pale moon glow extra",
    ]
    ids = list(range(len(corpus)))
    corpus_t = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": corpus})
    bench_t = pa.table({"text": bench_texts})
    return corpus, bench_texts, corpus_t, bench_t, rd


def test_overlap_counts_match_reference(planted):
    from patito_ray.functions.decontaminate import decontaminate

    corpus, bench_texts, corpus_t, bench_t, rd = planted
    ref = _ref_overlap(corpus, bench_texts, 8)
    out = (
        decontaminate(
            rd.from_arrow(corpus_t).repartition(3),
            rd.from_arrow(bench_t),
            n=8,
            mode="flag",
            concurrency=2,
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    assert out["n_overlap"].tolist() == ref
    # the planted cases behave as designed
    assert ref[0] > 0 and ref[1] == 1 and ref[2] == 0 and ref[3] == 0
    assert ref[4] == 0 and ref[5] == 0 and ref[6] > 0


def test_drop_and_overlap_modes(planted):
    from patito_ray.functions.decontaminate import decontaminate

    corpus, bench_texts, corpus_t, bench_t, rd = planted
    ref = _ref_overlap(corpus, bench_texts, 8)
    clean = decontaminate(
        rd.from_arrow(corpus_t), rd.from_arrow(bench_t), n=8, mode="drop",
        concurrency=2,
    ).to_pandas()
    assert sorted(clean["doc_id"]) == [i for i, c in enumerate(ref) if c == 0]
    # short and null docs survive drop (no grams, no overlap)
    assert 4 in set(clean["doc_id"]) and 5 in set(clean["doc_id"])

    over = decontaminate(
        rd.from_arrow(corpus_t), rd.from_arrow(bench_t), n=8, mode="overlap",
        concurrency=2,
    ).to_pandas().sort_values("doc_id")
    assert over["doc_id"].tolist() == [i for i, c in enumerate(ref) if c > 0]
    assert over["n_overlap"].tolist() == [c for c in ref if c > 0]


def test_batching_invariance_and_empty_bench(planted):
    from patito_ray.functions.decontaminate import decontaminate

    corpus, bench_texts, corpus_t, bench_t, rd = planted
    outs = []
    for parts in (1, 4):
        out = (
            decontaminate(
                rd.from_arrow(corpus_t).repartition(parts),
                rd.from_arrow(bench_t),
                n=8,
                mode="flag",
                concurrency=2,
            )
            .to_pandas()
            .sort_values("doc_id")
        )
        outs.append(out["n_overlap"].tolist())
    assert outs[0] == outs[1]

    empty_bench = rd.from_arrow(pa.table({"text": pa.array([], pa.string())}))
    out = decontaminate(
        rd.from_arrow(corpus_t), empty_bench, n=8, mode="drop", concurrency=2
    )
    assert out.count() == len(corpus)


def test_guards(planted):
    from patito_ray.functions.decontaminate import benchmark_grams, decontaminate

    corpus, bench_texts, corpus_t, bench_t, rd = planted
    with pytest.raises(ValueError, match="mode"):
        decontaminate(rd.from_arrow(corpus_t), rd.from_arrow(bench_t), mode="x")
    with pytest.raises(ValueError, match="broadcast budget"):
        benchmark_grams(rd.from_arrow(bench_t), n=3, max_bytes=8)
    with pytest.raises(ValueError, match="n must be"):
        benchmark_grams(rd.from_arrow(bench_t), n=0)
