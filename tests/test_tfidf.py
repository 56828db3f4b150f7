"""TF-IDF / term-statistics operators vs pure-Python + DuckDB references."""

from __future__ import annotations

import math
from collections import Counter

import hypothesis.strategies as st
import pyarrow as pa
import pytest
from hypothesis import given, settings

from patito_ray.functions.tfidf import (
    doc_frequencies,
    re2_split_tokens,
    smooth_idf,
    term_counts,
    tfidf_topk,
    top_terms,
)

EXOTIC = [
    "a b  c",
    " lead",
    "trail ",
    "",
    None,
    "x\x0by",          # \x0b is NOT RE2 \s
    "nb\xa0sp",        # NBSP is NOT RE2 \s
    "tab\tsep\nnl\rcr\fff",
    "  ",
]


def _duck_tokens(texts):
    import duckdb

    con = duckdb.connect()
    out = []
    for i, t in enumerate(texts):
        if t is None:
            continue
        toks = con.execute(
            "SELECT regexp_extract_all(?, '\\S+')", [t]
        ).fetchone()[0]
        out.extend((i, tok) for tok in toks)
    return out


def test_re2_split_tokens_matches_duckdb_on_exotic_whitespace():
    flat, parents, n = re2_split_tokens(pa.array(EXOTIC))
    got = list(zip(parents.tolist(), flat.to_pylist()))
    assert got == _duck_tokens(EXOTIC)
    assert n == len(EXOTIC)


def _mk_ds(texts, ids=None):
    import ray.data as rd

    tab = pa.table(
        {
            "doc_id": pa.array(ids if ids is not None else range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    return rd.from_arrow(tab).repartition(3)


def test_term_counts_and_top_terms(ray_session):
    texts = ["a b a", "b c", None, "", "a  a\t b", "z"]
    ds = _mk_ds(texts)
    expect = Counter()
    for t in texts:
        if t:
            expect.update(t.split())
    merged = term_counts(ds)
    assert isinstance(merged, pa.Table)
    got = dict(zip(merged["tok"].to_pylist(), merged["cnt"].to_pylist()))
    assert got == dict(expect)

    top = top_terms(ds, k=3)
    ranked = sorted(expect.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert list(zip(top["tok"].to_pylist(), top["cnt"].to_pylist())) == ranked


def test_doc_frequencies_includes_absent_terms(ray_session):
    ds = _mk_ds(["a b a", "b c", "c c c", None])
    dfs = doc_frequencies(ds, ["a", "c", "missing"])
    assert dfs == {"a": 1, "c": 2, "missing": 0}


def _py_tfidf(texts, ids, terms, k):
    n = len(texts)
    df = Counter()
    for t in texts:
        if t is None:
            continue
        present = set(t.split()) & set(terms)
        df.update(present)
    scores = []
    for i, t in zip(ids, texts):
        if t is None:
            continue
        tf = Counter(w for w in t.split() if w in terms)
        s = sum(c * smooth_idf(n, df[w]) for w, c in sorted(tf.items()))
        if s > 0:
            scores.append((i, s))
    scores.sort(key=lambda kv: (-kv[1], kv[0]))
    return scores[:k]


def test_tfidf_topk_matches_reference(ray_session):
    texts = [
        "spark join spark",
        "window hash",
        "noise words only",
        "spark",
        None,
        "join join join window",
    ]
    ids = [10, 20, 30, 40, 50, 60]
    terms = ["spark", "join", "window"]
    ds = _mk_ds(texts, ids)
    got = tfidf_topk(ds, terms, k=4)
    expect = _py_tfidf(texts, ids, terms, 4)
    got_pairs = list(zip(got["doc_id"].to_pylist(), got["score"].to_pylist()))
    assert [i for i, _ in got_pairs] == [i for i, _ in expect]
    for (_, a), (_, b) in zip(got_pairs, expect):
        assert a == pytest.approx(b, rel=1e-12)


def test_tfidf_empty_and_no_hits(ray_session):
    ds = _mk_ds(["nothing here", None])
    out = tfidf_topk(ds, ["absent"], k=5)
    assert out.num_rows == 0
    assert out.column_names == ["doc_id", "score"]


def _ref_ngrams(texts, n):
    import re

    out = []
    for t in texts:
        if t is None:
            continue
        toks = [x for x in re.split(r"[\t\n\f\r ]+", t) if x]
        out.extend(
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        )
    return out


@settings(max_examples=150, deadline=None)
@given(
    texts=st.lists(
        st.text(alphabet="ab \t\x0b", max_size=20), min_size=0, max_size=6
    ),
    n=st.integers(min_value=1, max_value=4),
)
def test_ngram_array_matches_python_reference(texts, n):
    import pyarrow as pa

    from patito_ray.functions.tfidf import ngram_array

    arr = pa.array(texts, type=pa.string())
    got = sorted(ngram_array(arr, n).to_pylist())
    assert got == sorted(_ref_ngrams(texts, n))
    # n-grams never cross row boundaries: two rows vs their concat differ
    # (covered by construction above — reference is per-row too)


def test_top_ngrams_counts(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from patito_ray.functions.tfidf import top_ngrams

    docs = pa.table(
        {"text": pa.array(["a b c a b", "a b c", None, "x"])}
    )
    for blocks in (1, 3):
        t = top_ngrams(rd.from_arrow(docs).repartition(blocks), n=2, k=3)
        got = list(zip(t.column("gram").to_pylist(), t.column("cnt").to_pylist()))
        assert got == [("a b", 3), ("b c", 2), ("c a", 1)]


def _bm25_reference(texts, terms, k1=1.2, b=0.75):
    """Textbook BM25 (Lucene idf) over whitespace tokens."""
    import math

    docs = [t.split() if t is not None else [] for t in texts]
    valid = [t for t in texts if t is not None]
    n = len(valid)
    total = sum(len(d) for d, t in zip(docs, texts) if t is not None)
    avgdl = total / n if n else 1.0
    out = {}
    for i, (d, t) in enumerate(zip(docs, texts)):
        if t is None:
            continue
        score = 0.0
        for term in sorted(set(terms)):
            df = sum(1 for dd, tt in zip(docs, texts) if tt is not None and term in dd)
            tf = d.count(term)
            if tf == 0:
                continue
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            score += idf * tf * (k1 + 1.0) / (tf + k1 * (1 - b + b * len(d) / avgdl))
        if score > 0:
            out[i] = score
    return out


def test_bm25_matches_reference_under_batching(ray_session):
    import ray
    import ray.data as rd

    from patito_ray.functions.tfidf import bm25_scores

    texts = [
        "spark join hash hash hash",
        "window vector",
        None,
        "plain prose with no query words",
        "spark spark spark spark spark join",
        "",
        "vector vector window window window join",
    ]
    tab = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    terms = ["spark", "window", "hash", "join", "vector"]
    ref = _bm25_reference(texts, terms)
    for n_blocks in (1, 3, 7):
        ds = rd.from_arrow(tab).repartition(n_blocks)
        got = bm25_scores(ds, terms)
        tabs = [t for t in ray.get(got.to_arrow_refs()) if t.num_rows]
        gd = {
            r["doc_id"]: r["score"]
            for t in tabs
            for r in t.to_pylist()
        }
        assert set(gd) == set(ref)
        for i, s in ref.items():
            assert abs(gd[i] - s) < 1e-9, (n_blocks, i, gd[i], s)


def test_bigram_pmi_known_counts(ray_session):
    """Tiny corpus with hand-computable counts: PMI matches the formula
    from exact integers; sub-min_count grams are absent."""
    import math

    import ray.data as rd

    from patito_ray.functions.tfidf import bigram_pmi

    docs = ["a b a b", "a b c"] * 3  # "a b" x9, "b a" x3, "b c" x3; U=21, B=15
    out = bigram_pmi(
        rd.from_arrow(pa.table({"text": docs})).repartition(2), min_count=4
    )
    tab = out if isinstance(out, pa.Table) else pa.concat_tables(
        list(out.iter_batches(batch_format="pyarrow"))
    )
    rows = {r["gram"]: r for r in tab.to_pylist()}
    assert set(rows) == {"a b"}
    ua, ub = 9, 9  # 'a' occurrences: 2*3+1*3 = 9; 'b': 9; total tokens 21
    exp = math.log2((9 / 15) / ((ua / 21) * (ub / 21)))
    assert abs(rows["a b"]["pmi"] - exp) < 1e-12 and rows["a b"]["cnt"] == 9
