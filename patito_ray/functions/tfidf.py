"""Corpus term statistics and TF-IDF retrieval over a text column.

The classic IR pair every webtext curation stack needs:

- ``term_counts`` / ``top_terms``: exact corpus-wide term frequencies
  via the partial-aggregation pattern — each batch emits its own
  (token, count) table (``pyarrow.compute.value_counts`` on the
  flattened RE2-token array, no Python loop), the tiny remainder merges
  through :func:`patito_ray.stages.agg.merge_partial_sums` (driver
  polars below 256 MB, Ray groupby beyond). Shuffle volume is
  O(vocabulary x blocks), never O(corpus).
- ``tfidf_topk``: score documents against a small query-term set with
  smoothed TF-IDF (``idf = ln((N+1)/(df+1)) + 1``, the scikit-learn
  ``smooth_idf`` formula — public technique) and return the global
  top-k. Two streaming passes: a document-frequency pass restricted to
  the query terms (partial rows are |terms| per batch), then a scoring
  pass where the |terms|-sized idf table rides the task closure (a few
  floats — broadcasting via the object store would cost more than it
  saves). The global top-k prunes per batch to k rows before the
  driver merge, so the driver sees O(k x blocks) rows.

Tokenization is RE2-exact (``\\s+`` split via Arrow, empty boundary
tokens masked), byte-identical to DuckDB ``regexp_extract_all(text,
'\\S+')`` — verified for exotic whitespace (\\x0b, NBSP) in tests.

Reference scope note: JakobGM/patito has no IR surface; this extends
the engine for LLM-corpus analytics (SURVEY.md §2d).
"""

from __future__ import annotations

import math
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from patito_ray.stages.agg import merge_partial_sums


def re2_split_tokens(
    text: pa.ChunkedArray | pa.Array,
) -> tuple[pa.Array, np.ndarray, int]:
    """``\\S+`` tokens (original case), flattened with row indices.

    RE2 semantics exactly: splits on ASCII ``\\s+`` and masks the empty
    tokens Arrow emits at leading/trailing whitespace, so the result
    per row equals DuckDB ``regexp_extract_all(text, '\\S+')``. Null
    rows contribute no tokens.
    """
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    toks = pc.split_pattern_regex(text, pattern=r"\s+")
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    keep = pc.fill_null(pc.not_equal(flat, ""), False)
    if not pc.all(keep).as_py():
        keep_np = keep.to_numpy(zero_copy_only=False)
        flat = flat.filter(keep)
        parents = parents[keep_np]
    return flat, parents, len(text)


def term_counts(ds: Any, text_col: str = "text") -> Any:
    """Exact corpus-wide (tok, cnt) term frequencies.

    Returns a local ``pa.Table`` when the merged vocabulary fits the
    driver budget, else a lazy Ray ``Dataset`` (same contract as
    ``merge_partial_sums``).
    """

    def partial(t: pa.Table) -> pa.Table:
        flat, _, _ = re2_split_tokens(t.column(text_col))
        if len(flat) == 0:
            return pa.table({"tok": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())})
        vc = pc.value_counts(flat)
        return pa.table(
            {"tok": vc.field("values"), "cnt": pc.cast(vc.field("counts"), pa.int64())}
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    return merge_partial_sums(partials, ["tok"], ["cnt"])


def _local_topk(t: pa.Table, k: int, value: str, tie: str) -> pa.Table:
    idx = pc.sort_indices(
        t, sort_keys=[(value, "descending"), (tie, "ascending")]
    )[:k]
    return t.take(idx)


def _global_topk(
    result: Any, k: int, value: str, tie: str, empty_schema: pa.Schema | None = None
) -> pa.Table:
    """Global top-k over a Table-or-Dataset: per-block prune to k rows,
    then one driver sort over the O(k x blocks) remainder.

    ``empty_schema`` types the 0-row outcome (``Dataset.schema()`` is
    None once every block is empty)."""
    if isinstance(result, pa.Table):
        return _local_topk(result, k, value, tie)
    pruned = result.map_batches(
        lambda t: _local_topk(t, k, value, tie),
        batch_format="pyarrow",
        batch_size=None,
    )
    from patito_ray.stages.agg import collect_table

    if empty_schema is None:
        empty_schema = pa.schema([(value, pa.float64()), (tie, pa.int64())])
    tab = collect_table(pruned, empty_schema)
    return _local_topk(tab, k, value, tie) if tab.num_rows else tab


def top_terms(ds: Any, k: int = 20, text_col: str = "text") -> pa.Table:
    """The k most frequent terms (count desc, token asc on ties)."""
    return _global_topk(
        term_counts(ds, text_col),
        k,
        "cnt",
        "tok",
        empty_schema=pa.schema([("tok", pa.string()), ("cnt", pa.int64())]),
    )


def doc_frequencies(ds: Any, terms: list[str], text_col: str = "text") -> dict[str, int]:
    """Document frequency of each query term (documents containing it
    at least once). Partial rows are at most ``len(terms)`` per batch."""
    term_arr = pa.array(sorted(set(terms)), pa.string())

    def partial(t: pa.Table) -> pa.Table:
        flat, parents, _ = re2_split_tokens(t.column(text_col))
        hit = pc.is_in(flat, value_set=term_arr).to_numpy(zero_copy_only=False)
        if not hit.any():
            return pa.table({"term": pa.array([], pa.string()), "df": pa.array([], pa.int64())})
        sub = flat.filter(pa.array(hit))
        sub_parents = parents[hit]
        # unique (doc, term) pairs within the batch -> df contribution
        codes = pc.index_in(sub, value_set=term_arr).to_numpy(zero_copy_only=False)
        pair = sub_parents.astype(np.int64) * len(term_arr) + codes
        uniq = np.unique(pair)
        term_idx = (uniq % len(term_arr)).astype(np.int64)
        counts = np.bincount(term_idx, minlength=len(term_arr)).astype(np.int64)
        return pa.table({"term": term_arr, "df": pa.array(counts, pa.int64())})

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    merged = merge_partial_sums(partials, ["term"], ["df"])
    if not isinstance(merged, pa.Table):
        merged = pa.concat_tables(
            [t for t in _iter_tables(merged)] or [pa.table({"term": pa.array([], pa.string()), "df": pa.array([], pa.int64())})]
        )
    out = {t: 0 for t in set(terms)}
    for term, df in zip(merged["term"].to_pylist(), merged["df"].to_pylist()):
        out[term] = df
    return out


def _iter_tables(ds: Any):
    import ray

    for ref in ds.materialize().to_arrow_refs():
        t = ray.get(ref)
        if t.num_rows:
            yield t


def smooth_idf(n_docs: int, df: int) -> float:
    """scikit-learn ``smooth_idf``: ln((N+1)/(df+1)) + 1 — never zero,
    never divides by zero on unseen terms."""
    return math.log((n_docs + 1.0) / (df + 1.0)) + 1.0


def tfidf_scores(
    ds: Any,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    n_docs: int | None = None,
) -> Any:
    """Per-document smoothed TF-IDF score against ``terms`` (documents
    with score 0 are dropped). Lazy Dataset of (id_col, score)."""
    if n_docs is None:
        n_docs = ds.count()
    dfs = doc_frequencies(ds, terms, text_col)
    uniq_terms = sorted(dfs)
    term_arr = pa.array(uniq_terms, pa.string())
    # |terms| floats: rides the serialized task closure; an object-store
    # broadcast would cost more than it moves.
    idf = np.array([smooth_idf(n_docs, dfs[t]) for t in uniq_terms], dtype=np.float64)

    def score(t: pa.Table) -> pa.Table:
        flat, parents, n_rows = re2_split_tokens(t.column(text_col))
        codes = pc.index_in(flat, value_set=term_arr)
        hit = pc.is_valid(codes).to_numpy(zero_copy_only=False)
        empty = pa.table(
            {id_col: pa.array([], t.schema.field(id_col).type), "score": pa.array([], pa.float64())}
        )
        if len(flat) == 0 or not hit.any():
            return empty
        code_np = codes.to_numpy(zero_copy_only=False)[hit].astype(np.int64)
        par = parents[hit].astype(np.int64)
        # exact integer tf per (doc, term), then sum tf*idf in term order
        pair = par * len(uniq_terms) + code_np
        uniq, tf = np.unique(pair, return_counts=True)
        doc_idx = uniq // len(uniq_terms)
        term_idx = uniq % len(uniq_terms)
        scores = np.zeros(n_rows, dtype=np.float64)
        np.add.at(scores, doc_idx, tf.astype(np.float64) * idf[term_idx])
        mask = scores > 0
        return pa.table(
            {
                id_col: t.column(id_col).combine_chunks().filter(pa.array(mask)),
                "score": pa.array(scores[mask], pa.float64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", batch_size=None)


def tfidf_topk(
    ds: Any,
    terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pa.Table:
    """Global top-k documents by TF-IDF score (score desc, id asc)."""
    scored = tfidf_scores(ds, terms, id_col=id_col, text_col=text_col)
    id_type = ds.schema().base_schema.field(id_col).type
    return _global_topk(
        scored,
        k,
        "score",
        id_col,
        empty_schema=pa.schema([(id_col, id_type), ("score", pa.float64())]),
    )


def ngram_with_parents(
    text: "pa.ChunkedArray | pa.Array", n: int
) -> tuple[pa.Array, np.ndarray]:
    """Flat space-joined token n-grams (sliding, stride 1, never
    crossing a document boundary) PLUS the originating row index per
    gram — the attribution needed by per-document operators
    (decontamination overlap counts). Fully vectorized: one tokenize,
    one window-validity compare on the parent indices, one gather +
    binary_join."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    empty = pa.array([], type=pa.string()), np.array([], dtype=np.int64)
    flat, parents, _ = re2_split_tokens(text)
    if len(flat) < n:
        return empty
    if n == 1:
        return flat, parents.astype(np.int64)
    valid = parents[: -(n - 1)] == parents[n - 1 :]
    starts = np.flatnonzero(valid)
    if starts.size == 0:
        return empty
    gather = (starts[:, None] + np.arange(n)).ravel()
    vals = flat.take(pa.array(gather, type=pa.int64()))
    offsets = np.arange(starts.size + 1, dtype=np.int64) * n
    la = pa.LargeListArray.from_arrays(pa.array(offsets), vals)
    return pc.binary_join(la, " "), parents[starts].astype(np.int64)


def ngram_array(text: "pa.ChunkedArray | pa.Array", n: int) -> pa.Array:
    """Flat n-grams without row attribution — the corpus-statistics
    kernel (pair with value_counts per batch)."""
    return ngram_with_parents(text, n)[0]


def ngram_counts(ds: Any, n: int, text_col: str = "text") -> Any:
    """Exact corpus-wide (gram, cnt) n-gram frequencies — the LM /
    contamination statistics pass. Same adaptive contract as
    ``term_counts``: a local Table under the driver budget, else a lazy
    Dataset of merged partials."""

    def partial(t: pa.Table) -> pa.Table:
        grams = ngram_array(t.column(text_col), n)
        if len(grams) == 0:
            return pa.table(
                {"gram": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
            )
        vc = pc.value_counts(grams)
        return pa.table(
            {"gram": vc.field("values"), "cnt": pc.cast(vc.field("counts"), pa.int64())}
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    return merge_partial_sums(partials, ["gram"], ["cnt"])


def top_ngrams(ds: Any, n: int, k: int = 50, text_col: str = "text") -> pa.Table:
    """The k most frequent n-grams (count desc, gram asc on ties)."""
    return _global_topk(
        ngram_counts(ds, n, text_col),
        k,
        "cnt",
        "gram",
        empty_schema=pa.schema([("gram", pa.string()), ("cnt", pa.int64())]),
    )


_BM25_STATS_SENTINEL = "\x00__bm25_stats__"


def bm25_stats(ds: Any, terms: list[str], text_col: str = "text") -> tuple[int, int, dict[str, int]]:
    """ONE streaming pass: (docs with non-null text, total token count,
    df per query term). The corpus-level scalars ride a sentinel term
    row through the same partial-sum merge as the dfs."""
    if _BM25_STATS_SENTINEL in terms:
        raise ValueError("the BM25 stats sentinel is reserved and cannot be a query term")
    term_arr = pa.array(sorted(set(terms)), pa.string())
    m = len(term_arr)

    def partial(t: pa.Table) -> pa.Table:
        text = t.column(text_col)
        flat, parents, _ = re2_split_tokens(text)
        hit = pc.is_in(flat, value_set=term_arr).to_numpy(zero_copy_only=False)
        if hit.any():
            sub = flat.filter(pa.array(hit))
            codes = pc.index_in(sub, value_set=term_arr).to_numpy(zero_copy_only=False)
            pair = parents[hit].astype(np.int64) * m + codes
            uniq = np.unique(pair)
            dfc = np.bincount((uniq % m).astype(np.int64), minlength=m).astype(np.int64)
        else:
            dfc = np.zeros(m, np.int64)
        return pa.table(
            {
                "term": pa.concat_arrays(
                    [term_arr, pa.array([_BM25_STATS_SENTINEL], pa.string())]
                ),
                "df": pa.array(np.r_[dfc, 0], pa.int64()),
                "n_docs": pa.array([0] * m + [len(text) - text.null_count], pa.int64()),
                "total_len": pa.array([0] * m + [len(flat)], pa.int64()),
            }
        )

    from patito_ray.stages.agg import merge_partial_sums

    merged = merge_partial_sums(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["term"],
        ["df", "n_docs", "total_len"],
    )
    if not isinstance(merged, pa.Table):
        merged = pa.concat_tables(list(_iter_tables(merged)))
    n_docs = total = 0
    dfs = {t: 0 for t in set(terms)}
    for row in merged.to_pylist():
        if row["term"] == _BM25_STATS_SENTINEL:
            n_docs, total = row["n_docs"], row["total_len"]
        else:
            dfs[row["term"]] = row["df"]
    return n_docs, total, dfs


def bm25_scores(
    ds: Any,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Any:
    """Per-document BM25 (Lucene idf variant: ln((N-df+0.5)/(df+0.5)+1),
    always >= 0) against ``terms``; zero-score documents are dropped.
    Two streaming passes: the combined stats pass above, then one
    vectorized scoring map_batches (exact integer tf per (doc, term),
    per-doc length from a bincount over token parent indices — no
    Python per row). Lazy Dataset of (id_col, score)."""
    n_docs, total_len, dfs = bm25_stats(ds, terms, text_col)
    uniq_terms = sorted(dfs)
    m = len(uniq_terms)
    term_arr = pa.array(uniq_terms, pa.string())
    avgdl = total_len / n_docs if n_docs else 1.0
    df_vec = np.array([dfs[t] for t in uniq_terms], dtype=np.float64)
    idf = np.log((n_docs - df_vec + 0.5) / (df_vec + 0.5) + 1.0)

    def score(t: pa.Table) -> pa.Table:
        flat, parents, n_rows = re2_split_tokens(t.column(text_col))
        empty = pa.table(
            {
                id_col: pa.array([], t.schema.field(id_col).type),
                "score": pa.array([], pa.float64()),
            }
        )
        if len(flat) == 0:
            return empty
        par64 = parents.astype(np.int64)
        dl = np.bincount(par64, minlength=n_rows).astype(np.float64)
        codes = pc.index_in(flat, value_set=term_arr)
        hit = pc.is_valid(codes).to_numpy(zero_copy_only=False)
        if not hit.any():
            return empty
        code_np = codes.to_numpy(zero_copy_only=False)[hit].astype(np.int64)
        pair = par64[hit] * m + code_np
        uniq, tf = np.unique(pair, return_counts=True)
        doc_idx = uniq // m
        term_idx = uniq % m
        tf = tf.astype(np.float64)
        denom = tf + k1 * (1.0 - b + b * dl[doc_idx] / avgdl)
        contrib = idf[term_idx] * tf * (k1 + 1.0) / denom
        scores = np.zeros(n_rows, dtype=np.float64)
        np.add.at(scores, doc_idx, contrib)
        mask = scores > 0
        return pa.table(
            {
                id_col: t.column(id_col).combine_chunks().filter(pa.array(mask)),
                "score": pa.array(scores[mask], pa.float64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", batch_size=None)


def bigram_pmi(ds: Any, text_col: str = "text", min_count: int = 5) -> Any:
    """Collocation extraction: every adjacent token bigram occurring
    >= ``min_count`` times, scored by pointwise mutual information
    PMI = log2( (c_xy / B) / ((u_x / U) * (u_y / U)) ) over exact corpus
    counts (B / U = total bigram / unigram occurrences). High-PMI pairs
    are multiword expressions ("new york"); near-zero / negative are
    chance co-occurrences — the standard corpus-linguistics signal.

    Scale shape: the two count passes are ``ngram_counts`` streams
    (adaptive partial-sum merge). The UNIGRAM vocabulary is collected
    and broadcast once (Heaps' law keeps it sublinear in the corpus —
    the same justification as the classifier's vocabulary); the BIGRAM
    side — the big one — stays a Dataset, scored per batch against the
    broadcast lookup. Returns a Dataset[gram, cnt, pmi(double)] on the
    distributed path, a pa.Table on the driver-merge path; the float
    expression evaluates in one fixed order so both engines agree to
    the last ulp before rounding."""
    import ray

    from patito_ray.stages.agg import collect_table

    bi = ngram_counts(ds, 2, text_col)
    uni = ngram_counts(ds, 1, text_col)
    uni_tab = (
        uni
        if isinstance(uni, pa.Table)
        else collect_table(
            uni, empty_schema=pa.schema([("gram", pa.string()), ("cnt", pa.int64())])
        )
    )
    U = int(pc.sum(uni_tab.column("cnt")).as_py() or 0)
    uni_words = uni_tab.column("gram").combine_chunks()
    uni_counts = uni_tab.column("cnt").to_numpy(zero_copy_only=False).astype(np.int64)

    if isinstance(bi, pa.Table):
        B = int(pc.sum(bi.column("cnt")).as_py() or 0)
    else:
        from ray.data.aggregate import Sum

        bi = bi.materialize()
        agg = bi.aggregate(Sum("cnt"))
        B = int(agg["sum(cnt)"] or 0)
    if B == 0 or U == 0:
        return pa.schema(
            [("gram", pa.string()), ("cnt", pa.int64()), ("pmi", pa.float64())]
        ).empty_table()
    ref = ray.put((uni_words, uni_counts))

    def score(t: pa.Table) -> pa.Table:
        words, counts = ray.get(ref)
        keep = pc.greater_equal(t.column("cnt"), min_count)
        t = t.filter(keep)
        if t.num_rows == 0:
            return pa.schema(
                [("gram", pa.string()), ("cnt", pa.int64()), ("pmi", pa.float64())]
            ).empty_table()
        gram = t.column("gram").combine_chunks()
        w1 = pc.split_pattern(gram, " ")
        if isinstance(w1, pa.ChunkedArray):
            w1 = w1.combine_chunks()
        first = pc.list_element(w1, 0)
        second = pc.list_element(w1, 1)
        ux = counts[pc.index_in(first, value_set=words).to_numpy(zero_copy_only=False)]
        uy = counts[pc.index_in(second, value_set=words).to_numpy(zero_copy_only=False)]
        cnt = t.column("cnt").to_numpy(zero_copy_only=False).astype(np.float64)
        pmi = np.log2((cnt / B) / ((ux / U) * (uy / U)))
        return pa.table(
            {
                "gram": gram,
                "cnt": pc.cast(t.column("cnt"), pa.int64()),
                "pmi": pa.array(pmi, type=pa.float64()),
            }
        )

    if isinstance(bi, pa.Table):
        return score(bi)
    return bi.map_batches(score, batch_format="pyarrow", batch_size=None)
