"""Text-analysis operators for large-scale training-data pipelines:
language-ID, quality scoring, token counting, document fingerprinting.

All kernels are vectorized over Arrow batches (no per-row Python in the
hot loop): tokenization via Arrow's whitespace splitter, per-language
stopword membership via ``pc.is_in`` on the *flattened* token array
with ``list_parent_indices`` scatter-adds back to rows. Designed to run
as ``map_batches`` stages; ``LangId``/``QualityScore`` are callable
classes (actor pools) so the stopword tables and compiled patterns are
built once per actor.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from patito_ray.state.sketches import hash64

# Compact stopword profiles (top function words; public linguistic data).
STOPWORDS: dict[str, set[str]] = {
    "en": {"the", "and", "of", "to", "in", "is", "was", "that", "for", "it",
           "with", "as", "his", "on", "be", "at", "by", "this", "had", "not"},
    "de": {"der", "die", "und", "das", "in", "von", "zu", "den", "mit", "ist",
           "des", "im", "nicht", "ein", "eine", "auf", "als", "auch", "es", "an"},
    "fr": {"le", "la", "de", "et", "les", "des", "en", "un", "du", "une",
           "que", "est", "dans", "qui", "par", "pour", "au", "plus", "pas", "sur"},
    "es": {"de", "la", "que", "el", "en", "y", "los", "del", "se", "las",
           "por", "un", "con", "no", "una", "su", "para", "es", "al", "lo"},
    "it": {"di", "e", "il", "la", "che", "in", "un", "per", "del", "con",
           "non", "una", "le", "si", "dei", "nel", "alla", "della", "da", "lo"},
    "pt": {"de", "a", "o", "que", "e", "do", "da", "em", "um", "para",
           "com", "não", "uma", "os", "no", "se", "na", "por", "mais", "as"},
}


#: hoisted once (round-2 review: quality_counts_batch rebuilt this
#: value-set per batch)
_EN_STOP_ARRAY = pa.array(sorted(STOPWORDS["en"]))


def token_count_array(text: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Whitespace token count per document (count of ``\\S+`` matches)."""
    n = pc.count_substring_regex(text, pattern=r"\S+")
    out = pc.cast(n, pa.int64())
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out


# GPT-2-style pre-tokenizer pattern (RE2-compatible subset: no
# lookahead, so trailing-space merging is approximated). Counts the
# word/number/punct chunks a BPE tokenizer would split on — a much
# closer LLM-token estimate than whitespace splitting.
_BPE_SPLIT_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def bpe_token_count_array(text: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Approximate BPE pre-token count per document (GPT-2-style split
    pattern via Arrow's RE2 — vectorized, no tokenizer model needed)."""
    n = pc.count_substring_regex(text, pattern=_BPE_SPLIT_PATTERN)
    out = pc.cast(n, pa.int64())
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out


def _tokens(text: pa.ChunkedArray | pa.Array) -> tuple[pa.Array, np.ndarray, int]:
    """Lowercased whitespace tokens, flattened, with row indices.

    Arrow's ``utf8_split_whitespace`` emits EMPTY tokens for leading /
    trailing / consecutive whitespace (python ``str.split()`` does
    not); they are masked out here — otherwise an empty document counts
    1 token, language-ID confidence and quality ratios skew, and the
    token-based kernels disagree with their ``\\S+``-based SQL oracles.
    """
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    lower = pc.utf8_lower(text)
    toks = pc.utf8_split_whitespace(lower)
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    keep = pc.fill_null(pc.not_equal(flat, ""), False)
    if not pc.all(keep).as_py():
        keep_np = keep.to_numpy(zero_copy_only=False)
        flat = flat.filter(keep)
        parents = parents[keep_np]
    return flat, parents, len(text)


def _char_ngram_buckets(
    text: pa.ChunkedArray | pa.Array, n: int, n_buckets: int
) -> tuple[np.ndarray, np.ndarray, int]:
    """Hashed byte-``n``-gram features per row, fully vectorized over
    the Arrow string buffer: (row_idx, bucket_idx, n_rows). Lowercased;
    nulls count as empty. Grams never cross document boundaries."""
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    arr = pc.cast(pc.fill_null(pc.utf8_lower(text), ""), pa.large_string())
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    n_rows = len(arr)
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
        arr.offset : arr.offset + n_rows + 1
    ].copy()
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)[
        offsets[0] : offsets[-1]
    ]
    offsets -= offsets[0]
    if len(data) < n:
        return np.empty(0, np.int64), np.empty(0, np.int64), n_rows
    starts = np.arange(len(data) - n + 1, dtype=np.int64)
    rows = np.searchsorted(offsets, starts, side="right") - 1
    valid = starts + n <= offsets[rows + 1]
    starts, rows = starts[valid], rows[valid]
    g = data[starts].astype(np.uint64)
    for j in range(1, n):
        g = (g << np.uint64(8)) | data[starts + j]
    # splitmix64 finalizer spreads the 8n-bit gram id over the buckets
    g = (g ^ (g >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    g = (g ^ (g >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    g ^= g >> np.uint64(31)
    buckets = (g % np.uint64(n_buckets)).astype(np.int64)
    return rows, buckets, n_rows


class NgramLangModel:
    """Hashed byte-n-gram multinomial Naive Bayes language profile
    (Cavnar & Trenkle 1994 n-gram categorization + standard NB; public
    techniques). State is tiny (#langs x n_buckets float32, <1 MB) and
    the training counts are a commutative monoid, so the model trains
    with per-batch partials merged by '+' — the same tree-merge shape
    as every other sketch here."""

    __slots__ = ("langs", "n", "n_buckets", "log_prob", "log_prior")

    def __init__(
        self,
        langs: list[str],
        counts: np.ndarray,
        doc_counts: np.ndarray,
        n: int,
        n_buckets: int,
        alpha: float = 1.0,
    ) -> None:
        self.langs = langs
        self.n = n
        self.n_buckets = n_buckets
        smoothed = counts.astype(np.float64) + alpha
        self.log_prob = np.log(
            smoothed / smoothed.sum(axis=1, keepdims=True)
        ).astype(np.float32)
        total_docs = max(1, int(doc_counts.sum()))
        self.log_prior = np.log(
            np.maximum(doc_counts, 1e-9) / total_docs
        ).astype(np.float32)


def train_lang_ngram_model(
    data: Any,
    labels: Any = None,
    *,
    text_col: str = "text",
    lang_col: str = "lang",
    n: int = 3,
    n_buckets: int = 1 << 15,
    alpha: float = 1.0,
) -> NgramLangModel:
    """Train an :class:`NgramLangModel` from labeled text.

    ``data`` is either a list of texts (with ``labels`` the parallel
    language list) or a Ray Dataset with ``text_col``/``lang_col`` —
    the Dataset path streams per-batch (lang x bucket) count partials
    (dense, <2 MB) and merges them by summation on the driver, so the
    corpus is never materialized.
    """
    import pickle

    lang_ids: dict[str, int] = {}
    count_blocks: list[tuple[list[str], np.ndarray, np.ndarray]] = []

    def count_table(t: pa.Table) -> tuple[list[str], np.ndarray, np.ndarray]:
        langs_col = t.column(lang_col)
        if isinstance(langs_col, pa.ChunkedArray):
            langs_col = langs_col.combine_chunks()
        uniq = [v for v in pc.unique(langs_col).to_pylist() if v is not None]
        order = {v: i for i, v in enumerate(uniq)}
        lang_idx = np.array(
            [order.get(v, -1) for v in langs_col.to_pylist()], dtype=np.int64
        )
        rows, buckets, n_rows = _char_ngram_buckets(
            t.column(text_col), n, n_buckets
        )
        counts = np.zeros((len(uniq), n_buckets), dtype=np.int64)
        keep = lang_idx[rows] >= 0
        np.add.at(counts, (lang_idx[rows[keep]], buckets[keep]), 1)
        docs = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(docs, lang_idx[lang_idx >= 0], 1)
        return uniq, counts, docs

    if labels is not None:
        t = pa.table({text_col: pa.array(list(data)), lang_col: pa.array(list(labels))})
        count_blocks.append(count_table(t))
    else:

        def partial(t: pa.Table) -> pa.Table:
            return pa.table({"blob": [pickle.dumps(count_table(t))]})

        for b in data.map_batches(
            partial, batch_format="pyarrow", batch_size=None
        ).iter_batches(batch_format="pyarrow"):
            for blob in b.column("blob").to_pylist():
                count_blocks.append(pickle.loads(blob))

    for uniq, _c, _d in count_blocks:
        for lang in uniq:
            lang_ids.setdefault(lang, len(lang_ids))
    # alphabetical: model identity must not depend on block arrival order
    langs = sorted(lang_ids)
    lang_ids = {lang: i for i, lang in enumerate(langs)}
    counts = np.zeros((len(langs), n_buckets), dtype=np.int64)
    docs = np.zeros(len(langs), dtype=np.int64)
    for uniq, c, d in count_blocks:
        for i, lang in enumerate(uniq):
            counts[lang_ids[lang]] += c[i]
            docs[lang_ids[lang]] += d[i]
    return NgramLangModel(langs, counts, docs, n, n_buckets, alpha)


class LangId:
    """Language identification: stopword-profile scoring by default, or
    multinomial n-gram Naive Bayes when a trained ``model``
    (:func:`train_lang_ngram_model`) is supplied.

    Stopword path, per batch: flatten tokens once, test membership
    against each language's stopword set (one vectorized ``is_in`` per
    language), scatter-add hits per row, argmax. NB path: hashed byte
    trigram features, one ``bincount`` per language. Both emit
    ``lang_pred`` plus ``lang_confidence``.
    """

    def __init__(
        self,
        languages: list[str] | None = None,
        model: NgramLangModel | None = None,
    ) -> None:
        self.model = model
        self.languages = languages or list(STOPWORDS)
        self.value_sets = {
            lang: pa.array(sorted(STOPWORDS[lang])) for lang in self.languages
        }

    def _call_ngram(self, batch: pa.Table) -> pa.Table:
        m = self.model
        rows, buckets, n_rows = _char_ngram_buckets(
            batch.column("text"), m.n, m.n_buckets
        )
        scores = np.tile(
            m.log_prior.astype(np.float64)[:, None], (1, n_rows)
        )
        for li in range(len(m.langs)):
            scores[li] += np.bincount(
                rows,
                weights=m.log_prob[li][buckets].astype(np.float64),
                minlength=n_rows,
            )
        best = scores.argmax(axis=0)
        # posterior of the winning language (softmax, numerically stable)
        shifted = scores - scores.max(axis=0, keepdims=True)
        post = np.exp(shifted)
        conf = post[best, np.arange(n_rows)] / post.sum(axis=0)
        n_grams = np.bincount(rows, minlength=n_rows)
        pred = np.array(m.langs, dtype=object)[best]
        pred[n_grams == 0] = None
        conf = np.where(n_grams == 0, 0.0, conf)
        return batch.append_column(
            "lang_pred", pa.array(pred.tolist(), type=pa.string())
        ).append_column("lang_confidence", pa.array(conf, type=pa.float64()))

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.model is not None:
            return self._call_ngram(batch)
        flat, parents, n_rows = _tokens(batch.column("text"))
        n_tokens = np.zeros(n_rows, dtype=np.int64)
        np.add.at(n_tokens, parents, 1)
        scores = np.zeros((len(self.languages), n_rows), dtype=np.int64)
        for li, lang in enumerate(self.languages):
            hits = pc.is_in(flat, value_set=self.value_sets[lang])
            hit_np = hits.to_numpy(zero_copy_only=False).astype(np.int64)
            np.add.at(scores[li], parents, hit_np)
        best = scores.argmax(axis=0)
        best_hits = scores[best, np.arange(n_rows)]
        conf = np.where(n_tokens > 0, best_hits / np.maximum(n_tokens, 1), 0.0)
        pred = np.array(self.languages, dtype=object)[best]
        pred[n_tokens == 0] = None
        return batch.append_column(
            "lang_pred", pa.array(pred.tolist(), type=pa.string())
        ).append_column("lang_confidence", pa.array(conf, type=pa.float64()))


class QualityScore:
    """Heuristic document-quality scoring (length / punctuation /
    stopword-density / mean-word-length features combined into [0,1])."""

    def __init__(self) -> None:
        self.en_stop = _EN_STOP_ARRAY

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.float64)
        n_alpha = pc.count_substring_regex(text, pattern=r"[A-Za-z]").to_numpy(
            zero_copy_only=False
        ).astype(np.float64)
        n_punct = pc.count_substring_regex(text, pattern=r"[^\w\s]").to_numpy(
            zero_copy_only=False
        ).astype(np.float64)
        flat, parents, n_rows = _tokens(text)
        n_tokens = np.zeros(n_rows, dtype=np.float64)
        np.add.at(n_tokens, parents, 1.0)
        stop_hits = np.zeros(n_rows, dtype=np.float64)
        hits = pc.is_in(flat, value_set=self.en_stop).to_numpy(zero_copy_only=False)
        np.add.at(stop_hits, parents, hits.astype(np.float64))

        safe_chars = np.maximum(n_chars, 1.0)
        safe_tokens = np.maximum(n_tokens, 1.0)
        alpha_ratio = n_alpha / safe_chars
        punct_ratio = n_punct / safe_chars
        stop_ratio = stop_hits / safe_tokens
        mean_word_len = n_chars / safe_tokens
        # smooth, monotone feature combination: each term in [0,1]
        length_term = np.clip(np.log1p(n_chars) / np.log(5000.0), 0, 1)
        word_len_term = np.exp(-0.5 * ((mean_word_len - 5.0) / 3.0) ** 2)
        score = (
            0.3 * length_term
            + 0.25 * alpha_ratio
            + 0.2 * np.clip(stop_ratio * 3, 0, 1)
            + 0.15 * word_len_term
            + 0.1 * (1 - np.clip(punct_ratio * 4, 0, 1))
        )
        out = batch
        for name, arr in (
            ("alpha_ratio", alpha_ratio),
            ("punct_ratio", punct_ratio),
            ("stopword_ratio", stop_ratio),
            ("quality_score", score),
        ):
            out = out.append_column(name, pa.array(arr, type=pa.float64()))
        return out


def quality_counts_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Exact integer quality features per document — the countable core
    of ``QualityScore`` (char / alpha / punct / token / stopword-hit
    counts), emitted as int64 so a SQL oracle can compare them without
    float-rounding hazards. All vectorized RE2 / token kernels."""
    text = batch.column(text_col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    n_alpha = pc.cast(pc.count_substring_regex(text, pattern=r"[A-Za-z]"), pa.int64())
    n_punct = pc.cast(pc.count_substring_regex(text, pattern=r"[^\w\s]"), pa.int64())
    flat, parents, n_rows = _tokens(text)
    n_tokens = np.zeros(n_rows, dtype=np.int64)
    np.add.at(n_tokens, parents, 1)
    stop_hits = np.zeros(n_rows, dtype=np.int64)
    hits = pc.is_in(flat, value_set=_EN_STOP_ARRAY).to_numpy(zero_copy_only=False)
    np.add.at(stop_hits, parents, hits.astype(np.int64))
    out = batch
    out = out.append_column("n_chars", n_chars)
    out = out.append_column("n_alpha", n_alpha)
    out = out.append_column("n_punct", n_punct)
    out = out.append_column("n_tokens", pa.array(n_tokens, type=pa.int64()))
    out = out.append_column("stop_hits", pa.array(stop_hits, type=pa.int64()))
    return out


def winnow_fingerprints_batch(
    batch: pa.Table,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    w: int = 4,
) -> pa.Table:
    """Winnowing fingerprints (the MOSS scheme): token k-gram rolling
    hashes per document, then the minimum hash of every w-length window
    — any shared token run of length >= w+k-1 between two documents is
    GUARANTEED to yield a shared fingerprint. Output: one
    (id, fingerprint) row per distinct selected hash per doc.

    Fully vectorized across the batch: rolling k-gram hashes come from
    the flattened-token machinery, the sliding-window min runs on a
    strided view of the flat hash array, and windows crossing document
    boundaries are masked — no per-document Python.
    """
    from patito_ray.functions.dedup import _shingle_hashes

    text = batch.column(text_col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    hashes, rows, n_rows = _shingle_hashes(text, k)
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    if len(hashes) == 0:
        return pa.table(
            {
                id_col: pa.array([], type=pa.int64()),
                "fingerprint": pa.array([], type=pa.int64()),
            }
        )
    # rows is sorted for the rolling part; the short-doc fallback
    # appends out-of-order rows — re-sort once
    order = np.argsort(rows, kind="stable")
    rows, hashes = rows[order], hashes[order]
    # windowed minima (empty when the whole batch has < w grams — the
    # per-doc result must NOT depend on batch composition, so the short
    # branch below handles every doc with < w grams identically)
    if len(hashes) >= w:
        win = np.lib.stride_tricks.sliding_window_view(hashes, w)
        mins = win.min(axis=1)
        same_doc = rows[: len(mins)] == rows[w - 1 :]
        sel_rows = rows[: len(mins)][same_doc]
        sel_hash = mins[same_doc]
    else:
        sel_rows = np.empty(0, dtype=rows.dtype)
        sel_hash = np.empty(0, dtype=hashes.dtype)
    # docs with fewer than w k-grams still contribute: their global min
    # (the whole sequence is one short window)
    n_grams = np.bincount(rows, minlength=n_rows)
    short = np.nonzero((n_grams > 0) & (n_grams < w))[0]
    if len(short):
        present, starts = np.unique(rows, return_index=True)
        short_min = np.minimum.reduceat(hashes, starts)
        pick = np.isin(present, short)
        sel_rows = np.concatenate([sel_rows, present[pick]])
        sel_hash = np.concatenate([sel_hash, short_min[pick]])
    # dedupe (doc, hash) pairs
    pair = np.stack([sel_rows.astype(np.int64), sel_hash.view(np.int64)], axis=1)
    uniq = np.unique(pair, axis=0)
    return pa.table(
        {
            id_col: pa.array(ids[uniq[:, 0]], type=pa.int64()),
            "fingerprint": pa.array(uniq[:, 1], type=pa.int64()),
        }
    )


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Deterministic 64-bit document fingerprint over the normalized
    text (lowercase, collapsed whitespace) — exact-dup detection key."""
    text = batch.column(text_col)
    norm = pc.replace_substring_regex(
        pc.utf8_lower(text), pattern=r"\s+", replacement=" "
    )
    norm = pc.utf8_trim_whitespace(norm)
    fp = hash64(norm).view(np.int64)
    return batch.append_column("fingerprint", pa.array(fp, type=pa.int64()))


def add_token_counts(batch: pa.Table, text_col: str = "text") -> pa.Table:
    return batch.append_column("n_tokens", token_count_array(batch.column(text_col)))


def lang_id_dataset(
    ds: Any, concurrency: int | None = None, model: NgramLangModel | None = None
) -> Any:
    """Language-ID stage. Default is STATELESS tasks (the pickled
    callable carries only the small stopword value-sets — no actor-pool
    spin-up, which costs ~2 s for a sub-second workload); pass
    ``concurrency`` for an actor pool when shipping a large trained
    n-gram ``model`` so it parses once per actor instead of per task."""
    if concurrency:
        return ds.map_batches(
            LangId,
            fn_constructor_kwargs={"model": model},
            batch_format="pyarrow",
            batch_size=4096,
            concurrency=concurrency,
        )
    return ds.map_batches(
        LangId(model=model),
        batch_format="pyarrow",
        batch_size=4096,
    )


def quality_dataset(ds: Any, concurrency: int | None = None) -> Any:
    """Quality-score stage; stateless tasks by default (the scorer
    holds only compiled constants), actor pool when ``concurrency`` is
    set."""
    if concurrency:
        return ds.map_batches(
            QualityScore,
            batch_format="pyarrow",
            batch_size=4096,
            concurrency=concurrency,
        )
    return ds.map_batches(QualityScore(), batch_format="pyarrow", batch_size=4096)


def normalize_text_array(
    text: pa.ChunkedArray | pa.Array, form: "str | None" = None
) -> pa.Array:
    """Canonical text form for dedup/matching: lowercase, collapse RE2
    whitespace runs (``[\\t\\n\\f\\r ]+`` — ASCII-only, matching every
    RE2-based engine; unicode spaces like NBSP are content, not
    separators) to one space, trim edge spaces.

    ``form`` ('NFC'/'NFKC'/...) additionally applies true Unicode
    normalization BEFORE lowering. pyarrow's utf8_normalize emits
    decomposed output even for NFC (verified on 16.1), so this path
    uses Python's unicodedata — but only on the non-ASCII minority of
    rows (vectorized ``string_is_ascii`` mask; ASCII text, the bulk of
    web corpora, never leaves Arrow). The default form=None path is
    fully vectorized and bit-exact against DuckDB
    ``trim(regexp_replace(lower(x), ...))`` (the `normalize_text`
    oracle; known engine divergence: DuckDB lower() uses simple case
    mapping for U+0130 İ, utf8proc the full one — avoid İ in exact
    comparisons).
    """
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    if form is not None:
        import unicodedata

        ascii_mask = pc.fill_null(pc.string_is_ascii(text), True)
        if not pc.all(ascii_mask).as_py():
            idx = np.flatnonzero(
                np.logical_not(ascii_mask.to_numpy(zero_copy_only=False))
            )
            vals = text.take(pa.array(idx, type=pa.int64())).to_pylist()
            fixed = pa.array(
                [unicodedata.normalize(form, v) for v in vals], type=pa.string()
            )
            np_ids = np.full(len(text), -1, dtype=np.int64)
            np_ids[idx] = np.arange(idx.size)
            take_ids = pa.array(
                np.where(np_ids >= 0, np_ids, 0), type=pa.int64()
            )
            text = pc.if_else(ascii_mask, text, fixed.take(take_ids))
    x = pc.utf8_lower(text)
    x = pc.replace_substring_regex(x, pattern="[\t\n\f\r ]+", replacement=" ")
    return pc.utf8_trim(x, characters=" ")


def normalize_text_dataset(
    ds: Any, text_col: str = "text", out_col: str = "norm_text",
    form: "str | None" = None,
) -> Any:
    """Dataset stage: append the normalized text column (one vectorized
    kernel per batch, no shuffle, no state)."""
    return ds.map_batches(
        lambda t: t.append_column(
            out_col, normalize_text_array(t.column(text_col), form=form)
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
