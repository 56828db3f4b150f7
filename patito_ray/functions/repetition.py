"""Repetition-based quality statistics (Gopher-style filters).

Production corpus filters (Gopher, C4, RefinedWeb — all public) drop
documents whose content is dominated by repeated units: duplicate
lines, duplicated words, boiler-plate navigation rows. The primitive
underneath every such rule is the same: per document, how many unit
occurrences are repeats of an earlier occurrence, and how many
characters those repeats cover.

The kernel here computes, per row, for a chosen separator (``"\\n"``
for duplicate-LINE stats, ``" "`` for duplicate-token stats):

- ``n_units``       total unit occurrences,
- ``n_dup_units``   occurrences beyond the first of each distinct unit,
- ``total_chars``   codepoints across all occurrences,
- ``dup_chars``     codepoints across the duplicate occurrences.

Callers derive the published fractions (``n_dup_units / n_units``,
``dup_chars / total_chars``) themselves; the engine emits exact
integer counts so the SQL oracle comparison is bit-exact (fractions
would hash-differ in the last ulp between engines).

A key identity keeps this fully vectorized WITHOUT window functions:
within one document every occurrence of the same unit has the same
length, so duplicates contribute ``(c - 1)`` occurrences and
``(c - 1) * len`` characters for a unit seen ``c`` times — a plain
two-level group-count, done here with Arrow's C++ ``Table.group_by``
over the flattened (row, unit) pairs. No Python per row, no shuffle;
the stage streams per batch.

Unit semantics match DuckDB's ``string_split`` exactly: splitting is
on the LITERAL separator, consecutive separators produce empty units,
and an empty document is one empty unit (n_units == 1). Lengths are
unicode codepoints (Arrow ``utf8_length`` == DuckDB ``len``).
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_COUNT_COLS = ("n_units", "n_dup_units", "total_chars", "dup_chars")


def repetition_counts_arrays(
    text: pa.Array | pa.ChunkedArray, sep: str = " "
) -> dict[str, pa.Array]:
    """Per-row duplicate-unit counts; null text yields null counts."""
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    n = len(text)
    valid = pc.is_valid(text)
    out64 = {c: np.zeros(n, dtype=np.int64) for c in _COUNT_COLS}
    if n:
        lists = pc.split_pattern(pc.fill_null(text, ""), pattern=sep)
        flat = pc.list_flatten(lists)
        per_row = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        row_idx = np.repeat(np.arange(n, dtype=np.int64), per_row)
        unit_len = pc.cast(pc.utf8_length(flat), pa.int64())
        pairs = pa.table({"row": row_idx, "unit": flat, "len": unit_len})
        # (row, unit) group: c occurrences of one distinct unit
        g = pairs.group_by(["row", "unit"]).aggregate(
            [("len", "count"), ("len", "first")]
        )
        rows = g.column("row").to_numpy(zero_copy_only=False)
        c = g.column("len_count").to_numpy(zero_copy_only=False).astype(np.int64)
        length = g.column("len_first").to_numpy(zero_copy_only=False)
        np.add.at(out64["n_units"], rows, c)
        np.add.at(out64["n_dup_units"], rows, c - 1)
        np.add.at(out64["total_chars"], rows, c * length)
        np.add.at(out64["dup_chars"], rows, (c - 1) * length)
    mask = valid.to_numpy(zero_copy_only=False)
    return {
        col: pa.array(vals, type=pa.int64(), mask=~mask)
        for col, vals in out64.items()
    }


def repetition_counts_batch(
    batch: pa.Table, text_col: str = "text", sep: str = " "
) -> pa.Table:
    """Append the four duplicate-unit count columns to a batch."""
    for name, arr in repetition_counts_arrays(
        batch.column(text_col), sep=sep
    ).items():
        batch = batch.append_column(name, arr)
    return batch


def repetition_stats(
    ds: Any, text_col: str = "text", sep: str = " "
) -> Any:
    """Dataset stage: per-document duplicate-unit counts."""
    return ds.map_batches(
        lambda t: repetition_counts_batch(t, text_col=text_col, sep=sep),
        batch_format="pyarrow",
        batch_size=None,
    )


def repetition_filter(
    ds: Any,
    text_col: str = "text",
    sep: str = " ",
    max_dup_unit_frac: float = 0.9,
    max_dup_char_frac: float = 0.9,
) -> Any:
    """Drop rows whose duplicate-unit or duplicate-char fraction
    exceeds the caps (single-unit docs have fraction 0). The published
    Gopher thresholds are per-unit-kind; pass your own."""

    def keep(t: pa.Table) -> pa.Table:
        counts = repetition_counts_arrays(t.column(text_col), sep=sep)
        n = counts["n_units"].to_numpy(zero_copy_only=False).astype(np.float64)
        chars = counts["total_chars"].to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        dup_n = counts["n_dup_units"].to_numpy(zero_copy_only=False)
        dup_c = counts["dup_chars"].to_numpy(zero_copy_only=False)
        with np.errstate(divide="ignore", invalid="ignore"):
            frac_n = np.where(n > 0, dup_n / n, 0.0)
            frac_c = np.where(chars > 0, dup_c / chars, 0.0)
        # null text rows surface as NaN counts -> frac 0.0 -> kept
        # (validation owns nullability, not the quality filter)
        mask = (frac_n <= max_dup_unit_frac) & (frac_c <= max_dup_char_frac)
        return t.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow", batch_size=None)


_TOPG_FIELDS = (
    ("doc_id", pa.int64()),
    ("gram", pa.string()),
    ("cnt", pa.int64()),
    ("chars", pa.int64()),
)


def top_ngram_batch(
    t: pa.Table,
    n: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pa.Table:
    """Per-document most-frequent word ``n``-gram (the other half of
    the Gopher repetition family: "fraction of characters in the most
    common n-gram").

    Tokens are RE2 ``\\S+`` (``tfidf.re2_split_tokens``, the shared
    oracle-exact tokenizer); grams are consecutive tokens joined by a
    single space; the winner per doc is (count desc, gram asc) — a
    total order, so no engine-dependent tie-break. Emits exact
    INTEGER coverage (``chars = cnt * len(gram)``) per the module's
    bit-exact-counts convention; callers divide by their preferred
    denominator. Docs with fewer than ``n`` tokens emit no row
    (matches the SQL ``len(toks) >= n`` guard). Fully vectorized:
    one Arrow slice/join per gram position + one polars group-count;
    no shuffle, no per-row Python.
    """
    import polars as pl

    from patito_ray.functions.tfidf import re2_split_tokens

    if n < 2:
        raise ValueError(f"n must be >= 2, got {n}")
    empty = pa.schema(list(_TOPG_FIELDS)).empty_table()
    if t.num_rows == 0:
        return empty
    ids = pc.cast(t.column(id_col), pa.int64()).combine_chunks()
    flat, parents, _n_rows = re2_split_tokens(t.column(text_col))
    L = len(flat)
    if L < n:
        return empty
    same = parents[n - 1 :] == parents[: L - (n - 1)]
    if not same.any():
        return empty
    pieces = [flat.slice(i, L - (n - 1)) for i in range(n)]
    gram = pc.binary_join_element_wise(*pieces, " ")
    same_arr = pa.array(same)
    gram = gram.filter(same_arr)
    gp = parents[: L - (n - 1)][same]
    top = (
        pl.DataFrame({"p": gp, "gram": pl.from_arrow(gram)})
        .group_by(["p", "gram"])
        .agg(pl.len().cast(pl.Int64).alias("cnt"))
        .sort(["p", "cnt", "gram"], descending=[False, True, False])
        .unique(subset="p", keep="first", maintain_order=True)
        .with_columns(
            (pl.col("cnt") * pl.col("gram").str.len_chars().cast(pl.Int64))
            .alias("chars")
        )
    )
    doc = ids.take(pa.array(top["p"].to_numpy()))
    return pa.table(
        {
            "doc_id": doc,
            "gram": top["gram"].to_arrow(),
            "cnt": top["cnt"].to_arrow(),
            "chars": top["chars"].to_arrow(),
        },
        schema=pa.schema(list(_TOPG_FIELDS)),
    )


def top_ngram_per_doc(
    ds: Any, n: int = 2, id_col: str = "doc_id", text_col: str = "text"
) -> Any:
    """Dataset stage: per-document top word-``n``-gram coverage."""
    return ds.map_batches(
        lambda t: top_ngram_batch(t, n=n, id_col=id_col, text_col=text_col),
        batch_format="pyarrow",
        batch_size=None,
    )
