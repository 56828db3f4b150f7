"""Flagship pipeline: full validation of the Common-Crawl-style
web-page table (BASELINE.json input_hint / north rule).

Model: ``url:string unique + ^https?:// regex``, ``warc_ts`` bounded
timestamp, ``html`` nullable binary, ``text`` non-null string, ``lang``
allowed-value set — FIXTURES.md F0. The pipeline additionally enforces
the per-row invariant "byte-identical extracted text per url": it
*actually extracts* text from the html payload per batch (vectorized
tag-stripping) and counts byte-mismatches vs the ``text`` column.

Execution shape (SURVEY.md §3 job graph): driver schema checks ->
one streaming map_batches validation pass (+ extraction invariant +
stats sketches) -> partial tree-merge -> uniqueness shuffle on url.
"""

from __future__ import annotations

import datetime
from typing import Any, Literal, Optional

import pyarrow as pa
import pyarrow.compute as pc

import patito_ray as pr
from patito_ray.validation.engine import duplicate_count_distributed


class WebPage(pr.Model):
    """The input table shape from BASELINE.json's input_hint."""

    url: str = pr.Field(unique=True, pattern=r"^https?://")
    warc_ts: datetime.datetime = pr.Field(
        ge=datetime.datetime(2008, 1, 1), le=datetime.datetime(2030, 1, 1)
    )
    html: Optional[bytes] = None
    text: str
    lang: Literal["en", "de", "fr", "es", "it", "pt", "nl", "sv"]


def extract_text_from_html(html: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Text extraction from the html payload.

    Two-tier (functions/htmltext.py): rows shaped like the plain
    synthetic wrapper ``<html><body>TEXT</body></html>`` (no nested
    tags/entities) strip the wrapper with vectorized Arrow kernels and
    return the inner text BYTE-EXACT (the flagship invariant's
    contract); rows with real markup go through the stdlib
    ``html.parser`` extractor (entities decoded, script/style dropped,
    whitespace collapsed). The synthetic corpus marks 2% of pages with
    real nested/entity markup (generate.page_markup_html), so the
    headline pass measures genuine parser work; on a real crawl use
    ``htmltext.extract_text_stage`` to run the same kernel as an
    actor-pool stage."""
    from patito_ray.functions.htmltext import ExtractHtmlText

    return ExtractHtmlText().extract_array(html)


def text_invariant_counts(batch: pa.Table) -> dict[str, int]:
    """Count rows whose EXTRACTED text differs byte-wise from ``text``
    (null-html rows are skipped — nothing to extract). Runs INSIDE the
    main validation pass via the engine's extra_batch_checks hook, so
    the invariant costs zero extra scans.

    Two tiers, exact in both: a vectorized pre-pass accepts rows where
    ``html == "<html><body>" + text + "</body></html>"`` outright
    (wrapper-shaped html extracts to its inner text verbatim, so
    equality of the joined form IS equality of the extraction); only
    rows failing that cheap check — the generator's 2% real-markup
    subset, plus any genuinely corrupt row — are extracted with the
    full ``html.parser`` branch (entities decoded, script/style
    dropped) and re-compared byte-wise."""
    html = batch.column("html")
    if isinstance(html, pa.ChunkedArray):
        html = html.combine_chunks()
    text = batch.column("text")
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    expected = pc.binary_join_element_wise(
        pa.scalar("<html><body>"),
        text,
        pa.scalar("</body></html>"),
        "",
    )
    eq = pc.equal(pc.cast(html, pa.string()), expected)
    checked = pc.sum(pc.is_valid(eq)).as_py() or 0
    quick_fail = pc.fill_null(pc.invert(eq), False)
    n_fail = pc.sum(quick_fail).as_py() or 0
    if not n_fail:
        return {"text_mismatches": 0, "text_checked": int(checked)}
    # real extraction for the rows the fast path could not certify
    idx = pc.indices_nonzero(quick_fail)
    extracted = extract_text_from_html(html.take(idx))
    still = pc.not_equal(extracted, text.take(idx))
    mismatch = pc.sum(pc.fill_null(still, True)).as_py() or 0
    return {"text_mismatches": int(mismatch), "text_checked": int(checked)}


def text_invariant_partial(batch: pa.Table) -> pa.Table:
    """Standalone per-batch counter row (mergeable by summation) for
    running the invariant as its own narrow pass."""
    c = text_invariant_counts(batch)
    return pa.table({"mismatches": [c["text_mismatches"]], "checked": [c["text_checked"]]})


def validate_webpages(
    ds: Any,
    check_text_invariant: bool = True,
    hash_unique_keys: bool = True,
) -> dict[str, Any]:
    """Run the full web-page validation job; returns a flat summary.

    ONE streaming pass carries every row-wise check AND the extraction
    invariant (extra_batch_checks hook); the only other data motion is
    the narrow two-phase uniqueness shuffle on url.
    """
    extra = [text_invariant_counts] if check_text_invariant else None
    report = pr.validate_report(
        ds, WebPage, hash_unique_keys=hash_unique_keys, extra_batch_checks=extra
    )
    out: dict[str, Any] = {
        "row_count": report.row_count,
        "ok": report.ok,
        "n_errors": len(report.errors),
        "null_text": report.merged.null_counts.get("text", 0),
        "dup_urls": report.merged.dup_counts.get("url", 0),
        "bad_lang": len(report.merged.enum_invalid.get("lang", ())),
        "url_bound_fails": report.merged.bounds_fail.get("url", 0),
        "ts_bound_fails": report.merged.bounds_fail.get("warc_ts", 0),
    }
    if check_text_invariant:
        out["text_mismatches"] = int(report.merged.custom.get("text_mismatches", 0))
        out["text_checked"] = int(report.merged.custom.get("text_checked", 0))
    return out


def summary_table(summary: dict[str, Any]) -> pa.Table:
    return pa.table({k: [v] for k, v in summary.items()})


__all__ = [
    "WebPage",
    "validate_webpages",
    "extract_text_from_html",
    "text_invariant_partial",
    "duplicate_count_distributed",
    "summary_table",
]
