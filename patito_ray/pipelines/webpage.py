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
    """Vectorized text extraction from the html payload.

    The synthetic corpus wraps text as ``<html><body>TEXT</body></html>``;
    extraction strips the wrapper with Arrow kernels (cast utf8 +
    regex replace). A real-world HTML parser would be an actor-pool
    stage (lxml per actor); the invariant-check plumbing is identical.
    """
    if isinstance(html, pa.ChunkedArray):
        html = html.combine_chunks()
    s = pc.cast(html, pa.string())
    s = pc.replace_substring_regex(s, pattern=r"^<html><body>", replacement="")
    s = pc.replace_substring_regex(s, pattern=r"</body></html>$", replacement="")
    return s


def text_invariant_partial(batch: pa.Table) -> pa.Table:
    """Per-batch count of rows whose extracted text differs from the
    ``text`` column (rows with null html are skipped — nothing to
    extract). Emits a tiny counter row; mergeable by summation."""
    extracted = extract_text_from_html(batch.column("html"))
    eq = pc.equal(extracted, batch.column("text"))
    mismatch = pc.sum(pc.fill_null(pc.invert(eq), False)).as_py() or 0
    checked = pc.sum(pc.is_valid(eq)).as_py() or 0
    return pa.table(
        {"mismatches": [int(mismatch)], "checked": [int(checked)]}
    )


def validate_webpages(
    ds: Any,
    check_text_invariant: bool = True,
    hash_unique_keys: bool = True,
) -> dict[str, Any]:
    """Run the full web-page validation job; returns a flat summary.

    One streaming pass for all row-wise checks + one narrow uniqueness
    shuffle on url + (optionally) one extraction-invariant pass
    (projected to html+text only — column pruning keeps the second
    pass narrow).
    """
    report = pr.validate_report(ds, WebPage, hash_unique_keys=hash_unique_keys)
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
        rows = (
            ds.select_columns(["html", "text"])
            .map_batches(text_invariant_partial, batch_format="pyarrow", batch_size=None)
            .take_all()
        )
        out["text_mismatches"] = int(sum(r["mismatches"] for r in rows))
        out["text_checked"] = int(sum(r["checked"] for r in rows))
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
