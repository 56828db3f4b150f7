"""Real HTML text extraction (stdlib ``html.parser`` — no new deps).

The flagship webpage pipeline's extraction seam
(``pipelines/webpage.py:extract_text_from_html``) historically only
stripped the synthetic ``<html><body>...</body></html>`` wrapper with
Arrow kernels; real crawl HTML (nested tags, entities, script/style
blocks) needs an actual parser. This module provides it:

- :func:`extract_html_text` — one document: visible text with
  script/style/noscript/template contents dropped, entities decoded
  (``convert_charrefs``), whitespace collapsed.
- :class:`ExtractHtmlText` — the actor-pool ``map_batches`` stage:
  per-batch it routes wrapper-shaped rows through the vectorized Arrow
  fast path (byte-exact inner text, zero Python per row) and only
  genuinely marked-up rows through the parser. On a synthetic corpus
  the Python parser never runs; on a real crawl the per-row parse cost
  is the irreducible work. A C parser (lxml / selectolax) would slot
  into ``_parse_one`` unchanged — it is not in this container.

Whitespace normalization is RE2-ASCII (``[\\t\\n\\f\\r ]+`` -> one
space, strip ASCII spaces) so a SQL oracle with RE2 semantics can
reproduce it exactly (CLAUDE.md invariant: python ``str.split`` is
UNICODE-\\s and disagrees on \\x0b / NBSP).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: rows matching this take the vectorized wrapper fast path: plain
#: synthetic wrapper, no nested tags and no entities inside.
_WRAPPER_RE = r"^<html><body>[^<>&]*</body></html>$"

_WS_RE = re.compile(r"[\t\n\f\r ]+")


def _normalize_ws(s: str) -> str:
    """RE2-ASCII whitespace collapse + ASCII-space strip (matches the
    Arrow kernel path and any RE2-based SQL oracle byte-for-byte)."""
    return _WS_RE.sub(" ", s).strip(" ")


class _TextHTMLParser(HTMLParser):
    """Collect visible text; drop script/style/noscript/template
    subtrees. ``convert_charrefs=True`` (the default) decodes entities
    (&amp;, &#x27;, ...) inside data runs."""

    _SKIP = frozenset({"script", "style", "noscript", "template"})

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip_depth = 0
        self._chunks: list[str] = []

    def handle_starttag(self, tag: str, attrs: Any) -> None:
        if tag in self._SKIP:
            self._skip_depth += 1

    def handle_endtag(self, tag: str) -> None:
        if tag in self._SKIP and self._skip_depth:
            self._skip_depth -= 1

    def handle_data(self, data: str) -> None:
        if not self._skip_depth:
            self._chunks.append(data)

    def text(self) -> str:
        return _normalize_ws(" ".join(self._chunks))


def extract_html_text(doc: str | bytes | None) -> str | None:
    """Visible text of one HTML document (entities decoded,
    script/style dropped, whitespace collapsed). None in -> None out."""
    if doc is None:
        return None
    if isinstance(doc, (bytes, bytearray)):
        doc = doc.decode("utf-8", errors="replace")
    p = _TextHTMLParser()
    p.feed(doc)
    p.close()
    return p.text()


class ExtractHtmlText:
    """Actor-pool batch stage: ``html_col`` (binary|string) -> visible
    text in ``out_col``.

    Wrapper-shaped rows (the synthetic corpus; detected with ONE
    vectorized RE2 match) are stripped with Arrow kernels and returned
    byte-exact; only rows with real markup/entities pay the per-row
    parser. Use as
    ``ds.map_batches(ExtractHtmlText(...), concurrency=N,
    batch_format="pyarrow")`` — construction is cheap, but the class
    form keeps the seam ready for a heavyweight parser that should load
    once per actor.
    """

    def __init__(self, html_col: str = "html", out_col: str = "extracted_text") -> None:
        self.html_col = html_col
        self.out_col = out_col

    @staticmethod
    def _as_string(html: pa.Array) -> pa.Array:
        """Binary -> string. ``pc.cast`` validates UTF-8 and raises on a
        single bad byte sequence (routine in real crawl HTML); fall back
        to a lenient per-row ``errors='replace'`` decode only for the
        batch that actually contains one."""
        if pa.types.is_string(html.type) or pa.types.is_large_string(html.type):
            return html
        try:
            return pc.cast(html, pa.string())
        except pa.ArrowInvalid:
            return pa.array(
                (
                    None if b is None else b.decode("utf-8", errors="replace")
                    for b in html.to_pylist()
                ),
                type=pa.string(),
            )

    def extract_array(self, html: pa.ChunkedArray | pa.Array) -> pa.Array:
        if isinstance(html, pa.ChunkedArray):
            html = html.combine_chunks()
        s = self._as_string(html)
        fast_mask = pc.fill_null(pc.match_substring_regex(s, _WRAPPER_RE), False)
        stripped = pc.replace_substring_regex(
            pc.replace_substring_regex(s, pattern=r"^<html><body>", replacement=""),
            pattern=r"</body></html>$",
            replacement="",
        )
        n_slow = len(s) - (pc.sum(fast_mask).as_py() or 0) - s.null_count
        if n_slow == 0:
            return stripped
        # parse ONLY the marked-up rows; fast/null rows never leave Arrow
        mask_np = fast_mask.to_numpy(zero_copy_only=False)
        null_np = pc.is_null(s).to_numpy(zero_copy_only=False)
        slow_np = ~mask_np & ~null_np
        slow_idx = np.flatnonzero(slow_np)
        parsed = pa.array(
            [extract_html_text(v) for v in s.take(pa.array(slow_idx)).to_pylist()],
            type=pa.string(),
        )
        return pc.replace_with_mask(stripped, pa.array(slow_np), parsed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        extracted = self.extract_array(batch.column(self.html_col))
        if self.out_col in batch.column_names:
            batch = batch.drop_columns([self.out_col])
        return batch.append_column(self.out_col, extracted)


def extract_text_stage(
    ds: Any,
    html_col: str = "html",
    out_col: str = "extracted_text",
    concurrency: int | None = None,
) -> Any:
    """Dataset-level extraction stage. ``concurrency`` sizes the actor
    pool for markup-heavy corpora; the default stateless-task form is
    right when most rows hit the vectorized fast path."""
    fn = ExtractHtmlText(html_col=html_col, out_col=out_col)
    kwargs: dict[str, Any] = {"batch_format": "pyarrow"}
    if concurrency:
        return ds.map_batches(
            ExtractHtmlText,
            fn_constructor_kwargs={"html_col": html_col, "out_col": out_col},
            concurrency=concurrency,
            **kwargs,
        )
    return ds.map_batches(fn, **kwargs)
