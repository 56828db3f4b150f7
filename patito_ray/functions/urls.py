"""URL canonicalization for web-crawl pipelines.

Exact-dup detection over crawled pages routinely misses duplicates
because the SAME resource appears under trivially different URLs
(`HTTP://Example.com:80/a#top` vs `http://example.com/a`). The
canonical form here applies the deterministic, loss-free subset of RFC
3986 normalization — the rules every engine agrees on:

- scheme and authority (host[:port]) lowercased (case-insensitive per
  RFC 3986 §6.2.2.1); path/query case is preserved (case-SENSITIVE);
- the fragment is dropped (never sent to the server, §3.5);
- default ports removed (`:80` for http, `:443` for https, §6.2.3).

Strings that do not parse as `scheme://authority...` pass through
unchanged (a canonicalizer must never corrupt non-URL keys), and nulls
stay null.

Everything is one vectorized Arrow kernel per batch — regex extract +
two anchored replaces + an element-wise join; no Python per row, no
state, no shuffle. The `url_canonical` query proves cross-engine
parity against a DuckDB re-implementation of the same rules over
identical synthesized inputs.
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa
import pyarrow.compute as pc

# scheme://authority (authority = everything up to the first /, ? or #),
# then the path+query (everything up to the first #), fragment dropped
_URL_RE = (
    r"^(?P<head>[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*)"
    r"(?P<tail>[^#]*)(?:#(?:.|\n)*)?$"
)


def canonicalize_url_array(urls: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized canonical form of a string array of URLs."""
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    parts = pc.extract_regex(urls, pattern=_URL_RE)
    head = pc.utf8_lower(pc.struct_field(parts, "head"))
    head = pc.replace_substring_regex(
        head, pattern=r"^(http://[^:]*):80$", replacement=r"\1"
    )
    head = pc.replace_substring_regex(
        head, pattern=r"^(https://[^:]*):443$", replacement=r"\1"
    )
    canon = pc.binary_join_element_wise(head, pc.struct_field(parts, "tail"), "")
    # non-URL strings pass through; nulls stay null
    return pc.coalesce(canon, urls)


def canonicalize_urls(
    ds: Any, url_col: str = "url", out_col: str = "canon_url"
) -> Any:
    """Dataset stage: append the canonical URL column."""
    return ds.map_batches(
        lambda t: t.append_column(out_col, canonicalize_url_array(t.column(url_col))),
        batch_format="pyarrow",
        batch_size=None,
    )
