"""PII detection and redaction for web-crawl text.

Training-data pipelines scrub personally identifiable information
before a corpus ships; the standard first line of defence is
pattern-based: emails, IPv4 addresses, international-format phone
numbers. Each rule here is ONE vectorized Arrow RE2 kernel per batch
(`pc.count_substring_regex` to detect, `pc.replace_substring_regex` to
redact) — no Python per row, no state, no shuffle, so the stage
streams at full `map_batches` throughput and composes with any other
per-batch work.

Parity is exact and testable: Arrow and DuckDB both compile these
patterns with RE2, so the `pii_redact` query's SQL oracle
(`regexp_replace(..., 'g')` / `len(regexp_extract_all(...))`) must
produce byte-identical redacted text and identical match counts —
leftmost-longest non-overlapping semantics included. Patterns are
deliberately ASCII/RE2-safe (no lookaround, no Unicode classes), the
same constraint the rest of the repo's text kernels follow (see
CLAUDE.md's RE2-whitespace invariant).

Rule order matters and is part of the contract: emails are redacted
BEFORE phone numbers so a digit-laden local-part can never be half
eaten by the phone rule, and IPv4 before phone so dotted quads are
not mistaken for digit runs. Counts are computed on the ORIGINAL
text (all three rules see the same input); redaction is sequential.

Reference scope note: patito has no text-scrubbing surface — this is
part of the LLM-data operator set layered on top of the reference's
validation semantics (SURVEY §2 "beyond-reference" block).
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa
import pyarrow.compute as pc

# RE2-safe, ASCII-only patterns; keep in lockstep with the SQL oracle
# in pipelines/queries.py (SQL_PII_REDACT uses these same strings).
EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
# international-format: leading '+', then >= 8 total digits allowing
# spaces/dashes/parens between. Requiring the '+' keeps false positives
# on prose numbers near zero, the usual production trade-off.
PHONE_RE = r"\+[0-9][0-9 ()\-]{6,}[0-9]"

# (rule name, pattern, replacement token) in application order.
PII_RULES: tuple[tuple[str, str, str], ...] = (
    ("email", EMAIL_RE, "<EMAIL>"),
    ("ipv4", IPV4_RE, "<IP>"),
    ("phone", PHONE_RE, "<PHONE>"),
)


def _combined(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        return col.combine_chunks()
    return col


def pii_counts_arrays(
    text: pa.Array | pa.ChunkedArray,
) -> dict[str, pa.Array]:
    """Per-row match counts for every rule, on the original text."""
    text = _combined(text)
    return {
        f"n_{name}": pc.cast(
            pc.count_substring_regex(text, pattern), pa.int64()
        )
        for name, pattern, _ in PII_RULES
    }


def redact_pii_array(text: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Redacted text: rules applied sequentially in PII_RULES order."""
    out = _combined(text)
    for _, pattern, token in PII_RULES:
        out = pc.replace_substring_regex(
            out, pattern=pattern, replacement=token
        )
    return out


def pii_batch(
    batch: pa.Table, text_col: str = "text", out_col: str = "redacted"
) -> pa.Table:
    """Append per-rule counts + the redacted column to a batch."""
    text = batch.column(text_col)
    for name, arr in pii_counts_arrays(text).items():
        batch = batch.append_column(name, arr)
    return batch.append_column(out_col, redact_pii_array(text))


def redact_pii(
    ds: Any, text_col: str = "text", out_col: str = "redacted"
) -> Any:
    """Dataset stage: append n_email/n_ipv4/n_phone + redacted text."""
    return ds.map_batches(
        lambda t: pii_batch(t, text_col=text_col, out_col=out_col),
        batch_format="pyarrow",
        batch_size=None,
    )
