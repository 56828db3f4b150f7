"""WARC source: Common-Crawl-style web-archive ingest.

Common Crawl publishes its corpus as gzipped WARC/1.0 files (ISO
28500, public spec): a stream of records, each a CRLF-separated header
block (``WARC/1.0`` + ``Name: value`` lines) followed by exactly
``Content-Length`` payload bytes and a blank-line record terminator.
``response`` records carry an HTTP message whose body is the crawled
HTML. This module turns a directory of such files into the engine's
canonical web-page Dataset — columns ``(url, warc_ts, html)`` matching
the BASELINE input_hint — without any third-party WARC library
(stdlib ``gzip`` + byte scanning only).

Scale shape: Common Crawl's own layout is ~1 GB per WARC file,
tens of thousands of files per crawl. The natural Ray decomposition is
therefore ONE FILE PER TASK — gzip is not splittable, so intra-file
parallelism is impossible anyway, and a 1 GB member decompresses
streaming inside a worker with bounded memory because records are
parsed incrementally and emitted as Arrow batches of bounded byte
size. The driver only ever touches the path list. At 100 TB that is
~100k independent tasks over a path list of a few MB — the same
one-shard-per-task pattern as the checkpointed parquet reader.

Parsing is necessarily sequential WITHIN a record stream (each
record's length is only known from its own header), but the cost per
record is O(bytes) with ``find``/``split`` on bytes — there is no
per-character Python loop, and HTML payloads are never decoded here
(they stay ``binary``; decode belongs to the extraction stage).
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator
from typing import Any

import pyarrow as pa

# canonical output schema == BASELINE.json input_hint (html kept binary;
# text/lang are downstream extraction/lang-id stages, not ingest)
WARC_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("s")),
        pa.field("html", pa.binary()),
    ]
)

_CRLF2 = b"\r\n\r\n"


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n")[1:]:  # line 0 is the version line
        name, sep, value = line.partition(b":")
        if sep:
            headers[name.strip().lower().decode("ascii", "replace")] = (
                value.strip().decode("utf-8", "replace")
            )
    return headers


def _http_body(payload: bytes) -> bytes:
    """Strip the HTTP response head; a payload without one (rare
    malformed record) passes through whole."""
    if payload[:5] == b"HTTP/":
        cut = payload.find(_CRLF2)
        if cut >= 0:
            return payload[cut + 4 :]
    return payload


def _ts_or_none(iso: str | None) -> Any:
    # WARC-Date is ISO-8601 Zulu: 2024-01-31T08:15:00Z
    if not iso:
        return None
    from datetime import datetime, timezone

    try:
        return datetime.fromisoformat(iso.replace("Z", "+00:00")).astimezone(
            timezone.utc
        ).replace(tzinfo=None)
    except ValueError:
        return None


def iter_warc_records(
    stream: io.BufferedIOBase,
) -> Iterator[tuple[dict[str, str], bytes]]:
    """Incrementally parse (headers, payload) pairs from a WARC byte
    stream. Reads exactly what each record declares — memory is
    bounded by the largest single record, never the file."""
    buf = b""
    while True:
        # accumulate until a full header block is visible
        while _CRLF2 not in buf:
            chunk = stream.read(64 * 1024)
            if not chunk:
                return
            buf += chunk
        head, _, rest = buf.partition(_CRLF2)
        if not head.startswith(b"WARC/"):
            # skip garbage up to the next record marker
            nxt = buf.find(b"WARC/", 1)
            if nxt < 0:
                # keep an 8-byte tail (covers a marker split across
                # reads) and FORCE a read: the retained tail may still
                # contain CRLFCRLF, so falling back to the
                # header-accumulate loop would re-partition the same
                # bytes forever
                tail = buf[-8:]
                chunk = stream.read(64 * 1024)
                if not chunk:
                    return
                buf = tail + chunk
                continue
            buf = buf[nxt:]
            continue
        headers = _parse_headers(head)
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            raise ValueError(
                "WARC record missing a numeric Content-Length header "
                f"(headers: {sorted(headers)})"
            ) from None
        need = length + 4  # payload + record-terminating CRLFCRLF
        buf = rest
        while len(buf) < need:
            chunk = stream.read(max(64 * 1024, need - len(buf)))
            if not chunk:
                # truncated final record: surface what we have
                yield headers, buf[:length]
                return
            buf += chunk
        yield headers, buf[:length]
        buf = buf[need:]


def _open(path: str) -> io.BufferedIOBase:
    if path.endswith(".gz"):
        return gzip.open(path, "rb")  # type: ignore[return-value]
    return open(path, "rb")


def _read_one_file(
    path: str, batch_bytes: int, record_types: tuple[str, ...]
) -> Iterator[pa.Table]:
    urls: list[str | None] = []
    stamps: list[Any] = []
    bodies: list[bytes] = []
    pending = 0
    with _open(path) as f:
        for headers, payload in iter_warc_records(f):
            if headers.get("warc-type") not in record_types:
                continue
            urls.append(headers.get("warc-target-uri"))
            stamps.append(_ts_or_none(headers.get("warc-date")))
            body = _http_body(payload)
            bodies.append(body)
            pending += len(body)
            if pending >= batch_bytes:
                yield pa.table(
                    {"url": urls, "warc_ts": stamps, "html": bodies},
                    schema=WARC_SCHEMA,
                )
                urls, stamps, bodies, pending = [], [], [], 0
    if urls:
        yield pa.table(
            {"url": urls, "warc_ts": stamps, "html": bodies},
            schema=WARC_SCHEMA,
        )


def read_warc(
    paths: str | list[str],
    batch_bytes: int = 32 << 20,
    record_types: tuple[str, ...] = ("response",),
) -> Any:
    """Read WARC(.gz) files into a Dataset of (url, warc_ts, html).

    One file per task (gzip members are not splittable); each task
    streams its file and emits Arrow batches capped at ``batch_bytes``
    of payload so a fat-page file cannot balloon a block. Pass a
    directory, a path, or a list of paths.
    """
    import os

    import ray.data as rd

    if isinstance(paths, str):
        if os.path.isdir(paths):
            found = sorted(
                os.path.join(paths, n)
                for n in os.listdir(paths)
                if n.endswith((".warc", ".warc.gz"))
            )
        else:
            found = [paths]
    else:
        found = list(paths)
    if not found:
        raise ValueError("read_warc: no .warc/.warc.gz files found")

    def parse(batch: pa.Table) -> Iterator[pa.Table]:
        for path in batch.column("path").to_pylist():
            produced = False
            for table in _read_one_file(
                path, batch_bytes=batch_bytes, record_types=record_types
            ):
                produced = True
                yield table
            if not produced:  # keep the output schema stable
                yield WARC_SCHEMA.empty_table()

    # one path per block -> one file per task; the generator UDF
    # streams Arrow batches out without ever holding a whole file
    return rd.from_items(
        [{"path": p} for p in found], override_num_blocks=len(found)
    ).map_batches(parse, batch_format="pyarrow", batch_size=None)


def write_warc(
    path: str,
    records: Iterator[tuple[str, Any, bytes]] | list[tuple[str, Any, bytes]],
    compress: bool | None = None,
) -> int:
    """Write (url, ts, html) triples as WARC/1.0 response records —
    the test-fixture / round-trip half of the source. Returns the
    record count."""
    if compress is None:
        compress = path.endswith(".gz")
    out: io.BufferedIOBase = (
        gzip.open(path, "wb") if compress else open(path, "wb")  # type: ignore[assignment]
    )
    n = 0
    with out:
        for url, ts, html in records:
            http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html
            iso = (
                ts.strftime("%Y-%m-%dT%H:%M:%SZ")
                if hasattr(ts, "strftime")
                else str(ts)
            )
            head = b"\r\n".join(
                [
                    b"WARC/1.0",
                    b"WARC-Type: response",
                    f"WARC-Target-URI: {url}".encode(),
                    f"WARC-Date: {iso}".encode(),
                    f"Content-Length: {len(http)}".encode(),
                ]
            )
            # header block, blank line, payload, record terminator
            out.write(head + _CRLF2 + http + _CRLF2)
            n += 1
    return n
