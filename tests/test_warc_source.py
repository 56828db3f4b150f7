"""WARC source round-trip: write_warc fixtures -> read_warc Dataset.

The reader is the ingest half of the Common-Crawl-shaped pipeline
(BASELINE input_hint: url/warc_ts/html); these tests pin the byte-level
record framing, gzip handling, record-type filtering, HTTP-head
stripping, and the one-file-per-task decomposition.
"""

from __future__ import annotations

import gzip
from datetime import datetime

import pyarrow as pa
import pytest

from patito_ray.sources.warc import (
    WARC_SCHEMA,
    iter_warc_records,
    read_warc,
    write_warc,
)


def _pages(n: int, salt: str = "") -> list[tuple[str, datetime, bytes]]:
    return [
        (
            f"https://ex{salt}.com/p/{i}",
            datetime(2024, 1, 1 + i % 28, i % 24, 0, 0),
            f"<html><body>page {salt}{i} é</body></html>".encode(),
        )
        for i in range(n)
    ]


def test_warc_roundtrip_gz_and_plain(tmp_path, ray_session):
    pages = _pages(37)
    assert write_warc(str(tmp_path / "a.warc.gz"), pages[:20]) == 20
    assert write_warc(str(tmp_path / "b.warc"), pages[20:]) == 17

    ds = read_warc(str(tmp_path))
    got = ds.sort("url").take_all()
    want = sorted(pages, key=lambda p: p[0])
    assert [r["url"] for r in got] == [p[0] for p in want]
    assert [r["html"] for r in got] == [p[2] for p in want]
    assert [r["warc_ts"] for r in got] == [p[1] for p in want]
    assert ds.schema().base_schema == WARC_SCHEMA


def test_warc_batch_bytes_bounds_blocks(tmp_path, ray_session):
    pages = _pages(50)
    write_warc(str(tmp_path / "c.warc.gz"), pages)
    # tiny byte budget -> many small batches, same content
    ds = read_warc(str(tmp_path / "c.warc.gz"), batch_bytes=64)
    assert sorted(r["url"] for r in ds.take_all()) == sorted(
        p[0] for p in pages
    )


def test_warc_skips_non_response_records(tmp_path, ray_session):
    raw = tmp_path / "d.warc"
    body = b"<html>hi</html>"
    http = b"HTTP/1.1 200 OK\r\n\r\n" + body
    rec = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\ninfo\r\n\r\n"
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://x.org/\r\n"
        b"WARC-Date: 2024-02-02T03:04:05Z\r\n"
        + f"Content-Length: {len(http)}\r\n\r\n".encode()
        + http
        + b"\r\n\r\n"
        b"WARC/1.0\r\nWARC-Type: request\r\nContent-Length: 2\r\n\r\nok\r\n\r\n"
    )
    raw.write_bytes(rec)
    rows = read_warc(str(raw)).take_all()
    assert len(rows) == 1
    assert rows[0]["url"] == "https://x.org/"
    assert rows[0]["html"] == body
    assert rows[0]["warc_ts"] == datetime(2024, 2, 2, 3, 4, 5)


def test_iter_warc_records_streams_incrementally(tmp_path):
    """Parser reads record-by-record from a raw stream; payload bytes
    are exact even when records straddle read-chunk boundaries."""
    path = tmp_path / "e.warc.gz"
    pages = _pages(5, salt="z")
    write_warc(str(path), pages)
    with gzip.open(path, "rb") as f:
        recs = list(iter_warc_records(f))
    assert len(recs) == 5
    for (headers, payload), (url, _ts, html) in zip(recs, pages):
        assert headers["warc-target-uri"] == url
        assert payload.endswith(html)
        assert payload.startswith(b"HTTP/1.1 200 OK")


def test_warc_empty_dir_and_missing_content_length(tmp_path):
    with pytest.raises(ValueError, match="no .warc"):
        read_warc(str(tmp_path))
    bad = tmp_path / "f.warc"
    bad.write_bytes(b"WARC/1.0\r\nWARC-Type: response\r\n\r\nxx\r\n\r\n")
    import io

    with pytest.raises(ValueError, match="Content-Length"):
        with open(bad, "rb") as f:
            list(iter_warc_records(f))


def test_iter_warc_skips_markerless_garbage_without_hanging():
    """Regression: garbage whose retained tail still contains CRLFCRLF
    used to spin forever in the skip path (never reading more data)."""
    import io

    from patito_ray.sources.warc import iter_warc_records

    assert list(iter_warc_records(io.BytesIO(b"junk\r\n\r\n"))) == []
    rec = (
        b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 5\r\n\r\n"
        b"hello\r\n\r\n"
    )
    # marker separated from the garbage by >64 KiB forces multiple
    # skip-path reads before the record is found
    stream = io.BytesIO(b"garbage\r\n\r\n" + b"X" * 200_000 + rec)
    got = list(iter_warc_records(stream))
    assert len(got) == 1 and got[0][1] == b"hello"


# ---------------------------------------------------- footer stats


def test_parquet_footer_stats_multifile(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from patito_ray.sources.readers import parquet_footer_stats

    t1 = pa.table({"x": pa.array([3, 1, None, 9], pa.int64()),
                   "s": pa.array(["a", "b", "c", "d"])})
    t2 = pa.table({"x": pa.array([-5, 7, None, None], pa.int64()),
                   "s": pa.array(["e", "f", "g", "h"])})
    pq.write_table(t1, tmp_path / "a.parquet", row_group_size=2)
    pq.write_table(t2, tmp_path / "b.parquet", row_group_size=2)

    out = parquet_footer_stats(str(tmp_path), ["x"])
    row = out.to_pylist()[0]
    assert row == {"n_rows": 8, "x_min": -5, "x_max": 9, "x_nulls": 3}

    with pytest.raises(TypeError, match="numeric/temporal"):
        parquet_footer_stats(str(tmp_path), ["s"])
    with pytest.raises(Exception):
        parquet_footer_stats(str(tmp_path / "missing"), ["x"])
