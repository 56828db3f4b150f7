"""peak_concurrency query vs a brute-force sweep reference."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq

from patito_ray.pipelines.queries import q_peak_concurrency


def _brute(events):
    """events: list of (start_us, dur_s). Returns (peak, at_us) with
    starts counted before ends at the same instant."""
    pts = []
    for s, dur in events:
        pts.append((s * 2, 1))
        pts.append(((s + dur * 1_000_000) * 2 + 1, -1))
    pts.sort()
    cur = best = 0
    at = None
    for k, d in pts:
        cur += d
        if d == 1 and cur > best:
            best, at = cur, k // 2
    return best, at


def test_peak_concurrency_brute_force(ray_session, tmp_path):
    base = int(dt.datetime(2024, 1, 1).timestamp() * 1_000_000)
    # (offset_s, dur_s): simultaneous starts, end-meets-start overlap
    # (start sorts before end at the same instant), zero duration
    spec = [
        (0, 10),
        (0, 5),      # two simultaneous starts
        (5, 5),      # starts exactly when #2 ends -> still overlaps it
        (10, 0),     # zero-length at #1's end instant
        (100, 1),
        (100, 1),
        (100, 1),    # isolated triple = the peak window contender
        (100, 1),
    ]
    events = [(base + off * 1_000_000, dur) for off, dur in spec]
    peak, at = _brute(events)
    assert peak == 4 and at == base + 100 * 1_000_000  # sanity of the spec

    t = pa.table(
        {
            "event_id": pa.array(range(len(spec)), pa.int64()),
            "ts": pa.array(
                [s for s, _ in events], pa.timestamp("us")
            ),
            "value": pa.array([float(d) for _, d in spec], pa.float64()),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "events.parquet")

    out = q_peak_concurrency(str(d))
    assert out.column("peak")[0].as_py() == peak
    assert out.column("at_us")[0].as_py() == at
