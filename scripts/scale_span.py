"""Scale harness for span-level exact-substring dedup: 1M random-text
documents (26-letter alphabet — no accidental 20-char collisions), 1000
planted PAIRS sharing a unique 60-char span each. With stride=8 and the
span inserted at the same stride-aligned offset in both pair members,
exactly 6 sampled windows per planted doc are cross-document duplicates
— so the check is EXACT: every planted doc must report n_dup_grams == 6
and every other doc 0.

Usage: taskset -c 0-7 python scripts/scale_span.py [n_docs]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from patito_ray.functions.dedup import _splitmix  # noqa: E402

DOC_LEN = 256
SPAN_LEN = 60
INSERT_AT = 64
STRIDE = 8
L = 20
N_PAIRS = 1000
# stride-aligned window starts fully inside the span:
# j in {64, 72, 80, 88, 96, 104}, j + 20 <= 124
EXPECTED_DUP = 6


def _rand_letters(ids: np.ndarray, length: int, salt: int) -> np.ndarray:
    pos = np.arange(length, dtype=np.uint64)
    m = _splitmix(
        _splitmix(ids.astype(np.int64).view(np.uint64) ^ np.uint64(salt))[:, None]
        ^ _splitmix(pos[None, :] + np.uint64(salt))
    )
    return (m % np.uint64(26) + np.uint64(97)).astype(np.uint8)


def _span_for_pair(pair: int) -> str:
    b = _rand_letters(np.array([pair], dtype=np.int64), SPAN_LEN, salt=0xDEC0)
    return b.tobytes().decode()


def doc_batch(batch: pa.Table, n_docs: int, random_offsets: bool = False) -> pa.Table:
    ids = batch.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
    letters = _rand_letters(ids, DOC_LEN, salt=0xC0FFEE)
    data = letters.reshape(-1)
    offsets = (np.arange(len(ids) + 1, dtype=np.int64) * DOC_LEN)
    texts = pa.LargeStringArray.from_buffers(
        len(ids), pa.py_buffer(offsets.tobytes()), pa.py_buffer(data.tobytes())
    )
    # planted pairs: doc i and doc i + n_docs//2 (i < N_PAIRS) share span i
    half = n_docs // 2
    mask = (ids < N_PAIRS) | ((ids >= half) & (ids < half + N_PAIRS))
    if mask.any():
        out = texts.to_pylist()
        for k in np.flatnonzero(mask):
            did = int(ids[k])
            pair = did if did < N_PAIRS else did - half
            t = out[k]
            if random_offsets:
                # per-DOC random insertion (the realistic regime: the
                # same span sits at unrelated offsets in each member, so
                # stride-sampling recall is what the sweep measures)
                at = 32 + int(_splitmix(np.array([did], np.int64).view(np.uint64) ^ np.uint64(0xA11A))[0] % np.uint64(128))
            else:
                at = INSERT_AT
            out[k] = t[:at] + _span_for_pair(pair) + t[at:]
        text_arr = pa.array(out, type=pa.string())
    else:
        text_arr = pc.cast(texts, pa.string())
    return pa.table(
        {"doc_id": pa.array(ids, type=pa.int64()), "text": text_arr}
    )


def stride_sweep(n_docs: int) -> None:
    """Measure the stride knob: spans planted at RANDOM per-doc offsets
    (stride-aligned planting, as in the main harness, is the best case
    — identical substrings only co-sample when both members' offsets
    agree mod stride, so recall decays with stride and this sweep
    quantifies the tradeoff the 100-TB knob buys). One JSON line per
    stride: wall time, pair-level recall (planted doc flagged at all),
    and sampled-window volume (the exchange traffic stride divides)."""
    import ray
    import ray.data as rd

    from patito_ray.functions.spandedup import duplicated_span_stats

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=8, include_dashboard=False,
            logging_level="ERROR",
        )
    ds = (
        rd.range(n_docs, override_num_blocks=64)
        .map_batches(
            doc_batch,
            fn_kwargs={"n_docs": n_docs, "random_offsets": True},
            batch_format="pyarrow",
            batch_size=None,
        )
        .materialize()
    )
    half = n_docs // 2
    arms = [("stride", k) for k in (1, 2, 4, 8, 16)] + [
        ("winnow", k) for k in (2, 4, 8, 16)
    ]
    for mode, k in arms:
        t0 = time.time()
        out = duplicated_span_stats(
            ds,
            L=L,
            stride=k if mode == "stride" else 1,
            hash_rate=k if mode == "winnow" else 1,
        )
        if not isinstance(out, pa.Table):
            out = out.materialize()
            tabs = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
            out = pa.concat_tables(tabs)
        wall = time.time() - t0
        doc = out.column("doc_id").to_numpy(zero_copy_only=False)
        dup = out.column("n_dup_grams").to_numpy(zero_copy_only=False)
        planted = (doc < N_PAIRS) | ((doc >= half) & (doc < half + N_PAIRS))
        flagged = int((dup[planted] > 0).sum())
        false_docs = int((dup[~planted] > 0).sum())
        windows = (DOC_LEN + SPAN_LEN - L) // k * n_docs  # ~sampled rows
        print(
            json.dumps(
                {
                    "metric": "span_sample_sweep",
                    "n_docs": n_docs,
                    "mode": mode,
                    "k": k,
                    "wall_s": round(wall, 1),
                    "recall_docs": round(flagged / (2 * N_PAIRS), 4),
                    "false_dup_docs": false_docs,
                    "approx_window_rows": windows,
                }
            ),
            flush=True,
        )
    ray.shutdown()


def main() -> None:
    if "--stride-sweep" in sys.argv:
        args = [a for a in sys.argv[1:] if not a.startswith("--")]
        stride_sweep(int(args[0]) if args else 200_000)
        return
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=8, include_dashboard=False,
            logging_level="ERROR",
        )
    import ray.data as rd

    from patito_ray.functions.spandedup import duplicated_span_stats

    ds = (
        rd.range(n_docs, override_num_blocks=256)
        .map_batches(
            doc_batch,
            fn_kwargs={"n_docs": n_docs},
            batch_format="pyarrow",
            batch_size=None,
        )
        .materialize()
    )

    t0 = time.time()
    out = duplicated_span_stats(ds, L=L, stride=STRIDE)
    if not isinstance(out, pa.Table):
        out = out.materialize()  # ONE execution (schema fetch would re-run)
        tabs = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
        out = pa.concat_tables(tabs)
    wall = time.time() - t0

    doc = out.column("doc_id").to_numpy(zero_copy_only=False)
    dup = out.column("n_dup_grams").to_numpy(zero_copy_only=False)
    half = n_docs // 2
    planted = (doc < N_PAIRS) | ((doc >= half) & (doc < half + N_PAIRS))
    ok_planted = int((dup[planted] == EXPECTED_DUP).sum())
    false_docs = int((dup[~planted] > 0).sum())
    rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6

    print(
        json.dumps(
            {
                "metric": "span_dedup_1m",
                "n_docs": n_docs,
                "wall_s": round(wall, 1),
                "docs_per_sec": round(n_docs / wall),
                "planted_exact": ok_planted,
                "planted_total": 2 * N_PAIRS,
                "false_dup_docs": false_docs,
                "driver_rss_gb": round(rss_gb, 2),
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
