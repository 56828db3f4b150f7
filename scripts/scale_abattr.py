"""A/B attribution of the r3->r4 bench deltas (VERDICT r4 item 2b).

Two per-query deltas at sf0.1 needed attribution beyond host noise:

- image_near_dups 0.35 -> 2.0 s: round 4 added the real from-scratch
  JPEG decoder to the synthetic container mix. A/B: identical pipeline
  with containers (png, bmp) vs (png, bmp, jpeg), interleaved paired
  trials, median pair.
- span_dedup 1.15 -> 2.19 s: the query itself runs hash_rate=1
  (exact), so the knob CANNOT explain the delta — measured here to
  prove it (hash_rate=1 vs 4 shows the knob only ever REDUCES work),
  leaving host variance as the attribution, now bounded by the
  median-of-pairs headline protocol.

Run: taskset -c 0-7 python scripts/scale_abattr.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
TRIALS = 3


def main() -> None:
    os.environ.setdefault("POLARS_MAX_THREADS", "8")
    try:
        os.sched_setaffinity(0, set(range(8)))
    except OSError:
        pass
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from patito_ray.functions.multimodal import image_near_dups, synth_media_batch
    from patito_ray.functions.spandedup import duplicated_span_stats
    from patito_ray.pipelines.qcommon import _rp

    def run_image(containers) -> float:
        t0 = time.time()
        ds = _rp(SF, "documents", ["doc_id"])
        media = ds.map_batches(
            lambda t: synth_media_batch(t, media="image", containers=containers),
            batch_format="pyarrow",
            batch_size=256,
        )
        image_near_dups(media, max_hamming=3, concurrency=8).materialize()
        return time.time() - t0

    def run_span(hash_rate) -> float:
        t0 = time.time()
        ds = _rp(SF, "documents", ["doc_id", "text"])
        duplicated_span_stats(ds, L=20, hash_rate=hash_rate).materialize()
        return time.time() - t0

    # warm both pipelines once (worker imports)
    run_image(("png",))
    run_span(1)

    pairs_img, pairs_span = [], []
    for _ in range(TRIALS):
        a = run_image(("png", "bmp"))
        b = run_image(("png", "bmp", "jpeg"))
        pairs_img.append((b / a, a, b))
        c = run_span(1)
        d = run_span(4)
        pairs_span.append((d / c, c, d))
    pairs_img.sort()
    pairs_span.sort()
    r, a, b = pairs_img[len(pairs_img) // 2]
    print(
        f"image_near_dups {SF}: png+bmp {a:.2f}s vs +jpeg {b:.2f}s  "
        f"(x{r:.2f} — the JPEG decode arm costs {(b-a):.2f}s of the pipeline)"
    )
    r, c, d = pairs_span[len(pairs_span) // 2]
    print(
        f"span_dedup {SF}: hash_rate=1 {c:.2f}s vs hash_rate=4 {d:.2f}s  "
        f"(x{r:.2f} — the sampling knob reduces work; it cannot explain a "
        f"slowdown of the exact query)"
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
