"""Scale harness for the multimodal near-dup operators on the REAL
codec path: n synthetic media docs (PNG images + PCM WAV clips, real
encoders), ``dup_factor`` exact copies per distinct content, then
``image_near_dups`` / ``audio_near_dups`` end-to-end.

Distinct contents use key-seeded noise (not smooth gradients), so
distinct keys land ~32 hamming bits apart while copies land at 0 —
the planted pair count is exact: n_distinct * C(dup_factor, 2).
Media bytes are materialized ONCE into the object store so the timed
region is the near-dup pipeline (decode -> hash actor pool -> banded
fingerprint spine), not the generator.

Usage: taskset -c 0-7 python scripts/scale_media.py [n_docs] [dup_factor]
Prints one JSON line per experiment.
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rss_mb() -> int:
    return round(resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024)


def media_batch(n_distinct: int, img_format: str = "png"):
    """Batch fn: id -> (doc_id, image PNG/JPEG, audio WAV), content
    keyed by id % n_distinct. Key-seeded noise via splitmix-style
    mixing keeps the generator deterministic and vectorizable per key.
    JPEG copies are byte-identical per key, so planted-pair counts stay
    exact through the lossy codec."""

    def fn(batch: pa.Table) -> pa.Table:
        from patito_ray.functions import codecs as cx

        ids = batch.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
        images, audios = [], []
        for i in ids:
            key = int(i) % n_distinct
            rng = np.random.default_rng(key)
            img = rng.integers(0, 256, (12, 16, 3), dtype=np.uint8)
            if img_format == "jpeg":
                images.append(cx.encode_jpeg(img, quality=85))
            else:
                images.append(cx.encode_png(img))
            # audio: key-seeded piecewise energy profile (64 windows of
            # 16 samples, amplitudes drawn per window) -> distinct keys
            # get distinct energy fingerprints
            amps = rng.uniform(500.0, 20000.0, 64)
            w = (np.repeat(amps, 16) * np.sin(np.arange(1024) * 0.7)).astype(
                np.int16
            )
            audios.append(cx.encode_wav(w, 8000))
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "image": pa.array(images, type=pa.binary()),
                "audio": pa.array(audios, type=pa.binary()),
            }
        )

    return fn


def main() -> None:
    img_format = "jpeg" if "--jpeg" in sys.argv else "png"
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_docs = int(args[0]) if len(args) > 0 else 100_000
    dup_factor = int(args[1]) if len(args) > 1 else 10
    n_distinct = n_docs // dup_factor
    planted = n_distinct * (dup_factor * (dup_factor - 1) // 2)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    import ray.data as rd

    from patito_ray.functions.multimodal import audio_near_dups, image_near_dups

    media = (
        rd.range(n_docs, override_num_blocks=64)
        .map_batches(media_batch(n_distinct, img_format), batch_format="pyarrow", batch_size=4096)
        .materialize()
    )

    for name, op, fp_col in (
        ("image_near_dups", image_near_dups, "phash"),
        ("audio_near_dups", audio_near_dups, "afp"),
    ):
        t0 = time.time()
        pairs = op(media, max_hamming=3, concurrency=8).count()
        wall = round(time.time() - t0, 1)
        print(
            json.dumps(
                {
                    "experiment": name,
                    "img_format": img_format,
                    "n_docs": n_docs,
                    "dup_factor": dup_factor,
                    "planted_pairs": planted,
                    "found_pairs": pairs,
                    "wall_sec": wall,
                    "docs_per_sec": round(n_docs / wall),
                    "driver_rss_mb": _rss_mb(),
                }
            ),
            flush=True,
        )
        assert pairs >= planted, (pairs, planted)

    ray.shutdown()


if __name__ == "__main__":
    main()
