"""Scale harness for the round-3 text operators: cross-document line
dedup, data mixing, and the quality classifier.

Corpus: n deterministic multi-line docs (the bench word-pool generator
with tokens as lines — ~80 lines/doc, so 1M docs = ~80M line
occurrences; the distinct-line set is the word pool plus one unique
number-line per doc, ~1M distinct hashes). The classifier trains on a
deterministic 3% sample (the documented shape: a linear model saturates
long before crawl scale; only the sample is materialized) and scores
the FULL corpus in one streaming pass.

Usage: python scripts/scale_text.py [n_docs]
Prints one JSON line per experiment.
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time

import pyarrow as pa
import pyarrow.compute as pc

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def doc_batch(batch: pa.Table) -> pa.Table:
    from patito_ray.generate import page_texts

    ids = batch.column("id").to_numpy(zero_copy_only=False)
    texts = pa.array(page_texts(ids.astype(__import__("numpy").int64)))
    src = pc.binary_join_element_wise(
        pa.array(["src"] * len(ids)),
        pc.cast(pa.array(ids % 20), pa.string()),
        "",
    )
    return pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "text": pc.replace_substring(texts, " ", "\n"),
            "source": src,
        }
    )


def _rss_mb() -> int:
    return round(resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    import ray.data as rd

    from patito_ray.functions.classifier import (
        featurize,
        score_logreg,
        train_logreg,
    )
    from patito_ray.functions.dedup import remove_frequent_lines
    from patito_ray.functions.sampling import deterministic_sample, mix_sources

    ds = (
        rd.range(n_docs, override_num_blocks=128)
        .map_batches(doc_batch, batch_format="pyarrow", batch_size=None)
        .materialize()
    )

    # --- line dedup ---
    t0 = time.time()
    cleaned = remove_frequent_lines(ds, min_count=5)
    from ray.data.aggregate import Sum

    removed = cleaned.aggregate(Sum("n_removed"))["sum(n_removed)"]
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "experiment": "line_dedup",
                "n_docs": n_docs,
                "lines_removed": int(removed),
                "sec": round(wall, 2),
                "docs_per_sec": round(n_docs / wall),
                "driver_peak_rss_mb": _rss_mb(),
            }
        ),
        flush=True,
    )

    # --- data mixing ---
    t0 = time.time()
    mixed = mix_sources(
        ds,
        key_col="doc_id",
        source_col="source",
        weights={"src0": 0.5, "src1": 0.3, "src2": 0.2},
        target_rows=n_docs // 10,
    ).count()
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "experiment": "mix_sources",
                "n_docs": n_docs,
                "kept": int(mixed),
                "sec": round(wall, 2),
                "docs_per_sec": round(n_docs / wall),
                "driver_peak_rss_mb": _rss_mb(),
            }
        ),
        flush=True,
    )

    # --- classifier: train on 3% sample, score the full corpus ---
    dim = 1 << 16

    # weak label: doc contains the pool token 'water' (~55% positive —
    # pure feature-presence detection, the lexicon-distillation shape)
    def lab(t: pa.Table) -> pa.Table:
        has = pc.match_substring_regex(t.column("text"), r"(^|\n)water(\n|$)")
        return t.append_column("y01", pc.cast(has, pa.int8()))

    lds = ds.map_batches(lab, batch_format="pyarrow", batch_size=None)
    t0 = time.time()
    sample = deterministic_sample(lds, "doc_id", 0.03)
    # balanced single-feature label over L2-normalized ~160-feature
    # docs: the signal weight needs w*0.08 of margin, so more epochs
    # than the sharp-lexicon default (driver-path epochs are ~ms each
    # on the sample)
    w = train_logreg(
        featurize(sample, "text", "y01", dim=dim), dim=dim, epochs=2000, lr=2.0
    )
    t_train = time.time() - t0
    t0 = time.time()
    scored = score_logreg(lds, w, "text", dim=dim)

    def agree(t: pa.Table) -> pa.Table:
        ok = pc.equal(
            pc.greater(t.column("score"), 0.5),
            pc.cast(t.column("y01"), pa.bool_()),
        )
        return pa.table({"n_ok": [pc.sum(pc.cast(ok, pa.int64())).as_py() or 0]})

    n_ok = scored.map_batches(
        agree, batch_format="pyarrow", batch_size=None
    ).aggregate(Sum("n_ok"))["sum(n_ok)"]
    t_score = time.time() - t0
    print(
        json.dumps(
            {
                "experiment": "quality_classifier",
                "n_docs": n_docs,
                "train_sec": round(t_train, 2),
                "score_sec": round(t_score, 2),
                "score_docs_per_sec": round(n_docs / t_score),
                "accuracy": round(n_ok / n_docs, 6),
                "driver_peak_rss_mb": _rss_mb(),
            }
        ),
        flush=True,
    )

    ray.shutdown()


if __name__ == "__main__":
    main()
