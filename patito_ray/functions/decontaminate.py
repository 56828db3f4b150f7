"""Benchmark decontamination: flag or drop corpus documents that share
any token n-gram with a benchmark / evaluation set — the training-data
hygiene pass described publicly for GPT-3 (Brown et al. 2020, appendix
C: 13-gram overlap) and PaLM. The reference engine has no counterpart;
this is a training-pipeline operator the north rule calls for.

Scale shape (100 TB corpus, MB-scale benchmark):

- The benchmark side is tiny BY NATURE (eval sets are thousands of
  documents), so its distinct-gram set is computed in one streaming
  pass and broadcast ONCE via ``ray.put`` — never re-shipped per batch.
  A loud guard rejects benchmark gram sets that outgrow the broadcast
  budget (at which point this is no longer decontamination but a
  corpus-vs-corpus overlap join — use ``membership.bloom_semi_join``
  on the gram hashes instead).
- The corpus pass is ONE ``map_batches`` over an actor pool with ZERO
  exchange: each actor ``ray.get``s the broadcast once in ``__init__``
  (object-store read, zero-copy for the hash array) and builds the
  exact-confirm gram set once; each batch does a vectorized
  ``np.searchsorted`` membership test on 8-byte gram hashes, and only
  the (rare) hash hits are confirmed against the exact gram strings —
  so a 64-bit hash collision can never flag a clean document, and the
  result is bit-exact against the SQL oracle.
- Per-document overlap counts come from one ``np.bincount`` over the
  gram→row parent indices (``tfidf.ngram_with_parents``); tokenization
  is the shared RE2-exact ``\\S+`` kernel, so counts equal DuckDB's
  ``regexp_extract_all`` n-gram join row-for-row.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from patito_ray.functions.tfidf import ngram_with_parents
from patito_ray.state.sketches import hash64

_MAX_BROADCAST_BYTES = 256 << 20


def benchmark_grams(
    bench: Any,
    n: int,
    text_col: str = "text",
    max_bytes: int = _MAX_BROADCAST_BYTES,
) -> dict[str, Any]:
    """One streaming pass over the benchmark: distinct n-grams plus
    their sorted 64-bit hashes (the broadcast prefilter index)."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")

    def partial(t: pa.Table) -> pa.Table:
        grams, _ = ngram_with_parents(t.column(text_col), n)
        return pa.table({"gram": pc.unique(grams)})

    from patito_ray.stages.agg import collect_table

    parts = collect_table(
        bench.map_batches(partial, batch_format="pyarrow", batch_size=None),
        empty_schema=pa.schema([("gram", pa.string())]),
    )
    grams = pc.unique(parts.column("gram").combine_chunks())
    if grams.nbytes > max_bytes:
        raise ValueError(
            f"benchmark n-gram set is {grams.nbytes >> 20} MiB "
            f"(> {max_bytes >> 20} MiB broadcast budget) — this input is "
            "not an eval set; use membership.bloom_semi_join on gram "
            "hashes for corpus-vs-corpus overlap instead"
        )
    hashes = np.sort(hash64(grams)) if len(grams) else np.array([], dtype=np.uint64)
    return {"hashes": hashes, "grams": grams}


class _OverlapCounter:
    """Actor-pool stage: broadcast resolved + confirm set built ONCE
    per actor in ``__init__``; each ``__call__`` is vectorized."""

    def __init__(self, ref: Any, n: int, text_col: str, mode: str, id_col: str):
        import ray

        obj = ray.get(ref)
        self.hashes = obj["hashes"]
        # exact-confirm set: python set probes happen only on the rare
        # hash hits (true overlaps + ~0 collisions), never per gram
        self.confirm = set(obj["grams"].to_pylist())
        self.n = n
        self.text_col = text_col
        self.mode = mode
        self.id_col = id_col

    def _counts(self, t: pa.Table) -> np.ndarray:
        out = np.zeros(t.num_rows, dtype=np.int64)
        if self.hashes.size == 0 or t.num_rows == 0:
            return out
        grams, rows = ngram_with_parents(t.column(self.text_col), self.n)
        if len(grams) == 0:
            return out
        h = hash64(grams)
        pos = np.searchsorted(self.hashes, h)
        pos[pos == self.hashes.size] = 0  # out-of-range probes can't match
        cand = np.flatnonzero(self.hashes[pos] == h)
        if cand.size == 0:
            return out
        cand_grams = grams.take(pa.array(cand, type=pa.int64())).to_pylist()
        confirmed = cand[[g in self.confirm for g in cand_grams]]
        if confirmed.size:
            out += np.bincount(rows[confirmed], minlength=t.num_rows)
        return out

    def __call__(self, t: pa.Table) -> pa.Table:
        nov = self._counts(t)
        if self.mode == "flag":
            return t.append_column("n_overlap", pa.array(nov, type=pa.int64()))
        if self.mode == "drop":
            return t.filter(pa.array(nov == 0))
        keep = nov > 0
        return pa.table(
            {
                self.id_col: t.column(self.id_col).filter(pa.array(keep)),
                "n_overlap": pa.array(nov[keep], type=pa.int64()),
            }
        )


def decontaminate(
    ds: Any,
    bench: Any,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
    mode: str = "drop",
    concurrency: int | None = None,
    max_bytes: int = _MAX_BROADCAST_BYTES,
) -> Any:
    """Remove / flag corpus rows sharing any token ``n``-gram with
    ``bench``.

    ``mode``: ``"drop"`` → the clean corpus (rows with zero overlap,
    all columns); ``"flag"`` → every row plus an ``n_overlap`` int64
    column (gram POSITIONS whose gram is in the benchmark set);
    ``"overlap"`` → only contaminated rows as ``(id_col, n_overlap)``.

    Documents shorter than ``n`` tokens (or with null text) have no
    grams, hence zero overlap — they survive ``drop``, matching the
    SQL oracle's join semantics.
    """
    if mode not in ("drop", "flag", "overlap"):
        raise ValueError(f"mode must be drop|flag|overlap, got {mode!r}")
    import ray

    obj = benchmark_grams(bench, n, bench_text_col or text_col, max_bytes)
    ref = ray.put(obj)
    if concurrency is None:
        concurrency = max(2, min(8, int(ray.cluster_resources().get("CPU", 4)) // 2))
    return ds.map_batches(
        _OverlapCounter,
        fn_constructor_args=(ref, n, text_col, mode, id_col),
        batch_format="pyarrow",
        batch_size=None,
        concurrency=concurrency,
    )
