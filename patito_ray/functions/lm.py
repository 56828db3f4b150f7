"""Unigram language-model quality scoring.

The classic cheap "does this read like language from this corpus?"
signal (CCNet and its descendants use a KenLM n-gram model; the
unigram case is the same pipeline shape with a vocabulary instead of
an n-gram table): TRAIN token statistics over a reference corpus in
one distributed pass, then SCORE every document by its average token
log-probability. Gibberish, boilerplate and wrong-language text score
far below corpus-typical prose.

Two stages, both streaming:

- ``train_unigram``: per-batch token counts (Arrow C++ group-by over
  the flattened token array) emitted as (token, count) partials and
  merged through `stages/agg.merge_partial_sums` — the adaptive
  driver-vs-distributed fold every grouped aggregate here uses. An
  optional ``max_vocab`` keeps the top-K tokens by (count, token)
  so the broadcast stays bounded on an open-vocabulary crawl; pruned
  tokens score as OOV, exactly like unseen ones.
- ``score_unigram``: the model (sorted token array + logprob array)
  broadcasts ONCE via ``ray.put``; each batch tokenizes, binary-
  searches its tokens against the vocab (the same searchsorted
  membership kernel as decontamination) and scatter-adds per-doc
  logprob sums. No shuffle anywhere.

Probabilities use add-one (Laplace) smoothing over the observed
vocabulary: p(tok) = (c(tok) + 1) / (N + V + 1), and OOV tokens get
p = 1 / (N + V + 1). Deterministic, so the SQL oracle reproduces the
exact numbers (rounded to 1e-6 — float64 ln/sum noise is ~1e-12).
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def train_unigram(
    ds: Any, text_col: str = "text", max_vocab: int | None = None
) -> dict[str, Any]:
    """One-pass token counting; returns the model dict
    {tokens: sorted np.array(str), logp: np.float64 array,
    oov_logp: float, n_tokens: int, vocab: int}."""

    def partial(t: pa.Table) -> pa.Table:
        from patito_ray.functions.tfidf import re2_split_tokens

        text = t.column(text_col)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        low = pc.utf8_lower(pc.fill_null(text, ""))
        flat, _, _ = re2_split_tokens(low)
        g = pa.table({"token": flat}).group_by(["token"]).aggregate(
            [("token", "count")]
        )
        return pa.table(
            {
                "token": g.column("token"),
                "count": pc.cast(g.column("token_count"), pa.int64()),
            }
        )

    from patito_ray.stages.agg import merge_partial_sums

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    merged = merge_partial_sums(parts, keys=["token"], sums=["count"])
    if not isinstance(merged, pa.Table):
        # huge open vocabulary: the model must still fit the driver to
        # broadcast — callers pass max_vocab; we pull the counts here
        from patito_ray.stages.agg import collect_table

        merged = collect_table(
            merged,
            pa.schema([("token", pa.string()), ("count", pa.int64())]),
        )
    tab = merged.select(["token", "count"]).combine_chunks()
    n_total = int(pc.sum(tab.column("count")).as_py() or 0)
    if max_vocab is not None and tab.num_rows > max_vocab:
        # top-K by (count desc, token asc) — deterministic; Arrow-side
        # sort/take keeps the (possibly open-crawl-sized) vocabulary out
        # of Python objects
        idx = pc.sort_indices(
            tab, sort_keys=[("count", "descending"), ("token", "ascending")]
        )[:max_vocab]
        tab = tab.take(idx)
    tab = tab.take(pc.sort_indices(tab, sort_keys=[("token", "ascending")]))
    tokens = tab.column("token").to_numpy(zero_copy_only=False)
    counts = tab.column("count").to_numpy(zero_copy_only=False).astype(np.int64)
    v = len(tokens)
    denom = float(n_total + v + 1)
    logp = np.log((counts + 1).astype(np.float64) / denom)
    return {
        "tokens": tokens.astype(str),
        "logp": logp,
        "oov_logp": float(np.log(1.0 / denom)),
        "n_tokens": n_total,
        "vocab": v,
    }


def score_unigram(
    ds: Any,
    model: dict[str, Any],
    text_col: str = "text",
    out_col: str = "lm_logprob",
) -> Any:
    """Append per-row token count + average token log-probability
    (0.0 for empty docs, null text -> null score)."""
    import ray

    ref = ray.put(
        {
            "tokens": pa.array(
                [str(s) for s in model["tokens"]], type=pa.string()
            ),
            "logp": np.asarray(model["logp"], dtype=np.float64),
            "oov": float(model["oov_logp"]),
        }
    )

    def score(t: pa.Table) -> pa.Table:
        from patito_ray.functions.tfidf import re2_split_tokens

        m = ray.get(ref)
        text = t.column(text_col)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        valid = pc.is_valid(text).to_numpy(zero_copy_only=False)
        low = pc.utf8_lower(pc.fill_null(text, ""))
        flat, row_idx, _ = re2_split_tokens(low)
        # vocab lookup is one C++ hash probe per token (index_in),
        # never a Python loop
        idx = pc.index_in(flat, value_set=m["tokens"])
        idx_np = idx.to_numpy(zero_copy_only=False)
        hit = ~np.isnan(idx_np)
        lp = np.full(len(idx_np), m["oov"], dtype=np.float64)
        if hit.any():
            lp[hit] = m["logp"][idx_np[hit].astype(np.int64)]
        sums = np.zeros(len(t), dtype=np.float64)
        np.add.at(sums, row_idx, lp)
        n_tok = np.zeros(len(t), dtype=np.int64)
        np.add.at(n_tok, row_idx, 1)
        avg = np.where(n_tok > 0, sums / np.maximum(n_tok, 1), 0.0)
        return t.append_column(
            "n_lm_tokens", pa.array(n_tok, type=pa.int64(), mask=~valid)
        ).append_column(
            out_col, pa.array(avg, type=pa.float64(), mask=~valid)
        )

    return ds.map_batches(score, batch_format="pyarrow", batch_size=None)
