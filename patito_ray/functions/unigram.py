"""Unigram-LM (SentencePiece-style) subword vocabulary training and
encoding over a Dataset.

Kudo, "Subword Regularization: Improving Neural Network Translation
Models with Multiple Subword Candidates" (ACL 2018) — a public
technique. This is the deterministic hard-EM (Viterbi-count) variant:

- the corpus collapses to a (distinct word, count) table via the same
  distributed counting pass BPE uses (``tfidf.term_counts``) — the
  only full-corpus scan, everything after runs over the word table;
- the seed vocabulary is every substring of length <= ``max_piece_len``
  of the training words weighted by word frequency, pruned to
  ``seed_size`` by (weight desc, piece asc), plus every single
  character (characters are never pruned so any word stays encodable);
- each EM round: E-step segments every distinct word by Viterbi under
  the current piece log-probabilities (ties broken toward FEWER pieces
  then lexicographically smaller segmentation, making the counts
  deterministic) and accumulates word-count-weighted piece usage;
  M-step renormalizes log-probs and prunes the worst multi-char pieces
  by expected count until ``vocab_size`` remains;
- encoding replays the same Viterbi with the final model.

Scale shape (BPE precedent): when the word table fits the driver
budget the EM loop runs locally; beyond it each E-step is ONE
``map_batches`` over the word-table Dataset with the current
(piece -> logp) model broadcast via ``ray.put``, partial piece counts
merging through ``merge_partial_sums`` (the exchange is bounded by the
VOCABULARY, never the corpus). Encoding is an actor-pool stage: model
broadcast once, per-actor distinct-word memo (Zipf makes the cache hit
rate high on web text).

No reference counterpart (JakobGM/patito has no tokenizer surface);
SQL cannot express the EM recursion, so verification is an
independent pure-Python reference implementation (pytest: exact vocab,
log-prob, and encoding equality) plus planted-learnability and
local-vs-distributed parity tests.
"""

from __future__ import annotations

import math
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: driver-budget for the local EM fast path (shared convention)
_DRIVER_BYTES = 256 << 20


def _viterbi(word: str, logp: dict, max_len: int) -> "list[str] | None":
    """Best segmentation of ``word`` into vocabulary pieces: maximal
    total log-prob, ties toward fewer pieces, then lexicographically
    smallest piece sequence. None when unsegmentable (an unknown
    character with no single-char piece)."""
    n = len(word)
    # best[i] = (score, n_pieces, pieces_tuple) for word[:i]
    best: "list[tuple[float, int, tuple] | None]" = [None] * (n + 1)
    best[0] = (0.0, 0, ())
    for i in range(n):
        b = best[i]
        if b is None:
            continue
        for j in range(i + 1, min(n, i + max_len) + 1):
            piece = word[i:j]
            lp = logp.get(piece)
            if lp is None:
                continue
            cand = (b[0] + lp, b[1] + 1, b[2] + (piece,))
            cur = best[j]
            if (
                cur is None
                or cand[0] > cur[0]
                or (cand[0] == cur[0] and cand[1] < cur[1])
                or (cand[0] == cur[0] and cand[1] == cur[1] and cand[2] < cur[2])
            ):
                best[j] = cand
    out = best[n]
    return None if out is None else list(out[2])


def _seed_counts(words: "list[str]", counts: np.ndarray, max_len: int) -> dict:
    """Substring -> word-frequency-weighted occurrence count."""
    seed: dict = {}
    for w, c in zip(words, counts):
        c = int(c)
        n = len(w)
        for i in range(n):
            for j in range(i + 1, min(n, i + max_len) + 1):
                s = w[i:j]
                seed[s] = seed.get(s, 0) + c
    return seed


def _estep_counts(
    words: "list[str]", counts: np.ndarray, logp: dict, max_len: int
) -> dict:
    """Viterbi-count E-step over a word batch: piece -> expected count."""
    out: dict = {}
    for w, c in zip(words, counts):
        segs = _viterbi(w, logp, max_len)
        if segs is None:
            continue
        c = int(c)
        for p in segs:
            out[p] = out.get(p, 0) + c
    return out


def _normalize(counts: dict) -> dict:
    total = sum(counts.values())
    if total <= 0:
        return {p: 0.0 for p in counts}
    lt = math.log(total)
    return {p: math.log(c) - lt for p, c in counts.items() if c > 0}


def train_unigram(
    ds: Any,
    text_col: str = "text",
    vocab_size: int = 200,
    seed_size: int = 2000,
    max_piece_len: int = 8,
    em_rounds: int = 3,
    prune_frac: float = 0.75,
    min_word_count: int = 1,
    _force_distributed: bool = False,
) -> pa.Table:
    """Learn a unigram-LM piece vocabulary from the corpus.

    Returns (id, piece, logp) — single characters first in codepoint
    order, then multi-char pieces by (logp desc, piece asc). After each
    EM round the multi-char piece set shrinks to
    ``max(target, prune_frac * current)`` by expected count until
    ``vocab_size`` pieces remain (characters never prune).
    """
    from patito_ray.functions.tfidf import term_counts
    from patito_ray.stages.agg import collect_table

    if vocab_size < 1:
        raise ValueError(f"vocab_size must be >= 1, got {vocab_size}")
    if not (0.0 < prune_frac < 1.0):
        raise ValueError(f"prune_frac must be in (0, 1), got {prune_frac}")

    wc = term_counts(ds, text_col=text_col)
    distributed = not isinstance(wc, pa.Table)
    if distributed:
        wc_ds = wc.materialize()
        if not _force_distributed and wc_ds.size_bytes() <= _DRIVER_BYTES:
            wc = collect_table(
                wc_ds, pa.schema([("tok", pa.string()), ("cnt", pa.int64())])
            )
            distributed = False
        else:
            wc = wc_ds
    elif _force_distributed:
        import ray.data as rd

        wc = rd.from_arrow(wc)
        distributed = True

    wc_schema = pa.schema([("piece", pa.string()), ("c", pa.int64())])

    def _dict_table(d: dict) -> pa.Table:
        ks = sorted(d)
        return pa.table(
            {
                "piece": pa.array(ks, pa.string()),
                "c": pa.array([int(d[k]) for k in ks], pa.int64()),
            },
            schema=wc_schema,
        )

    def _merged_dict(mapper) -> dict:
        """Run ``mapper(words, counts) -> dict`` over the word table,
        merging the (piece, c) partials adaptively."""
        if not distributed:
            words = wc.column("tok").to_pylist()
            counts = wc.column("cnt").to_numpy(zero_copy_only=False)
            if min_word_count > 1:
                keep = counts >= min_word_count
                words = [w for w, k in zip(words, keep) if k]
                counts = counts[keep]
            return mapper(words, counts)

        from patito_ray.stages.agg import merge_partial_sums

        def partial(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "tok" not in t.column_names:
                return wc_schema.empty_table()
            words = t.column("tok").to_pylist()
            counts = t.column("cnt").to_numpy(zero_copy_only=False)
            if min_word_count > 1:
                keep = counts >= min_word_count
                words = [w for w, k in zip(words, keep) if k]
                counts = counts[keep]
            return _dict_table(mapper(words, counts))

        merged = merge_partial_sums(
            wc.map_batches(partial, batch_format="pyarrow", batch_size=None),
            ["piece"],
            ["c"],
        )
        if not isinstance(merged, pa.Table):
            merged = collect_table(merged, empty_schema=wc_schema)
        return dict(
            zip(
                merged.column("piece").to_pylist(),
                merged.column("c").to_pylist(),
            )
        )

    # ---- seed ----
    seed = _merged_dict(
        lambda ws, cs: _seed_counts(ws, cs, max_piece_len)
    )
    chars = sorted(p for p in seed if len(p) == 1)
    multi = [(p, c) for p, c in seed.items() if len(p) > 1]
    multi.sort(key=lambda pc_: (-pc_[1], pc_[0]))
    keep_multi = dict(multi[: max(0, seed_size - len(chars))])
    counts = {**{c: seed[c] for c in chars}, **keep_multi}
    logp = _normalize(counts)

    # ---- EM + prune ----
    target_multi = max(0, vocab_size - len(chars))
    for _ in range(max(1, em_rounds)):
        model = dict(logp)  # snapshot for the broadcast closure
        if distributed:
            import ray

            ref = ray.put(model)

            def mapper(ws, cs, _ref=ref):
                import ray as _ray

                return _estep_counts(ws, cs, _ray.get(_ref), max_piece_len)

        else:

            def mapper(ws, cs, _m=model):
                return _estep_counts(ws, cs, _m, max_piece_len)

        exp = _merged_dict(mapper)
        # characters always survive (fallback floor count 1)
        new_counts = {c: max(1, exp.get(c, 0)) for c in chars}
        cur_multi = [(p, exp.get(p, 0)) for p in logp if len(p) > 1]
        cur_multi = [(p, c) for p, c in cur_multi if c > 0]
        cur_multi.sort(key=lambda pc_: (-pc_[1], pc_[0]))
        n_keep = max(target_multi, int(len(cur_multi) * prune_frac))
        if len(cur_multi) > target_multi:
            cur_multi = cur_multi[:n_keep]
        new_counts.update(dict(cur_multi))
        logp = _normalize(new_counts)

    # final exact prune to the target
    final_multi = [(p, lp) for p, lp in logp.items() if len(p) > 1]
    final_multi.sort(key=lambda pl: (-pl[1], pl[0]))
    final_multi = final_multi[:target_multi]
    pieces = chars + [p for p, _ in final_multi]
    lps = [logp[p] for p in chars] + [lp for _, lp in final_multi]
    return pa.table(
        {
            "id": pa.array(np.arange(len(pieces), dtype=np.int64)),
            "piece": pa.array(pieces, pa.string()),
            "logp": pa.array(lps, pa.float64()),
        }
    )


class UnigramEncoder:
    """Actor-pool encode stage: the (piece -> (id, logp)) model binds
    once per actor; each batch segments only its DISTINCT words
    (per-actor memo — Zipf web text repeats words heavily)."""

    def __init__(self, model_ref: Any, text_col: str, out_col: str, ids: bool):
        import ray

        model = ray.get(model_ref) if not isinstance(model_ref, pa.Table) else model_ref
        self.text_col = text_col
        self.out_col = out_col
        self.ids = ids
        self.logp = dict(
            zip(model.column("piece").to_pylist(), model.column("logp").to_pylist())
        )
        self.id_of = dict(
            zip(model.column("piece").to_pylist(), model.column("id").to_pylist())
        )
        self.max_len = max((len(p) for p in self.logp), default=1)
        self._memo: dict = {}

    def _word_ids(self, w: str) -> "list[int]":
        hit = self._memo.get(w)
        if hit is None:
            segs = _viterbi(w, self.logp, self.max_len)
            if segs is None:
                # unknown chars: skip unencodable characters one by one
                segs = [ch for ch in w if ch in self.logp]
            hit = [self.id_of[p] for p in segs]
            self._memo[w] = hit
        return hit

    def __call__(self, t: pa.Table) -> pa.Table:
        from patito_ray.functions.tfidf import re2_split_tokens

        flat, rows, _ = re2_split_tokens(t.column(self.text_col))
        words = flat.to_pylist()
        n = t.num_rows
        per_row_ids: "list[list[int]]" = [[] for _ in range(n)]
        for w, r in zip(words, rows):
            per_row_ids[int(r)].extend(self._word_ids(w))
        if self.ids:
            col = pa.array(per_row_ids, pa.list_(pa.int64()))
        else:
            col = pa.array([len(x) for x in per_row_ids], pa.int64())
        return t.append_column(self.out_col, col)


def unigram_encode_dataset(
    ds: Any,
    model: pa.Table,
    text_col: str = "text",
    out_col: str = "piece_ids",
    ids: bool = True,
    concurrency: int = 4,
) -> Any:
    """Encode a Dataset with a trained unigram model (actor pool,
    model broadcast once via ``ray.put``)."""
    import ray

    ref = ray.put(model)
    return ds.map_batches(
        UnigramEncoder,
        fn_constructor_args=(ref, text_col, out_col, ids),
        batch_format="pyarrow",
        batch_size=None,
        concurrency=concurrency,
    )
