"""Byte-pair-encoding vocabulary training and encoding over a Dataset.

Classic word-frequency BPE (Sennrich, Haddow & Birch, "Neural Machine
Translation of Rare Words with Subword Units", ACL 2016 — a public
technique): the corpus collapses to a (distinct word, count) table via
one distributed counting pass, and training then runs over that table,
never over the raw corpus. Each merge round counts adjacent symbol
pairs weighted by word frequency, picks the most frequent pair
(deterministic tie-break: lexicographically smallest (left_id,
right_id)), and fuses it everywhere.

Scale shape:
- word counting is the existing ``tfidf.term_counts`` partial-sum pass
  (per-batch value_counts -> adaptive merge) — the only full-corpus
  scan;
- training is adaptive like the quality classifier: when the distinct
  word table fits the 256 MB driver budget the whole merge loop runs
  locally on ONE flat int32 symbol array (vectorized pair counting via
  packed uint64 keys + np.unique, vectorized leftmost-greedy merge via
  run-parity selection — no Python per word or per char); beyond the
  budget each round is one map_batches of partial pair counts over the
  word-table Dataset + an argmax on the merged (key, count) table,
  then one map_batches applying the merge — identical kernels,
  parity-tested;
- encoding is an embarrassingly-parallel actor-pool stage: the merge
  table broadcasts once via ``ray.put``, each batch encodes only its
  DISTINCT words (dictionary_encode; Zipf makes this a large win on
  web text) by replaying merges in ascending rank order with a
  rank-heap. Replaying in rank order equals the per-word
  lowest-rank-first definition, and one ascending pass suffices
  because a merge only ever CREATES pairs containing its own new
  symbol, whose merges were learned later and therefore rank higher.

No reference counterpart (JakobGM/patito has no tokenizer surface);
SQL cannot express the merge recursion, so verification is a pure-
Python reference implementation (pytest: exact merge-sequence and
encoding equality) plus batch/partitioning-independence properties and
driver-vs-distributed training parity.
"""

from __future__ import annotations

import heapq
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_SHIFT = np.uint64(32)


def _codepoints(words: "list[str]") -> tuple[np.ndarray, np.ndarray]:
    """Flat uint32 codepoint array for all words + per-word lengths
    (in codepoints), fully vectorized via the utf-32 byte view."""
    joined = "".join(words)
    cp = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
    lens = np.fromiter((len(w) for w in words), dtype=np.int64, count=len(words))
    return cp, lens


def _sym_from_codepoints(
    cp: np.ndarray, alpha_cp: np.ndarray, unknown_base: "int | None"
) -> np.ndarray:
    """Map codepoints to symbol ids. The alphabet is codepoint-sorted,
    so id == searchsorted position. Unknown codepoints (absent from the
    training alphabet) map to ``unknown_base + codepoint`` — ids past
    every vocab id, so they never match a merge; pass ``None`` to
    require full coverage (training path)."""
    pos = np.searchsorted(alpha_cp, cp)
    safe = np.minimum(pos, alpha_cp.size - 1) if alpha_cp.size else pos
    known = alpha_cp.size > 0
    hit = (
        (pos < alpha_cp.size) & (alpha_cp[safe] == cp)
        if known
        else np.zeros(cp.size, dtype=bool)
    )
    if unknown_base is None:
        if not hit.all():
            missing = np.unique(cp[~hit])[:5]
            raise AssertionError(
                f"training words contain codepoints outside the computed "
                f"alphabet: {missing!r}"
            )
        return pos.astype(np.int64)
    out = pos.astype(np.int64)
    out[~hit] = np.int64(unknown_base) + cp[~hit].astype(np.int64)
    return out


def _boundaries(lens: np.ndarray, total: int) -> np.ndarray:
    """True at the LAST symbol of each word."""
    b = np.zeros(total, dtype=bool)
    if total:
        ends = np.cumsum(lens)
        b[ends[lens > 0] - 1] = True
    return b


def _pair_keys(sym: np.ndarray, boundary: np.ndarray) -> np.ndarray:
    if sym.size < 2:
        return np.empty(0, dtype=np.uint64)
    keys = (sym[:-1].astype(np.uint64) << _SHIFT) | sym[1:].astype(np.uint64)
    return keys[~boundary[:-1]]


def _weighted_pair_counts(
    sym: np.ndarray, boundary: np.ndarray, weight: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """(pair key, total weight) over adjacent within-word pairs;
    ``weight`` is the parent word's corpus count, repeated per
    position."""
    if sym.size < 2:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64)
    mask = ~boundary[:-1]
    keys = (sym[:-1].astype(np.uint64) << _SHIFT) | sym[1:].astype(np.uint64)
    keys = keys[mask]
    w = weight[:-1][mask]
    uk, inv = np.unique(keys, return_inverse=True)
    acc = np.zeros(uk.size, dtype=np.int64)
    np.add.at(acc, inv, w)
    return uk, acc


def _apply_merge(
    sym: np.ndarray,
    boundary: np.ndarray,
    weight: "np.ndarray | None",
    a: int,
    b: int,
    new_id: int,
) -> tuple[np.ndarray, np.ndarray, "np.ndarray | None"]:
    """Fuse every non-overlapping (a, b) occurrence left-to-right into
    ``new_id``. Vectorized leftmost-greedy: overlapping matches (e.g.
    'aaa' under merge (a,a)) form runs of consecutive match positions,
    and greedy keeps exactly the even offsets within each run."""
    if sym.size < 2:
        return sym, boundary, weight
    hit = (sym[:-1] == a) & (sym[1:] == b) & ~boundary[:-1]
    pos = np.flatnonzero(hit)
    if pos.size == 0:
        return sym, boundary, weight
    if a == b and pos.size > 1:
        # only equal-symbol merges can overlap
        run_start = np.concatenate(([True], np.diff(pos) != 1))
        run_id = np.cumsum(run_start) - 1
        first = pos[run_start]
        pos = pos[((pos - first[run_id]) % 2) == 0]
    sym = sym.copy()
    sym[pos] = new_id
    keep_mask = np.ones(sym.size, dtype=bool)
    keep_mask[pos + 1] = False
    boundary = boundary.copy()
    # the fused symbol inherits the dropped position's end-of-word flag
    boundary[pos] = boundary[pos + 1]
    sym = sym[keep_mask]
    boundary = boundary[keep_mask]
    if weight is not None:
        weight = weight[keep_mask]
    return sym, boundary, weight


def _best_pair(keys: np.ndarray, counts: np.ndarray) -> "tuple[int, int, int] | None":
    """Most frequent pair; ties break on the smallest packed key
    (lexicographically smallest (left_id, right_id)) so training is
    deterministic across partitionings."""
    if keys.size == 0:
        return None
    m = int(counts.max())
    if m < 1:
        return None
    best = int(keys[counts == m].min())
    return best >> 32, best & 0xFFFFFFFF, m


def _word_lists_table(
    offs: np.ndarray, flat: np.ndarray, cnt: pa.Array
) -> pa.Table:
    return pa.table(
        {
            "syms": pa.LargeListArray.from_arrays(
                pa.array(offs, type=pa.int64()),
                pa.array(flat.astype(np.int64), type=pa.int64()),
            ),
            "cnt": cnt,
        }
    )


def train_bpe(
    ds: Any,
    text_col: str = "text",
    num_merges: int = 100,
    min_word_count: int = 1,
) -> "tuple[pa.Table, pa.Table]":
    """Learn ``num_merges`` BPE merges from the corpus.

    Returns ``(merges, vocab)``:
      merges: (rank, left_id, right_id, new_id, pair_count) in training
        order;
      vocab: (id, piece) — single characters first in codepoint order,
        then merge outputs in rank order.

    ``min_word_count`` drops tail words from the TRAINING table (the
    standard web-scale control: training iterates over the distinct-
    word table, not the corpus). Encoding still handles unseen or rare
    words — they stay character pieces until a learned merge applies.
    """
    from patito_ray.functions.tfidf import term_counts
    from patito_ray.stages.agg import collect_table
    from patito_ray.validation.engine import _DRIVER_FASTPATH_BYTES

    if num_merges < 0:
        raise ValueError(f"num_merges must be >= 0, got {num_merges}")
    if min_word_count < 1:
        raise ValueError(f"min_word_count must be >= 1, got {min_word_count}")

    wc = term_counts(ds, text_col=text_col)
    distributed = not isinstance(wc, pa.Table)
    if distributed:
        wc_ds = wc.materialize()
        if wc_ds.size_bytes() <= _DRIVER_FASTPATH_BYTES:
            wc = collect_table(
                wc_ds, pa.schema([("tok", pa.string()), ("cnt", pa.int64())])
            )
            distributed = False
        else:
            wc = wc_ds

    # ---- alphabet: distinct characters, codepoint order ----
    def chars_of(t: pa.Table) -> pa.Table:
        ws = [v for v in t.column("tok").to_pylist() if v is not None]
        cp, _ = _codepoints(ws)
        return pa.table({"cp": pa.array(np.unique(cp).astype(np.int64))})

    if distributed:
        chars_t = collect_table(
            wc.map_batches(chars_of, batch_format="pyarrow", batch_size=None),
            pa.schema([("cp", pa.int64())]),
        )
        alpha_cp = np.unique(
            chars_t.column("cp").to_numpy(zero_copy_only=False)
        ).astype(np.uint32)
    else:
        cp_all, _ = _codepoints(wc.column("tok").to_pylist())
        alpha_cp = np.unique(cp_all)
    pieces: "list[str]" = [chr(int(c)) for c in alpha_cp]
    next_id = len(pieces)

    merges_rows: "list[tuple[int, int, int, int, int]]" = []

    if not distributed:
        words = wc.column("tok").to_pylist()
        counts = wc.column("cnt").to_numpy(zero_copy_only=False)
        if min_word_count > 1:
            keep = counts >= min_word_count
            words = [w for w, k in zip(words, keep) if k]
            counts = counts[keep]
        cp, lens = _codepoints(words)
        sym = _sym_from_codepoints(cp, alpha_cp, None)
        boundary = _boundaries(lens, int(cp.size))
        weight = np.repeat(np.asarray(counts, dtype=np.int64), lens)
        for rank in range(num_merges):
            keys, cnts = _weighted_pair_counts(sym, boundary, weight)
            best = _best_pair(keys, cnts)
            if best is None:
                break
            a, b, m = best
            merges_rows.append((rank, a, b, next_id, m))
            pieces.append(pieces[a] + pieces[b])
            sym, boundary, weight = _apply_merge(
                sym, boundary, weight, a, b, next_id
            )
            next_id += 1
    else:
        from patito_ray.stages.agg import merge_partial_sums

        def encode_words(t: pa.Table) -> pa.Table:
            toks = t.column("tok").to_pylist()
            cnt = t.column("cnt")
            if isinstance(cnt, pa.ChunkedArray):
                cnt = cnt.combine_chunks()
            if min_word_count > 1:
                keep_np = (
                    cnt.to_numpy(zero_copy_only=False) >= min_word_count
                )
                toks = [w for w, k in zip(toks, keep_np) if k]
                cnt = cnt.filter(pa.array(keep_np))
            cp, lens = _codepoints(toks)
            flat = _sym_from_codepoints(cp, alpha_cp, None)
            offs = np.zeros(len(toks) + 1, dtype=np.int64)
            np.cumsum(lens, out=offs[1:]) if len(toks) else None
            return _word_lists_table(offs, flat, cnt)

        word_ds = wc.map_batches(
            encode_words, batch_format="pyarrow", batch_size=None
        ).materialize()

        def batch_state(t: pa.Table):
            lists = t.column("syms")
            if isinstance(lists, pa.ChunkedArray):
                lists = lists.combine_chunks()
            flat = lists.flatten().to_numpy(zero_copy_only=False)
            lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
            cnts = t.column("cnt").to_numpy(zero_copy_only=False)
            boundary = _boundaries(lens.astype(np.int64), int(flat.size))
            weight = np.repeat(cnts.astype(np.int64), lens)
            return flat, boundary, weight, lens

        for rank in range(num_merges):

            def partial(t: pa.Table) -> pa.Table:
                s, bd, w, _ = batch_state(t)
                k, c = _weighted_pair_counts(s, bd, w)
                return pa.table(
                    {
                        "key": pa.array(k.view(np.int64), type=pa.int64()),
                        "cnt": pa.array(c),
                    }
                )

            merged = merge_partial_sums(
                word_ds.map_batches(
                    partial, batch_format="pyarrow", batch_size=None
                ),
                ["key"],
                ["cnt"],
            )
            if not isinstance(merged, pa.Table):
                merged = collect_table(
                    merged,
                    pa.schema([("key", pa.int64()), ("cnt", pa.int64())]),
                )
            keys = (
                merged.column("key").to_numpy(zero_copy_only=False).view(np.uint64)
            )
            cnts = merged.column("cnt").to_numpy(zero_copy_only=False)
            best = _best_pair(keys, cnts)
            if best is None:
                break
            a, b, m = best
            new_id = next_id
            merges_rows.append((rank, a, b, new_id, m))
            pieces.append(pieces[a] + pieces[b])
            next_id += 1

            def apply(t: pa.Table, a=a, b=b, new_id=new_id) -> pa.Table:
                s, bd, w, lens = batch_state(t)
                s2, bd2, _ = _apply_merge(s, bd, w, a, b, new_id)
                n_words = int(lens.size)
                offs = np.zeros(n_words + 1, dtype=np.int64)
                if s2.size:
                    # word index per surviving position, from boundaries
                    word_of = np.cumsum(bd2) - bd2
                    np.add.at(offs, word_of + 1, 1)
                    offs = np.cumsum(offs)
                return _word_lists_table(offs, s2, t.column("cnt"))

            word_ds = word_ds.map_batches(
                apply, batch_format="pyarrow", batch_size=None
            ).materialize()

    merges = pa.table(
        {
            "rank": pa.array([r[0] for r in merges_rows], type=pa.int64()),
            "left_id": pa.array([r[1] for r in merges_rows], type=pa.int64()),
            "right_id": pa.array([r[2] for r in merges_rows], type=pa.int64()),
            "new_id": pa.array([r[3] for r in merges_rows], type=pa.int64()),
            "pair_count": pa.array(
                [r[4] for r in merges_rows], type=pa.int64()
            ),
        }
    )
    vocab = pa.table(
        {
            "id": pa.array(range(len(pieces)), type=pa.int64()),
            "piece": pa.array(pieces, type=pa.string()),
        }
    )
    return merges, vocab


def _encode_distinct(
    words: "list[str]",
    alpha_cp: np.ndarray,
    merge_rank: "dict[int, tuple[int, int]]",
    rank_to_pair: "dict[int, tuple[int, int, int]]",
    unknown_base: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Encode distinct words by replaying merges in ascending rank order
    on one flat array. Returns (flat ids, per-word lengths)."""
    if not words:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    cp, lens = _codepoints(words)
    sym = _sym_from_codepoints(cp, alpha_cp, unknown_base)
    boundary = _boundaries(lens, int(cp.size))

    present = np.unique(_pair_keys(sym, boundary))
    heap = [
        merge_rank[int(k)][0] for k in present if int(k) in merge_rank
    ]
    heapq.heapify(heap)
    done: "set[int]" = set()
    while heap:
        rank = heapq.heappop(heap)
        if rank in done:
            continue
        done.add(rank)
        a, b, new_id = rank_to_pair[rank]
        before = sym.size
        sym, boundary, _ = _apply_merge(sym, boundary, None, a, b, new_id)
        if sym.size == before:
            continue
        # new pairs can only involve new_id (ranks strictly above this
        # one, so the single ascending pass stays exact)
        at = np.flatnonzero(sym == new_id)
        left_ok = at > 0
        if left_ok.any():
            la = at[left_ok]
            lk = (sym[la - 1].astype(np.uint64) << _SHIFT) | np.uint64(new_id)
            lk = lk[~boundary[la - 1]]
        else:
            lk = np.empty(0, dtype=np.uint64)
        right_ok = (at + 1 < sym.size) & ~boundary[at]
        ra = at[right_ok]
        rk = (np.uint64(new_id) << _SHIFT) | sym[ra + 1].astype(np.uint64)
        for k in np.unique(np.concatenate((lk, rk))):
            v = merge_rank.get(int(k))
            if v is not None and v[0] not in done:
                heapq.heappush(heap, v[0])

    # per-word encoded lengths from the surviving boundaries
    word_of = np.cumsum(boundary) - boundary
    out_lens = np.zeros(len(words), dtype=np.int64)
    np.add.at(out_lens, word_of[: sym.size], 1) if sym.size else None
    return sym, out_lens


class BpeEncoder:
    """Actor-pool encode stage: the merge model is parsed once per
    actor (from a ``ray.ObjectRef`` resolved lazily in the first batch,
    so the tables broadcast through the object store instead of riding
    every task spec); each batch dictionary-encodes its tokens and
    encodes DISTINCT words only."""

    def __init__(
        self,
        model: Any,
        text_col: str = "text",
        out_col: str = "bpe_ids",
        count_col: str = "n_bpe",
    ):
        self._model = model
        self._resolved = False
        self.text_col = text_col
        self.out_col = out_col
        self.count_col = count_col

    def _resolve(self) -> None:
        import ray

        model = self._model
        if isinstance(model, ray.ObjectRef):
            model = ray.get(model)
        merges, vocab = model
        pieces = vocab.column("piece").to_pylist()
        n_alpha = len(pieces) - merges.num_rows
        self.alpha_cp = np.array(
            [ord(p) for p in pieces[:n_alpha]], dtype=np.uint32
        )
        self.unknown_base = len(pieces) + 1
        ranks = merges.column("rank").to_pylist()
        lefts = merges.column("left_id").to_pylist()
        rights = merges.column("right_id").to_pylist()
        news = merges.column("new_id").to_pylist()
        self.merge_rank = {
            (int(l) << 32) | int(r): (int(rk), int(n))
            for rk, l, r, n in zip(ranks, lefts, rights, news)
        }
        self.rank_to_pair = {
            int(rk): (int(l), int(r), int(n))
            for rk, l, r, n in zip(ranks, lefts, rights, news)
        }
        self._resolved = True

    def __call__(self, t: pa.Table) -> pa.Table:
        if not self._resolved:
            self._resolve()
        from patito_ray.functions.tfidf import re2_split_tokens

        flat, parents, n_docs = re2_split_tokens(t.column(self.text_col))
        denc = flat.dictionary_encode()
        uniq_words = denc.dictionary.to_pylist()
        idx = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)

        enc_flat, enc_lens = _encode_distinct(
            uniq_words,
            self.alpha_cp,
            self.merge_rank,
            self.rank_to_pair,
            self.unknown_base,
        )
        enc_offs = np.zeros(enc_lens.size + 1, dtype=np.int64)
        np.cumsum(enc_lens, out=enc_offs[1:]) if enc_lens.size else None

        # gather each token's id run, then group by document
        tok_lens = (
            enc_lens[idx] if idx.size else np.empty(0, dtype=np.int64)
        )
        total = int(tok_lens.sum())
        starts = enc_offs[idx] if idx.size else np.empty(0, dtype=np.int64)
        tok_excl = np.concatenate(([0], np.cumsum(tok_lens)[:-1])) if idx.size else np.empty(0, dtype=np.int64)
        gather = (
            np.arange(total) + np.repeat(starts - tok_excl, tok_lens)
            if total
            else np.empty(0, dtype=np.int64)
        )
        all_ids = enc_flat[gather] if total else np.empty(0, dtype=np.int64)

        doc_tok = np.zeros(n_docs, dtype=np.int64)
        if idx.size:
            np.add.at(doc_tok, parents, tok_lens)
        offs = np.zeros(n_docs + 1, dtype=np.int64)
        np.cumsum(doc_tok, out=offs[1:])
        ids_col = pa.LargeListArray.from_arrays(
            pa.array(offs, type=pa.int64()),
            pa.array(all_ids, type=pa.int64()),
        )
        return t.append_column(self.out_col, ids_col).append_column(
            self.count_col, pa.array(doc_tok, type=pa.int64())
        )


def bpe_encode_dataset(
    ds: Any,
    merges: pa.Table,
    vocab: pa.Table,
    text_col: str = "text",
    out_col: str = "bpe_ids",
    count_col: str = "n_bpe",
    concurrency: int | None = None,
) -> Any:
    """Append BPE token ids (list<int64>) and a token count per row.
    The model broadcasts once via ``ray.put``; the callable carries
    only the ObjectRef and parses it lazily on the first batch.
    Default is stateless tasks (no actor-pool spin-up latency); pass
    ``concurrency`` for an actor pool when the vocab is large enough
    that a per-task model parse would dominate."""
    import ray

    ref = ray.put((merges, vocab))
    if concurrency:
        return ds.map_batches(
            BpeEncoder,
            fn_constructor_args=(ref,),
            fn_constructor_kwargs={
                "text_col": text_col,
                "out_col": out_col,
                "count_col": count_col,
            },
            batch_format="pyarrow",
            batch_size=4096,
            concurrency=concurrency,
        )
    return ds.map_batches(
        BpeEncoder(ref, text_col=text_col, out_col=out_col, count_col=count_col),
        batch_format="pyarrow",
        batch_size=4096,
    )
