"""BPE trainer/encoder vs a straightforward pure-Python reference.

The reference implements the textbook algorithm (Sennrich 2016): dict
pair counting over (word, count), max-count pair with smallest
(left_id, right_id) tie-break, leftmost-greedy merge; encoding applies
the lowest-rank present pair repeatedly. The vectorized engine must
reproduce the merge table and every encoding exactly, independent of
batching/partitioning, and the distributed training path must equal
the driver fast-path."""

import hypothesis.strategies as st
import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings

from patito_ray.functions.bpe import (
    BpeEncoder,
    _apply_merge,
    train_bpe,
)


# ---------- pure-Python reference ----------


def ref_train(word_counts, num_merges):
    alpha = sorted({c for w in word_counts for c in w})
    pieces = list(alpha)
    id_of = {c: i for i, c in enumerate(alpha)}
    words = {w: tuple(id_of[c] for c in w) for w in word_counts}
    merges = []
    for rank in range(num_merges):
        pairs = {}
        for w, syms in words.items():
            c = word_counts[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        m = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == m)
        new_id = len(pieces)
        pieces.append(pieces[best[0]] + pieces[best[1]])
        merges.append((rank, best[0], best[1], new_id, m))
        words = {
            w: _ref_merge_word(s, best[0], best[1], new_id)
            for w, s in words.items()
        }
    return merges, pieces


def _ref_merge_word(syms, a, b, new_id):
    out = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(new_id)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def ref_encode(word, alpha, merges):
    """merges: list of (rank, a, b, new_id). Repeatedly merge the
    lowest-rank present pair (all its occurrences, leftmost-greedy)."""
    id_of = {c: i for i, c in enumerate(alpha)}
    unknown_base = len(alpha) + len(merges) + 1
    syms = tuple(
        id_of.get(c, unknown_base + ord(c)) for c in word
    )
    by_pair = {(a, b): (rank, new_id) for rank, a, b, new_id, *_ in merges}
    while True:
        present = [
            by_pair[(syms[i], syms[i + 1])]
            for i in range(len(syms) - 1)
            if (syms[i], syms[i + 1]) in by_pair
        ]
        if not present:
            return list(syms)
        rank, new_id = min(present)
        a, b = next(
            (aa, bb) for (aa, bb), (r, n) in by_pair.items() if r == rank
        )
        syms = _ref_merge_word(syms, a, b, new_id)


# words over a tiny alphabet so merges interact heavily
words_strat = st.lists(
    st.text(alphabet="abc", min_size=1, max_size=8), min_size=1, max_size=20
)


@settings(max_examples=60, deadline=None)
@given(words=words_strat, num_merges=st.integers(min_value=0, max_value=12))
def test_train_matches_reference(ray_session, words, num_merges):
    import ray.data as rd

    docs = pa.table({"text": pa.array([" ".join(words)])})
    merges, vocab = train_bpe(
        rd.from_arrow(docs), num_merges=num_merges
    )
    wc = {}
    for w in words:
        wc[w] = wc.get(w, 0) + 1
    want_merges, want_pieces = ref_train(wc, num_merges)
    got = list(
        zip(
            merges.column("rank").to_pylist(),
            merges.column("left_id").to_pylist(),
            merges.column("right_id").to_pylist(),
            merges.column("new_id").to_pylist(),
            merges.column("pair_count").to_pylist(),
        )
    )
    assert got == want_merges
    assert vocab.column("piece").to_pylist() == want_pieces


@settings(max_examples=40, deadline=None)
@given(
    train_words=words_strat,
    encode_words=st.lists(
        st.text(alphabet="abcd", min_size=1, max_size=10),  # d is unseen
        min_size=1,
        max_size=8,
    ),
    num_merges=st.integers(min_value=0, max_value=10),
)
def test_encode_matches_reference(
    ray_session, train_words, encode_words, num_merges
):
    import ray.data as rd

    docs = pa.table({"text": pa.array([" ".join(train_words)])})
    merges, vocab = train_bpe(rd.from_arrow(docs), num_merges=num_merges)

    enc = BpeEncoder((merges, vocab))
    t = pa.table(
        {
            "doc_id": pa.array(range(len(encode_words)), type=pa.int64()),
            "text": pa.array(encode_words),
        }
    )
    out = enc(t)

    alpha = sorted({c for w in train_words for c in w})
    m = list(
        zip(
            merges.column("rank").to_pylist(),
            merges.column("left_id").to_pylist(),
            merges.column("right_id").to_pylist(),
            merges.column("new_id").to_pylist(),
        )
    )
    for i, w in enumerate(encode_words):
        want = ref_encode(w, alpha, m)
        got = out.column("bpe_ids")[i].as_py()
        assert got == want, (w, got, want)
        assert out.column("n_bpe")[i].as_py() == len(want)


def test_encode_multi_token_docs_and_batch_independence(ray_session):
    import ray.data as rd

    corpus = ["the cat sat", "the the cat", "a cat sat sat on the mat"] * 4
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(corpus)), type=pa.int64()),
            "text": pa.array(corpus),
        }
    )
    merges, vocab = train_bpe(rd.from_arrow(docs), num_merges=20)

    from patito_ray.functions.bpe import bpe_encode_dataset

    got = {}
    for blocks in (1, 6):
        ds = rd.from_arrow(docs).repartition(blocks)
        rows = bpe_encode_dataset(
            ds, merges, vocab, concurrency=2
        ).take_all()
        got[blocks] = sorted(
            (r["doc_id"], tuple(r["bpe_ids"]), r["n_bpe"]) for r in rows
        )
    assert got[1] == got[6]

    # per-doc encodings equal the single-word reference, concatenated
    alpha = sorted({c for t in corpus for c in t if c != " "})
    m = list(
        zip(
            merges.column("rank").to_pylist(),
            merges.column("left_id").to_pylist(),
            merges.column("right_id").to_pylist(),
            merges.column("new_id").to_pylist(),
        )
    )
    for doc_id, ids, n in got[1]:
        want = []
        for w in corpus[doc_id].split():
            want.extend(ref_encode(w, alpha, m))
        assert list(ids) == want
        assert n == len(want)


def test_distributed_training_parity(ray_session, monkeypatch):
    """Force the per-round distributed path; the merge table must be
    identical to the driver fast-path's."""
    import ray.data as rd

    import patito_ray.validation.engine as eng

    corpus = ["lower lowest low newer newest new wider widest"] * 3
    docs = pa.table({"text": pa.array(corpus)})
    m_fast, v_fast = train_bpe(rd.from_arrow(docs), num_merges=15)

    monkeypatch.setattr(eng, "_DRIVER_FASTPATH_BYTES", 0)
    m_dist, v_dist = train_bpe(
        rd.from_arrow(docs).repartition(4), num_merges=15
    )
    assert m_fast.equals(m_dist)
    assert v_fast.equals(v_dist)


def test_min_word_count_prunes_training_only(ray_session):
    import ray.data as rd

    docs = pa.table({"text": pa.array(["aa aa aa zz"])})
    merges, vocab = train_bpe(
        rd.from_arrow(docs), num_merges=3, min_word_count=2
    )
    # 'zz' (count 1) never contributes a pair; 'aa' does
    pieces = vocab.column("piece").to_pylist()
    assert "aa" in pieces and "zz" not in pieces
    # encoding still handles the pruned word (as characters)
    enc = BpeEncoder((merges, vocab))
    out = enc(pa.table({"text": pa.array(["zz"])}))
    assert out.column("n_bpe")[0].as_py() == 2


def test_apply_merge_overlap_is_leftmost_greedy():
    sym = np.array([1, 1, 1, 1, 1], dtype=np.int64)
    boundary = np.array([False, False, False, False, True])
    out, bd, _ = _apply_merge(sym, boundary, None, 1, 1, 9)
    assert out.tolist() == [9, 9, 1]
    assert bd.tolist() == [False, False, True]
    # across a word boundary nothing fuses
    sym = np.array([1, 1], dtype=np.int64)
    boundary = np.array([True, True])
    out, _, _ = _apply_merge(sym, boundary, None, 1, 1, 9)
    assert out.tolist() == [1, 1]


def test_edges(ray_session):
    import ray.data as rd

    docs = pa.table({"text": pa.array(["x y z"])})
    with pytest.raises(ValueError, match="num_merges"):
        train_bpe(rd.from_arrow(docs), num_merges=-1)
    with pytest.raises(ValueError, match="min_word_count"):
        train_bpe(rd.from_arrow(docs), min_word_count=0)
    # fewer possible merges than requested: stops early, no crash
    merges, vocab = train_bpe(rd.from_arrow(docs), num_merges=50)
    assert merges.num_rows == 0  # single chars only, no within-word pairs
    # empty text still encodes
    enc = BpeEncoder((merges, vocab))
    out = enc(pa.table({"text": pa.array(["", None])}))
    assert out.column("n_bpe").to_pylist() == [0, 0]
    assert out.column("bpe_ids").to_pylist() == [[], []]
