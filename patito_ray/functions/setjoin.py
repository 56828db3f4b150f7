"""Exact Jaccard-threshold set-similarity self-join via prefix
filtering (PPJoin-family blocking; Chaudhuri/Ganti/Kaushik "A
primitive operator for similarity joins", ICDE 2006 — public
technique).

Where MinHash answers "probably >= t" with tunable recall, this
operator answers EXACTLY: every id pair whose token-set (or word
n-gram-set) Jaccard is >= ``threshold``, with the exact score.

Recall argument (the prefix-filter lemma): order every document's
token set by one GLOBAL total order and keep only its first
``p = |x| - ceil(t * |x|) + 1`` tokens as blocking keys. If two sets
share NO prefix token, their intersection is at most
``min(|A| - p_A, |B| - p_B) < t * max(|A|, |B|) <= |A ∪ B| * t``, so
jaccard < t — hence every qualifying pair shares a prefix key and
blocking has exact recall. Precision is restored by the exact
vectorized verify (``dedup.verify_pairs_dataset``). The global order
used is (document frequency ascending, hash): rare tokens first makes
prefix buckets small; tokens with df == 1 can never produce a
collision at all, so the broadcast order map only carries df >= 2
entries.

Distributed shape (the dedup-family spine):

1. ``identity_groups``: distinct strings only — k copies of a page
   cost the blocking machinery one row (see groupident.py);
2. one pass computes token document frequencies as mergeable partials
   (exchange bounded by VOCABULARY, not corpus); the df >= 2 subset
   broadcasts once via ``ray.put`` as two sorted arrays;
3. one pass emits (prefix-token-hash, rep-id) rows — everything
   vectorized: ``_gram_hash_sets`` builds per-row sorted deduped hash
   sets, one lexsort orders tokens by (df, hash) within rows, segment
   arithmetic slices each row's prefix;
4. colliding keys -> partitioned pair formation -> exact verify, all
   shared with MinHash (``_colliding_subset`` / ``_bucket_pairs`` /
   ``verify_pairs_dataset``);
5. identical-string pairs (jaccard 1.0) come from the id groups;
   verified rep pairs expand back to id pairs (``cross_expand_pairs``).

Token-empty documents (whitespace-only text) never pair — they have
no prefix keys and are excluded from identical-pairing, matching the
SQL semantics where a doc with zero tokens joins nothing.
"""

from __future__ import annotations

import logging
from typing import Any

import numpy as np
import pyarrow as pa

_LOG = logging.getLogger(__name__)

#: collected df>=2 map rows above this emit a loud log — the broadcast
#: is 16 B per repeated token; a web-scale vocabulary of repeated
#: tokens (~10^8) costs ~1.6 GB object-store, still one object read
#: per task, but worth surfacing.
_DF_MAP_WARN_ROWS = 50_000_000


def _df_map(reps: Any, text_col: str, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Document frequencies of every token (hash) occurring in >= 2
    distinct documents, as (sorted uint64 hashes, int64 dfs)."""
    import polars as pl

    from patito_ray.functions.dedup import _gram_hash_sets
    from patito_ray.stages.agg import collect_table, merge_partial_sums

    def partial(t: pa.Table) -> pa.Table:
        _rows, h, _sizes = _gram_hash_sets(t.column(text_col), n)
        if len(h) == 0:
            return pa.table(
                {"h": pa.array([], type=pa.int64()), "df": pa.array([], type=pa.int64())}
            )
        uh, counts = np.unique(h, return_counts=True)
        return pa.table(
            {
                "h": pa.array(uh.view(np.int64), type=pa.int64()),
                "df": pa.array(counts.astype(np.int64), type=pa.int64()),
            }
        )

    merged = merge_partial_sums(
        reps.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["h"],
        ["df"],
    )
    if not isinstance(merged, pa.Table):
        merged = merged.map_batches(
            lambda t: t.filter(pl.from_arrow(t)["df"].gt(1).to_arrow())
            if t.num_rows
            else t,
            batch_format="pyarrow",
            batch_size=None,
        )
        merged = collect_table(
            merged,
            empty_schema=pa.schema([("h", pa.int64()), ("df", pa.int64())]),
        )
    h = merged.column("h").to_numpy(zero_copy_only=False).view(np.uint64)
    df = merged.column("df").to_numpy(zero_copy_only=False)
    keep = df > 1
    h, df = h[keep], df[keep]
    if len(h) > _DF_MAP_WARN_ROWS:
        _LOG.warning(
            "jaccard_threshold_pairs: df>=2 token map has %d entries "
            "(~%d MB broadcast)", len(h), len(h) * 16 // 2**20,
        )
    order = np.argsort(h)
    return h[order], df[order].astype(np.int64)


#: default pre-flight candidate budget: ~50M candidate verifications is
#: minutes of work; past it the corpus is almost certainly the dense
#: tiny-vocab regime where the exact join is Ω(output) and MinHash is
#: the right tool.
_DEFAULT_MAX_CANDIDATES = 50_000_000


def _estimate_candidate_volume(rows_ds: Any, cap: int = 2**62) -> int:
    """Exact candidate-pair volume Σ_key C(min(count, cap), 2) of the
    prefix blocking, from one (key -> count) partial merge (exchange
    bounded by the distinct-prefix-key vocabulary, never by pairs).
    With ``cap`` set to the caller's ``max_bucket`` this is precisely
    the number of per-key pairs `_bucket_pairs` will enumerate (it
    truncates buckets at max_bucket), so it prices the detonation
    BEFORE any pair forms — and a finite max_bucket that already
    bounds the cost does not spuriously trip the guard."""
    import polars as pl

    from patito_ray.stages.agg import merge_partial_sums

    sch = pa.schema([("key", pa.int64()), ("c", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return sch.empty_table()
        return (
            pl.DataFrame({"key": t.column("key").to_numpy(zero_copy_only=False)})
            .group_by("key")
            .agg(pl.len().cast(pl.Int64).alias("c"))
            .to_arrow()
            .cast(sch)
        )

    merged = merge_partial_sums(
        rows_ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["key"],
        ["c"],
    )
    if isinstance(merged, pa.Table):
        c = merged.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
        c = np.minimum(c, cap)
        return int((c * (c - 1) // 2).sum())
    vol_sch = pa.schema([("v", pa.int64())])

    def vol(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "c" not in t.column_names:
            return vol_sch.empty_table()
        c = t.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
        c = np.minimum(c, cap)
        return pa.table({"v": pa.array([int((c * (c - 1) // 2).sum())])},
                        schema=vol_sch)

    parts = merged.map_batches(
        vol, batch_format="pyarrow", batch_size=None
    ).take_all()  # one 8-byte row per block
    return int(sum(r["v"] for r in parts))


def jaccard_threshold_pairs(
    ds: Any,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    shingle_n: int = 1,
    max_bucket: int | None = None,
    max_collision_keys: int = 10_000_000,
    num_partitions: int | None = None,
    max_candidates: int | None = _DEFAULT_MAX_CANDIDATES,
) -> Any:
    """All id pairs whose lowercased RE2-token (``shingle_n=1``) or
    word-n-gram set Jaccard is >= ``threshold`` ->
    Dataset[a:int64, b:int64, jaccard:float64] (a < b, exact scores;
    identical strings score 1.0).

    ``max_bucket`` defaults to UNBOUNDED: this operator's contract is
    exactness, so prefix buckets are never truncated (truncation on a
    dense corpus was measured to silently drop 59% of true pairs).
    The worst case is a tiny shared vocabulary — every doc's prefix
    collides with every other's and candidates are Ω(output); that is
    inherent to the exact problem (the SQL oracle pays the same), and
    MinHash-LSH (``dedup_near``) is the approximate path for such
    corpora. On realistic web text (large vocab, sparse similarity)
    rare-token prefixes keep candidate volume near the true pair count
    — see ``scripts/scale_setjoin.py``. Set ``max_bucket`` to trade
    exactness for a hard per-bucket bound.

    ``max_candidates`` is the round-5 pre-flight guard: after the
    prefix pass (one vocabulary-bounded count merge, ZERO pairs
    formed) the exact candidate volume Σ_key C(count, 2) is computed;
    above the budget the join raises loudly, pointing at the MinHash
    path, instead of detonating quadratically on a dense corpus.
    ``max_candidates=None`` opts into unbounded exact cost."""
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    unbounded = max_bucket is None
    if unbounded:
        max_bucket = 2**62
    import ray

    from patito_ray.functions.dedup import (
        _bucket_pairs,
        _colliding_subset,
        _gram_hash_sets,
        verify_pairs_dataset,
    )
    from patito_ray.functions.groupident import (
        cross_expand_pairs,
        identity_groups,
        within_group_pairs,
    )

    groups = identity_groups(ds, id_col, text_col, num_partitions)
    # reps feed THREE consumers (df pass, prefix pass, verify payloads)
    # — pin them once instead of re-deriving from groups each time
    reps = groups.map_batches(
        lambda t: pa.table({id_col: t.column("rep"), text_col: t.column("txt")}),
        batch_format="pyarrow",
        batch_size=None,
    ).materialize()

    dfh, dfv = _df_map(reps, text_col, shingle_n)
    ref = ray.put({"h": dfh, "df": dfv})

    key_schema = pa.schema([("key", pa.int64()), (id_col, pa.int64())])

    def prefix_rows(t: pa.Table) -> pa.Table:
        rows, h, sizes = _gram_hash_sets(t.column(text_col), shingle_n)
        if len(h) == 0:
            return key_schema.empty_table()
        m = ray.get(ref)
        mh, mdf = m["h"], m["df"]
        if len(mh):
            pos = np.searchsorted(mh, h)
            pos = np.minimum(pos, len(mh) - 1)
            found = mh[pos] == h
            df = np.where(found, mdf[pos], 1)
        else:
            df = np.ones(len(h), dtype=np.int64)
        order = np.lexsort((h, df, rows))
        rows_s, h_s = rows[order], h[order]
        cum = np.concatenate(([0], np.cumsum(sizes)))
        rank = np.arange(len(rows_s)) - cum[rows_s]
        s = sizes[rows_s]
        # floor instead of ceil OVERESTIMATES the prefix by at most one
        # token on integer t*s — recall-safe, float-round-safe
        p = np.minimum(s, s - np.floor(threshold * s).astype(np.int64) + 1)
        keep = rank < p
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "key": pa.array(h_s[keep].view(np.int64), type=pa.int64()),
                id_col: pa.array(ids[rows_s[keep]], type=pa.int64()),
            },
            schema=key_schema,
        )

    rows_ds = reps.map_batches(
        prefix_rows, batch_format="pyarrow", batch_size=None
    ).materialize()
    if max_candidates is not None:
        est = _estimate_candidate_volume(rows_ds, cap=max_bucket)
        if est > max_candidates:
            raise ValueError(
                f"jaccard_threshold_pairs pre-flight: the prefix blocking "
                f"would form ~{est:,} candidate pairs (> max_candidates="
                f"{max_candidates:,}) — this corpus is in the dense "
                f"tiny-vocab regime where the EXACT join is Ω(output). "
                f"Use the approximate MinHash path "
                f"(dedup.minhash_candidate_pairs / dedup_near) or pass "
                f"max_candidates=None / a larger budget to accept the cost."
            )
    hits, n_keys = _colliding_subset(rows_ds, max_collision_keys)
    pairs = _bucket_pairs(hits, id_col, max_bucket, n_keys_hint=n_keys)
    rep_pairs = verify_pairs_dataset(
        reps, pairs, id_col, text_col, threshold=threshold, shingle_n=shingle_n
    )

    def has_tokens(txt: pa.Array) -> np.ndarray:
        return _gram_hash_sets(txt, shingle_n)[2] > 0

    ones = within_group_pairs(
        groups,
        {"jaccard": (1.0, pa.float64())},
        max_bucket,
        keep_mask_fn=has_tokens,
    )
    expanded = cross_expand_pairs(
        groups, rep_pairs, {"jaccard": pa.float64()}, max_bucket
    )
    return ones.union(expanded)
