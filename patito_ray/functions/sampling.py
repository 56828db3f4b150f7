"""Deterministic (shard-stable) sampling for training-data pipelines.

Membership depends only on (key, seed) — never on partitioning, block
order, or cluster size — so a resumed or re-partitioned run samples the
IDENTICAL subset, and two pipelines sampling the same table agree row
for row. The decision is one vectorized splitmix64 per row with a
uint64 threshold compare: embarrassingly parallel, no shuffle, no
state.

The hash is the public splitmix64 finalizer (Steele et al., "Fast
splittable pseudorandom number generators", OOPSLA 2014) — simple
enough to re-implement exactly in SQL, which is how the DuckDB oracle
verifies cross-engine parity bit for bit.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from patito_ray.functions.dedup import _splitmix

_U64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _threshold(fraction: float) -> np.uint64:
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    # 2^64 * fraction, saturating: fraction=1.0 keeps everything
    if fraction >= 1.0:
        return _U64
    return np.uint64(int(fraction * 2.0**64))


def _key_hashes(batch: pa.Table, key_col: str, seed: int) -> np.ndarray:
    keys = batch.column(key_col)
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    if not pa.types.is_integer(keys.type):
        raise TypeError(
            f"deterministic sampling needs an integer key column, got "
            f"{key_col!r}: {keys.type} (hash string keys to int64 first)"
        )
    if keys.null_count:
        # to_numpy would silently route the whole batch through float64
        # (NaN for nulls), corrupting every key above 2^53 — membership
        # would then depend on which batch a null landed in
        raise ValueError(
            f"sampling key column {key_col!r} contains {keys.null_count} "
            "null(s); sample membership must be a pure function of the key"
        )
    k = keys.to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
    return _splitmix(k ^ np.uint64(seed))


def sample_batch(
    batch: pa.Table, key_col: str, fraction: float, seed: int = 0
) -> pa.Table:
    """Keep rows where splitmix64(key ^ seed) < fraction * 2^64."""
    _threshold(fraction)  # validate even on the short-circuit path
    if fraction >= 1.0:
        # the strict '<' against the saturated threshold 2^64-1 would
        # drop the one key per seed whose hash is exactly 2^64-1
        return batch
    h = _key_hashes(batch, key_col, seed)
    return batch.filter(pa.array(h < _threshold(fraction)))


def deterministic_sample(
    ds: Any, key_col: str, fraction: float, seed: int = 0
) -> Any:
    """Shard-stable Bernoulli(fraction) sample of a Dataset by key."""
    _threshold(fraction)  # validate on the driver, not inside tasks
    return ds.map_batches(
        lambda t: sample_batch(t, key_col, fraction, seed),
        batch_format="pyarrow",
        batch_size=None,
    )


def stratified_sample(
    ds: Any,
    key_col: str,
    strata_col: str,
    fractions: Mapping[str, float],
    default_fraction: float = 0.0,
    seed: int = 0,
) -> Any:
    """Per-stratum deterministic sampling (e.g. keep 100% of low-resource
    languages, 10% of English). Rows whose stratum is not in
    ``fractions`` sample at ``default_fraction``. One vectorized
    index_in + threshold gather per batch — no shuffle, no groupby."""
    strata = list(fractions)
    thresholds = np.array(
        [_threshold(fractions[s]) for s in strata] + [_threshold(default_fraction)],
        dtype=np.uint64,
    )
    value_set = pa.array(strata, type=pa.string())

    # strict '<' against the saturated 2^64-1 threshold would drop the
    # one key per seed hashing to exactly 2^64-1: keep-all strata
    # (fraction >= 1.0) bypass the hash compare entirely
    keep_all = np.array(
        [fractions[s] >= 1.0 for s in strata] + [default_fraction >= 1.0]
    )

    def fn(batch: pa.Table) -> pa.Table:
        h = _key_hashes(batch, key_col, seed)
        idx = pc.index_in(batch.column(strata_col), value_set=value_set)
        # unmatched strata (null index) -> the trailing default slot
        slot = pc.fill_null(idx, len(strata)).to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(keep_all[slot] | (h < thresholds[slot])))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def split_thresholds(fractions: Mapping[str, float]) -> "list[int]":
    """Cumulative uint64 bucket boundaries for :func:`assign_splits`.

    Shared by the library kernel and the SQL oracle builder so both
    sides embed the IDENTICAL integers: the cumulative sum is plain
    left-to-right float addition and each boundary is
    ``int(cum * 2^64)`` (saturating at 2^64 once cum >= 1.0, so no key
    can fall past the final split through float round-down).
    """
    if not fractions:
        raise ValueError("assign_splits needs at least one split fraction")
    cum = 0.0
    out: list[int] = []
    for name, f in fractions.items():
        if f < 0:
            raise ValueError(f"fraction for split {name!r} must be >= 0, got {f}")
        cum += f
        out.append(2**64 if cum >= 1.0 else int(cum * 2.0**64))
    if cum > 1.0 + 1e-9:
        raise ValueError(f"split fractions sum to {cum}, must be <= 1")
    return out


def assign_splits(
    ds: Any,
    key_col: str,
    fractions: Mapping[str, float],
    seed: int = 0,
    split_col: str = "split",
) -> Any:
    """Deterministic train/val/test split: label each row with the split
    whose cumulative hash range contains ``splitmix64(key ^ seed)``.

    Membership is a pure function of (key, seed) — shard-stable, so a
    re-partitioned or resumed run assigns the identical labels, and a
    row can never leak between train and test across pipeline versions
    that keep the same seed. If the fractions sum to < 1, the remaining
    hash range gets a null label (rows held out of every split). One
    vectorized searchsorted per batch; no shuffle, no state.

    Composition rule: if an upstream stage already selected rows by
    ``splitmix64(key ^ s)`` (deterministic_sample, mix_sources, ...),
    pass a DIFFERENT seed here — reusing ``s`` makes the two decisions
    fully correlated (e.g. every sampling survivor has a small hash and
    lands in the first split).
    """
    names = list(fractions)
    bounds = split_thresholds(fractions)
    # 2^64 saturation cannot live in a uint64 searchsorted table; clamp
    # to 2^64-1 and remember whether the final split absorbs the one
    # key per seed hashing to exactly 2^64-1
    saturated = bounds[-1] == 2**64
    table = np.array(
        [min(b, 2**64 - 1) for b in bounds], dtype=np.uint64
    )
    # trailing null slot = the held-out hash range when fractions sum < 1
    labels = pa.array(names + [None], type=pa.string())

    def fn(batch: pa.Table) -> pa.Table:
        h = _key_hashes(batch, key_col, seed)
        # h < bounds[i] picks slot i: number of boundaries <= h
        slot = np.searchsorted(table, h, side="right")
        if saturated:
            # only h == 2^64-1 lands past the clamped final boundary,
            # and with cum >= 1.0 it belongs to the last split
            slot = np.minimum(slot, len(names) - 1)
        col = pc.take(labels, pa.array(slot.astype(np.int64), type=pa.int64()))
        return batch.append_column(split_col, col)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def sample_exact_k(
    ds: Any,
    key_col: str,
    k: int,
    seed: int = 0,
) -> Any:
    """Exactly ``min(k, n)`` rows, uniform over keys: the ``k`` globally
    smallest ``splitmix64(key ^ seed)`` values (hash collisions broken
    by key ascending, so the selection is a total order and bit-exact
    reproducible — the SQL oracle is ``ORDER BY h64, key LIMIT k``).

    Unlike :func:`deterministic_sample` (a Bernoulli coin per key whose
    output SIZE varies), this pins the sample size exactly — the shape
    evaluation sets and human-review batches need. Still shard-stable:
    membership depends only on the key population, never on
    partitioning (any batch composition prunes to the same global
    top-k).

    Scale shape: each batch keeps at most ``k`` rows (one vectorized
    lexsort), bounding the exchange at ``k x num_blocks`` rows; the
    finalize is a driver lexsort when that fits the 256 MB budget and a
    distributed ``sort().limit(k)`` beyond. Returns a Dataset with the
    input columns.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def prune(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("_h", pa.array([], type=pa.int64()))
        h = _key_hashes(t, key_col, seed)
        # order-preserving signed view so int64 sorts match uint64 order
        flipped = (h ^ np.uint64(1 << 63)).view(np.int64)
        if t.num_rows > k:
            keys = t.column(key_col).to_numpy(zero_copy_only=False)
            # full (hash, key) lexsort — argpartition on hash alone
            # could break a collision tie at the k-boundary by batch
            # position instead of by key
            order = np.lexsort((keys, flipped))[:k]
            t = t.take(pa.array(order.astype(np.int64)))
            flipped = flipped[order]
        return t.append_column("_h", pa.array(flipped, type=pa.int64()))

    pruned = ds.map_batches(
        prune, batch_format="pyarrow", batch_size=None
    ).materialize()

    from patito_ray.validation.engine import _DRIVER_FASTPATH_BYTES

    if pruned.size_bytes() <= _DRIVER_FASTPATH_BYTES:
        from patito_ray.stages.agg import collect_table

        t = collect_table(pruned, empty_schema=None) if pruned.count() else None
        if t is None or t.num_rows == 0:
            out = pruned  # empty input: pass the typed empty through
        else:
            keys = t.column(key_col).to_numpy(zero_copy_only=False)
            hh = t.column("_h").to_numpy(zero_copy_only=False)
            order = np.lexsort((keys, hh))[:k]
            import ray.data as rd

            out = rd.from_arrow(t.take(pa.array(order.astype(np.int64))))
    else:
        out = pruned.sort(["_h", key_col]).limit(k)
    return out.map_batches(
        lambda t: t.drop_columns(["_h"]) if "_h" in t.column_names else t,
        batch_format="pyarrow",
        batch_size=None,
    )


def cap_per_key(
    ds: Any,
    key_col: str,
    k: int,
    id_col: str = "doc_id",
    seed: int = 0,
    broadcast_limit_bytes: int = 256 * 1024 * 1024,
) -> Any:
    """Keep at most ``k`` rows per key — the 'no domain may contribute
    more than K documents' anti-spam cap. Selection within a key is the
    ``k`` smallest ``splitmix64(id ^ seed)`` values: a deterministic,
    shard-stable, unbiased size-k sample of each key's rows (a crawl
    re-run keeps the SAME representatives), with ties broken by id.

    Scale shape: only narrow (key, id, hash) rows ride the grouped
    top-k exchange (which prunes to k per key inside every batch before
    the shuffle); payload rows are then selected by kept id via the
    shared broadcast-or-copartition filter. A hot key costs k rows in
    the exchange, not its full row count.
    """
    from patito_ray.functions.dedup import _select_rows_by_ids
    from patito_ray.stages.topk import grouped_top_k

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def narrow(t: pa.Table) -> pa.Table:
        h = _key_hashes(t, id_col, seed)
        # flip the sign bit: int64 ascending order == uint64 ascending
        # order, so engines sorting the signed view agree with the SQL
        # oracle's unsigned ordering
        flipped = (h ^ np.uint64(1 << 63)).view(np.int64)
        return pa.table(
            {
                key_col: t.column(key_col),
                id_col: t.column(id_col),
                "_h": pa.array(flipped, type=pa.int64()),
            }
        )

    rows = ds.map_batches(narrow, batch_format="pyarrow", batch_size=None)
    kept = grouped_top_k(
        rows, group=key_col, value="_h", k=k, tie=id_col, descending=False
    ).select_columns([id_col])
    return _select_rows_by_ids(ds, kept, id_col, broadcast_limit_bytes)


def source_counts(
    ds: Any, source_col: str, sources: "list[str] | None" = None
) -> dict[str, int]:
    """Exact row counts per source value (optionally restricted to
    ``sources``) via per-batch value_counts partials and the adaptive
    partial-sum merge. The result is one (string, int) pair per mixture
    component — mixing weights name tens of sources, so restricting to
    them keeps the driver pull tiny even over a high-cardinality
    column."""
    from patito_ray.stages.agg import merge_partial_sums

    value_set = pa.array(sources, type=pa.string()) if sources is not None else None

    def partial(batch: pa.Table) -> pa.Table:
        col = batch.column(source_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if value_set is not None:
            col = col.filter(pc.is_in(col, value_set=value_set))
        vc = pc.value_counts(col)
        return pa.table(
            {
                source_col: vc.field("values"),
                "n": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    merged = merge_partial_sums(partials, [source_col], ["n"])
    if not isinstance(merged, pa.Table):
        from patito_ray.stages.agg import collect_table

        merged = collect_table(
            merged, pa.schema([(source_col, pa.string()), ("n", pa.int64())])
        )
    return dict(
        zip(
            merged.column(source_col).to_pylist(),
            merged.column("n").to_pylist(),
        )
    )


def mix_fractions(
    counts: Mapping[str, int],
    weights: Mapping[str, float],
    target_rows: int,
) -> dict[str, float]:
    """Per-source keep fractions realizing a target mixture: source s
    should contribute ~``target_rows * weights[s]`` rows, capped at
    availability (fraction saturates at 1.0 — an under-represented
    source cannot be upsampled by a filter; callers wanting oversampling
    need repetition, a different operator). Weights are taken as given,
    NOT renormalized: expected output size is
    sum(min(target*w, n_s)) <= target_rows."""
    if target_rows < 0:
        raise ValueError(f"target_rows must be >= 0, got {target_rows}")
    fractions: dict[str, float] = {}
    for s, w in weights.items():
        if w < 0:
            raise ValueError(f"weight for {s!r} must be >= 0, got {w}")
        n = counts.get(s, 0)
        if n > 0:
            # literal op order mirrors the SQL oracle: (target * w) / n
            fractions[s] = min(1.0, (float(target_rows) * w) / float(n))
    return fractions


def mix_sources(
    ds: Any,
    key_col: str,
    source_col: str,
    weights: Mapping[str, float],
    target_rows: int,
    seed: int = 0,
) -> Any:
    """Data mixing: deterministic shard-stable downsample of a corpus to
    a target source distribution (e.g. 60% web / 30% wiki / 10% books at
    ~N total rows). Two stages, no shuffle: one tiny streaming count
    pass over the weighted sources (``source_counts``), then a pure
    per-batch ``stratified_sample`` with the derived fractions —
    membership depends only on (key, seed), so re-runs, resumes and
    re-partitions keep the identical subset. Sources without a weight
    are dropped (default_fraction=0)."""
    fractions = mix_fractions(
        source_counts(ds, source_col, sources=list(weights)), weights, target_rows
    )
    return stratified_sample(
        ds, key_col, source_col, fractions, default_fraction=0.0, seed=seed
    )


def epoch_shuffle_positions(
    ds: Any, key_col: str, epoch: int, seed: int = 0
) -> Any:
    """Deterministic global shuffle for one training epoch: every key
    gets an explicit position 0..n-1 in ``splitmix64(key ^ epoch ^
    seed)`` order (ties broken by key — 64-bit collisions are expected
    a few times per 10^11-doc corpus, so the order stays total).

    Returns the NARROW ``(key, pos)`` plan — at crawl scale only
    16 B/doc rides the ordered-prefix-sum exchange; writers join
    positions back by key (broadcast/co-partition) instead of
    shuffling payloads here. Re-runs produce the identical
    permutation: an interrupted epoch resumes mid-order, and two
    pipelines sharding the same epoch agree row for row."""
    from patito_ray.stages.prefix import ordered_prefix_sum

    mix = np.uint64(seed) ^ np.uint64(epoch)

    def narrow(t: pa.Table) -> pa.Table:
        # hash(key ^ mix) rather than hash(key) ^ mix so different
        # epochs are full re-permutations, not XOR shifts of one order
        hh = _key_hashes(t, key_col, int(mix))
        keys = t.column(key_col)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        flipped = (hh ^ np.uint64(1 << 63)).view(np.int64)
        n = len(flipped)
        return pa.table(
            {
                key_col: keys,
                "_h": pa.array(flipped, type=pa.int64()),
                "_one": pa.array(np.ones(n, dtype=np.int64)),
            }
        )

    plan = ds.select_columns([key_col]).map_batches(
        narrow, batch_format="pyarrow", batch_size=None
    )
    out = ordered_prefix_sum(plan, "_h", "_one", out_col="pos", tie_col=key_col)
    return out.map_batches(
        lambda t: t.select([key_col, "pos"])
        if t.num_rows and key_col in t.column_names
        else pa.table(
            {key_col: pa.array([], type=pa.int64()), "pos": pa.array([], type=pa.int64())}
        ),
        batch_format="pyarrow",
        batch_size=None,
    )


def weighted_sample_k(
    ds: Any,
    key_col: str,
    weight_col: str,
    k: int,
    seed: int = 0,
) -> Any:
    """Exactly ``min(k, n)`` rows sampled WITHOUT replacement with
    probability proportional to ``weight_col`` — the
    Efraimidis–Spirakis exponential-keys method: each row's selection
    key is ``-ln(u) / w`` with ``u = (splitmix64(key ^ seed) + 1) / 2^64``,
    and the k SMALLEST keys win. Deterministic and shard-stable (the
    key is a pure function of (key, seed, weight)); float ties broken
    by key ascending so selection is a total order.

    Scale shape identical to :func:`sample_exact_k`: every batch prunes
    to its k best rows with one vectorized lexsort, bounding the
    exchange at ``k x num_blocks`` rows; driver lexsort finalize under
    the 256 MB budget, distributed ``sort().limit(k)`` beyond.

    Rows-only correctness surface BY DESIGN: the selection boundary
    compares ``ln`` outputs, and libm vs SQL LN may differ in the last
    ulp — property tests pin partition-stability and the pairwise
    w1/(w1+w2) inclusion law instead.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def prune(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("_e", pa.array([], type=pa.float64()))
        w = t.column(weight_col).to_numpy(zero_copy_only=False).astype(np.float64)
        bad = ~(w > 0)
        if bad.any():
            raise ValueError(
                f"weighted_sample_k weights must be > 0 and non-null; "
                f"column {weight_col!r} has {int(bad.sum())} violating row(s)"
            )
        h = _key_hashes(t, key_col, seed)
        u = (h.astype(np.float64) + 1.0) / 18446744073709551616.0  # (0, 1]
        e = -np.log(u) / w
        if t.num_rows > k:
            keys = t.column(key_col).to_numpy(zero_copy_only=False)
            order = np.lexsort((keys, e))[:k]
            t = t.take(pa.array(order.astype(np.int64)))
            e = e[order]
        return t.append_column("_e", pa.array(e, type=pa.float64()))

    pruned = ds.map_batches(
        prune, batch_format="pyarrow", batch_size=None
    ).materialize()

    from patito_ray.validation.engine import _DRIVER_FASTPATH_BYTES

    if pruned.size_bytes() <= _DRIVER_FASTPATH_BYTES:
        from patito_ray.stages.agg import collect_table

        t = collect_table(pruned, empty_schema=None) if pruned.count() else None
        if t is None or t.num_rows == 0:
            out = pruned
        else:
            keys = t.column(key_col).to_numpy(zero_copy_only=False)
            ee = t.column("_e").to_numpy(zero_copy_only=False)
            order = np.lexsort((keys, ee))[:k]
            import ray.data as rd

            out = rd.from_arrow(t.take(pa.array(order.astype(np.int64))))
    else:
        out = pruned.sort(["_e", key_col]).limit(k)
    return out.map_batches(
        lambda t: t.drop_columns(["_e"]) if "_e" in t.column_names else t,
        batch_format="pyarrow",
        batch_size=None,
    )
