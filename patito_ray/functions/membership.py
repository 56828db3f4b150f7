"""Bloom-filter membership over Datasets: the constant-memory way to
ask "was this key in corpus A?" while streaming corpus B.

At crawl scale the exact seen-key set (8 B/key) outgrows both the
driver and a broadcast (10^11 keys = 800 GB); a Bloom filter holds the
same question in ``-n ln(p)/ln(2)^2`` bits (~1.2 GB for 10^9 keys at
1 % FP) with a hard no-false-negative guarantee — the right shape for
cross-run incremental dedup pre-filters and train/test contamination
sweeps where a false positive only costs a redundant exact check.

Build shape: one bloom per BLOCK (map_batches with batch_size=None),
OR-merged on the driver — the bitmap ships once per block, never per
batch, and OR is associative/commutative so the result is
bit-identical to a sequential build (partition-independence is
property-tested). Probe shape: the bitmap broadcasts once via
``ray.put``; each batch answers with two vectorized gathers.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa

from patito_ray.state.sketches import BloomFilter, hash64


def _column_hashes(t: pa.Table, key_col: str) -> np.ndarray:
    col = t.column(key_col)
    if col.null_count:
        raise ValueError(
            f"bloom membership key column {key_col!r} contains "
            f"{col.null_count} null(s); membership must be a pure "
            "function of the key"
        )
    return hash64(col)


def bloom_from_dataset(
    ds: Any,
    key_col: str,
    n_expected: int,
    fp_rate: float = 0.01,
) -> BloomFilter:
    """Build one Bloom filter over every ``key_col`` value.

    ``n_expected`` sizes the bitmap (use the row count or an HLL
    estimate; overshooting only wastes bits, undershooting raises the
    FP rate — check ``fill_ratio()`` if unsure)."""
    proto = BloomFilter(n_expected, fp_rate)  # validates geometry args

    def partial(t: pa.Table) -> pa.Table:
        b = BloomFilter(n_expected, fp_rate)
        b.add_hashes(_column_hashes(t, key_col))
        return pa.table({"state": pa.array([b.state()], type=pa.large_binary())})

    parts = ds.select_columns([key_col]).map_batches(
        partial, batch_format="pyarrow", batch_size=None
    )
    from patito_ray.stages.agg import collect_table

    blobs = collect_table(
        parts, pa.schema([("state", pa.large_binary())])
    ).column("state")
    for blob in blobs:
        proto.merge(
            BloomFilter.from_state(blob.as_py(), n_expected, fp_rate)
        )
    return proto


def flag_bloom_membership(
    ds: Any,
    key_col: str,
    bloom: BloomFilter,
    out_col: str = "maybe_seen",
) -> Any:
    """Append a bool column: True = the key is POSSIBLY in the built
    corpus (never falsely False). The bitmap broadcasts once via
    ``ray.put``; tasks read it zero-copy from the object store."""
    import ray

    ref = ray.put((bloom.state(), bloom.m_bits, bloom.k))

    def fn(t: pa.Table) -> pa.Table:
        state, m_bits, k = ray.get(ref)
        b = BloomFilter.__new__(BloomFilter)
        b.m_bits, b.k = m_bits, k
        b.words = np.frombuffer(state, dtype=np.uint64)
        hit = b.contains_hashes(_column_hashes(t, key_col))
        return t.append_column(out_col, pa.array(hit))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def bloom_semi_join(
    fact: Any,
    keys: Any,
    key_col: str,
    keys_col: str | None = None,
    anti: bool = False,
    fp_rate: float = 0.01,
    n_expected: int | None = None,
    num_partitions: int | None = None,
    broadcast_limit_bytes: int = 64 * 1024 * 1024,
) -> Any:
    """EXACT semi (or anti) join of ``fact`` against ``keys`` with a
    Bloom pre-filter bounding what rides the exchange.

    The plain broadcast semi join (referential check) needs the exact
    key set on every worker — at 10^11 keys that is an 800 GB
    broadcast. Here only the ~1.2 GB bitmap broadcasts; fact rows the
    bloom rejects are DEFINITELY absent (no false negatives), so:

    - semi: only bloom hits (true matches + ~fp_rate of the rest) ride
      one co-partition exchange where ``pc.is_in`` against the
      partition's exact keys removes the false positives;
    - anti: bloom misses pass through LOCALLY (zero exchange — on a
      mostly-novel crawl that is almost everything), and only hits are
      exchanged to check which were false positives.

    Result is exact either way; the bloom only bounds data movement.
    When the exact key set itself fits ``broadcast_limit_bytes``
    (8 B/key), both the bloom and the exchange are skipped: the keys
    broadcast once via ``ray.put`` and one vectorized ``is_in`` per
    batch answers exactly — the referential-check shape.
    NOTE the anti path's pass-through and checked branches are two Ray
    lineages over ``fact`` — the union re-executes the scan+probe twice
    (lazy-plan semantics). That is still far cheaper than exchanging
    the misses; materialize ``fact`` first only if its scan dominates.
    Null join keys are rejected on both sides (filter or fill first —
    SQL ``IN`` null semantics are a caller decision, not a default).
    ``n_expected`` sizes the bitmap (defaults to ``keys.count()``,
    metadata-only on parquet reads).
    """
    import pyarrow.compute as pc

    from patito_ray.stages.join import copartition_apply

    keys_col = keys_col or key_col
    narrow = keys.select_columns([keys_col]).materialize()
    if n_expected is None:
        n_expected = max(1, narrow.count())

    if n_expected * 8 <= broadcast_limit_bytes:
        # exact key set fits a broadcast: skip the bloom AND the
        # exchange — one is_in per batch, provably exact
        import ray

        def distinct_keys(t: pa.Table) -> pa.Table:
            col = t.column(keys_col)
            if col.null_count:
                raise ValueError(
                    f"semi-join keys column {keys_col!r} contains "
                    f"{col.null_count} null(s); filter or fill them first"
                )
            return pa.table({keys_col: pc.unique(col)})

        kt = [
            t
            for t in ray.get(
                narrow.map_batches(
                    distinct_keys, batch_format="pyarrow", batch_size=None
                )
                .materialize()
                .to_arrow_refs()
            )
            if t.num_rows
        ]
        key_set = (
            pc.unique(pa.concat_tables(kt).column(keys_col).combine_chunks())
            if kt
            else None
        )
        ref = ray.put(key_set)

        def probe(t: pa.Table, _ref=ref) -> pa.Table:
            col = t.column(key_col)
            if col.null_count:
                raise ValueError(
                    f"bloom membership key column {key_col!r} contains "
                    f"{col.null_count} null(s); membership must be a pure "
                    "function of the key"
                )
            vals = ray.get(_ref)
            if vals is None:  # empty key set
                return t if anti else t.slice(0, 0)
            mask = pc.is_in(col, value_set=vals)
            if anti:
                mask = pc.invert(mask)
            return t.filter(mask)

        return fact.map_batches(probe, batch_format="pyarrow", batch_size=None)

    bloom = bloom_from_dataset(narrow, keys_col, n_expected, fp_rate)

    flagged = flag_bloom_membership(fact, key_col, bloom, out_col="__bloom_hit")

    def split(want_hit: bool):
        def fn(t: pa.Table) -> pa.Table:
            mask = t.column("__bloom_hit")
            if not want_hit:
                mask = pc.invert(mask)
            return t.filter(mask).drop_columns(["__bloom_hit"])

        return flagged.map_batches(fn, batch_format="pyarrow", batch_size=None)

    hits = split(True)

    # exchange side: per-batch DISTINCT keys only (8 B/distinct key)
    right_name = "__semi_key"

    def batch_keys(t: pa.Table) -> pa.Table:
        col = t.column(keys_col)
        if col.null_count:
            raise ValueError(
                f"semi-join keys column {keys_col!r} contains "
                f"{col.null_count} null(s); filter or fill them first"
            )
        return pa.table({right_name: pc.unique(col)})

    key_rows = narrow.map_batches(batch_keys, batch_format="pyarrow", batch_size=None)

    def verify(lt: pa.Table, rt: pa.Table) -> pa.Table:
        if lt.num_rows == 0:
            return lt
        mask = pc.is_in(lt.column(key_col), value_set=rt.column(right_name))
        if anti:
            mask = pc.invert(mask)
        return lt.filter(mask)

    checked = copartition_apply(
        hits, key_rows, key_col, right_name, verify, num_partitions=num_partitions
    )
    if not anti:
        return checked
    return split(False).union(checked)
