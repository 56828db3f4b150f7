"""Referential-integrity checks for LARGE dimension tables.

The engine's built-in referential check broadcasts the dimension key
set (``references=`` kwarg) — right for dimensions that fit an object
-store blob. When BOTH sides are large, this module runs the same
bucketed blob exchange as the uniqueness check: fact keys and dim keys
hash into the same bucket space, co-locate via one groupby, and each
bucket counts fact rows whose key never appears on the dim side.

Wire cost: 8 bytes per distinct key per batch per side — the fact
side's payload columns never move.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa

from patito_ray.validation.checks import batch_key_bucket_blobs


def _tagged_blobs(ds: Any, column: str, side: int, num_buckets: int) -> Any:
    def tag(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # null keys are not referential failures (same semantics as the
        # engine's broadcast referential_miss_mask): drop them before
        # hashing, else value_counts' null group hashes to a constant
        # absent from the dim side and miscounts as a miss
        batch = batch.filter(pc.is_valid(batch.column(column)))
        blobs = batch_key_bucket_blobs(batch, column, num_buckets=num_buckets)
        return blobs.append_column(
            "side", pa.array([side] * blobs.num_rows, type=pa.int8())
        )

    return ds.select_columns([column]).map_batches(
        tag, batch_format="pyarrow", batch_size=None
    )


def anti_join_count(
    fact: Any,
    fact_key: str,
    dim: Any,
    dim_key: str,
    num_buckets: int = 64,
) -> int:
    """Count of fact ROWS whose key is absent from the dimension —
    patito-style referential violation count, both sides large.

    Key hashing makes buckets uniform under value skew; a hot fact key
    costs one (key, count) entry per batch. 64-bit hash collisions can
    only *mask* a violation (false negative at ~n^2/2^64) — use the
    broadcast path for exactness on small dims.
    """
    f = _tagged_blobs(fact, fact_key, 0, num_buckets)
    d = _tagged_blobs(dim, dim_key, 1, num_buckets)
    both = f.union(d)

    def bucket_misses(group: pa.Table) -> pa.Table:
        from patito_ray.validation.checks import unpack_bucket_blobs

        side = group.column("side").to_numpy(zero_copy_only=False)
        fact_rows = group.filter(pa.array(side == 0))
        dim_rows = group.filter(pa.array(side == 1))
        f_keys, f_counts = unpack_bucket_blobs(fact_rows)
        d_keys, _ = unpack_bucket_blobs(dim_rows)
        if len(f_keys) == 0:
            return pa.table({"misses": [0]})
        d_set = np.unique(d_keys)
        present = np.isin(f_keys, d_set, assume_unique=False)
        misses = int(f_counts[~present].sum())
        return pa.table({"misses": [misses]})

    rows = (
        both.groupby("bucket")
        .map_groups(bucket_misses, batch_format="pyarrow")
        .take_all()
    )
    return int(sum(r["misses"] for r in rows))
