"""Shared hash-partition-id kernel for single-key exchanges.

Every one-sided partitioned operator (grouped top-k, window functions,
per-key cap) routes rows with ``hash(key) % P`` computed vectorized per
batch. The key-class rules mirror ``stages.join._part_of``: fixed-width
temporals are viewed as their physical ints (Arrow cannot cast
date32->int64 directly), strings/binary hash through the project's
``hash64``, and NULL keys are rejected loudly — a null routed through a
float64 NaN cast is platform-dependent and would split a group across
partitions.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def hash_partition_ids(col: Any, num_partitions: int, what: str) -> np.ndarray:
    """int64 partition id per row for ``col`` (``hash % num_partitions``).

    ``what`` names the caller's column in error messages.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    fixed_temporal = (
        pa.types.is_date(col.type)
        or pa.types.is_time(col.type)
        or pa.types.is_timestamp(col.type)
        or pa.types.is_duration(col.type)
    )  # NOT is_temporal: interval types are 128-bit and unviewable
    if pa.types.is_integer(col.type) or fixed_temporal or pa.types.is_boolean(col.type):
        if col.null_count:
            raise ValueError(
                f"{what} contains {col.null_count} null key(s); "
                "filter or fill them before partitioning"
            )
        if fixed_temporal:
            storage = pa.int32() if col.type.bit_width == 32 else pa.int64()
            col = col.view(storage)
        g = pc.cast(col, pa.int64()).to_numpy(zero_copy_only=False)
        h = g.astype(np.int64).view(np.uint64)
        h = (h ^ (h >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
    elif (
        pa.types.is_string(col.type)
        or pa.types.is_large_string(col.type)
        or pa.types.is_binary(col.type)
        or pa.types.is_large_binary(col.type)
    ):
        if col.null_count:
            raise ValueError(
                f"{what} contains {col.null_count} null key(s); "
                "filter or fill them before partitioning"
            )
        from patito_ray.state.sketches import hash64

        h = hash64(pc.cast(col, pa.large_binary()))
    else:
        raise TypeError(
            f"{what} has unsupported dtype {col.type} "
            "(int/temporal/bool/string/binary only)"
        )
    return (h % np.uint64(num_partitions)).view(np.int64)
