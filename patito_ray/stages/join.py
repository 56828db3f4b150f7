"""Join execution strategies.

The reference only *types* joins (schema algebra,
/root/reference/src/patito/pydantic.py:886-953) — here they execute:

- ``broadcast_join``: small right side shipped once via ``ray.put``
  (a dict/arrow table), looked up inside ``map_batches`` per batch —
  NO shuffle; the right strategy for dimension tables, vocabularies
  and key sets (ray_guide "Joins and lookups").
- ``hash_join``: both sides large -> Ray Data's native partitioned
  hash join (``Dataset.join``), with the partition count exposed.
- ``semi_join`` / ``anti_join``: broadcast the key set (or its 64-bit
  hashes for wide keys) and filter per batch.

Result-model typing comes from ``Model.join`` so validated pipelines
can keep flowing through the schema algebra.
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa
import pyarrow.compute as pc


def broadcast_join(
    ds: Any,
    right: pa.Table,
    on: str,
    right_on: str | None = None,
    how: str = "inner",
) -> Any:
    """Per-batch pyarrow join against a broadcast right table.

    The right table is put in the object store ONCE; every batch task
    reads it zero-copy and does a local arrow hash join. ``how`` is
    "inner" or "left" (left outer).
    """
    import ray

    right_on = right_on or on
    ref = ray.put(right)
    join_type = {"inner": "inner", "left": "left outer"}[how]

    def attach(batch: pa.Table) -> pa.Table:
        r = ray.get(ref)
        return batch.join(r, keys=[on], right_keys=[right_on], join_type=join_type)

    return ds.map_batches(attach, batch_format="pyarrow", batch_size=None)


def hash_join(
    left: Any,
    right: Any,
    on: str | tuple[str, ...],
    how: str = "inner",
    num_partitions: int | None = None,
    right_on: str | tuple[str, ...] | None = None,
) -> Any:
    """Both sides large: Ray Data's partitioned hash join (an explicit
    all-to-all exchange on the key)."""
    on_t = (on,) if isinstance(on, str) else tuple(on)
    right_t = None
    if right_on is not None:
        right_t = (right_on,) if isinstance(right_on, str) else tuple(right_on)
    if num_partitions is None:
        # each partition is a 1-CPU aggregator actor; chained joins keep
        # two generations alive at once, so cap well below cluster CPUs
        # or the actor pool deadlocks waiting for CPUs that map tasks /
        # the other join hold
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
        num_partitions = max(2, min(64, cpus // 4))
    return left.join(
        right,
        join_type=how,
        num_partitions=num_partitions,
        on=on_t,
        right_on=right_t,
    )


def _key_set(ds_or_table: Any, column: str) -> pa.Array:
    if isinstance(ds_or_table, pa.Table):
        return pc.unique(ds_or_table.column(column).combine_chunks())
    arrays = []
    for b in ds_or_table.iter_batches(batch_format="pyarrow"):
        arrays.append(pc.unique(b.column(column).combine_chunks()))
    if not arrays:
        return pa.array([])
    return pc.unique(pa.concat_arrays(arrays))


def semi_join(ds: Any, keys: Any, on: str, key_column: str | None = None) -> Any:
    """Keep rows whose key IS in the broadcast key set."""
    import ray

    key_arr = _key_set(keys, key_column or on)
    ref = ray.put(key_arr)

    def pick(batch: pa.Table) -> pa.Table:
        ks = ray.get(ref)
        return batch.filter(pc.is_in(batch.column(on), value_set=ks))

    return ds.map_batches(pick, batch_format="pyarrow", batch_size=None)


def anti_join(ds: Any, keys: Any, on: str, key_column: str | None = None) -> Any:
    """Keep rows whose key is NOT in the broadcast key set (null keys
    kept — they are the null-check's business, reference semantics)."""
    import ray

    key_arr = _key_set(keys, key_column or on)
    ref = ray.put(key_arr)

    def pick(batch: pa.Table) -> pa.Table:
        ks = ray.get(ref)
        arr = batch.column(on)
        hit = pc.is_in(arr, value_set=ks)
        keep = pc.or_(pc.invert(hit), pc.is_null(arr))
        return batch.filter(pc.fill_null(keep, True))

    return ds.map_batches(pick, batch_format="pyarrow", batch_size=None)
