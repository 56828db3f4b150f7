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


_KEEP_L = "__pr_join_keep_l"
_KEEP_R = "__pr_join_keep_r"


def _arrow_schema(ds: Any) -> pa.Schema | None:
    """Arrow schema of a Dataset, or None when it is unknowable — which
    happens exactly when the dataset executed to zero rows through a
    schema-erasing op (Ray's filter emits schema-less empty bundles).
    Metadata-backed sources (parquet) answer without execution; lazy
    map chains peek one block; an all-to-all upstream executes its plan
    — materialize such inputs first, same invariant as
    copartition_apply chaining."""
    sch = ds.schema()
    if sch is None:
        return None
    base = getattr(sch, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base
    return pa.schema(list(zip(sch.names, sch.types)))


def _shuffle_safe_side(ds: Any, schema: pa.Schema, keep_col: str | None) -> Any:
    """Armor one join side against Ray's hash-shuffle empty-block hole.

    ``_shuffle_block`` (ray/data/_internal/execution/operators/
    hash_shuffle.py:223) returns without sending ANYTHING for a 0-row
    block, yet the one-shot schema-broadcast flag is consumed by the
    first block submitted — so a side whose first (or every) block is
    empty never delivers its schema to the aggregators and acero dies
    with ``ArrowInvalid: No match ... FieldRef`` at finalize. Two
    counter-measures, both streaming and O(1) extra state:

    - drop empty blocks (generator ``map_batches`` yields nothing), so
      the first block the shuffle sees is guaranteed non-empty and the
      schema broadcast seeds every partition;
    - union ONE sentinel row with all-null columns, so even an
      entirely-empty side (filter matched nothing) still ships a
      schema-ful block. Null join keys match nothing under acero's SQL
      semantics, so the sentinel is invisible to inner joins; outer
      joins tag real rows with ``keep_col`` and prune the sentinel
      after the join.
    """
    import numpy as np
    import ray.data as rd

    if keep_col is not None and keep_col in schema.names:
        raise ValueError(f"column name {keep_col!r} is reserved by hash_join")

    def dense(b: pa.Table):
        if b.num_rows:
            if keep_col is not None:
                b = b.append_column(
                    keep_col, pa.array(np.ones(b.num_rows, dtype=bool))
                )
            yield b

    out = ds.map_batches(dense, batch_format="pyarrow", batch_size=None)
    sent = pa.table({f.name: pa.nulls(1, f.type) for f in schema})
    if keep_col is not None:
        sent = sent.append_column(keep_col, pa.array([False]))
    return out.union(rd.from_arrow(sent))


def hash_join(
    left: Any,
    right: Any,
    on: str | tuple[str, ...],
    how: str = "inner",
    num_partitions: int | None = None,
    right_on: str | tuple[str, ...] | None = None,
    safe: bool = True,
) -> Any:
    """Both sides large: Ray Data's partitioned hash join (an explicit
    all-to-all exchange on the key).

    ``safe=True`` (default) makes the native operator correct on
    arbitrary upstreams: a side whose blocks are all empty (a filter
    that matched nothing) crashes Ray's join aggregator because empty
    blocks are silently not shuffled and the schema broadcast is lost
    (see :func:`_shuffle_safe_side`). The guard drops empty blocks and
    unions a null-key sentinel row per side; inner joins need no
    post-pass (null keys match nothing), outer joins prune the sentinel
    via a per-side keep flag. ``safe=False`` skips the armor for
    pipelines that guarantee dense non-empty blocks (e.g. direct
    parquet reads).
    """
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
    keep_l = _KEEP_L if how in ("left_outer", "full_outer") else None
    keep_r = _KEEP_R if how in ("right_outer", "full_outer") else None
    if safe:
        lsch, rsch = _arrow_schema(left), _arrow_schema(right)
        if lsch is None or rsch is None:
            # a None schema means that side provably executed to zero
            # rows AND its column set is unknowable (schema-less empty
            # bundles) — the join result is computable without the
            # native operator. The vanished side's columns cannot
            # appear in the output (best effort, documented).
            import ray.data as rd

            if lsch is None and rsch is None:
                return rd.from_items([])
            if lsch is None:
                return right if how in ("right_outer", "full_outer") else right.limit(0)
            return left if how in ("left_outer", "full_outer") else left.limit(0)
        left = _shuffle_safe_side(left, lsch, keep_l)
        right = _shuffle_safe_side(right, rsch, keep_r)
    out = left.join(
        right,
        join_type=how,
        num_partitions=num_partitions,
        on=on_t,
        right_on=right_t,
    )
    if safe and (keep_l or keep_r):

        def prune(b: pa.Table) -> pa.Table:
            mask = None
            for col in (keep_l, keep_r):
                if col is None:
                    continue
                # unmatched rows carry null in the other side's flag —
                # they are real rows, keep them (only explicit False is
                # the sentinel)
                m = pc.fill_null(b.column(col), True)
                mask = m if mask is None else pc.and_(mask, m)
                b = b.drop_columns([col])
            return b.filter(mask)

        out = out.map_batches(prune, batch_format="pyarrow", batch_size=None)
    return out


def default_num_partitions() -> int:
    """~4x cluster CPUs (the read path's granularity rule, CLAUDE.md):
    partition count tracks cluster size instead of a constant, so the
    same pipeline neither starves a big cluster nor drowns a small one
    in per-task overhead."""
    import ray

    cpus = (
        int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    )
    return max(8, 4 * cpus)


def _partition_key_class(typ: pa.DataType) -> str:
    """Which partition-hash family a by-key type uses. Int-like types
    mix through the canonical int64 view (so int32-vs-int64 sides
    co-partition); string/binary use the vectorized Rust hash. Anything
    else (floats, lists, structs) is rejected up front with a clear
    error instead of an obscure numpy cast failure deep inside a Ray
    task (round-2 advice)."""
    if pa.types.is_integer(typ) or pa.types.is_temporal(typ) or pa.types.is_boolean(typ):
        return "int"
    if (
        pa.types.is_string(typ)
        or pa.types.is_large_string(typ)
        or pa.types.is_binary(typ)
        or pa.types.is_large_binary(typ)
    ):
        return "str"
    raise TypeError(
        f"unsupported co-partition key type {typ}: use an integer, "
        "temporal, boolean, string or binary key (float keys compare "
        "unreliably; derive an int64 key instead)"
    )


def partition_key_hashes(col: Any, key_class: str) -> Any:
    """uint64 partition hashes for a join/group key column — the one
    shared kernel behind copartition_apply and skew_join, so equal
    values always land in the same partition family. ``key_class`` is
    :func:`_partition_key_class` of the column type."""
    import numpy as np

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if key_class == "int":
        if pa.types.is_temporal(col.type):
            # date32/time32/date64/timestamp/duration: Arrow cannot
            # cast date32->int64 directly; view the physical storage
            # (same byte width, validity preserved) then widen
            storage = pa.int32() if col.type.bit_width == 32 else pa.int64()
            col = col.view(storage)
        keys = pc.cast(col, pa.int64()).to_numpy(zero_copy_only=False)
        h = keys.astype(np.int64).view(np.uint64)
        h = (h ^ (h >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
    else:
        from patito_ray.state.sketches import hash64

        # canonical bytes: string/large_string/binary sides of the
        # same value must land in the same partition
        h = hash64(pc.cast(col, pa.large_binary()))
    return h


def copartition_apply(
    left: Any,
    right: Any,
    by: "str | list[str]",
    right_by: "str | list[str]",
    part_fn: Any,
    num_partitions: int | None = None,
) -> Any:
    """Co-partition two Datasets on ``hash(by) % P`` through ONE
    tagged-union exchange and run ``part_fn(left_table, right_table)``
    once per partition — the spine of every custom two-sided operator
    here (as-of join, range join, pair-payload verify). Ray's native
    join operator is avoided: it breaks on empty blocks. P Python calls
    total, each vectorized inside; column names must be disjoint.

    ``by`` / ``right_by`` may be COMPOSITE (lists of columns, pairwise
    same key class): per-column hashes fold into one partition hash, so
    multi-key equi-semantics co-locate without concatenating values.

    ``num_partitions`` defaults to ~4x cluster CPUs (like the read
    path) so partition granularity tracks cluster size instead of a
    fixed 32."""
    import numpy as np

    l_schema = left.schema()
    r_schema = right.schema()
    if l_schema is None or r_schema is None:
        raise ValueError(
            "co-partition requires known schemas on both sides; an empty "
            "dataset with no blocks has none — pass it as from_arrow(...) "
            "of an empty typed table instead"
        )
    l_names = list(l_schema.names)
    l_types = list(l_schema.types)
    r_names = list(r_schema.names)
    r_types = list(r_schema.types)
    clash = set(l_names) & set(r_names)
    if clash:
        raise ValueError(f"co-partition column name clash: {sorted(clash)}")
    union_schema = pa.schema(
        [("part", pa.int64()), ("side", pa.int8())]
        + list(zip(l_names, l_types))
        + list(zip(r_names, r_types))
    )
    by_l = [by] if isinstance(by, str) else list(by)
    by_r = [right_by] if isinstance(right_by, str) else list(right_by)
    if len(by_l) != len(by_r) or not by_l:
        raise ValueError(
            f"co-partition key lists differ in length: {by_l} vs {by_r}"
        )
    l_key_class = [_partition_key_class(l_types[l_names.index(c)]) for c in by_l]
    r_key_class = [_partition_key_class(r_types[r_names.index(c)]) for c in by_r]
    if l_key_class != r_key_class:
        raise TypeError(
            f"co-partition key classes differ: {by_l!r} is {l_key_class}, "
            f"{by_r!r} is {r_key_class} — equal values would land in "
            "different partitions"
        )
    if num_partitions is None:
        num_partitions = default_num_partitions()
    P = num_partitions

    def _combined_part(t: pa.Table, key_cols: list[str], classes: list[str]) -> pa.Array:
        h = partition_key_hashes(t.column(key_cols[0]), classes[0])
        for c, kc in zip(key_cols[1:], classes[1:]):
            # fold per-column hashes: rotate-then-xor-then-remix keeps
            # (a, b) and (b, a) distinct and stays order-sensitive
            h2 = partition_key_hashes(t.column(c), kc)
            h = (h << np.uint64(13)) | (h >> np.uint64(51))
            h = (h ^ h2) * np.uint64(0x9E3779B97F4A7C15)
        return pa.array((h % np.uint64(P)).view(np.int64), type=pa.int64())

    def _tag(side: int, key_cols: list[str], names: list[str], classes: list[str]):
        def fn(t: pa.Table) -> pa.Table:
            # upstream map_groups stages interleave ()-schema empty
            # blocks (see dev notes) — guarding here covers EVERY
            # co-partition consumer (asof/range joins, pair verify,
            # k-core/triangle distributed branches) at once
            if t.num_rows == 0 or any(c not in t.column_names for c in names):
                return union_schema.empty_table()
            n = t.num_rows
            cols: dict[str, Any] = {
                "part": _combined_part(t, key_cols, classes),
                "side": pa.array(np.full(n, side, np.int8), type=pa.int8()),
            }
            for f in union_schema:
                if f.name in ("part", "side"):
                    continue
                if f.name in names:
                    cols[f.name] = pc.cast(t.column(f.name).combine_chunks(), f.type)
                else:
                    cols[f.name] = pa.nulls(n, type=f.type)
            return pa.table(cols, schema=union_schema)

        return fn

    tagged = left.map_batches(
        _tag(0, by_l, l_names, l_key_class), batch_format="pyarrow", batch_size=None
    ).union(
        right.map_batches(
            _tag(1, by_r, r_names, r_key_class),
            batch_format="pyarrow",
            batch_size=None,
        )
    )

    def do_part(group: pa.Table) -> pa.Table:
        import numpy as np

        side = group.column("side").to_numpy(zero_copy_only=False)
        lt = group.filter(pa.array(side == 0)).select(l_names)
        rt = group.filter(pa.array(side == 1)).select(r_names)
        return part_fn(lt, rt)

    return tagged.groupby("part").map_groups(do_part, batch_format="pyarrow")


def asof_join(
    left: Any,
    right: Any,
    on: str,
    right_on: str | None = None,
    by: str | None = None,
    right_by: str | None = None,
    direction: str = "backward",
    num_partitions: int | None = None,
) -> Any:
    """Distributed as-of join: for each left row, the closest right row
    at-or-before (``backward``) / at-or-after (``forward``) its ``on``
    value, matched within the ``by`` key (left-join semantics).

    The reference only *types* asof joins (pydantic.py:886-953, how=
    "asof"); here they execute. Scale shape: ``copartition_apply`` + ONE
    vectorized ``polars.join_asof`` per partition (sort + merge over
    that partition's rows only). Requires a hash-partitionable ``by``
    key; without one the join needs a total order — use a single
    partition / in-memory polars for that.
    """
    import polars as pl

    right_on = right_on or on
    right_by = right_by or by
    assert by is not None and right_by is not None, (
        "asof_join without a by-key needs a total order; repartition to "
        "one partition and join in-memory instead"
    )

    l_names = list(left.schema().names)
    r_names = list(right.schema().names)
    out_names = l_names + [n for n in r_names if n not in (right_on, right_by)]

    def part_fn(lt: pa.Table, rt: pa.Table) -> pa.Table:
        import warnings

        pl_l = pl.from_arrow(lt).sort(on)
        pl_r = pl.from_arrow(rt).sort(right_on)
        # both frames ARE sorted (the line above); polars just cannot
        # prove it per by-group and warns on every partition task.
        # catch_warnings scopes the suppression to this call — a bare
        # filterwarnings would grow the worker's global filter list and
        # mute the message for unrelated code
        with warnings.catch_warnings():
            warnings.filterwarnings(
                "ignore", message="Sortedness of columns cannot be checked"
            )
            out = pl_l.join_asof(
                pl_r,
                left_on=on,
                right_on=right_on,
                by_left=by,
                by_right=right_by,
                strategy=direction,
            )
        return out.select([n for n in out_names if n in out.columns]).to_arrow()

    return copartition_apply(left, right, by, right_by, part_fn, num_partitions)


def range_join(
    left: Any,
    right: Any,
    on: str,
    right_lo: str,
    right_hi: str,
    by: str | None = None,
    right_by: str | None = None,
    num_partitions: int | None = None,
) -> Any:
    """Distributed range (interval) join: every (left, right) pair with
    the same ``by`` key where ``right_lo <= left.on < right_hi``
    (inner-join semantics; a left row matching k intervals emits k
    rows).

    Scale shape: ``copartition_apply`` + ONE vectorized
    ``polars.join_where`` inequality join per partition — the
    cross-product is bounded per partition and pruned by polars, never
    formed globally. Requires a hash-partitionable ``by`` key.
    """
    import polars as pl

    right_by = right_by or by
    assert by is not None and right_by is not None, (
        "range_join needs a by-key to partition on; for a global "
        "interval join repartition to one partition and use polars "
        "join_where in-memory"
    )

    def part_fn(lt: pa.Table, rt: pa.Table) -> pa.Table:
        out = pl.from_arrow(lt).join_where(
            pl.from_arrow(rt),
            pl.col(by) == pl.col(right_by),
            pl.col(on) >= pl.col(right_lo),
            pl.col(on) < pl.col(right_hi),
        )
        return out.to_arrow()

    return copartition_apply(left, right, by, right_by, part_fn, num_partitions)


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


def detect_hot_keys(
    ds: Any,
    on: str,
    hot_count: int,
    batch_floor_fraction: float = 1e-3,
    limit_bytes: int | None = None,
) -> pa.Array:
    """Find join keys whose total occurrence count is ~``hot_count`` or
    more, without ever exchanging one row per key: each batch emits
    counts ONLY for keys above ``max(2, batch_rows *
    batch_floor_fraction)`` in that batch (a heavy-hitters prune — the
    partials stay tiny even over a near-unique key), then the adaptive
    partial-sum merge. A key below the floor in some batches loses
    those batches' counts, so detection is a lower bound — fine,
    because callers (:func:`skew_join`) use the hot set for ROUTING
    only: a missed hot key degrades balance, never correctness.
    """
    import numpy as np

    import polars as pl

    from patito_ray.stages.agg import collect_table, merge_partial_sums

    def batch_counts(t: pa.Table) -> pa.Table:
        kv = pa.table({on: t.column(on)}).filter(pc.is_valid(t.column(on)))
        counts = (
            pl.from_arrow(kv)
            .group_by(on)
            .agg(pl.len().cast(pl.Int64).alias("c"))
        )
        floor = max(2, int(np.ceil(t.num_rows * batch_floor_fraction)))
        return counts.filter(pl.col("c") >= floor).to_arrow()

    partials = ds.map_batches(batch_counts, batch_format="pyarrow", batch_size=None)
    kwargs = {} if limit_bytes is None else {"limit_bytes": limit_bytes}
    merged = merge_partial_sums(partials, [on], ["c"], **kwargs)
    if not isinstance(merged, pa.Table):
        # distributed merge: prune to the (tiny) hot set worker-side
        # with a vectorized batch filter before anything hits the driver
        schema = ds.schema()
        merged = collect_table(
            merged.map_batches(
                lambda t: t.filter(pc.greater_equal(t.column("c"), hot_count)),
                batch_format="pyarrow",
                batch_size=None,
            ),
            empty_schema=pa.schema(
                [(on, schema.types[schema.names.index(on)]), ("c", pa.int64())]
            ),
        )
    hot = merged.filter(pc.greater_equal(merged.column("c"), hot_count))
    return hot.column(on).combine_chunks()


def skew_join(
    fact: Any,
    dim: Any,
    on: str,
    right_on: str,
    hot_keys: pa.Array | list | None = None,
    hot_count: int | None = None,
    salt: int = 8,
    num_partitions: int | None = None,
) -> Any:
    """Inner join of a skewed fact Dataset against a dimension Dataset
    with HOT-KEY SALTING, in one pass over the fact side.

    A plain hash exchange sends every occurrence of a hot key (think
    ``domain='...'`` on a crawl where one domain is 30 % of the corpus)
    to ONE partition — that straggler becomes the job. Here hot fact
    rows spread over ``salt`` partitions (``(h + salt_id) % P``, salt_id
    = row position % salt — any assignment is correct since every salted
    partition holds the dim copy) and the matching dim rows are
    REPLICATED once per salt id in the dim tagging map. Cold keys take
    the normal single-partition route. The hot set comes from
    ``hot_keys`` (explicit) or :func:`detect_hot_keys` (``hot_count``
    occurrences) — either way it affects only routing; the join result
    is exact for any hot set. Nulls on either key never match (inner
    join semantics) and are dropped before the exchange.

    Column names must be disjoint (same contract as copartition_apply).
    """
    import numpy as np

    import polars as pl

    f_schema = fact.schema()
    d_schema = dim.schema()
    f_names = list(f_schema.names)
    d_names = list(d_schema.names)
    clash = set(f_names) & set(d_names)
    if clash:
        raise ValueError(f"skew_join column name clash: {sorted(clash)}")
    f_class = _partition_key_class(f_schema.types[f_names.index(on)])
    d_class = _partition_key_class(d_schema.types[d_names.index(right_on)])
    if f_class != d_class:
        raise TypeError(
            f"skew_join key classes differ: {on!r} is {f_class}, "
            f"{right_on!r} is {d_class}"
        )
    if num_partitions is None:
        num_partitions = default_num_partitions()
    P = num_partitions
    R = max(1, min(salt, P))

    if hot_keys is None:
        if hot_count is None:
            raise ValueError("skew_join needs hot_keys or hot_count")
        hot_keys = detect_hot_keys(fact, on, hot_count)
    hot_arr = pa.array(hot_keys) if not isinstance(hot_keys, (pa.Array, pa.ChunkedArray)) else hot_keys
    if isinstance(hot_arr, pa.ChunkedArray):
        hot_arr = hot_arr.combine_chunks()
    # the hot set is small by construction (keys above a corpus-scale
    # count threshold); it travels inside the task closure
    n_hot = len(hot_arr)

    union_schema = pa.schema(
        [("part", pa.int64()), ("side", pa.int8())]
        + list(zip(f_names, f_schema.types))
        + list(zip(d_names, d_schema.types))
    )

    def _pad(t: pa.Table, names: list[str], side: int, part: Any) -> pa.Table:
        n = t.num_rows
        cols: dict[str, Any] = {
            "part": part,
            "side": pa.array(np.full(n, side, np.int8), type=pa.int8()),
        }
        for f in union_schema:
            if f.name in ("part", "side"):
                continue
            if f.name in names:
                cols[f.name] = pc.cast(t.column(f.name).combine_chunks(), f.type)
            else:
                cols[f.name] = pa.nulls(n, type=f.type)
        return pa.table(cols, schema=union_schema)

    def tag_fact(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column(on)))
        h = partition_key_hashes(t.column(on), f_class)
        salt_id = np.zeros(t.num_rows, dtype=np.uint64)
        if n_hot:
            is_hot = pc.is_in(
                t.column(on).combine_chunks(), value_set=hot_arr
            ).to_numpy(zero_copy_only=False)
            if is_hot.any():
                salt_id[is_hot] = (
                    np.arange(int(is_hot.sum())) % R
                ).astype(np.uint64)
        part = ((h + salt_id) % np.uint64(P)).view(np.int64)
        return _pad(t, f_names, 0, pa.array(part, type=pa.int64()))

    def tag_dim(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column(right_on)))
        h = partition_key_hashes(t.column(right_on), d_class)
        base = ((h % np.uint64(P)).view(np.int64))
        out = [_pad(t, d_names, 1, pa.array(base, type=pa.int64()))]
        if n_hot:
            is_hot = pc.is_in(
                t.column(right_on).combine_chunks(), value_set=hot_arr
            ).to_numpy(zero_copy_only=False)
            if is_hot.any():
                hot_t = t.filter(pa.array(is_hot))
                hot_h = h[is_hot]
                for j in range(1, R):
                    part = (
                        (hot_h + np.uint64(j)) % np.uint64(P)
                    ).view(np.int64)
                    out.append(
                        _pad(hot_t, d_names, 1, pa.array(part, type=pa.int64()))
                    )
        return pa.concat_tables(out)

    tagged = fact.map_batches(
        tag_fact, batch_format="pyarrow", batch_size=None
    ).union(dim.map_batches(tag_dim, batch_format="pyarrow", batch_size=None))

    def do_part(group: pa.Table) -> pa.Table:
        side = group.column("side").to_numpy(zero_copy_only=False)
        ft = group.filter(pa.array(side == 0)).select(f_names)
        dt = group.filter(pa.array(side == 1)).select(d_names)
        return (
            pl.from_arrow(ft)
            .join(pl.from_arrow(dt), left_on=on, right_on=right_on, how="inner")
            .to_arrow()
        )

    return tagged.groupby("part").map_groups(do_part, batch_format="pyarrow")


def copartition_join(
    left: Any,
    right: Any,
    on: "str | list[str]",
    right_on: "str | list[str]",
    how: str = "inner",
    num_partitions: int | None = None,
) -> Any:
    """General equi-join on the :func:`copartition_apply` spine —
    the empty-block-safe alternative to Ray's native ``Dataset.join``
    (which fails when a side contains an empty block) that also covers
    LEFT and FULL OUTER, which the broadcast path cannot express for a
    large preserved side. ``on`` / ``right_on`` may be composite
    (lists of columns) — the spine folds per-column hashes.

    Unmatched rows surface with the other side's columns null, exactly
    like SQL; both key columns are kept (``full``) or the left keys only
    (``inner``/``left``), matching polars' column contract.
    """
    import polars as pl

    if how not in ("inner", "left", "full"):
        raise ValueError(f"copartition_join how={how!r}: use inner/left/full")

    def part_join(lt: pa.Table, rt: pa.Table) -> pa.Table:
        out = pl.from_arrow(lt).join(
            pl.from_arrow(rt), left_on=on, right_on=right_on, how=how,
            coalesce=False if how == "full" else True,
        )
        return out.to_arrow()

    return copartition_apply(
        left, right, on, right_on, part_join, num_partitions=num_partitions
    )
