"""Persisted, incrementally-refreshable MinHash-LSH index.

The missing piece between ``minhash_candidate_pairs`` (one-shot, both
sides rescanned) and a 100-TB crawl pipeline: near-dup-check each NEW
batch of documents against an ever-growing corpus WITHOUT rescanning
the corpus. The index persists the corpus's LSH band keys once; every
later crawl increment queries (reads only the key-range partitions its
own keys land in) and then folds itself in (touches only the same
partitions, exactly-once under retry — the aggregate-view/token-index
refresh discipline).

Layout: ``part-{pid:05d}.parquet`` files of sorted (key:int64,
doc_id:int64) rows, RANGE-partitioned by the top bits of the uint64
band key (keys are splitmix-uniform, so ranges are balanced) —
range partitioning is what makes query-side partition PRUNING work:
a query's keys map straight to partition ids and only those files are
opened, with an ``is_in`` row-group filter below that. ``_INDEX.json``
records (num_perm, bands, partition bits, refresh counter).

Verification: candidates from the index equal
``minhash_candidate_pairs`` restricted to new x old (pytest); the
``index_near_dups`` query exact-verifies candidates and matches an
exhaustive SQL jaccard cross-scan at bands=32 (per-pair miss
probability (1-0.8^4)^32 ~ 5e-8 at j = 0.8, vanishing for higher
jaccard).
"""

from __future__ import annotations

import json
import logging
import os
import shutil
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from patito_ray.functions.dedup import _splitmix, band_rows

_LOG = logging.getLogger(__name__)

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _band_keys(
    batch: pa.Table, id_col: str, text_col: str, num_perm: int, bands: int
) -> pa.Table:
    """(key:int64, doc_id:int64) rows — the combined band key shared
    with ``minhash_candidate_pairs``."""
    rows = band_rows(batch, id_col, text_col, num_perm, bands)
    band = rows.column("band").to_numpy(zero_copy_only=False).astype(np.uint64)
    bh = rows.column("band_hash").to_numpy(zero_copy_only=False).view(np.uint64)
    key = _splitmix(bh ^ (band * _GOLDEN))
    return pa.table(
        {
            "key": pa.array(key.view(np.int64), type=pa.int64()),
            "doc_id": pc.cast(rows.column(id_col), pa.int64()),
        }
    )


def _pid_of(key_i64: np.ndarray, bits: int) -> np.ndarray:
    return (key_i64.view(np.uint64) >> np.uint64(64 - bits)).astype(np.int64)


def build_minhash_index(
    ds: Any,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 128,
    bands: int = 32,
    partition_bits: int | None = None,
    overwrite: bool = False,
) -> dict[str, Any]:
    """One streaming pass: band keys per batch, ONE range exchange on
    the key's top bits, per-partition sort + atomic write."""
    import polars as pl
    import pyarrow.parquet as pq

    from patito_ray.stages.join import default_num_partitions
    from patito_ray.validation.checkpoint import _atomic_write

    if os.path.exists(out_dir):
        if not overwrite:
            raise FileExistsError(f"{out_dir} exists; pass overwrite=True")
        shutil.rmtree(out_dir)
    if partition_bits is None:
        partition_bits = max(2, int(np.ceil(np.log2(default_num_partitions()))))
    P = 1 << partition_bits

    def keyed(t: pa.Table) -> pa.Table:
        rows = _band_keys(t, id_col, text_col, num_perm, bands)
        pid = _pid_of(rows.column("key").to_numpy(zero_copy_only=False), partition_bits)
        return rows.append_column("part", pa.array(pid, type=pa.int64()))

    tmp = out_dir + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)

    def write_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "key" not in t.column_names:
            return pa.table(
                {"pid": pa.array([], pa.int64()), "rows": pa.array([], pa.int64())}
            )
        pid = int(t.column("part")[0].as_py())
        body = (
            pl.from_arrow(t.drop_columns(["part"]))
            .unique()
            .sort(["key", "doc_id"])
            .to_arrow()
        )
        final = os.path.join(tmp, f"part-{pid:05d}.parquet")
        # mkstemp: duplicate/speculative attempts of the same group get
        # DISTINCT hidden tmp files — no interleaved writes can ever be
        # published by the atomic rename
        import tempfile

        fd, hidden = tempfile.mkstemp(prefix=f".tmp-{pid:05d}-", dir=tmp)
        os.close(fd)
        pq.write_table(body, hidden)
        os.replace(hidden, final)
        return pa.table(
            {"pid": pa.array([pid], pa.int64()), "rows": pa.array([body.num_rows], pa.int64())}
        )

    stats = [
        t
        for t in ds.map_batches(keyed, batch_format="pyarrow", batch_size=None)
        .groupby("part")
        .map_groups(write_part, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
        if t.num_rows and "pid" in t.column_names
    ]
    total = int(sum(int(v) for t in stats for v in t.column("rows").to_pylist()))
    _atomic_write(
        os.path.join(tmp, "_INDEX.json"),
        json.dumps(
            {
                "num_perm": num_perm,
                "bands": bands,
                "partition_bits": partition_bits,
                "id_col": id_col,
                "text_col": text_col,
                "refreshes": 0,
            }
        ).encode(),
    )
    os.rename(tmp, out_dir)
    return {"band_rows": total, "partitions": P}


def _meta(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "_INDEX.json")) as f:
        return json.load(f)


def query_minhash_index(
    index_dir: str,
    new_docs: Any,
    id_col: str | None = None,
    text_col: str | None = None,
    max_bucket: int = 200,
) -> Any:
    """Candidate near-dup pairs of NEW docs against the indexed corpus
    -> Dataset[a:int64 (new id), b:int64 (indexed id)] distinct.

    ``id_col``/``text_col`` default to the names the index was BUILT
    with (recorded in ``_INDEX.json``) — pass them only when the new
    batch uses different column names.

    The new side's (key, id) rows collect to the driver (bounded:
    |new batch| x bands x 16 B — the INCREMENT is the small side by
    definition); its keys select index partitions by range (pruning:
    only those files are opened) with an ``is_in`` row-group filter,
    and each index batch hash-joins against the broadcast new table.
    Nothing corpus-sized moves.

    ``max_bucket`` is the hot-key guard (minhash_candidate_pairs
    contract): a band key with more than ``max_bucket`` rows on EITHER
    side is dropped with a logged warning before any pair forms — a
    boilerplate-heavy key would otherwise emit |new| x |indexed| pairs
    in one join."""
    import glob

    import polars as pl
    import ray
    import ray.data as rd

    meta = _meta(index_dir)
    bits = meta["partition_bits"]
    id_col = meta["id_col"] if id_col is None else id_col
    text_col = meta["text_col"] if text_col is None else text_col

    parts = [
        t
        for t in new_docs.map_batches(
            lambda t: _band_keys(t, id_col, text_col, meta["num_perm"], meta["bands"]),
            batch_format="pyarrow",
            batch_size=None,
        ).iter_batches(batch_format="pyarrow")
        if t.num_rows
    ]
    empty = pa.table(
        {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
    )
    if not parts:
        return empty
    new_rows = (
        pl.from_arrow(pa.concat_tables(parts)).unique().to_arrow()
    )
    # new-side hot keys: exact counts are driver-local already
    kcnt = (
        pl.from_arrow(new_rows)
        .group_by("key")
        .len()
        .filter(pl.col("len") > max_bucket)
    )
    if kcnt.height:
        _LOG.warning(
            "query_minhash_index: dropping %d band keys with > %d new-side "
            "rows (hot-key guard)", kcnt.height, max_bucket,
        )
        hot = pa.array(kcnt["key"].to_list(), pa.int64())
        new_rows = new_rows.filter(
            pc.invert(pc.is_in(new_rows.column("key"), value_set=hot))
        )
        if new_rows.num_rows == 0:
            return empty
    keys = new_rows.column("key").to_numpy(zero_copy_only=False)
    pids = np.unique(_pid_of(keys, bits))
    files = [
        f
        for p in pids.tolist()
        for f in glob.glob(os.path.join(index_dir, f"part-{p:05d}.parquet"))
    ]
    if not files:
        return empty

    from patito_ray.sources.readers import clean_read_parquet

    idx = clean_read_parquet(
        files, filter=pc.field("key").isin(pa.array(np.unique(keys), pa.int64()))
    ).materialize()  # consumed twice: hot-key count pass + join pass

    # indexed-side hot keys: one vocabulary-bounded count merge over
    # the (already key-filtered) subset
    from patito_ray.stages.agg import collect_table, merge_partial_sums

    cnt_sch = pa.schema([("key", pa.int64()), ("c", pa.int64())])

    def count_keys(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "key" not in t.column_names:
            return cnt_sch.empty_table()
        return (
            pl.from_arrow(t.select(["key"]))
            .group_by("key")
            .agg(pl.len().cast(pl.Int64).alias("c"))
            .to_arrow()
            .cast(cnt_sch)
        )

    merged = merge_partial_sums(
        idx.map_batches(count_keys, batch_format="pyarrow", batch_size=None),
        ["key"],
        ["c"],
    )
    if not isinstance(merged, pa.Table):
        merged = collect_table(merged, empty_schema=cnt_sch)
    hot_old = merged.filter(pc.greater(merged.column("c"), max_bucket))
    if hot_old.num_rows:
        _LOG.warning(
            "query_minhash_index: dropping %d band keys with > %d indexed "
            "rows (hot-key guard)", hot_old.num_rows, max_bucket,
        )
        new_rows = new_rows.filter(
            pc.invert(
                pc.is_in(new_rows.column("key"), value_set=hot_old.column("key"))
            )
        )
        if new_rows.num_rows == 0:
            return empty
    ref = ray.put(new_rows)

    def join(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        nr = ray.get(ref)
        j = t.rename_columns(["key", "b"]).join(
            nr.rename_columns(["key", "a"]), keys=["key"]
        )
        if j.num_rows == 0:
            return empty
        out = (
            pl.from_arrow(j.select(["a", "b"]))
            .filter(pl.col("a") != pl.col("b"))
            .unique()
            .to_arrow()
        )
        return out.cast(empty.schema)

    pairs = idx.map_batches(join, batch_format="pyarrow", batch_size=None)
    # dedup pairs that collided in several bands/partitions: tiny merge
    from patito_ray.stages.agg import merge_partial_sums

    counted = merge_partial_sums(
        pairs.map_batches(
            lambda t: t.append_column("c", pa.array(np.ones(t.num_rows, np.int64)))
            if t.num_rows
            else pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                 "c": pa.array([], pa.int64())}
            ),
            batch_format="pyarrow",
            batch_size=None,
        ),
        ["a", "b"],
        ["c"],
    )
    if isinstance(counted, pa.Table):
        return counted.select(["a", "b"])
    sch = pa.schema([("a", pa.int64()), ("b", pa.int64())])
    return counted.map_batches(
        lambda t: t.select(["a", "b"]) if t.num_rows and "a" in t.column_names
        else sch.empty_table(),
        batch_format="pyarrow",
        batch_size=None,
    )


def refresh_minhash_index(index_dir: str, new_docs: Any) -> dict[str, Any]:
    """Fold NEW docs' band keys into the index — O(delta + touched
    partitions). Exactly-once under Ray retry: the refresh id (sorted
    delta digest + counter) lands in each partition file's parquet
    metadata; an already-folded partition skips (token-index/agg-view
    contract)."""
    import hashlib

    import polars as pl
    import pyarrow.parquet as pq
    import ray

    from patito_ray.validation.checkpoint import _atomic_write

    meta = _meta(index_dir)
    bits = meta["partition_bits"]
    parts = [
        t
        for t in new_docs.map_batches(
            lambda t: _band_keys(
                t, meta["id_col"], meta["text_col"], meta["num_perm"], meta["bands"]
            ),
            batch_format="pyarrow",
            batch_size=None,
        ).iter_batches(batch_format="pyarrow")
        if t.num_rows
    ]
    if not parts:
        return {"partitions_touched": 0, "new_rows": 0}
    delta = (
        pl.from_arrow(pa.concat_tables(parts)).unique().sort(["key", "doc_id"]).to_arrow()
    )
    pid = _pid_of(delta.column("key").to_numpy(zero_copy_only=False), bits)
    delta = delta.append_column("part", pa.array(pid, type=pa.int64()))

    seq = int(meta.get("refreshes", 0)) + 1
    h = hashlib.blake2b(digest_size=12)
    h.update(str(seq).encode())
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, delta.schema) as w:
        w.write_table(delta)
    h.update(sink.getvalue())
    rid = h.hexdigest()
    delta_ref = ray.put(delta)

    @ray.remote
    def _fold(p: int) -> int:
        import pyarrow.compute as _pc

        d = ray.get(delta_ref)
        mine = d.filter(_pc.equal(d.column("part"), p)).drop_columns(["part"])
        path = os.path.join(index_dir, f"part-{p:05d}.parquet")
        frames = [pl.from_arrow(mine)]
        before = 0
        if os.path.exists(path):
            existing = pq.read_table(path)
            md = existing.schema.metadata or {}
            if md.get(b"refresh_id", b"").decode() == rid:
                return 0
            frames.append(pl.from_arrow(existing))
            before = existing.num_rows
        merged = pl.concat(frames).unique().sort(["key", "doc_id"]).to_arrow()
        merged = merged.replace_schema_metadata({"refresh_id": rid})
        # mkstemp in the LIVE index dir: two concurrent attempts of the
        # same fold (zombie worker + retry) write distinct hidden files
        # and each publishes a complete one atomically; dataset reads
        # skip dot-files, so orphans cannot poison queries
        import tempfile

        fd, tmp = tempfile.mkstemp(prefix=f".tmp-{p:05d}-", dir=index_dir)
        os.close(fd)
        pq.write_table(merged, tmp)
        os.replace(tmp, path)
        return merged.num_rows - before

    pids = sorted(int(v) for v in np.unique(pid))
    added = sum(ray.get([_fold.remote(p) for p in pids]))
    meta["refreshes"] = seq
    _atomic_write(
        os.path.join(index_dir, "_INDEX.json"), json.dumps(meta).encode()
    )
    return {"partitions_touched": len(pids), "new_rows": int(added)}
