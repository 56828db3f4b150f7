"""Persisted inverted token index + index-accelerated search.

``tfidf_search``/``bm25_search`` score a query by SCANNING the corpus;
that is the right shape for one-off ad-hoc queries, but a serving
workload (thousands of term lookups against a frozen 100-TB corpus)
must not pay a corpus scan per query. The classic answer is an
inverted index: one build pass explodes distinct (token, doc_id)
postings, hash-partitions them BY TOKEN, and writes each partition
sorted by (token, doc_id); a search then touches only the partition
files its query terms hash to — everything else stays cold — and
row-group statistics on the sorted token column prune within a file.

Tokenization is ``tfidf.re2_split_tokens`` (the repo-wide RE2-exact
``\\S+`` kernel), so results match DuckDB
``regexp_extract_all(text, '\\S+')`` token-for-token.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any

import numpy as np
import pyarrow as pa

from patito_ray.functions.tfidf import re2_split_tokens


def build_token_index(
    ds: Any,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
    overwrite: bool = False,
) -> dict[str, Any]:
    """One streaming build pass: per batch, tokenize + dedup (token,
    id) pairs locally (a token repeated in a doc costs ONE posting
    before the exchange), ONE hash exchange on the token,
    per-partition cross-batch dedup + sort + write. Returns
    ``{"postings", "partitions"}``; layout is
    ``part-{pid:05d}.parquet`` + ``_INDEX.json``."""
    import polars as pl
    import pyarrow.parquet as pq

    from patito_ray.stages.exchange import hash_partition_ids
    from patito_ray.stages.join import default_num_partitions
    from patito_ray.validation.checkpoint import _atomic_write

    if os.path.exists(out_dir):
        if not overwrite:
            raise FileExistsError(f"{out_dir} exists; pass overwrite=True")
        shutil.rmtree(out_dir)
    P = num_partitions or default_num_partitions()

    def postings(t: pa.Table) -> pa.Table:
        flat, parents, _n = re2_split_tokens(t.column(text_col))
        if len(flat) == 0:
            return pa.table(
                {
                    "token": pa.array([], pa.string()),
                    "doc_id": pa.array([], pa.int64()),
                    "part": pa.array([], pa.int64()),
                }
            )
        ids = (
            t.column(id_col)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)[parents]
        )
        pairs = (
            pl.from_arrow(
                pa.table({"token": flat, "doc_id": pa.array(ids, pa.int64())})
            )
            .unique()
            .to_arrow()
        )
        pid = hash_partition_ids(pairs.column("token"), P, "index token")
        return pairs.append_column("part", pa.array(pid, type=pa.int64()))

    def write_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "token" not in t.column_names:
            return pa.table(
                {"pid": pa.array([], pa.int64()), "postings": pa.array([], pa.int64())}
            )
        pid = int(t.column("part")[0].as_py())
        body = (
            pl.from_arrow(t.drop_columns(["part"]))
            .unique()
            .sort(["token", "doc_id"])
            .to_arrow()
        )
        # write-to-hidden-tmp + atomic rename: a task that dies mid-
        # write can never leave a truncated visible partition file
        final = os.path.join(out_dir + ".tmp", f"part-{pid:05d}.parquet")
        tmp = os.path.join(out_dir + ".tmp", f".tmp-{pid:05d}")
        pq.write_table(body, tmp)
        os.replace(tmp, final)
        return pa.table(
            {
                "pid": pa.array([pid], pa.int64()),
                "postings": pa.array([body.num_rows], pa.int64()),
            }
        )

    tmp = out_dir + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)
    stats = [
        t
        for t in ds.map_batches(postings, batch_format="pyarrow", batch_size=None)
        .groupby("part")
        .map_groups(write_part, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
        if t.num_rows
    ]
    total = int(sum(int(v) for t in stats for v in t.column("postings").to_pylist()))
    _atomic_write(
        os.path.join(tmp, "_INDEX.json"),
        json.dumps(
            {"num_partitions": P, "id_col": id_col, "text_col": text_col}
        ).encode(),
    )
    os.rename(tmp, out_dir)
    return {"postings": total, "partitions": len(stats)}


def search_index(
    index_dir: str, terms: list[str], mode: str = "and"
) -> Any:
    """Doc ids whose text contains ALL (``mode='and'``) or ANY
    (``'or'``) of ``terms`` as exact whitespace tokens. Reads ONLY the
    partition files the distinct terms hash to; within each file the
    sorted token column lets Parquet row-group stats prune. Matching is
    distributed (per-batch term filter → per-id match count through the
    adaptive partial-sum merge) so a stopword-sized posting list never
    lands on the driver. Returns a Dataset/table with one ``doc_id``
    column."""
    import polars as pl

    from patito_ray.sources.readers import clean_read_parquet
    from patito_ray.stages.agg import merge_partial_sums
    from patito_ray.stages.exchange import hash_partition_ids

    if mode not in ("and", "or"):
        raise ValueError(f"mode must be 'and' or 'or', got {mode!r}")
    uniq = sorted(set(terms))
    if not uniq:
        raise ValueError("terms must be non-empty")
    with open(os.path.join(index_dir, "_INDEX.json")) as f:
        meta = json.load(f)
    pids = np.unique(
        hash_partition_ids(
            pa.array(uniq, pa.string()), meta["num_partitions"], "query term"
        )
    )
    need = len(uniq)
    paths = [
        p
        for p in (
            os.path.join(index_dir, f"part-{int(pid):05d}.parquet") for pid in pids
        )
        if os.path.exists(p)  # a term may hash to a partition no token used
    ]
    empty = pa.schema([("doc_id", pa.int64())]).empty_table()
    if not paths:
        return empty
    term_set = pa.array(uniq, pa.string())

    def match(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        hit = t.filter(pc.is_in(t.column("token"), value_set=term_set))
        return (
            pl.from_arrow(hit.select(["doc_id"]))
            .group_by("doc_id")
            .agg(pl.len().cast(pl.Int64).alias("k"))
            .to_arrow()
        )

    counts = merge_partial_sums(
        clean_read_parquet(paths).map_batches(
            match, batch_format="pyarrow", batch_size=None
        ),
        ["doc_id"],
        ["k"],
    )

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if t.num_rows == 0:
            return empty
        if mode == "and":
            t = t.filter(pc.greater_equal(t.column("k"), pa.scalar(need)))
        return pa.table({"doc_id": t.column("doc_id").cast(pa.int64())})

    if isinstance(counts, pa.Table):
        return finish(counts)
    return counts.map_batches(finish, batch_format="pyarrow", batch_size=None)


def refresh_token_index(index_dir: str, new_docs: Any) -> dict[str, Any]:
    """Fold NEW documents into an existing index without rebuilding:
    the delta's distinct (token, doc_id) postings hash with the SAME
    partition count the index was built with, and only the partitions
    a delta token hashes to are read + merged + atomically rewritten —
    O(delta postings + touched partitions), never O(corpus).

    Exactly-once under Ray task retry: like the aggregate view, each
    refresh id (delta content + refresh counter) is recorded in the
    partition file's Parquet metadata and an already-folded partition
    skips. Insert-only (re-adding an existing (token, doc) pair is a
    no-op by the distinct-postings invariant); deletions need a
    rebuild. Returns ``{"partitions_touched", "new_postings"}``."""
    import hashlib

    import polars as pl
    import pyarrow.parquet as pq
    import ray

    from patito_ray.stages.exchange import hash_partition_ids
    from patito_ray.validation.checkpoint import _atomic_write

    with open(os.path.join(index_dir, "_INDEX.json")) as f:
        meta = json.load(f)
    P = meta["num_partitions"]
    id_col, text_col = meta["id_col"], meta["text_col"]

    def postings(t: pa.Table) -> pa.Table:
        flat, parents, _n = re2_split_tokens(t.column(text_col))
        if len(flat) == 0:
            return pa.table(
                {"token": pa.array([], pa.string()), "doc_id": pa.array([], pa.int64())}
            )
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)[parents]
        return (
            pl.from_arrow(
                pa.table({"token": flat, "doc_id": pa.array(ids, pa.int64())})
            )
            .unique()
            .to_arrow()
        )

    parts = [
        t
        for t in new_docs.map_batches(
            postings, batch_format="pyarrow", batch_size=None
        ).iter_batches(batch_format="pyarrow")
        if t.num_rows
    ]
    if not parts:
        return {"partitions_touched": 0, "new_postings": 0}
    delta = (
        pl.from_arrow(pa.concat_tables(parts))
        .unique()
        .sort(["token", "doc_id"])  # canonical order -> stable refresh id
        .to_arrow()
    )
    pid = hash_partition_ids(delta.column("token"), P, "index token")
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
        import pyarrow.compute as pc

        d = ray.get(delta_ref)
        mine = d.filter(pc.equal(d.column("part"), p)).drop_columns(["part"])
        path = os.path.join(index_dir, f"part-{p:05d}.parquet")
        frames = [pl.from_arrow(mine)]
        if os.path.exists(path):
            existing = pq.read_table(path)
            md = existing.schema.metadata or {}
            if md.get(b"refresh_id", b"").decode() == rid:
                return 0  # this refresh already folded here
            frames.append(pl.from_arrow(existing))
        before = 0 if len(frames) == 1 else frames[1].height
        merged = (
            pl.concat(frames).unique().sort(["token", "doc_id"]).to_arrow()
        )
        merged = merged.replace_schema_metadata({"refresh_id": rid})
        tmp = f"{index_dir}/.tmp-{p:05d}"
        pq.write_table(merged, tmp)
        os.replace(tmp, path)
        return merged.num_rows - before

    pids = sorted(int(v) for v in np.unique(pid))
    added = ray.get([_fold.remote(p) for p in pids])
    meta["refreshes"] = seq
    _atomic_write(
        os.path.join(index_dir, "_INDEX.json"),
        json.dumps(meta, sort_keys=True).encode(),
    )
    return {"partitions_touched": len(pids), "new_postings": int(sum(added))}
