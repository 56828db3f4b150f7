"""Product quantization: codebook-exact reconstruction, recall bound
vs exact brute force, partitioning independence, code size."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from patito_ray.functions.pq import pq_encode, pq_search, pq_train


def _ds(vecs, ids=None):
    import ray.data as rd

    n = len(vecs)
    ids = np.arange(n, dtype=np.int64) if ids is None else ids
    return rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(
                    [list(map(float, v)) for v in vecs], pa.list_(pa.float64())
                ),
            }
        )
    )


def test_codebook_exact_search(ray_session):
    """A codebook whose entries ARE the corpus subvectors encodes with
    zero reconstruction error, so ADC scores equal exact cosines and
    pq_search equals brute force (same tie-break: neighbor id asc)."""
    from patito_ray.functions.similarity import topk_cosine

    rng = np.random.default_rng(5)
    n, m, sub = 60, 4, 4  # d = 16
    vecs = rng.standard_normal((n, m * sub))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    # per-subspace codebook = the corpus subvectors themselves
    books = np.stack(
        [vecs[:, j * sub : (j + 1) * sub] for j in range(m)], axis=0
    )
    ds = _ds(vecs).repartition(4).materialize()
    enc = pq_encode(ds, books).materialize()
    qv = vecs[:5]
    qid = np.arange(5, dtype=np.int64)
    got = pq_search(enc, books, qid, qv, k=5)
    want = topk_cosine(ds, qid, qv, k=5, exclude_self=False)
    g = list(zip(got.column("query_id").to_pylist(),
                 got.column("neighbor_id").to_pylist()))
    w = list(zip(want.column("query_id").to_pylist(),
                 want.column("neighbor_id").to_pylist()))
    assert g == w


def test_recall_clustered(ray_session):
    """Clustered corpus (the realistic regime): PQ recall@10 vs exact
    brute force stays high at a 32x memory reduction (m=8 bytes vs
    32 float64 dims)."""
    from patito_ray.functions.similarity import topk_cosine

    rng = np.random.default_rng(11)
    n, d, n_clusters = 8000, 32, 40
    centers = rng.standard_normal((n_clusters, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = centers[rng.integers(0, n_clusters, n)] + 0.25 * rng.standard_normal(
        (n, d)
    )
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    ds = _ds(vecs).repartition(8).materialize()

    books = pq_train(ds, m=8, k=64, sample_size=4000, iters=10)
    enc = pq_encode(ds, books).materialize()
    qid = np.arange(40, dtype=np.int64)
    qv = vecs[rng.choice(n, 40, replace=False)] + 0.05 * rng.standard_normal(
        (40, d)
    )
    qv /= np.linalg.norm(qv, axis=1, keepdims=True)
    want = topk_cosine(ds, qid, qv, k=10, exclude_self=False)
    w = set(zip(want.column("query_id").to_pylist(),
                want.column("neighbor_id").to_pylist()))

    def recall(tbl):
        g = set(zip(tbl.column("query_id").to_pylist(),
                    tbl.column("neighbor_id").to_pylist()))
        return len(g & w) / len(w)

    raw = pq_search(enc, books, qid, qv, k=10)
    assert recall(raw) >= 0.4  # raw ADC floor at 32x compression
    # the deployment shape: wide ADC candidates + exact rerank of the
    # bounded candidate subset
    rer = pq_search(
        enc, books, qid, qv, k=10, rerank_ds=ds, rerank_factor=10
    )
    assert recall(rer) >= 0.9, recall(rer)
    # and the code column really is m bytes per vector
    code = enc.take(1)[0]["pq_code"]
    assert len(code) == 8


def test_partitioning_independence(ray_session):
    rng = np.random.default_rng(2)
    vecs = rng.standard_normal((500, 16))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    books = pq_train(_ds(vecs).materialize(), m=4, k=32, sample_size=500)
    qid = np.arange(6, dtype=np.int64)
    qv = vecs[:6]
    outs = []
    for parts in (1, 7):
        enc = pq_encode(_ds(vecs).repartition(parts), books).materialize()
        outs.append(pq_search(enc, books, qid, qv, k=5).to_pydict())
    assert outs[0] == outs[1]


def test_train_guards(ray_session):
    vecs = np.eye(6)
    with pytest.raises(ValueError, match="divisible"):
        pq_train(_ds(vecs).materialize(), m=4, k=4, sample_size=10)
    with pytest.raises(ValueError, match="uint8"):
        pq_train(_ds(vecs).materialize(), m=2, k=512, sample_size=10)
