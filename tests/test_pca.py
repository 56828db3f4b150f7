"""Distributed PCA / moment partials (functions/pca.py): driver and
forced-distributed merge branches vs a plain numpy reference."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _emb_ds(mat, blocks=4):
    import ray.data as rd

    t = pa.table(
        {
            "embedding": pa.array(
                [row.tolist() for row in mat.astype(np.float32)],
                type=pa.list_(pa.float32()),
            )
        }
    )
    return rd.from_arrow(t).repartition(blocks)


def test_pca_matches_numpy_reference(ray_session):
    from patito_ray.functions.pca import pca_embeddings

    rng = np.random.default_rng(3)
    # anisotropic data: 3 dominant directions
    base = rng.normal(size=(200, 6)) @ np.diag([5.0, 3.0, 1.0, 0.2, 0.1, 0.05])
    mat = base.astype(np.float32).astype(np.float64)

    res = pca_embeddings(_emb_ds(mat), "embedding", dim=6, k=3)
    cov_ref = np.cov(mat, rowvar=False, ddof=1)
    evals_ref = np.sort(np.linalg.eigvalsh(cov_ref))[::-1]
    np.testing.assert_allclose(res["eigenvalues"], evals_ref[:3], rtol=1e-8)
    np.testing.assert_allclose(
        res["explained_variance_ratio"],
        evals_ref[:3] / evals_ref.sum(),
        rtol=1e-8,
    )
    # components reconstruct covariance eigenstructure
    for vec, lam in zip(res["components"], res["eigenvalues"]):
        np.testing.assert_allclose(cov_ref @ vec, lam * vec, atol=1e-8)
        assert abs(np.linalg.norm(vec) - 1.0) < 1e-10


def test_moment_partials_distributed_branch(ray_session):
    from patito_ray.functions.pca import moment_partials

    rng = np.random.default_rng(9)
    mat = rng.normal(size=(150, 4))
    drv = moment_partials(_emb_ds(mat), "embedding", 4, quantize=1000.0)
    dist = moment_partials(
        _emb_ds(mat), "embedding", 4, quantize=1000.0, limit_bytes=0
    )

    def d(tab):
        return {
            (i, j): s
            for i, j, s in zip(
                tab.column("i").to_pylist(),
                tab.column("j").to_pylist(),
                tab.column("s").to_pylist(),
            )
        }

    assert d(drv) == d(dist)
    # exact integer moments vs numpy reference
    q = np.floor(mat * 1000.0 + 0.5).astype(np.int64)
    got = d(drv)
    assert got[(-1, -1)] == 150
    for i in range(4):
        assert got[(i, -1)] == int(q[:, i].sum())
        for j in range(i, 4):
            assert got[(i, j)] == int((q[:, i] * q[:, j]).sum())


def test_pca_errors(ray_session):
    from patito_ray.functions.pca import moment_partials, pca_embeddings

    mat = np.zeros((5, 3))
    ds = _emb_ds(mat, blocks=1)
    with pytest.raises(ValueError, match="dim"):
        moment_partials(ds, "embedding", 0)
    # wrong declared width surfaces from inside the Ray task
    with pytest.raises(Exception, match="width"):
        moment_partials(ds, "embedding", 7).num_rows
    with pytest.raises(ValueError, match="k must be"):
        pca_embeddings(ds, "embedding", dim=3, k=4)
    one = _emb_ds(np.zeros((1, 3)), blocks=1)
    with pytest.raises(ValueError, match=">= 2 rows"):
        pca_embeddings(one, "embedding", dim=3, k=1)


def test_pca_project_matches_numpy(ray_session):
    rng = np.random.default_rng(3)
    mat = rng.normal(size=(200, 6)) @ np.diag([5.0, 3.0, 1.0, 0.5, 0.2, 0.1])
    ds = _emb_ds(mat)

    from patito_ray.functions.pca import pca_embeddings, pca_project

    out = (
        pca_project(ds, "embedding", dim=6, k=3)
        .to_pandas()
        .to_numpy(dtype=np.float64)
    )

    fit = pca_embeddings(ds, "embedding", dim=6, k=3)
    # _emb_ds stores float32 embeddings: replicate the cast the dataset
    # path sees before comparing
    m32 = mat.astype(np.float32).astype(np.float64)
    expect = (m32 - fit["mean"]) @ np.asarray(fit["components"]).T
    assert out.shape == (200, 3)
    assert np.allclose(out, expect, atol=1e-9)
    # the dominant direction must capture the dominant variance
    assert out[:, 0].var() > out[:, 1].var() > out[:, 2].var()


def test_pca_project_id_column_and_empty_guard(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(4)
    mat = rng.normal(size=(50, 4))
    t = pa.table(
        {
            "vid": pa.array(np.arange(50), pa.int64()),
            "embedding": pa.array(
                [row.astype(np.float32) for row in mat],
                pa.list_(pa.float32()),
            ),
        }
    )
    from patito_ray.functions.pca import pca_project

    got = (
        pca_project(
            rd.from_arrow(t).repartition(3), "embedding", dim=4, k=2, id_col="vid"
        )
        .to_pandas()
        .sort_values("vid")
    )
    assert list(got.columns) == ["vid", "pc1", "pc2"]
    assert len(got) == 50
