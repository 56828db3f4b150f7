"""Poisson bootstrap vs a pure-python reference (both merge paths),
plus distribution sanity: replicate means cluster around the corpus
mean and effective sample sizes around n."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

from patito_ray.functions.dedup import _splitmix
from patito_ray.pipelines.queries import (
    _BOOT_REPS,
    _BOOT_SEED,
    _POISSON_T,
    q_poisson_bootstrap,
)

SF = "/root/testdata/sf0.001"


def _reference():
    t = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_extendedprice"],
    )
    ok = t.column("l_orderkey").to_numpy()
    ln = t.column("l_linenumber").to_numpy()
    cents = np.floor(t.column("l_extendedprice").to_numpy() * 100.0 + 0.5).astype(
        np.int64
    )
    rid = (ok * 8 + ln).astype(np.uint64)
    thresholds = np.array(_POISSON_T, dtype=np.uint64)
    s = np.zeros(_BOOT_REPS, dtype=np.int64)
    c = np.zeros(_BOOT_REPS, dtype=np.int64)
    for b in range(_BOOT_REPS):
        h = _splitmix((rid * np.uint64(_BOOT_REPS) + np.uint64(b)) ^ np.uint64(_BOOT_SEED))
        w = np.searchsorted(thresholds, h, side="right").astype(np.int64)
        s[b] = int(np.dot(w, cents))
        c[b] = int(w.sum())
    return s, c, cents


@pytest.mark.parametrize("limit_bytes", [None, 0])
def test_poisson_bootstrap_reference(ray_session, limit_bytes):
    s, c, cents = _reference()
    out = q_poisson_bootstrap(SF, limit_bytes=limit_bytes)
    assert out.column("rep").to_pylist() == list(range(_BOOT_REPS))
    assert out.column("s_cents").to_pylist() == s.tolist()
    assert out.column("n_eff").to_pylist() == c.tolist()
    means = np.array(out.column("mean_cents").to_pylist())
    # bit-exactness of the one float op
    np.testing.assert_array_equal(means, s.astype(np.float64) / c.astype(np.float64))

    # statistical sanity: Poisson(1) weights -> n_eff ~ n +- 4*sqrt(n),
    # replicate means within a few standard errors of the corpus mean
    n = len(cents)
    assert np.all(np.abs(c - n) < 4 * np.sqrt(n) + 10)
    mu, sd = cents.mean(), cents.std()
    se = sd / np.sqrt(n)
    assert np.all(np.abs(means - mu) < 6 * se + 1)


def test_poisson_weights_marginal_distribution():
    # the truncated-Poisson marginal should match Poisson(1) pmf closely
    rng_keys = np.arange(200_000, dtype=np.uint64)
    h = _splitmix(rng_keys ^ np.uint64(_BOOT_SEED))
    w = np.searchsorted(np.array(_POISSON_T, dtype=np.uint64), h, side="right")
    freq = np.bincount(w, minlength=4)[:4] / len(w)
    expect = np.exp(-1.0) / np.array([1.0, 1.0, 2.0, 6.0])
    np.testing.assert_allclose(freq, expect, atol=0.005)
