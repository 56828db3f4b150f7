"""Hypothesis properties for the rank-correlation kernels: the
inversion counter vs a quadratic reference on arbitrary int64 inputs,
and the Kendall pair-class partition invariant."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from patito_ray.functions.kendall import (
    avg_rank2,
    count_inversions,
    kendall_counts,
    spearman_moments,
)

ints = st.integers(min_value=-(2**62), max_value=2**62)


@settings(max_examples=300, deadline=None)
@given(st.lists(ints, max_size=120))
def test_count_inversions_matches_quadratic(ys):
    y = np.array(ys, dtype=np.int64)
    brute = sum(
        1 for i in range(len(y)) for j in range(i + 1, len(y)) if y[i] > y[j]
    )
    assert count_inversions(y) == brute


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(st.integers(-5, 5), st.integers(-5, 5)), max_size=80))
def test_kendall_classes_partition_all_pairs(pairs):
    x = np.array([a for a, _ in pairs], dtype=np.int64)
    y = np.array([b for _, b in pairs], dtype=np.int64)
    c = kendall_counts(x, y)
    n = len(pairs)
    assert (
        c["concordant"] + c["discordant"] + c["ties_x"] + c["ties_y"] + c["ties_xy"]
        == n * (n - 1) // 2
    )
    # symmetry: swapping the roles of x and y swaps the tie classes
    # and preserves concordant/discordant
    cs = kendall_counts(y, x)
    assert cs["concordant"] == c["concordant"]
    assert cs["discordant"] == c["discordant"]
    assert cs["ties_x"] == c["ties_y"] and cs["ties_y"] == c["ties_x"]


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(-7, 7), max_size=90))
def test_avg_rank2_is_a_rank_function(vals):
    a = np.array(vals, dtype=np.int64)
    r2 = avg_rank2(a)
    n = len(a)
    # doubled midranks always sum to n(n+1) regardless of ties
    assert int(r2.sum()) == n * (n + 1)
    # order-preserving: a[i] < a[j] implies r2[i] < r2[j]; ties equal
    for i in range(min(n, 25)):
        for j in range(min(n, 25)):
            if a[i] < a[j]:
                assert r2[i] < r2[j]
            elif a[i] == a[j]:
                assert r2[i] == r2[j]


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(st.integers(-4, 4), st.integers(-4, 4)), max_size=60))
def test_spearman_moment_bounds(pairs):
    x = np.array([a for a, _ in pairs], dtype=np.int64)
    y = np.array([b for _, b in pairs], dtype=np.int64)
    m = spearman_moments(x, y)
    n = len(pairs)
    # Cauchy-Schwarz on the doubled midranks
    assert m["sxy"] * m["sxy"] <= m["sxx"] * m["syy"]
    assert m["n"] == n
