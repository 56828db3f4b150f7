"""Property tests for the sampling / chunk operators: the vectorized
kernels must equal straightforward pure-Python references on arbitrary
inputs, and membership/selection must be independent of batch
boundaries (the distributed-correctness invariant)."""

import hypothesis.strategies as st
import numpy as np
import pyarrow as pa
from hypothesis import given, settings

from patito_ray.functions.dedup import _splitmix, explode_chunks
from patito_ray.functions.sampling import sample_batch

# texts over a tiny alphabet with RE2-relevant whitespace (\x0b is
# unicode-space but NOT RE2 \s — it must stay inside tokens)
texts = st.lists(
    st.text(alphabet="ab \t\n\x0b", max_size=24), min_size=0, max_size=8
)


def _ref_chunks(texts_list, n):
    out = []
    for i, t in enumerate(texts_list):
        toks = [x for x in __import__("re").split(r"[\t\n\f\r ]+", t) if x]
        for j in range(0, len(toks), n):
            out.append((i, j // n, " ".join(toks[j : j + n])))
    return out


@settings(max_examples=200, deadline=None)
@given(texts=texts, n=st.integers(min_value=1, max_value=4))
def test_explode_chunks_matches_python_reference(texts, n):
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    got = [
        (r["doc_id"], r["chunk_idx"], r["chunk"])
        for r in explode_chunks(t, chunk_tokens=n).to_pylist()
    ]
    assert got == _ref_chunks(texts, n)


@settings(max_examples=100, deadline=None)
@given(
    keys=st.lists(
        st.integers(min_value=0, max_value=2**62), min_size=0, max_size=60
    ),
    frac_millis=st.integers(min_value=0, max_value=1000),
    seed=st.integers(min_value=0, max_value=2**32),
    split=st.integers(min_value=0, max_value=60),
)
def test_sample_membership_batch_independent(keys, frac_millis, seed, split):
    frac = frac_millis / 1000.0
    t = pa.table({"k": pa.array(keys, type=pa.int64())})
    whole = set(sample_batch(t, "k", frac, seed)["k"].to_pylist())
    split = min(split, len(keys))
    a = sample_batch(t.slice(0, split), "k", frac, seed)["k"].to_pylist()
    b = sample_batch(t.slice(split), "k", frac, seed)["k"].to_pylist()
    assert set(a) | set(b) == whole
    # membership equals the definitional per-key predicate
    if frac < 1.0:
        thr = np.uint64(int(frac * 2.0**64))
        expect = {
            k
            for k in keys
            if _splitmix(np.array([k], dtype=np.uint64) ^ np.uint64(seed))[0]
            < thr
        }
    else:
        expect = set(keys)
    assert whole == expect


@settings(max_examples=100, deadline=None)
@given(
    data=st.lists(st.integers(min_value=0, max_value=40), min_size=0, max_size=400),
    k=st.integers(min_value=2, max_value=16),
    cuts=st.lists(st.integers(min_value=0, max_value=400), max_size=4),
)
def test_misra_gries_guarantees(data, k, cuts):
    from collections import Counter

    from patito_ray.state.sketches import MisraGries

    # arbitrary split into chunks, merged pairwise -> same guarantees
    bounds = sorted({min(c, len(data)) for c in cuts} | {0, len(data)})
    acc = MisraGries(k)
    for a, b in zip(bounds, bounds[1:]):
        part = MisraGries(k)
        part.add(np.array(data[a:b], dtype=np.int64))
        acc.merge(part)
    true = Counter(data)
    n = len(data)
    assert acc.error_bound() * (k + 1) <= n
    est = {v: (lo, hi) for v, lo, hi in acc.items()}
    for v, (lo, hi) in est.items():
        assert lo <= true[v] <= hi  # bounds always bracket truth
    for v, c in true.items():
        if c > acc.error_bound():
            assert v in est  # every sufficiently-frequent item survives
    if len(true) <= k:
        assert acc.error_bound() == 0
        assert {v: lo for v, lo, _ in acc.items()} == dict(true)


def test_mix_fractions_semantics():
    import pytest

    from patito_ray.functions.sampling import mix_fractions

    counts = {"a": 100, "b": 10, "c": 0}
    fr = mix_fractions(counts, {"a": 0.5, "b": 0.5, "c": 0.1, "d": 1.0}, 40)
    assert fr["a"] == (40.0 * 0.5) / 100.0  # sub-1 fraction
    assert fr["b"] == 1.0  # demand 20 > supply 10 -> saturate
    assert "c" not in fr and "d" not in fr  # absent/empty sources skipped
    with pytest.raises(ValueError, match="weight"):
        mix_fractions(counts, {"a": -0.1}, 10)
    with pytest.raises(ValueError, match="target_rows"):
        mix_fractions(counts, {"a": 0.5}, -1)


def test_mix_sources_deterministic_and_partition_stable(ray_session):
    import ray.data as rd

    from patito_ray.functions.dedup import _splitmix as sm
    from patito_ray.functions.sampling import mix_sources

    n = 400
    ids = np.arange(n, dtype=np.int64)
    srcs = ["web", "wiki", "book", "junk"]
    src = [srcs[i % 4] for i in range(n)]
    tab = pa.table({"doc_id": ids, "source": src})
    weights = {"web": 0.6, "wiki": 0.3, "book": 0.1}
    target = 120

    got = {}
    for blocks in (1, 7):
        ds = rd.from_arrow(tab).repartition(blocks)
        rows = mix_sources(ds, "doc_id", "source", weights, target).take_all()
        got[blocks] = sorted((r["doc_id"], r["source"]) for r in rows)
    assert got[1] == got[7]  # membership independent of partitioning

    # local reference: same fractions, same splitmix threshold rule
    h = sm(ids.view(np.uint64))
    want = []
    for i in range(n):
        s = src[i]
        if s not in weights:
            continue
        f = min(1.0, (float(target) * weights[s]) / 100.0)
        if f >= 1.0 or h[i] < np.uint64(int(f * 2.0**64)):
            want.append((int(ids[i]), s))
    assert got[1] == sorted(want)
    assert all(s != "junk" for _, s in got[1])  # unweighted source dropped


@settings(max_examples=200, deadline=None)
@given(
    fracs=st.lists(
        st.integers(min_value=0, max_value=500), min_size=1, max_size=5
    )
)
def test_split_thresholds_monotone_and_saturating(fracs):
    from patito_ray.functions.sampling import split_thresholds

    fr = {f"s{i}": f / 1000.0 for i, f in enumerate(fracs)}
    if sum(fr.values()) > 1.0 + 1e-9:
        import pytest

        with pytest.raises(ValueError):
            split_thresholds(fr)
        return
    b = split_thresholds(fr)
    assert all(x <= y for x, y in zip(b, b[1:]))  # monotone non-decreasing
    assert all(0 <= x <= 2**64 for x in b)
    if sum(fr.values()) >= 1.0:
        assert b[-1] == 2**64  # saturation: no key past the final split


def test_assign_splits_matches_reference_and_partition_stable(ray_session):
    import ray.data as rd

    from patito_ray.functions.dedup import _splitmix as sm
    from patito_ray.functions.sampling import assign_splits, split_thresholds

    n = 500
    ids = np.arange(n, dtype=np.int64)
    tab = pa.table({"doc_id": ids})
    fr = {"train": 0.7, "val": 0.1}  # sums < 1: held-out rows get null

    got = {}
    for blocks in (1, 9):
        ds = rd.from_arrow(tab).repartition(blocks)
        rows = assign_splits(ds, "doc_id", fr, seed=3).take_all()
        got[blocks] = sorted((r["doc_id"], r["split"]) for r in rows)
    assert got[1] == got[9]

    b = split_thresholds(fr)
    h = sm(ids.view(np.uint64) ^ np.uint64(3))
    names = list(fr)
    want = []
    for i in range(n):
        lab = None
        for j, bound in enumerate(b):
            if int(h[i]) < bound:
                lab = names[j]
                break
        want.append((int(ids[i]), lab))
    assert got[1] == sorted(want)
    labs = {lab for _, lab in got[1]}
    assert None in labs and "train" in labs  # both branches exercised


def test_assign_splits_saturated_covers_every_row(ray_session):
    import ray.data as rd

    from patito_ray.functions.sampling import assign_splits

    tab = pa.table({"doc_id": pa.array(range(300), type=pa.int64())})
    rows = assign_splits(
        rd.from_arrow(tab), "doc_id", {"a": 0.5, "b": 0.3, "c": 0.2}
    ).take_all()
    assert len(rows) == 300
    assert all(r["split"] in ("a", "b", "c") for r in rows)


def test_sample_exact_k_matches_reference_and_partition_stable(ray_session):
    import ray.data as rd

    from patito_ray.functions.dedup import _splitmix as sm
    from patito_ray.functions.sampling import sample_exact_k

    n, k, seed = 500, 37, 11
    ids = np.arange(n, dtype=np.int64)
    tab = pa.table({"doc_id": ids, "payload": [f"p{i}" for i in range(n)]})

    h = sm(ids.view(np.uint64) ^ np.uint64(seed))
    order = np.lexsort((ids, h))
    want = sorted(int(ids[i]) for i in order[:k])

    got = {}
    for blocks in (1, 13):
        ds = rd.from_arrow(tab).repartition(blocks)
        rows = sample_exact_k(ds, "doc_id", k, seed=seed).take_all()
        assert all(r["payload"] == f"p{r['doc_id']}" for r in rows)
        assert all("_h" not in r for r in rows)
        got[blocks] = sorted(r["doc_id"] for r in rows)
    assert got[1] == got[13] == want


def test_sample_exact_k_edges(ray_session):
    import pytest
    import ray.data as rd

    from patito_ray.functions.sampling import sample_exact_k

    tab = pa.table({"doc_id": pa.array(range(5), type=pa.int64())})
    # k >= n keeps everything
    rows = sample_exact_k(rd.from_arrow(tab), "doc_id", 50).take_all()
    assert sorted(r["doc_id"] for r in rows) == list(range(5))
    # empty input -> empty output, no crash
    empty = pa.table({"doc_id": pa.array([], type=pa.int64())})
    assert sample_exact_k(rd.from_arrow(empty), "doc_id", 3).take_all() == []
    with pytest.raises(ValueError, match="k must be"):
        sample_exact_k(rd.from_arrow(tab), "doc_id", 0)


def test_sample_exact_k_distributed_finalize(ray_session, monkeypatch):
    """Force the sort().limit() branch and check it matches the driver
    fast-path selection."""
    import ray.data as rd

    import patito_ray.validation.engine as eng
    from patito_ray.functions.dedup import _splitmix as sm
    from patito_ray.functions.sampling import sample_exact_k

    n, k = 300, 9
    ids = np.arange(n, dtype=np.int64)
    ds = rd.from_arrow(pa.table({"doc_id": ids})).repartition(5)
    h = sm(ids.view(np.uint64))
    want = sorted(int(ids[i]) for i in np.lexsort((ids, h))[:k])

    monkeypatch.setattr(eng, "_DRIVER_FASTPATH_BYTES", 0)
    rows = sample_exact_k(ds, "doc_id", k).take_all()
    assert sorted(r["doc_id"] for r in rows) == want


def _weighted_reference(keys, weights, k, seed=0):
    """Pure-python Efraimidis–Spirakis with the engine's exact floats."""
    h = _splitmix(np.array(keys, dtype=np.int64).view(np.uint64) ^ np.uint64(seed))
    u = (h.astype(np.float64) + 1.0) / 18446744073709551616.0
    e = -np.log(u) / np.asarray(weights, dtype=np.float64)
    order = np.lexsort((np.asarray(keys), e))[:k]
    return sorted(np.asarray(keys)[order].tolist())


def test_weighted_sample_k_matches_reference_any_partitioning(ray_session):
    import ray.data as rd

    from patito_ray.functions.sampling import weighted_sample_k

    rng = np.random.default_rng(3)
    keys = rng.permutation(500).astype(np.int64)
    weights = rng.uniform(0.1, 10.0, size=500)
    tab = pa.table({"doc_id": keys, "w": weights})
    ref = _weighted_reference(keys, weights, 40)
    for n_blocks in (1, 3, 9):
        got = weighted_sample_k(
            rd.from_arrow(tab).repartition(n_blocks), "doc_id", "w", 40
        ).take_all()
        assert sorted(r["doc_id"] for r in got) == ref, n_blocks


def test_weighted_sample_k_pairwise_inclusion_law(ray_session):
    """P(key A wins over key B at k=1) must approach wA/(wA+wB): check
    the engine's key math directly over many seeds (no Ray pipeline per
    seed — the selection key is a pure function)."""
    from patito_ray.functions.sampling import _key_hashes

    wa, wb = 3.0, 1.0
    wins = 0
    trials = 2000
    tab = pa.table({"doc_id": pa.array([11, 22], pa.int64())})
    for seed in range(trials):
        h = _key_hashes(tab, "doc_id", seed)
        u = (h.astype(np.float64) + 1.0) / 18446744073709551616.0
        e = -np.log(u) / np.array([wa, wb])
        wins += e[0] < e[1]
    frac = wins / trials
    assert abs(frac - 0.75) < 0.03, frac


def test_weighted_sample_k_rejects_bad_weights(ray_session):
    import pytest
    import ray.data as rd

    from patito_ray.functions.sampling import weighted_sample_k

    tab = pa.table({"doc_id": pa.array([1, 2], pa.int64()), "w": [1.0, 0.0]})
    with pytest.raises(Exception, match="weights must be"):
        weighted_sample_k(rd.from_arrow(tab), "doc_id", "w", 1).take_all()
    tab2 = pa.table({"doc_id": pa.array([1, 2], pa.int64()), "w": [1.0, None]})
    with pytest.raises(Exception, match="weights must be"):
        weighted_sample_k(rd.from_arrow(tab2), "doc_id", "w", 1).take_all()
