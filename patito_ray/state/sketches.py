"""Mergeable sketches for distributed column statistics.

The reference computes no sketches (its stats are exact single-node
aggregates); the north star adds HyperLogLog cardinality and t-digest
quantiles accumulated per partition and tree-merged (BASELINE.json).
Both implementations follow the published algorithms: HyperLogLog
(Flajolet et al. 2007, with the HLL++ small-range linear-counting
correction) and the merging t-digest (Dunning & Ertl,
"Computing Extremely Accurate Quantiles Using t-Digests", 2019).
Pure numpy; states are tiny (16 KiB / few KiB) and merge is
associative+commutative, so they ride the same tree-reduce as the
validation Partials.
"""

from __future__ import annotations

from typing import Any

import numpy as np


def hash64(values: Any) -> np.ndarray:
    """Vectorized 64-bit hash of an arrow array (polars' Rust hash with a
    fixed seed: deterministic within one build, uniform across the
    cluster image)."""
    import polars as pl
    import pyarrow as pa

    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    return pl.from_arrow(values).hash(seed=42).to_numpy().astype(np.uint64)


class HyperLogLog:
    """HLL with 2^p registers; standard-error ~= 1.04 / sqrt(2^p)."""

    __slots__ = ("p", "m", "registers")

    def __init__(self, p: int = 14) -> None:
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, hashes: np.ndarray) -> None:
        h = hashes.astype(np.uint64)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)
        # rank = count-leading-zeros + 1, via highest-set-bit binary search
        # (vectorized; float log2 is imprecise for 64-bit values)
        hb = np.zeros(len(h), dtype=np.int64)
        vv = rest.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            mask = vv >= (np.uint64(1) << np.uint64(shift))
            hb[mask] += shift
            vv[mask] >>= np.uint64(shift)
        rank = (64 - hb).clip(1, 64 - self.p + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        inv = np.power(2.0, -self.registers.astype(np.float64))
        raw = alpha * m * m / inv.sum()
        zeros = int((self.registers == 0).sum())
        if raw <= 2.5 * m and zeros:
            return m * np.log(m / zeros)  # linear counting (small range)
        return float(raw)

    # serialization for crossing task boundaries
    def state(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def from_state(cls, blob: bytes, p: int = 14) -> "HyperLogLog":
        h = cls(p)
        h.registers = np.frombuffer(blob, dtype=np.uint8).copy()
        return h


class TDigest:
    """Merging t-digest with the k1 scale function."""

    __slots__ = ("delta", "means", "weights", "_buf")

    def __init__(self, delta: int = 200) -> None:
        self.delta = delta
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self._buf: list[np.ndarray] = []

    def add(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v):
            self._buf.append(v)
        if sum(len(b) for b in self._buf) > 65536:
            self._compress()

    def __getstate__(self) -> tuple:
        # compress before pickling: a sketch DELTA must stay a few KiB
        # of centroids, never a raw-value buffer — these travel from
        # every batch to the merge stage
        self._compress()
        return (self.delta, self.means, self.weights)

    def __setstate__(self, st: tuple) -> None:
        if len(st) == 3:
            self.delta, self.means, self.weights = st
            self._buf = []
            return
        # legacy checkpoint pickles used the default __slots__ protocol
        # state (None, slots_dict) — keep old stats.pkl files resumable
        _, slots = st
        self.delta = slots["delta"]
        self.means = slots["means"]
        self.weights = slots["weights"]
        self._buf = list(slots.get("_buf", []))

    def _compress(self) -> None:
        import math

        if self._buf:
            new_means = np.concatenate([self.means] + self._buf)
            new_weights = np.concatenate(
                [self.weights] + [np.ones(len(b)) for b in self._buf]
            )
            self._buf = []
        else:
            new_means, new_weights = self.means, self.weights
        n = len(new_means)
        if n == 0:
            return
        order = np.argsort(new_means, kind="stable")
        means = new_means[order]
        weights = new_weights[order]
        # greedy k1 clustering, but looping over CLUSTERS (<= ~delta of
        # them), never points: each cluster's end index comes from one
        # searchsorted against the inclusive cumulative weight at the
        # inverse scale function's q bound — identical grouping to the
        # point-loop greedy form (monotone k: "k(q_incl) <= k(q_left)+1"
        # == "q_incl <= k_inv(k(q_left)+1)"), ~100x less Python
        cum = np.cumsum(weights)
        total = cum[-1]
        d = float(self.delta)
        two_pi = 2.0 * math.pi

        def _k(q: float) -> float:
            q = min(max(q, 1e-12), 1.0 - 1e-12)
            return d / two_pi * math.asin(2.0 * q - 1.0)

        k_hi = _k(1.0)
        starts = [0]
        i = 0
        while True:
            q_left = float(cum[i - 1] / total) if i else 0.0
            y = _k(q_left) + 1.0
            if y >= k_hi:
                break  # the final cluster swallows the remainder
            q_bound = (math.sin(two_pi * y / d) + 1.0) / 2.0
            end = int(np.searchsorted(cum, q_bound * total, side="right"))
            i = max(i + 1, end)
            if i >= n:
                break
            starts.append(i)
        starts_arr = np.asarray(starts, dtype=np.int64)
        wsum = np.add.reduceat(weights, starts_arr)
        self.means = np.add.reduceat(means * weights, starts_arr) / wsum
        self.weights = wsum

    def merge(self, other: "TDigest") -> "TDigest":
        if len(other.means):
            self.means = np.concatenate([self.means, other.means])
            self.weights = np.concatenate([self.weights, other.weights])
        for b in other._buf:
            self._buf.append(b)
        self._compress()
        return self

    def quantile(self, q: float) -> float:
        self._compress()
        if len(self.means) == 0:
            return float("nan")
        cum = np.cumsum(self.weights) - self.weights / 2
        target = q * self.weights.sum()
        return float(np.interp(target, cum, self.means))

    def state(self) -> tuple[np.ndarray, np.ndarray]:
        self._compress()
        return self.means, self.weights

    @classmethod
    def from_state(cls, means: np.ndarray, weights: np.ndarray, delta: int = 200) -> "TDigest":
        t = cls(delta)
        t.means = np.asarray(means, dtype=np.float64)
        t.weights = np.asarray(weights, dtype=np.float64)
        return t


class MisraGries:
    """Misra-Gries frequent-items (heavy-hitter) summary with capacity
    ``k`` — the skew-diagnostic sketch ("which keys would melt a
    groupby partition?").

    Guarantees (standard; Misra & Gries 1982, merge form per Agarwal et
    al., "Mergeable summaries", PODS 2012): after summarizing n total
    occurrences, every stored estimate undercounts its item's true
    frequency by at most ``error_bound() = floor(n / (k+1))``, every
    item with true frequency above that bound is present, and two
    summaries merge (counter-wise add, then decrement all by the
    (k+1)-th largest and drop non-positives) with the bounds adding.
    When the column's distinct count never exceeds ``k``, the summary
    is EXACT — which is what the oracle-checked query exploits.
    """

    __slots__ = ("k", "counts", "decremented")

    def __init__(self, k: int = 64) -> None:
        if k < 1:
            raise ValueError(f"capacity must be >= 1, got {k}")
        self.k = k
        self.counts: dict[Any, int] = {}
        # total amount subtracted by decrement steps: the uniform
        # undercount of every surviving counter (and the upper bound on
        # any evicted item's true count)
        self.decremented = 0

    def add(self, values: Any) -> None:
        """Absorb an arrow array / numpy array / sequence of hashable
        values (nulls skipped). Vectorized pre-aggregation: one
        value_counts per batch, then at most one decrement step."""
        import pyarrow as pa

        if isinstance(values, (pa.Array, pa.ChunkedArray)):
            vc = values.value_counts()
            if isinstance(vc, pa.ChunkedArray):
                vc = vc.combine_chunks()
            items = zip(vc.field("values").to_pylist(), vc.field("counts").to_pylist())
        else:
            # object arrays with None crash np.unique's sort; NaN != NaN
            # would fragment one value over many counters across merges.
            # Both count as null: skipped (like the arrow-null path).
            from collections import Counter

            seq = values.tolist() if isinstance(values, np.ndarray) else values
            items = Counter(v for v in seq if v is not None and v == v).items()
        for v, c in items:
            if v is None or v != v:  # arrow path: null / NaN rows
                continue
            self.counts[v] = self.counts.get(v, 0) + int(c)
        self._shrink()

    def _shrink(self) -> None:
        if len(self.counts) <= self.k:
            return
        # decrement all by the (k+1)-th largest count, drop non-positive
        cs = sorted(self.counts.values(), reverse=True)
        d = cs[self.k]
        self.decremented += d
        self.counts = {v: c - d for v, c in self.counts.items() if c - d > 0}

    def merge(self, other: "MisraGries") -> "MisraGries":
        for v, c in other.counts.items():
            self.counts[v] = self.counts.get(v, 0) + c
        self.decremented += other.decremented
        self._shrink()
        return self

    def error_bound(self) -> int:
        """Max undercount of any stored estimate (0 => summary exact)."""
        return self.decremented

    def items(self) -> list[tuple[Any, int, int]]:
        """(value, count_lower, count_upper) sorted by estimate desc;
        true count is within [lower, upper]."""
        return [
            (v, c, c + self.decremented)
            for v, c in sorted(
                self.counts.items(), key=lambda kv: (-kv[1], str(kv[0]))
            )
        ]


class BloomFilter:
    """Bloom membership filter (Bloom 1970) with Kirsch-Mitzenmacher
    double hashing (g_i = h1 + i*h2), vectorized over uint64 key-hash
    arrays. Guarantees: never a false negative; false-positive rate
    ~= the configured target at the expected key count. Merge is
    bitwise OR (same geometry), associative + commutative — a bloom
    built per partition and OR-merged is BIT-IDENTICAL to one built
    sequentially, so membership answers are partition-independent.

    Sizing: m = -n*ln(p)/ln(2)^2 bits, k = round(m/n * ln 2) probes
    (the standard optima). State is the fixed-size bitmap — ship it
    once per partition, never per batch.
    """

    __slots__ = ("m_bits", "k", "words")

    def __init__(self, n_expected: int, fp_rate: float = 0.01) -> None:
        if n_expected < 1:
            raise ValueError(f"n_expected must be >= 1, got {n_expected}")
        if not 0.0 < fp_rate < 1.0:
            raise ValueError(f"fp_rate must be in (0, 1), got {fp_rate}")
        m = int(np.ceil(-n_expected * np.log(fp_rate) / (np.log(2.0) ** 2)))
        self.m_bits = max(64, m)
        self.k = max(1, int(round(self.m_bits / n_expected * np.log(2.0))))
        self.words = np.zeros((self.m_bits + 63) // 64, dtype=np.uint64)

    def _positions(self, hashes: np.ndarray) -> np.ndarray:
        """(k, n) bit positions per key via double hashing."""
        h = hashes.astype(np.uint64)
        h1 = h
        # odd second hash (splitmix-style remix) so strides cover the table
        h2 = (h * np.uint64(0x9E3779B97F4A7C15)) | np.uint64(1)
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        return ((h1[None, :] + i * h2[None, :]) % np.uint64(self.m_bits))

    def add_hashes(self, hashes: np.ndarray) -> "BloomFilter":
        if hashes.size == 0:
            return self
        pos = self._positions(hashes).ravel()
        np.bitwise_or.at(
            self.words, (pos >> np.uint64(6)).astype(np.int64),
            np.uint64(1) << (pos & np.uint64(63)),
        )
        return self

    def contains_hashes(self, hashes: np.ndarray) -> np.ndarray:
        """Boolean per key: True = maybe present (never falsely False)."""
        if hashes.size == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(hashes)
        w = self.words[(pos >> np.uint64(6)).astype(np.int64)]
        hit = (w >> (pos & np.uint64(63))) & np.uint64(1)
        return hit.all(axis=0)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        if (self.m_bits, self.k) != (other.m_bits, other.k):
            raise ValueError(
                "cannot merge blooms with different geometry: "
                f"({self.m_bits},{self.k}) vs ({other.m_bits},{other.k})"
            )
        np.bitwise_or(self.words, other.words, out=self.words)
        return self

    def fill_ratio(self) -> float:
        """Fraction of set bits (FP rate ~= fill^k); > ~0.5 means the
        filter is overloaded past its design n_expected."""
        return float(
            np.unpackbits(self.words.view(np.uint8)).sum() / (len(self.words) * 64)
        )

    def state(self) -> bytes:
        return self.words.tobytes()

    @classmethod
    def from_state(
        cls, blob: bytes, n_expected: int, fp_rate: float = 0.01
    ) -> "BloomFilter":
        b = cls(n_expected, fp_rate)
        words = np.frombuffer(blob, dtype=np.uint64).copy()
        if words.size != b.words.size:
            raise ValueError(
                f"bloom state has {words.size} words, geometry expects "
                f"{b.words.size} (n_expected/fp_rate must match the build)"
            )
        b.words = words
        return b


class CountMin:
    """Count-Min sketch (Cormode & Muthukrishnan 2005): approximate
    per-key counts in O(d*w) fixed memory, vectorized over uint64
    key-hash arrays. Guarantees: estimates never UNDER-count; over-count
    <= eps * total_weight with probability >= 1 - delta, where
    w = ceil(e / eps) and d = ceil(ln(1/delta)). Merge is element-wise
    ADDITION (same geometry), associative + commutative — a sketch
    built per partition and merged equals one built sequentially
    BIT-identically, so estimates are partition-independent.

    Complements the other frequency state: MisraGries answers "which
    keys are heavy" (top-k identities), CountMin answers "how often is
    THIS key" for any key on demand — the point-query side of skew
    detection and rate limiting. Rows per hash: counters are int64
    (weights may be row counts or byte sizes; int64 holds 100 TB)."""

    __slots__ = ("d", "w", "table")

    _SEED = np.uint64(0xC2B2AE3D27D4EB4F)

    def __init__(self, eps: float = 1e-4, delta: float = 1e-3) -> None:
        if not 0.0 < eps < 1.0:
            raise ValueError(f"eps must be in (0, 1), got {eps}")
        if not 0.0 < delta < 1.0:
            raise ValueError(f"delta must be in (0, 1), got {delta}")
        self.w = int(np.ceil(np.e / eps))
        self.d = max(1, int(np.ceil(np.log(1.0 / delta))))
        self.table = np.zeros((self.d, self.w), dtype=np.int64)

    def _cols(self, hashes: np.ndarray) -> np.ndarray:
        """(d, n) column indices — one pairwise-independent-style remix
        per row (splitmix stream keyed by the row index)."""
        h = hashes.astype(np.uint64)
        row_keys = (
            np.arange(1, self.d + 1, dtype=np.uint64)[:, None] * self._SEED
        )
        mixed = (h[None, :] ^ row_keys) * np.uint64(0xFF51AFD7ED558CCD)
        mixed ^= mixed >> np.uint64(33)
        return (mixed % np.uint64(self.w)).astype(np.int64)

    def add_hashes(self, hashes: np.ndarray, weights: np.ndarray | None = None) -> "CountMin":
        if hashes.size == 0:
            return self
        if weights is None:
            weights = np.ones(hashes.size, dtype=np.int64)
        cols = self._cols(hashes)
        for r in range(self.d):
            np.add.at(self.table[r], cols[r], weights)
        return self

    def estimate_hashes(self, hashes: np.ndarray) -> np.ndarray:
        """Point estimates (min over rows) — never under-counts."""
        if hashes.size == 0:
            return np.zeros(0, dtype=np.int64)
        cols = self._cols(hashes)
        est = self.table[0][cols[0]]
        for r in range(1, self.d):
            est = np.minimum(est, self.table[r][cols[r]])
        return est

    def merge(self, other: "CountMin") -> "CountMin":
        if (self.d, self.w) != (other.d, other.w):
            raise ValueError(
                f"CountMin geometry mismatch: ({self.d},{self.w}) vs "
                f"({other.d},{other.w})"
            )
        self.table += other.table
        return self

    def total(self) -> int:
        return int(self.table[0].sum())
