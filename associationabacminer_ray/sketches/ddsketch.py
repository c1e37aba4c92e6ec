"""DDSketch — relative-error quantiles whose merge is EXACTLY
merge-order independent (integer bucket counts), unlike t-digest/KLL.

t-digest and KLL (``tdigest.py`` / ``kll.py``) give rank-error
quantiles but their compaction is merge-order sensitive — estimates
agree only within the error bound across partition splits, which is
why ``value_quantiles`` is a ``no_oracle`` query at the gate.  The
DDSketch (Masson, Rim, Lee — VLDB 2019) buckets values on a geometric
grid: for ``x > 0``, bucket ``k = ceil(log_γ(x))`` with
``γ = (1+α)/(1−α)``, so every value in bucket ``k`` lies in
``(γ^(k−1), γ^k]`` and the bucket midpoint ``2γ^k/(γ+1)`` is within
relative error α of it.  State is a sparse map bucket→int64 count
(plus a mirrored map for negatives and a zero counter); merge is
per-bucket addition — exactly associative and commutative, so the
returned quantiles are bit-identical across arbitrary partition splits
and merge orders.  That makes a DDSketch quantile query PINNABLE at
the driver gate (cross-CPU-validated golden) — the deterministic twin
the t-digest/KLL path can't provide.

Guarantee (nearest-rank convention): for every q, the returned value
``v̂`` satisfies ``|v̂ − v_q| ≤ α·|v_q|`` where ``v_q`` is the exact
nearest-rank quantile — asserted in pytest against exact recomputation.

Bucket count is bounded by the data's dynamic range, not its size:
full float64 range at α = 0.01 needs < 80k buckets (int32 keys); the
serialized blob stays O(KB) for realistic value columns, so it rides
Arrow ``binary()`` cells through the same groupby-aggregate shuffles
as CMS/HLL (``udaf.DDSketchAgg``).
"""

from __future__ import annotations

import math
import struct

import numpy as np

from .base import Sketch, unpack_array


def _merge_counts(keys_a: np.ndarray, counts_a: np.ndarray,
                  keys_b: np.ndarray, counts_b: np.ndarray):
    """Union two sorted sparse (key → count) maps, adding counts."""
    keys = np.concatenate([keys_a, keys_b])
    counts = np.concatenate([counts_a, counts_b])
    uniq, inv = np.unique(keys, return_inverse=True)
    summed = np.zeros(uniq.size, dtype=np.int64)
    np.add.at(summed, inv, counts)
    return uniq.astype(np.int32), summed


class DDSketch(Sketch):
    MAGIC = b"DDS1"

    def __init__(self, alpha: float = 0.01,
                 pos_keys: np.ndarray | None = None,
                 pos_counts: np.ndarray | None = None,
                 neg_keys: np.ndarray | None = None,
                 neg_counts: np.ndarray | None = None,
                 zero_count: int = 0):
        if not (0.0 < alpha < 1.0):
            raise ValueError("alpha must be in (0, 1)")
        self.alpha = float(alpha)
        self.gamma = (1.0 + self.alpha) / (1.0 - self.alpha)
        # glibc log, not np.log: the scalar SIMD log can differ by 1
        # ulp, and the derived-SQL oracles recompute ln(γ) with DuckDB
        # ln ≡ math.log (see functions/sqlgen.py)
        self._log_gamma = math.log(self.gamma)
        empty_k = np.empty(0, dtype=np.int32)
        empty_c = np.empty(0, dtype=np.int64)
        # invariant: keys sorted ascending, counts > 0, parallel arrays
        self.pos_keys = empty_k if pos_keys is None else np.asarray(pos_keys, np.int32)
        self.pos_counts = empty_c if pos_counts is None else np.asarray(pos_counts, np.int64)
        self.neg_keys = empty_k if neg_keys is None else np.asarray(neg_keys, np.int32)
        self.neg_counts = empty_c if neg_counts is None else np.asarray(neg_counts, np.int64)
        self.zero_count = int(zero_count)

    # -- updates ---------------------------------------------------------
    def _keys_of(self, v: np.ndarray) -> np.ndarray:
        # ceil(log_gamma(v)); float64 keys fit comfortably in int32 for
        # any alpha ≥ 1e-4 (|key| < ~7.1e6). The hot path stays
        # vectorized np.log (SIMD, ≤1 ulp off glibc — perturbs the
        # ratio by ≲1e-12 absolute); only values whose ratio lands
        # within 1e-9 of an integer — where that perturbation could
        # flip the ceil — are recomputed with math.log, making the
        # bucket map bit-identical to the DuckDB oracle's
        # ceil(ln(v)/ln(γ)) (shared libm) at vectorized speed.
        r = np.log(v) / self._log_gamma
        near = np.abs(r - np.rint(r)) < 1e-9
        if near.any():
            r[near] = (np.array([math.log(float(x)) for x in v[near]])
                       / self._log_gamma)
        return np.ceil(r).astype(np.int32)

    def update(self, values: np.ndarray) -> "DDSketch":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return self
        self.zero_count += int((v == 0.0).sum())
        pos = v[v > 0.0]
        if pos.size:
            k, c = np.unique(self._keys_of(pos), return_counts=True)
            self.pos_keys, self.pos_counts = _merge_counts(
                self.pos_keys, self.pos_counts, k.astype(np.int32), c.astype(np.int64))
        neg = v[v < 0.0]
        if neg.size:
            k, c = np.unique(self._keys_of(-neg), return_counts=True)
            self.neg_keys, self.neg_counts = _merge_counts(
                self.neg_keys, self.neg_counts, k.astype(np.int32), c.astype(np.int64))
        return self

    # -- queries ---------------------------------------------------------
    @property
    def n(self) -> int:
        return int(self.pos_counts.sum() + self.neg_counts.sum() + self.zero_count)

    def _rep(self, key: np.ndarray | int) -> np.ndarray | float:
        """Bucket midpoint: within relative error alpha of every member.
        Scalar keys (the quantile read path) use math.pow ≡ DuckDB
        power — np.power differs by 1 ulp on some keys, which would
        break the derived-SQL oracle's bit-parity."""
        if isinstance(key, (int, np.integer)):
            return 2.0 * math.pow(self.gamma, key) / (self.gamma + 1.0)
        return 2.0 * np.power(self.gamma, key) / (self.gamma + 1.0)

    def quantile(self, q: float) -> float:
        """Nearest-rank quantile: the smallest value whose cumulative
        count reaches ``ceil(q·n)`` (matching numpy 'inverted_cdf')."""
        n = self.n
        if n == 0:
            raise ValueError("empty sketch")
        rank = max(1, int(np.ceil(q * n)))
        # ascending value order: negatives (key descending), zero, positives
        cum = 0
        for i in range(self.neg_keys.size - 1, -1, -1):
            cum += int(self.neg_counts[i])
            if cum >= rank:
                return float(-self._rep(int(self.neg_keys[i])))
        cum += self.zero_count
        if cum >= rank:
            return 0.0
        for i in range(self.pos_keys.size):
            cum += int(self.pos_counts[i])
            if cum >= rank:
                return float(self._rep(int(self.pos_keys[i])))
        # unreachable if counts are consistent
        return float(self._rep(int(self.pos_keys[-1])))

    def quantiles(self, qs) -> list[float]:
        return [self.quantile(q) for q in qs]

    # -- merge / serialize -------------------------------------------------
    def merge(self, other: "DDSketch") -> "DDSketch":
        self._check_mergeable(other, "alpha")
        self.pos_keys, self.pos_counts = _merge_counts(
            self.pos_keys, self.pos_counts, other.pos_keys, other.pos_counts)
        self.neg_keys, self.neg_counts = _merge_counts(
            self.neg_keys, self.neg_counts, other.neg_keys, other.neg_counts)
        self.zero_count += other.zero_count
        return self

    def _payload(self) -> bytes:
        def pack(a: np.ndarray) -> bytes:
            return struct.pack("<I", a.size) + np.ascontiguousarray(a).tobytes()

        return (struct.pack("<dq", self.alpha, self.zero_count)
                + pack(self.pos_keys) + pack(self.pos_counts)
                + pack(self.neg_keys) + pack(self.neg_counts))

    @classmethod
    def _from_payload(cls, payload: bytes) -> "DDSketch":
        alpha, zero_count = struct.unpack_from("<dq", payload)
        off = struct.calcsize("<dq")
        pk, off = unpack_array(payload, off, np.int32)
        pc, off = unpack_array(payload, off, np.int64)
        nk, off = unpack_array(payload, off, np.int32)
        nc, off = unpack_array(payload, off, np.int64)
        return cls(alpha=alpha, pos_keys=pk, pos_counts=pc,
                   neg_keys=nk, neg_counts=nc, zero_count=zero_count)
