"""Theta / KMV sketch — mergeable distinct counting WITH set algebra.

HLL (``hll.py``) answers only union-style cardinality questions; the
reference's evaluator also needs *overlaps* — e.g. how many unique
entries two rules both allow (``src/eval/EnvPolicyEvaluator.py:192-199``
builds giant Python hash sets and intersects them on the driver). The
theta sketch (Dasgupta, Lang, Rhodes, Thaler — "Theta Sketch Framework",
2016; KMV estimator per Bar-Yossef et al. 2002) keeps the ``k`` smallest
distinct 64-bit hashes plus an exclusive threshold ``theta``; any two
sketches over the same hash function support union, intersection and
difference estimates with relative error ≈ 1/√(k−1).

Merge semantics here are **exactly associative and commutative**: the
merged state is always (the k smallest distinct hashes of the combined
input, theta = (k+1)-th smallest when overflowed, else 2^64). Proof
sketch: every one of the k+1 globally-smallest hashes survives any
intermediate trim (a trim's theta is the (k+1)-th smallest of a *subset*,
hence ≥ the global (k+1)-th smallest), so the final state is a function
of the input multiset only — property-tested across shuffled merge
orders like CMS/HLL/Bloom.

**Exact regime**: while fewer than ``k`` distinct hashes have been seen,
theta stays at 2^64 and the sketch holds *every* distinct hash — all
estimates (cardinality, intersection, difference, Jaccard) are exact
integers. Queries that size ``k`` above the true cardinality are
therefore DuckDB-oracle-able (same convention as the space-saving
exact regime, see ``golden_oracles.py``).
"""

from __future__ import annotations

import struct

import numpy as np

from .base import Sketch, unpack_array

FULL_RANGE = 1 << 64  # exclusive theta bound meaning "no trim yet"


class ThetaKMV(Sketch):
    MAGIC = b"THT1"

    def __init__(self, k: int = 4096, hashes: np.ndarray | None = None,
                 theta: int = FULL_RANGE):
        if k < 2:
            raise ValueError("k must be >= 2")
        self.k = int(k)
        if hashes is None:
            hashes = np.empty(0, dtype=np.uint64)
        # invariant: sorted, unique, all < theta, len <= k
        self.hashes = np.asarray(hashes, dtype=np.uint64)
        self.theta = int(theta)

    @property
    def relative_error(self) -> float:
        return 1.0 / np.sqrt(self.k - 1)

    @property
    def is_exact(self) -> bool:
        """True while the sketch still holds every distinct hash seen."""
        return self.theta == FULL_RANGE

    def _trim(self, merged: np.ndarray, theta: int) -> None:
        if theta != FULL_RANGE:
            merged = merged[merged < np.uint64(theta)]
        if merged.size > self.k:
            theta = int(merged[self.k])
            merged = merged[: self.k]
        self.hashes = merged
        self.theta = theta

    def update_hashed(self, hashes: np.ndarray) -> "ThetaKMV":
        h = np.asarray(hashes, dtype=np.uint64)
        if h.size == 0:
            return self
        self._trim(np.union1d(self.hashes, h), self.theta)
        return self

    def merge(self, other: "ThetaKMV") -> "ThetaKMV":
        self._check_mergeable(other, "k")
        self._trim(np.union1d(self.hashes, other.hashes),
                   min(self.theta, other.theta))
        return self

    def estimate(self) -> float:
        if self.is_exact:
            return float(self.hashes.size)
        return self.hashes.size * FULL_RANGE / self.theta

    # --- set algebra ---------------------------------------------------
    def _common_view(self, other: "ThetaKMV") -> tuple[np.ndarray, np.ndarray, int]:
        """Both retained-hash sets cut down to the shared theta."""
        self._check_mergeable(other, "k")
        theta = min(self.theta, other.theta)
        a, b = self.hashes, other.hashes
        if theta != FULL_RANGE:
            bound = np.uint64(theta)
            a, b = a[a < bound], b[b < bound]
        return a, b, theta

    def intersection_estimate(self, other: "ThetaKMV") -> float:
        a, b, theta = self._common_view(other)
        n = np.intersect1d(a, b, assume_unique=True).size
        return float(n) if theta == FULL_RANGE else n * FULL_RANGE / theta

    def difference_estimate(self, other: "ThetaKMV") -> float:
        """Estimate of |self \\ other|."""
        a, b, theta = self._common_view(other)
        n = np.setdiff1d(a, b, assume_unique=True).size
        return float(n) if theta == FULL_RANGE else n * FULL_RANGE / theta

    def union_estimate(self, other: "ThetaKMV") -> float:
        a, b, theta = self._common_view(other)
        n = np.union1d(a, b).size
        if theta == FULL_RANGE:
            return float(n)
        # the union of two trimmed sets can exceed k entries below theta;
        # the |S|/theta estimator is still valid (same theta)
        return n * FULL_RANGE / theta

    def jaccard_estimate(self, other: "ThetaKMV") -> float:
        a, b, theta = self._common_view(other)
        union = np.union1d(a, b).size
        if union == 0:
            return 0.0
        inter = np.intersect1d(a, b, assume_unique=True).size
        return inter / union

    # --- serialization -------------------------------------------------
    def _payload(self) -> bytes:
        # theta-1 so the FULL_RANGE sentinel (2^64) fits in a uint64
        return (struct.pack("<IQ", self.k, self.theta - 1)
                + struct.pack("<I", self.hashes.size)
                + np.ascontiguousarray(self.hashes).tobytes())

    @classmethod
    def _from_payload(cls, payload: bytes) -> "ThetaKMV":
        k, theta_m1 = struct.unpack_from("<IQ", payload)
        hashes, _ = unpack_array(payload, 12, np.uint64)
        return cls(k=k, hashes=hashes, theta=theta_m1 + 1)
