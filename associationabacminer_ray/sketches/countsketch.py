"""Count sketch (AMS) — signed counters: unbiased point counts AND the
second frequency moment F2 = Σ f(k)² in one pass, no shuffle.

The count-min sketch (``cms.py``) answers point queries with one-sided
(over-estimate) error; it cannot answer *moment* queries.  The count
sketch (Charikar, Chen, Farach-Colton 2002; F2 estimator per Alon,
Matias, Szegedy 1996) hashes each key to one cell per row like CMS but
multiplies the increment by a ±1 hash sign, so collisions cancel in
expectation:

- point estimate  = median over rows of ``sign(k) · cell(k)``
  (unbiased, |err| ≤ √(F2/width) per row w.p. ≥ 2/3, median boosts)
- F2 estimate     = median over rows of ``Σ_j cell[j]²``
  (the AMS estimator: each row's sum of squares is unbiased for F2
  with relative std-dev ≤ √(2/width))

F2 is the self-join size of the key distribution — for the miner, "how
concentrated is (role,tool) traffic" / the expected collision mass of a
hash-partitioning — and computing it EXACTLY needs a full groupby-count
shuffle (``SUM(c²)`` over per-key counts); the sketch gets within
√(2/width) relative error from per-partition partials merged by
element-wise addition.

Counters are int64 and the merge is element-wise addition, hence
exactly associative/commutative: estimates are bit-identical across
arbitrary partition splits and merge orders (property-tested alongside
CMS/HLL/Bloom/theta), which makes sketch queries built on it pinnable
at the gate (cross-CPU-validated golden, see ``scripts/pin_goldens.py``).

Replaces, at scale, the reference's exact support dict
(``src/EnvAbacRuleMiner.py:161-168``) for concentration/self-join-size
questions the CMS cannot answer.
"""

from __future__ import annotations

import struct

import numpy as np

from ..functions.hashing import mix_with_seed
from .base import Sketch

U64 = np.uint64


class CountSketch(Sketch):
    MAGIC = b"CSK1"
    WRITABLE_ARRAYS = ("table",)

    def __init__(self, width: int = 1 << 14, depth: int = 5, seed: int = 19,
                 table: np.ndarray | None = None):
        if width <= 0 or depth <= 0:
            raise ValueError("width and depth must be positive")
        if depth % 2 == 0:
            # an even row count makes the median an average of two rows —
            # still fine, but odd depth keeps estimates integer-exact
            raise ValueError("depth must be odd so the median is one row")
        self.width = int(width)
        self.depth = int(depth)
        self.seed = int(seed)
        self.total = 0  # total |weight| added
        if table is None:
            table = np.zeros((self.depth, self.width), dtype=np.int64)
        self.table = table

    @property
    def f2_relative_error(self) -> float:
        """Std-dev bound of one row's F2 estimate, relative to F2."""
        return float(np.sqrt(2.0 / self.width))

    # -- row index + sign ------------------------------------------------
    def _rows(self, hashes: np.ndarray):
        h = np.asarray(hashes, dtype=np.uint64)
        w = U64(self.width)
        for i in range(self.depth):
            m = mix_with_seed(h, self.seed * 2654435761 + i)
            idx = (m % w).astype(np.int64)
            # sign from the top bit — independent of the low-bit index
            # for any width ≪ 2^63
            sign = ((m >> U64(62)).astype(np.int64) & 2) - 1
            yield i, idx, sign

    def update_hashed(self, hashes: np.ndarray,
                      counts: np.ndarray | None = None) -> "CountSketch":
        self._writable()
        h = np.asarray(hashes, dtype=np.uint64)
        if counts is None:
            counts = np.ones(h.shape, dtype=np.int64)
        else:
            counts = np.asarray(counts, dtype=np.int64)
        for i, idx, sign in self._rows(h):
            np.add.at(self.table[i], idx, sign * counts)
        self.total += int(np.abs(counts).sum())
        return self

    # -- queries ---------------------------------------------------------
    def estimate_hashed(self, hashes: np.ndarray) -> np.ndarray:
        """Unbiased point counts (median over rows of signed cells)."""
        h = np.atleast_1d(np.asarray(hashes, dtype=np.uint64))
        per_row = np.empty((self.depth, h.size), dtype=np.int64)
        for i, idx, sign in self._rows(h):
            per_row[i] = sign * self.table[i][idx]
        return np.median(per_row, axis=0).astype(np.int64)

    def estimate_one(self, hashed_key: int) -> int:
        return int(self.estimate_hashed(np.array([hashed_key], dtype=U64))[0])

    def f2_estimate(self) -> int:
        """AMS second-moment estimate: median over rows of Σ cell²."""
        sq = (self.table.astype(np.float64) ** 2).sum(axis=1)
        # exact integer sums (cells are int64; squares fit in float64 up
        # to 2^53 — beyond that use object ints)
        if (np.abs(self.table) >= (1 << 26)).any():
            sums = sorted(sum(int(c) * int(c) for c in row) for row in self.table)
            return int(sums[self.depth // 2])
        return int(np.median(sq))

    # -- merge / serialize ------------------------------------------------
    def merge(self, other: "CountSketch") -> "CountSketch":
        self._check_mergeable(other, "width", "depth", "seed")
        self._writable()
        self.table += other.table
        self.total += other.total
        return self

    def _payload(self) -> bytes:
        head = struct.pack("<IIqq", self.width, self.depth, self.seed, self.total)
        return head + np.ascontiguousarray(self.table).tobytes()

    @classmethod
    def _from_payload(cls, payload: bytes) -> "CountSketch":
        width, depth, seed, total = struct.unpack_from("<IIqq", payload)
        off = struct.calcsize("<IIqq")
        table = np.frombuffer(payload, dtype=np.int64, offset=off,
                              count=width * depth).reshape(depth, width).copy()
        out = cls(width=width, depth=depth, seed=seed, table=table)
        out.total = total
        return out
