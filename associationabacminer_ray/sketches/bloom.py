"""Bloom filter — mergeable set membership with zero false negatives.

Replaces the reference's exact covered-entry anti-join
(``src/EnvAbacRuleMiner.py:268-272`` deletes covered log entries from
ES each greedy round) and candidate-membership pruning: covered conv_ids
go into a Bloom filter, the next round filters with it inside
``map_batches`` instead of re-shuffling the corpus.

FPR ≈ (1 - e^{-kn/m})^k; merge = bitwise OR (exactly associative).
"""

from __future__ import annotations

import math
import struct

import numpy as np

from ..functions.hashing import mix_with_seed
from .base import Sketch

U64 = np.uint64


class BloomFilter(Sketch):
    MAGIC = b"BLM1"
    VERSION = 2  # v2: seed packed as signed 64-bit (was unsigned 32)
    WRITABLE_ARRAYS = ("words",)

    def __init__(self, num_bits: int = 1 << 20, num_hashes: int = 5, seed: int = 11,
                 words: np.ndarray | None = None, count: int = 0):
        if num_bits <= 0 or num_hashes <= 0:
            raise ValueError("num_bits and num_hashes must be positive")
        if num_bits % 64:
            num_bits = ((num_bits // 64) + 1) * 64
        self.num_bits = int(num_bits)
        self.num_hashes = int(num_hashes)
        self.seed = int(seed)
        self.count = int(count)  # approximate inserted count (pre-dedup)
        if words is None:
            words = np.zeros(self.num_bits // 64, dtype=np.uint64)
        self.words = words

    @classmethod
    def for_capacity(cls, n: int, fpr: float = 0.01, seed: int = 11) -> "BloomFilter":
        # math.log, not np.log: the scalar SIMD log can differ by 1
        # ulp, and the derived-SQL crosscorpus oracle recomputes this
        # geometry with DuckDB ln ≡ math.log (functions/sqlgen.py)
        m = int(math.ceil(-n * math.log(fpr) / (math.log(2) ** 2)))
        k = max(1, int(round(m / max(n, 1) * math.log(2))))
        return cls(num_bits=m, num_hashes=k, seed=seed)

    def _bit_positions(self, hashes: np.ndarray):
        h = np.asarray(hashes, dtype=np.uint64)
        nb = U64(self.num_bits)
        for i in range(self.num_hashes):
            pos = mix_with_seed(h, self.seed * 2654435761 + i) % nb
            yield (pos >> U64(6)).astype(np.int64), (U64(1) << (pos & U64(63)))

    def add_hashed(self, hashes: np.ndarray) -> "BloomFilter":
        self._writable()
        h = np.asarray(hashes, dtype=np.uint64)
        for word_idx, bit in self._bit_positions(h):
            np.bitwise_or.at(self.words, word_idx, bit)
        self.count += int(h.size)
        return self

    def contains_hashed(self, hashes: np.ndarray) -> np.ndarray:
        h = np.atleast_1d(np.asarray(hashes, dtype=np.uint64))
        out = np.ones(h.shape, dtype=bool)
        for word_idx, bit in self._bit_positions(h):
            out &= (self.words[word_idx] & bit) != U64(0)
        return out

    def expected_fpr(self) -> float:
        frac_set = np.count_nonzero(
            np.unpackbits(self.words.view(np.uint8))
        ) / self.num_bits
        return float(frac_set ** self.num_hashes)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        self._check_mergeable(other, "num_bits", "num_hashes", "seed")
        self._writable()
        np.bitwise_or(self.words, other.words, out=self.words)
        self.count += other.count
        return self

    def _payload(self) -> bytes:
        head = struct.pack("<QIqq", self.num_bits, self.num_hashes, self.seed, self.count)
        return head + np.ascontiguousarray(self.words).tobytes()

    @classmethod
    def _from_payload(cls, payload: bytes) -> "BloomFilter":
        num_bits, k, seed, count = struct.unpack_from("<QIqq", payload)
        off = struct.calcsize("<QIqq")
        words = np.frombuffer(payload, dtype=np.uint64, offset=off, count=num_bits // 64).copy()
        return cls(num_bits=num_bits, num_hashes=k, seed=seed, words=words, count=count)
