"""KLL — mergeable quantile sketch with uniform rank-error guarantees.

Complements the t-digest (which is tail-accurate): KLL (Karnin, Lang,
Liberty 2016) gives uniform additive rank error ~ O(1/k) with O(k log n)
items of state. Items at compactor level ``l`` carry weight ``2^l``.

Deviation from the published algorithm: compaction uses a deterministic
alternating parity per level instead of a random coin, so runs are
reproducible (the engine forbids nondeterminism in result payloads —
SURVEY.md §7.4). The expected-error analysis still holds empirically;
property tests assert the rank-error bound with margin. Like t-digest,
merge is boundedly order-sensitive (rank estimates across merge orders
agree within the bound, not bit-identical).
"""

from __future__ import annotations

import struct

import numpy as np

from .base import Sketch


class KLL(Sketch):
    MAGIC = b"KLL1"

    def __init__(self, k: int = 200):
        if k < 8:
            raise ValueError("k must be >= 8")
        self.k = int(k)
        self.levels: list[list[float]] = [[]]
        self.parity: list[int] = [0]
        self.n = 0

    def _capacity(self, level: int) -> int:
        depth = len(self.levels) - 1 - level
        return max(2, int(np.ceil(self.k * (2.0 / 3.0) ** depth)))

    def _total_capacity(self) -> int:
        return sum(self._capacity(l) for l in range(len(self.levels)))

    def _size(self) -> int:
        return sum(len(lv) for lv in self.levels)

    # -- update --------------------------------------------------------
    def update(self, values) -> "KLL":
        v = np.asarray(values, dtype=np.float64).ravel()
        v = v[~np.isnan(v)]
        if v.size == 0:
            return self
        self.levels[0].extend(v.tolist())
        self.n += v.size
        self._maybe_compact()
        return self

    def _maybe_compact(self) -> None:
        while self._size() > self._total_capacity():
            for l in range(len(self.levels)):
                if len(self.levels[l]) > self._capacity(l):
                    self._compact_level(l)
                    break
            else:
                break

    def _compact_level(self, l: int) -> None:
        items = sorted(self.levels[l])
        keep_start = self.parity[l] & 1
        self.parity[l] ^= 1
        if len(items) % 2 == 0:
            promoted = items[keep_start::2]
            leftover: list[float] = []
        elif keep_start == 0:
            # even-parity pick on odd length: last item is unpaired — keep it
            promoted = items[0::2][:-1]
            leftover = [items[-1]]
        else:
            # odd-parity pick on odd length: first item is unpaired — keep it
            promoted = items[1::2]
            leftover = [items[0]]
        self.levels[l] = leftover
        if l + 1 == len(self.levels):
            self.levels.append([])
            self.parity.append(0)
        self.levels[l + 1].extend(promoted)

    # -- query ---------------------------------------------------------
    def _weighted_items(self) -> tuple[np.ndarray, np.ndarray]:
        vals, weights = [], []
        for l, lv in enumerate(self.levels):
            if lv:
                vals.append(np.asarray(lv))
                weights.append(np.full(len(lv), float(2 ** l)))
        if not vals:
            return np.empty(0), np.empty(0)
        v = np.concatenate(vals)
        w = np.concatenate(weights)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def quantile(self, q) -> np.ndarray | float:
        v, w = self._weighted_items()
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        if v.size == 0:
            out = np.full(qs.shape, np.nan)
            return out if np.ndim(q) else float(out[0])
        cum = np.cumsum(w)
        total = cum[-1]
        idx = np.searchsorted(cum, qs * total, side="left")
        out = v[np.clip(idx, 0, v.size - 1)]
        return out if np.ndim(q) else float(out[0])

    def rank(self, x) -> np.ndarray | float:
        """Approximate normalized rank (CDF) of x."""
        v, w = self._weighted_items()
        xs = np.atleast_1d(np.asarray(x, dtype=np.float64))
        if v.size == 0:
            out = np.full(xs.shape, np.nan)
            return out if np.ndim(x) else float(out[0])
        cum = np.concatenate(([0.0], np.cumsum(w)))
        idx = np.searchsorted(v, xs, side="right")
        out = cum[idx] / cum[-1]
        return out if np.ndim(x) else float(out[0])

    # -- merge / serialize --------------------------------------------
    def merge(self, other: "KLL") -> "KLL":
        self._check_mergeable(other, "k")
        while len(self.levels) < len(other.levels):
            self.levels.append([])
            self.parity.append(0)
        for l, lv in enumerate(other.levels):
            self.levels[l].extend(lv)
        self.n += other.n
        self._maybe_compact()
        return self

    def _payload(self) -> bytes:
        parts = [struct.pack("<IqI", self.k, self.n, len(self.levels))]
        for l, lv in enumerate(self.levels):
            arr = np.asarray(lv, dtype=np.float64)
            parts.append(struct.pack("<II", self.parity[l], arr.size))
            parts.append(arr.tobytes())
        return b"".join(parts)

    @classmethod
    def _from_payload(cls, payload: bytes) -> "KLL":
        k, n, nlev = struct.unpack_from("<IqI", payload)
        off = struct.calcsize("<IqI")
        out = cls(k=k)
        out.n = n
        out.levels, out.parity = [], []
        for _ in range(nlev):
            parity, sz = struct.unpack_from("<II", payload, off)
            off += 8
            arr = np.frombuffer(payload, dtype=np.float64, offset=off, count=sz)
            off += 8 * sz
            out.levels.append(arr.tolist())
            out.parity.append(parity)
        return out
