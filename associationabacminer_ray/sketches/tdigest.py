"""t-digest — mergeable quantile sketch (Dunning's merging digest, k1 scale).

The reference only ever keeps *means* of its score distributions
(``src/job/ScoreAggregator.py:45-47``); the north rule upgrades
support/confidence-score distributions to full quantile tracking. State
is O(delta) centroids; accuracy is best near the tails (relative error
~ q(1-q)·c/delta for the k1 scale function).

Merge = concatenate centroids + one deterministic compression pass.
Merging is boundedly order-sensitive (quantile estimates across merge
orders agree within the error bound, not bit-identical) — inherent to
compacting quantile summaries; property-tested with a tolerance.
"""

from __future__ import annotations

import struct

import numpy as np

from .base import Sketch

_2PI = 2.0 * np.pi


class TDigest(Sketch):
    MAGIC = b"TDG1"

    def __init__(self, delta: float = 200.0):
        if delta < 10:
            raise ValueError("delta too small")
        self.delta = float(delta)
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self._buf_vals: list[np.ndarray] = []
        self._buf_weights: list[np.ndarray] = []
        self._buf_size = 0
        self.vmin = np.inf
        self.vmax = -np.inf

    # -- scale function ------------------------------------------------
    def _k(self, q: np.ndarray | float) -> np.ndarray | float:
        return self.delta / _2PI * np.arcsin(2.0 * np.asarray(q) - 1.0)

    def _q(self, k: np.ndarray | float) -> np.ndarray | float:
        return (np.sin(np.minimum(k, self.delta / 4.0) * _2PI / self.delta) + 1.0) / 2.0

    # -- update --------------------------------------------------------
    def update(self, values, weights=None) -> "TDigest":
        v = np.asarray(values, dtype=np.float64).ravel()
        mask = ~np.isnan(v)
        v = v[mask]
        if v.size == 0:
            return self
        w = (np.ones_like(v) if weights is None
             else np.asarray(weights, dtype=np.float64).ravel()[mask])
        self.vmin = min(self.vmin, float(v.min()))
        self.vmax = max(self.vmax, float(v.max()))
        self._buf_vals.append(v)
        self._buf_weights.append(w)
        self._buf_size += v.size
        if self._buf_size > 16 * int(self.delta):
            self._compress()
        return self

    def _compress(self) -> None:
        if self._buf_size == 0 and self.means.size <= int(self.delta):
            return
        means = np.concatenate([self.means] + self._buf_vals) if self._buf_vals else self.means
        weights = np.concatenate([self.weights] + self._buf_weights) if self._buf_weights else self.weights
        self._buf_vals, self._buf_weights, self._buf_size = [], [], 0
        if means.size == 0:
            return
        order = np.lexsort((weights, means))  # stable, deterministic
        means, weights = means[order], weights[order]
        total = weights.sum()

        out_means: list[float] = []
        out_weights: list[float] = []
        cur_m, cur_w = means[0], weights[0]
        w_emitted = 0.0
        q_limit = total * self._q(self._k(0.0) + 1.0)
        for m, w in zip(means[1:], weights[1:]):
            if w_emitted + cur_w + w <= q_limit:
                cur_m += (m - cur_m) * w / (cur_w + w)
                cur_w += w
            else:
                out_means.append(cur_m)
                out_weights.append(cur_w)
                w_emitted += cur_w
                q_limit = total * self._q(self._k(w_emitted / total) + 1.0)
                cur_m, cur_w = m, w
        out_means.append(cur_m)
        out_weights.append(cur_w)
        self.means = np.asarray(out_means)
        self.weights = np.asarray(out_weights)

    # -- query ---------------------------------------------------------
    @property
    def total_weight(self) -> float:
        self._compress()
        return float(self.weights.sum())

    def quantile(self, q) -> np.ndarray | float:
        self._compress()
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        if self.means.size == 0:
            out = np.full(qs.shape, np.nan)
            return out if np.ndim(q) else float(out[0])
        total = self.weights.sum()
        # centroid midpoints in cumulative-weight space
        cum = np.cumsum(self.weights) - self.weights / 2.0
        xp = np.concatenate(([0.0], cum, [total]))
        fp = np.concatenate(([self.vmin], self.means, [self.vmax]))
        out = np.interp(qs * total, xp, fp)
        return out if np.ndim(q) else float(out[0])

    def cdf(self, x) -> np.ndarray | float:
        self._compress()
        xs = np.atleast_1d(np.asarray(x, dtype=np.float64))
        if self.means.size == 0:
            out = np.full(xs.shape, np.nan)
            return out if np.ndim(x) else float(out[0])
        total = self.weights.sum()
        cum = np.cumsum(self.weights) - self.weights / 2.0
        xp = np.concatenate(([self.vmin], self.means, [self.vmax]))
        fp = np.concatenate(([0.0], cum, [total]))
        out = np.interp(xs, xp, fp) / total
        return out if np.ndim(x) else float(out[0])

    # -- merge / serialize --------------------------------------------
    def merge(self, other: "TDigest") -> "TDigest":
        self._check_mergeable(other, "delta")
        # absorb other's centroids AND raw buffers without mutating it
        # (compressing the operand would silently degrade ITS later
        # accuracy — unlike the other sketches, merge here is not free)
        if other.means.size:
            self._buf_vals.append(other.means.copy())
            self._buf_weights.append(other.weights.copy())
            self._buf_size += other.means.size
        for v, w in zip(other._buf_vals, other._buf_weights):
            self._buf_vals.append(v.copy())
            self._buf_weights.append(w.copy())
            self._buf_size += v.size
        self.vmin = min(self.vmin, other.vmin)
        self.vmax = max(self.vmax, other.vmax)
        self._compress()
        return self

    def _payload(self) -> bytes:
        self._compress()
        head = struct.pack("<dddI", self.delta, self.vmin, self.vmax, self.means.size)
        return head + self.means.tobytes() + self.weights.tobytes()

    @classmethod
    def _from_payload(cls, payload: bytes) -> "TDigest":
        delta, vmin, vmax, n = struct.unpack_from("<dddI", payload)
        off = struct.calcsize("<dddI")
        out = cls(delta=delta)
        out.vmin, out.vmax = vmin, vmax
        out.means = np.frombuffer(payload, dtype=np.float64, offset=off, count=n).copy()
        off += 8 * n
        out.weights = np.frombuffer(payload, dtype=np.float64, offset=off, count=n).copy()
        return out
