"""Space-saving top-k — mergeable heavy hitters.

Replaces the reference's exact itemset count-threshold top-k
(``src/EnvAbacRuleMiner.py:234-247`` keeps top ``itemset_limit`` itemsets
by count) and the incremental top-500 truncation
(``src/eval/EnvOverassignmentCalculator.py:191-196``).

Metwally et al. 2005 Space-Saving with weighted updates; merge per the
mergeable-summaries construction (Agarwal et al. 2012): when a key is
absent from one summary, that summary's minimum count is added as the
upper-bound contribution (stored counts remain overestimates:
``true ≤ count ≤ true + err``). Any key with true frequency
> N/capacity is guaranteed present.
"""

from __future__ import annotations

import struct

import numpy as np

from .base import Sketch


class SpaceSaving(Sketch):
    MAGIC = b"TOPK"

    def __init__(self, capacity: int = 4096):
        if capacity <= 0:
            raise ValueError("capacity must be positive")
        self.capacity = int(capacity)
        self.counters: dict[str | int, list[int]] = {}  # key -> [count, err]
        self.total = 0

    # -- update --------------------------------------------------------
    def update(self, keys, counts=None) -> "SpaceSaving":
        """Batch update via the mergeable-summaries construction: the
        batch's exact counts form an error-free summary that is merged in
        (one sort per batch) — equivalent bounds to per-item Space-Saving
        eviction but O(n log n) instead of O(n × capacity)."""
        keys = list(keys)
        if counts is None:
            counts = [1] * len(keys)
        else:
            counts = np.asarray(counts).tolist()
        batch: dict[str | int, list[int]] = {}
        add = 0
        for k, c in zip(keys, counts):
            if isinstance(k, (np.str_, np.integer)):
                k = k.item() if isinstance(k, np.integer) else str(k)
            if not isinstance(k, (str, int)) or isinstance(k, bool):
                raise TypeError(
                    f"SpaceSaving keys must be str or int (got {type(k).__name__}"
                    f" {k!r}); float keys would collide after int() truncation"
                    " in serialization")
            c = int(c)
            add += c
            ent = batch.get(k)
            if ent is not None:
                ent[0] += c
            else:
                batch[k] = [c, 0]
        self._merge_maps(batch, other_min=0)
        self.total += add
        return self

    def _min_count(self) -> int:
        if len(self.counters) < self.capacity:
            return 0
        return min(e[0] for e in self.counters.values())

    # -- query ---------------------------------------------------------
    def top(self, k: int | None = None) -> list[tuple[str | int, int, int]]:
        """[(key, count_overestimate, err)] sorted by count desc, key asc."""
        items = [(key, e[0], e[1]) for key, e in self.counters.items()]
        items.sort(key=lambda t: (-t[1], str(t[0])))
        return items if k is None else items[:k]

    def estimate_one(self, key) -> int:
        ent = self.counters.get(key)
        return ent[0] if ent is not None else self._min_count()

    # -- merge ---------------------------------------------------------
    def _merge_maps(self, other_map: dict, other_min: int) -> None:
        """Mergeable-summaries combine (Agarwal et al. 2012): keys absent
        from one side get that side's min count added to both count and
        error (counts stay overestimates), then trim to capacity."""
        min_self = self._min_count()
        merged: dict[str | int, list[int]] = {}
        for k, (c, e) in self.counters.items():
            oc = other_map.get(k)
            if oc is not None:
                merged[k] = [c + oc[0], e + oc[1]]
            else:
                merged[k] = [c + other_min, e + other_min]
        for k, (c, e) in other_map.items():
            if k not in merged:
                merged[k] = [c + min_self, e + min_self]
        if len(merged) > self.capacity:
            keep = sorted(merged.items(), key=lambda kv: (-kv[1][0], str(kv[0])))
            merged = dict(keep[: self.capacity])
        self.counters = merged

    def merge(self, other: "SpaceSaving") -> "SpaceSaving":
        self._check_mergeable(other, "capacity")
        self._merge_maps(other.counters, other._min_count())
        self.total += other.total
        return self

    # -- serialize -----------------------------------------------------
    def _payload(self) -> bytes:
        parts = [struct.pack("<IIq", self.capacity, len(self.counters), self.total)]
        for k, (c, e) in self.counters.items():
            if isinstance(k, str):
                kb = k.encode("utf-8")
                parts.append(struct.pack("<BI", 0, len(kb)) + kb)
            else:
                parts.append(struct.pack("<Bq", 1, int(k)))
            parts.append(struct.pack("<qq", c, e))
        return b"".join(parts)

    @classmethod
    def _from_payload(cls, payload: bytes) -> "SpaceSaving":
        cap, n, total = struct.unpack_from("<IIq", payload)
        off = struct.calcsize("<IIq")
        out = cls(capacity=cap)
        out.total = total
        for _ in range(n):
            (tag,) = struct.unpack_from("<B", payload, off)
            off += 1
            if tag == 0:
                (ln,) = struct.unpack_from("<I", payload, off)
                off += 4
                key: str | int = payload[off:off + ln].decode("utf-8")
                off += ln
            else:
                (key,) = struct.unpack_from("<q", payload, off)
                off += 8
            c, e = struct.unpack_from("<qq", payload, off)
            off += 16
            out.counters[key] = [c, e]
        return out
