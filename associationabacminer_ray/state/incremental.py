"""Incremental per-day sketch store — window queries without recompute.

The reference recomputes every sliding window from scratch
(SURVEY.md §2.9: "each window recomputes"; the dynamic-params cache is
its only cross-window reuse). Sketch mergeability buys the delta
architecture the reference lacks: compute each DAY's partial sketches
once (checkpointed with lineage like any partition), then ANY window =
merge of its days' blobs — O(days) blob merges instead of re-reading
the corpus. A 30-day window stepped by 1 day costs one new day per
step.

Transaction unit: ``(conv_id, day)`` — a conversation spanning a day
boundary contributes one transaction per day it touches (this is what
makes daily partials composable; document it when comparing against
whole-window conversation semantics). Under that unit, CMS/HLL merges
are lossless, so windowed estimates from dailies are bit-identical to a
direct window pass with the same ``conv_day`` key (tested). Top-k over
merged dailies is approximate (capacity truncation per day) — kept,
with error bounds carried.
"""

from __future__ import annotations

import time
from datetime import datetime, timedelta

import numpy as np
import pandas as pd

from ..functions.hashing import hash_strings
from ..sketches import Sketch
from .checkpoint import completed_partitions, config_hash, write_partition


def _day_id(day: datetime) -> int:
    # calendar-date ordinal: timezone/DST-proof (epoch//86400 collides
    # two calendar days on DST spring-forward and varies by host TZ)
    return day.toordinal()


def add_conv_day(batch: pd.DataFrame) -> pd.DataFrame:
    """Derive the store's transaction key: conv_id @ calendar day."""
    day = pd.to_datetime(batch["ts"]).dt.strftime("%Y-%m-%d")
    return batch.assign(conv_day=batch["conv_id"] + "@" + day)


class DailySketchStore:
    """Per-day itemset sketches over a transcripts parquet source."""

    def __init__(self, store_dir: str, cms_width: int = 1 << 13,
                 cms_depth: int = 4, topk_capacity: int = 4096, hll_p: int = 14,
                 max_k: int = 2, max_transaction_items: int | None = 64,
                 itemset_hash: str = "sip", conv_hash: str = "sip"):
        self.store_dir = store_dir
        self.params = {
            "cms_width": cms_width, "cms_depth": cms_depth,
            "topk_capacity": topk_capacity, "hll_p": hll_p, "max_k": max_k,
            "max_tx": max_transaction_items, "kind": "daily_itemset_sketches",
            # part of the config hash: flipping either key-hash family
            # must invalidate (not silently reuse) existing day
            # checkpoints
            "itemset_hash": itemset_hash,
            "conv_hash": conv_hash,
        }
        self.cfg = config_hash(self.params)

    def _build_day(self, transcripts_path, day: datetime) -> dict[str, Sketch]:
        from ..functions.windows import WindowSpec, read_window
        from ..pipelines.itemsets import sketched_itemset_supports

        spec = WindowSpec(day, day + timedelta(days=1), day, day)
        ds = read_window(transcripts_path, spec, "obs",
                         columns=["conv_id", "role", "tool", "ts"])
        ds = ds.map_batches(add_conv_day, batch_format="pandas")
        res = sketched_itemset_supports(
            ds, conv_col="conv_day", max_k=self.params["max_k"],
            max_transaction_items=self.params["max_tx"],
            cms_width=self.params["cms_width"], cms_depth=self.params["cms_depth"],
            topk_capacity=self.params["topk_capacity"], hll_p=self.params["hll_p"],
            num_buckets=16, itemset_hash=self.params["itemset_hash"],
            conv_hash=self.params["conv_hash"],
        )
        return {"cms": res["cms"], "topk": res["topk"], "hll": res["hll"]}

    def ensure_days(self, transcripts_path, start: datetime, end: datetime) -> int:
        """Compute-and-checkpoint any missing day partials in [start, end);
        returns how many days were (re)built."""
        done = completed_partitions(self.store_dir, self.cfg)
        built = 0
        day = start
        while day < end:
            pid = _day_id(day)
            if pid not in done:
                t0 = time.perf_counter()
                sketches = self._build_day(transcripts_path, day)
                write_partition(self.store_dir, pid, sketches,
                                [str(transcripts_path)], 0, self.cfg,
                                wall_s=time.perf_counter() - t0)
                built += 1
            day += timedelta(days=1)
        return built

    def window_sketches(self, start: datetime, end: datetime) -> dict[str, Sketch]:
        """Merge the daily blobs covering [start, end)."""
        import pyarrow.parquet as pq

        done = completed_partitions(self.store_dir, self.cfg)
        merged: dict[str, Sketch] = {}
        day = start
        while day < end:
            pid = _day_id(day)
            if pid not in done:
                raise KeyError(f"day {day:%Y-%m-%d} not built (call ensure_days)")
            tbl = pq.read_table(done[pid], columns=["name", "blob"]).to_pandas()
            for name, blob in zip(tbl["name"], tbl["blob"]):
                sk = Sketch.from_bytes(bytes(blob))
                key = {"itemset_cms": "cms", "itemset_topk": "topk",
                       "conv_hll": "hll"}.get(name, name)
                if key in merged:
                    merged[key].merge(sk)
                else:
                    merged[key] = sk
            day += timedelta(days=1)
        return merged

    def estimate_support(self, window_sketches: dict[str, Sketch],
                         itemset: str) -> int:
        h = self.hash_itemsets(np.array([itemset], dtype=object))
        return int(window_sketches["cms"].estimate_hashed(h)[0])

    def hash_itemsets(self, values) -> np.ndarray:
        """The store's itemset-key hash — reads MUST use the same
        family the day builds used (it is part of the config hash)."""
        from ..pipelines.itemsets import _itemset_hash_fn

        return _itemset_hash_fn(self.params["itemset_hash"])(values)
