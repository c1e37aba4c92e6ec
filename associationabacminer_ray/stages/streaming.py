"""Streaming-shaped processing with raw Ray actors (SURVEY §2.9 / the
"drop to raw Ray actors only where the Dataset API genuinely can't
express the semantics" case).

``map_batches`` gives no per-key actor affinity and no cross-batch
ordering guarantee, so *incremental* keyed state (open sessions, running
counters fed in ts order) can't live in a map stage. This module is the
explicit escape hatch: N ``@ray.remote`` bucket actors (key-hash
affinity), fed ts-ordered batches streamed off a Dataset with
``iter_batches`` — the log is consumed once, state stays distributed,
and the driver only routes references.

The batch pipelines (``analytics.q_sessions``) recompute windows from
sorted groups; this runs the same sessionization *incrementally* — feed
today's log, ask for state, feed tomorrow's — which is what a real
streaming deployment needs. Equivalence with the batch recompute is
tested.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray

from ..functions.hashing import hash_any


@ray.remote
class SessionBucketActor:
    """Holds open-session state for every key hashed to this bucket.
    Batches MUST arrive in non-decreasing ts order per key (the feeder
    sorts globally, which suffices)."""

    def __init__(self, gap_us: int):
        self.gap_us = gap_us
        # key -> [n_sessions, n_events, max_session_events, cur_len, last_ts_us]
        self.state: dict = {}

    def ingest(self, keys: np.ndarray, ts_us: np.ndarray) -> int:
        st = self.state
        gap = self.gap_us
        for k, t in zip(keys.tolist(), ts_us.tolist()):
            ent = st.get(k)
            if ent is None:
                st[k] = [1, 1, 1, 1, t]
                continue
            if t - ent[4] > gap:
                ent[0] += 1
                ent[3] = 1
            else:
                ent[3] += 1
            ent[1] += 1
            if ent[3] > ent[2]:
                ent[2] = ent[3]
            ent[4] = t
        return len(keys)

    def snapshot(self) -> pd.DataFrame:
        rows = [(k, v[0], v[1], v[2]) for k, v in self.state.items()]
        return pd.DataFrame(rows, columns=["user_id", "n_sessions", "n_events",
                                           "max_session_events"])


class StreamingSessionizer:
    """Driver-side router: ts-sorted Dataset batches → bucket actors."""

    def __init__(self, num_buckets: int = 4, gap_minutes: int = 30):
        self.num_buckets = num_buckets
        self.actors = [SessionBucketActor.remote(gap_minutes * 60 * 1_000_000)
                       for _ in range(num_buckets)]

    def feed(self, ds, key_col: str = "user_id", ts_col: str = "ts") -> int:
        """Consume a Dataset (sorted globally by ts) once, routing rows to
        bucket actors; returns rows ingested. Sends per batch are
        pipelined (fire all buckets, wait per batch boundary to preserve
        per-key order across batches)."""
        total = 0
        for batch in ds.sort(ts_col).iter_batches(batch_size=32768,
                                                  batch_format="pandas"):
            keys = batch[key_col].to_numpy()
            # explicit unit: ns-typed frames would otherwise make gap_us
            # compare microseconds against nanoseconds (1000x over-split)
            ts_us = (pd.to_datetime(batch[ts_col]).to_numpy()
                     .astype("datetime64[us]").astype(np.int64))
            buckets = (hash_any(keys) % np.uint64(self.num_buckets)).astype(int)
            pending = []
            for b in range(self.num_buckets):
                m = buckets == b
                if m.any():
                    pending.append(self.actors[b].ingest.remote(keys[m], ts_us[m]))
            total += sum(ray.get(pending))
        return total

    def snapshot(self) -> pd.DataFrame:
        frames = ray.get([a.snapshot.remote() for a in self.actors])
        out = pd.concat(frames, ignore_index=True)
        if len(out):
            out = out.sort_values("user_id").reset_index(drop=True)
        return out

    def shutdown(self) -> None:
        for a in self.actors:
            ray.kill(a)
        self.actors = []
