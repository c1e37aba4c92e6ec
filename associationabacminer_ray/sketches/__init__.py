"""Mergeable sketch kernel (pure NumPy, no Ray dependency).

All sketches serialize to fixed-layout bytes (``to_bytes``/``from_bytes``)
so state lives in Arrow ``binary()`` columns, survives groupby/aggregate
shuffles, and checkpoints to parquet.
"""

from .base import Sketch, sketch_from_bytes
from .bloom import BloomFilter
from .cms import CountMinSketch
from .countsketch import CountSketch
from .ddsketch import DDSketch
from .hll import HyperLogLog
from .kll import KLL
from .tdigest import TDigest
from .theta import ThetaKMV
from .topk import SpaceSaving

__all__ = [
    "Sketch",
    "sketch_from_bytes",
    "BloomFilter",
    "CountMinSketch",
    "CountSketch",
    "DDSketch",
    "HyperLogLog",
    "KLL",
    "SpaceSaving",
    "TDigest",
    "ThetaKMV",
]
