"""Stable, vectorized 64-bit hashing.

Every sketch in this engine keys on ``uint64`` hashes produced here, so
estimates are deterministic across processes, partitions and merge
orders (a requirement the reference never had — it used giant in-RAM
Python sets, ``src/eval/EnvPolicyEvaluator.py:192-199``; we need content
hashes that survive a shuffle).

Primitives:
- ``splitmix64``: the public-domain SplitMix64 finalizer (Vigna), fully
  vectorized over ``uint64`` ndarrays. Used to derive independent hash
  rows/seeds for CMS/Bloom from one base hash.
- ``hash_strings`` / ``hash_any``: content hash of a string/object array
  via ``pandas.util.hash_array`` (SipHash-1-3 with a fixed key —
  deterministic across processes), then SplitMix64-mixed with a seed.
- ``combine_hashes``: order-sensitive fold of several uint64 columns
  into one (for composite keys / itemset identity over sorted items).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

U64 = np.uint64

_SM_GAMMA = U64(0x9E3779B97F4A7C15)
_SM_M1 = U64(0xBF58476D1CE4E5B9)
_SM_M2 = U64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray | int) -> np.ndarray:
    """Vectorized SplitMix64 finalizer. uint64 in → uint64 out."""
    with np.errstate(over="ignore"):  # uint64 wrap-around is the algorithm
        z = np.asarray(x, dtype=np.uint64) + _SM_GAMMA
        z = (z ^ (z >> U64(30))) * _SM_M1
        z = (z ^ (z >> U64(27))) * _SM_M2
        return z ^ (z >> U64(31))


def mix_with_seed(h: np.ndarray, seed: int) -> np.ndarray:
    """Derive an independent hash family member: mix(h ^ splitmix(seed))."""
    s = splitmix64(np.uint64(seed & 0xFFFFFFFFFFFFFFFF))
    return splitmix64(np.asarray(h, dtype=np.uint64) ^ s)


def hash_strings(values, seed: int = 0) -> np.ndarray:
    """Stable uint64 content hash of a string-like array.

    Accepts a pandas Series, numpy object array, list, or pyarrow
    Array/ChunkedArray. Nulls hash like the empty-marker string
    ``"\\x00NULL"`` (distinct from ``""``).
    """
    arr = _to_object_ndarray(values)
    if arr.dtype != object:
        arr = arr.astype(object)
    # replace None/NaN with a distinct marker so null != ""
    mask = pd.isna(arr)
    if mask.any():
        arr = arr.copy()
        arr[mask] = "\x00NULL"
    h = pd.util.hash_array(arr, categorize=False)
    if seed:
        return mix_with_seed(h, seed)
    return h.astype(np.uint64, copy=False)


def hash_ints(values, seed: int = 0) -> np.ndarray:
    """Stable uint64 hash of an integer array (splitmix of the value)."""
    arr = np.asarray(_to_object_ndarray(values))
    h = splitmix64(arr.astype(np.uint64, copy=False))
    if seed:
        return mix_with_seed(h, seed)
    return h


def null_marker_hash(seed: int = 0) -> np.uint64:
    """The hash of a NULL value — identical across the int and string
    paths so a value's hash never depends on its block's null pattern."""
    return hash_strings(np.array([None], dtype=object), seed)[0]


def hash_any(values, seed: int = 0) -> np.ndarray:
    """Dispatch: integer dtypes → hash_ints, everything else →
    hash_strings. BLOCK-INVARIANT under nulls: an Arrow integer column
    containing nulls would otherwise convert to float64 (corrupting
    hashes > 2^53 and flipping the dispatch); nulls are masked out,
    non-null values hash on the integer path, and null slots get the
    shared null-marker hash."""
    try:
        import pyarrow as pa

        if isinstance(values, pa.ChunkedArray):
            values = values.combine_chunks()
        if isinstance(values, pa.Array) and pa.types.is_integer(values.type):
            if values.null_count:
                mask = values.is_null().to_numpy(zero_copy_only=False)
                filled = values.fill_null(0).to_numpy(zero_copy_only=False)
                out = hash_ints(filled, seed)
                out[mask] = null_marker_hash(seed)
                return out
            return hash_ints(values.to_numpy(zero_copy_only=False), seed)
    except ImportError:  # pragma: no cover
        pass
    arr = _to_object_ndarray(values)
    if isinstance(arr, np.ndarray) and arr.dtype.kind in "iu":
        return hash_ints(arr, seed)
    return hash_strings(arr, seed)


def hash_string_scalar(s: str, seed: int = 0) -> int:
    """Scalar convenience wrapper (same function as hash_strings)."""
    return int(hash_strings(np.array([s], dtype=object), seed)[0])


def combine_hashes(*columns: np.ndarray) -> np.ndarray:
    """Order-sensitive fold of several uint64 arrays into one.

    ``h = mix(h * P ^ c)`` per column — used for composite keys such as
    ``(role, tool)`` items and for itemset identity over item hashes
    that the caller has already sorted (sorted fold ⇒ set identity).
    """
    P = U64(0x100000001B3)
    out = np.full_like(np.asarray(columns[0], dtype=np.uint64), U64(0xcbf29ce484222325))
    with np.errstate(over="ignore"):
        for c in columns:
            out = splitmix64(out * P ^ np.asarray(c, dtype=np.uint64))
    return out


def _to_object_ndarray(values):
    """Best-effort conversion of Series/Arrow/list → ndarray (no copy when possible)."""
    if isinstance(values, pd.Series):
        return values.to_numpy()
    if isinstance(values, np.ndarray):
        return values
    try:  # pyarrow Array / ChunkedArray
        import pyarrow as pa

        if isinstance(values, pa.ChunkedArray):
            values = values.combine_chunks()
        if isinstance(values, pa.Array):
            return values.to_numpy(zero_copy_only=False)
    except ImportError:  # pragma: no cover
        pass
    return np.asarray(values)
