"""Deterministic hashing shared by the merge shuffle, dedup and fingerprint
pipelines.

Everything here is FNV-1a64 (offset basis 0xcbf29ce484222325, prime
0x100000001b3) — public, trivially portable, stable across processes and
parallelism levels (unlike ``hash()``). The C module (functions/_ctok.c)
accelerates the array form by hashing straight out of Arrow string buffers,
so no per-term Python objects are created; the pure-Python forms compute the
identical function (parity-tested in tests/test_tokenizer.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

FNV_OFF = 0xcbf29ce484222325
FNV_PRIME = 0x100000001b3
_U64 = 0xFFFFFFFFFFFFFFFF


def fnv1a_bytes(data: bytes) -> int:
    h = FNV_OFF
    for b in data:
        h = ((h ^ b) * FNV_PRIME) & _U64
    return h


def fnv1a64_strings(arr: pa.Array) -> np.ndarray:
    """FNV-1a64 of every string in a pyarrow string / large_string array
    (no nulls), returned as uint64. C-accelerated via the Arrow buffer
    layout when the extension is available."""
    from .ctok import load

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    ct = load()
    if ct is not None and len(arr):
        wide = 1 if pa.types.is_large_string(arr.type) else 0
        dt = np.int64 if wide else np.int32
        offs = np.frombuffer(arr.buffers()[1], dt)[
            arr.offset: arr.offset + len(arr) + 1]
        data = arr.buffers()[2]
        return np.frombuffer(
            ct.fnv1a64_offsets(np.ascontiguousarray(offs).data,
                               data, wide), np.uint64)
    return np.array([fnv1a_bytes(s.encode("utf-8"))
                     for s in arr.to_pylist()], dtype=np.uint64)


FNV128_OFF = 0x6c62272e07bb014262b821756295c58d
FNV128_PRIME = 0x0000000001000000000000000000013B
_U128 = (1 << 128) - 1


def fnv1a128_bytes(data: bytes) -> int:
    h = FNV128_OFF
    for b in data:
        h = ((h ^ b) * FNV128_PRIME) & _U128
    return h


def fnv1a128_strings(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """FNV-1a128 of every string in a pyarrow string / large_string array
    (no nulls), returned as (lo64, hi64) uint64 arrays — a groupby-friendly
    split of the 128-bit content key (64 bits birthday-bound at ~4e9 keys;
    128 bits stay collision-safe at trillion-doc scale). C-accelerated from
    the Arrow buffers when available; identical pure-Python fallback."""
    from .ctok import load

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    ct = load()
    if ct is not None and hasattr(ct, "fnv1a128_offsets") and len(arr):
        wide = 1 if pa.types.is_large_string(arr.type) else 0
        dt = np.int64 if wide else np.int32
        offs = np.frombuffer(arr.buffers()[1], dt)[
            arr.offset: arr.offset + len(arr) + 1]
        both = np.frombuffer(
            ct.fnv1a128_offsets(np.ascontiguousarray(offs).data,
                                arr.buffers()[2], wide),
            np.uint64).reshape(-1, 2)
        return np.ascontiguousarray(both[:, 0]), \
            np.ascontiguousarray(both[:, 1])
    vals = [fnv1a128_bytes(s.encode("utf-8")) for s in arr.to_pylist()]
    lo = np.array([v & 0xFFFFFFFFFFFFFFFF for v in vals], np.uint64)
    hi = np.array([v >> 64 for v in vals], np.uint64)
    return lo, hi
