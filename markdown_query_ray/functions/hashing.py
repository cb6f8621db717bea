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
