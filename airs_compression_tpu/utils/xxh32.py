"""XXH32 checksum, bit-exact with the reference's vendored xxhash 0.8.3.

The AIRSPACE format optionally appends ``XXH32(samples as big-endian u16
bytes, seed=419764627)`` after the compressed payload (reference
lib/common/header.c:137-163, header_private.h:46).  This module provides:

* :func:`xxh32` — a pure-Python XXH32 (public algorithm, from the xxHash
  specification), used as a dependency-free fallback and as a cross-check.
* a fast path via the ``xxhash`` PyPI module when importable.
* :func:`cmp_checksum` — checksum of a u16 sample array per the AIRSPACE
  convention (big-endian sample bytes).
"""

from __future__ import annotations

import numpy as np

try:  # fast path
    import xxhash as _xxhash_mod
except Exception:  # pragma: no cover - environment without xxhash
    _xxhash_mod = None

__all__ = ["xxh32", "cmp_checksum", "cmp_checksum_chunked", "XXH32State",
           "CHECKSUM_SEED"]

CHECKSUM_SEED = 419764627

_M = 0xFFFFFFFF
_P1 = 2654435761
_P2 = 2246822519
_P3 = 3266489917
_P4 = 668265263
_P5 = 374761393


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M


def _xxh32_py(data: bytes, seed: int) -> int:
    n = len(data)
    i = 0
    if n >= 16:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        limit = n - 16
        w = lambda j: int.from_bytes(data[j : j + 4], "little")
        while i <= limit:
            v1 = (_rotl((v1 + w(i) * _P2) & _M, 13) * _P1) & _M
            v2 = (_rotl((v2 + w(i + 4) * _P2) & _M, 13) * _P1) & _M
            v3 = (_rotl((v3 + w(i + 8) * _P2) & _M, 13) * _P1) & _M
            v4 = (_rotl((v4 + w(i + 12) * _P2) & _M, 13) * _P1) & _M
            i += 16
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 4 <= n:
        h = (h + int.from_bytes(data[i : i + 4], "little") * _P3) & _M
        h = (_rotl(h, 17) * _P4) & _M
        i += 4
    while i < n:
        h = (h + data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 15
    h = (h * _P2) & _M
    h ^= h >> 13
    h = (h * _P3) & _M
    h ^= h >> 16
    return h


def xxh32(data: bytes, seed: int = 0) -> int:
    """XXH32 of ``data`` with ``seed``."""
    if _xxhash_mod is not None:
        return _xxhash_mod.xxh32_intdigest(data, seed=seed)
    return _xxh32_py(data, seed)


class XXH32State:
    """Streaming XXH32 (reference xxhash 0.8.3 streaming API semantics).

    Lets the AIRSPACE checksum be accumulated shard-by-shard: in a
    multi-host long-stream compression each process updates the 16-byte
    lane state with its local shard's bytes and forwards the state to the
    next process — no host ever materializes the full stream.  Digests are
    identical to the one-shot :func:`xxh32`.
    """

    __slots__ = ("_impl", "_seed", "_acc", "_buf", "_total")

    def __init__(self, seed: int = 0):
        if _xxhash_mod is not None:
            self._impl = _xxhash_mod.xxh32(seed=seed)
            return
        self._impl = None
        self._seed = seed & _M
        self._acc = [(seed + _P1 + _P2) & _M, (seed + _P2) & _M,
                     seed & _M, (seed - _P1) & _M]
        self._buf = b""
        self._total = 0

    def update(self, data: bytes) -> "XXH32State":
        if self._impl is not None:
            self._impl.update(data)
            return self
        self._total += len(data)
        data = self._buf + bytes(data)
        acc = self._acc
        i, limit = 0, len(data) - 16
        while i <= limit:
            for lane in range(4):
                o = i + 4 * lane
                acc[lane] = (_rotl(
                    (acc[lane] + int.from_bytes(data[o : o + 4], "little")
                     * _P2) & _M, 13) * _P1) & _M
            i += 16
        self._buf = data[i:]
        return self

    def intdigest(self) -> int:
        if self._impl is not None:
            return self._impl.intdigest()
        if self._total >= 16:
            v1, v2, v3, v4 = self._acc
            h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12)
                 + _rotl(v4, 18)) & _M
        else:
            h = (self._seed + _P5) & _M
        h = (h + self._total) & _M
        data, i, n = self._buf, 0, len(self._buf)
        while i + 4 <= n:
            h = (h + int.from_bytes(data[i : i + 4], "little") * _P3) & _M
            h = (_rotl(h, 17) * _P4) & _M
            i += 4
        while i < n:
            h = (h + data[i] * _P5) & _M
            h = (_rotl(h, 11) * _P1) & _M
            i += 1
        h ^= h >> 15
        h = (h * _P2) & _M
        h ^= h >> 13
        h = (h * _P3) & _M
        h ^= h >> 16
        return h


def cmp_checksum_chunked(chunks_u16) -> int:
    """AIRSPACE sample checksum accumulated over per-shard sample chunks.

    Equivalent to ``cmp_checksum(concatenate(chunks))`` without ever
    concatenating — the streaming state (16 bytes) is all that crosses
    shard/host boundaries.
    """
    st = XXH32State(CHECKSUM_SEED)
    for chunk in chunks_u16:
        be = np.ascontiguousarray(chunk, dtype=np.uint16).astype(">u2")
        st.update(be.tobytes())
    return st.intdigest()


def cmp_checksum(samples_u16: np.ndarray) -> int:
    """AIRSPACE sample checksum: XXH32 over big-endian u16 bytes.

    Mirrors reference cmp_checksum (lib/common/header.c:137-163): every
    sample contributes its two bytes in big-endian order, seed 419764627.
    """
    be = np.ascontiguousarray(samples_u16, dtype=np.uint16).astype(">u2")
    return xxh32(be.tobytes(), CHECKSUM_SEED)
