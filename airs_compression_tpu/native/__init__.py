"""Native host runtime: lazy-built C++ core with pure-Python fallback.

Builds airs_host.cpp with the system compiler on first use (cached as a
shared library next to the source); exposes the fast scalar pack/decode
and XXH32 entry points through ctypes.  Every function has a pure-Python
fallback in engine/host.py and utils/xxh32.py, so the package works even
without a toolchain — the native path is the CLI/host performance tier.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import threading

import numpy as np

__all__ = ["get_lib", "native_available", "encode_residuals",
           "decode_mapped", "checksum_u16", "scatter_rows",
           "scatter_rows_at", "gather_rows", "stage_parse",
           "stage_parse_at"]

_DIR = pathlib.Path(__file__).resolve().parent
_SRC = _DIR / "airs_host.cpp"
_LIB_PATH = _DIR / "build" / "libairs_host.so"

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> "pathlib.Path | None":
    _LIB_PATH.parent.mkdir(exist_ok=True)
    if (_LIB_PATH.exists()
            and _LIB_PATH.stat().st_mtime >= _SRC.stat().st_mtime):
        return _LIB_PATH
    for cc in ("g++", "c++", "clang++"):
        try:
            subprocess.run(
                [cc, "-O3", "-fPIC", "-shared", "-std=c++17",
                 "-o", str(_LIB_PATH), str(_SRC)],
                check=True, capture_output=True, timeout=120)
            return _LIB_PATH
        except (OSError, subprocess.SubprocessError):
            continue
    return None


def get_lib():
    """The loaded native library, or None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("AIRS_NO_NATIVE"):
            return None
        path = _build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(str(path))
        except OSError:
            return None
        lib.airs_xxh32.restype = ctypes.c_uint32
        lib.airs_xxh32.argtypes = [ctypes.c_void_p, ctypes.c_uint64,
                                   ctypes.c_uint32]
        lib.airs_checksum_u16.restype = ctypes.c_uint32
        lib.airs_checksum_u16.argtypes = [ctypes.c_void_p, ctypes.c_uint64,
                                          ctypes.c_uint32]
        lib.airs_encode_residuals.restype = ctypes.c_uint64
        lib.airs_encode_residuals.argtypes = [
            ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint32,
            ctypes.c_uint32, ctypes.c_uint32, ctypes.c_void_p,
            ctypes.c_uint64]
        lib.airs_decode_mapped.restype = ctypes.c_uint64
        lib.airs_decode_mapped.argtypes = [
            ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint64,
            ctypes.c_uint64, ctypes.c_uint32, ctypes.c_uint32,
            ctypes.c_uint32, ctypes.c_void_p]
        lib.airs_scatter_rows.restype = None
        lib.airs_scatter_rows.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_void_p]
        lib.airs_scatter_rows_at.restype = None
        lib.airs_scatter_rows_at.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p]
        lib.airs_gather_rows.restype = ctypes.c_int64
        lib.airs_gather_rows.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_void_p]
        lib.airs_stage_parse.restype = ctypes.c_int32
        lib.airs_stage_parse.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64] + [ctypes.c_void_p] * 10
        lib.airs_stage_parse_at.restype = ctypes.c_int32
        lib.airs_stage_parse_at.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64] + [ctypes.c_void_p] * 10
        _lib = lib
        return _lib


def native_available() -> bool:
    return get_lib() is not None


def encode_residuals(residuals_i16: np.ndarray, enc_type: int, g_par: int,
                     outlier: int, dst: bytearray, start_bit: int) -> int:
    """Pack residuals into ``dst`` (zeroed, sized by caller) at start_bit.

    Returns the end bit position.  Caller must have checked
    native_available().
    """
    lib = get_lib()
    res = np.ascontiguousarray(residuals_i16, dtype=np.int16)
    buf = (ctypes.c_uint8 * len(dst)).from_buffer(dst)
    return int(lib.airs_encode_residuals(
        res.ctypes.data_as(ctypes.c_void_p), res.size, enc_type, g_par,
        outlier, ctypes.cast(buf, ctypes.c_void_p), start_bit))


def decode_mapped(src: bytes, start_bit: int, n: int, enc_type: int,
                  g_par: int, outlier: int):
    """Decode n mapped/raw 16-bit values; returns (values, end_bit) or
    (None, -1) on malformed input."""
    lib = get_lib()
    out = np.empty(n, dtype=np.uint16)
    end = int(lib.airs_decode_mapped(
        src, len(src) * 8, start_bit, n, enc_type, g_par, outlier,
        out.ctypes.data_as(ctypes.c_void_p)))
    if end == (1 << 64) - 1:
        return None, -1
    return out, end


def scatter_rows(joined: bytes, lens: np.ndarray, stride: int,
                 out: np.ndarray) -> None:
    """Scatter ``joined`` (concatenated rows of lengths ``lens``) into the
    (B, stride) uint8 matrix ``out`` (one C memcpy + tail memset per row
    — ``out`` needs no prior zeroing).  Caller must have checked
    native_available()."""
    lib = get_lib()
    lens64 = np.ascontiguousarray(lens, dtype=np.int64)
    lib.airs_scatter_rows(
        joined, lens64.ctypes.data_as(ctypes.c_void_p),
        lens64.size, stride, out.ctypes.data_as(ctypes.c_void_p))


def scatter_rows_at(src: bytes, offs: np.ndarray, lens: np.ndarray,
                    stride: int, out: np.ndarray) -> None:
    """Like :func:`scatter_rows` but rows come from per-row offsets into
    ``src`` (the concatenated-stream decode path stages without
    materializing per-block slices)."""
    lib = get_lib()
    offs64 = np.ascontiguousarray(offs, dtype=np.int64)
    lens64 = np.ascontiguousarray(lens, dtype=np.int64)
    lib.airs_scatter_rows_at(
        src, offs64.ctypes.data_as(ctypes.c_void_p),
        lens64.ctypes.data_as(ctypes.c_void_p), lens64.size, stride,
        out.ctypes.data_as(ctypes.c_void_p))


def gather_rows(rows: np.ndarray, lens: np.ndarray, stride: int) -> bytes:
    """Concatenate the first ``lens[i]`` bytes of each fixed-stride row —
    the inverse of :func:`scatter_rows` (encode-side frame extraction).
    ``rows`` is a contiguous (B, stride) uint8 matrix.  Caller must have
    checked native_available()."""
    lib = get_lib()
    lens64 = np.ascontiguousarray(lens, dtype=np.int64)
    total = int(lens64.clip(max=stride).clip(min=0).sum())
    out = np.empty(total, np.uint8)
    n = int(lib.airs_gather_rows(
        rows.ctypes.data_as(ctypes.c_void_p),
        lens64.ctypes.data_as(ctypes.c_void_p), lens64.size, stride,
        out.ctypes.data_as(ctypes.c_void_p)))
    return out[:n].tobytes()


def stage_parse(buf: np.ndarray, lens: np.ndarray, n_samples: int):
    """Batched header parse + validation for the staged decode tiers.

    One C pass over the (B, stride) staged byte matrix; returns the
    header columns ``(prep, enc, cs, seq, g, outlier, csize, stored,
    uniform)`` on success (``uniform`` — every row shares row 0's method
    byte and encoder parameters, the common lockstep case) or
    ``(fail_rank, fail_block)`` ints on validation failure (check list
    and order identical to the numpy path in
    models/stream.BatchDecompressor._stage_from_buf).  Caller must have
    checked native_available().
    """
    lib = get_lib()
    B, stride = buf.shape
    lens64 = np.ascontiguousarray(lens, dtype=np.int64)
    prep = np.empty(B, np.int32)
    enc = np.empty(B, np.int32)
    cs = np.empty(B, np.int32)
    seq = np.empty(B, np.int32)
    g = np.empty(B, np.uint32)
    outlier = np.empty(B, np.uint32)
    csize = np.empty(B, np.int64)
    stored = np.empty(B, np.uint32)
    fail_block = np.zeros(1, np.int64)
    uniform = np.zeros(1, np.int32)
    vp = ctypes.c_void_p
    rc = int(lib.airs_stage_parse(
        buf.ctypes.data_as(vp), lens64.ctypes.data_as(vp), B, stride,
        n_samples, prep.ctypes.data_as(vp), enc.ctypes.data_as(vp),
        cs.ctypes.data_as(vp), seq.ctypes.data_as(vp),
        g.ctypes.data_as(vp), outlier.ctypes.data_as(vp),
        csize.ctypes.data_as(vp), stored.ctypes.data_as(vp),
        fail_block.ctypes.data_as(vp), uniform.ctypes.data_as(vp)))
    if rc:
        return rc - 1, int(fail_block[0])
    return prep, enc, cs, seq, g, outlier, csize, stored, bool(uniform[0])


def stage_parse_at(src: bytes, offs: np.ndarray, lens: np.ndarray,
                   n_samples: int):
    """Like :func:`stage_parse`, straight from the contiguous stream at
    per-row byte offsets — no scattered row buffer (the device-staged
    decode tier's host side: ~30 bytes touched per frame).  Same return
    contract.  Caller must have checked native_available().
    """
    lib = get_lib()
    B = int(lens.size)
    offs64 = np.ascontiguousarray(offs, dtype=np.int64)
    lens64 = np.ascontiguousarray(lens, dtype=np.int64)
    prep = np.empty(B, np.int32)
    enc = np.empty(B, np.int32)
    cs = np.empty(B, np.int32)
    seq = np.empty(B, np.int32)
    g = np.empty(B, np.uint32)
    outlier = np.empty(B, np.uint32)
    csize = np.empty(B, np.int64)
    stored = np.empty(B, np.uint32)
    fail_block = np.zeros(1, np.int64)
    uniform = np.zeros(1, np.int32)
    vp = ctypes.c_void_p
    rc = int(lib.airs_stage_parse_at(
        src, offs64.ctypes.data_as(vp), lens64.ctypes.data_as(vp), B,
        n_samples, prep.ctypes.data_as(vp), enc.ctypes.data_as(vp),
        cs.ctypes.data_as(vp), seq.ctypes.data_as(vp),
        g.ctypes.data_as(vp), outlier.ctypes.data_as(vp),
        csize.ctypes.data_as(vp), stored.ctypes.data_as(vp),
        fail_block.ctypes.data_as(vp), uniform.ctypes.data_as(vp)))
    if rc:
        return rc - 1, int(fail_block[0])
    return prep, enc, cs, seq, g, outlier, csize, stored, bool(uniform[0])


def checksum_u16(samples_u16: np.ndarray, seed: int) -> int:
    lib = get_lib()
    arr = np.ascontiguousarray(samples_u16, dtype=np.uint16)
    return int(lib.airs_checksum_u16(
        arr.ctypes.data_as(ctypes.c_void_p), arr.size, seed))
