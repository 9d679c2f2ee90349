"""ctypes bindings for the reference C library oracle.

Mirrors the public API of /root/reference/lib/cmp.h so differential tests
can compare our codec's exact bytes and error codes against ground truth.
A deterministic timestamp stub is installed so identifiers are reproducible
(mirroring our Python fallback counter semantics).
"""

from __future__ import annotations

import ctypes

from .build import build

U32_MAX = 0xFFFFFFFF


class CParams(ctypes.Structure):
    _fields_ = [
        ("primary_preprocessing", ctypes.c_int),
        ("primary_encoder_type", ctypes.c_int),
        ("primary_encoder_param", ctypes.c_uint32),
        ("primary_encoder_outlier", ctypes.c_uint32),
        ("secondary_iterations", ctypes.c_uint32),
        ("secondary_preprocessing", ctypes.c_int),
        ("secondary_encoder_type", ctypes.c_int),
        ("secondary_encoder_param", ctypes.c_uint32),
        ("secondary_encoder_outlier", ctypes.c_uint32),
        ("model_rate", ctypes.c_uint32),
        ("checksum_enabled", ctypes.c_uint8),
        ("uncompressed_fallback_enabled", ctypes.c_uint8),
    ]


class CContext(ctypes.Structure):
    _fields_ = [
        ("magic", ctypes.c_uint32),
        ("params", CParams),
        ("work_buf", ctypes.c_void_p),
        ("work_buf_size", ctypes.c_uint32),
        ("model_size", ctypes.c_uint32),
        ("identifier", ctypes.c_uint64),
        ("sequence_number", ctypes.c_uint8),
    ]


_TIMESTAMP_FUNC_T = ctypes.CFUNCTYPE(None, ctypes.POINTER(ctypes.c_uint32),
                                     ctypes.POINTER(ctypes.c_uint16))


class Oracle:
    """One loaded instance of the reference library."""

    def __init__(self):
        self.lib = ctypes.CDLL(str(build()))
        lib = self.lib
        lib.cmp_initialise.restype = ctypes.c_uint32
        lib.cmp_initialise.argtypes = [ctypes.POINTER(CContext),
                                       ctypes.POINTER(CParams),
                                       ctypes.c_void_p, ctypes.c_uint32]
        for name in ("cmp_compress_u16", "cmp_compress_i16",
                     "cmp_compress_i16_in_i32"):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_uint32
            fn.argtypes = [ctypes.POINTER(CContext), ctypes.c_void_p,
                           ctypes.c_uint32, ctypes.c_void_p, ctypes.c_uint32]
        lib.cmp_reset.restype = ctypes.c_uint32
        lib.cmp_reset.argtypes = [ctypes.POINTER(CContext)]
        lib.cmp_deinitialise.restype = None
        lib.cmp_deinitialise.argtypes = [ctypes.POINTER(CContext)]
        lib.cmp_is_error.restype = ctypes.c_uint
        lib.cmp_is_error.argtypes = [ctypes.c_uint32]
        lib.cmp_get_error_code.restype = ctypes.c_int
        lib.cmp_get_error_code.argtypes = [ctypes.c_uint32]
        lib.cmp_compress_bound.restype = ctypes.c_uint32
        lib.cmp_compress_bound.argtypes = [ctypes.c_uint32]
        lib.cmp_cal_work_buf_size.restype = ctypes.c_uint32
        lib.cmp_cal_work_buf_size.argtypes = [ctypes.POINTER(CParams),
                                              ctypes.c_uint32]
        lib.cmp_set_timestamp_func.restype = None
        lib.cmp_set_timestamp_func.argtypes = [_TIMESTAMP_FUNC_T]
        self._counter = 0

        def _stub(coarse, fine):
            coarse[0] = (self._counter >> 16) & 0xFFFFFFFF
            fine[0] = self._counter & 0xFFFF
            self._counter += 1

        self._stub = _TIMESTAMP_FUNC_T(_stub)  # keep a reference alive
        lib.cmp_set_timestamp_func(self._stub)

    def reset_timestamps(self, value: int = 0) -> None:
        self._counter = value

    def make_params(self, p) -> CParams:
        """Convert an airs_compression_tpu CmpParams to the C struct."""
        return CParams(
            primary_preprocessing=int(p.primary_preprocessing),
            primary_encoder_type=int(p.primary_encoder_type),
            primary_encoder_param=p.primary_encoder_param,
            primary_encoder_outlier=p.primary_encoder_outlier & U32_MAX,
            secondary_iterations=p.secondary_iterations,
            secondary_preprocessing=int(p.secondary_preprocessing),
            secondary_encoder_type=int(p.secondary_encoder_type),
            secondary_encoder_param=p.secondary_encoder_param,
            secondary_encoder_outlier=p.secondary_encoder_outlier & U32_MAX,
            model_rate=p.model_rate,
            checksum_enabled=1 if p.checksum_enabled else 0,
            uncompressed_fallback_enabled=1 if p.uncompressed_fallback_enabled else 0,
        )


class OracleContext:
    """Reference cmp_context convenience wrapper."""

    def __init__(self, oracle: Oracle, params):
        self.oracle = oracle
        self.ctx = CContext()
        cparams = oracle.make_params(params)
        wb_size = oracle.lib.cmp_cal_work_buf_size(ctypes.byref(cparams), 1 << 20)
        if oracle.lib.cmp_is_error(wb_size):
            wb_size = 0
        self._work_buf = (ctypes.c_uint8 * max(int(wb_size), 8))()
        err = self.oracle.lib.cmp_initialise(
            ctypes.byref(self.ctx), ctypes.byref(cparams),
            ctypes.cast(self._work_buf, ctypes.c_void_p),
            wb_size if wb_size else 0)
        self.init_error = self._err_code(err)

    def _err_code(self, ret: int) -> int:
        if self.oracle.lib.cmp_is_error(ret):
            return int(self.oracle.lib.cmp_get_error_code(ret))
        return 0

    def compress(self, data_bytes: bytes, cmp_type: str = "u16",
                 dst_capacity: int | None = None):
        """Compress raw sample bytes -> (compressed bytes | None, error code)."""
        src = (ctypes.c_uint8 * len(data_bytes)).from_buffer_copy(data_bytes)
        if dst_capacity is None:
            bound = self.oracle.lib.cmp_compress_bound(
                len(data_bytes) if cmp_type != "i16_in_i32" else len(data_bytes) // 2)
            if self.oracle.lib.cmp_is_error(bound):
                return None, self._err_code(bound)
            dst_capacity = int(bound)
        # 8-byte aligned destination
        dst = (ctypes.c_uint64 * ((dst_capacity + 7) // 8 + 1))()
        fn = getattr(self.oracle.lib, f"cmp_compress_{cmp_type}")
        ret = fn(ctypes.byref(self.ctx), ctypes.cast(dst, ctypes.c_void_p),
                 dst_capacity, ctypes.cast(src, ctypes.c_void_p), len(data_bytes))
        err = self._err_code(ret)
        if err:
            return None, err
        return ctypes.string_at(dst, int(ret)), 0

    def reset(self) -> int:
        return self._err_code(self.oracle.lib.cmp_reset(ctypes.byref(self.ctx)))

    @property
    def sequence_number(self) -> int:
        return self.ctx.sequence_number
