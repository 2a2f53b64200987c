"""ctypes binding for the native sample-ingest library.

Builds ``tpu_gnss/native/libsdrio.so`` on first use (g++), and raises
ImportError if no toolchain is available — callers fall back to numpy.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libsdrio.so")
_lock = threading.Lock()
_lib = None


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    with _lock:
        if _lib is not None:
            return _lib
        src = os.path.join(_NATIVE_DIR, "sdrio.cpp")
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(src):
            subprocess.run(["make", "-s", "-C", _NATIVE_DIR], check=True, capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
        u8 = ctypes.POINTER(ctypes.c_uint8)
        i8 = ctypes.POINTER(ctypes.c_int8)
        f32 = ctypes.POINTER(ctypes.c_float)
        i64 = ctypes.c_int64
        lib.sdrio_unpack_1bit.argtypes = [u8, i64, u8]
        lib.sdrio_unpack_1bit_bipolar.argtypes = [u8, i64, i8]
        lib.sdrio_unpack_mix_1bit.argtypes = [u8, i64, u8, u8, ctypes.c_double, i8, i8]
        lib.sdrio_deinterleave_int8.argtypes = [i8, i64, f32, f32]
        lib.sdrio_deinterleave_uint8.argtypes = [u8, i64, f32, f32]
        lib.sdrio_pack_1bit.argtypes = [u8, i64, u8]
        _lib = lib
        return lib


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _i8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int8))


def _f32ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def unpack_1bit(buf: np.ndarray) -> np.ndarray:
    lib = _load()
    buf = np.ascontiguousarray(buf, dtype=np.uint8)
    out = np.empty(8 * len(buf), dtype=np.uint8)
    lib.sdrio_unpack_1bit(_u8ptr(buf), len(buf), _u8ptr(out))
    return out


def unpack_1bit_bipolar(buf: np.ndarray) -> np.ndarray:
    lib = _load()
    buf = np.ascontiguousarray(buf, dtype=np.uint8)
    out = np.empty(8 * len(buf), dtype=np.int8)
    lib.sdrio_unpack_1bit_bipolar(_u8ptr(buf), len(buf), _i8ptr(out))
    return out


def unpack_mix_1bit(buf: np.ndarray, lo_i, lo_q, lo_rate: float):
    """Fused unpack + square-wave mix -> planar int8 (I, Q)."""
    lib = _load()
    buf = np.ascontiguousarray(buf, dtype=np.uint8)
    lo_i = np.ascontiguousarray(lo_i, dtype=np.uint8)
    lo_q = np.ascontiguousarray(lo_q, dtype=np.uint8)
    out_i = np.empty(8 * len(buf), dtype=np.int8)
    out_q = np.empty(8 * len(buf), dtype=np.int8)
    lib.sdrio_unpack_mix_1bit(_u8ptr(buf), len(buf), _u8ptr(lo_i), _u8ptr(lo_q),
                              float(lo_rate), _i8ptr(out_i), _i8ptr(out_q))
    return out_i, out_q


def deinterleave_int8(raw: np.ndarray):
    lib = _load()
    raw = np.ascontiguousarray(raw, dtype=np.int8)
    n = len(raw) // 2
    out_i = np.empty(n, dtype=np.float32)
    out_q = np.empty(n, dtype=np.float32)
    lib.sdrio_deinterleave_int8(_i8ptr(raw), n, _f32ptr(out_i), _f32ptr(out_q))
    return out_i, out_q


def deinterleave_uint8(raw: np.ndarray):
    lib = _load()
    raw = np.ascontiguousarray(raw, dtype=np.uint8)
    n = len(raw) // 2
    out_i = np.empty(n, dtype=np.float32)
    out_q = np.empty(n, dtype=np.float32)
    lib.sdrio_deinterleave_uint8(_u8ptr(raw), n, _f32ptr(out_i), _f32ptr(out_q))
    return out_i, out_q


def pack_1bit(bits: np.ndarray) -> np.ndarray:
    lib = _load()
    bits = np.ascontiguousarray(bits, dtype=np.uint8)
    out = np.empty((len(bits) + 7) // 8, dtype=np.uint8)
    lib.sdrio_pack_1bit(_u8ptr(bits), len(bits), _u8ptr(out))
    return out


def convert_1bit_to_iq8(in_path: str, out_path: str, gain: int = 100) -> int:
    """Native streamed 1-bit -> int8 I/Q conversion; returns sample count."""
    lib = _load()
    lib.sdrio_convert_1bit_to_iq8.argtypes = [ctypes.c_char_p,
                                              ctypes.c_char_p, ctypes.c_int]
    lib.sdrio_convert_1bit_to_iq8.restype = ctypes.c_int64
    n = lib.sdrio_convert_1bit_to_iq8(in_path.encode(), out_path.encode(),
                                      gain)
    if n < 0:
        raise OSError(f"conversion failed: {in_path} -> {out_path}")
    return int(n)


def convert_iq_to_1bit(in_path: str, out_path: str, *, is_signed: bool,
                       remove_dc: bool = True, mix: bool = True,
                       fc_over_fs: float = 0.0) -> int:
    """Native streamed interleaved-I/Q -> 1-bit IF capture conversion.

    Two file passes (DC estimate + convert) in bounded memory; returns
    sample count.  ``is_signed``: int8 pairs (HackRF) vs uint8-128
    (rtl-sdr).
    """
    lib = _load()
    lib.sdrio_convert_iq_to_1bit.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_double]
    lib.sdrio_convert_iq_to_1bit.restype = ctypes.c_int64
    n = lib.sdrio_convert_iq_to_1bit(
        in_path.encode(), out_path.encode(), int(is_signed),
        int(remove_dc), int(mix), float(fc_over_fs))
    if n < 0:
        raise OSError(f"conversion failed: {in_path} -> {out_path}")
    return int(n)
