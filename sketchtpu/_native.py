"""ctypes loader for the native helper library.

The C++ sources live in native/. The shared library is compiled on first use
(g++ is part of the toolchain); if compilation fails, callers fall back to
pure-Python implementations.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

_SRC = Path(__file__).resolve().parent.parent / "native" / "sketchtpu_native.cpp"
_LIB_PATH = Path(__file__).resolve().parent / "_sketchtpu_native.so"

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    # compile to a process-unique temp path and os.replace into place:
    # concurrent processes (e.g. a multi-rank jax.distributed launch on a
    # fresh checkout) must never CDLL a half-linked file or race g++ on
    # the shared output
    tmp = _LIB_PATH.with_suffix(f".so.tmp.{os.getpid()}")
    cmd = [
        "g++",
        "-O3",
        "-std=c++17",
        "-shared",
        "-fPIC",
        "-o",
        str(tmp),
        str(_SRC),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, _LIB_PATH)
        return True
    except Exception:
        tmp.unlink(missing_ok=True)
        return False


def get_lib():
    """Return the loaded native library, or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("SKETCHTPU_NO_NATIVE"):
            return None
        try:
            if not _LIB_PATH.exists() or (
                _SRC.exists() and _SRC.stat().st_mtime > _LIB_PATH.stat().st_mtime
            ):
                if not _SRC.exists() or not _build():
                    return None
            lib = ctypes.CDLL(str(_LIB_PATH))
            lib.stpu_crc32c.restype = ctypes.c_uint32
            lib.stpu_crc32c.argtypes = [
                ctypes.c_char_p,
                ctypes.c_size_t,
                ctypes.c_uint32,
            ]
            lib.stpu_snappy_max_compressed.restype = ctypes.c_size_t
            lib.stpu_snappy_max_compressed.argtypes = [ctypes.c_size_t]
            lib.stpu_snappy_compress.restype = ctypes.c_size_t
            lib.stpu_snappy_compress.argtypes = [
                ctypes.c_char_p,
                ctypes.c_size_t,
                ctypes.c_void_p,
                ctypes.c_size_t,
            ]
            lib.stpu_snappy_decompress.restype = ctypes.c_size_t
            lib.stpu_snappy_decompress.argtypes = [
                ctypes.c_char_p,
                ctypes.c_size_t,
                ctypes.c_void_p,
                ctypes.c_size_t,
            ]
            lib.stpu_filter_bin_signs.restype = None
            lib.stpu_filter_bin_signs.argtypes = [
                ctypes.c_void_p,
                ctypes.c_size_t,
                ctypes.c_uint16,
                ctypes.c_uint64,
                ctypes.c_void_p,
                ctypes.c_size_t,
            ]
            lib.stpu_bin_signs.restype = None
            lib.stpu_bin_signs.argtypes = [
                ctypes.c_void_p,
                ctypes.c_size_t,
                ctypes.c_uint64,
                ctypes.c_void_p,
                ctypes.c_size_t,
            ]
            lib.stpu_format_f32.restype = None
            lib.stpu_format_f32.argtypes = [
                ctypes.c_void_p,
                ctypes.c_int64,
                ctypes.c_void_p,
                ctypes.c_void_p,
            ]
            lib.stpu_ski_bin_msgpack.restype = ctypes.c_int64
            lib.stpu_ski_bin_msgpack.argtypes = [
                ctypes.c_void_p,
                ctypes.c_void_p,
                ctypes.c_void_p,
                ctypes.c_int64,
                ctypes.c_void_p,
                ctypes.c_int64,
            ]
            lib.stpu_ski_bin_unpack.restype = ctypes.c_int64
            lib.stpu_ski_bin_unpack.argtypes = [
                ctypes.c_void_p,
                ctypes.c_int64,
                ctypes.c_void_p,
                ctypes.c_void_p,
                ctypes.c_int64,
                ctypes.c_void_p,
            ]
            lib.stpu_parse_aa.restype = ctypes.c_int
            lib.stpu_parse_aa.argtypes = [
                ctypes.c_char_p,
                ctypes.c_int64,
                ctypes.c_void_p,
                ctypes.c_uint8,
                ctypes.c_void_p,
                ctypes.c_void_p,
                ctypes.c_void_p,
                ctypes.c_void_p,
                ctypes.c_void_p,
            ]
            lib.stpu_parse_dna.restype = ctypes.c_int
            lib.stpu_parse_dna.argtypes = [
                ctypes.c_char_p,
                ctypes.c_int64,
                ctypes.c_int,
                ctypes.c_void_p,
                ctypes.c_int,
                ctypes.c_void_p,
                ctypes.c_void_p,
                ctypes.c_void_p,
                ctypes.c_void_p,
                ctypes.c_void_p,
                ctypes.c_void_p,
            ]
            lib.stpu_format_dist_lines.restype = ctypes.c_int64
            lib.stpu_format_dist_lines.argtypes = [
                ctypes.c_char_p,
                ctypes.c_void_p,
                ctypes.c_char_p,
                ctypes.c_void_p,
                ctypes.c_void_p,
                ctypes.c_void_p,
                ctypes.c_void_p,
                ctypes.c_void_p,
                ctypes.c_int64,
                ctypes.c_void_p,
                ctypes.c_int64,
            ]
            _lib = lib
        except Exception:
            _lib = None
        return _lib
