"""Native (C++) runtime components, loaded via ctypes with graceful fallback.

The compute path of this framework is JAX/XLA; the runtime *around* it —
bulk database ingestion here — is native, mirroring the reference's C++
runtime.  The shared object is built on first use with the system g++ and
cached next to the sources; any failure falls back to the numpy
implementations transparently.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

_DIR = pathlib.Path(__file__).resolve().parent
_SO = _DIR / "_encoder.so"
_SRC = _DIR / "encoder.cpp"

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", str(_SRC), "-o", str(_SO)],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(str(_SO))
        lib.pack_db.restype = ctypes.c_int
        lib.pack_db.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int,
            ctypes.c_int64,
            ctypes.c_void_p,
        ]
        lib.unpack_pt.restype = ctypes.c_int
        lib.unpack_pt.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_int,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_void_p,
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def pack_db(
    buffer: bytes, num_pt: int, bytes_per_pt: int, bits_per_coeff: int, n: int
):
    """Pack a contiguous item buffer into u64[num_pt, n], or None if the
    native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    assert len(buffer) == num_pt * bytes_per_pt
    src = np.frombuffer(buffer, dtype=np.uint8)
    out = np.zeros((num_pt, n), dtype=np.uint64)
    rc = lib.pack_db(
        src.ctypes.data,
        num_pt,
        bytes_per_pt,
        bits_per_coeff,
        n,
        out.ctypes.data,
    )
    if rc != 0:
        raise ValueError(f"native pack_db failed with code {rc}")
    return out
