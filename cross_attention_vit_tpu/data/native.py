"""ctypes binding for the native NIfTI decoder (native/nifti_decode.cpp).

Compiles the shared library on first use (g++ -O3, cached next to the
source); every call is parity-checked against the pure-Python path in tests.
Falls back cleanly when no compiler is available — `available()` gates use.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

import numpy as np

_SRC = Path(__file__).resolve().parents[2] / "native" / "nifti_decode.cpp"
_LIB = _SRC.parent / "build" / "libniftidecode.so"
_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_failed = False


def _build() -> bool:
    _LIB.parent.mkdir(parents=True, exist_ok=True)
    cmd = ["g++", "-O3", "-shared", "-fPIC", str(_SRC), "-o", str(_LIB),
           "-ldeflate", "-lz", "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def _load() -> ctypes.CDLL | None:
    global _lib, _failed
    with _lock:
        if _lib is not None or _failed:
            return _lib
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            if not _build():
                _failed = True
                return None
        try:
            lib = ctypes.CDLL(str(_LIB))
        except OSError:
            _failed = True
            return None
        lib.nifti_decode_crop.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.POINTER(ctypes.c_float), ctypes.c_char_p,
            ctypes.c_size_t]
        lib.nifti_decode_crop.restype = ctypes.c_int
        lib.nifti_decode_crop_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_char_p,
            ctypes.c_size_t]
        lib.nifti_decode_crop_batch.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def decode_crop(path: str | Path, target: tuple[int, int, int],
                fill: float = -1.0) -> np.ndarray:
    """Native equivalent of nifti.read_volume_cropped."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native decoder unavailable (no g++?)")
    tx, ty, tz = target
    out = np.empty(target, np.float32)
    err = ctypes.create_string_buffer(256)
    rc = lib.nifti_decode_crop(
        str(path).encode(), tx, ty, tz, ctypes.c_float(fill),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), err, 256)
    if rc:
        raise IOError(f"native decode failed for {path}: "
                      f"{err.value.decode(errors='replace')}")
    return out


def decode_crop_batch(paths, target: tuple[int, int, int], fill: float = -1.0,
                      num_threads: int = 4) -> np.ndarray:
    """Decode n files into (n, *target) float32 with a C++ thread pool."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native decoder unavailable (no g++?)")
    paths = [str(p) for p in paths]
    n = len(paths)
    tx, ty, tz = target
    out = np.empty((n, tx, ty, tz), np.float32)
    arr = (ctypes.c_char_p * n)(*(p.encode() for p in paths))
    err = ctypes.create_string_buffer(256)
    rc = lib.nifti_decode_crop_batch(
        arr, n, tx, ty, tz, ctypes.c_float(fill),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), num_threads,
        err, 256)
    if rc:
        raise IOError(f"native batch decode failed at {paths[rc - 1]}: "
                      f"{err.value.decode(errors='replace')}")
    return out
