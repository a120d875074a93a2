"""ctypes bindings for the native host-side data kernels (native/packer.cpp).

Builds the shared library on first use (g++, cached next to the source) and
falls back to pure numpy transparently if a toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import platform
import subprocess
from typing import Optional, Sequence

import numpy as np

__all__ = ["native_available", "pack_normalize", "build_library"]

_LIB = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "packer.cpp")


def _so_path() -> str:
    """Cache path keyed on source hash + host arch: a stale or foreign-host
    binary (e.g. compiled with -march=native elsewhere) is never reused.
    Built artifacts are gitignored — the library is always compiled locally."""
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:12]
    return os.path.join(
        os.path.dirname(_SRC), f"libsdy_native.{digest}.{platform.machine()}.so"
    )


def build_library(force: bool = False) -> Optional[str]:
    """Compile native/packer.cpp -> a hash-keyed .so (rebuilt on any source
    or host-arch change)."""
    if not os.path.exists(_SRC):
        return None
    so = _so_path()
    if not force and os.path.exists(so):
        return so
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-pthread",
             _SRC, "-o", so],
            check=True, capture_output=True,
        )
        return so
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = build_library()
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    PP = ctypes.POINTER(ctypes.c_float)
    lib.pack_normalize.argtypes = [
        ctypes.POINTER(PP), PP, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        PP, PP, ctypes.c_int,
    ]
    lib.pack_normalize.restype = ctypes.c_int
    _LIB = lib
    return _LIB


def native_available() -> bool:
    return _load() is not None


def pack_normalize(
    arrays: Sequence[np.ndarray],
    means: Optional[np.ndarray] = None,
    stds: Optional[np.ndarray] = None,
    n_threads: int = 0,
) -> np.ndarray:
    """Pack per-variable (T, H, W) float32 arrays into channels-last
    (T, H, W, C), optionally z-score normalizing per channel. Uses the native
    threaded kernel when available, else numpy."""
    arrays = [np.ascontiguousarray(a, np.float32) for a in arrays]
    T = arrays[0].shape[0]
    hw = int(np.prod(arrays[0].shape[1:]))
    C = len(arrays)
    lib = _load()
    if lib is None:
        out = np.stack(arrays, axis=-1)
        if means is not None:
            out = (out - np.asarray(means, np.float32)) / np.asarray(stds, np.float32)
        return out

    dst = np.empty(arrays[0].shape + (C,), np.float32)
    PP = ctypes.POINTER(ctypes.c_float)
    src_ptrs = (PP * C)(*[a.ctypes.data_as(PP) for a in arrays])
    mean_ptr = std_ptr = None
    if means is not None:
        means = np.ascontiguousarray(means, np.float32)
        inv = np.ascontiguousarray(1.0 / np.asarray(stds, np.float32), np.float32)
        mean_ptr = means.ctypes.data_as(PP)
        std_ptr = inv.ctypes.data_as(PP)
    if n_threads <= 0:
        n_threads = min(os.cpu_count() or 1, 8)
    lib.pack_normalize(
        src_ptrs, dst.ctypes.data_as(PP), T, hw, C,
        mean_ptr, std_ptr, n_threads,
    )
    return dst
