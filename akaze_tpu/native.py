"""ctypes bindings for the native host runtime (native/akaze_native.cpp).

The shared library is compiled on first use with g++ and cached next to the
source (pybind11 is unavailable in this environment; the C ABI + ctypes
keeps the boundary simple).  Every entry point has a pure-Python fallback so
the package works even without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_SRC = os.path.join(_NATIVE_DIR, "akaze_native.cpp")
_SO = os.path.join(_NATIVE_DIR, "libakaze_native.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> Optional[str]:
    if not os.path.exists(_SRC):
        return None
    if (os.path.exists(_SO)
            and os.path.getmtime(_SO) >= os.path.getmtime(_SRC)):
        return _SO
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           "-o", _SO, _SRC, "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _SO
    except (subprocess.SubprocessError, FileNotFoundError):
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    """The native library, building it on first call; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        so = _build()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        lib.fed_tau_by_process_time.restype = ctypes.c_int
        lib.fed_tau_by_process_time.argtypes = [
            ctypes.c_float, ctypes.c_float, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int]
        lib.pgm_query.restype = ctypes.c_int
        lib.pgm_query.argtypes = [ctypes.c_char_p,
                                  ctypes.POINTER(ctypes.c_int),
                                  ctypes.POINTER(ctypes.c_int)]
        lib.pgm_decode.restype = ctypes.c_int
        lib.pgm_decode.argtypes = [ctypes.c_char_p,
                                   ctypes.POINTER(ctypes.c_uint8),
                                   ctypes.c_int]
        lib.loader_create.restype = ctypes.c_void_p
        lib.loader_create.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                      ctypes.c_int]
        lib.loader_num_frames.restype = ctypes.c_int
        lib.loader_num_frames.argtypes = [ctypes.c_void_p]
        lib.loader_next.restype = ctypes.c_int
        lib.loader_next.argtypes = [ctypes.c_void_p,
                                    ctypes.POINTER(ctypes.c_uint8),
                                    ctypes.c_int,
                                    ctypes.POINTER(ctypes.c_int),
                                    ctypes.POINTER(ctypes.c_int)]
        lib.loader_destroy.argtypes = [ctypes.c_void_p]
        lib.hamming_match_cpu.argtypes = [
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
        _lib = lib
        return _lib


def fed_tau_native(t: float, tau_max: float, reorder: bool
                   ) -> Optional[np.ndarray]:
    """FED tau table from the native planner; None if the library is
    unavailable (callers fall back to fed.py)."""
    lib = get_lib()
    if lib is None:
        return None
    cap = 4096
    buf = (ctypes.c_float * cap)()
    n = lib.fed_tau_by_process_time(ctypes.c_float(t),
                                    ctypes.c_float(tau_max),
                                    int(reorder), buf, cap)
    if n < 0:
        raise RuntimeError(f"FED needs {-n} steps > cap {cap}")
    return np.asarray(buf[:n], np.float32)


def load_pgm_native(path: str) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    if lib.pgm_query(path.encode(), ctypes.byref(w),
                     ctypes.byref(h)) != 0:
        raise IOError(f"cannot read PGM header: {path}")
    out = np.empty((h.value, w.value), np.uint8)
    rc = lib.pgm_decode(path.encode(),
                        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                        out.size)
    if rc != 0:
        raise IOError(f"PGM decode failed ({rc}): {path}")
    return out


class FrameLoader:
    """Threaded prefetching frame loader over a list of PGM paths.

    Decoding runs on native worker threads; ``__next__`` yields frames
    strictly in order as uint8 [H, W] arrays.  Falls back to synchronous
    Python decoding when the native library is unavailable.
    """

    def __init__(self, paths: List[str], n_threads: int = 2,
                 prefetch: int = 4):
        self._paths = list(paths)
        self._lib = get_lib()
        self._handle = None
        self._pos = 0
        if self._lib is not None:
            joined = "\n".join(self._paths).encode()
            self._handle = self._lib.loader_create(joined, n_threads,
                                                   prefetch)

    def __len__(self):
        return len(self._paths)

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        if self._pos >= len(self._paths):
            raise StopIteration
        self._pos += 1
        if self._handle is not None:
            cap = 32 * 1024 * 1024
            buf = np.empty(cap, np.uint8)
            w = ctypes.c_int()
            h = ctypes.c_int()
            rc = self._lib.loader_next(
                self._handle,
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap,
                ctypes.byref(w), ctypes.byref(h))
            if rc == -1:
                raise StopIteration
            if rc != 0:
                raise IOError(f"frame decode failed ({rc})")
            return buf[:w.value * h.value].reshape(
                h.value, w.value).copy()
        from .io import load_pgm
        return load_pgm(self._paths[self._pos - 1])

    def close(self):
        if self._handle is not None and self._lib is not None:
            self._lib.loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def hamming_match_native(q: np.ndarray, t: np.ndarray, max_dist: int = 96
                         ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """CPU 1-NN Hamming match (uniqueness rule); None if lib unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    q = np.ascontiguousarray(q, np.uint32)
    t = np.ascontiguousarray(t, np.uint32)
    nq, nt = q.shape[0], t.shape[0]
    index = np.empty(nq, np.int32)
    dist = np.empty(nq, np.int32)
    lib.hamming_match_cpu(
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), nq,
        t.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), nt, max_dist,
        index.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        dist.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return index, dist
