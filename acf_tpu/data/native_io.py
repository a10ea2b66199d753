"""ctypes bridge to the native data-plane library (native/acf_native.cpp).

Compiled on demand with the system C++ toolchain and cached next to the
package; every entry point degrades to the pure pandas/numpy path on any
failure, so the framework never hard-depends on a working compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _source_path() -> str:
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return os.path.join(here, "native", "acf_native.cpp")


def _lib_path() -> str:
    cache = os.path.join(os.path.expanduser("~"), ".cache", "acf_tpu")
    os.makedirs(cache, exist_ok=True)
    return os.path.join(cache, "libacf_native.so")


def _build(src: str, out: str) -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", src, "-o", out],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, building it on first use; None if the
    toolchain or source is unavailable."""
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        src = _source_path()
        if not os.path.exists(src):
            return None
        out = _lib_path()
        if (not os.path.exists(out)
                or os.path.getmtime(out) < os.path.getmtime(src)):
            if not _build(src, out):
                return None
        try:
            lib = ctypes.CDLL(out)
        except OSError:
            return None
        lib.acf_count_rows.restype = ctypes.c_long
        lib.acf_count_rows.argtypes = [ctypes.c_char_p]
        lib.acf_parse2.restype = ctypes.c_long
        lib.acf_parse2.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_long]
        lib.acf_parse4.restype = ctypes.c_long
        lib.acf_parse4.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_long]
        lib.acf_caser_windows.restype = ctypes.c_long
        lib.acf_caser_windows.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_long, ctypes.c_long, ctypes.c_long, ctypes.c_long,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32)]
        _LIB = lib
        return _LIB


def _ptr64(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _ptr32(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def parse_two_col(path: str):
    """(uid, iid) int64 arrays for 2-column whitespace files, or None."""
    lib = get_lib()
    if lib is None:
        return None
    cap = lib.acf_count_rows(path.encode())
    if cap < 0:
        return None
    u = np.empty(cap, np.int64)
    i = np.empty(cap, np.int64)
    n = lib.acf_parse2(path.encode(), _ptr64(u), _ptr64(i), cap)
    if n < 0:
        return None
    return u[:n], i[:n]


def parse_rating(path: str):
    """(uid, iid, rating, timestamp) arrays for 4-column numeric TSVs, or
    None (e.g. non-numeric timestamps → caller falls back to pandas)."""
    lib = get_lib()
    if lib is None:
        return None
    cap = lib.acf_count_rows(path.encode())
    if cap < 0:
        return None
    u = np.empty(cap, np.int64)
    i = np.empty(cap, np.int64)
    r = np.empty(cap, np.float64)
    t = np.empty(cap, np.int64)
    n = lib.acf_parse4(path.encode(), _ptr64(u), _ptr64(i),
                       r.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                       _ptr64(t), cap)
    if n < 0:
        return None
    if n < cap * 0.99:  # mostly unparseable → wrong format; let pandas try
        return None
    return u[:n], i[:n], r[:n], t[:n]


def caser_windows(hist: np.ndarray, hist_len: np.ndarray, L: int,
                  target_len: int):
    """(users, seqs, targets) sliding windows, or None."""
    lib = get_lib()
    if lib is None:
        return None
    hist = np.ascontiguousarray(hist, np.int32)
    hist_len = np.ascontiguousarray(hist_len, np.int32)
    U, W = hist.shape
    null32 = ctypes.POINTER(ctypes.c_int32)()
    n = lib.acf_caser_windows(_ptr32(hist), _ptr32(hist_len), U, W, L,
                              target_len, null32, null32, null32)
    if n < 0:
        return None
    users = np.empty(n, np.int32)
    seqs = np.empty((n, L), np.int32)
    tgts = np.empty((n, target_len), np.int32)
    lib.acf_caser_windows(_ptr32(hist), _ptr32(hist_len), U, W, L,
                          target_len, _ptr32(users), _ptr32(seqs), _ptr32(tgts))
    return users, seqs, tgts
