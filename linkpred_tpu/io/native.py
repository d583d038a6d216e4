"""ctypes loader for the native C++ helpers (``native/`` at the repo root).

Builds ``liblinkpred_native.so`` with ``g++`` on first use (cached; rebuilds when
the source is newer) and exposes the MTX body parser.  Everything degrades
gracefully: if no compiler or the build fails, callers fall back to the NumPy
parser (`linkpred_tpu.io.mtx`).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

__all__ = ["native_lib", "parse_mtx_body", "parse_mtx_buffer"]

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_SRCS = [os.path.join(_NATIVE_DIR, "src", f)
         for f in ("mtx_native.cpp", "plan_native.cpp")]
_SO = os.path.join(_NATIVE_DIR, "build", "liblinkpred_native.so")

_lib = None
_tried = False


def _build() -> bool:
    try:
        os.makedirs(os.path.dirname(_SO), exist_ok=True)
        subprocess.run(
            ["g++", "-O3", "-march=native", "-std=c++17", "-fPIC", "-shared",
             "-o", _SO, *_SRCS],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def native_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, building it on demand; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not all(os.path.exists(p) for p in _SRCS):
        return None
    fresh = os.path.exists(_SO) and os.path.getmtime(_SO) >= max(
        os.path.getmtime(p) for p in _SRCS)
    if not fresh and not _build():
        return None
    lib = _load()
    if lib is None and fresh:
        # A stale prebuilt .so can pass the mtime check (copied artifacts,
        # extracted archives — mtimes are not content hashes) yet miss newer
        # symbols; rebuild once from source before giving up.
        if _build():
            lib = _load()
    _lib = lib
    return _lib


def _load() -> Optional[ctypes.CDLL]:
    try:
        lib = ctypes.CDLL(_SO)
        cchar_p = ctypes.POINTER(ctypes.c_char)
        lib.lp_mtx_parse.restype = ctypes.c_int64
        lib.lp_mtx_parse.argtypes = [
            cchar_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double)]
        lib.lp_mtx_detect_cols.restype = ctypes.c_int
        lib.lp_mtx_detect_cols.argtypes = [cchar_p, ctypes.c_int64]
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        lib.lp_plan_expand.restype = ctypes.c_int64
        lib.lp_plan_expand.argtypes = [
            i32p, i32p, ctypes.c_int64,              # offsets, indices, n
            i32p, i32p, i32p, ctypes.c_int64,        # src, mid, skip, m1
            ctypes.c_int32, ctypes.c_int32,          # upper_only, deg16
            ctypes.c_int64,                          # est
            i32p, i32p, i32p, i32p, i32p,            # slot arrays
            i64p]                                    # cnt_u
        lib.lp_plan_firsthop.restype = ctypes.c_int64
        lib.lp_plan_firsthop.argtypes = [
            i32p, i32p, ctypes.c_int64,              # offsets, indices, n
            ctypes.c_int32, ctypes.c_int32,          # min_degree1, upper_only
            i32p, i32p, i32p,                        # src, mid, skip out
            i32p, i32p,                              # kuniq, kskip out
            ctypes.POINTER(ctypes.c_int64)]          # ku_out
        return lib
    except (OSError, AttributeError):
        # AttributeError: .so loaded but misses a symbol (stale artifact)
        return None


def _as_cptr(buf, offset: int = 0):
    """Zero-copy ``char*`` into ``buf`` (bytes, bytearray, mmap) at ``offset``."""
    if isinstance(buf, bytes):
        base = ctypes.cast(ctypes.c_char_p(buf), ctypes.POINTER(ctypes.c_char))
        return ctypes.cast(ctypes.byref(base.contents, offset),
                           ctypes.POINTER(ctypes.c_char))
    view = (ctypes.c_char * (len(buf) - offset)).from_buffer(buf, offset)
    return ctypes.cast(view, ctypes.POINTER(ctypes.c_char))


def parse_mtx_buffer(
    buf, offset: int, length: int, max_rows: int, weighted: bool,
) -> Optional[Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]]:
    """Parse coordinate lines from ``buf[offset:offset+length]`` WITHOUT copying
    the text (``buf`` may be an mmap of a multi-GB file — the reference streams
    131072-line blocks, `mtx.hxx:152-193`; here the native parser walks the
    page cache directly).  Returns (src, dst, weights) 1-indexed int64 arrays,
    or None when the native library is unavailable."""
    lib = native_lib()
    if lib is None:
        return None
    p = _as_cptr(buf, offset)
    ncols = lib.lp_mtx_detect_cols(p, length)
    if ncols < 2:
        e = np.empty(0, dtype=np.int64)
        return e, e.copy(), (np.empty(0, dtype=np.float64) if weighted else None)
    src = np.empty(max_rows, dtype=np.int64)
    dst = np.empty(max_rows, dtype=np.int64)
    wts = np.empty(max_rows, dtype=np.float64) if (weighted and ncols >= 3) else None
    rows = lib.lp_mtx_parse(
        p, length, max_rows, ncols,
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        wts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)) if wts is not None else None,
    )
    rows = int(rows)
    return src[:rows], dst[:rows], (wts[:rows] if wts is not None else None)


def parse_mtx_body(
    body: bytes, max_rows: int, weighted: bool,
) -> Optional[Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]]:
    """Parse coordinate lines into (src, dst, weights) 1-indexed int64 arrays.
    Returns None when the native library is unavailable."""
    return parse_mtx_buffer(body, 0, len(body), max_rows, weighted)
