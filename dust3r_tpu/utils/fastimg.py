"""ctypes bindings for the native host-side image core (native/fastimg.cpp).

Falls back to numpy transparently when the shared library hasn't been
built; `ensure_built()` compiles it on demand with g++.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import os.path as osp
import subprocess
import tempfile

import numpy as np

_LIB = None
_NATIVE_DIR = osp.join(osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))), "native")
_SRC_PATH = osp.join(_NATIVE_DIR, "fastimg.cpp")


def _lib_path():
    """Library filename versioned by a source CONTENT hash. Two invariants
    this buys: (1) a kernel added to fastimg.cpp gets a NEW filename, so a
    process that already dlopen'ed the old build never 'rebuilds' into the
    glibc pathname cache (CDLL on a rewritten path returns the OLD
    handle); (2) no process ever overwrites a .so another process has
    mapped (rewriting a mapped file risks SIGBUS). Always hashes the
    bytes: an mtime/size-keyed cache can serve a stale tag after a
    timestamp-preserving same-size copy (rsync -a / touch -r), and
    hashing the ~10 KB source costs microseconds while `_load` is
    memoized per process anyway."""
    with open(_SRC_PATH, "rb") as f:
        tag = hashlib.sha1(f.read()).hexdigest()[:12]
    return osp.join(_NATIVE_DIR, f"libfastimg-{tag}.so")


def _prune_stale_builds(current_path):
    """Best-effort unlink of libfastimg-*.so files from older source
    revisions (they accumulate forever otherwise — one per source edit).
    Never touches the current build; processes that already mmap'ed an
    old build keep running (unlink doesn't unmap)."""
    try:
        for name in os.listdir(_NATIVE_DIR):
            if (name.startswith("libfastimg-") and name.endswith(".so")
                    and osp.join(_NATIVE_DIR, name) != current_path):
                try:
                    os.unlink(osp.join(_NATIVE_DIR, name))
                except OSError:
                    pass
    except OSError:
        pass


def ensure_built(force=False):
    """Compile the shared library if missing; returns path or None.

    Concurrent-safe: each builder compiles to its own temp file and
    publishes with an atomic os.replace, so N dataloader workers racing
    the first build all end up loading a complete library."""
    if not osp.isfile(_SRC_PATH):
        return None
    path = _lib_path()
    if osp.isfile(path) and not force:
        return path
    tmp = None
    try:
        fd, tmp = tempfile.mkstemp(suffix=".so", dir=_NATIVE_DIR)
        os.close(fd)
        subprocess.run(["g++", "-O3", "-march=native", "-fopenmp", "-shared",
                        "-fPIC", "-o", tmp, _SRC_PATH], check=True,
                       capture_output=True)
        os.replace(tmp, path)  # atomic publish
        _prune_stale_builds(path)
        return path
    except Exception:
        if tmp is not None:
            try:
                os.unlink(tmp)
            except OSError:
                pass
        return None


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    lib = None
    for attempt in range(2):
        # attempt 2 forces a rebuild: another process may have published a
        # newer build and pruned the .so between our ensure_built() and
        # CDLL (source edited mid worker spawn) — without the retry that
        # worker would silently run the numpy fallback for its lifetime
        path = ensure_built(force=attempt > 0)
        if path is None:
            _LIB = False
            return False
        try:
            lib = ctypes.CDLL(path)
            # the hash-versioned filename pins the binary to the current
            # source, so a symbol can only be missing if the compile
            # itself mis-produced — fall back to numpy, don't loop
            if not hasattr(lib, "color_jitter_norm_u8"):
                raise OSError("built library is missing expected symbols")
            break
        except OSError:
            lib = None
    if lib is None:
        _LIB = False
        return False
    lib.color_jitter_norm_u8.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float)]
    lib.imgnorm_u8_f32.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64]
    lib.unnorm_f32.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64]
    lib.depth_valid_mask.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64]
    lib.resize_nearest_f32.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64]
    _LIB = lib
    return lib


def available():
    return bool(_load())


def imgnorm(arr_u8):
    """uint8 (..., 3) -> float32 in [-1, 1]; native when available."""
    arr_u8 = np.ascontiguousarray(arr_u8, dtype=np.uint8)
    lib = _load()
    if not lib:
        return (arr_u8.astype(np.float32) / 255.0 - 0.5) / 0.5
    out = np.empty(arr_u8.shape, np.float32)
    lib.imgnorm_u8_f32(
        arr_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), arr_u8.size)
    return out


def depth_valid(depth_f32):
    """float32 depth -> bool validity mask (depth > 0 and finite)."""
    depth_f32 = np.ascontiguousarray(depth_f32, dtype=np.float32)
    lib = _load()
    if not lib:
        return (depth_f32 > 0) & np.isfinite(depth_f32)
    out = np.empty(depth_f32.shape, np.uint8)
    lib.depth_valid_mask(
        depth_f32.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), depth_f32.size)
    return out.astype(bool)


def resize_nearest(depth_f32, out_h, out_w):
    """Nearest-neighbor depth resize (cv2.INTER_NEAREST semantics)."""
    depth_f32 = np.ascontiguousarray(depth_f32, dtype=np.float32)
    lib = _load()
    if not lib:
        sh, sw = depth_f32.shape
        ys = np.minimum((np.arange(out_h) * sh / out_h).astype(np.int64),
                        sh - 1)
        xs = np.minimum((np.arange(out_w) * sw / out_w).astype(np.int64),
                        sw - 1)
        return depth_f32[ys][:, xs]
    sh, sw = depth_f32.shape
    out = np.empty((out_h, out_w), np.float32)
    lib.resize_nearest_f32(
        depth_f32.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), sh, sw,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out_h, out_w)
    return out


# op codes for color_jitter_norm_u8
JITTER_OPS = {"brightness": 0, "contrast": 1, "saturation": 2, "hue": 3}


def color_jitter_norm(arr_u8, ops, factors):
    """Fused ColorJitter + ImgNorm on a uint8 (H, W, 3) image.

    ops: list of op names (JITTER_OPS keys) in application order;
    factors: matching enhance factors (hue: turn fraction).
    Returns float32 (H, W, 3) in [-1, 1], or None when the native lib is
    unavailable (caller falls back to the PIL/cv2 path).
    """
    lib = _load()
    if not lib:
        return None
    arr_u8 = np.ascontiguousarray(arr_u8, dtype=np.uint8)
    assert arr_u8.ndim == 3 and arr_u8.shape[-1] == 3
    out = np.empty(arr_u8.shape, np.float32)
    ops_arr = np.asarray([JITTER_OPS[o] for o in ops], np.int32)
    fac_arr = np.asarray(factors, np.float32)
    lib.color_jitter_norm_u8(
        arr_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        arr_u8.shape[0] * arr_u8.shape[1],
        ops_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(ops),
        fac_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out
