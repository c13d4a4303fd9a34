"""Native (C++) components loaded over a plain C ABI via ctypes.

Replaces the reference's pybind11 extensions (tracer/bvh/bvh.cpp,
bxdf/vol_loader/vol2numpy.cpp) with a single shared library built by the
Makefile in this directory. Every entry point has a pure-numpy fallback so
the framework works (slower) without the native build.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libadapt_native.so")
_lib = None


def _build():
    try:
        subprocess.run(["make", "-C", _DIR, "-s"], check=True,
                       capture_output=True)
        return True
    except FileNotFoundError:
        import warnings
        warnings.warn("native build skipped: `make` not found; using the "
                      "slower numpy fallbacks", stacklevel=3)
        return False
    except subprocess.CalledProcessError as e:
        import warnings
        warnings.warn("native build FAILED; using the slower numpy "
                      f"fallbacks. stderr:\n{e.stderr.decode()[-2000:]}",
                      stacklevel=3)
        return False


def get_lib():
    """Load (building on first use) the native library, or None.

    make runs every time (not just when the .so is missing): the Makefile
    has proper .cpp dependencies, so it is a fast no-op when up to date
    and a rebuild after source edits — a stale .so silently validating
    old code is worse than the ~30 ms make check."""
    global _lib
    if _lib is not None:
        return _lib
    if not _build() and not os.path.exists(_LIB_PATH):
        return None
    try:
        _lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    _lib.vol_read_header.argtypes = [ctypes.c_char_p,
                                     ctypes.POINTER(ctypes.c_int32)]
    _lib.vol_read.argtypes = [ctypes.c_char_p,
                              ctypes.POINTER(ctypes.c_float), ctypes.c_int]
    _lib.bvh_build.argtypes = [ctypes.POINTER(ctypes.c_float),
                               ctypes.c_int64, ctypes.c_int32,
                               ctypes.POINTER(ctypes.c_float),
                               ctypes.POINTER(ctypes.c_int32),
                               ctypes.POINTER(ctypes.c_int32)]
    _lib.bvh_build.restype = ctypes.c_int
    return _lib


def bvh_build(aabbs: np.ndarray):
    """Binned-SAH BVH with skip-offset linearization (native, with a
    pure-numpy median-split fallback).

    aabbs: (P, 6) float32 [lo, hi]. Returns (node_f (M,6) float32,
    node_i (M,3) int32 [base, count, skip], prim_order (P,) int32)."""
    P = aabbs.shape[0]
    if P == 0:
        return (np.zeros((0, 6), np.float32), np.zeros((0, 3), np.int32),
                np.zeros(0, np.int32))
    aabbs = np.ascontiguousarray(aabbs, np.float32)
    lib = get_lib()
    if lib is not None:
        max_nodes = max(4 * P, 64)
        node_f = np.empty((max_nodes, 6), np.float32)
        node_i = np.empty((max_nodes, 3), np.int32)
        order = np.empty(P, np.int32)
        m = lib.bvh_build(
            aabbs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), P,
            max_nodes, node_f.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            node_i.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            order.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        if m > 0:
            return node_f[:m].copy(), node_i[:m].copy(), order
    return _bvh_numpy_fallback(aabbs)


def _bvh_numpy_fallback(aabbs: np.ndarray, leaf_max: int = 4):
    """Median-split BVH in numpy (slow build, same flat layout)."""
    P = aabbs.shape[0]
    centroids = 0.5 * (aabbs[:, :3] + aabbs[:, 3:])
    node_f, node_i = [], []

    def rec(ids):
        me = len(node_f)
        node_f.append(np.concatenate([aabbs[ids, :3].min(0),
                                      aabbs[ids, 3:].max(0)]))
        node_i.append([0, 0, 0])
        if len(ids) <= leaf_max:
            node_i[me] = [0, len(ids), 0]
            leaf_prims.append(ids)
            node_leaf.append(me)
        else:
            c = centroids[ids]
            axis = int(np.argmax(c.max(0) - c.min(0)))
            half = len(ids) // 2
            part = np.argpartition(c[:, axis], half)
            rec(ids[part[:half]])
            rec(ids[part[half:]])
        node_i[me][2] = len(node_f)

    leaf_prims, node_leaf = [], []
    rec(np.arange(P))
    order = np.concatenate(leaf_prims).astype(np.int32)
    base = 0
    for me, prims in zip(node_leaf, leaf_prims):
        node_i[me][0] = base
        base += len(prims)
    return (np.asarray(node_f, np.float32), np.asarray(node_i, np.int32),
            order)


def vol_file_to_numpy(path: str, force_mono: bool = False) -> np.ndarray:
    """Read a mitsuba3 .vol into (Z, Y, X, 3) float32 (or (Z, Y, X) mono).

    Native fast path with a numpy fallback (same contract as reference
    vol2numpy.cpp:124-131)."""
    lib = get_lib()
    if lib is not None:
        dims = (ctypes.c_int32 * 4)()
        rc = lib.vol_read_header(path.encode(), dims)
        if rc != 0:
            raise ValueError(f"bad .vol file '{path}' (error {rc})")
        x, y, z, _c = dims[0], dims[1], dims[2], dims[3]
        if force_mono:
            out = np.empty(z * y * x, np.float32)
        else:
            out = np.empty(z * y * x * 3, np.float32)
        rc = lib.vol_read(path.encode(),
                          out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                          int(force_mono))
        if rc != 0:
            raise ValueError(f".vol payload read failed ({rc})")
        return out.reshape((z, y, x) if force_mono else (z, y, x, 3))
    return _vol_numpy_fallback(path, force_mono)


def _vol_numpy_fallback(path: str, force_mono: bool) -> np.ndarray:
    with open(path, "rb") as f:
        magic = f.read(4)
        if len(magic) < 4 or magic[:3] != b"VOL" or magic[3] != 3:
            raise ValueError(f"bad/truncated .vol magic in '{path}'")
        head = f.read(20)
        if len(head) < 20:
            raise ValueError(f"truncated .vol header in '{path}'")
        enc = np.frombuffer(head[:4], np.int32)[0]
        if enc != 1:
            raise ValueError("only float32 encoding (1) supported")
        x, y, z, c = np.frombuffer(head[4:], np.int32)
        if min(x, y, z) <= 0:
            raise ValueError(f"corrupt .vol dims {(x, y, z)} in '{path}'")
        if c not in (1, 3, 6):
            raise ValueError(f"unsupported channel count {c}")
        f.read(24)  # bbox
        data = np.frombuffer(f.read(4 * x * y * z * c),
                             np.float32).reshape(z, y, x, c)
    if force_mono:
        return np.ascontiguousarray(data[..., 0])
    if c == 1:
        return np.repeat(data, 3, axis=-1)
    return np.ascontiguousarray(data[..., :3])


def write_vol(path: str, grid: np.ndarray) -> None:
    """Write a (Z, Y, X) or (Z, Y, X, C) float32 grid as mitsuba3 .vol
    (test fixture / asset tooling)."""
    if grid.ndim == 3:
        grid = grid[..., None]
    z, y, x, c = grid.shape
    with open(path, "wb") as f:
        f.write(b"VOL\x03")
        np.array([1, x, y, z, c], np.int32).tofile(f)
        np.array([0, 0, 0, 1, 1, 1], np.float32).tofile(f)  # bbox
        grid.astype(np.float32).tofile(f)
