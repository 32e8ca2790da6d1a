"""ctypes bindings for the native runtime (co_native.cpp).

Compiled on first import (g++ -O3 -shared); falls back to None so pure-jnp/
numpy paths keep working when no compiler is available.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import tempfile

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "co_native.cpp")

_lib = None
_so_path = None


def _compile() -> bool:
    """Build (or reuse) the shared library keyed by a source hash.

    The cache key is the source content, never an mtime — a stale binary
    from another host/arch can therefore never be loaded.  Built into the
    package dir when writable, else a per-user temp dir."""
    global _so_path
    try:
        with open(_SRC, "rb") as f:
            src = f.read()
        tag = hashlib.sha256(src).hexdigest()[:12]
        for base in (_DIR, os.path.join(tempfile.gettempdir(),
                                        f"co_native_{os.getuid()}")):
            so = os.path.join(base, f"libco_native_{tag}.so")
            if os.path.exists(so):
                _so_path = so
                return True
            try:
                os.makedirs(base, exist_ok=True)
                tmp = so + f".tmp{os.getpid()}"
                cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                       "-o", tmp, _SRC]
                subprocess.run(cmd, check=True, capture_output=True)
                os.replace(tmp, so)
                _so_path = so
                return True
            except (OSError, subprocess.CalledProcessError):
                continue
        return False
    except Exception:
        return False


def get_lib():
    """The loaded native library, or None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not _compile():
        return None
    lib = ctypes.CDLL(_so_path)
    c_i32p = ctypes.POINTER(ctypes.c_int32)
    c_i64p = ctypes.POINTER(ctypes.c_int64)
    c_f32p = ctypes.POINTER(ctypes.c_float)
    lib.co_kdtree_build.argtypes = [c_f32p, c_i32p, ctypes.c_int64,
                                    ctypes.c_int32, ctypes.c_int32]
    lib.co_traverse.argtypes = [c_f32p, c_f32p, c_f32p, c_i32p,
                                ctypes.c_int32, ctypes.c_int64,
                                ctypes.c_int32, ctypes.c_int32,
                                ctypes.c_float, ctypes.c_int32,
                                ctypes.c_int64, ctypes.c_float,
                                c_i32p, ctypes.c_int64, c_i64p,
                                c_i32p, ctypes.c_int64, c_i64p]
    lib.co_traverse.restype = ctypes.c_int32
    lib.co_node_geometry.argtypes = [c_f32p, ctypes.c_int64, ctypes.c_int32,
                                     ctypes.c_int32, c_f32p, c_f32p, c_f32p,
                                     c_f32p]
    lib.co_traverse_fine.argtypes = [
        c_f32p, c_f32p, c_f32p, c_i32p,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_float, ctypes.c_int32,
        ctypes.c_float, ctypes.c_int32,
        c_i32p, ctypes.c_int64, c_i64p,
        c_i32p, c_i32p, ctypes.c_int64, c_i64p]
    lib.co_traverse_fine.restype = ctypes.c_int32
    _lib = lib
    return lib


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def kdtree_build(pos: np.ndarray, L: int) -> np.ndarray:
    """Exact equal-count kd permutation; pos [n, dim] float32."""
    lib = get_lib()
    n, dim = pos.shape
    pos = np.ascontiguousarray(pos, dtype=np.float32)
    perm = np.arange(n, dtype=np.int32)
    if lib is None:
        # numpy fallback: per-level argsort within equal-count segments
        for l in range(L):
            m = 1 << l
            beg = (np.arange(m + 1, dtype=np.int64) * n) // m
            for i in range(m):
                lo, hi = beg[i], beg[i + 1]
                seg = perm[lo:hi]
                pts = pos[seg]
                axis = int(np.argmax(pts.max(0) - pts.min(0)))
                order = np.argsort(pts[:, axis], kind="stable")
                perm[lo:hi] = seg[order]
        return perm
    lib.co_kdtree_build(_ptr(pos, ctypes.c_float),
                        _ptr(perm, ctypes.c_int32), n, L, dim)
    return perm


def node_geometry(pos_s: np.ndarray, L: int):
    """Per-node center/lbound/rbound/lam over the heap, from the sorted
    particle array; returns None if the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    n, dim = pos_s.shape
    pos_s = np.ascontiguousarray(pos_s, dtype=np.float32)
    M = (1 << (L + 1)) - 1
    center = np.empty((M, dim), dtype=np.float32)
    lb = np.empty((M, dim), dtype=np.float32)
    rb = np.empty((M, dim), dtype=np.float32)
    lam = np.empty(M, dtype=np.float32)
    lib.co_node_geometry(_ptr(pos_s, ctypes.c_float), n, L, dim,
                         _ptr(center, ctypes.c_float),
                         _ptr(lb, ctypes.c_float),
                         _ptr(rb, ctypes.c_float),
                         _ptr(lam, ctypes.c_float))
    return center, lb, rb, lam


def traverse_fine(center, lb, rb, mult, L, sub_depth, n, dim, p, radius,
                  coll, mult_floor=1, sub_boost=1.0,
                  m2l_cap=1 << 20, near_cap=1 << 20):
    """Single-pass dual-granularity traversal + device-ready lists.

    mult_floor: MAC multiplicity floor — Mf uses max(mult, mult_floor), so
    sub-leaf acceptance is never looser than at mult_floor-sized cells.
    sub_boost: acceptance-radius boost for nodes below the block level
    (sub-block M2L replaces what block granularity computed exactly, so
    its per-pair error must be negligible; error falls ~boost^(p+1)).

    Returns (m2l [Kd,2] directed target-sorted, near [Q,2] with packed
    source blocks, target-sorted), or None if the native lib is
    unavailable."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "co_traverse_fine"):
        return None
    center = np.ascontiguousarray(center, dtype=np.float32)
    lb = np.ascontiguousarray(lb, dtype=np.float32)
    rb = np.ascontiguousarray(rb, dtype=np.float32)
    mult = np.ascontiguousarray(mult, dtype=np.int32)
    while True:
        m2l = np.empty((m2l_cap, 2), dtype=np.int32)
        near_t = np.empty(near_cap, dtype=np.int32)
        near_p = np.empty(near_cap, dtype=np.int32)
        nm = ctypes.c_int64()
        nq = ctypes.c_int64()
        rc = lib.co_traverse_fine(
            _ptr(center, ctypes.c_float), _ptr(lb, ctypes.c_float),
            _ptr(rb, ctypes.c_float), _ptr(mult, ctypes.c_int32),
            L, sub_depth, n, dim, p, radius, int(mult_floor),
            float(sub_boost), int(bool(coll)),
            _ptr(m2l, ctypes.c_int32), m2l_cap, ctypes.byref(nm),
            _ptr(near_t, ctypes.c_int32), _ptr(near_p, ctypes.c_int32),
            near_cap, ctypes.byref(nq))
        if rc == 0:
            near = np.stack([near_t[:nq.value], near_p[:nq.value]],
                            axis=1).astype(np.int64)
            return m2l[:nm.value].astype(np.int64), near
        m2l_cap = max(m2l_cap * 2, int(nm.value * 1.2))
        near_cap = max(near_cap * 2, int(nq.value * 1.2))


def traverse(center, lb, rb, mult, L, n, dim, p, radius, mult_floor=1,
             boost_from=None, sub_boost=1.0,
             m2l_cap=1 << 20, p2p_cap=1 << 20):
    """Dual-tree traversal via native code; returns (m2l [K,2], p2p [Q,2])
    with unordered pairs (self pairs in p2p only), or None if the native
    lib is unavailable.  Nodes at heap index >= boost_from accept with
    radius*sub_boost (see traverse_fine)."""
    lib = get_lib()
    if lib is None:
        return None
    center = np.ascontiguousarray(center, dtype=np.float32)
    lb = np.ascontiguousarray(lb, dtype=np.float32)
    rb = np.ascontiguousarray(rb, dtype=np.float32)
    mult = np.ascontiguousarray(mult, dtype=np.int32)
    while True:
        m2l = np.empty((m2l_cap, 2), dtype=np.int32)
        p2p = np.empty((p2p_cap, 2), dtype=np.int32)
        nm = ctypes.c_int64()
        np_ = ctypes.c_int64()
        rc = lib.co_traverse(
            _ptr(center, ctypes.c_float), _ptr(lb, ctypes.c_float),
            _ptr(rb, ctypes.c_float), _ptr(mult, ctypes.c_int32),
            L, n, dim, p, radius, int(mult_floor),
            int(boost_from) if boost_from is not None else (1 << 62),
            float(sub_boost),
            _ptr(m2l, ctypes.c_int32), m2l_cap, ctypes.byref(nm),
            _ptr(p2p, ctypes.c_int32), p2p_cap, ctypes.byref(np_))
        if rc == 0:
            return m2l[:nm.value].astype(np.int64), p2p[:np_.value].astype(np.int64)
        m2l_cap = max(m2l_cap * 2, int(nm.value * 1.2))
        p2p_cap = max(p2p_cap * 2, int(np_.value * 1.2))
