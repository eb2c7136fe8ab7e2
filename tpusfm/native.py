"""Loader for the native C++ runtime pieces (csrc/).

Compiled lazily with g++ on first use and cached in build/. Every native
entry point has a pure-JAX fallback so the framework still works where no
toolchain exists; the native path is the default on host-side,
data-dependent workloads (union-find labeling, speckle filtering) where an
iterative XLA formulation would waste device cycles.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_ROOT, "csrc", "ccl.cpp")
_BUILD = os.path.join(_ROOT, "build")
_SO = os.path.join(_BUILD, "libtpusfm_native.so")

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            os.makedirs(_BUILD, exist_ok=True)
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_SO)
        lib.tpusfm_ccl_label.restype = ctypes.c_int32
        lib.tpusfm_ccl_label.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
        ]
        lib.tpusfm_ccl_areas.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.tpusfm_ccl_boundary.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.tpusfm_filter_speckles.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int32, ctypes.c_int32, ctypes.c_float, ctypes.c_int32,
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def have_native() -> bool:
    return _load() is not None


def connected_components(mask, connectivity: int = 8):
    """Label nonzero pixels. Returns (labels (H, W) int32 with 0 background,
    n_components, areas (n,) int64). Native union-find; JAX fallback."""
    m = np.ascontiguousarray(np.asarray(mask), np.uint8)
    h, w = m.shape
    lib = _load()
    if lib is not None:
        labels = np.zeros((h, w), np.int32)
        n = lib.tpusfm_ccl_label(
            m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, connectivity,
            labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        areas = np.zeros(max(n, 1), np.int64)
        lib.tpusfm_ccl_areas(
            labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), h * w, max(n, 1),
            areas.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        return labels, int(n), areas[:n]
    return _connected_components_jax(m, connectivity)


def _connected_components_jax(mask, connectivity: int = 8):
    """Pointer-jumping label propagation under jit (device fallback)."""
    import jax
    import jax.numpy as jnp

    m = jnp.asarray(mask) > 0
    h, w = m.shape
    idx = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
    labels = jnp.where(m, idx, jnp.int32(h * w))

    def min_nbr(l):
        big = jnp.int32(h * w)
        p = jnp.pad(l, 1, constant_values=big)
        cands = [l]
        shifts = [(-1, 0), (1, 0), (0, -1), (0, 1)]
        if connectivity == 8:
            shifts += [(-1, -1), (-1, 1), (1, -1), (1, 1)]
        for dy, dx in shifts:
            cands.append(p[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w])
        out = cands[0]
        for c in cands[1:]:
            out = jnp.minimum(out, c)
        return jnp.where(m, out, big)

    def step(l, _):
        l = min_nbr(l)
        flat = jnp.concatenate([l.reshape(-1), jnp.array([h * w], jnp.int32)])
        # pointer jump twice
        l = jnp.take(flat, l.reshape(-1)).reshape(h, w)
        l = jnp.take(flat, jnp.minimum(l, h * w).reshape(-1)).reshape(h, w)
        return jnp.where(m, jnp.minimum(l, h * w - 1), jnp.int32(h * w)), None

    labels, _ = jax.lax.scan(step, labels, None, length=32)
    labels = np.asarray(labels)
    mask_np = np.asarray(m)
    flat = labels[mask_np]
    uniq, inv = np.unique(flat, return_inverse=True)
    out = np.zeros((h, w), np.int32)
    out[mask_np] = inv + 1
    areas = np.bincount(inv).astype(np.int64)
    return out, len(uniq), areas


def filter_speckles(disp, valid, max_diff: float, max_size: int):
    """In the StereoBM sense: drop small connected disparity regions."""
    d = np.ascontiguousarray(np.asarray(disp), np.float32)
    v = np.ascontiguousarray(np.asarray(valid), np.uint8)
    lib = _load()
    if lib is not None:
        h, w = d.shape
        lib.tpusfm_filter_speckles(
            d.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            v.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            h, w, float(max_diff), int(max_size),
        )
        return d, v.astype(bool)
    # fallback: label quantized disparity regions and drop small ones
    labels, n, areas = connected_components(v, 4)
    if n == 0:
        return d, v.astype(bool)
    small = np.zeros(n + 1, bool)
    small[1:] = areas < max_size
    drop = small[labels]
    return d, v.astype(bool) & ~drop


def boundary(labels):
    lib = _load()
    l = np.ascontiguousarray(np.asarray(labels), np.int32)
    h, w = l.shape
    if lib is not None:
        out = np.zeros((h, w), np.uint8)
        lib.tpusfm_ccl_boundary(
            l.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), h, w,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        return out.astype(bool)
    inner = l.copy()
    pad = np.pad(l, 1, constant_values=-1)
    b = np.zeros((h, w), bool)
    for dy, dx in ((0, 1), (0, -1), (1, 0), (-1, 0)):
        b |= pad[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w] != l
    return b & (l > 0)
