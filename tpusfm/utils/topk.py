"""Exact chunked top-k that avoids a TPU windowed-topk compiler defect.

The libtpu TopkEmitter aborts (Check failed: operand.span_size.RawSize() > 0,
pipeline_emitter.cc:2741) for certain batched (n, k) combinations — measured
on this chip: (131072, 2500) and (262144, 2500) crash while neighbours
compile fine. Shapes hitting the bug are sparse and unpredictable, so large
selections go through a two-level tournament instead: per-chunk top-k over
fixed 64k-lane chunks (a batched shape family validated on chip), then one
merge top-k over the chunk winners. The result is EXACT: every global
top-k element is in its chunk's local top-k.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_CHUNK = 65536


def safe_top_k(x, k: int, chunk: int = _CHUNK):
    """lax.top_k(x, k) for 1-D x, chunked when n is large.

    Returns (values (k,), indices (k,)). Caveat vs lax.top_k: when fewer
    than k entries are finite, trailing slots hold -inf values whose indices
    can point into the internal -inf padding (i.e. >= n) — callers must
    treat slots with non-finite values as invalid rather than index with
    them. Supports vmap (the chunk stage becomes a leading batch axis)."""
    n = x.shape[-1]
    if n <= max(chunk, 2 * k):
        return jax.lax.top_k(x, k)
    j = -(-n // chunk)
    pad = j * chunk - n
    xp = jnp.concatenate([x, jnp.full(x.shape[:-1] + (pad,), -jnp.inf, x.dtype)], -1)
    xc = xp.reshape(x.shape[:-1] + (j, chunk))
    kc = min(k, chunk)
    v, i = jax.lax.top_k(xc, kc)                      # (..., j, kc)
    gi = i + (jnp.arange(j, dtype=i.dtype) * chunk)[..., :, None]
    v2, i2 = safe_top_k(v.reshape(x.shape[:-1] + (j * kc,)), k, chunk)
    idx = jnp.take_along_axis(gi.reshape(x.shape[:-1] + (j * kc,)), i2, -1)
    return v2, idx


def capped_top_k(x, k: int, kc: int = 1024, chunk: int = _CHUNK):
    """Top-k for 1-D x where at most ``kc`` of the global top-k share any one
    ``chunk``-sized window of x — exact under that density bound, much
    cheaper than safe_top_k when k is large but hits are sparse.

    Built for the SIFT candidate preselect: DoG extrema are local maxima of
    a 3x3x3 window, so their density is bounded far below kc/chunk on any
    real image (measured full-res PikaBun octave 0: 5.3k candidates over
    60.9M scores; per-64k-chunk max well under 200). A pathological input
    exceeding the bound silently drops the weakest excess candidates in the
    offending chunk. Same padded-index caveat as safe_top_k."""
    n = x.shape[-1]
    if n <= max(chunk, 2 * k) or kc >= k:
        return safe_top_k(x, k, chunk)
    j = -(-n // chunk)
    pad = j * chunk - n
    xp = jnp.concatenate([x, jnp.full(x.shape[:-1] + (pad,), -jnp.inf, x.dtype)], -1)
    xc = xp.reshape(x.shape[:-1] + (j, chunk))
    v, i = jax.lax.top_k(xc, kc)
    gi = i + (jnp.arange(j, dtype=i.dtype) * chunk)[..., :, None]
    v2, i2 = safe_top_k(v.reshape(x.shape[:-1] + (j * kc,)), k, chunk)
    idx = jnp.take_along_axis(gi.reshape(x.shape[:-1] + (j * kc,)), i2, -1)
    return v2, idx
