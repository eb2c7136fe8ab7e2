"""Static-shape padding helpers (TPU tiling discipline)."""
from __future__ import annotations

import jax.numpy as jnp


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pad_axis(arr, size: int, axis: int = 0, value=0):
    """Pad ``arr`` along ``axis`` up to ``size`` with ``value``."""
    cur = arr.shape[axis]
    if cur == size:
        return arr
    if cur > size:
        raise ValueError(f"cannot pad axis {axis} from {cur} down to {size}")
    pads = [(0, 0)] * arr.ndim
    pads[axis] = (0, size - cur)
    return jnp.pad(arr, pads, constant_values=value)


def pad_to_multiple(arr, multiple: int, axis: int = 0, value=0):
    return pad_axis(arr, round_up(arr.shape[axis], multiple), axis, value)
