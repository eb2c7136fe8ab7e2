"""Strided separable triangular pooling as a Pallas halo-strip kernel.

The SIFT descriptor's spatial bilinear cell weighting, applied densely to
the 8 oriented-gradient planes (features/sift.py:_tri_pool). The XLA
slice-accumulate formulation re-reads the (8, H, W) planes once per tap
(~19 ms per octave-0 call, 3 calls per octave); this kernel streams the
planes through VMEM exactly once: per grid step it DMAs one row strip of
all 8 planes (double-buffered against compute), deinterleaves even/odd
rows (a sublane-split reshape — Mosaic rejects strided slices) so the
stride-2 vertical taps become unit-stride slices, MACs the vertical taps,
MACs the horizontal taps at full width, and writes the (8, so, W) strip;
the final column stride-2 happens outside the kernel on 2x-reduced data.

Matches features/sift.py:_tri_pool(planes, radius, stride=2) (zero-padded
borders) to f32 summation-order tolerance; used only on TPU backends, the
XLA path remains the CPU/test reference.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpusfm.utils.pad import round_up


def _kernel(plane_ref, out_ref, strip, sem, *, taps, so, si, w, wp, nc):
    j = pl.program_id(0)
    nj = pl.num_programs(0)

    def dma(slot, jj):
        return pltpu.make_async_copy(
            plane_ref.at[:, pl.ds(jj * 2 * so, si), :], strip.at[slot], sem.at[slot])

    @pl.when(j == 0)
    def _():
        dma(0, 0).start()

    @pl.when(j + 1 < nj)
    def _():
        dma((j + 1) % 2, j + 1).start()

    dma(j % 2, j).wait()

    for c in range(nc):
        s = strip[j % 2, c]
        s3 = s.reshape(si // 2, 2, wp)
        se = s3[:, 0, :]                      # even strip rows
        sodd = s3[:, 1, :]                    # odd strip rows
        # vertical: out row r (pooled row 2*(j*so+r)) <- plane rows 2r + u,
        # u in [0, 2m-2] of the strip (strip starts at plane row
        # 2*j*so - (m-1), pre-padded top by m-1). u even -> se[r + u//2],
        # u odd -> sodd[r + u//2].
        acc = None
        for u, wt in enumerate(taps):
            src = se if u % 2 == 0 else sodd
            term = jnp.float32(wt) * src[u // 2: u // 2 + so, :]
            acc = term if acc is None else acc + term
        # horizontal, full width: out col x <- acc cols x + v (left-padded
        # by m-1)
        hacc = None
        for v, wt in enumerate(taps):
            term = jnp.float32(wt) * acc[:, v: v + w]
            hacc = term if hacc is None else hacc + term
        out_ref[c] = hacc


@functools.partial(jax.jit, static_argnames=("radius", "so"))
def tri_pool_strided_pallas(planes, radius: int, so: int = 64):
    """(C, H, W) f32 planes -> (C, ceil(H/2), ceil(W/2)) pooled at stride 2.

    Equivalent to sift._tri_pool(planes, radius, stride=2).
    """
    C, H, W = planes.shape
    m = max(2, int(radius))
    taps = tuple((1.0 - abs(t - (m - 1)) / m) for t in range(2 * m - 1))
    h2 = -(-H // 2)
    nstrips = -(-h2 // so)
    si = round_up(2 * so + 2 * m - 2, 8)  # DMA rows must align to sublanes
    hp = 2 * so * nstrips + (si - 2 * so)
    wp = round_up(W + 2 * m - 2, 128)
    pp = jnp.pad(planes, ((0, 0), (m - 1, hp - H - (m - 1)),
                          (m - 1, wp - W - (m - 1))))
    out = pl.pallas_call(
        functools.partial(_kernel, taps=taps, so=so, si=si, w=W, wp=wp, nc=C),
        grid=(nstrips,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((C, so, W), lambda j: (0, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, nstrips * so, W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, C, si, wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * C * len(taps) * (h2 * W * 2),
            bytes_accessed=4 * C * (H * W + h2 * W),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(pp)
    return out[:, :h2, ::2]
