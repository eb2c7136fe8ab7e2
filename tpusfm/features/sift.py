"""SIFT detect + describe, TPU-native.

Replaces the cv::SIFT the reference leans on
(/root/reference/SfM-GMS/SfM-GMS/FeatureMatchUtil.cpp:9-12, created with
nfeatures=10000). Design notes (SURVEY.md §2.3):

* Gaussian/DoG pyramid: batched separable convs (scalespace.py), every octave
  a static shape inside one jit trace.
* Extrema: 3x3x3 ``reduce_window`` max/min over the DoG stack — pure VPU.
* Candidate selection: per-octave ``top_k`` on the thresholded |DoG| response,
  fixed capacity — no data-dependent shapes.
* Subpixel refinement: gathered 3x3x3 cubes, batched 3x3 solves (vmap), a
  fixed number of re-localization steps instead of OpenCV's while-loop.
* Orientation: 36-bin gradient histogram over a Gaussian-weighted disc,
  sampled on a fixed 17x17 grid scaled by the keypoint sigma; the classic
  [1,4,6,4,1] circular smoothing and 0.8-peak second orientation.
* Descriptor: 4x4x8 trilinear-binned histogram from a rotated 16x16 sample
  grid; normalize -> clip 0.2 -> renormalize.

Outputs are fixed-capacity `Features` (padded + mask).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from tpusfm.config import SiftConfig
from tpusfm.features import scalespace as ss
from tpusfm.types import Features, Keypoints
from tpusfm.utils.topk import capped_top_k

_BORDER = 5
_PREC = jax.lax.Precision.HIGHEST


def _extrema_mask(dog, threshold: float):
    """(L-2, H, W) bool: interior layers that are 3x3x3 extrema above thr."""
    win_max = jax.lax.reduce_window(
        dog, -jnp.inf, jax.lax.max, (3, 3, 3), (1, 1, 1),
        [(0, 0), (1, 1), (1, 1)],
    )
    win_min = jax.lax.reduce_window(
        dog, jnp.inf, jax.lax.min, (3, 3, 3), (1, 1, 1),
        [(0, 0), (1, 1), (1, 1)],
    )
    center = dog[1:-1]
    is_max = (center >= win_max) & (center > threshold)
    is_min = (center <= win_min) & (center < -threshold)
    mask = is_max | is_min
    h, w = dog.shape[1], dog.shape[2]
    ys = jnp.arange(h)
    xs = jnp.arange(w)
    border_ok = (
        (ys[:, None] >= _BORDER) & (ys[:, None] < h - _BORDER)
        & (xs[None, :] >= _BORDER) & (xs[None, :] < w - _BORDER)
    )
    return mask & border_ok[None]


def _gather_cube(dog, l, y, x):
    """3x3x3 cube around (l, y, x) from dog (L, H, W); vmapped."""
    return jax.lax.dynamic_slice(dog, (l - 1, y - 1, x - 1), (3, 3, 3))


def _derivatives(c):
    """Gradient and Hessian of a 3x3x3 cube, (x, y, s) ordering."""
    g = jnp.stack([
        (c[1, 1, 2] - c[1, 1, 0]) * 0.5,
        (c[1, 2, 1] - c[1, 0, 1]) * 0.5,
        (c[2, 1, 1] - c[0, 1, 1]) * 0.5,
    ])
    v = c[1, 1, 1]
    dxx = c[1, 1, 2] - 2 * v + c[1, 1, 0]
    dyy = c[1, 2, 1] - 2 * v + c[1, 0, 1]
    dss = c[2, 1, 1] - 2 * v + c[0, 1, 1]
    dxy = (c[1, 2, 2] - c[1, 2, 0] - c[1, 0, 2] + c[1, 0, 0]) * 0.25
    dxs = (c[2, 1, 2] - c[2, 1, 0] - c[0, 1, 2] + c[0, 1, 0]) * 0.25
    dys = (c[2, 2, 1] - c[2, 0, 1] - c[0, 2, 1] + c[0, 0, 1]) * 0.25
    H = jnp.array([[dxx, dxy, dxs], [dxy, dyy, dys], [dxs, dys, dss]])
    return g, H, v, (dxx, dyy, dxy)


_CUBE_OFFS = np.array(
    [(dl, dy, dx) for dl in (-1, 0, 1) for dy in (-1, 0, 1) for dx in (-1, 0, 1)],
    np.int32,
)


def _gather_cubes(dog, l, y, x):
    """Batch 3x3x3 cubes: (K,) indices -> (K, 3, 3, 3) via one take."""
    L, h, w = dog.shape
    offs = jnp.asarray(_CUBE_OFFS)  # (27, 3)
    flat = (
        (l[:, None] + offs[None, :, 0]) * h + (y[:, None] + offs[None, :, 1])
    ) * w + (x[:, None] + offs[None, :, 2])
    return jnp.take(dog.reshape(-1), flat, axis=0).reshape(-1, 3, 3, 3)


def _derivatives_batch(c):
    """Batched gradient/Hessian of (K, 3, 3, 3) cubes ((x, y, s) order)."""
    g = jnp.stack([
        (c[:, 1, 1, 2] - c[:, 1, 1, 0]) * 0.5,
        (c[:, 1, 2, 1] - c[:, 1, 0, 1]) * 0.5,
        (c[:, 2, 1, 1] - c[:, 0, 1, 1]) * 0.5,
    ], axis=1)
    v = c[:, 1, 1, 1]
    dxx = c[:, 1, 1, 2] - 2 * v + c[:, 1, 1, 0]
    dyy = c[:, 1, 2, 1] - 2 * v + c[:, 1, 0, 1]
    dss = c[:, 2, 1, 1] - 2 * v + c[:, 0, 1, 1]
    dxy = (c[:, 1, 2, 2] - c[:, 1, 2, 0] - c[:, 1, 0, 2] + c[:, 1, 0, 0]) * 0.25
    dxs = (c[:, 2, 1, 2] - c[:, 2, 1, 0] - c[:, 0, 1, 2] + c[:, 0, 1, 0]) * 0.25
    dys = (c[:, 2, 2, 1] - c[:, 2, 0, 1] - c[:, 0, 2, 1] + c[:, 0, 0, 1]) * 0.25
    return g, (dxx, dyy, dss, dxy, dxs, dys), v


def _solve3_newton(g, H6):
    """-H^-1 g for batched symmetric 3x3 via adjugate (no LU): (K, 3)."""
    dxx, dyy, dss, dxy, dxs, dys = H6
    a, b, cq = dxx + 1e-10, dyy + 1e-10, dss + 1e-10
    d, e, f = dxy, dxs, dys
    # symmetric H = [[a, d, e], [d, b, f], [e, f, cq]]
    A = b * cq - f * f
    B = e * f - d * cq
    C = d * f - b * e
    det = a * A + d * B + e * C
    det = jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)
    D = a * cq - e * e
    E = d * e - a * f
    F = a * b - d * d
    gx, gy, gs = g[:, 0], g[:, 1], g[:, 2]
    ox = -(A * gx + B * gy + C * gs) / det
    oy = -(B * gx + D * gy + E * gs) / det
    os_ = -(C * gx + E * gy + F * gs) / det
    return jnp.stack([ox, oy, os_], axis=1)


def _refine_batch(dog, l0, y0, x0, n_layers: int, cfg: SiftConfig):
    """Batched fixed-step subpixel localization: (K,) candidates -> refined
    (l, y, x, offset, contrast, ok). One gather + closed-form solves per
    iteration; no per-candidate vmap or LU."""
    L, h, w = dog.shape

    def clampi(l, y, x):
        return (
            jnp.clip(l, 1, L - 2),
            jnp.clip(y, _BORDER, h - 1 - _BORDER),
            jnp.clip(x, _BORDER, w - 1 - _BORDER),
        )

    l, y, x = clampi(l0, y0, x0)
    for _ in range(2):
        c = _gather_cubes(dog, l, y, x)
        g, H6, _ = _derivatives_batch(c)
        off = jnp.clip(jnp.nan_to_num(_solve3_newton(g, H6)), -1.5, 1.5)
        move = (jnp.abs(off) > 0.5).astype(jnp.int32) * jnp.sign(off).astype(jnp.int32)
        l, y, x = clampi(l + move[:, 2], y + move[:, 1], x + move[:, 0])

    c = _gather_cubes(dog, l, y, x)
    g, H6, v = _derivatives_batch(c)
    off = jnp.nan_to_num(_solve3_newton(g, H6))
    conv_ok = jnp.all(jnp.abs(off) < 0.6, axis=1)
    off = jnp.clip(off, -0.5, 0.5)
    contrast = v + 0.5 * jnp.sum(g * off, axis=1)
    contrast_ok = jnp.abs(contrast) * n_layers >= cfg.contrast_threshold
    dxx, dyy, _, dxy, _, _ = H6
    tr = dxx + dyy
    det = dxx * dyy - dxy * dxy
    r = cfg.edge_threshold
    edge_ok = (det > 0) & (tr * tr * r < (r + 1) * (r + 1) * det)
    return l, y, x, off, contrast, conv_ok & contrast_ok & edge_ok


def _refine(dog, l0, y0, x0, n_layers: int, cfg: SiftConfig):
    """Fixed-step subpixel localization of one candidate. Returns
    (l, y, x, offset (3,), value, edge_ok, conv_ok)."""
    L, h, w = dog.shape

    def clampi(l, y, x):
        return (
            jnp.clip(l, 1, L - 2),
            jnp.clip(y, _BORDER, h - 1 - _BORDER),
            jnp.clip(x, _BORDER, w - 1 - _BORDER),
        )

    def step(carry, _):
        l, y, x = carry
        c = _gather_cube(dog, l, y, x)
        g, H, _, _ = _derivatives(c)
        Hr = H + jnp.eye(3) * 1e-10
        off = -jnp.linalg.solve(Hr, g)
        off = jnp.clip(jnp.nan_to_num(off), -1.5, 1.5)
        move = (jnp.abs(off) > 0.5).astype(jnp.int32) * jnp.sign(off).astype(jnp.int32)
        nl, ny, nx = clampi(l + move[2], y + move[1], x + move[0])
        return (nl, ny, nx), None

    (l, y, x), _ = jax.lax.scan(step, clampi(l0, y0, x0), None, length=2)
    c = _gather_cube(dog, l, y, x)
    g, H, v, (dxx, dyy, dxy) = _derivatives(c)
    Hr = H + jnp.eye(3) * 1e-10
    off = -jnp.linalg.solve(Hr, g)
    off = jnp.nan_to_num(off)
    conv_ok = jnp.all(jnp.abs(off) < 0.6)
    off = jnp.clip(off, -0.5, 0.5)
    contrast = v + 0.5 * jnp.dot(g, off)
    contrast_ok = jnp.abs(contrast) * n_layers >= cfg.contrast_threshold
    tr = dxx + dyy
    det = dxx * dyy - dxy * dxy
    r = cfg.edge_threshold
    edge_ok = (det > 0) & (tr * tr * r < (r + 1) * (r + 1) * det)
    return l, y, x, off, contrast, conv_ok & contrast_ok & edge_ok


def _bilinear(img, x, y):
    """Bilinear sample of (H, W) at float coords, clamped."""
    h, w = img.shape
    x = jnp.clip(x, 0.0, w - 1.001)
    y = jnp.clip(y, 0.0, h - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    dx = x - x0
    dy = y - y0
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    return (v00 * (1 - dx) + v01 * dx) * (1 - dy) + (v10 * (1 - dx) + v11 * dx) * dy


def _nearest2(imga, imgb, x, y):
    """Nearest-pixel sample of two same-shape maps at float coords.

    One rounded gather per map instead of four — the orientation/descriptor
    sample grids are denser than the pixel grid, so nearest sampling costs
    little accuracy and dominates the TPU gather budget."""
    h, w = imga.shape
    xi = jnp.clip(jnp.round(x).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(jnp.round(y).astype(jnp.int32), 0, h - 1)
    return imga[yi, xi], imgb[yi, xi]


_ORI_GRID = 4  # half-width of the (2g+1)^2 orientation sample grid


def _orientation(dx_maps, dy_maps, layer, x, y, sigma, cfg: SiftConfig):
    """Dominant orientation(s) from a 36-bin weighted gradient histogram.

    Returns (angle1, angle2, second_valid)."""
    nbins = cfg.n_orientation_bins
    radius = 3.0 * 1.5 * sigma
    g = jnp.arange(-_ORI_GRID, _ORI_GRID + 1, dtype=jnp.float32) / _ORI_GRID
    gu, gv = jnp.meshgrid(g, g)
    sx = x + gu * radius
    sy = y + gv * radius
    gx, gy = _nearest2(dx_maps[layer], dy_maps[layer], sx, sy)
    mag = jnp.sqrt(gx * gx + gy * gy)
    wgt = jnp.exp(-(gu * gu + gv * gv) * (radius ** 2) / (2.0 * (1.5 * sigma) ** 2))
    ang = jnp.arctan2(gy, gx)  # [-pi, pi]
    binf = (ang / (2 * jnp.pi)) * nbins
    bini = jnp.mod(jnp.round(binf).astype(jnp.int32), nbins)
    hist = jnp.zeros((nbins,)).at[bini.reshape(-1)].add((mag * wgt).reshape(-1))
    # circular [1,4,6,4,1]/16 smoothing
    for _ in range(2):
        hist = (
            jnp.roll(hist, 1) * 0.25 + hist * 0.5 + jnp.roll(hist, -1) * 0.25
        )
    peak = jnp.max(hist)
    b1 = jnp.argmax(hist)

    def interp_angle(b):
        l = hist[jnp.mod(b - 1, nbins)]
        c = hist[b]
        rr = hist[jnp.mod(b + 1, nbins)]
        denom = l - 2 * c + rr
        delta = jnp.where(jnp.abs(denom) > 1e-12, 0.5 * (l - rr) / denom, 0.0)
        delta = jnp.clip(delta, -0.5, 0.5)
        return jnp.mod((b + delta) / nbins * 2 * jnp.pi, 2 * jnp.pi)

    # second peak: local max >= 0.8 * peak, not the main bin
    is_loc = (hist >= jnp.roll(hist, 1)) & (hist >= jnp.roll(hist, -1))
    cand = jnp.where(
        is_loc & (jnp.arange(nbins) != b1), hist, -1.0
    )
    b2 = jnp.argmax(cand)
    second_valid = cand[b2] >= cfg.orientation_peak_ratio * peak
    return interp_angle(b1), interp_angle(b2), second_valid


_DESC_S = 16  # descriptor sample grid (16x16)


def _descriptor(dx_maps, dy_maps, layer, x, y, sigma, angle, cfg: SiftConfig):
    """128-D SIFT descriptor via trilinear soft-binning of a rotated grid."""
    d = cfg.descriptor_width
    n = cfg.descriptor_bins
    hist_width = cfg.descriptor_scale_factor * sigma  # one cell = 3 sigma
    # sample coords in cell units, covering [-d/2, d/2)
    g = (jnp.arange(_DESC_S, dtype=jnp.float32) + 0.5) / _DESC_S * d - d / 2
    cu, cv = jnp.meshgrid(g, g)  # (S, S) cell-unit coords
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    # rotate to image frame, scale by cell width
    ox = (cu * ca - cv * sa) * hist_width
    oy = (cu * sa + cv * ca) * hist_width
    gx, gy = _nearest2(dx_maps[layer], dy_maps[layer], x + ox, y + oy)
    mag = jnp.sqrt(gx * gx + gy * gy)
    wgt = jnp.exp(-(cu * cu + cv * cv) / (0.5 * d * d))
    theta = jnp.mod(jnp.arctan2(gy, gx) - angle, 2 * jnp.pi)
    obin = theta / (2 * jnp.pi) * n

    # trilinear binning: cell coords shifted so bins are at centers
    ubin = cu + d / 2 - 0.5
    vbin = cv + d / 2 - 0.5
    u0 = jnp.floor(ubin).astype(jnp.int32)
    v0 = jnp.floor(vbin).astype(jnp.int32)
    o0 = jnp.floor(obin).astype(jnp.int32)
    fu = ubin - u0
    fv = vbin - v0
    fo = obin - o0

    w = mag * wgt
    flat_hist = jnp.zeros((d * d * n + 1,))
    for du in (0, 1):
        for dv in (0, 1):
            for do in (0, 1):
                uu = u0 + du
                vv = v0 + dv
                oo = jnp.mod(o0 + do, n)
                wc = (
                    w
                    * (fu if du else 1 - fu)
                    * (fv if dv else 1 - fv)
                    * (fo if do else 1 - fo)
                )
                ok = (uu >= 0) & (uu < d) & (vv >= 0) & (vv < d)
                idx = jnp.where(ok, (vv * d + uu) * n + oo, d * d * n)
                flat_hist = flat_hist.at[idx.reshape(-1)].add(
                    jnp.where(ok, wc, 0.0).reshape(-1)
                )
    desc = flat_hist[:-1]
    norm = jnp.maximum(jnp.linalg.norm(desc), 1e-6)
    desc = jnp.minimum(desc / norm, cfg.descriptor_clip)
    norm = jnp.maximum(jnp.linalg.norm(desc), 1e-6)
    return desc / norm


_N_PLANES = 8


def _oriented_planes(dx, dy):
    """Soft-bin gradient magnitude into 8 orientation planes: (8, H, W).

    Channels-FIRST on purpose: the pooling cumsums and pads that follow are
    elementwise over the trailing axes, and TPU vector lanes cover the minor
    dimension — a (H, W, 8) layout runs them at 8/128 lane utilization,
    (8, H, W) at full width (measured ~2x total octave-program speedup)."""
    mag = jnp.sqrt(dx * dx + dy * dy)
    ang = jnp.arctan2(dy, dx)
    binf = jnp.mod(ang, 2 * jnp.pi) / (2 * jnp.pi) * _N_PLANES
    b0 = jnp.floor(binf).astype(jnp.int32)
    f = binf - b0
    planes = []
    for o in range(_N_PLANES):
        w = jnp.where(b0 == o, 1.0 - f, 0.0) + jnp.where(
            jnp.mod(b0 + 1, _N_PLANES) == o, f, 0.0
        )
        planes.append(mag * w)
    return jnp.stack(planes, axis=0)


def _tri_pool(planes, radius: int):
    """Separable triangular pooling of (C, H, W): the spatial bilinear cell
    weighting of the SIFT descriptor, applied once densely instead of per
    keypoint sample.

    Implemented as a separable depthwise convolution with STATIC triangular
    taps (length 2m-1, peak 1): on TPU a grouped conv maps straight onto the
    vector units, while the O(N) cumsum box-pair formulation — despite fewer
    FLOPs — lowers to log-N scan passes plus relayouts and measured 28 ms
    per call on the bench octave (scripts/micro_sift.py) vs ~1 ms for the
    conv. FLOPs are tiny either way; passes over HBM are what count.

    On the big octaves the caller aggregates the gradient field to the half
    grid first (_lp_decimate2) and pools at half radius — a Pallas
    halo-strip pool over full-res planes was tried and measured 4x slower
    than this XLA form (r5; the strided work is the cost, not HBM)."""
    m = max(2, int(radius))
    taps = 1.0 - np.abs(np.arange(-(m - 1), m, dtype=np.float32)) / m
    x = ss.conv1d_slices(planes, taps, 1, mode="constant")
    return ss.conv1d_slices(x, taps, 2, mode="constant")


_LP3 = np.array([0.25, 0.5, 0.25], np.float32)


def _lp_decimate2(x):
    """Centered [1,2,1]/4 low-pass + stride-2 decimate, both axes of (H, W)."""
    x = ss.decimate2(ss.conv1d_slices(x, _LP3, 0, mode="constant"), 0)
    return ss.decimate2(ss.conv1d_slices(x, _LP3, 1, mode="constant"), 1)


def _grad2d(img):
    """Central-difference gradients of one (H, W) layer, zero borders."""
    zc = jnp.zeros_like(img[:, :1])
    dx = jnp.concatenate([zc, (img[:, 2:] - img[:, :-2]) * 0.5, zc], axis=1)
    zr = jnp.zeros_like(img[:1, :])
    dy = jnp.concatenate([zr, (img[2:, :] - img[:-2, :]) * 0.5, zr], axis=0)
    return dx, dy


# pooled planes switch to half-res sampling above this pixel count (the two
# big octaves of a full-res run; small octaves and CPU-test images keep
# exact full-res pooling)
_POOL_STRIDE_MIN_PX = 1 << 21


def _take2d(P, sx, sy):
    """Nearest-neighbor gather from ONE layer's planes (C, H, W).

    sx, sy: (K, S) float coords -> (K, S, C). Used by the layer-streamed
    fast path: gathering per layer lets XLA free each layer's pooled planes
    immediately, so peak HBM is one (B, 8, H, W) tensor instead of the full
    (B, L, 8, H, W) stack.

    Gather layout: the table is cast to bf16 and transposed to (H*W, C),
    then gathered by ROW. The bf16 row gather hits a fast TPU lowering that
    the f32 one misses entirely: 0.67 ms vs 64 ms for 90k rows from a
    762k-row table (measured r5; the f32 row form was itself the best of
    r4's options at 24 ms for 250k rows). Pooled-plane values feed
    soft-binned, normalized, clipped descriptors, so bf16's ~0.4%
    quantization is far below the descriptor's own discretization."""
    C, h, w = P.shape
    xi = jnp.clip(jnp.round(sx).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(jnp.round(sy).astype(jnp.int32), 0, h - 1)
    k, s = sx.shape
    table = P.astype(jnp.bfloat16).reshape(C, h * w).T
    rows = jnp.take(table, (yi * w + xi).reshape(-1), axis=0)
    return rows.reshape(k, s, C).astype(jnp.float32)


_ORI_TAPS = np.array([(u, v) for v in (-1.0, 0.0, 1.0) for u in (-1.0, 0.0, 1.0)],
                     np.float32)
_ORI_W = np.exp(-(_ORI_TAPS[:, 0] ** 2 + _ORI_TAPS[:, 1] ** 2) / 2.0).astype(np.float32)


def _ori_offsets(x, y, sigma):
    """Orientation sample coords: (K,) -> (sx, sy) each (K, 9)."""
    r = (1.5 * sigma)[:, None]
    return (
        x[:, None] + jnp.asarray(_ORI_TAPS[:, 0])[None] * r,
        y[:, None] + jnp.asarray(_ORI_TAPS[:, 1])[None] * r,
    )


def _orientations_from_samples(S, cfg: SiftConfig):
    """Angles from gathered orientation samples S (K, 9, 8)."""
    n = _N_PLANES
    hist = jnp.sum(S * jnp.asarray(_ORI_W)[None, :, None], axis=1)  # (K, 8)
    hist = jnp.roll(hist, 1, 1) * 0.25 + hist * 0.5 + jnp.roll(hist, -1, 1) * 0.25

    def pick(M, b):
        # M[k, b[k]] via one-hot sum (take_along_axis lowers poorly on TPU)
        oh = jnp.arange(n)[None] == b[:, None]
        return jnp.sum(jnp.where(oh, M, 0.0), axis=1)

    def interp(b):
        l_ = pick(hist, jnp.mod(b - 1, n))
        c = pick(hist, b)
        rr = pick(hist, jnp.mod(b + 1, n))
        den = l_ - 2 * c + rr
        d = jnp.where(jnp.abs(den) > 1e-12, 0.5 * (l_ - rr) / den, 0.0)
        return jnp.mod((b + jnp.clip(d, -0.5, 0.5)) / n * 2 * jnp.pi, 2 * jnp.pi)

    b1 = jnp.argmax(hist, axis=1)
    is_loc = (hist >= jnp.roll(hist, 1, 1)) & (hist >= jnp.roll(hist, -1, 1))
    cand = jnp.where(is_loc & (jnp.arange(n)[None] != b1[:, None]), hist, -1.0)
    b2 = jnp.argmax(cand, axis=1)
    peak2 = pick(cand, b2)
    second = peak2 >= cfg.orientation_peak_ratio * jnp.max(hist, axis=1)
    return interp(b1), interp(b2), second


# static 4x4 cell-center grid in cell units and its Gaussian window weights
_CELLS = np.array([(u, v) for v in (-1.5, -0.5, 0.5, 1.5) for u in (-1.5, -0.5, 0.5, 1.5)],
                  np.float32)
_CELL_W = np.exp(-(_CELLS[:, 0] ** 2 + _CELLS[:, 1] ** 2) / 8.0).astype(np.float32)


def _desc_offsets(x, y, sigma, angle, cfg: SiftConfig):
    """Rotated 4x4 cell-center sample coords: (K,) -> (sx, sy) each (K, 16)."""
    cell = (cfg.descriptor_scale_factor * sigma)[:, None]
    ca = jnp.cos(angle)[:, None]
    sa = jnp.sin(angle)[:, None]
    cu = jnp.asarray(_CELLS[:, 0])[None]
    cv = jnp.asarray(_CELLS[:, 1])[None]
    return (
        x[:, None] + (cu * ca - cv * sa) * cell,
        y[:, None] + (cu * sa + cv * ca) * cell,
    )


def _descriptors_from_samples(S, angle, cfg: SiftConfig):
    """Descriptors from gathered cell samples S (K, 16, 8): orientation bins
    circularly shifted by the keypoint angle, Gaussian cell window,
    normalize -> clip -> renormalize. -> (K, 128)."""
    n = _N_PLANES
    # rotate orientation bins: descriptor bin k = absolute bin (k + shift).
    # Selected from n static rolls by per-keypoint mask — take_along_axis
    # on the tiny minor axis lowers pathologically on TPU (49 ms of the r4
    # octave-0 program was this rotation).
    shift = angle / (2 * jnp.pi) * n
    s0 = jnp.floor(shift).astype(jnp.int32)
    f = (shift - s0)[:, None, None]
    s0 = jnp.mod(s0, n)
    D0 = jnp.zeros_like(S)
    D1 = jnp.zeros_like(S)
    for r in range(n):
        m = (s0 == r)[:, None, None]
        D0 = jnp.where(m, jnp.roll(S, -r, axis=2), D0)
        D1 = jnp.where(m, jnp.roll(S, -(r + 1), axis=2), D1)
    D = D0 * (1.0 - f) + D1 * f
    D = D * jnp.asarray(_CELL_W)[None, :, None]
    desc = D.reshape(D.shape[0], -1)
    norm = jnp.maximum(jnp.linalg.norm(desc, axis=1, keepdims=True), 1e-6)
    desc = jnp.minimum(desc / norm, cfg.descriptor_clip)
    norm = jnp.maximum(jnp.linalg.norm(desc, axis=1, keepdims=True), 1e-6)
    return desc / norm


def _select_octave(dog, k_oct: int, cfg: SiftConfig):
    """Candidate selection + subpixel refinement for one octave.

    Returns (fx, fy, fl, contrast, ok) — refined float coords/layer and the
    validity mask, all capacity k_oct."""
    n_layers = cfg.n_octave_layers
    L, h, w = dog.shape
    thr = 0.5 * cfg.contrast_threshold / n_layers

    ext = _extrema_mask(dog, thr)  # (L-2, h, w)
    score = jnp.where(ext, jnp.abs(dog[1:-1]), -1.0)
    # Layer-argmax reduce before top-k: keep each pixel's best layer only
    # (same-pixel multi-layer extrema need layers >= 2 apart — measured
    # absent on the bundled full-res images), shrinking the top-k domain
    # L-2 times; then a density-capped chunked top-k replaces the full
    # safe_top_k tournament (octave 0: 44 -> 14 ms, scripts/topk_probe.py).
    win = score[0]
    win_l = jnp.zeros((h, w), jnp.int32)
    for l in range(1, score.shape[0]):
        take = score[l] > win
        win = jnp.where(take, score[l], win)
        win_l = jnp.where(take, l, win_l)
    top_v, pix_i = capped_top_k(win.reshape(-1), k_oct)
    cand_valid = top_v > 0
    pix_i = jnp.minimum(pix_i, h * w - 1)  # -inf slots may carry padded idx
    li = jnp.take(win_l.reshape(-1), pix_i) + 1
    yi = pix_i // w
    xi = pix_i % w

    l, y, x, off, contrast, ok = _refine_batch(dog, li, yi, xi, n_layers, cfg)
    ok = ok & cand_valid

    fx = x.astype(jnp.float32) + off[:, 0]
    fy = y.astype(jnp.float32) + off[:, 1]
    fl = l.astype(jnp.float32) + off[:, 2]
    return fx, fy, fl, contrast, ok


def _describe_octave(gauss, fx, fy, fl, contrast, ok,
                     octave_scale: float, cfg: SiftConfig):
    """Orientation + descriptors for refined candidates of one octave.

    Returns padded per-octave arrays (xy_abs, sigma_abs, angle, response,
    desc, mask) with capacity 2*k_oct. Runs as its OWN program: fusing it
    with _select_octave into one XLA program measured ~2x slower than the
    two dispatched back-to-back (the whole-program scheduler pessimizes the
    gather/pool mix; dispatches pipeline at ~2 ms)."""
    n_layers = cfg.n_octave_layers
    h, w = gauss.shape[-2:]
    sigma_oct = cfg.sigma * 2.0 ** (fl / n_layers)  # in octave pixel units

    layer_idx = jnp.clip(jnp.round(fl).astype(jnp.int32), 1, n_layers)

    if cfg.fast_descriptor:
        # Dense oriented-gradient planes per layer, pooled ONCE per layer and
        # shared by the orientation and descriptor passes (when their radii
        # coincide, the default): descriptors and orientations become a
        # handful of vector gathers per keypoint. The layers are STREAMED —
        # gradients, planes and pooled planes are built per layer, gathered
        # for ALL keypoints, masked by layer id, then freed; each layer's
        # angles are computed inside the loop so the descriptor gathers can
        # happen in the same iteration while the pool is live. On the big
        # octaves the pool is subsampled 2x (_tri_pool stride) — half-res
        # tables quarter the pool writes and gather-table transposes.
        li0 = layer_idx - 1
        kN = fx.shape[0]
        two = lambda v: jnp.concatenate([v, v])
        li2 = two(li0)
        stride = 2 if h * w >= _POOL_STRIDE_MIN_PX else 1
        inv = 1.0 / stride
        sx_o, sy_o = _ori_offsets(fx, fy, sigma_oct)
        a1 = jnp.zeros((kN,), jnp.float32)
        a2 = jnp.zeros((kN,), jnp.float32)
        second = jnp.zeros((kN,), bool)
        S_d = jnp.zeros((2 * kN, _CELLS.shape[0], _N_PLANES), jnp.float32)
        ang12_sel = jnp.zeros((2 * kN,), jnp.float32)
        for l in range(n_layers):
            sigma_l = cfg.sigma * 2.0 ** ((l + 1) / n_layers)
            r_ori = int(round(3.0 * sigma_l))
            r_desc = int(round(cfg.descriptor_scale_factor * sigma_l))
            dx, dy = _grad2d(gauss[l + 1])
            if stride > 1:
                # aggregate the gradient FIELD to the half grid ([1,2,1]/4
                # low-pass + decimate per axis) before binning: quarters the
                # atan2/plane work and smooths 2 maps instead of 8. The 1 px
                # pre-smoothing is far inside the 3*sigma (>= 6 px) pooling
                # radius of the layers that take this path.
                dx, dy = _lp_decimate2(dx), _lp_decimate2(dy)
                r_ori = max(2, (r_ori + 1) // 2)
                r_desc = max(2, (r_desc + 1) // 2)
            planes = _oriented_planes(dx, dy)
            P_ori = _tri_pool(planes, r_ori)
            P_desc = P_ori if r_desc == r_ori else _tri_pool(planes, r_desc)
            sel = li0 == l
            a1_l, a2_l, sec_l = _orientations_from_samples(
                _take2d(P_ori, sx_o * inv, sy_o * inv), cfg)
            a1 = jnp.where(sel, a1_l, a1)
            a2 = jnp.where(sel, a2_l, a2)
            second = jnp.where(sel, sec_l, second)
            ang12_l = jnp.concatenate([a1_l, a2_l])
            sx_d, sy_d = _desc_offsets(two(fx), two(fy), two(sigma_oct),
                                       ang12_l, cfg)
            sel2 = (li2 == l)[:, None, None]
            S_d = jnp.where(sel2, _take2d(P_desc, sx_d * inv, sy_d * inv), S_d)
            ang12_sel = jnp.where(li2 == l, ang12_l, ang12_sel)
        d12 = _descriptors_from_samples(S_d, ang12_sel, cfg)
        d1, d2 = d12[:kN], d12[kN:]
    else:
        dx_maps, dy_maps = ss.gradients(gauss)
        a1, a2, second = jax.vmap(
            lambda li_, xx, yy, ss_: _orientation(dx_maps, dy_maps, li_, xx, yy, ss_, cfg)
        )(layer_idx, fx, fy, sigma_oct)

        desc_fn = jax.vmap(
            lambda li_, xx, yy, ss_, aa: _descriptor(dx_maps, dy_maps, li_, xx, yy, ss_, aa, cfg)
        )
        d1 = desc_fn(layer_idx, fx, fy, sigma_oct, a1)
        d2 = desc_fn(layer_idx, fx, fy, sigma_oct, a2)

    xy = jnp.stack([fx, fy], axis=1) * octave_scale
    sig = sigma_oct * octave_scale
    resp = jnp.abs(contrast)

    xy_all = jnp.concatenate([xy, xy])
    sig_all = jnp.concatenate([sig, sig])
    ang_all = jnp.concatenate([a1, a2])
    resp_all = jnp.concatenate([resp, resp])
    desc_all = jnp.concatenate([d1, d2])
    mask_all = jnp.concatenate([ok, ok & second])
    return xy_all, sig_all, ang_all, resp_all, desc_all, mask_all


@functools.partial(jax.jit, static_argnames=("cfg",))
def _prepare_base(img, cfg: SiftConfig):
    """Base image for octave 0; accepts (H, W) or a (B, H, W) batch."""
    img = jnp.asarray(img, jnp.float32)
    h, w = img.shape[-2:]
    if cfg.upsample:
        # exact same weights as jax.image.resize "linear" but as shift-adds
        # (f32 throughout, so the DoG precision discipline holds); resize's
        # dense-matmul lowering at HIGHEST was the single biggest cost of
        # full-res SIFT (~1.4 s/img, scripts/sift_stage_probe.py)
        base = ss.upsample2_linear(img)
        init_blur = 1.0  # assumed 0.5 blur, doubled by upsampling
    else:
        base = img
        init_blur = 0.5
    inc = math.sqrt(max(cfg.sigma**2 - init_blur**2, 0.01))
    return ss.gaussian_blur(base, inc)


@functools.partial(jax.jit, static_argnames=("n_oct", "cfg"))
def _octave_bases(base, n_oct: int, cfg: SiftConfig):
    """All octave base images in ONE program (the only inherently sequential
    part of the pyramid — cheap convs + downsamples)."""
    # each next base: blur sigma -> 2*sigma (i.e. add sigma*sqrt(3)), decimate
    down_sigma = cfg.sigma * math.sqrt(3.0)
    bases = [base]
    cur = base
    for _ in range(n_oct - 1):
        cur = ss.downsample2(ss.gaussian_blur(cur, down_sigma))
        bases.append(cur)
    return bases


def _octave_select_impl(base_o, k_oct: int, cfg: SiftConfig):
    def one(b):
        gauss, dog = ss.build_octave(b, cfg.sigma, cfg.n_octave_layers)
        # next octave's base comes free: level n_layers is at blur 2*sigma,
        # decimated it is the next base at sigma (replaces the standalone
        # blur+downsample bases chain, ~49 ms of the r4 pipeline)
        nxt = ss.downsample2(gauss[cfg.n_octave_layers])
        return (gauss, nxt) + _select_octave(dog, k_oct, cfg)

    if base_o.ndim == 2:
        return one(base_o)
    return jax.vmap(one)(base_o)


def _describe_impl(gauss, fx, fy, fl, contrast, ok,
                   octave_scale: float, cfg: SiftConfig):
    if gauss.ndim == 3:
        return _describe_octave(gauss, fx, fy, fl, contrast, ok,
                                octave_scale, cfg)
    return jax.vmap(
        lambda g, a, b, c, d, e: _describe_octave(g, a, b, c, d, e,
                                                  octave_scale, cfg)
    )(gauss, fx, fy, fl, contrast, ok)


def _octave_detect_impl(base_o, octave_scale: float, k_oct: int, cfg: SiftConfig):
    """Fused single-program octave (used for the small pyramid tail).

    Returns (octave outputs, next octave base)."""
    gauss, nxt, fx, fy, fl, contrast, ok = _octave_select_impl(base_o, k_oct, cfg)
    return _describe_impl(gauss, fx, fy, fl, contrast, ok, octave_scale, cfg), nxt


@functools.partial(jax.jit, static_argnames=("k_oct", "cfg"))
def _octave_select(base_o, k_oct: int, cfg: SiftConfig):
    """Pyramid + extrema + top-k + refine for one big octave, as its OWN jit.

    The big octaves run as TWO programs (select, then describe): XLA's
    whole-program scheduling of the fused octave measured ~2x the sum of
    the two halves dispatched back-to-back (r5; dispatches pipeline at
    ~2 ms on the tunneled backend, so the extra dispatch is free).

    Accepts (H, W) or a (B, H, W) batch (vmapped: batching amortizes the
    many small latency-bound ops across images)."""
    return _octave_select_impl(base_o, k_oct, cfg)


@functools.partial(jax.jit, static_argnames=("octave_scale", "cfg"))
def _octave_describe(gauss, fx, fy, fl, contrast, ok,
                     octave_scale: float, cfg: SiftConfig):
    """Orientation + descriptor program for one big octave (see
    _octave_select)."""
    return _describe_impl(gauss, fx, fy, fl, contrast, ok, octave_scale, cfg)


@functools.partial(jax.jit, static_argnames=("n_oct", "cfg"))
def _prepare_and_bases(img, n_oct: int, cfg: SiftConfig):
    """Base upsample/blur + all octave bases in ONE program (kept for the
    stage probes; the product path derives each next base from the previous
    octave's gauss stack instead)."""
    base = _prepare_base.__wrapped__(img, cfg)
    return _octave_bases.__wrapped__(base, n_oct, cfg)


@functools.partial(jax.jit, static_argnames=("scales", "k_octs", "cfg", "k"))
def _tail_and_merge(base, o0, o1, scales: tuple, k_octs: tuple,
                    cfg: SiftConfig, k: int) -> Features:
    """Small-octave tail + cross-octave top-k merge in ONE program: each
    small-octave program would cost a dispatch for sub-millisecond compute,
    and the merge is a single top_k + gathers. Octave bases chain inside
    the program (next base = decimated gauss level n_layers)."""
    outs = [o0, o1]
    cur = base
    for s, kk in zip(scales, k_octs):
        out, cur = _octave_detect_impl(cur, s, kk, cfg)
        outs.append(out)
    return _merge_octaves.__wrapped__(outs, k)


def sift_detect_and_compute(img, cfg: SiftConfig = SiftConfig()) -> Features:
    """SIFT keypoints + descriptors for grayscale image(s) in [0, 1].

    Accepts (H, W) for one image or (B, H, W) for a batch (all outputs gain
    a leading B axis). Equivalent of SIFTDetectAndCompute
    (/root/reference/SfM-GMS/SfM-GMS/FeatureMatchUtil.cpp:9-12).
    Structured as a shallow program DAG: base prep -> per-octave select /
    describe program pairs chained by decimated bases -> fused tail+merge,
    so multiple images pipeline through the device back-to-back."""
    base_scale = 0.5 if cfg.upsample else 1.0
    h0, w0 = img.shape[-2:]
    h = h0 * 2 if cfg.upsample else h0
    w = w0 * 2 if cfg.upsample else w0
    n_oct = ss.num_octaves(h, w, cfg.max_octaves)
    n_oct = min(n_oct, 1 + max(0, int(math.log2(min(h, w) / (4 * _BORDER)))))

    plan = []
    ho, wo = h, w
    for o in range(n_oct):
        if min(ho, wo) < 4 * _BORDER:
            break
        # candidate budget shrinks with octave area: higher octaves have
        # ~4x fewer pixels, so a uniform budget would waste gather bandwidth
        # (clamped to the octave's candidate count so top_k stays well-formed)
        k_oct = min(max(32, cfg.max_features >> o), cfg.n_octave_layers * ho * wo)
        plan.append((base_scale * (2.0 ** o), k_oct))
        ho, wo = -(-ho // 2), -(-wo // 2)

    base = _prepare_base(img, cfg)
    outs = []
    for s, k in plan[:2]:
        gauss, base, fx, fy, fl, contrast, ok = _octave_select(base, k, cfg)
        outs.append(_octave_describe(gauss, fx, fy, fl, contrast, ok, s, cfg))
    if len(plan) > 2:
        tail = plan[2:]
        return _tail_and_merge(
            base, outs[0], outs[1],
            tuple(s for s, _ in tail),
            tuple(k for _, k in tail),
            cfg, cfg.max_features,
        )

    return _merge_octaves(outs, cfg.max_features)


@functools.partial(jax.jit, static_argnames=("k",))
def _merge_octaves(outs, k: int) -> Features:
    def merge(*outs):
        xy = jnp.concatenate([o[0] for o in outs])
        sig = jnp.concatenate([o[1] for o in outs])
        ang = jnp.concatenate([o[2] for o in outs])
        resp = jnp.concatenate([o[3] for o in outs])
        desc = jnp.concatenate([o[4] for o in outs])
        mask = jnp.concatenate([o[5] for o in outs])

        score = jnp.where(mask, resp, -1.0)
        _, sel = jax.lax.top_k(score, k)
        sel_mask = jnp.take(mask, sel) & (jnp.take(score, sel) > 0)

        kpts = Keypoints(
            xy=jnp.where(sel_mask[:, None], jnp.take(xy, sel, axis=0), 0.0),
            scale=jnp.where(sel_mask, jnp.take(sig, sel), 0.0),
            angle=jnp.where(sel_mask, jnp.take(ang, sel), 0.0),
            response=jnp.where(sel_mask, jnp.take(resp, sel), 0.0),
            mask=sel_mask,
        )
        return Features(
            kpts=kpts,
            desc=jnp.where(sel_mask[:, None], jnp.take(desc, sel, axis=0), 0.0),
        )

    if outs[0][0].ndim == 3:  # batched: (B, 2K_oct, ...) per octave
        return jax.vmap(merge)(*outs)
    return merge(*outs)
