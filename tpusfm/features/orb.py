"""ORB detect + describe, TPU-native.

Replaces cv::ORB::create() used by the reference disparity benchmark
(/root/reference/SfM-GMS/SfM-GMS/DisparityUtil.cpp:108). FAST-9 corner test
and Harris ranking are pure VPU stencils; the 256-bit rotated-BRIEF
descriptor is packed into 8 uint32 words and matched with the Hamming
(XOR+popcount) path of tpusfm.kernels.distance.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from tpusfm.config import OrbConfig
from tpusfm.features.scalespace import gaussian_blur
from tpusfm.types import Features, Keypoints

# FAST circle of 16 offsets (radius 3), clockwise from 12 o'clock: (dy, dx)
_FAST_OFFSETS = [
    (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
]

_PATCH_R = 15  # orientation / descriptor patch radius


def _shift(img, dy, dx):
    """Shifted copy (circular; border effects are masked off downstream)."""
    return jnp.roll(jnp.roll(img, -dy, axis=0), -dx, axis=1)


def _fast_mask(img, threshold: float):
    """FAST-9 corner mask: >=9 contiguous circle pixels all brighter/darker."""
    t = threshold
    ring = jnp.stack([_shift(img, dy, dx) for dy, dx in _FAST_OFFSETS])  # (16,H,W)
    bright = (ring > img[None] + t).astype(jnp.float32)
    dark = (ring < img[None] - t).astype(jnp.float32)

    def arc9(b):
        # any length-9 circular run of ones: windowed sum over doubled axis
        bb = jnp.concatenate([b, b[:8]], axis=0)  # (24,H,W)
        c = jnp.cumsum(jnp.pad(bb, ((1, 0), (0, 0), (0, 0))), axis=0)
        win = c[9:] - c[:-9]  # (16,H,W): length-9 window sums
        return jnp.max(win, axis=0) >= 9.0

    return arc9(bright) | arc9(dark)


def _harris(img, k: float = 0.04):
    """Harris corner response (for ORB's HARRIS_SCORE ranking)."""
    dx = (_shift(img, 0, 1) - _shift(img, 0, -1)) * 0.5
    dy = (_shift(img, 1, 0) - _shift(img, -1, 0)) * 0.5
    gxx = gaussian_blur(dx * dx, 1.5)
    gyy = gaussian_blur(dy * dy, 1.5)
    gxy = gaussian_blur(dx * dy, 1.5)
    det = gxx * gyy - gxy * gxy
    tr = gxx + gyy
    return det - k * tr * tr


def _brief_pattern(n_bits: int, patch: int) -> np.ndarray:
    """Deterministic BRIEF sampling pattern: (n_bits, 4) = (y1, x1, y2, x2),
    Gaussian-distributed offsets (sigma = patch/5), clipped to the patch."""
    rng = np.random.default_rng(1234)
    sigma = patch / 5.0
    pts = rng.normal(0.0, sigma, size=(n_bits, 4))
    lim = patch // 2 - 2
    return np.clip(pts, -lim, lim).astype(np.float32)


_PATTERN = _brief_pattern(256, 2 * _PATCH_R + 1)


def _orientation_ic(img, x, y):
    """Intensity-centroid orientation over a disc of radius _PATCH_R."""
    r = _PATCH_R
    g = jnp.arange(-r, r + 1, dtype=jnp.float32)
    gu, gv = jnp.meshgrid(g, g)
    disc = (gu * gu + gv * gv) <= r * r
    from tpusfm.features.sift import _bilinear

    patch = _bilinear(img, x + gu, y + gv) * disc
    m10 = jnp.sum(patch * gu)
    m01 = jnp.sum(patch * gv)
    return jnp.arctan2(m01, m10)


@functools.lru_cache(maxsize=1)
def _steered_patterns() -> np.ndarray:
    """(30, 256, 4) int32 (dy1, dx1, dy2, dx2): the recovered cv2
    bit_pattern_31 pre-rotated at each of ORB's 30 quantized steering
    angles with cv2's cvRound integer offsets (orb.cpp rotates the pattern
    per angle bin, not per keypoint)."""
    pat = _dense_pattern()  # (256, 4): y1 x1 y2 x2
    tabs = []
    for a in range(_N_ANGLE_BINS):
        th = 2.0 * np.pi * a / _N_ANGLE_BINS
        c, s = np.cos(th), np.sin(th)
        o = np.zeros((256, 4), np.int32)
        # OpenCV: col = round(x cos - y sin), row = round(x sin + y cos)
        o[:, 0] = np.round(pat[:, 1] * s + pat[:, 0] * c)
        o[:, 1] = np.round(pat[:, 1] * c - pat[:, 0] * s)
        o[:, 2] = np.round(pat[:, 3] * s + pat[:, 2] * c)
        o[:, 3] = np.round(pat[:, 3] * c - pat[:, 2] * s)
        tabs.append(o)
    return np.stack(tabs)


def _brief_descriptors(blur, px, py, ang):
    """Steered BRIEF for (K,) integer keypoints -> (K, 8) uint32.

    cv2 semantics throughout (r5, VERDICT r4 #4 — the generated-pattern
    sparse path measured ~13 RMS worse than the recovered cv2 pattern in
    out/orb_dense_experiment.json): quantized 30-bin steering with rounded
    integer offsets and single-pixel compares on the 7x7/sigma-2 blur."""
    h, w = blur.shape
    flat = blur.reshape(-1)
    bins = jnp.mod(jnp.round(ang / (2.0 * jnp.pi / _N_ANGLE_BINS))
                   .astype(jnp.int32), _N_ANGLE_BINS)
    offs = jnp.take(jnp.asarray(_steered_patterns()), bins, axis=0)  # (K,256,4)
    xi = jnp.round(px).astype(jnp.int32)[:, None]
    yi = jnp.round(py).astype(jnp.int32)[:, None]
    y1 = jnp.clip(yi + offs[..., 0], 0, h - 1)
    x1 = jnp.clip(xi + offs[..., 1], 0, w - 1)
    y2 = jnp.clip(yi + offs[..., 2], 0, h - 1)
    x2 = jnp.clip(xi + offs[..., 3], 0, w - 1)
    v1 = jnp.take(flat, y1 * w + x1)
    v2 = jnp.take(flat, y2 * w + x2)
    bits = (v1 < v2).astype(jnp.uint32)          # (K, 256)
    words = bits.reshape(bits.shape[0], 8, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(words << shifts[None, None, :], axis=2, dtype=jnp.uint32)


_N_ANGLE_BINS = 30  # OpenCV ORB quantizes steering to 2*pi/30 steps


import os as _os

_CV_PATTERN_PATH = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                                 "_brief_pattern.npy")


def _dense_pattern():
    """(256, 4) int32 (y1, x1, y2, x2): OpenCV's bit_pattern_31, recovered
    from the cv2 binary by black-box probing (scripts/extract_brief_pattern.py,
    bit-verified ~98% on random patches); falls back to the generated
    pattern when the artifact is absent."""
    if _os.path.exists(_CV_PATTERN_PATH):
        q = np.load(_CV_PATTERN_PATH).astype(np.float32)  # (256,4) x1 y1 x2 y2
        return np.stack([q[:, 1], q[:, 0], q[:, 3], q[:, 2]], 1)
    return _PATTERN


def _cv_gauss7(x, axis):
    """cv2's GaussianBlur(7, 7, sigma=2) separable taps, REFLECT_101 pad."""
    from tpusfm.features.scalespace import conv1d_slices

    t = np.exp(-np.arange(-3, 4, dtype=np.float64) ** 2 / (2 * 4.0))
    return conv1d_slices(x, (t / t.sum()).astype(np.float32), axis,
                         mode="reflect")


@functools.partial(jax.jit, static_argnames=())
def dense_orb_descriptors(img):
    """BRIEF descriptors at EVERY pixel — the reference's dense ORB mode
    (one size-1 keypoint per pixel + orb->compute,
    /root/reference/SfM-GMS/SfM-GMS/DisparityUtil.cpp:108,125-133).

    Parity semantics (validated against cv2 in
    scripts/orb_dense_experiment.py): cv::KeyPoint leaves angle at the unset
    marker -1 and ORB::compute does NOT recompute it, so every dense
    descriptor is sampled with the pattern rotated by a fixed -1 degree;
    the image is smoothed with GaussianBlur(7,7,sigma=2,REFLECT_101) and
    single pixels of the blurred image are compared; keypoints within
    edgeThreshold=31 of the border are dropped. The 256 tests run as a
    lax.scan of two shifted-gather compares over the whole image.
    Returns ((H*W, 8) uint32 packed descriptors, (H*W,) bool validity)."""
    img = jnp.asarray(img, jnp.float32)
    h, w = img.shape
    blur = _cv_gauss7(_cv_gauss7(img, 0), 1)

    # fixed angle: -1 degree (cv2 KeyPoint default passed straight through)
    th = np.deg2rad(-1.0)
    c, sn = np.cos(th), np.sin(th)
    pat = _dense_pattern()  # (256, 4): y1 x1 y2 x2
    offs = np.zeros((256, 4), np.int32)
    # OpenCV: col = round(x cos - y sin), row = round(x sin + y cos)
    offs[:, 0] = np.round(pat[:, 1] * sn + pat[:, 0] * c)   # dy1
    offs[:, 1] = np.round(pat[:, 1] * c - pat[:, 0] * sn)   # dx1
    offs[:, 2] = np.round(pat[:, 3] * sn + pat[:, 2] * c)   # dy2
    offs[:, 3] = np.round(pat[:, 3] * c - pat[:, 2] * sn)   # dx2
    offs_j = jnp.asarray(offs)

    ys = jnp.arange(h, dtype=jnp.int32)[:, None]
    xs = jnp.arange(w, dtype=jnp.int32)[None, :]
    flat = blur.reshape(-1)

    def bit_body(acc, o):
        y1 = jnp.clip(ys + o[0], 0, h - 1)
        x1 = jnp.clip(xs + o[1], 0, w - 1)
        y2 = jnp.clip(ys + o[2], 0, h - 1)
        x2 = jnp.clip(xs + o[3], 0, w - 1)
        v1 = jnp.take(flat, y1 * w + x1)
        v2 = jnp.take(flat, y2 * w + x2)
        bit = (v1 < v2).astype(jnp.uint32)
        return acc, bit

    _, bits = jax.lax.scan(bit_body, 0, offs_j)  # (256, H, W)
    words = bits.reshape(8, 32, h * w)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    desc = jnp.sum(words << shifts[None, :, None], axis=1, dtype=jnp.uint32)  # (8, HW)

    b = 31  # cv2 ORB edgeThreshold: runByImageBorder drops these keypoints
    valid = ((ys >= b) & (ys < h - b) & (xs >= b) & (xs < w - b)).reshape(-1)
    return desc.T, valid


@functools.partial(jax.jit, static_argnames=("cfg",))
def orb_detect_and_compute(img, cfg: OrbConfig = OrbConfig()) -> Features:
    """ORB features for a grayscale image (H, W) in [0, 1].

    Returns Features with desc of dtype uint32, shape (max_features, 8).
    Match with metric="hamming".
    """
    img = jnp.asarray(img, jnp.float32)
    t = cfg.fast_threshold / 255.0

    levels = []
    cur = img
    for lvl in range(cfg.n_levels):
        h, w = cur.shape
        if min(h, w) < 4 * _PATCH_R:
            break
        levels.append((cur, cfg.scale_factor**lvl))
        nh = int(round(h / cfg.scale_factor))
        nw = int(round(w / cfg.scale_factor))
        cur = jax.image.resize(img, (nh, nw), "linear",
                               precision=jax.lax.Precision.HIGHEST)

    k_lvl = max(32, int(math.ceil(cfg.max_features / max(1, len(levels)) * 1.5)))
    xs_all, sc_all, an_all, rs_all, ds_all, mk_all = [], [], [], [], [], []
    for lvl_img, scale in levels:
        h, w = lvl_img.shape
        corners = _fast_mask(lvl_img, t)
        harris = _harris(lvl_img)
        # 3x3 NMS on harris, restricted to FAST corners, away from borders
        nms = jax.lax.reduce_window(
            harris, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
        )
        ys = jnp.arange(h)[:, None]
        xs = jnp.arange(w)[None, :]
        b = max(cfg.edge_threshold, _PATCH_R + 1)  # cv2 runByImageBorder
        interior = (ys >= b) & (ys < h - b) & (xs >= b) & (xs < w - b)
        ok = corners & (harris >= nms) & interior
        score = jnp.where(ok, harris, -jnp.inf)
        top_v, top_i = jax.lax.top_k(score.reshape(-1), k_lvl)
        valid = jnp.isfinite(top_v)
        py = (top_i // w).astype(jnp.float32)
        px = (top_i % w).astype(jnp.float32)

        # orientation from the RAW level (cv2 ICAngle), descriptors from
        # cv2's GaussianBlur(7,7,sigma=2,REFLECT_101)
        ang = jax.vmap(lambda a, b_: _orientation_ic(lvl_img, a, b_))(px, py)
        blur = _cv_gauss7(_cv_gauss7(lvl_img, 0), 1)
        desc = _brief_descriptors(blur, px, py, ang)

        xs_all.append(jnp.stack([px, py], 1) * scale)
        sc_all.append(jnp.full((k_lvl,), scale * 31.0 / 2))
        an_all.append(jnp.mod(ang, 2 * jnp.pi))
        rs_all.append(jnp.where(valid, top_v, 0.0))
        ds_all.append(desc)
        mk_all.append(valid)

    xy = jnp.concatenate(xs_all)
    sc = jnp.concatenate(sc_all)
    an = jnp.concatenate(an_all)
    rs = jnp.concatenate(rs_all)
    ds = jnp.concatenate(ds_all)
    mk = jnp.concatenate(mk_all)

    k = cfg.max_features
    svals = jnp.where(mk, rs, -jnp.inf)
    _, sel = jax.lax.top_k(svals, k)
    sel_mask = jnp.take(mk, sel) & jnp.isfinite(jnp.take(svals, sel))
    kpts = Keypoints(
        xy=jnp.where(sel_mask[:, None], jnp.take(xy, sel, axis=0), 0.0),
        scale=jnp.where(sel_mask, jnp.take(sc, sel), 0.0),
        angle=jnp.where(sel_mask, jnp.take(an, sel), 0.0),
        response=jnp.where(sel_mask, jnp.take(rs, sel), 0.0),
        mask=sel_mask,
    )
    desc = jnp.where(sel_mask[:, None], jnp.take(ds, sel, axis=0), 0)
    return Features(kpts=kpts, desc=desc.astype(jnp.uint32))
