"""Chessboard corner detection + subpixel refinement.

Replaces cv::findChessboardCorners + cv::cornerSubPix
(/root/reference/SfM-GMS/SfM-GMS/CalibrationUtil.cpp:26,35-37; 6x9 inner
corners, main.h:45). Split TPU/host:

* X-corner (saddle) response + 3x3 NMS + top-k and the gradient-based
  subpixel solve are vectorized JAX (device),
* lattice ordering of the detected corners into a (rows, cols) grid is a
  tiny greedy-growth graph walk on <=200 points (host numpy) — sub-ms work
  with data-dependent control flow that has no business being on the TPU.

The per-image labeling need not share an orientation across images: each
view gets independent extrinsics in calibration, so any self-consistent
grid ordering is valid.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpusfm.features.scalespace import gaussian_blur

_RING_R = 5
_RING_N = 16


def _ring_offsets():
    th = np.arange(_RING_N) * 2 * np.pi / _RING_N
    return np.stack([np.round(_RING_R * np.cos(th)), np.round(_RING_R * np.sin(th))]).T.astype(int)


@functools.partial(jax.jit, static_argnames=("max_corners",))
def _corner_candidates(img, max_corners: int = 256):
    """ChESS-style X-corner response -> NMS -> top-k candidates."""
    g = gaussian_blur(jnp.asarray(img, jnp.float32), 1.5)
    # ring samples via static shifts
    rs = []
    for dy, dx in _ring_offsets():
        rs.append(jnp.roll(jnp.roll(g, -int(dy), 0), -int(dx), 1))
    ring = jnp.stack(rs)  # (16, H, W)
    # sum response: opposite samples agree, quadrature samples differ
    sr = jnp.zeros_like(g)
    for i in range(_RING_N // 2):
        sr = sr + jnp.abs(
            ring[i] + ring[(i + 8) % 16] - ring[(i + 4) % 16] - ring[(i + 12) % 16]
        )
    # penalize edges: |opposite difference|
    dr = jnp.zeros_like(g)
    for i in range(_RING_N // 2):
        dr = dr + jnp.abs(ring[i] - ring[(i + 8) % 16])
    # local mean response
    mean_r = jnp.mean(ring, axis=0)
    mr = jnp.zeros_like(g)
    for i in range(_RING_N):
        mr = mr + jnp.abs(ring[i] - mean_r)
    resp = sr - dr - 0.5 * jnp.abs(g - mean_r) * _RING_N
    resp = jnp.maximum(resp, 0.0)

    nms = jax.lax.reduce_window(resp, -jnp.inf, jax.lax.max, (5, 5), (1, 1), "SAME")
    h, w = resp.shape
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    b = _RING_R + 2
    ok = (resp >= nms) & (ys >= b) & (ys < h - b) & (xs >= b) & (xs < w - b)
    score = jnp.where(ok, resp, -1.0)
    v, i = jax.lax.top_k(score.reshape(-1), max_corners)
    return jnp.stack([(i % w).astype(jnp.float32), (i // w).astype(jnp.float32)], 1), v


@functools.partial(jax.jit, static_argnames=("window", "iters"))
def refine_subpix(img, corners, window: int = 5, iters: int = 10):
    """Gradient-orthogonality subpixel refinement (cornerSubPix equivalent,
    CalibrationUtil.cpp:35-37: 5x5 window, 30 iters / eps 0.1).

    Solves sum_p grad(p) grad(p)^T (p - q) = 0 over the window, iterated."""
    g = jnp.asarray(img, jnp.float32)
    gx = jnp.zeros_like(g).at[:, 1:-1].set((g[:, 2:] - g[:, :-2]) * 0.5)
    gy = jnp.zeros_like(g).at[1:-1, :].set((g[2:, :] - g[:-2, :]) * 0.5)
    r = window
    offs = jnp.arange(-r, r + 1, dtype=jnp.float32)
    ou, ov = jnp.meshgrid(offs, offs)
    wgt = jnp.exp(-(ou**2 + ov**2) / (2.0 * (r / 2.0) ** 2))

    from tpusfm.features.sift import _bilinear

    def refine_one(q):
        def step(q, _):
            sx = q[0] + ou
            sy = q[1] + ov
            ix = _bilinear(gx, sx, sy)
            iy = _bilinear(gy, sx, sy)
            a = jnp.sum(wgt * ix * ix)
            b = jnp.sum(wgt * ix * iy)
            c = jnp.sum(wgt * iy * iy)
            bx = jnp.sum(wgt * (ix * ix * sx + ix * iy * sy))
            by = jnp.sum(wgt * (ix * iy * sx + iy * iy * sy))
            G = jnp.array([[a, b], [b, c]]) + jnp.eye(2) * 1e-6
            qn = jnp.linalg.solve(G, jnp.array([bx, by]))
            # clamp step to the window to keep divergent solves local
            return q + jnp.clip(qn - q, -1.0, 1.0), None

        q, _ = jax.lax.scan(step, q, None, length=iters)
        return q

    return jax.vmap(refine_one)(jnp.asarray(corners, jnp.float32))


def _order_grid(pts: np.ndarray, rows: int, cols: int, scores: np.ndarray | None = None):
    """Greedy lattice growth: integer-embed candidate corners, return the
    (rows*cols, 2) ordered grid or None. Host-side numpy. When several
    fully-occupied (rows x cols) sub-rectangles exist (board-edge T-junctions
    joining the lattice), the one with the largest total corner response wins."""
    n = len(pts)
    if scores is None:
        scores = np.ones(n)
    need = rows * cols
    if n < need:
        return None
    # kNN
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    nn_idx = np.argsort(d2, axis=1)[:, :8]

    def try_seed(seed):
        nbrs = nn_idx[seed]
        e1c = pts[nbrs[0]] - pts[seed]
        # most orthogonal neighbor of similar length
        best, best_score = None, -1
        for j in nbrs[1:]:
            v = pts[j] - pts[seed]
            l_ratio = np.linalg.norm(v) / (np.linalg.norm(e1c) + 1e-9)
            if not (0.6 < l_ratio < 1.7):
                continue
            cosang = abs(np.dot(v, e1c)) / (np.linalg.norm(v) * np.linalg.norm(e1c) + 1e-9)
            if 1 - cosang > best_score:
                best_score = 1 - cosang
                best = j
        if best is None or best_score < 0.5:
            return None
        coords = {seed: (0, 0), nbrs[0]: (1, 0), best: (0, 1)}
        pos = {v: k for k, v in coords.items()}
        tol2 = 0.35**2 * min(d2[seed][nn_idx[seed][0]], np.inf)
        step = np.linalg.norm(e1c)
        frontier = list(coords.keys())
        while frontier:
            i = frontier.pop()
            ci = np.array(coords[i])
            for dirn in [(1, 0), (-1, 0), (0, 1), (0, -1)]:
                tgt = tuple(ci + dirn)
                if tgt in pos:
                    continue
                # predict: linear extrapolation from the opposite neighbor if
                # assigned, else basis step from seed frame
                opp = tuple(ci - np.array(dirn))
                if opp in pos:
                    pred = 2 * pts[i] - pts[pos[opp]]
                else:
                    e1v = pts[nbrs[0]] - pts[seed]
                    e2v = pts[best] - pts[seed]
                    pred = pts[i] + dirn[0] * e1v + dirn[1] * e2v
                dd = ((pts - pred) ** 2).sum(-1)
                j = int(np.argmin(dd))
                if dd[j] < (0.35 * step) ** 2 and j not in coords:
                    coords[j] = tgt
                    pos[tgt] = j
                    frontier.append(j)
        if len(coords) < need:
            return None
        # occupancy lattice -> find a fully-occupied (rows x cols) rectangle
        arr = np.array(list(pos.keys()))
        amin = arr.min(0)
        span = arr.max(0) - amin + 1
        occ = -np.ones(span, int)
        for (a, b), j in pos.items():
            occ[a - amin[0], b - amin[1]] = j
        best_g, best_s = None, -np.inf
        for rr, cc in ((rows, cols), (cols, rows)):
            if span[0] < rr or span[1] < cc:
                continue
            for a0 in range(span[0] - rr + 1):
                for b0 in range(span[1] - cc + 1):
                    sub = occ[a0 : a0 + rr, b0 : b0 + cc]
                    if (sub >= 0).all():
                        s = scores[sub].sum()
                        if s > best_s:
                            best_s = s
                            # row-major (rows, cols) ordering
                            g = pts[sub if rr == rows else sub.T]
                            best_g = g.reshape(-1, 2).astype(np.float32)
        return best_g

    order = np.argsort(((pts - pts.mean(0)) ** 2).sum(-1))
    for seed in order[:10]:
        g = try_seed(int(seed))
        if g is not None:
            return g
    return None


def find_chessboard_corners(img, rows: int = 6, cols: int = 9, max_candidates: int = 200):
    """Detect and order the (rows x cols) inner-corner grid.

    Returns (corners (rows*cols, 2) float32, found: bool). Corners are
    subpixel-refined. img: (H, W) grayscale in [0, 1] (numpy or jnp).
    """
    img = jnp.asarray(img, jnp.float32)
    cand, score = _corner_candidates(img, max_candidates)
    cand = np.asarray(cand)
    score = np.asarray(score)
    keep = score > max(1e-3, 0.2 * score.max())
    grid = _order_grid(cand[keep], rows, cols, score[keep])
    if grid is None:
        return np.zeros((rows * cols, 2), np.float32), False
    refined = np.asarray(refine_subpix(img, jnp.asarray(grid)))
    return refined.astype(np.float32), True
