"""GMS — Grid-based Motion Statistics match filtering (Bian et al. CVPR'17).

TPU-native re-design of cv::xfeatures2d::matchGMS
(/root/reference/SfM-GMS/SfM-GMS/FeatureMatchUtil.cpp:69 with
rotation+scale; DisparityUtil.cpp:149,299 with defaults off).

The algorithm is reformulated as dense tensor ops (ideal for the VPU):
  1. scatter-add matches into a (cells1, cells2) vote histogram,
  2. per left-cell best right-cell ("motion"),
  3. score = votes summed over the 3x3 cell neighborhood, with the right-side
     neighborhood permuted per rotation pattern,
  4. threshold tau = alpha * sqrt(mean matches per neighborhood cell),
  5. matches in accepted cell pairs are inliers; OR over 4 half-cell grid
     offsets; best configuration over rotation patterns x scale ratios.

No data-dependent control flow: all offset/rotation/scale variants are
evaluated as static unrolled branches and the max-inlier one selected with
jnp.where — RANSAC-style search as pure batched compute.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from tpusfm.config import GmsConfig
from tpusfm.types import Matches, Keypoints

# 8 rotation patterns: circular shifts of the 8 ring neighbors (center fixed).
# Ring order (clockwise): indices into the 3x3 neighborhood (row-major 0..8,
# center=4): 0,1,2,5,8,7,6,3.
_RING = [0, 1, 2, 5, 8, 7, 6, 3]

_SCALE_RATIOS = [1.0, 0.5, 1.0 / math.sqrt(2.0), math.sqrt(2.0), 2.0]


def _rotation_perms():
    """(8, 9) permutation: perm[r][k] = neighborhood slot in image2 that
    corresponds to slot k in image1 under rotation pattern r."""
    perms = []
    for r in range(8):
        p = [0] * 9
        p[4] = 4
        for pos, slot in enumerate(_RING):
            p[slot] = _RING[(pos + r) % 8]
        perms.append(p)
    return jnp.array(perms, jnp.int32)


def _cell_index(xy, w, h, rows, cols, off_x, off_y):
    """Grid cell id for each point; -1 if outside after offset shift."""
    cw = w / cols
    ch = h / rows
    cx = jnp.floor(xy[:, 0] / cw + off_x * 0.5).astype(jnp.int32)
    cy = jnp.floor(xy[:, 1] / ch + off_y * 0.5).astype(jnp.int32)
    ok = (cx >= 0) & (cx < cols) & (cy >= 0) & (cy < rows)
    return jnp.where(ok, cy * cols + cx, -1)


def _neighbors(rows, cols):
    """(cells, 9) neighbor ids in 3x3 row-major order; -1 out of grid."""
    cell = jnp.arange(rows * cols)
    cy, cx = cell // cols, cell % cols
    out = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            ny, nx = cy + dy, cx + dx
            ok = (ny >= 0) & (ny < rows) & (nx >= 0) & (nx < cols)
            out.append(jnp.where(ok, ny * cols + nx, -1))
    return jnp.stack(out, axis=1).astype(jnp.int32)


def _scale_pass(xy1, xy2, mmask, size1, size2, cfg, rows2, cols2, rot_perms,
                axis_name=None):
    """Inlier masks for every rotation pattern at one grid scale.

    rot_perms: (R, 9). Returns (R, N) bool — per rotation, the OR over the
    4 half-cell grid offsets. Offsets and rotations are vmapped axes, not
    unrolled traces: the original 8 rot x 5 scale x 4 offset unroll produced
    160 scatter-add bodies in one program and compile times in the tens of
    minutes.

    axis_name: when running under shard_map with the MATCH axis sharded,
    the vote/occupancy histograms are psum'd over that mesh axis so every
    device scores the full grid while scattering only its match shard
    (tpusfm/dist/sharded_gms.py)."""
    w1, h1 = size1
    w2, h2 = size2
    rows1, cols1 = cfg.grid_rows, cfg.grid_cols
    c1 = rows1 * cols1
    c2 = rows2 * cols2
    nb1 = _neighbors(rows1, cols1)               # (c1, 9)
    nb2 = _neighbors(rows2, cols2)               # (c2, 9)

    def per_offset(off):
        cell1 = _cell_index(xy1, w1, h1, rows1, cols1, off[0], off[1])
        cell2 = _cell_index(xy2, w2, h2, rows2, cols2, off[0], off[1])
        ok = mmask & (cell1 >= 0) & (cell2 >= 0)
        flat = jnp.where(ok, cell1 * c2 + cell2, c1 * c2)
        votes = jnp.zeros((c1 * c2 + 1,), jnp.float32).at[flat].add(1.0)
        votes = votes[:-1].reshape(c1, c2)

        npts1 = jnp.zeros((c1 + 1,), jnp.float32).at[jnp.where(ok, cell1, c1)].add(1.0)[:-1]
        if axis_name is not None:
            votes = jax.lax.psum(votes, axis_name)
            npts1 = jax.lax.psum(npts1, axis_name)
        best_j = jnp.argmax(votes, axis=1)        # (c1,)

        # threshold depends only on the left grid occupancy (not rotation)
        nb_np = jnp.where(nb1 >= 0, npts1[jnp.maximum(nb1, 0)], 0.0)
        n_valid = jnp.maximum(jnp.sum((nb1 >= 0).astype(jnp.float32), axis=1), 1.0)
        thresh = cfg.threshold_factor * jnp.sqrt(jnp.sum(nb_np, axis=1) / n_valid)
        return votes, npts1, best_j, thresh, ok, cell1, cell2

    offs = jnp.array([(0.0, 0.0), (1.0, 0.0), (0.0, 1.0), (1.0, 1.0)], jnp.float32)
    votes, npts1, best_j, thresh, ok, cell1, cell2 = jax.vmap(per_offset)(offs)

    def score_one(rot_perm, votes, npts1, best_j, thresh, ok, cell1, cell2):
        nb2r = nb2[:, rot_perm]                    # (c2, 9)
        nb_r = nb2r[best_j]                        # (c1, 9)
        valid_nb = (nb1 >= 0) & (nb_r >= 0)
        vi = jnp.where(valid_nb, nb1, 0)
        vj = jnp.where(valid_nb, nb_r, 0)
        score = jnp.sum(jnp.where(valid_nb, votes[vi, vj], 0.0), axis=1)

        cell_ok = (score > thresh) & (npts1 > 0)   # (c1,)
        return (
            ok
            & jnp.take(cell_ok, jnp.maximum(cell1, 0))
            & (cell2 == jnp.take(best_j, jnp.maximum(cell1, 0)))
        )

    per_rot = jax.vmap(                            # over rotations
        lambda perm: jax.vmap(score_one, in_axes=(None, 0, 0, 0, 0, 0, 0, 0))(
            perm, votes, npts1, best_j, thresh, ok, cell1, cell2
        )
    )(rot_perms)                                   # (R, 4, N)
    return jnp.any(per_rot, axis=1)                # (R, N)


@functools.partial(jax.jit, static_argnames=("size1", "size2", "cfg"))
def gms_filter(
    kpts1: Keypoints,
    kpts2: Keypoints,
    matches: Matches,
    size1: tuple[int, int],
    size2: tuple[int, int],
    cfg: GmsConfig = GmsConfig(),
) -> Matches:
    """Filter ``matches`` to GMS inliers. size = (width, height)."""
    xy1, xy2 = matches.gather_xy(kpts1, kpts2)
    mmask = matches.mask

    rot_perms = _rotation_perms()
    if not cfg.with_rotation:
        rot_perms = rot_perms[:1]
    scales = _SCALE_RATIOS if cfg.with_scale else [1.0]

    # scales change the right-grid static shape -> small unrolled loop;
    # rotations and offsets are vmapped inside (_scale_pass).
    inls = jnp.concatenate([
        _scale_pass(
            xy1, xy2, mmask, size1, size2, cfg,
            max(1, int(round(cfg.grid_rows * s))),
            max(1, int(round(cfg.grid_cols * s))),
            rot_perms,
        )
        for s in scales
    ])                                             # (S*R, N)
    counts = jnp.sum(inls.astype(jnp.int32), axis=1)
    best_inlier = inls[jnp.argmax(counts)]

    return Matches(
        idx1=matches.idx1,
        idx2=matches.idx2,
        distance=matches.distance,
        mask=best_inlier,
    )
