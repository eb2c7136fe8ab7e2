"""Mesh-sharded GMS filtering: the MATCH axis distributed, votes psum'd.

Dense-mode GMS scores millions of per-pixel matches
(/root/reference/SfM-GMS/SfM-GMS/DisparityUtil.cpp:125-152 at full
resolution ~2M keypoints); the vote scatter-add and the per-match inlier
test are both match-parallel, while the grid itself is tiny. Each device
scatters its match shard into the (cells1, cells2) histogram, one psum
replicates the full votes (SURVEY.md §2.4 "shard ... GMS vote grid"), the
cell scoring is computed identically everywhere, and the per-match verdict
stays local to the shard. Communication per scale pass: 4 offsets x
(c1*c2 + c1) floats — independent of match count.

Equivalence with the single-device gms_filter is tested on the virtual CPU
mesh (tests/test_dist.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from tpusfm.config import GmsConfig
from tpusfm.match.gms import _SCALE_RATIOS, _rotation_perms, _scale_pass
from tpusfm.types import Keypoints, Matches
from tpusfm.utils.pad import round_up


def sharded_gms_filter(kpts1: Keypoints, kpts2: Keypoints, matches: Matches,
                       size1, size2, mesh: Mesh,
                       cfg: GmsConfig = GmsConfig(), axis: str = "d") -> Matches:
    """gms_filter with the match axis sharded over ``mesh``."""
    xy1, xy2 = matches.gather_xy(kpts1, kpts2)
    n = xy1.shape[0]
    n_dev = mesh.devices.size
    cap = round_up(max(n, n_dev), n_dev)
    pad = cap - n
    xy1p = jnp.pad(xy1, ((0, pad), (0, 0)))
    xy2p = jnp.pad(xy2, ((0, pad), (0, 0)))
    mmp = jnp.pad(matches.mask, (0, pad))

    rot_perms = _rotation_perms()
    if not cfg.with_rotation:
        rot_perms = rot_perms[:1]
    scales = _SCALE_RATIOS if cfg.with_scale else [1.0]

    def local(xy1_l, xy2_l, mm_l):
        inls = jnp.concatenate([
            _scale_pass(
                xy1_l, xy2_l, mm_l, size1, size2, cfg,
                max(1, int(round(cfg.grid_rows * s))),
                max(1, int(round(cfg.grid_cols * s))),
                rot_perms, axis_name=axis,
            )
            for s in scales
        ])                                             # (S*R, N_local)
        counts = jax.lax.psum(jnp.sum(inls.astype(jnp.int32), axis=1), axis)
        return inls[jnp.argmax(counts)]                # (N_local,)

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    with mesh:
        best_inlier = fn(xy1p, xy2p, mmp)[:n]

    return Matches(idx1=matches.idx1, idx2=matches.idx2,
                   distance=matches.distance, mask=best_inlier)
