"""Match-based disparity + the RMS-vs-ground-truth benchmark.

Replicates matchBasedDispCalculate — THE quantitative benchmark of the
reference (/root/reference/SfM-GMS/SfM-GMS/DisparityUtil.cpp:93-216):
for {sift, orb} x {sparse, dense} x {none, gms, logos} produce a disparity
image from per-match |x1 - x2| at the query pixel, then
RMS = sqrt(mean over valid pixels of (disp - gt/disp_ratio)^2) plus the
valid-disparity count (DisparityUtil.cpp:188-201).
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpusfm.config import PipelineConfig, MatchConfig
from tpusfm.features.dense import dense_sift_descriptors
from tpusfm.features.sift import sift_detect_and_compute
from tpusfm.features.orb import orb_detect_and_compute
from tpusfm.kernels.distance import BIG, nn_search
from tpusfm.match.bf import bf_match, matches_from_nn
from tpusfm.utils.pad import pad_axis, round_up
from tpusfm.match.gms import gms_filter
from tpusfm.match.logos import logos_match
from tpusfm.types import Features, Keypoints, Matches


@functools.partial(jax.jit, static_argnames=("height", "width"))
def match_disparity_image(kpts1: Keypoints, kpts2: Keypoints, matches: Matches,
                          height: int, width: int):
    """Disparity image from matches: disp[y, x] = |x - x1| at each matched
    query pixel; unmatched pixels invalid (the reference initializes to 255,
    DisparityUtil.cpp:179-185). Returns (disp (H, W) f32, valid (H, W) bool)."""
    p1, p2 = matches.gather_xy(kpts1, kpts2)
    d = jnp.abs(p1[:, 0] - p2[:, 0])
    x = jnp.clip(jnp.round(p1[:, 0]).astype(jnp.int32), 0, width - 1)
    y = jnp.clip(jnp.round(p1[:, 1]).astype(jnp.int32), 0, height - 1)
    flat = jnp.where(matches.mask, y * width + x, height * width)
    disp = jnp.zeros((height * width + 1,)).at[flat].max(jnp.where(matches.mask, d, 0.0))
    hit = jnp.zeros((height * width + 1,), bool).at[flat].set(True)
    return disp[:-1].reshape(height, width), hit[:-1].reshape(height, width)


def disparity_rms(disp, valid, gt, disp_ratio: float, gt_valid=None):
    """The reference metric (DisparityUtil.cpp:188-201): RMS between computed
    disparity and gt/disp_ratio over pixels where both are valid, plus count.

    gt: ground-truth image in [0, 1] (8-bit scale restored internally)."""
    gt255 = jnp.asarray(gt) * 255.0
    gv = gt255 > 0 if gt_valid is None else gt_valid
    both = valid & gv
    err = (disp - gt255 / disp_ratio) ** 2
    n = jnp.sum(both.astype(jnp.float32))
    rms = jnp.sqrt(jnp.sum(jnp.where(both, err, 0.0)) / jnp.maximum(n, 1.0))
    return rms, n


def _dense_grid_kpts(h, w, valid=None) -> Keypoints:
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    return Keypoints(
        xy=jnp.stack([xs.reshape(-1), ys.reshape(-1)], 1),
        scale=jnp.ones(h * w, jnp.float32),
        angle=jnp.zeros(h * w, jnp.float32),
        response=jnp.ones(h * w, jnp.float32),
        mask=jnp.ones(h * w, bool) if valid is None else valid,
    )


def dense_features(img, cell: int = 4) -> Features:
    """Per-pixel descriptors wrapped as Features (the reference's dense
    keypoint grid, DisparityUtil.cpp:125-133)."""
    h, w = img.shape
    desc = dense_sift_descriptors(img, cell=cell)
    return Features(kpts=_dense_grid_kpts(h, w), desc=desc.reshape(h * w, -1))


def dense_orb_features(img) -> Features:
    """Per-pixel rotated-BRIEF descriptors (the reference's orb x dense cell:
    size-1 keypoints at every pixel + orb->compute, DisparityUtil.cpp:125-133;
    border pixels whose patch leaves the image are masked invalid, matching
    OpenCV's runByImageBorder removal)."""
    from tpusfm.features.orb import dense_orb_descriptors

    h, w = img.shape
    desc, valid = dense_orb_descriptors(img)
    return Features(kpts=_dense_grid_kpts(h, w, valid), desc=desc)


def dense_raw_match(f1: Features, f2: Features, metric: str, cfg: MatchConfig,
                    chunk: int = 262144) -> Matches:
    """Un-pruned dense NN matching with host-level query chunking.

    One monolithic program over millions of queries runs for tens of
    seconds and, on the tunneled worker, a single fault (or watchdog) takes
    the whole computation down — full-scale portrait (2594x1131, ~2.9M
    descriptors) crashed the TPU worker as one program. Chunking the query
    axis into ~256k-row programs keeps each dispatch to a few seconds,
    bounds peak HBM for kernel temporaries, and costs nothing: the database
    streams from HBM identically either way. bf16 casting and large tiles
    as in the single-shot dense path."""
    to_bf16 = metric != "hamming" and jax.default_backend() == "tpu"
    d1 = f1.desc.astype(jnp.bfloat16) if to_bf16 else f1.desc
    d2 = f2.desc.astype(jnp.bfloat16) if to_bf16 else f2.desc
    n1 = d1.shape[0]
    idxs, dists = [], []
    for q0 in range(0, n1, chunk):
        q1 = min(q0 + chunk, n1)
        idx, best, _ = nn_search(d1[q0:q1], d2, f2.kpts.mask, metric=metric,
                                 tile_q=2048, tile_db=512)
        idxs.append(idx)
        dists.append(best)
    idx = jnp.concatenate(idxs)
    best = jnp.concatenate(dists)
    valid = f1.kpts.mask & (best < BIG / 2)
    return matches_from_nn(idx, best, valid, cfg, metric,
                           prune=False, capacity=n1)


def _ring_raw_match(f1: Features, f2: Features, mesh, metric: str,
                    cfg: MatchConfig) -> Matches:
    """Un-pruned NN matching with the descriptor axis sharded over ``mesh``.

    The distributed leg of the dense-disparity path: at dense-mode scale the
    keypoint axis is the long axis (one descriptor per pixel — ~2.9M on the
    reference's 2594x1131 robot pair, DisparityUtil.cpp:465-483), so queries
    and database shard over the mesh and database shards rotate around the
    ICI ring (tpusfm.dist.ring_match). Produces the same Matches as the
    single-chip raw bf_match (equivalence-tested in tests/test_dist.py)."""
    from tpusfm.dist.ring_match import ring_nn_search

    n_dev = mesh.devices.size
    n1, n2 = f1.desc.shape[0], f2.desc.shape[0]
    cap1, cap2 = round_up(n1, n_dev), round_up(n2, n_dev)
    q = pad_axis(f1.desc, cap1, 0)
    db = pad_axis(f2.desc, cap2, 0)
    dbm = pad_axis(f2.kpts.mask.astype(jnp.float32), cap2, 0)
    idx, best, _ = ring_nn_search(q, db, dbm, mesh, metric=metric, block=2048)
    valid = pad_axis(f1.kpts.mask, cap1, 0) & (best < BIG / 2)
    m = matches_from_nn(idx[:n1], best[:n1], valid[:n1], cfg, metric,
                        prune=False, capacity=n1)
    return m


def run_disparity_benchmark(
    left, right, gt, alg: str, density: str, disp_ratio: float,
    cfg: PipelineConfig = PipelineConfig(), mesh=None,
):
    """One cell of the reference benchmark grid (DisparityUtil.cpp:430-461).

    alg in {"sift", "orb", "gms", "logos"}; density in {"sparse", "dense"}.
    mesh: optional device mesh — dense-mode NN matching shards over it via
    the ring matcher. Returns dict(rms, count, disp, valid)."""
    h, w = left.shape
    size = (w, h)
    if density == "dense" and alg == "orb":
        # true dense ORB (rotated BRIEF at every pixel, DisparityUtil.cpp:108)
        f1 = dense_orb_features(left)
        f2 = dense_orb_features(right)
        metric = "hamming"
    elif density == "dense":
        f1 = dense_features(left)
        f2 = dense_features(right)
        metric = "l2"
    elif alg == "orb":
        f1 = orb_detect_and_compute(left, cfg.orb)
        f2 = orb_detect_and_compute(right, cfg.orb)
        metric = "hamming"
    else:
        f1 = sift_detect_and_compute(left, cfg.sift)
        f2 = sift_detect_and_compute(right, cfg.sift)
        metric = "l2"

    mcfg = dataclasses.replace(cfg.match, cross_check=False)
    if (mesh is not None and mesh.devices.size > 1 and density == "dense"
            and alg == "gms"):
        # FUSED dense mode: ring matching + GMS votes in one program — the
        # vote-grid psums amortize against the ring matmuls instead of
        # standing alone (r5; dist/fused_dense.py, 89% projected 8-chip
        # efficiency vs 58% for the standalone sharded GMS pass)
        from tpusfm.dist.fused_dense import ring_match_gms
        from tpusfm.types import Matches as _Matches

        n_dev = mesh.devices.size
        n1, n2 = f1.desc.shape[0], f2.desc.shape[0]
        cap1, cap2 = round_up(n1, n_dev), round_up(n2, n_dev)
        idx, best, _, inl = ring_match_gms(
            pad_axis(f1.desc, cap1, 0), pad_axis(f2.desc, cap2, 0),
            pad_axis(f2.kpts.mask.astype(jnp.float32), cap2, 0),
            pad_axis(f1.kpts.xy, cap1, 0), pad_axis(f2.kpts.xy, cap2, 0),
            size, size, mesh, cfg.gms, metric=metric, block=2048)
        valid = pad_axis(f1.kpts.mask, cap1, 0) & (best < BIG / 2) & inl
        matches = _Matches(idx1=jnp.arange(n1, dtype=jnp.int32),
                           idx2=idx[:n1], distance=best[:n1],
                           mask=valid[:n1])
        disp, valid = match_disparity_image(f1.kpts, f2.kpts, matches, h, w)
        rms, n = disparity_rms(disp, valid, gt, disp_ratio)
        return {"rms": float(rms), "count": int(n),
                "n_matches": int(matches.count), "disp": disp, "valid": valid}
    if mesh is not None and mesh.devices.size > 1 and density == "dense":
        raw = _ring_raw_match(f1, f2, mesh, metric, mcfg)
    elif density == "dense":
        # Dense-scale single-chip matching: query-chunked programs over the
        # large-tile bf16 kernel (see dense_raw_match — bf16 is a deliberate
        # reduced-precision opt-in; the reference's dense mode uses
        # *approximate* FLANN matching here, DisparityUtil.cpp:104-116, so
        # exact-NN-in-bf16 still dominates its accuracy).
        raw = dense_raw_match(f1, f2, metric, mcfg)
    else:
        raw = bf_match(f1.desc, f2.desc, f1.kpts.mask, f2.kpts.mask, mcfg,
                       metric=metric, prune=False, capacity=f1.capacity)
    if alg == "gms":
        if mesh is not None and mesh.devices.size > 1:
            # shard the vote scatter + per-match verdict over the mesh
            # (SURVEY §2.4); equivalence-tested vs the single-device filter
            from tpusfm.dist.sharded_gms import sharded_gms_filter

            matches = sharded_gms_filter(f1.kpts, f2.kpts, raw, size, size,
                                         mesh, cfg.gms)
        else:
            matches = gms_filter(f1.kpts, f2.kpts, raw, size, size, cfg.gms)
    elif alg == "logos" and density == "sparse":
        matches = logos_match(f1, f2, cfg.logos)
    else:
        matches = raw

    disp, valid = match_disparity_image(f1.kpts, f2.kpts, matches, h, w)
    rms, n = disparity_rms(disp, valid, gt, disp_ratio)
    return {
        "rms": float(rms),
        "count": int(n),
        "n_matches": int(matches.count),
        "disp": disp,
        "valid": valid,
    }
