"""Incremental multi-view SfM: two-view bootstrap -> PnP registration ->
track triangulation -> global bundle adjustment.

The multi-view extension of the reference's two-view pipeline
(/root/reference/SfM-GMS/SfM-GMS/SfMUtil.cpp:4-83) demanded by the north
star. The view-registration loop is host-orchestrated (a handful of views);
every numeric step (matching, RANSAC, PnP, triangulation, BA) is the batched
device code from the other modules.
"""
from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from tpusfm.ba.solver import bundle_adjust, mean_reprojection_error
from tpusfm.ba.tracks import Observations, build_tracks
from tpusfm.config import PipelineConfig
from tpusfm.geometry.epipolar import find_essential_ransac
from tpusfm.geometry.pnp import pnp_ransac
from tpusfm.geometry.pose import recover_pose
from tpusfm.geometry.projection import rodrigues, rodrigues_inv, project_points
from tpusfm.geometry.triangulate import triangulate_dlt
from tpusfm.geometry.undistort import undistort_points
from tpusfm.sfm.two_view import match_features


def _obs_lookup(obs: Observations, n_tracks: int, n_views: int) -> np.ndarray:
    """(P, V) -> observation row index or -1."""
    table = -np.ones((n_tracks, n_views), np.int64)
    cam = np.asarray(obs.cam)
    pt = np.asarray(obs.pt)
    m = np.asarray(obs.mask)
    for o in range(len(cam)):
        if m[o]:
            table[pt[o], cam[o]] = o
    return table


def incremental_sfm(features, sizes, intr, cfg: PipelineConfig = PipelineConfig(),
                    algo: str = "gms", pair_span: int = 2, max_tracks: int = 8192,
                    mesh=None):
    """Reconstruct a sequence.

    features: list of Features per view; sizes: list of (w, h); intr:
    CameraIntrinsics. Returns dict with cams (V,6), points (P,3),
    point_valid (P,), obs, reproj_error, and per-stage metrics.

    mesh: optional jax.sharding.Mesh — when given with >1 device, every
    bundle-adjustment solve shards its observation axis over the mesh via
    tpusfm.dist.sharded_ba (psum-reduced Schur normal blocks). Semantics are
    identical to the single-chip solver (equivalence-tested on the virtual
    CPU mesh, tests/test_dist.py); this generalizes the reference's serial
    single-thread pipeline (/root/reference/SfM-GMS/SfM-GMS/main.cpp:31-47).
    """
    V = len(features)
    K = intr.K
    dist = intr.dist
    focal = float((K[0, 0] + K[1, 1]) * 0.5)

    if mesh is not None and mesh.devices.size > 1:
        from tpusfm.dist.sharded_ba import sharded_bundle_adjust

        def run_ba(cams_j, points_j, obs_ba, n_fixed_cams=1):
            return sharded_bundle_adjust(
                cams_j, points_j, obs_ba, K, dist, mesh, cfg.ba,
                n_fixed_cams=n_fixed_cams,
            )
    else:
        def run_ba(cams_j, points_j, obs_ba, n_fixed_cams=1):
            return bundle_adjust(
                cams_j, points_j, obs_ba, K, dist, cfg.ba,
                n_fixed_cams=n_fixed_cams,
            )

    # 1. pairwise matches
    pair_matches = {}
    for i in range(V):
        for j in range(i + 1, min(V, i + 1 + pair_span)):
            m = match_features(features[i], features[j], algo, sizes[i], sizes[j], cfg)
            pair_matches[(i, j)] = (
                np.asarray(m.idx1), np.asarray(m.idx2), np.asarray(m.mask),
            )

    # 2. tracks
    kxy = [np.asarray(f.kpts.xy) for f in features]
    obs, P = build_tracks(pair_matches, kxy, V, max_tracks=max_tracks)
    if P < 16:
        raise RuntimeError(f"too few tracks ({P}) for reconstruction")
    lookup = _obs_lookup(obs, P, V)
    obs_xy = np.asarray(obs.xy)
    obs_xyn = np.asarray(undistort_points(obs.xy, K, dist))

    cams = np.zeros((V, 6), np.float32)
    registered = [0]
    points = np.zeros((P, 3), np.float32)
    point_valid = np.zeros(P, bool)
    metrics = {"n_tracks": P, "n_obs": obs.n_obs}

    # 3. bootstrap from views (0, 1)
    both = (lookup[:, 0] >= 0) & (lookup[:, 1] >= 0)
    i0 = lookup[both, 0]
    i1 = lookup[both, 1]
    x0 = jnp.asarray(obs_xyn[i0])
    x1 = jnp.asarray(obs_xyn[i1])
    mask = jnp.ones(len(i0), bool)
    E, inl, n_inl = find_essential_ransac(x0, x1, mask, focal, cfg.ransac)
    R, t, cheir = recover_pose(E, x0, x1, inl)
    metrics["init_inliers"] = int(n_inl)
    cams[1, :3] = np.asarray(rodrigues_inv(R))
    cams[1, 3:] = np.asarray(t)
    registered.append(1)

    P1 = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], 1)
    P2 = jnp.concatenate([R, t.reshape(3, 1)], 1)
    X01 = np.asarray(triangulate_dlt(P1, P2, x0, x1))
    ok01 = np.asarray(cheir)
    tr_ids = np.nonzero(both)[0]
    points[tr_ids[ok01]] = X01[ok01]
    point_valid[tr_ids[ok01]] = True

    # 4. register remaining views by PnP, then triangulate their new tracks
    def proj_mat(v):
        Rv = np.asarray(rodrigues(jnp.asarray(cams[v, :3])))
        return jnp.asarray(np.concatenate([Rv, cams[v, 3:].reshape(3, 1)], 1))

    def try_register(v):
        """PnP-register view v against the current map. Returns True on
        success (cams[v] updated)."""
        vis = (lookup[:, v] >= 0) & point_valid
        n_vis = int(vis.sum())
        if n_vis < 12:
            metrics[f"view{v}"] = "skipped (too few 3D correspondences)"
            return False
        oidx = lookup[vis, v]
        rv, tv, inlv, n_in = pnp_ransac(
            jnp.asarray(points[vis]), jnp.asarray(obs_xyn[oidx]),
            jnp.ones(n_vis, bool), focal,
            threshold_px=2.0 * cfg.ransac.threshold_px,
        )
        metrics[f"view{v}_pnp_inliers"] = int(n_in)
        if int(n_in) < max(12, n_vis // 8):
            metrics[f"view{v}"] = f"rejected (pnp inliers {int(n_in)}/{n_vis})"
            return False
        cams[v, :3] = np.asarray(rv)
        cams[v, 3:] = np.asarray(tv)
        metrics.pop(f"view{v}", None)
        return True

    obs_live = np.array(obs.mask)  # observations not yet rejected as outliers
    obs_cam_np = np.asarray(obs.cam)
    obs_pt_np = np.asarray(obs.pt)

    def interim_ba(iters=6):
        """Short BA + outlier pruning over the current registered set: keeps
        the map clean so later PnP sees refined points (the standard
        incremental recipe — without it, outlier tracks accumulate and PnP
        for weak views degenerates; this was the r3 5/6-registration
        failure). Pruning is essential: BA over raw tracks drags poses
        toward data-association outliers instead of fixing them."""
        nonlocal cams, points, point_valid, obs_live
        rm = np.zeros(V, bool)
        rm[registered] = True
        use = obs_live & point_valid[obs_pt_np] & rm[obs_cam_np]
        obs_i = Observations(xy=obs.xy, cam=obs.cam, pt=obs.pt,
                             mask=jnp.asarray(use))
        c_j, p_j, _ = bundle_adjust(
            jnp.asarray(cams), jnp.asarray(points), obs_i, K, dist,
            dataclasses.replace(cfg.ba, max_iters=iters), n_fixed_cams=1)
        cams = np.array(c_j)  # np.array: asarray of a jax array is read-only
        points = np.where(point_valid[:, None], np.asarray(p_j), points)
        # prune gross-reprojection observations, then points with < 2 obs
        r = jax.vmap(
            lambda c, p, x: project_points(p_j[p], c_j[c, :3], c_j[c, 3:],
                                           K, dist) - x
        )(obs.cam, obs.pt, obs.xy)
        e = np.asarray(jnp.sqrt(jnp.sum(r * r, axis=1)))
        med = np.median(e[use]) if use.any() else 0.0
        thr = max(5.0, 3.0 * med)
        bad = use & (e >= thr)
        obs_live &= ~bad
        cnt = np.bincount(obs_pt_np[obs_live & rm[obs_cam_np]], minlength=P)
        point_valid &= cnt >= 2

    def triangulate_new():
        """Triangulate tracks not yet valid but observed in >=2 registered
        views (widest registered baseline per track)."""
        reg = np.array(registered)
        seen = lookup[:, reg] >= 0
        cand = (~point_valid) & (seen.sum(1) >= 2)
        if not cand.any():
            return
        ids = np.nonzero(cand)[0]
        # first and last registered observing view per track
        first_v = reg[np.argmax(seen[ids], axis=1)]
        rev = seen[ids][:, ::-1]
        last_v = reg[len(reg) - 1 - np.argmax(rev, axis=1)]
        good = first_v != last_v
        ids = ids[good]
        if not len(ids):
            return
        fv = first_v[good]
        lv = last_v[good]
        xa = obs_xyn[lookup[ids, fv]]
        xb = obs_xyn[lookup[ids, lv]]
        # triangulate per unique view pair (static shapes per group)
        for (a, b) in {(int(x), int(y)) for x, y in zip(fv, lv)}:
            sel = (fv == a) & (lv == b)
            Xn = np.asarray(triangulate_dlt(
                proj_mat(a), proj_mat(b),
                jnp.asarray(xa[sel]), jnp.asarray(xb[sel]),
            ))
            # cheirality + sanity
            Ra = np.asarray(rodrigues(jnp.asarray(cams[a, :3])))
            za = (Xn @ Ra.T + cams[a, 3:])[:, 2]
            okz = (za > 0.05) & (np.abs(Xn) < 1e3).all(1)
            pid = ids[sel]
            points[pid[okz]] = Xn[okz]
            point_valid[pid[okz]] = True

    failed = []
    for v in range(2, V):
        if not try_register(v):
            failed.append(v)
            continue
        registered.append(v)
        triangulate_new()
        # keep the growing map clean for the next view's PnP
        interim_ba(4)

    # retry failed views against the BA-refined map (VERDICT r4 #4): PnP
    # that degenerated on a drifted/outlier-heavy map often succeeds once
    # the map has been refined by the views that did register.
    for v in list(failed):
        if try_register(v):
            registered.append(v)
            failed.remove(v)
            metrics[f"view{v}_registered_on_retry"] = 1
            triangulate_new()
            interim_ba(4)
    registered.sort()

    # 5. global BA over valid points / registered views (observations the
    # interim pruning rejected stay rejected)
    obs_use_mask = obs_live & point_valid[np.asarray(obs.pt)]
    reg_mask = np.zeros(V, bool)
    reg_mask[registered] = True
    obs_use_mask &= reg_mask[np.asarray(obs.cam)]
    obs_ba = Observations(
        xy=obs.xy, cam=obs.cam, pt=obs.pt, mask=jnp.asarray(obs_use_mask)
    )
    cams_j = jnp.asarray(cams)
    points_j = jnp.asarray(points)
    costs = None
    # BA with interleaved outlier rejection: tracks with gross reprojection
    # error are data-association failures BA cannot repair — drop their
    # observations and re-solve.
    for ba_round in range(2):
        cams_j, points_j, costs = run_ba(cams_j, points_j, obs_ba, n_fixed_cams=1)
        r = jax.vmap(
            lambda c, p, x: project_points(points_j[p], cams_j[c, :3], cams_j[c, 3:], K, dist) - x
        )(obs_ba.cam, obs_ba.pt, obs_ba.xy)
        e = np.asarray(jnp.sqrt(jnp.sum(r * r, axis=1)))
        m = np.asarray(obs_ba.mask)
        med = np.median(e[m]) if m.any() else 0.0
        thr = max(5.0, 3.0 * med)
        new_mask = m & (e < thr)
        # drop points reduced below 2 observations
        cnt = np.bincount(np.asarray(obs_ba.pt)[new_mask], minlength=P)
        new_mask &= (cnt >= 2)[np.asarray(obs_ba.pt)]
        point_valid &= cnt >= 2
        metrics[f"ba_round{ba_round}_dropped"] = int(m.sum() - new_mask.sum())
        obs_ba = Observations(xy=obs_ba.xy, cam=obs_ba.cam, pt=obs_ba.pt,
                              mask=jnp.asarray(new_mask))
    cams_j, points_j, costs = run_ba(cams_j, points_j, obs_ba, n_fixed_cams=1)
    err = float(mean_reprojection_error(cams_j, points_j, obs_ba, K, dist))
    metrics["ba_costs"] = np.asarray(costs)
    metrics["reproj_error_px"] = err
    metrics["n_registered"] = len(registered)
    metrics["n_points"] = int(point_valid.sum())
    return {
        "cams": np.asarray(cams_j),
        "points": np.asarray(points_j),
        "point_valid": point_valid,
        "obs": obs_ba,
        "metrics": metrics,
    }
