"""Distributed bundle adjustment: observations sharded across the mesh.

The flagship distributed workload (SURVEY.md §2.4, BASELINE north star).
Structure: every normal-equation block (U, V_p, W, g_c, g_p) and the cost
are segment-sums over the observation axis, so each device reduces its
observation shard locally and one psum over the mesh yields the replicated
blocks; the small reduced camera system is then solved identically on every
device (no broadcast needed). This is the Schur-complement-over-psum recipe:
compute is O(O/devices), communication is O(P*V) blocks per iteration and
rides ICI.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpusfm.ba.solver import (
    build_normal_blocks,
    compute_cost,
    schur_solve,
)
from tpusfm.ba.tracks import Observations, pad_observations
from tpusfm.config import BaConfig
from tpusfm.utils.pad import round_up


def _sharded_blocks_fn(mesh: Mesh, axis: str):
    """shard_map'd (U, Vp, W, gc, gp, cost) with obs sharded on `axis`."""

    def local(cams, points, xy, cam, pt, mask, K, dist, delta):
        obs = Observations(xy=xy, cam=cam, pt=pt, mask=mask)
        U, Vp, W, gc, gp, cost = build_normal_blocks(cams, points, obs, K, dist, delta)
        U = jax.lax.psum(U, axis)
        Vp = jax.lax.psum(Vp, axis)
        W = jax.lax.psum(W, axis)
        gc = jax.lax.psum(gc, axis)
        gp = jax.lax.psum(gp, axis)
        cost = jax.lax.psum(cost, axis)
        return U, Vp, W, gc, gp, cost

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(), P(),                     # cams, points replicated
            P(axis), P(axis), P(axis), P(axis),  # obs sharded
            P(), P(), P(),
        ),
        out_specs=(P(), P(), P(), P(), P(), P()),
        check_vma=False,
    )


def _sharded_cost_fn(mesh: Mesh, axis: str):
    def local(cams, points, xy, cam, pt, mask, K, dist, delta):
        obs = Observations(xy=xy, cam=cam, pt=pt, mask=mask)
        return jax.lax.psum(compute_cost(cams, points, obs, K, dist, delta), axis)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )


def sharded_bundle_adjust(cams, points, obs: Observations, K, dist, mesh: Mesh,
                          cfg: BaConfig = BaConfig(), n_fixed_cams: int = 1,
                          axis: str = "d"):
    """LM bundle adjustment with the observation axis sharded over ``mesh``.

    Semantics identical to tpusfm.ba.solver.bundle_adjust (single-chip);
    equivalence is tested on the virtual CPU mesh (tests/test_dist.py).
    """
    n_dev = mesh.devices.size
    cap = round_up(max(obs.xy.shape[0], n_dev), n_dev)
    obs = pad_observations(obs, cap)

    blocks_fn = _sharded_blocks_fn(mesh, axis)
    cost_fn = _sharded_cost_fn(mesh, axis)
    delta = jnp.float32(cfg.huber_delta)

    @functools.partial(jax.jit, static_argnames=())
    def run(cams, points, xy, cam, pt, mask, K, dist):
        def step(carry, _):
            cams, points, lam = carry
            U, Vp, W, gc, gp, cost = blocks_fn(cams, points, xy, cam, pt, mask, K, dist, delta)
            dc, dp = schur_solve(U, Vp, W, gc, gp, lam, n_fixed_cams)
            new_cams = cams + dc
            new_points = points + dp
            new_cost = cost_fn(new_cams, new_points, xy, cam, pt, mask, K, dist, delta)
            accept = new_cost < cost
            cams = jnp.where(accept, new_cams, cams)
            points = jnp.where(accept, new_points, points)
            lam = jnp.clip(
                jnp.where(accept, lam * cfg.lambda_down, lam * cfg.lambda_up), 1e-9, 1e6
            )
            return (cams, points, lam), jnp.where(accept, new_cost, cost)

        (cams, points, _), costs = jax.lax.scan(
            step, (cams, points, jnp.float32(cfg.init_lambda)), None,
            length=cfg.max_iters,
        )
        return cams, points, costs

    with mesh:
        return run(cams, points, obs.xy, obs.cam, obs.pt, obs.mask, K, dist)


def sharded_bundle_adjust_tm(cams, points, tobs, K, dist, mesh: Mesh,
                             cfg: BaConfig = BaConfig(), n_fixed_cams: int = 1,
                             axis: str = "d"):
    """Track-major LM bundle adjustment with the TRACK axis sharded.

    The at-scale variant (ba/track_solver.py) distributed: each device owns
    P/n_dev tracks — their observations, V_p blocks, and point updates stay
    local; only the reduced camera system (V,6,V,6) + rhs + cost are psum'd
    per iteration. Communication per LM step is O((6V)^2) bytes, independent
    of track count — the "partitioning keyframes and map blocks" recipe of
    the north star. Semantics match bundle_adjust_tm (equivalence-tested on
    the virtual CPU mesh, tests/test_dist.py)."""
    from tpusfm.ba.track_solver import (
        TrackObservations, tm_back_substitute, tm_cost, tm_normal_and_schur,
        tm_solve_cameras,
    )

    n_dev = mesh.devices.size
    Pn, S = tobs.cam.shape
    cap = round_up(max(Pn, n_dev), n_dev)
    pad = cap - Pn
    xy = jnp.pad(tobs.xy, ((0, pad), (0, 0), (0, 0)))
    cam = jnp.pad(tobs.cam, ((0, pad), (0, 0)))
    mask = jnp.pad(tobs.mask, ((0, pad), (0, 0)))
    pts0 = jnp.pad(points, ((0, pad), (0, 0)))
    delta = jnp.float32(cfg.huber_delta)

    def local_normal(cams, pts_l, xy_l, cam_l, mask_l, lam):
        t = TrackObservations(xy=xy_l, cam=cam_l, mask=mask_l)
        S_r, rhs, aux = tm_normal_and_schur(
            cams, pts_l, t, K, dist, delta, lam)
        return jax.lax.psum(S_r, axis), jax.lax.psum(rhs, axis), aux

    normal_fn = jax.shard_map(
        local_normal, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P()),
        # aux is a nested-list pytree of (P_local,) lanes; the single
        # P(axis) spec broadcasts over the whole subtree (prefix semantics)
        out_specs=(P(), P(), P(axis)),
        check_vma=False,
    )
    cost_fn = jax.shard_map(
        lambda cams, pts_l, xy_l, cam_l, mask_l: jax.lax.psum(
            tm_cost(cams, pts_l,
                    TrackObservations(xy=xy_l, cam=cam_l, mask=mask_l),
                    K, dist, delta), axis),
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(),
        check_vma=False,
    )
    backsub_fn = jax.shard_map(
        lambda cam_l, aux, dc: tm_back_substitute(
            TrackObservations(xy=None, cam=cam_l, mask=None), aux, dc),
        mesh=mesh,
        in_specs=(P(axis), P(axis), P()),
        out_specs=P(axis),
        check_vma=False,
    )

    @jax.jit
    def run(cams, pts, xy, cam, mask):
        def step(carry, _):
            cams, pts, lam = carry
            cost = cost_fn(cams, pts, xy, cam, mask)
            S_r, rhs, aux = normal_fn(cams, pts, xy, cam, mask, lam)
            dc = tm_solve_cameras(S_r, rhs, n_fixed_cams)
            dp = backsub_fn(cam, aux, dc)
            new_cams = cams + dc
            new_pts = pts + dp
            new_cost = cost_fn(new_cams, new_pts, xy, cam, mask)
            accept = new_cost < cost
            cams = jnp.where(accept, new_cams, cams)
            pts = jnp.where(accept, new_pts, pts)
            lam = jnp.clip(jnp.where(accept, lam * cfg.lambda_down,
                                     lam * cfg.lambda_up), 1e-9, 1e6)
            return (cams, pts, lam), jnp.where(accept, new_cost, cost)

        (cams, pts, _), costs = jax.lax.scan(
            step, (cams, pts, jnp.float32(cfg.init_lambda)), None,
            length=cfg.max_iters)
        return cams, pts, costs

    with mesh:
        cams_o, pts_o, costs = run(cams, pts0, xy, cam, mask)
    return cams_o, pts_o[:Pn], costs
