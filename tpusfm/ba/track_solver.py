"""Track-major bundle adjustment — the at-scale solver.

The baseline solver (tpusfm/ba/solver.py) keeps the camera-point cross
blocks W dense as (P, V, 6, 3): natural at the reference's handful of views
but O(P*V) memory, which is exactly what the north star's "partitioning
keyframes and map blocks" rules out at pod-scale track counts (VERDICT r3
missing #6). This solver exploits the real sparsity: a track is observed in
at most S slots (S ~ 3-6), so observations are laid out TRACK-MAJOR as
(P, S) padded slots. All normal-equation quantities become fixed-shape
einsums over (P, S):

* U (V,6,6), g_c (V,6): scatter-adds keyed by the slot's camera id.
* V_p (P,3,3), g_p (P,3): slot-axis reductions, no scatter at all.
* The Schur complement S_cam = U - sum_p W_p V_p^-1 W_p^T needs only
  intra-track slot pairs: an (S, S) outer product per track, scatter-added
  into (V, 6, V, 6) — O(P*S^2) work and memory instead of O(P*V^2).
* The track axis is chunked with lax.map so peak memory is
  (chunk, S, S, 6, 6) regardless of P, and it is the psum-shardable axis
  for the distributed variant (tpusfm/dist/sharded_ba.py pattern).

Semantics match solver.bundle_adjust (equivalence-tested in
tests/test_ba.py); only the data layout and scaling behavior differ.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from tpusfm.ba.solver import _huber_weight, _residual_one
from tpusfm.ba.tracks import Observations
from tpusfm.config import BaConfig


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class TrackObservations:
    """Track-major padded observation table.

    xy (P, S, 2); cam (P, S) int32; mask (P, S) bool. Slot s of track p is
    the observation of point p in view cam[p, s]."""

    xy: Any
    cam: Any
    mask: Any

    def tree_flatten(self):
        return [self.xy, self.cam, self.mask], None

    @classmethod
    def tree_unflatten(cls, _, children):
        return cls(*children)

    @property
    def n_tracks(self) -> int:
        return self.xy.shape[0]

    @property
    def n_slots(self) -> int:
        return self.xy.shape[1]


def to_track_major(obs: Observations, n_tracks: int, n_slots: int | None = None,
                   pad_tracks: int | None = None) -> TrackObservations:
    """Flat observation table -> track-major slots (host-side packing)."""
    cam = np.asarray(obs.cam)
    pt = np.asarray(obs.pt)
    xy = np.asarray(obs.xy)
    m = np.asarray(obs.mask)
    counts = np.zeros(n_tracks, np.int64)
    for p in pt[m]:
        counts[p] += 1
    S = int(n_slots or max(int(counts.max(initial=1)), 2))
    P = int(pad_tracks or n_tracks)
    oxy = np.zeros((P, S, 2), np.float32)
    ocam = np.zeros((P, S), np.int32)
    om = np.zeros((P, S), bool)
    slot = np.zeros(n_tracks, np.int64)
    for o in range(len(pt)):
        if not m[o]:
            continue
        p = pt[o]
        s = slot[p]
        if s >= S:
            continue  # overfull track: drop the excess observation
        oxy[p, s] = xy[o]
        ocam[p, s] = cam[o]
        om[p, s] = True
        slot[p] = s + 1
    return TrackObservations(xy=jnp.asarray(oxy), cam=jnp.asarray(ocam),
                             mask=jnp.asarray(om))


def _slot_blocks(cams, points, tobs: TrackObservations, K, dist, delta):
    """Per-slot residual/Jacobian blocks.

    Returns A (P,S,2,6), B (P,S,2,3), r (P,S,2) — Huber-weighted, masked."""
    def one(cam_id, pt3, xy, m):
        params = jnp.concatenate([cams[cam_id], pt3])

        def f(q):
            return _residual_one(q[:6], q[6:], xy, K, dist)

        J = jax.jacfwd(f)(params)
        r = f(params)
        w = _huber_weight(jnp.sum(r * r), delta) * m.astype(jnp.float32)
        return (jnp.nan_to_num(J[:, :6]) * w, jnp.nan_to_num(J[:, 6:]) * w,
                jnp.nan_to_num(r) * w)

    P, S = tobs.cam.shape
    pts = jnp.repeat(points[:, None, :], S, axis=1)
    A, B, r = jax.vmap(jax.vmap(one))(tobs.cam, pts, tobs.xy, tobs.mask)
    return A, B, r


def tm_cost(cams, points, tobs: TrackObservations, K, dist, delta):
    def one(cam_id, pt3, xy, m):
        r = _residual_one(cams[cam_id], pt3, xy, K, dist)
        r2 = jnp.sum(r * r)
        rn = jnp.sqrt(jnp.maximum(r2, 1e-12))
        h = jnp.where(rn <= delta, 0.5 * r2, delta * (rn - 0.5 * delta))
        return jnp.where(m, h, 0.0)

    S = tobs.cam.shape[1]
    pts = jnp.repeat(points[:, None, :], S, axis=1)
    return jnp.sum(jax.vmap(jax.vmap(one))(tobs.cam, pts, tobs.xy, tobs.mask))


def tm_normal_and_schur(cams, points, tobs: TrackObservations, K, dist, delta,
                        lam, chunk: int = 8192):
    """One linearization: returns (S_r (V,6,V,6) Schur-reduced camera system,
    rhs (V,6), aux=(Vinv, W, g_p) for back-substitution).

    Chunked over the track axis: each lax.map step materializes only
    (chunk, S, S, 6, 6) before its scatter-add."""
    Vn = cams.shape[0]
    P, S = tobs.cam.shape
    n_chunks = P // chunk if P % chunk == 0 else -(-P // chunk)

    def chunk_terms(args):
        cxy, ccam, cmask, cpts = args
        ct = TrackObservations(xy=cxy, cam=ccam, mask=cmask)
        A, B, r = _slot_blocks(cams, cpts, ct, K, dist, delta)
        # camera-id reductions as ONE-HOT MXU contractions: a scatter-add
        # keyed on a handful of camera ids has massive index collisions,
        # which the TPU scatter lowering serializes (measured: the scatter
        # formulation left chip BA within 2x of a 2-core CPU); the same
        # segment-sum as onehot matmuls runs on the MXU.
        oh = jax.nn.one_hot(ccam, Vn, dtype=A.dtype)     # (c,S,V)
        AtA = jnp.einsum("psik,psil->pskl", A, A)
        Atr = jnp.einsum("psik,psi->psk", A, r)
        U_c = jnp.einsum("psv,pskl->vkl", oh, AtA)
        gc_c = -jnp.einsum("psv,psk->vk", oh, Atr)
        # point blocks
        Vp = jnp.einsum("psik,psil->pkl", B, B)
        gp = -jnp.einsum("psik,psi->pk", B, r)
        W = jnp.einsum("psik,psil->pskl", A, B)          # (c,S,6,3)
        Vd = Vp + lam * Vp * jnp.eye(3) + 1e-8 * jnp.eye(3)
        Vinv = jnp.linalg.inv(Vd)
        M = jnp.einsum("psia,pab->psib", W, Vinv)        # (c,S,6,3)
        Scon = -jnp.einsum("psib,ptjb->pstij", M, W)     # (c,S,S,6,6)
        Sv = jnp.einsum("psv,pstij->pvtij", oh, Scon)
        S_c = jnp.einsum("ptw,pvtij->viwj", oh, Sv)
        rhs_c = -jnp.einsum("psv,psi->vi", oh,
                            jnp.einsum("psib,pb->psi", M, gp))
        return (U_c, gc_c, S_c, rhs_c), (Vinv, W, gp)

    pad = n_chunks * chunk - P
    xy = jnp.pad(tobs.xy, ((0, pad), (0, 0), (0, 0)))
    cam = jnp.pad(tobs.cam, ((0, pad), (0, 0)))
    mask = jnp.pad(tobs.mask, ((0, pad), (0, 0)))
    pts = jnp.pad(points, ((0, pad), (0, 0)))
    args = (xy.reshape(n_chunks, chunk, S, 2), cam.reshape(n_chunks, chunk, S),
            mask.reshape(n_chunks, chunk, S), pts.reshape(n_chunks, chunk, 3))

    (U, gc, S_s, rhs_s), (Vinv, W, gp) = jax.lax.map(chunk_terms, args)
    U = jnp.sum(U, 0)
    gc = jnp.sum(gc, 0)
    S_sum = jnp.sum(S_s, 0)
    rhs_sum = jnp.sum(rhs_s, 0)
    Vinv = Vinv.reshape(-1, 3, 3)[:P]
    W = W.reshape(-1, S, 6, 3)[:P]
    gp = gp.reshape(-1, 3)[:P]

    Ud = U + lam * U * jnp.eye(6) + 1e-8 * jnp.eye(6)
    S_r = S_sum.at[jnp.arange(Vn), :, jnp.arange(Vn), :].add(Ud)
    rhs = gc + rhs_sum
    return S_r, rhs, (Vinv, W, gp)


def tm_solve_cameras(S_r, rhs, n_fixed_cams: int):
    Vn = rhs.shape[0]
    free = (jnp.arange(Vn) >= n_fixed_cams).astype(jnp.float32)
    Sf = S_r * free[:, None, None, None] * free[None, None, :, None]
    Sf = Sf.reshape(Vn * 6, Vn * 6) + jnp.diag(jnp.repeat(1.0 - free, 6))
    dc = jnp.linalg.solve(Sf, (rhs * free[:, None]).reshape(-1)).reshape(Vn, 6)
    return dc * free[:, None]


def tm_back_substitute(tobs: TrackObservations, aux, dc):
    Vinv, W, gp = aux
    # rhs_p = g_p - sum_s W_s^T dc[cam_s]
    dcs = dc[tobs.cam]                                   # (P,S,6)
    rhs_p = gp - jnp.einsum("psib,psi->pb", W, dcs)
    return jnp.einsum("pab,pb->pa", Vinv, rhs_p)


@functools.partial(jax.jit, static_argnames=("cfg", "n_fixed_cams", "chunk"))
def bundle_adjust_tm(cams, points, tobs: TrackObservations, K, dist,
                     cfg: BaConfig = BaConfig(), n_fixed_cams: int = 1,
                     chunk: int = 8192):
    """LM bundle adjustment over track-major observations.

    Same contract as solver.bundle_adjust: returns (cams, points, costs)."""
    delta = jnp.float32(cfg.huber_delta)

    def step(carry, _):
        cams, points, lam = carry
        cost = tm_cost(cams, points, tobs, K, dist, delta)
        S_r, rhs, aux = tm_normal_and_schur(
            cams, points, tobs, K, dist, delta, lam, chunk)
        dc = tm_solve_cameras(S_r, rhs, n_fixed_cams)
        dp = tm_back_substitute(tobs, aux, dc)
        new_cams = cams + dc
        new_points = points + dp
        new_cost = tm_cost(new_cams, new_points, tobs, K, dist, delta)
        accept = new_cost < cost
        cams = jnp.where(accept, new_cams, cams)
        points = jnp.where(accept, new_points, points)
        lam = jnp.clip(jnp.where(accept, lam * cfg.lambda_down,
                                 lam * cfg.lambda_up), 1e-9, 1e6)
        return (cams, points, lam), jnp.where(accept, new_cost, cost)

    (cams, points, _), costs = jax.lax.scan(
        step, (cams, points, jnp.float32(cfg.init_lambda)), None,
        length=cfg.max_iters)
    return cams, points, costs
