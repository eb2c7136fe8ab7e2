"""Per-stage profile of the bundle-adjustment LM step (VERDICT r4 #8).

Measures true DEVICE time of each stage of the track-major LM step and of
the flat solver's step: each stage runs inside a jitted lax.scan loop with
per-rep perturbed inputs and every output reduced to one scalar in-jit, so
nothing large crosses the tunnel and per-dispatch overhead amortizes (the
naive per-call timing fetches the (P,S,2,6) block tensors — megabytes —
and reports tunnel time, not kernel time; same lesson as the r4->r5
roofline rebuild, scripts/roofline.py:device_time).

Writes out/BA_STEP_PROFILE.json and prints one JSON line per row.

Usage: python scripts/ba_step_profile.py [--sizes 8192x6,32768x12,131072x24]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

from scaling_bench import synth_ba_problem  # noqa: E402

DISPATCH_S = 0.025  # measured per-program tunnel overhead (roofline.py)


def device_time_ms(stage, cams0, reps=8):
    """Device time of stage(cams)->pytree via an in-jit scan, ms/rep."""
    import functools
    import jax
    import jax.numpy as jnp

    def scalar(o):
        return sum(jnp.sum(leaf.astype(jnp.float32) * 1e-12)
                   for leaf in jax.tree_util.tree_leaves(o))

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(c, n: int):
        def body(carry, r):
            o = stage(c + r.astype(jnp.float32) * 1e-7)
            return carry + scalar(o), None
        out, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(n, dtype=jnp.int32))
        return out

    _ = np.asarray(loop(cams0, 1))
    _ = np.asarray(loop(cams0, reps))   # throwaway first timed series
    best = None
    for p in (1e-6, 2e-6, 3e-6):
        t0 = time.perf_counter()
        _ = np.asarray(loop(cams0 + p, reps))
        dt = (time.perf_counter() - t0 - DISPATCH_S) / reps
        best = dt if best is None else min(best, dt)
    return max(best, 1e-6) * 1e3


def profile_tm(n_tracks, n_views):
    import jax
    import jax.numpy as jnp
    from tpusfm.ba.track_solver import (_slot_blocks, bundle_adjust_tm,
                                        tm_back_substitute, tm_cost,
                                        tm_normal_and_schur, tm_solve_cameras,
                                        to_track_major)
    from tpusfm.config import BaConfig

    K, dist, cams0, X0, obs = synth_ba_problem(n_views, n_tracks, 3)
    tobs = to_track_major(obs, n_tracks=n_tracks)
    delta = jnp.float32(2.0)
    lam = jnp.float32(1e-3)

    rows = {}
    rows["slot_blocks"] = device_time_ms(
        lambda c: _slot_blocks(c, X0, tobs, K, dist, delta), cams0)
    rows["normal_schur"] = device_time_ms(
        lambda c: tm_normal_and_schur(c, X0, tobs, K, dist, delta, lam), cams0)

    S_r, rhs, aux = jax.jit(
        lambda c: tm_normal_and_schur(c, X0, tobs, K, dist, delta, lam))(cams0)
    rows["solve_cameras"] = device_time_ms(
        lambda c: tm_solve_cameras(S_r + jnp.sum(c) * 1e-12, rhs, 1), cams0)
    dc = tm_solve_cameras(S_r, rhs, 1)
    rows["back_substitute"] = device_time_ms(
        lambda c: tm_back_substitute(tobs, aux, dc + jnp.sum(c) * 1e-12), cams0)
    rows["cost"] = device_time_ms(
        lambda c: tm_cost(c, X0, tobs, K, dist, delta), cams0)

    cfg = BaConfig(max_iters=2)
    rows["full_step"] = device_time_ms(
        lambda c: bundle_adjust_tm(c, X0, tobs, K, dist, cfg, 1)[2],
        cams0, reps=4) / cfg.max_iters
    return rows


def profile_flat(n_tracks, n_views):
    import jax.numpy as jnp
    from tpusfm.ba.solver import (build_normal_blocks, bundle_adjust,
                                  compute_cost, schur_solve)
    from tpusfm.config import BaConfig

    K, dist, cams0, X0, obs = synth_ba_problem(n_views, n_tracks, 3)
    delta = jnp.float32(2.0)
    lam = jnp.float32(1e-3)

    rows = {}
    rows["normal_blocks"] = device_time_ms(
        lambda c: build_normal_blocks(c, X0, obs, K, dist, delta), cams0)

    import jax
    U, Vp, W, g_c, g_p, cost = jax.jit(
        lambda c: build_normal_blocks(c, X0, obs, K, dist, delta))(cams0)
    rows["schur_solve"] = device_time_ms(
        lambda c: schur_solve(U + jnp.sum(c) * 1e-12, Vp, W, g_c, g_p, lam, 1),
        cams0)
    rows["cost"] = device_time_ms(
        lambda c: compute_cost(c, X0, obs, K, dist, delta), cams0)

    cfg = BaConfig(max_iters=2)
    rows["full_step"] = device_time_ms(
        lambda c: bundle_adjust(c, X0, obs, K, dist, cfg, 1)[2],
        cams0, reps=4) / cfg.max_iters
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="8192x6,32768x12,131072x24")
    ap.add_argument("--flat-sizes", default="8192x6")
    args = ap.parse_args()
    import jax

    path = "out/BA_STEP_PROFILE.json"
    out = {"backend": jax.default_backend()}
    if os.path.exists(path):
        with open(path) as f:
            prev = json.load(f)
        if prev.get("backend") == out["backend"]:
            out = prev
    os.makedirs("out", exist_ok=True)

    def record(key, rows, solver, spec):
        out[key] = {k: round(ms, 2) for k, ms in rows.items()}
        print(json.dumps({"solver": solver, "size": spec, **out[key]}),
              flush=True)
        with open(path, "w") as f:   # incremental: survive timeouts
            json.dump(out, f, indent=2)

    for spec in filter(None, args.flat_sizes.split(",")):
        t, v = (int(x) for x in spec.split("x"))
        record(f"flat_{t}t_{v}v", profile_flat(t, v), "flat", spec)
    for spec in filter(None, args.sizes.split(",")):
        t, v = (int(x) for x in spec.split("x"))
        record(f"tm_{t}t_{v}v", profile_tm(t, v), "tm", spec)


if __name__ == "__main__":
    main()
