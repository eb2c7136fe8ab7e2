"""BA-iterations/s + device-scaling benchmark (BASELINE north-star metrics).

Measures:
  1. bundle-adjustment iterations/s, single device, on a realistic problem
     (default 6 views x 8192 tracks x ~3 obs/track — the multi-view extension
     of the reference's two-view pipeline, SURVEY.md §2.4);
  2. the 1 -> 2 -> 4 -> 8 device curve for the two flagship distributed
     kernels: sharded_bundle_adjust (psum-Schur) and ring_nn_search
     (ppermute ring matching), on whatever mesh is available (real chips on
     a pod slice; virtual CPU devices when run under
     XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu).

Writes out/SCALING.json and prints one JSON line per measurement. NOTE: on a
virtual CPU mesh the devices share physical cores (this container has 2),
so wall-clock scaling saturates at the core count — the curve validates
sharding *correctness + overhead*, not hardware speedup; real scaling needs
real chips.

Usage: python scripts/scaling_bench.py [--views 6] [--tracks 8192] [--iters 20]
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


def synth_ba_problem(n_views, n_tracks, obs_per_track, seed=0):
    import jax.numpy as jnp
    from tpusfm.ba.tracks import Observations
    from tpusfm.geometry.projection import project_points

    rng = np.random.default_rng(seed)
    K = jnp.array([[600.0, 0, 320], [0, 600, 240], [0, 0, 1]])
    dist = jnp.zeros(5)
    X = rng.uniform([-2, -2, 6], [2, 2, 10], size=(n_tracks, 3)).astype(np.float32)
    cams = np.stack([
        np.array([0.02 * v, 0.12 * v - 0.2, 0.01 * v,
                  0.4 * v - 1.0, 0.04 * v, 0.08 * v], np.float32)
        for v in range(n_views)
    ])
    # each track observed in `obs_per_track` consecutive views
    xy, cam_i, pt_i = [], [], []
    start = rng.integers(0, max(1, n_views - obs_per_track + 1), size=n_tracks)
    for v in range(n_views):
        sel = (start <= v) & (v < start + obs_per_track)
        ids = np.nonzero(sel)[0]
        import jax.numpy as jnp
        pix = np.array(project_points(jnp.array(X[ids]), jnp.array(cams[v, :3]),
                                      jnp.array(cams[v, 3:]), K, dist))
        pix += rng.normal(size=pix.shape) * 0.3
        xy.append(pix.astype(np.float32))
        cam_i.append(np.full(len(ids), v, np.int32))
        pt_i.append(ids.astype(np.int32))
    xy = np.concatenate(xy)
    obs = Observations(
        xy=jnp.asarray(xy),
        cam=jnp.asarray(np.concatenate(cam_i)),
        pt=jnp.asarray(np.concatenate(pt_i)),
        mask=jnp.ones(len(xy), bool),
    )
    cams0 = cams + np.concatenate(
        [np.zeros((1, 6)), rng.normal(size=(n_views - 1, 6)) * 0.01]).astype(np.float32)
    X0 = X + rng.normal(size=X.shape).astype(np.float32) * 0.03
    return K, dist, jnp.asarray(cams0), jnp.asarray(X0), obs


def bench_ba_iters(args):
    import jax
    import jax.numpy as jnp
    from tpusfm.ba.solver import bundle_adjust
    from tpusfm.config import BaConfig

    K, dist, cams0, X0, obs = synth_ba_problem(args.views, args.tracks, 3)
    n_obs = obs.xy.shape[0]
    cfg = BaConfig(max_iters=args.iters)
    # warmup (compile); device_get closes the measured region — on the
    # tunneled backend block_until_ready can return early
    t0 = time.perf_counter()
    c, p, costs = bundle_adjust(cams0, X0, obs, K, dist, cfg, 1)
    _ = np.asarray(costs)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    reps = 3
    outs = [bundle_adjust(cams0 + (r + 1) * 1e-6, X0, obs, K, dist, cfg, 1)
            for r in range(reps)]
    _ = [np.asarray(o[2]) for o in outs]
    costs = outs[-1][2]
    dt = (time.perf_counter() - t0) / reps
    iters_per_s = args.iters / dt
    return {
        "metric": "ba_iters_per_s",
        "value": round(iters_per_s, 2),
        "n_views": args.views, "n_tracks": args.tracks, "n_obs": int(n_obs),
        "cost_drop": float(np.asarray(costs)[0] / max(np.asarray(costs)[-1], 1e-9)),
        "compile_s": round(compile_s, 1),
        "backend": jax.default_backend(),
    }


def bench_ba_tm(args):
    """Track-major BA at production sizes (VERDICT r4 #6): chip iters/s at
    32k/128k tracks and 12/24 views with the O(P*S^2) Schur assembly."""
    import jax
    import jax.numpy as jnp
    from tpusfm.ba.track_solver import bundle_adjust_tm, to_track_major
    from tpusfm.config import BaConfig

    out = {}
    sizes = [(int(t), int(v)) for t, v in
             (s.split("x") for s in args.tm_sizes.split(","))]
    for n_tracks, n_views in sizes:
        K, dist, cams0, X0, obs = synth_ba_problem(n_views, n_tracks, 3)
        tobs = to_track_major(obs, n_tracks=n_tracks)
        cfg = BaConfig(max_iters=args.iters)
        t0 = time.perf_counter()
        c, p, costs = bundle_adjust_tm(cams0, X0, tobs, K, dist, cfg, 1)
        _ = np.asarray(costs)
        compile_s = time.perf_counter() - t0
        reps = 3
        t0 = time.perf_counter()
        outs = [bundle_adjust_tm(cams0 + (r + 1) * 1e-6, X0, tobs, K, dist,
                                 cfg, 1) for r in range(reps)]
        _ = [np.asarray(o[2]) for o in outs]
        dt = (time.perf_counter() - t0) / reps
        key = f"{n_tracks}t_{n_views}v"
        out[key] = {
            "iters_per_s": round(args.iters / dt, 2),
            "n_obs": int(np.asarray(tobs.mask).sum()),
            "cost_drop": float(np.asarray(outs[-1][2])[0]
                               / max(float(np.asarray(outs[-1][2])[-1]), 1e-9)),
            "compile_s": round(compile_s, 1),
        }
        print(json.dumps({"metric": "ba_tm_iters_per_s", "config": key,
                          **out[key]}), flush=True)
    return out


def bench_scaling(args):
    import jax
    import jax.numpy as jnp
    from tpusfm.ba.solver import bundle_adjust
    from tpusfm.config import BaConfig
    from tpusfm.dist.mesh import make_mesh
    from tpusfm.dist.ring_match import ring_nn_search
    from tpusfm.dist.sharded_ba import sharded_bundle_adjust

    n_avail = jax.device_count()
    sizes = [n for n in (1, 2, 4, 8) if n <= n_avail]
    out = {"devices_available": n_avail, "physical_cores": os.cpu_count(),
           "sharded_ba": {}, "ring_nn": {}}

    K, dist, cams0, X0, obs = synth_ba_problem(args.views, args.tracks // 4, 3)
    cfg = BaConfig(max_iters=args.iters)
    for n in sizes:
        mesh = make_mesh(n)
        c, p, costs = sharded_bundle_adjust(cams0, X0, obs, K, dist, mesh, cfg, 1)
        jax.block_until_ready(costs)
        t0 = time.perf_counter()
        for _ in range(2):
            c, p, costs = sharded_bundle_adjust(cams0 + 1e-6, X0, obs, K, dist, mesh, cfg, 1)
            jax.block_until_ready(costs)
        dt = (time.perf_counter() - t0) / 2
        out["sharded_ba"][n] = round(args.iters / dt, 2)

    rng = np.random.default_rng(3)
    nq = ndb = 8192
    q = jnp.asarray(rng.standard_normal((nq, 128)), jnp.float32)
    db = jnp.asarray(rng.standard_normal((ndb, 128)), jnp.float32)
    m = jnp.ones((ndb,), jnp.float32)
    for n in sizes:
        mesh = make_mesh(n)
        idx, b, s = ring_nn_search(q, db, m, mesh)
        jax.block_until_ready(idx)
        t0 = time.perf_counter()
        for _ in range(3):
            idx, b, s = ring_nn_search(q, db, m, mesh)
            jax.block_until_ready(idx)
        dt = (time.perf_counter() - t0) / 3
        out["ring_nn"][n] = round(nq * ndb / dt / 1e9, 3)  # G pair-distances/s

    # data-parallel two-view SfM (pairs/s), pair axis sharded over the mesh
    import jax.tree_util as jtu
    from tpusfm.config import MatchConfig, PipelineConfig, RansacConfig, SiftConfig
    from tpusfm.dist.pair_parallel import parallel_two_view
    from tpusfm.geometry.projection import project_points
    from tpusfm.types import CameraIntrinsics, Features, Keypoints

    out["pair_parallel_two_view"] = {}
    rng = np.random.default_rng(4)
    n_kp = 512
    intr2 = CameraIntrinsics.ideal(300.0, 300.0, 160.0, 120.0)
    X = rng.uniform([-2, -2, 6], [2, 2, 10], size=(n_kp, 3)).astype(np.float32)
    base_desc = rng.normal(size=(n_kp, 64)).astype(np.float32) * 5
    fs = []
    for v in range(2):
        rv = jnp.asarray(np.array([0.0, 0.12 * v, 0.0], np.float32))
        tv = jnp.asarray(np.array([0.5 * v, 0.0, 0.0], np.float32))
        pix = np.array(project_points(jnp.asarray(X), rv, tv, intr2.K, intr2.dist))
        pix += rng.normal(size=pix.shape).astype(np.float32) * 0.2
        fs.append(Features(
            kpts=Keypoints(xy=jnp.asarray(pix.astype(np.float32)),
                           scale=jnp.ones(n_kp), angle=jnp.zeros(n_kp),
                           response=jnp.ones(n_kp), mask=jnp.ones(n_kp, bool)),
            desc=jnp.asarray(base_desc + rng.normal(size=base_desc.shape).astype(np.float32) * 0.01),
        ))
    cfg2 = PipelineConfig(match=MatchConfig(max_matches=256),
                          ransac=RansacConfig(n_hypotheses=64))
    B = 2 * max(sizes)
    f1 = jtu.tree_map(lambda a: jnp.broadcast_to(a[None], (B,) + a.shape), fs[0])
    f2 = jtu.tree_map(lambda a: jnp.broadcast_to(a[None], (B,) + a.shape), fs[1])
    for n in sizes:
        mesh = make_mesh(n)
        r = parallel_two_view(f1, f2, intr2, mesh, cfg2)
        jax.block_until_ready(r.points3d)
        t0 = time.perf_counter()
        for _ in range(3):
            r = parallel_two_view(f1, f2, intr2, mesh, cfg2)
            jax.block_until_ready(r.points3d)
        dt = (time.perf_counter() - t0) / 3
        out["pair_parallel_two_view"][n] = round(B / dt, 2)  # pairs/s

    # pipeline parallelism vs data parallelism on the SAME image workload
    # (VERDICT r2: pipeline path was equivalence-tested but never timed).
    # Stages include SIFT, so this section uses real (small) images.
    from tpusfm.io import imread_gray
    from tpusfm.sfm.pipelined import two_view_pipelined, two_view_stages

    g1 = np.asarray(jax.image.resize(
        jnp.array(imread_gray("/root/reference/SfM-GMS/SourceImages/PikaBun1.jpg")),
        (126, 168), "linear"))
    g2 = np.asarray(jax.image.resize(
        jnp.array(imread_gray("/root/reference/SfM-GMS/SourceImages/PikaBun4.jpg")),
        (126, 168), "linear"))
    cfg3 = PipelineConfig(sift=SiftConfig(max_features=256),
                          match=MatchConfig(max_matches=128),
                          ransac=RansacConfig(n_hypotheses=64))
    intr3 = CameraIntrinsics.ideal(0.838 * 168, 0.838 * 168, 84.0, 63.0)
    M = 8
    pairs = jnp.asarray(np.stack(
        [np.stack([g1 + i * 1e-5, g2]) for i in range(M)]))
    out["pipeline_vs_serial_two_view"] = {}
    # serial single-device reference: stage chain per pair
    st = two_view_stages(intr3, cfg3, 2)
    import jax.tree_util as jtu

    def serial():
        return [st[1](st[0](jtu.tree_map(lambda a: a[i], pairs))) for i in range(M)]
    r = serial(); jax.block_until_ready(r[-1].points3d)
    t0 = time.perf_counter()
    for _ in range(2):
        r = serial(); jax.block_until_ready(r[-1].points3d)
    out["pipeline_vs_serial_two_view"]["serial_1dev"] = round(
        M / ((time.perf_counter() - t0) / 2), 2)
    for n in (2, 4):
        if n > n_avail:
            continue
        mesh = make_mesh(n)
        rp = two_view_pipelined(pairs, intr3, mesh, cfg3)
        jax.block_until_ready(rp.points3d)
        t0 = time.perf_counter()
        for _ in range(2):
            rp = two_view_pipelined(pairs, intr3, mesh, cfg3)
            jax.block_until_ready(rp.points3d)
        out["pipeline_vs_serial_two_view"][f"pipeline_{n}stage"] = round(
            M / ((time.perf_counter() - t0) / 2), 2)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=6)
    ap.add_argument("--tracks", type=int, default=8192)
    ap.add_argument("--tm", action="store_true",
                    help="also run the track-major at-scale BA benchmark "
                         "(32k/128k tracks, 12/24 views)")
    ap.add_argument("--tm-sizes", default="32768x12,131072x24",
                    help="track-major benchmark sizes as TRACKSxVIEWS,...")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--skip-scaling", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="force the 8-virtual-device CPU backend (the "
                         "container's sitecustomize pins JAX_PLATFORMS=axon, "
                         "so an env var alone is not enough)")
    ap.add_argument("--out", default="out/SCALING.json")
    args = ap.parse_args()

    if args.cpu:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
        import jax

        jax.config.update("jax_platforms", "cpu")

    results = {"ba_single": bench_ba_iters(args)}
    print(json.dumps(results["ba_single"]))
    if getattr(args, "tm", False):
        results["ba_track_major"] = bench_ba_tm(args)
    if not args.skip_scaling:
        results["scaling"] = bench_scaling(args)
        print(json.dumps(results["scaling"]))
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"-> {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
