"""Per-step collective-communication model for the distributed paths.

Real multi-chip hardware is not reachable from this container (SURVEY.md §4),
so the >=80%-scaling claim is argued analytically (VERDICT r3 #8): this
script compiles each distributed workload for an 8-device mesh, walks the
optimized HLO for collective ops (all-reduce, all-gather, collective-permute,
reduce-scatter), sums the bytes they move per step, pairs that with XLA's
own FLOP estimate, and projects scaling efficiency at 2/4/8 chips from the
roofline  t_step(n) = max(compute(n), comm(n))  with

  compute(n) = flops / n / PEAK_FLOPS          (work splits over chips)
  comm(n)    = bytes_per_device(n) / ICI_BW    (rides ICI, overlap ignored
                                                -> conservative)

Chip constants (public v5e): 197 TFLOP/s bf16 (98.5 f32), HBM 819 GB/s,
ICI 1600 Gbit/s per chip aggregate (~200 GB/s). Writes out/COMM_MODEL.json
and prints the RESULTS.md table.
"""
from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import numpy as np  # noqa: E402

PEAK_F32 = 98.5e12          # v5e MXU, f32 accumulate path
ICI_BW = 200e9              # bytes/s per chip, 1600 Gbps aggregate
_DTYPE_BYTES = {"f32": 4, "f16": 2, "bf16": 2, "s32": 4, "u32": 4, "pred": 1,
                "f64": 8, "s64": 8, "u8": 1, "s8": 1}

_KINDS = ("all-reduce", "all-gather", "collective-permute", "reduce-scatter",
          "all-to-all")
_SHAPE = re.compile(r"([a-z0-9]+)\[([\d,]*)\]")


def collective_bytes(hlo_text: str) -> dict:
    """Sum output bytes of each collective kind in an optimized HLO dump.

    Parses each op line's LHS shape(s) — per-device bytes in the SPMD
    module. Async pairs count once (the -start line carries the shapes)."""
    out = {}
    for line in hlo_text.splitlines():
        for kind in _KINDS:
            tok = f" {kind}("
            tok_s = f" {kind}-start("
            if tok in line or tok_s in line:
                lhs = line.split(tok_s if tok_s in line else tok)[0]
                if "=" in lhs:
                    lhs = lhs.split("=", 1)[1]
                total = 0
                for dt, dims in _SHAPE.findall(lhs):
                    if dt not in _DTYPE_BYTES:
                        continue
                    n = 1
                    for d in dims.split(","):
                        if d:
                            n *= int(d)
                    total += n * _DTYPE_BYTES[dt]
                out[kind] = out.get(kind, 0) + total
                break
    return out


HBM_BW = 819e9


def analyze(name, jitted, args, flops_total, hbm_bytes_total,
            permute_hops_per_step: int = 0):
    """Compile for the 8-device mesh, extract per-device collective bytes
    from the optimized HLO, and project scaling efficiency.

    flops_total / hbm_bytes_total: ANALYTIC totals for one step of the whole
    problem (XLA's CPU cost model is unreliable for these programs); the
    compute leg divides over chips and is bounded by whichever of MXU
    throughput or HBM bandwidth binds. The comm leg: all-reduce rings move
    2(n-1)/n x payload per device; a collective-permute inside a scan
    executes once per hop, so its HLO bytes are multiplied by the hop count.
    Conservative: no compute/comm overlap assumed."""
    import jax

    compiled = jax.jit(jitted).lower(*args).compile()
    coll = collective_bytes(compiled.as_text())
    proj = {}
    for n in (2, 4, 8):
        t_comp = max(flops_total / n / PEAK_F32, hbm_bytes_total / n / HBM_BW)
        t_comm = 0.0
        for kind, b in coll.items():
            if kind == "collective-permute":
                hops = permute_hops_per_step if permute_hops_per_step else (n - 1)
                t_comm += b * hops / ICI_BW
            else:
                t_comm += b * 2.0 * (n - 1) / n / ICI_BW
        eff = t_comp / (t_comp + t_comm) if (t_comp + t_comm) > 0 else 1.0
        proj[n] = round(eff, 4)
    return {"collective_bytes_per_step_per_device": {k: int(v) for k, v in coll.items()},
            "bytes_per_step": int(sum(coll.values())),
            "flops_per_step": flops_total,
            "hbm_bytes_per_step": hbm_bytes_total,
            "efficiency_projection": proj}


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "..", "tests"))
    import conftest  # noqa: F401  (forces the 8-device CPU mesh)
    from test_ba import _synthetic_problem
    from tpusfm.dist.mesh import make_mesh
    from tpusfm.config import BaConfig

    mesh = make_mesh()
    results = {}

    # --- sharded BA (flat observation sharding), 4096 tracks x 3 obs ---
    K, dist, cams, X, obs = _synthetic_problem(n_views=6, n_points=4096)
    from tpusfm.dist import sharded_ba as sba
    from tpusfm.ba.tracks import pad_observations
    from tpusfm.utils.pad import round_up

    cfg = BaConfig(max_iters=1)
    obs_p = pad_observations(obs, round_up(obs.xy.shape[0], 8))
    blocks_fn = sba._sharded_blocks_fn(mesh, "d")
    # ~1.5 kFLOP/obs (jacfwd of the 9-param residual + per-obs einsums);
    # HBM ~ the W blocks written+read, P*V*18*4 bytes x2
    with mesh:
        results["sharded_ba_flat_4096t_6v"] = analyze(
            "sharded_ba", blocks_fn,
            (cams, X, obs_p.xy, obs_p.cam, obs_p.pt, obs_p.mask, K, dist,
             jnp.float32(2.0)),
            flops_total=1500.0 * obs_p.xy.shape[0],
            hbm_bytes_total=2 * 4096 * 6 * 18 * 4 + 48 * obs_p.xy.shape[0])

    # --- track-major sharded BA, same problem ---
    from tpusfm.ba.track_solver import to_track_major, tm_normal_and_schur, TrackObservations
    tobs = to_track_major(obs, n_tracks=4096)
    from jax.sharding import PartitionSpec as P

    def tm_local(cams, pts, xy, cam, mask, lam):
        t = TrackObservations(xy=xy, cam=cam, mask=mask)
        S_r, rhs, aux = tm_normal_and_schur(cams, pts, t, K, dist,
                                            jnp.float32(2.0), lam)
        return jax.lax.psum(S_r, "d"), jax.lax.psum(rhs, "d")

    tm_fn = jax.shard_map(tm_local, mesh=mesh,
                          in_specs=(P(), P("d"), P("d"), P("d"), P("d"), P()),
                          out_specs=(P(), P()), check_vma=False)
    with mesh:
        results["sharded_ba_tm_4096t_6v"] = analyze(
            "tm", tm_fn, (cams, X, tobs.xy, tobs.cam, tobs.mask,
                          jnp.float32(1e-3)),
            flops_total=2500.0 * obs_p.xy.shape[0],
            hbm_bytes_total=150 * 4 * obs_p.xy.shape[0])

    # the same track-major path at a production size: 131072 tracks, 24 views
    Pn, Vb = 131072, 24
    camsL = jnp.zeros((Vb, 6)).at[:, 5].set(1.0)
    rngL = np.random.default_rng(0)
    XL = jnp.asarray(rngL.uniform(-1, 1, (Pn, 3)).astype(np.float32) + [0, 0, 8])
    Sslots = 4
    tcam = jnp.asarray(rngL.integers(0, Vb, (Pn, Sslots)).astype(np.int32))
    txyL = jnp.zeros((Pn, Sslots, 2), jnp.float32)
    tmaskL = jnp.ones((Pn, Sslots), bool)

    def tm_localL(cams, pts, xy, cam, mask, lam):
        t = TrackObservations(xy=xy, cam=cam, mask=mask)
        S_r, rhs, aux = tm_normal_and_schur(cams, pts, t, K, dist,
                                            jnp.float32(2.0), lam)
        return jax.lax.psum(S_r, "d"), jax.lax.psum(rhs, "d")

    tm_fnL = jax.shard_map(tm_localL, mesh=mesh,
                           in_specs=(P(), P("d"), P("d"), P("d"), P("d"), P()),
                           out_specs=(P(), P()), check_vma=False)
    with mesh:
        results["sharded_ba_tm_131072t_24v"] = analyze(
            "tmL", tm_fnL, (camsL, XL, txyL, tcam, tmaskL, jnp.float32(1e-3)),
            flops_total=2500.0 * Pn * Sslots,
            hbm_bytes_total=150 * 4 * Pn * Sslots)

    # --- ring NN matching: 64k x 64k x 128 over 8 devices ---
    from tpusfm.dist.ring_match import ring_nn_search
    q = jnp.zeros((65536, 128), jnp.float32)
    db = jnp.zeros((65536, 128), jnp.float32)
    dbm = jnp.ones((65536,), jnp.float32)

    def ring(q, db, dbm):
        return ring_nn_search(q, db, dbm, mesh, block=2048)

    with mesh:
        results["ring_nn_64k"] = analyze(
            "ring", ring, (q, db, dbm),
            flops_total=2.0 * 65536 * 65536 * 128,
            hbm_bytes_total=2 * 65536 * 128 * 4 * 8,
            permute_hops_per_step=7)

    # --- sharded GMS: 1M matches ---
    from tpusfm.dist.sharded_gms import sharded_gms_filter  # noqa: F401
    from tpusfm.match.gms import _scale_pass, _rotation_perms
    from tpusfm.config import GmsConfig
    n = 1 << 20
    xy = jnp.zeros((n, 2), jnp.float32)
    mm = jnp.ones((n,), bool)
    gcfg = GmsConfig()

    def gms_local(xy1, xy2, m):
        return _scale_pass(xy1, xy2, m, (1920, 1080), (1920, 1080), gcfg,
                           20, 20, _rotation_perms()[:1], axis_name="d")

    gms_fn = jax.shard_map(gms_local, mesh=mesh,
                           in_specs=(P("d"), P("d"), P("d")),
                           out_specs=P(None, "d"), check_vma=False)
    with mesh:
        results["sharded_gms_1M"] = analyze(
            "gms", gms_fn, (xy, xy, mm),
            flops_total=25.0 * n * 4,
            hbm_bytes_total=48 * n * 4)

    # --- sharded pose graph: 64 nodes, 256 edges ---
    from tpusfm.pgo.graph import build_normal_system
    Nn = 64
    E = 256
    Rn = jnp.broadcast_to(jnp.eye(3), (Nn, 3, 3))
    tn = jnp.zeros((Nn, 3))
    ei = jnp.zeros((E,), jnp.int32)
    ej = jnp.ones((E,), jnp.int32)
    Zr = jnp.broadcast_to(jnp.eye(3), (E, 3, 3))
    Zt = jnp.zeros((E, 3))
    wgt = jnp.ones((E,))

    def pgo_local(R, t, ei, ej, Zr, Zt, w):
        H, g, c = build_normal_system(R, t, ei, ej, Zr, Zt, w, Nn)
        return (jax.lax.psum(H, "d"), jax.lax.psum(g, "d"),
                jax.lax.psum(c, "d"))

    pgo_fn = jax.shard_map(pgo_local, mesh=mesh,
                           in_specs=(P(), P(), P("d"), P("d"), P("d"), P("d"), P("d")),
                           out_specs=(P(), P(), P()), check_vma=False)
    with mesh:
        results["sharded_pgo_64n_256e"] = analyze(
            "pgo", pgo_fn, (Rn, tn, ei, ej, Zr, Zt, wgt),
            flops_total=8000.0 * E,
            hbm_bytes_total=600.0 * E)

    # --- FUSED dense mode: ring NN (64k x 64k x 128) + GMS votes (r5) ---
    from tpusfm.dist.fused_dense import ring_match_gms
    xyq = jnp.zeros((65536, 2), jnp.float32)
    xyd = jnp.zeros((65536, 2), jnp.float32)

    def fused(q, db, dbm, xyq, xyd):
        return ring_match_gms(q, db, dbm, xyq, xyd, (1920, 1080),
                              (1920, 1080), mesh, GmsConfig(), block=2048)

    results["fused_ring_gms_64k"] = analyze(
        "fused", fused, (q, db, dbm, xyq, xyd),
        flops_total=2.0 * 65536 * 65536 * 128 + 25.0 * 65536 * 4,
        hbm_bytes_total=2 * 65536 * 128 * 4 * 8,
        permute_hops_per_step=7)

    # --- matrix-free CG pose graph: 1024 nodes, 4096 edges (r5) ---
    from tpusfm.pgo.graph import PgoConfig, lm_cg_core
    Nn2, E2 = 1024, 4096
    cg_iters = 128
    Rn2 = jnp.broadcast_to(jnp.eye(3), (Nn2, 3, 3))
    tn2 = jnp.zeros((Nn2, 3))
    rng2 = np.random.default_rng(3)
    ei2 = jnp.asarray(rng2.integers(0, Nn2, E2).astype(np.int32))
    ej2 = jnp.asarray(rng2.integers(0, Nn2, E2).astype(np.int32))
    Zr2 = jnp.broadcast_to(jnp.eye(3), (E2, 3, 3))
    Zt2 = jnp.zeros((E2, 3))
    w2 = jnp.ones((E2,))
    cg_cfg = PgoConfig(max_iters=1, cg_iters=cg_iters)

    pgo_cg_fn = jax.shard_map(
        lambda R, t, a, b, zr, zt, ww: lm_cg_core(
            R, t, a, b, zr, zt, ww, Nn2, cg_cfg, 1,
            reduce_fn=lambda x: jax.lax.psum(x, "d")),
        mesh=mesh,
        in_specs=(P(), P(), P("d"), P("d"), P("d"), P("d"), P("d")),
        out_specs=(P(), P(), P()), check_vma=False)
    with mesh:
        results["sharded_pgo_cg_1024n_4096e"] = analyze(
            "pgo_cg", pgo_cg_fn, (Rn2, tn2, ei2, ej2, Zr2, Zt2, w2),
            # per LM step: linearize ~8 kFLOP/edge + cg_iters x (~600
            # FLOP/edge block products + (N,6) vector algebra)
            flops_total=E2 * (8000.0 + cg_iters * 600.0),
            # per CG iter: re-read the (E,3,6,6) blocks + vectors
            hbm_bytes_total=cg_iters * (E2 * 3 * 36 * 4 + Nn2 * 6 * 16))

    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "out", "COMM_MODEL.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2, default=str)
    print(json.dumps(results, indent=2, default=str))
    print("->", out)

    print("\n| workload | bytes/step | GFLOP/step | eff@2 | eff@4 | eff@8 |")
    print("|---|---|---|---|---|---|")
    for k, v in results.items():
        p = v["efficiency_projection"]
        print(f"| {k} | {v['bytes_per_step']:,} | "
              f"{v['flops_per_step']/1e9:.2f} | {p[2]:.1%} | {p[4]:.1%} | {p[8]:.1%} |")


if __name__ == "__main__":
    main()
