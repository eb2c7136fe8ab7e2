"""tpusfm command-line interface.

The reference declared a CLI grammar but never wired it up
(/root/reference/SfM-GMS/SfM-GMS/main.h:22-27, main.cpp:15-17 — parser call
commented out, everything hard-coded). Here every demo in the reference
driver is a working subcommand:

  match      feature matching comparison (BF vs GMS vs LOGOS), with the
             rotation/rescale robustness probes of main.cpp:29-47
  calibrate  chessboard calibration (main.cpp:59-67)
  sfm        two-view SfM -> PLY point cloud (main.cpp:71-84)
  sfm-seq    multi-view incremental SfM + bundle adjustment (north star)
  disparity  match-based disparity RMS benchmark (DisparityUtil.cpp:430-461)
  stereo     StereoBM dense disparity demo (DisparityUtil.cpp:22-49)
  portrait   synthetic-bokeh portrait mode (DisparityUtil.cpp:274-428)
  bench      one-line JSON performance benchmark

Run `python -m tpusfm.cli <cmd> --help` for options. Defaults point at the
bundled reference datasets.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def _prep_image(path, max_size):
    import jax
    import jax.numpy as jnp
    from tpusfm.io import imread_gray

    g = imread_gray(path)
    h, w = g.shape
    if max_size and max(h, w) > max_size:
        s = max_size / max(h, w)
        g = np.asarray(jax.image.resize(jnp.array(g), (int(h * s), int(w * s)), "linear"))
    return g


def _default_intr(w, h):
    """Intrinsics for the bundled camera, from the committed calibration.

    out/calib.npz is produced by `cli calibrate` on the reference's 10
    chessboard photos (/root/reference/SfM-GMS/CalibrationImages, driver
    main.cpp:59-67); it is rescaled here from the calibration resolution to
    (w, h). Falls back to a generic focal if the artifact is missing."""
    import os

    from tpusfm.types import CameraIntrinsics

    path = os.path.join(os.path.dirname(__file__), "..", "..", "out", "calib.npz")
    if os.path.exists(path):
        import jax.numpy as jnp

        z = np.load(path)
        K, (cw, ch) = z["K"], z["image_size"]
        sx, sy = w / cw, h / ch
        Ks = np.array(
            [[K[0, 0] * sx, 0, K[0, 2] * sx],
             [0, K[1, 1] * sy, K[1, 2] * sy],
             [0, 0, 1]], np.float32,
        )
        # normalized-coordinate distortion coefficients are scale-invariant
        return CameraIntrinsics(K=jnp.asarray(Ks), dist=jnp.asarray(z["dist"], jnp.float32))
    return CameraIntrinsics.ideal(0.85 * w, 0.85 * w, w / 2, h / 2)


def _make_mesh(n_devices):
    """Build the CLI's device mesh, or None for the single-device path.

    `--devices N` requires N visible devices: real chips on a pod slice, or
    virtual ones via XLA_FLAGS=--xla_force_host_platform_device_count=N
    JAX_PLATFORMS=cpu (the no-hardware validation path, SURVEY.md §4)."""
    if not n_devices or n_devices <= 1:
        return None
    import jax
    from tpusfm.dist.mesh import make_mesh

    avail = jax.device_count()
    if avail < n_devices:
        sys.exit(f"--devices {n_devices} but only {avail} visible "
                 f"(set XLA_FLAGS=--xla_force_host_platform_device_count=N "
                 f"JAX_PLATFORMS=cpu to simulate)")
    return make_mesh(n_devices)


def cmd_match(args):
    import jax.numpy as jnp
    from tpusfm.config import PipelineConfig, SiftConfig
    from tpusfm.features.sift import sift_detect_and_compute
    from tpusfm.io.image import rotate, resize
    from tpusfm.sfm.two_view import match_features
    from tpusfm.viz import draw_matches
    from tpusfm.utils.timing import Timer, stage_times

    cfg = PipelineConfig(sift=SiftConfig(max_features=args.max_features))
    g1 = _prep_image(args.image1, args.max_size)
    g2 = _prep_image(args.image2, args.max_size)
    os.makedirs(args.out, exist_ok=True)
    timer = Timer()

    variants = [("orig", g2)]
    if args.probe:
        variants.append(("rot180", np.asarray(rotate(jnp.array(g2), 180.0))))
        variants.append(("rescale", np.asarray(resize(jnp.array(g2), 1000, 1000))))

    report = {}
    with timer.stage("detect1"):
        f1 = sift_detect_and_compute(jnp.array(g1), cfg.sift)
    for vname, gv in variants:
        with timer.stage(f"detect2_{vname}"):
            f2 = sift_detect_and_compute(jnp.array(gv), cfg.sift)
        h2, w2 = gv.shape
        for algo in args.algorithms:
            with timer.stage(f"match_{algo}_{vname}"):
                m = match_features(f1, f2, algo, (g1.shape[1], g1.shape[0]), (w2, h2), cfg)
            n = int(np.asarray(m.mask).sum())
            report[f"{algo}_{vname}_matches"] = n
            out_png = os.path.join(args.out, f"matches_{algo}_{vname}.png")
            draw_matches(g1, f1.kpts, gv, f2.kpts, m, out_png)
            print(f"{algo:6s} {vname:8s}: {n:5d} matches -> {out_png}")
    report["timings_s"] = {k: round(v, 3) for k, v in stage_times.items()}
    with open(os.path.join(args.out, "match_report.json"), "w") as f:
        json.dump(report, f, indent=2)


def cmd_calibrate(args):
    from tpusfm.calib.chessboard import find_chessboard_corners
    from tpusfm.calib.zhang import board_object_points, calibrate_camera
    from tpusfm.io.dataset import calibration_images

    paths = args.images or calibration_images()
    pts = []
    shape = None
    for p in paths:
        g = _prep_image(p, args.max_size)
        shape = g.shape
        c, ok = find_chessboard_corners(g, args.rows, args.cols)
        print(f"{os.path.basename(p)}: {'found' if ok else 'MISS'}")
        if ok:
            pts.append(c)
    if len(pts) < 3:
        sys.exit("need at least 3 detected boards")
    obj = board_object_points(args.rows, args.cols)
    intr, rv, tv, rms = calibrate_camera(obj, np.stack(pts), (shape[1], shape[0]))
    K = np.asarray(intr.K)
    print("K:\n", np.round(K, 2))
    print("dist:", np.round(np.asarray(intr.dist), 5))
    print(f"rms: {rms:.3f} px over {len(pts)} views")
    np.savez(args.out, K=K, dist=np.asarray(intr.dist), rvecs=rv, tvecs=tv,
             rms=rms, image_size=np.array([shape[1], shape[0]]))
    print("saved ->", args.out)


def _load_intr(calib_path, w, h):
    from tpusfm.types import CameraIntrinsics
    import jax.numpy as jnp

    if calib_path and os.path.exists(calib_path):
        d = np.load(calib_path)
        K = d["K"].astype(np.float32)
        iw, ih = d["image_size"]
        s = w / float(iw)
        K = K * np.array([[s, s, s], [s, s, s], [1, 1, 1]], np.float32)
        K[2] = [0, 0, 1]
        return CameraIntrinsics(K=jnp.asarray(K), dist=jnp.asarray(d["dist"].astype(np.float32)))
    return _default_intr(w, h)


def cmd_sfm(args):
    import jax.numpy as jnp
    from tpusfm.config import PipelineConfig, SiftConfig
    from tpusfm.features.sift import sift_detect_and_compute
    from tpusfm.sfm import two_view_sfm
    from tpusfm.viz import write_ply, draw_matches

    cfg = PipelineConfig(sift=SiftConfig(max_features=args.max_features))
    g1 = _prep_image(args.image1, args.max_size)
    g2 = _prep_image(args.image2, args.max_size)
    intr = _load_intr(args.calib, g1.shape[1], g1.shape[0])
    f1 = sift_detect_and_compute(jnp.array(g1), cfg.sift)
    f2 = sift_detect_and_compute(jnp.array(g2), cfg.sift)
    r = two_view_sfm(f1, f2, intr, args.algorithm,
                     (g1.shape[1], g1.shape[0]), (g2.shape[1], g2.shape[0]), cfg)
    print("E:\n", np.round(np.asarray(r.E), 4))
    print("R:\n", np.round(np.asarray(r.R), 4))
    print("t:", np.round(np.asarray(r.t), 4))
    print(f"matches={int(r.n_matches)} inliers={int(r.n_inliers)} points={int(r.n_points)}")
    # mean reprojection error of the kept points through both cameras, in px
    import jax.numpy as jnp
    from tpusfm.geometry.undistort import undistort_points

    X = np.asarray(r.points3d)
    pm = np.asarray(r.point_mask)
    if pm.any():
        p1, p2 = r.matches.gather_xy(f1.kpts, f2.kpts)
        x1n = np.asarray(undistort_points(p1, intr.K, intr.dist))
        x2n = np.asarray(undistort_points(p2, intr.K, intr.dist))
        R_, t_ = np.asarray(r.R), np.asarray(r.t)
        f = float(np.asarray(intr.K)[0, 0])
        pr1 = X[:, :2] / np.maximum(X[:, 2:], 1e-9)
        Xc2 = X @ R_.T + t_
        pr2 = Xc2[:, :2] / np.maximum(Xc2[:, 2:], 1e-9)
        e = (np.linalg.norm(pr1 - x1n, axis=1) + np.linalg.norm(pr2 - x2n, axis=1)) * 0.5 * f
        print(f"reproj_error_px={float(np.mean(e[pm])):.3f} (mean over {int(pm.sum())} points)")
    os.makedirs(args.out, exist_ok=True)
    ply = os.path.join(args.out, "two_view.ply")
    write_ply(ply, np.asarray(r.points3d), mask=np.asarray(r.point_mask))
    draw_matches(g1, f1.kpts, g2, f2.kpts, r.matches,
                 os.path.join(args.out, "two_view_matches.png"))
    print("->", ply)


def cmd_sfm_seq(args):
    import jax.numpy as jnp
    from tpusfm.ba.multiview import incremental_sfm
    from tpusfm.config import PipelineConfig, SiftConfig, MatchConfig
    from tpusfm.features.sift import sift_detect_and_compute
    from tpusfm.io.dataset import source_image, SFM_SEQUENCE, BUN_SEQUENCE
    from tpusfm.viz import write_ply

    seq = BUN_SEQUENCE if getattr(args, "sequence", "pikabun") == "bun" else SFM_SEQUENCE
    paths = args.images or [source_image(n) for n in seq]
    cfg = PipelineConfig(sift=SiftConfig(max_features=args.max_features),
                         match=MatchConfig(max_matches=1000))
    feats, sizes = [], []
    g0 = None
    for p in paths:
        g = _prep_image(p, args.max_size)
        g0 = g if g0 is None else g0
        feats.append(sift_detect_and_compute(jnp.array(g), cfg.sift))
        sizes.append((g.shape[1], g.shape[0]))
    intr = _load_intr(args.calib, g0.shape[1], g0.shape[0])
    mesh = _make_mesh(args.devices)
    rec = incremental_sfm(feats, sizes, intr, cfg, algo=args.algorithm,
                          pair_span=args.pair_span, mesh=mesh)
    for k, v in rec["metrics"].items():
        if k != "ba_costs":
            print(f"  {k}: {v}")
    os.makedirs(args.out, exist_ok=True)
    ply = os.path.join(args.out, "reconstruction.ply")
    write_ply(ply, rec["points"], mask=rec["point_valid"])
    np.savez(os.path.join(args.out, "reconstruction.npz"),
             cams=rec["cams"], points=rec["points"], point_valid=rec["point_valid"])
    print("->", ply)


def cmd_pose_graph(args):
    import jax.numpy as jnp
    from tpusfm.config import PipelineConfig, SiftConfig, MatchConfig
    from tpusfm.features.sift import sift_detect_and_compute
    from tpusfm.io.dataset import source_image, SFM_SEQUENCE
    from tpusfm.pgo import PgoConfig, chain_odometry, optimize_pose_graph
    from tpusfm.pgo.builder import build_sequence_graph, edges_to_arrays
    from tpusfm.utils.traj import ate_rmse, camera_centers_from_w2c
    from tpusfm.viz import write_ply

    paths = args.images or [source_image(n) for n in SFM_SEQUENCE]
    cfg = PipelineConfig(sift=SiftConfig(max_features=args.max_features),
                         match=MatchConfig(max_matches=1000))
    feats, sizes = [], []
    g0 = None
    for p in paths:
        g = _prep_image(p, args.max_size)
        g0 = g if g0 is None else g0
        feats.append(sift_detect_and_compute(jnp.array(g), cfg.sift))
        sizes.append((g.shape[1], g.shape[0]))
    intr = _load_intr(args.calib, g0.shape[1], g0.shape[0])

    edges, em = build_sequence_graph(
        feats, sizes, intr, cfg, algo=args.algorithm,
        spans=tuple(args.spans), closure=not args.no_closure)
    for k, v in em.items():
        print(f"  {k}: {v}")
    ei, ej, Zr, Zt, w = edges_to_arrays(edges)

    V = len(feats)
    R0, t0 = chain_odometry(Zr[: V - 1], Zt[: V - 1])
    pcfg = PgoConfig(max_iters=args.iters)
    mesh = _make_mesh(args.devices)
    if mesh is not None:
        from tpusfm.dist.sharded_pgo import sharded_optimize_pose_graph

        R1, t1, costs = sharded_optimize_pose_graph(
            R0, t0, ei, ej, Zr, Zt, w, mesh, pcfg)
    else:
        R1, t1, costs = optimize_pose_graph(R0, t0, ei, ej, Zr, Zt, w, pcfg)
    print(f"  pgo cost: {float(costs[0]):.4f} -> {float(costs[-1]):.4f} "
          f"({args.iters} LM iters)")

    # node poses are world_T_cam: centers are the translations directly
    C0 = np.asarray(t0)
    C1 = np.asarray(t1)
    out = {"centers_odometry": C0, "centers_pgo": C1,
           "R_pgo": np.asarray(R1)}

    if args.ref_traj and os.path.exists(args.ref_traj):
        z = np.load(args.ref_traj)
        Cref = camera_centers_from_w2c(
            _rvecs_to_R(z["cams"][:, :3]), z["cams"][:, 3:])
        if len(Cref) == V:
            a_before, _ = ate_rmse(C0, Cref)
            a_after, _ = ate_rmse(C1, Cref)
            print(f"  ATE vs {os.path.basename(args.ref_traj)}: "
                  f"odometry {a_before:.4f} -> pgo {a_after:.4f}")
            out["ate_before"] = a_before
            out["ate_after"] = a_after
        else:
            print(f"  ref trajectory has {len(Cref)} views != {V}; skipping ATE")

    os.makedirs(args.out, exist_ok=True)
    np.savez(os.path.join(args.out, "pose_graph.npz"), **out)
    write_ply(os.path.join(args.out, "trajectory_pgo.ply"),
              np.concatenate([C0, C1]),
              colors=np.concatenate([
                  np.tile([255, 64, 64], (V, 1)),
                  np.tile([64, 255, 64], (V, 1))]))
    print("->", os.path.join(args.out, "pose_graph.npz"))


def _rvecs_to_R(rvecs):
    import jax
    import jax.numpy as jnp
    from tpusfm.geometry.projection import rodrigues

    return np.asarray(jax.vmap(rodrigues)(jnp.asarray(rvecs)))


def cmd_disparity(args):
    import jax.numpy as jnp
    from tpusfm.io import imwrite
    from tpusfm.io.dataset import source_image
    from tpusfm.stereo.disparity import run_disparity_benchmark

    left = jnp.array(_prep_image(args.left or source_image("left1.png"), args.max_size))
    right = jnp.array(_prep_image(args.right or source_image("right1.png"), args.max_size))
    gt = jnp.array(_prep_image(args.gt or source_image("left_gt1.png"), args.max_size))
    os.makedirs(args.out, exist_ok=True)
    mesh = _make_mesh(args.devices)
    algs = args.algorithms
    densities = [args.density] if args.density != "both" else ["sparse", "dense"]
    for density in densities:
        for alg in algs:
            if density == "dense" and alg == "logos":
                continue  # the reference also skips dense LOGOS (DisparityUtil.cpp:458-460)
            t0 = time.time()
            r = run_disparity_benchmark(left, right, gt, alg, density, args.ratio,
                                        mesh=mesh)
            dt = time.time() - t0
            name = f"disparity_{alg}_{density}_RMS.png"
            d = np.asarray(r["disp"])
            v = np.asarray(r["valid"])
            vis = np.where(v, d / max(d.max(), 1e-6), 1.0)
            imwrite(os.path.join(args.out, name), vis)
            print(f"{alg:6s} {density:6s}: RMS={r['rms']:8.2f}  count={r['count']:6d} "
                  f"matches={r['n_matches']:6d}  {dt:6.1f}s -> {name}")


def cmd_stereo(args):
    import jax.numpy as jnp
    from tpusfm.config import StereoBMConfig
    from tpusfm.io import imwrite
    from tpusfm.io.dataset import source_image
    from tpusfm.stereo.block_matching import stereo_bm_filtered, normalize_disparity

    left = jnp.array(_prep_image(args.left or source_image("leftRobot.png"), args.max_size))
    right = jnp.array(_prep_image(args.right or source_image("rightRobot.png"), args.max_size))
    cfg = StereoBMConfig(num_disparities=args.num_disparities,
                         min_disparity=args.min_disparity,
                         speckle_window_size=args.speckle_window)
    t0 = time.time()
    disp, valid = stereo_bm_filtered(left, right, cfg)
    vis = normalize_disparity(jnp.asarray(disp), jnp.asarray(valid))
    os.makedirs(args.out, exist_ok=True)
    out = os.path.join(args.out, "stereo_bm.png")
    imwrite(out, np.asarray(vis))
    print(f"valid={float(np.asarray(valid).mean()):.2%}  {time.time()-t0:.1f}s -> {out}")


def cmd_portrait(args):
    from tpusfm.io import imread, imwrite
    from tpusfm.io.dataset import source_image
    from tpusfm.stereo.portrait import create_portrait_mode
    import jax
    import jax.numpy as jnp

    l = imread(args.left or source_image("leftRobot.png"))
    r = imread(args.right or source_image("rightRobot.png"))
    if args.max_size and max(l.shape[:2]) > args.max_size:
        s = args.max_size / max(l.shape[:2])
        sz = (int(l.shape[0] * s), int(l.shape[1] * s), 3)
        l = np.asarray(jax.image.resize(jnp.array(l), sz, "linear"))
        r = np.asarray(jax.image.resize(jnp.array(r), sz, "linear"))
    t0 = time.time()
    out, fg, disp = create_portrait_mode(l, r, threshold=args.threshold)
    os.makedirs(args.out, exist_ok=True)
    imwrite(os.path.join(args.out, "portrait.png"), out)
    imwrite(os.path.join(args.out, "portrait_fg.png"), fg.astype(np.float32))
    print(f"fg={fg.mean():.2%}  {time.time()-t0:.1f}s -> {args.out}/portrait.png")


def cmd_bench(args):
    if args.ba:
        import sys as _sys

        _sys.argv = ["scaling_bench"] + (["--cpu"] if args.cpu else [])
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", "scripts"))
        import scaling_bench

        scaling_bench.main()
        return
    import bench

    bench.main()


def main(argv=None):
    # TPUSFM_PLATFORM=cpu (optionally with
    # XLA_FLAGS=--xla_force_host_platform_device_count=N) selects the
    # no-hardware validation backend. An env var alone is not enough in
    # containers whose sitecustomize pins a PJRT plugin platform, so the
    # override goes through jax.config before any computation runs.
    plat = os.environ.get("TPUSFM_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)

    p = argparse.ArgumentParser(prog="tpusfm", description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    sub = p.add_subparsers(dest="cmd", required=True)

    from tpusfm.io.dataset import source_image

    def common(sp, out="out"):
        sp.add_argument("--out", default=out)
        sp.add_argument("--max-size", type=int, default=504)
        sp.add_argument("--max-features", type=int, default=1024)

    sp = sub.add_parser("match", help="BF/GMS/LOGOS matching comparison")
    sp.add_argument("--image1", default=source_image("Disparity_L.jpg"))
    sp.add_argument("--image2", default=source_image("Disparity_R.jpg"))
    sp.add_argument("--algorithms", nargs="+", default=["bf", "gms", "logos"])
    sp.add_argument("--probe", action="store_true",
                    help="also run 180-deg rotation and rescale robustness probes")
    common(sp)
    sp.set_defaults(fn=cmd_match)

    sp = sub.add_parser("calibrate", help="chessboard camera calibration")
    sp.add_argument("--images", nargs="*", default=None)
    sp.add_argument("--rows", type=int, default=6)
    sp.add_argument("--cols", type=int, default=9)
    sp.add_argument("--out", default="out/calib.npz")
    sp.add_argument("--max-size", type=int, default=504)
    sp.set_defaults(fn=cmd_calibrate)

    sp = sub.add_parser("sfm", help="two-view SfM -> PLY")
    sp.add_argument("--image1", default=source_image("PikaBun1.jpg"))
    sp.add_argument("--image2", default=source_image("PikaBun4.jpg"))
    sp.add_argument("--algorithm", default="logos", choices=["bf", "gms", "logos"])
    sp.add_argument("--calib", default="out/calib.npz")
    common(sp)
    sp.set_defaults(fn=cmd_sfm)

    sp = sub.add_parser("sfm-seq", help="multi-view SfM + bundle adjustment")
    sp.add_argument("--images", nargs="*", default=None)
    sp.add_argument("--sequence", default="pikabun", choices=["pikabun", "bun"],
                    help="bundled sequence to reconstruct when --images is "
                         "not given (SourceImages/PikaBun1-6 or Bun1-6)")
    sp.add_argument("--algorithm", default="bf", choices=["bf", "gms", "logos"])
    sp.add_argument("--pair-span", type=int, default=3)
    sp.add_argument("--calib", default="out/calib.npz")
    sp.add_argument("--devices", type=int, default=1,
                    help="shard bundle adjustment over an N-device mesh")
    common(sp)
    # operating point that registers 6/6 PikaBun views at reproj < 0.5 px
    sp.set_defaults(fn=cmd_sfm_seq, max_size=756, max_features=3000)

    sp = sub.add_parser("pose-graph",
                        help="loop-closure pose-graph refinement of a sequence")
    sp.add_argument("--images", nargs="*", default=None)
    sp.add_argument("--algorithm", default="bf", choices=["bf", "gms", "logos"])
    sp.add_argument("--spans", nargs="*", type=int, default=[2],
                    help="extra edge spans besides odometry (i, i+s)")
    sp.add_argument("--no-closure", action="store_true",
                    help="drop the (0, V-1) loop-closure edge")
    sp.add_argument("--iters", type=int, default=20)
    sp.add_argument("--calib", default="out/calib.npz")
    sp.add_argument("--ref-traj", default="out/reconstruction.npz",
                    help="npz with cams (V,6) for the ATE comparison "
                         "(produced by sfm-seq)")
    sp.add_argument("--devices", type=int, default=1,
                    help="shard pose-graph edges over an N-device mesh")
    common(sp)
    sp.set_defaults(fn=cmd_pose_graph)

    sp = sub.add_parser("disparity", help="match-based disparity RMS benchmark")
    sp.add_argument("--left", default=None)
    sp.add_argument("--right", default=None)
    sp.add_argument("--gt", default=None)
    sp.add_argument("--ratio", type=float, default=4.0)
    sp.add_argument("--density", default="sparse", choices=["sparse", "dense", "both"])
    sp.add_argument("--algorithms", nargs="+", default=["sift", "orb", "gms", "logos"])
    sp.add_argument("--devices", type=int, default=1,
                    help="shard dense-mode NN matching over an N-device mesh (ring matcher)")
    common(sp)
    sp.set_defaults(fn=cmd_disparity)

    sp = sub.add_parser("stereo", help="StereoBM dense disparity")
    sp.add_argument("--left", default=None)
    sp.add_argument("--right", default=None)
    sp.add_argument("--num-disparities", type=int, default=224)
    sp.add_argument("--min-disparity", type=int, default=-39)
    sp.add_argument("--speckle-window", type=int, default=0,
                    help="speckle filter window in px (default 0 = disabled, "
                         "the reference's exact setting DisparityUtil.cpp:35; "
                         "set e.g. 100 to enable the CCL speckle filter)")
    common(sp)
    sp.set_defaults(fn=cmd_stereo)

    sp = sub.add_parser("portrait", help="portrait-mode bokeh from dense stereo")
    sp.add_argument("--left", default=None)
    sp.add_argument("--right", default=None)
    sp.add_argument("--threshold", type=float, default=60.0)
    common(sp, out="out")
    sp.set_defaults(fn=cmd_portrait)

    sp = sub.add_parser("bench", help="one-line JSON benchmark")
    sp.add_argument("--ba", action="store_true",
                    help="run the BA-iters/s + device-scaling benchmark "
                         "(scripts/scaling_bench.py) instead of the "
                         "two-view throughput benchmark")
    sp.add_argument("--cpu", action="store_true",
                    help="with --ba: force the virtual CPU mesh backend")
    sp.set_defaults(fn=cmd_bench)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
