"""tpusfm — a TPU-native Structure-from-Motion framework.

Built from scratch for TPU (JAX/XLA/Pallas/pjit). Capability surface modeled on
the reference pipeline dwang0721/SfM-GMS (SIFT features, brute-force matching,
GMS grid-motion-statistics filtering, LOGOS local-geometric-support verification,
essential-matrix pose recovery, triangulation, camera calibration, dense stereo
disparity) and extended with multi-view SfM, bundle adjustment, and multi-chip
distribution over `jax.sharding.Mesh`.

Package map (SURVEY.md §7):
  io/        image decode/encode, dataset manifests for the bundled assets
  kernels/   Pallas TPU kernels + XLA reference paths (distance matrix, Hamming,
             SAD stereo) — the "ops" layer
  features/  SIFT, ORB, dense-grid descriptors — feature "models"
  match/     brute-force matching, prune rules, GMS, BoW k-means, LOGOS
  geometry/  essential matrix + RANSAC, pose recovery, undistortion,
             triangulation, PnP
  calib/     chessboard detection, Zhang initialization, LM refinement
  ba/        multi-view tracks, bundle-adjustment residuals, Schur/LM solver,
             sharded BA
  stereo/    block matching, match-based disparity, RMS metric, portrait mode
  dist/      device mesh, pair-parallel and ring-blockwise matching — the
             "parallel" layer
  viz/       match visualization PNGs, PLY point clouds
  cli/       subcommands: match, calibrate, sfm, disparity, portrait, ba, bench
"""

__version__ = "0.1.0"

import jax as _jax

# Numerics policy: f32-in means f32-math. On TPU the default matmul/conv
# precision is bfloat16 multiplies; CPU (where the test suite runs) is always
# f32, so chip-only precision bugs are invisible to tests. Round 2 shipped
# exactly that: on-chip SIFT fed DoG extrema detection with bf16 conv noise of
# the same magnitude as the signal, returning garbage keypoints (8 inliers per
# pair on chip vs 344 on CPU for the identical program). Vision-geometry
# pipelines are precision-critical end-to-end (DoG contrasts ~1e-3, Sampson
# residuals ~1e-3 in normalized coords), so the package default is full f32;
# kernels that *want* reduced precision opt in explicitly with bf16 operands
# (e.g. the Hamming bit-vector matmul in kernels/distance.py, which is exact
# in bf16 by construction).
_jax.config.update("jax_default_matmul_precision", "float32")
