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
