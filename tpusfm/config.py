"""Configuration system.

The reference scatters its tuning constants across five files and its CLI
parser is stubbed out (see /root/reference/SfM-GMS/SfM-GMS/main.cpp:15-17,
main.h:22-27). Here every constant is a named, hashable dataclass field so
configs can be passed as static args to jitted pipelines.
"""
from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class SiftConfig:
    """SIFT detector/descriptor parameters.

    Defaults follow Lowe's paper / the OpenCV implementation the reference
    calls via cv::SIFT::create(10000)
    (/root/reference/SfM-GMS/SfM-GMS/FeatureMatchUtil.cpp:10).
    """

    max_features: int = 2048       # fixed keypoint capacity (reference: 10000 dynamic)
    n_octave_layers: int = 3       # scales per octave ("s" in Lowe)
    contrast_threshold: float = 0.04
    edge_threshold: float = 10.0
    sigma: float = 1.6
    upsample: bool = True          # x2 initial upsampling like OpenCV (-1 octave)
    max_octaves: int = 8
    n_orientation_bins: int = 36
    orientation_peak_ratio: float = 0.8
    descriptor_width: int = 4      # 4x4 spatial histogram
    descriptor_bins: int = 8       # orientation bins -> 128-D
    descriptor_scale_factor: float = 3.0
    descriptor_clip: float = 0.2
    # fast path: descriptors/orientations sampled from pooled oriented
    # gradient planes (DAISY-style) — ~30x fewer gathers on TPU than the
    # per-sample formulation; False selects the precise per-sample path.
    fast_descriptor: bool = True


@dataclasses.dataclass(frozen=True)
class OrbConfig:
    """ORB (FAST + rotated BRIEF) parameters, cv::ORB::create() defaults
    (/root/reference/SfM-GMS/SfM-GMS/DisparityUtil.cpp:108)."""

    max_features: int = 500
    fast_threshold: int = 20
    n_levels: int = 8
    scale_factor: float = 1.2
    patch_size: int = 31
    edge_threshold: int = 31  # keypoints this close to the border are dropped


@dataclasses.dataclass(frozen=True)
class MatchConfig:
    """Brute-force match pruning, replicating the reference's rules
    (/root/reference/SfM-GMS/SfM-GMS/FeatureMatchUtil.h:17-18, .cpp:24-30):
    keep matches with distance <= distance_coef * min_distance, cap count."""

    cross_check: bool = True
    distance_coef: float = 4.0
    max_matches: int = 500


@dataclasses.dataclass(frozen=True)
class GmsConfig:
    """Grid Motion Statistics (Bian et al. CVPR'17), as wrapped by
    cv::xfeatures2d::matchGMS (/root/reference/SfM-GMS/SfM-GMS/FeatureMatchUtil.cpp:69)."""

    grid_rows: int = 20
    grid_cols: int = 20
    with_rotation: bool = False
    with_scale: bool = False
    threshold_factor: float = 6.0


@dataclasses.dataclass(frozen=True)
class LogosConfig:
    """LOGOS (Lowry & Andreasson '18) spatial verification via BoW words,
    as in /root/reference/SfM-GMS/SfM-GMS/FeatureMatchUtil.cpp:100-116."""

    num_words: int = 50            # reference uses 50 (SfM path) / 100 (disparity path)
    kmeans_iters: int = 10
    knn: int = 5                   # spatial nearest neighbors per keypoint
    max_candidates: int = 4096
    scale_ratio_threshold: float = 1.5
    angle_threshold: float = 0.5   # radians
    min_support: int = 1


@dataclasses.dataclass(frozen=True)
class RansacConfig:
    """Essential-matrix RANSAC. The reference calls findEssentialMat with
    prob=0.7, threshold=1.0px (/root/reference/SfM-GMS/SfM-GMS/SfMUtil.cpp:39).
    TPU-native: a fixed batch of hypotheses evaluated in parallel."""

    # 128 five-point samples give ~98% confidence at 50% inliers
    # (1 - (1 - 0.5^5)^128); the reference's prob=0.7 setting needs only ~38
    # samples, so this is a comfortable margin over it. The whole batch is
    # scored in parallel so the margin is cheap, but not free — 512
    # hypotheses put the vmapped batch-of-pairs path over a memory cliff.
    n_hypotheses: int = 128
    sample_size: int = 8           # minimal-sample size for the 8-point path
    threshold_px: float = 1.0
    seed: int = 0
    # "five_point" (Nister minimal solver; handles planar scenes, like the
    # reference's findEssentialMat) or "eight_point" (linear, cheaper).
    solver: str = "five_point"


@dataclasses.dataclass(frozen=True)
class StereoBMConfig:
    """Block-matching stereo, mirroring the reference StereoBM setup
    (/root/reference/SfM-GMS/SfM-GMS/DisparityUtil.cpp:28-38)."""

    num_disparities: int = 224
    block_size: int = 9
    min_disparity: int = -39
    prefilter_cap: int = 61
    texture_threshold: int = 507
    uniqueness_ratio: int = 0
    speckle_window_size: int = 0
    speckle_range: int = 8
    disp12_max_diff: int = 1
    subpixel: bool = True  # quadratic SAD-minimum interpolation (OpenCV default)


@dataclasses.dataclass(frozen=True)
class CalibConfig:
    """Chessboard calibration (6x9 inner corners, reference main.h:45)."""

    board_rows: int = 6
    board_cols: int = 9
    subpix_window: int = 5
    subpix_iters: int = 30
    lm_iters: int = 30


@dataclasses.dataclass(frozen=True)
class BaConfig:
    """Bundle adjustment (new capability; reference is two-view only)."""

    max_iters: int = 20
    init_lambda: float = 1e-3
    lambda_up: float = 10.0
    lambda_down: float = 0.1
    huber_delta: float = 2.0       # pixels


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    sift: SiftConfig = SiftConfig()
    orb: OrbConfig = OrbConfig()
    match: MatchConfig = MatchConfig()
    gms: GmsConfig = GmsConfig()
    logos: LogosConfig = LogosConfig()
    ransac: RansacConfig = RansacConfig()
    stereo: StereoBMConfig = StereoBMConfig()
    calib: CalibConfig = CalibConfig()
    ba: BaConfig = BaConfig()
