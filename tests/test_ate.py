"""ATE regression bound (VERDICT r3 #3): the committed tpusfm trajectories
must stay within the recorded bound of the committed OpenCV reference chain.

Artifacts (committed under out/): ref_trajectory.npz from
scripts/ref_trajectory.py (cv2 pose chain over PikaBun1-6 at the
reference's full-res/10k operating point), reconstruction.npz from
`cli sfm-seq`, pose_graph.npz from `cli pose-graph`. The bound is
span-normalized (monocular scale is free): rel ATE = RMSE after Umeyama
similarity alignment / max distance from the reference-trajectory centroid.
"""
import os

import numpy as np
import pytest

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "out")

REL_ATE_BOUND = 0.40  # both chained trajectories on these wide-baseline
# object photos are noisy (the cv2 chain's own weakest edge has 91 inliers);
# the recorded r4 values are BA 0.30, odometry 0.36, pose-graph 0.32
# (tightened from 0.45 in r5, VERDICT r4 #10).


def _need(name):
    p = os.path.join(OUT, name)
    if not os.path.exists(p):
        pytest.skip(f"artifact {name} not present")
    return np.load(p)


def test_ba_trajectory_within_ate_bound():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from tpusfm.geometry.projection import rodrigues
    from tpusfm.utils.traj import ate_rmse, camera_centers_from_w2c

    ref = _need("ref_trajectory.npz")
    rec = _need("reconstruction.npz")
    Cref = ref["centers"]
    span = float(np.linalg.norm(Cref - Cref.mean(0), axis=1).max())
    R = np.asarray(jax.vmap(rodrigues)(jnp.asarray(rec["cams"][:, :3])))
    C = camera_centers_from_w2c(R, rec["cams"][:, 3:])
    assert len(C) == len(Cref)
    ate, _ = ate_rmse(C, Cref)
    assert ate / span < REL_ATE_BOUND, (ate, span)


def test_pose_graph_improves_odometry_ate():
    ref = _need("ref_trajectory.npz")
    pg = _need("pose_graph.npz")
    from tpusfm.utils.traj import ate_rmse

    Cref = ref["centers"]
    a_odom, _ = ate_rmse(pg["centers_odometry"], Cref)
    a_pgo, _ = ate_rmse(pg["centers_pgo"], Cref)
    span = float(np.linalg.norm(Cref - Cref.mean(0), axis=1).max())
    assert a_pgo / span < REL_ATE_BOUND, (a_pgo, span)
    # the loop-closure refinement must not be worse than raw odometry
    assert a_pgo <= a_odom * 1.02, (a_odom, a_pgo)


def test_pose_graph_improves_where_drift_is_real():
    """Light operating point (504 px / 1024 features, `cli pose-graph
    --devices 8`): odometry drifts hard there, and the loop closure must
    IMPROVE it, not merely do no harm (VERDICT r4 #10; recorded
    0.360 -> 0.162)."""
    pg = _need("pgo_mesh/pose_graph.npz")
    a_before = float(pg["ate_before"])
    a_after = float(pg["ate_after"])
    assert a_before > 0.25, a_before          # drift really is present
    assert a_after < 0.7 * a_before, (a_before, a_after)


def test_views_sequence_matches_cv2_chain():
    """Third scene type (VERDICT r4 #7): the bundled view0-3 rail set
    (SourceImages/view0-3.png, never exercised by the reference's own code).
    Geometry is a near-linear translation with ~900-inlier edges, so the
    cross-engine agreement bound is an order tighter than the turntable
    sequences (recorded r5: odometry 0.029, pgo 0.032 rel ATE)."""
    ref = _need("ref_trajectory_views.npz")
    pg = _need("views/pose_graph.npz")
    from tpusfm.utils.traj import ate_rmse

    Cref = ref["centers"]
    a_odom, _ = ate_rmse(pg["centers_odometry"], Cref)
    a_pgo, _ = ate_rmse(pg["centers_pgo"], Cref)
    assert a_odom < 0.10, a_odom
    assert a_pgo < 0.10, a_pgo
    # rail sequence sits at the noise floor: the pose graph must stay there
    assert a_pgo <= a_odom * 1.3 + 1e-3, (a_odom, a_pgo)
