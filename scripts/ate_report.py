"""ATE report: tpusfm trajectories vs the OpenCV reference chain.

Produces the ATE numbers for RESULTS.md (VERDICT r3 #3) from committed
artifacts:
  out/ref_trajectory.npz   cv2 pose chain over PikaBun1-6 at the
                           reference's own operating point (full res, 10k
                           features), scripts/ref_trajectory.py
  out/reconstruction.npz   tpusfm sfm-seq BA reconstruction (cams (V,6))
  out/pose_graph.npz       tpusfm odometry chain + pose-graph refinement

ATE = RMSE of Umeyama-aligned (similarity: monocular scale is free) camera
centers, also reported normalized by the reference trajectory span so the
bound is scale-free.
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from tpusfm.geometry.projection import rodrigues
    from tpusfm.utils.traj import ate_rmse, camera_centers_from_w2c

    ref = np.load(os.path.join(ROOT, "out", "ref_trajectory.npz"))
    Cref = ref["centers"]
    span = float(np.linalg.norm(Cref - Cref.mean(0), axis=1).max())
    out = {"ref_span": span, "n_views": len(Cref)}

    rec_path = os.path.join(ROOT, "out", "reconstruction.npz")
    if os.path.exists(rec_path):
        z = np.load(rec_path)
        R = np.asarray(jax.vmap(rodrigues)(jnp.asarray(z["cams"][:, :3])))
        C = camera_centers_from_w2c(R, z["cams"][:, 3:])
        if len(C) == len(Cref):
            a, _ = ate_rmse(C, Cref)
            out["ate_ba_vs_ref"] = a
            out["ate_ba_vs_ref_rel"] = a / span

    pg_path = os.path.join(ROOT, "out", "pose_graph.npz")
    if os.path.exists(pg_path):
        z = np.load(pg_path)
        for key, name in (("centers_odometry", "odom"), ("centers_pgo", "pgo")):
            C = z[key]
            if len(C) == len(Cref):
                a, _ = ate_rmse(C, Cref)
                out[f"ate_{name}_vs_ref"] = a
                out[f"ate_{name}_vs_ref_rel"] = a / span

    print(json.dumps(out, indent=2))
    with open(os.path.join(ROOT, "out", "ATE.json"), "w") as f:
        json.dump(out, f, indent=2)
    print("-> out/ATE.json")


if __name__ == "__main__":
    main()
