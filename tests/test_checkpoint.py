"""Checkpoint round-trip (SURVEY.md §5 resume capability)."""
import numpy as np
import jax.numpy as jnp

from tpusfm.ba.tracks import Observations
from tpusfm.utils.checkpoint import save_reconstruction, load_reconstruction


def test_checkpoint_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    cams = rng.normal(size=(4, 6)).astype(np.float32)
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    pv = rng.random(50) > 0.3
    obs = Observations(
        xy=jnp.asarray(rng.normal(size=(120, 2)).astype(np.float32)),
        cam=jnp.asarray(rng.integers(0, 4, 120).astype(np.int32)),
        pt=jnp.asarray(rng.integers(0, 50, 120).astype(np.int32)),
        mask=jnp.ones(120, bool),
    )
    p = str(tmp_path / "rec.npz")
    save_reconstruction(p, cams, pts, pv, obs, ba_iteration=7,
                        extra={"K": np.eye(3)})
    r = load_reconstruction(p)
    np.testing.assert_array_equal(r["cams"], cams)
    np.testing.assert_array_equal(r["points"], pts)
    np.testing.assert_array_equal(r["point_valid"], pv)
    np.testing.assert_array_equal(np.asarray(r["obs"].cam), np.asarray(obs.cam))
    assert r["ba_iteration"] == 7
    np.testing.assert_array_equal(r["extra"]["K"], np.eye(3))
