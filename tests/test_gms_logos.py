"""GMS and LOGOS match verification on synthetic motion: a coherent
translation field plus scattered outliers — the filters must keep the
coherent matches and kill the outliers (the capability matchGMS/matchLOGOS
provide in the reference, FeatureMatchUtil.cpp:69,116)."""
import numpy as np
import jax.numpy as jnp

from tpusfm.config import GmsConfig, LogosConfig
from tpusfm.match.gms import gms_filter
from tpusfm.match.logos import logos_verify
from tpusfm.types import Keypoints, Matches


def _kpts(xy, n_cap=None):
    n = len(xy)
    cap = n_cap or n
    pad = cap - n
    xy = np.pad(xy.astype(np.float32), ((0, pad), (0, 0)))
    return Keypoints(
        xy=jnp.array(xy),
        scale=jnp.ones(cap, jnp.float32) * 2.0,
        angle=jnp.zeros(cap, jnp.float32),
        response=jnp.ones(cap, jnp.float32),
        mask=jnp.arange(cap) < n,
    )


def test_gms_filters_outliers():
    rng = np.random.default_rng(0)
    n = 2000
    size = (320, 240)
    xy1 = rng.uniform([10, 10], [310, 230], size=(n, 2))
    shift = np.array([15.0, -8.0])
    xy2 = xy1 + shift
    # 100 outlier matches: random destination
    n_out = 500
    out_idx = rng.choice(n, n_out, replace=False)
    xy2_bad = xy2.copy()
    xy2_bad[out_idx] = rng.uniform([10, 10], [310, 230], size=(n_out, 2))
    k1 = _kpts(xy1)
    k2 = _kpts(np.clip(xy2_bad, 0, [319, 239]))
    matches = Matches(
        idx1=jnp.arange(n, dtype=jnp.int32),
        idx2=jnp.arange(n, dtype=jnp.int32),
        distance=jnp.zeros(n),
        mask=jnp.ones(n, bool),
    )
    out = gms_filter(k1, k2, matches, size, size, GmsConfig())
    m = np.asarray(out.mask)
    inl = np.ones(n, bool)
    inl[out_idx] = False
    recall = m[inl].mean()
    false_keep = m[~inl].mean()
    assert recall > 0.7, recall
    assert false_keep < 0.1, false_keep


def test_logos_verifies_same_word_geometry():
    rng = np.random.default_rng(1)
    n = 200
    xy1 = rng.uniform([10, 10], [310, 230], size=(n, 2))
    xy2 = xy1 + np.array([12.0, 5.0])
    words = rng.integers(0, 20, size=n)
    k1 = _kpts(xy1)
    k2perm = np.arange(n)  # identity correspondence
    k2 = _kpts(xy2)
    out = logos_verify(k1, k2, jnp.array(words), jnp.array(words),
                       LogosConfig(knn=5, min_support=1))
    m = np.asarray(out.mask)
    i1 = np.asarray(out.idx1)[m]
    i2 = np.asarray(out.idx2)[m]
    assert m.sum() > n * 0.5
    # accepted matches must be the true identity correspondence
    assert (i1 == i2).mean() > 0.95
