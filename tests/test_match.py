"""Matching core: NN search kernel (XLA + Pallas-interpret) vs numpy, and the
reference prune rules (FeatureMatchUtil.cpp:20-31 behavior)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpusfm.kernels.distance import nn_search_xla, nn_search_pallas, nn_search
from tpusfm.match.bf import bf_match
from tpusfm.config import MatchConfig


def _numpy_nn(q, db, db_mask):
    d2 = ((q[:, None, :] - db[None, :, :]) ** 2).sum(-1)
    d2[:, ~db_mask] = np.inf
    idx = d2.argmin(1)
    best = d2.min(1)
    d2s = d2.copy()
    d2s[np.arange(len(q)), idx] = np.inf
    second = d2s.min(1)
    return idx, best, second


def test_nn_search_xla_matches_numpy():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(100, 32)).astype(np.float32)
    db = rng.normal(size=(200, 32)).astype(np.float32)
    mask = np.ones(200, bool)
    mask[150:] = False
    idx, best, second = nn_search_xla(jnp.array(q), jnp.array(db), jnp.array(mask), block=64)
    ridx, rbest, rsecond = _numpy_nn(q, db, mask)
    idx = np.asarray(idx)
    # The matmul formulation can flip near-ties; require the chosen neighbor's
    # true distance to equal the true min within tolerance.
    chosen_d = ((q - db[idx]) ** 2).sum(-1)
    np.testing.assert_allclose(chosen_d, rbest, rtol=1e-2, atol=1e-2)
    assert mask[idx].all()
    np.testing.assert_allclose(np.asarray(best), rbest, rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(np.asarray(second), rsecond, rtol=1e-2, atol=1e-2)


def test_nn_search_pallas_interpret_matches_xla():
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(1)
    q = rng.normal(size=(256, 128)).astype(np.float32)
    db = rng.normal(size=(512, 128)).astype(np.float32)
    mask = np.ones(512, np.float32)
    mask[400:] = 0.0
    with pltpu.force_tpu_interpret_mode():
        idx, best, second = nn_search_pallas(jnp.array(q), jnp.array(db), jnp.array(mask))
    ridx, rbest, rsecond = _numpy_nn(q, db, mask.astype(bool))
    np.testing.assert_array_equal(np.asarray(idx), ridx)
    np.testing.assert_allclose(np.asarray(best), rbest, rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(np.asarray(second), rsecond, rtol=1e-2, atol=1e-2)


def test_nn_search_hamming():
    rng = np.random.default_rng(2)
    q = rng.integers(0, 2**31, size=(20, 8)).astype(np.uint32)
    db = rng.integers(0, 2**31, size=(30, 8)).astype(np.uint32)
    idx, best, _ = nn_search(jnp.array(q), jnp.array(db), metric="hamming")
    pop = np.vectorize(lambda x: bin(x).count("1"))
    ref = pop(q[:, None, :] ^ db[None, :, :]).sum(-1)
    np.testing.assert_array_equal(np.asarray(idx), ref.argmin(1))
    np.testing.assert_allclose(np.asarray(best), ref.min(1))


def test_bf_match_cross_check_and_prune():
    rng = np.random.default_rng(3)
    # Construct descriptors with known correspondences: db2 = permuted db1 + noise
    n = 64
    d1 = rng.normal(size=(n, 16)).astype(np.float32) * 10
    perm = rng.permutation(n)
    d2 = d1[perm] + rng.normal(size=(n, 16)).astype(np.float32) * 0.01
    m = bf_match(jnp.array(d1), jnp.array(d2), cfg=MatchConfig(max_matches=n))
    got = np.asarray(m.mask)
    assert got.sum() >= n * 0.9
    i1 = np.asarray(m.idx1)[got]
    i2 = np.asarray(m.idx2)[got]
    assert (perm[i2.argsort()] is not None)  # sanity
    # each matched pair should satisfy d2[i2] ~ d1[i1]
    np.testing.assert_allclose(d2[i2], d1[i1], atol=0.1)


def test_bf_match_prune_rule():
    # distances: one tight cluster + far outliers; rule keeps d <= 4*min.
    rng = np.random.default_rng(4)
    d1 = np.eye(8, dtype=np.float32) * 5
    d2 = d1 + rng.normal(size=d1.shape).astype(np.float32) * 0.003
    d2[7] += 100.0  # outlier: distance >> 4*min
    m = bf_match(jnp.array(d1), jnp.array(d2), cfg=MatchConfig(max_matches=8))
    mask = np.asarray(m.mask)
    i1 = np.asarray(m.idx1)
    kept = set(i1[mask].tolist())
    assert 7 not in kept
    assert 0 in kept
