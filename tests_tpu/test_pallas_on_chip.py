"""REAL-TPU Pallas equivalence tests (l2 AND hamming).

These run on whatever `jax.default_backend()` provides — in this container
that is the real TPU chip via the axon tunnel. They exist because
interpret-mode Pallas (tests/test_match.py) cannot catch Mosaic lowering
failures: round 2 shipped a hamming kernel that passed interpret mode but
VMEM-OOM'd on the chip. Run via the verify skill:

    timeout 590 python -m pytest tests_tpu -x -q

(`tests/conftest.py` forces the CPU backend for the main suite; this
directory deliberately has no such conftest.)
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpusfm.kernels.distance import nn_search_pallas, nn_search_xla

requires_tpu = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="real-TPU-only equivalence check",
)


@requires_tpu
def test_l2_pallas_matches_xla_on_chip():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((512, 128)), jnp.float32)
    db = jnp.asarray(rng.standard_normal((1024, 128)), jnp.float32)
    m = np.ones((1024,), np.float32)
    m[900:] = 0.0
    m = jnp.asarray(m)
    i1, b1, s1 = jax.block_until_ready(nn_search_pallas(q, db, m))
    i2, b2, s2 = nn_search_xla(q, db, m)
    i1, i2 = np.asarray(i1), np.asarray(i2)
    b1, b2 = np.asarray(b1), np.asarray(b2)
    # matmul-formulation float error can flip near-ties: require the chosen
    # neighbor's distance to equal the best within tolerance, and the best /
    # second values to agree.
    np.testing.assert_allclose(b1, b2, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-3, atol=1e-3)
    qn, dbn = np.asarray(q), np.asarray(db)
    d_chosen = ((qn - dbn[i1]) ** 2).sum(-1)
    np.testing.assert_allclose(d_chosen, b2, rtol=1e-3, atol=1e-3)
    assert (i1 < 900).all()


@requires_tpu
def test_hamming_pallas_matches_xla_on_chip():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.integers(0, 2**32, size=(512, 8), dtype=np.uint32))
    db = jnp.asarray(rng.integers(0, 2**32, size=(768, 8), dtype=np.uint32))
    m = jnp.ones((768,), jnp.float32)
    i1, b1, s1 = jax.block_until_ready(nn_search_pallas(q, db, m, metric="hamming"))
    i2, b2, s2 = nn_search_xla(q, db, m, metric="hamming")
    b1, b2 = np.asarray(b1), np.asarray(b2)
    # Hamming distances are exact integers on both paths.
    np.testing.assert_array_equal(b1, b2)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    # idx may legitimately differ on exact ties — verify chosen idx attains
    # the true minimum via a numpy popcount recount.
    qb = np.unpackbits(np.ascontiguousarray(np.asarray(q)).view(np.uint8), axis=1)
    dbb = np.unpackbits(np.ascontiguousarray(np.asarray(db)).view(np.uint8), axis=1)
    D = (qb[:, None, :] != dbb[None, :, :]).sum(-1)
    i1 = np.asarray(i1)
    np.testing.assert_array_equal(D[np.arange(len(i1)), i1], D.min(1))
    np.testing.assert_array_equal(D.min(1), b1.astype(int))


@requires_tpu
def test_vmapped_pallas_matches_per_element_on_chip():
    """two_view_batch vmaps bf_match over the pair axis, which batches the
    Pallas kernel grid — verify Mosaic's batched lowering agrees with
    per-element results on the real chip."""
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((3, 512, 128)), jnp.float32)
    db = jnp.asarray(rng.standard_normal((3, 512, 128)), jnp.float32)
    m = jnp.ones((3, 512), jnp.float32)
    bi, bb, bs = jax.block_until_ready(jax.vmap(nn_search_pallas)(q, db, m))
    for b in range(3):
        i1, b1, s1 = nn_search_pallas(q[b], db[b], m[b])
        np.testing.assert_allclose(np.asarray(bb[b]), np.asarray(b1),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(bs[b]), np.asarray(s1),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(bi[b]), np.asarray(i1))


@requires_tpu
def test_big_tile_bf16_matches_f32_defaults_on_chip():
    """Dense-mode configuration (tile_q=2048, tile_db=512, bf16 operands)
    must agree with the default f32 kernel on the chosen neighbors' true
    distances — the deliberate reduced-precision opt-in must only flip
    near-ties."""
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((4096, 128)), jnp.float32)
    db = jnp.asarray(rng.standard_normal((4096, 128)), jnp.float32)
    m = jnp.ones((4096,), jnp.float32)
    i32, b32, _ = jax.block_until_ready(nn_search_pallas(q, db, m))
    ib, bb, _ = jax.block_until_ready(nn_search_pallas(
        q.astype(jnp.bfloat16), db.astype(jnp.bfloat16), m,
        tile_q=2048, tile_db=512))
    qn, dbn = np.asarray(q), np.asarray(db)
    d_chosen = ((qn - dbn[np.asarray(ib)]) ** 2).sum(-1)
    d_best = np.asarray(b32)
    # bf16 winner's true distance within 2% of the true best
    np.testing.assert_allclose(d_chosen, d_best, rtol=2e-2, atol=2e-2)
    agree = (np.asarray(ib) == np.asarray(i32)).mean()
    assert agree > 0.95, agree
