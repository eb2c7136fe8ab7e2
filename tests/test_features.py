"""Feature detectors: SIFT blob localization + rotation invariance (mirrors
the reference driver's rotation/rescale robustness probes, main.cpp:34-47),
ORB corners, dense descriptors."""
import numpy as np
import jax
import jax.numpy as jnp

from tpusfm.config import SiftConfig, OrbConfig, MatchConfig
from tpusfm.features.sift import sift_detect_and_compute
from tpusfm.features.orb import orb_detect_and_compute
from tpusfm.features.dense import dense_sift_descriptors
from tpusfm.match.bf import bf_match


def _blob_image(h=96, w=128, blobs=((30, 40, 3), (60, 100, 5), (70, 30, 4))):
    ys, xs = np.mgrid[0:h, 0:w]
    img = 0.05 * np.sin(xs / 9.0) * np.cos(ys / 7.0)
    for cy, cx, s in blobs:
        img += np.exp(-((ys - cy) ** 2 + (xs - cx) ** 2) / (2 * s * s))
    return img.astype(np.float32)


def test_sift_finds_blobs():
    img = _blob_image()
    f = sift_detect_and_compute(jnp.array(img), SiftConfig(max_features=128, upsample=False))
    m = np.asarray(f.kpts.mask)
    assert m.sum() >= 3
    xy = np.asarray(f.kpts.xy)[m]
    for cy, cx, s in ((30, 40, 3), (60, 100, 5), (70, 30, 4)):
        d = np.hypot(xy[:, 0] - cx, xy[:, 1] - cy).min()
        assert d < 2.0, (cx, cy, d)
    norms = np.linalg.norm(np.asarray(f.desc)[m], axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)


def test_sift_rotation_invariant_descriptors():
    rng = np.random.default_rng(0)
    img = _blob_image(128, 128, ((25, 30, 3), (60, 62, 4), (70, 25, 2.5), (30, 70, 5),
                                 (100, 40, 3.5), (45, 100, 4.5), (95, 95, 2.5)))
    img += rng.normal(size=img.shape).astype(np.float32) * 0.01
    rot = np.rot90(img).copy()  # 90 deg rotation
    cfg = SiftConfig(max_features=64, upsample=False)
    f1 = sift_detect_and_compute(jnp.array(img), cfg)
    f2 = sift_detect_and_compute(jnp.array(rot), cfg)
    m = bf_match(f1.desc, f2.desc, f1.kpts.mask, f2.kpts.mask, MatchConfig(max_matches=64))
    mk = np.asarray(m.mask)
    assert mk.sum() >= 4
    # verify matched coordinates map under the rotation (x,y) -> (y, W-1-x)
    p1 = np.asarray(f1.kpts.xy)[np.asarray(m.idx1)[mk]]
    p2 = np.asarray(f2.kpts.xy)[np.asarray(m.idx2)[mk]]
    w = img.shape[1]
    expected = np.stack([p1[:, 1], w - 1 - p1[:, 0]], 1)
    err = np.hypot(*(p2 - expected).T)
    assert np.median(err) < 2.0, np.median(err)


def test_orb_corners_and_matching():
    # white square on black: corners at the 4 square corners
    img = np.zeros((96, 128), np.float32)
    img[30:70, 40:90] = 1.0
    f = orb_detect_and_compute(jnp.array(img), OrbConfig(max_features=64, edge_threshold=16))
    m = np.asarray(f.kpts.mask)
    assert m.sum() >= 4
    xy = np.asarray(f.kpts.xy)[m]
    corners = [(40, 30), (89, 30), (40, 69), (89, 69)]
    for cx, cy in corners:
        assert np.hypot(xy[:, 0] - cx, xy[:, 1] - cy).min() < 3.0

    # translated copy of a random texture: hamming matching recovers the shift
    rng = np.random.default_rng(7)
    tex = np.kron(rng.random((12, 16)) > 0.5, np.ones((8, 8))).astype(np.float32)
    img = tex[:96, :128]
    img2 = np.roll(img, (5, 9), axis=(0, 1))
    f = orb_detect_and_compute(jnp.array(img), OrbConfig(max_features=64, edge_threshold=16))
    f2 = orb_detect_and_compute(jnp.array(img2), OrbConfig(max_features=64, edge_threshold=16))
    mm = bf_match(f.desc, f2.desc, f.kpts.mask, f2.kpts.mask,
                  MatchConfig(max_matches=64, distance_coef=100.0), metric="hamming")
    mk = np.asarray(mm.mask)
    assert mk.sum() >= 3
    p1 = np.asarray(f.kpts.xy)[np.asarray(mm.idx1)[mk]]
    p2 = np.asarray(f2.kpts.xy)[np.asarray(mm.idx2)[mk]]
    shift = np.median(p2 - p1, axis=0)
    np.testing.assert_allclose(shift, [9, 5], atol=1.0)


def test_dense_descriptors_shape_and_shift():
    img = _blob_image(64, 80)
    d = dense_sift_descriptors(jnp.array(img), cell=4)
    assert d.shape == (64, 80, 128)
    n = np.linalg.norm(np.asarray(d), axis=-1)
    assert (np.abs(n[8:-8, 8:-8] - 1.0) < 1e-3).mean() > 0.9
    # shifted image -> shifted descriptors (interior)
    img2 = np.roll(img, 6, axis=1)
    d2 = dense_sift_descriptors(jnp.array(img2), cell=4)
    a = np.asarray(d)[20:40, 20:60]
    b = np.asarray(d2)[20:40, 26:66]
    cos = (a * b).sum(-1)
    assert np.median(cos) > 0.99


def test_dense_orb_descriptors_match_under_shift():
    """Dense rotated-BRIEF (the reference's orb x dense cell,
    DisparityUtil.cpp:125-133): descriptors of a 5-px-shifted image must be
    Hamming-identical at corresponding pixels and ~128/256 at random ones."""
    from tpusfm.features.orb import dense_orb_descriptors

    rng = np.random.default_rng(0)
    # must exceed 2x the cv2 edgeThreshold=31 border the dense path now
    # replicates (scripts/orb_dense_experiment.py)
    img = rng.random((120, 160)).astype(np.float32)
    d1, v1 = dense_orb_descriptors(jnp.array(img))
    d2, v2 = dense_orb_descriptors(jnp.array(np.roll(img, 5, axis=1)))
    d1, d2 = np.asarray(d1), np.asarray(d2)
    assert np.asarray(v1).sum() > 500

    W = 160
    pop = np.vectorize(lambda x: bin(int(x)).count("1"))
    for (y, x) in [(60, 60), (50, 80), (70, 40)]:
        ham = pop(d1[y * W + x] ^ d2[y * W + x + 5]).sum()
        assert ham == 0, (y, x, ham)
    ham_rand = pop(d1[60 * W + 60] ^ d2[40 * W + 120]).sum()
    assert 80 < ham_rand < 180, ham_rand
