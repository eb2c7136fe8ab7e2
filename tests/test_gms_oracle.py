"""Independent plain-loop oracles for GMS and LOGOS (VERDICT r3 weak #7).

This cv2 build lacks xfeatures2d, so the GMS/LOGOS cells have no external
baseline; these tests close the loop with literal numpy transcriptions of
the published rules — nested loops, dictionaries, no vectorization — and
assert the TPU implementations produce the identical inlier sets.

GMS (Bian et al. CVPR'17, as wrapped by cv::xfeatures2d::matchGMS,
/root/reference/SfM-GMS/SfM-GMS/FeatureMatchUtil.cpp:69): grid votes,
per-left-cell best right cell, 3x3 neighborhood score vs
tau = alpha * sqrt(mean neighborhood occupancy), OR over 4 half-cell
offsets. LOGOS (Lowry & Andreasson '18): same-word candidates verified by
local geometric support of spatial nearest neighbors.
"""
import numpy as np
import jax.numpy as jnp

from tpusfm.config import GmsConfig, LogosConfig
from tpusfm.match.gms import gms_filter
from tpusfm.match.logos import logos_verify
from tpusfm.types import Keypoints, Matches


def _gms_oracle_one_scale(xy1, xy2, w1, h1, w2, h2, rows1, cols1, rows2, cols2,
                          alpha):
    """Plain-loop GMS at one grid scale, no rotation: (N,) bool inliers."""
    n = len(xy1)
    inlier = np.zeros(n, bool)
    for off_x, off_y in ((0.0, 0.0), (1.0, 0.0), (0.0, 1.0), (1.0, 1.0)):
        def cell(xy, w, h, rows, cols):
            cw, ch = w / cols, h / rows
            out = []
            for (x, y) in xy:
                cx = int(np.floor(x / cw + off_x * 0.5))
                cy = int(np.floor(y / ch + off_y * 0.5))
                if 0 <= cx < cols and 0 <= cy < rows:
                    out.append(cy * cols + cx)
                else:
                    out.append(-1)
            return out

        c1 = cell(xy1, w1, h1, rows1, cols1)
        c2 = cell(xy2, w2, h2, rows2, cols2)
        votes = {}
        npts1 = {}
        for k in range(n):
            if c1[k] < 0 or c2[k] < 0:
                continue
            votes[(c1[k], c2[k])] = votes.get((c1[k], c2[k]), 0) + 1
            npts1[c1[k]] = npts1.get(c1[k], 0) + 1

        def neighbors(cell_id, rows, cols):
            cy, cx = divmod(cell_id, cols)
            out = []
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    ny, nx = cy + dy, cx + dx
                    out.append(ny * cols + nx
                               if 0 <= ny < rows and 0 <= nx < cols else -1)
            return out

        for i in range(rows1 * cols1):
            if npts1.get(i, 0) == 0:
                continue
            # best right cell by votes (ties: lowest index, like argmax)
            best_j, best_v = 0, -1
            for j in range(rows2 * cols2):
                v = votes.get((i, j), 0)
                if v > best_v:
                    best_j, best_v = j, v
            nb1 = neighbors(i, rows1, cols1)
            nb2 = neighbors(best_j, rows2, cols2)
            score = 0.0
            occ = 0.0
            n_valid = 0
            for k9 in range(9):
                if nb1[k9] >= 0:
                    n_valid += 1
                    occ += npts1.get(nb1[k9], 0)
                if nb1[k9] >= 0 and nb2[k9] >= 0:
                    score += votes.get((nb1[k9], nb2[k9]), 0)
            thresh = alpha * np.sqrt(occ / max(n_valid, 1))
            if score > thresh:
                for k in range(n):
                    if c1[k] == i and c2[k] == best_j:
                        inlier[k] = True
    return inlier


def _kp(xy, scale=None, angle=None):
    n = len(xy)
    return Keypoints(
        xy=jnp.asarray(xy, jnp.float32),
        scale=jnp.asarray(scale if scale is not None else np.ones(n), jnp.float32),
        angle=jnp.asarray(angle if angle is not None else np.zeros(n), jnp.float32),
        response=jnp.ones(n), mask=jnp.ones(n, bool))


def test_gms_matches_numpy_oracle():
    rng = np.random.default_rng(11)
    n = 1600        # ~4 matches/cell so coherent scores clear the threshold
    w, h = 640, 480
    xy1 = rng.uniform([0, 0], [w, h], size=(n, 2)).astype(np.float32)
    xy2 = xy1 + np.array([15.0, -9.0], np.float32)
    out = rng.random(n) > 0.7
    xy2[out] = rng.uniform([0, 0], [w, h], size=(int(out.sum()), 2))

    m = Matches(idx1=jnp.arange(n, dtype=jnp.int32),
                idx2=jnp.arange(n, dtype=jnp.int32),
                distance=jnp.zeros(n), mask=jnp.ones(n, bool))
    cfg = GmsConfig(with_rotation=False, with_scale=False)
    got = np.asarray(gms_filter(_kp(xy1), _kp(xy2), m, (w, h), (w, h), cfg).mask)
    want = _gms_oracle_one_scale(xy1, xy2, w, h, w, h,
                                 cfg.grid_rows, cfg.grid_cols,
                                 cfg.grid_rows, cfg.grid_cols,
                                 cfg.threshold_factor)
    assert want.sum() > 50          # the oracle finds the coherent motion
    np.testing.assert_array_equal(got, want)


def _logos_oracle(xy1, xy2, s1, s2, a1, a2, w1, w2, cfg: LogosConfig):
    """Plain-loop LOGOS verification: same-word candidates, support from
    spatial KNN word+geometry agreement, mutual best. Returns (N1,) best_j
    or -1."""
    n1, n2 = len(xy1), len(xy2)

    def knn(xy, k):
        out = []
        for i in range(len(xy)):
            d = np.sum((xy - xy[i]) ** 2, axis=1)
            d[i] = np.inf
            out.append(np.argsort(d, kind="stable")[:k])
        return out

    k1 = knn(xy1, cfg.knn)
    k2 = knn(xy2, cfg.knn)

    def local_vec(xy, s, a, i, j):
        rel = xy[j] - xy[i]
        c, sn = np.cos(-a[i]), np.sin(-a[i])
        v = np.array([rel[0] * c - rel[1] * sn, rel[0] * sn + rel[1] * c])
        return v / max(s[i], 1e-6)

    tau2 = cfg.scale_ratio_threshold ** 2
    score = -np.ones((n1, n2))
    for i in range(n1):
        for j in range(n2):
            if w1[i] != w2[j] or w1[i] < 0:
                continue
            sr = s1[i] / max(s2[j], 1e-6)
            if not (1.0 / cfg.scale_ratio_threshold < sr < cfg.scale_ratio_threshold):
                continue
            sup = 0
            for ii in k1[i]:
                for jj in k2[j]:
                    if w1[ii] != w2[jj] or w1[ii] < 0:
                        continue
                    dv = (local_vec(xy1, s1, a1, i, ii)
                          - local_vec(xy2, s2, a2, j, jj))
                    if dv @ dv < tau2:
                        sup += 1
            score[i, j] = sup

    best = -np.ones(n1, np.int64)
    for i in range(n1):
        j = int(np.argmax(score[i]))
        if score[i, j] >= cfg.min_support:
            best[i] = j
    # mutual
    col_best = np.argmax(np.where((best >= 0)[:, None], score, -1), axis=0)
    for i in range(n1):
        if best[i] >= 0 and col_best[best[i]] != i:
            best[i] = -1
    return best


def test_logos_matches_numpy_oracle():
    rng = np.random.default_rng(5)
    n = 60
    w, h = 320, 240
    xy1 = rng.uniform([0, 0], [w, h], size=(n, 2)).astype(np.float32)
    xy2 = (xy1 + np.array([8.0, 5.0], np.float32)).astype(np.float32)
    words = rng.integers(0, 10, n)
    s = np.ones(n, np.float32)
    a = np.zeros(n, np.float32)

    cfg = LogosConfig()
    out = logos_verify(_kp(xy1, s, a), _kp(xy2, s, a),
                       jnp.asarray(words), jnp.asarray(words), cfg)
    got = np.where(np.asarray(out.mask), np.asarray(out.idx2), -1)
    want = _logos_oracle(xy1, xy2, s, s, a, a, words, words, cfg)
    assert (want >= 0).sum() > 20
    np.testing.assert_array_equal(got, want)
