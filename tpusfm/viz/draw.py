"""Match/keypoint visualization PNGs — headless replacement for the
reference's drawMatches + imshow blocks
(/root/reference/SfM-GMS/SfM-GMS/FeatureMatchUtil.cpp:73-83,120-130,152-161).
Host-side (PIL) drawing; inputs are numpy/JAX arrays."""
from __future__ import annotations

import numpy as np

from PIL import Image, ImageDraw


def _to_rgb8(img) -> np.ndarray:
    a = np.asarray(img)
    if a.dtype != np.uint8:
        a = np.clip(a * 255.0 + 0.5, 0, 255).astype(np.uint8)
    if a.ndim == 2:
        a = np.stack([a] * 3, -1)
    return a


def draw_keypoints(img, kpts, path: str | None = None):
    """Draw keypoint circles (radius = scale) on an image."""
    rgb = _to_rgb8(img)
    im = Image.fromarray(rgb)
    d = ImageDraw.Draw(im)
    xy = np.asarray(kpts.xy)
    sc = np.asarray(kpts.scale)
    m = np.asarray(kpts.mask)
    for (x, y), s in zip(xy[m], sc[m]):
        r = max(2.0, float(s))
        d.ellipse([x - r, y - r, x + r, y + r], outline=(0, 255, 0))
    if path:
        im.save(path)
    return np.asarray(im)


def draw_matches(img1, kpts1, img2, kpts2, matches, path: str | None = None):
    """Side-by-side match visualization with connecting lines."""
    a = _to_rgb8(img1)
    b = _to_rgb8(img2)
    h = max(a.shape[0], b.shape[0])
    canvas = np.zeros((h, a.shape[1] + b.shape[1], 3), np.uint8)
    canvas[: a.shape[0], : a.shape[1]] = a
    canvas[: b.shape[0], a.shape[1] :] = b
    im = Image.fromarray(canvas)
    d = ImageDraw.Draw(im)
    off = a.shape[1]
    xy1 = np.asarray(kpts1.xy)
    xy2 = np.asarray(kpts2.xy)
    i1 = np.asarray(matches.idx1)
    i2 = np.asarray(matches.idx2)
    mm = np.asarray(matches.mask)
    rng = np.random.default_rng(0)
    for k in np.nonzero(mm)[0]:
        p = xy1[i1[k]]
        q = xy2[i2[k]]
        color = tuple(int(c) for c in rng.integers(64, 255, 3))
        d.line([p[0], p[1], q[0] + off, q[1]], fill=color, width=1)
        d.ellipse([p[0] - 2, p[1] - 2, p[0] + 2, p[1] + 2], outline=color)
        d.ellipse([q[0] + off - 2, q[1] - 2, q[0] + off + 2, q[1] + 2], outline=color)
    if path:
        im.save(path)
    return np.asarray(im)
