"""Feature tracks across a multi-view sequence.

New capability beyond the two-view reference (SURVEY.md §2.4): pairwise
matches are merged into tracks with a host-side union-find over
(view, keypoint) nodes — data-dependent graph work that belongs on the host
— then packed into fixed-capacity observation tensors for the device-side
bundle adjustment.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Observations:
    """Packed observation table for BA.

    xy:   (O, 2) pixel observations.
    cam:  (O,) int32 view index.
    pt:   (O,) int32 track/point index.
    mask: (O,) validity.
    """

    xy: Any
    cam: Any
    pt: Any
    mask: Any

    def tree_flatten(self):
        return [self.xy, self.cam, self.pt, self.mask], None

    @classmethod
    def tree_unflatten(cls, _, children):
        return cls(*children)

    @property
    def n_obs(self):
        return int(np.asarray(self.mask).sum())


class _UF:
    def __init__(self):
        self.parent: dict = {}

    def find(self, x):
        p = self.parent.setdefault(x, x)
        if p == x:
            return x
        r = self.find(p)
        self.parent[x] = r
        return r

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[rb] = ra


def build_tracks(pair_matches, kpts_xy, n_views: int,
                 max_tracks: int | None = None, min_length: int = 2):
    """Merge pairwise matches into tracks.

    pair_matches: dict[(i, j)] -> (idx_i (M,), idx_j (M,), mask (M,)) numpy.
    kpts_xy: list of (K, 2) keypoint coordinate arrays per view.
    Returns (Observations, n_tracks). Tracks observed in < min_length views
    or with conflicting observations (two keypoints of one view) are dropped.
    """
    uf = _UF()
    for (i, j), (ii, jj, mm) in pair_matches.items():
        for a, b, v in zip(np.asarray(ii), np.asarray(jj), np.asarray(mm)):
            if v:
                uf.union((i, int(a)), (j, int(b)))

    groups: dict = {}
    for node in list(uf.parent.keys()):
        groups.setdefault(uf.find(node), []).append(node)

    tracks = []
    for nodes in groups.values():
        views = [v for v, _ in nodes]
        if len(nodes) < min_length or len(set(views)) != len(views):
            continue  # short or inconsistent (same view twice)
        tracks.append(sorted(nodes))
    tracks.sort(key=len, reverse=True)
    if max_tracks is not None:
        tracks = tracks[:max_tracks]

    obs_xy, obs_cam, obs_pt = [], [], []
    for t_id, nodes in enumerate(tracks):
        for v, k in nodes:
            obs_xy.append(np.asarray(kpts_xy[v])[k])
            obs_cam.append(v)
            obs_pt.append(t_id)
    o = len(obs_xy)
    obs = Observations(
        xy=jnp.asarray(np.array(obs_xy, np.float32).reshape(o, 2)),
        cam=jnp.asarray(np.array(obs_cam, np.int32)),
        pt=jnp.asarray(np.array(obs_pt, np.int32)),
        mask=jnp.ones((o,), bool),
    )
    return obs, len(tracks)


def pad_observations(obs: Observations, capacity: int) -> Observations:
    """Pad to a fixed capacity (e.g. a multiple of the device count)."""
    o = obs.xy.shape[0]
    if o >= capacity:
        return obs
    pad = capacity - o
    return Observations(
        xy=jnp.pad(obs.xy, ((0, pad), (0, 0))),
        cam=jnp.pad(obs.cam, (0, pad)),
        pt=jnp.pad(obs.pt, (0, pad)),
        mask=jnp.pad(obs.mask, (0, pad)),
    )
