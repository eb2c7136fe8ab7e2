"""Checkpoint / resume of reconstruction state.

The reference keeps everything in memory and loses it on exit (SURVEY.md §5)
— outputs are only PNGs. Here the full reconstruction state (camera params,
points, validity, observation table, BA iteration counter) round-trips
through npz so a preempted multi-host BA job resumes where it stopped.
"""
from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

from tpusfm.ba.tracks import Observations


def save_reconstruction(path: str, cams, points, point_valid, obs: Observations,
                        ba_iteration: int = 0, extra: dict | None = None) -> None:
    payload = dict(
        cams=np.asarray(cams),
        points=np.asarray(points),
        point_valid=np.asarray(point_valid),
        obs_xy=np.asarray(obs.xy),
        obs_cam=np.asarray(obs.cam),
        obs_pt=np.asarray(obs.pt),
        obs_mask=np.asarray(obs.mask),
        ba_iteration=np.int64(ba_iteration),
    )
    if extra:
        for k, v in extra.items():
            payload["x_" + k] = np.asarray(v)
    tmp = path + ".tmp.npz"
    with open(tmp, "wb") as f:
        np.savez(f, **payload)
    os.replace(tmp, path)  # atomic swap: a preempted write never corrupts


def load_reconstruction(path: str):
    d = np.load(path)
    obs = Observations(
        xy=jnp.asarray(d["obs_xy"]),
        cam=jnp.asarray(d["obs_cam"]),
        pt=jnp.asarray(d["obs_pt"]),
        mask=jnp.asarray(d["obs_mask"]),
    )
    extra = {k[2:]: d[k] for k in d.files if k.startswith("x_")}
    return {
        "cams": d["cams"],
        "points": d["points"],
        "point_valid": d["point_valid"],
        "obs": obs,
        "ba_iteration": int(d["ba_iteration"]),
        "extra": extra,
    }
