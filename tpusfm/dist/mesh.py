"""Device mesh + collectives layer.

The TPU-native communication stack (SURVEY.md §2.4): intra-slice traffic
rides ICI via XLA collectives (psum / all_gather / ppermute) expressed
through `jax.shard_map` over a `jax.sharding.Mesh`; multi-host jobs extend
the same mesh over DCN after `jax.distributed.initialize`. There is no
NCCL/MPI analog to manage — the XLA runtime owns transport.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec


def device_count() -> int:
    return jax.device_count()


def make_mesh(n_devices: int | None = None, axis: str = "d") -> Mesh:
    """1-D mesh over the first n devices (data/observation axis)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def make_mesh_2d(shape: tuple[int, int], axes=("dp", "mp")) -> Mesh:
    devs = np.array(jax.devices()[: shape[0] * shape[1]]).reshape(shape)
    return Mesh(devs, axes)


def init_multihost(coordinator: str | None = None):
    """Multi-host entry (DCN): call once per process before building meshes.

    On a single host this is a no-op. Mirrors jax.distributed.initialize
    semantics; kept behind a wrapper so CLI/bench can gate on env."""
    if jax.process_count() > 1:
        return  # already initialized by the launcher
    if coordinator:
        jax.distributed.initialize(coordinator_address=coordinator)
