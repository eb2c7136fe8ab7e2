"""Distributed pose-graph optimization: edges sharded across the mesh.

Same recipe as sharded bundle adjustment (tpusfm/dist/sharded_ba.py): the
normal system H, gradient g, and cost are segment-sums over the edge axis,
so each device reduces its edge shard locally and one psum yields the
replicated (6N, 6N) system; the dense damped solve then runs identically on
every device. Compute is O(E/devices); communication is one (6N)^2 block
per LM iteration and rides ICI.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from tpusfm.pgo.graph import PgoConfig, build_normal_system, graph_cost, lm_scan
from tpusfm.utils.pad import round_up


def sharded_optimize_pose_graph(R, t, ei, ej, Zr, Zt, w, mesh: Mesh,
                                cfg: PgoConfig = PgoConfig(),
                                n_fixed: int = 1, axis: str = "d"):
    """LM pose-graph optimization with the edge axis sharded over ``mesh``.

    Semantics identical to tpusfm.pgo.optimize_pose_graph (single device);
    equivalence tested on the virtual CPU mesh (tests/test_pgo.py)."""
    N = R.shape[0]
    n_dev = mesh.devices.size
    E = ei.shape[0]
    cap = round_up(max(E, n_dev), n_dev)
    pad = cap - E
    ei = jnp.concatenate([ei, jnp.zeros(pad, ei.dtype)])
    ej = jnp.concatenate([ej, jnp.zeros(pad, ej.dtype)])
    Zr = jnp.concatenate([Zr, jnp.broadcast_to(jnp.eye(3), (pad, 3, 3))])
    Zt = jnp.concatenate([Zt, jnp.zeros((pad, 3))])
    w = jnp.concatenate([w, jnp.zeros(pad)])

    normal_fn = jax.shard_map(
        lambda R_, t_, ei_, ej_, zr, zt, w_: tuple(
            jax.lax.psum(o, axis)
            for o in build_normal_system(R_, t_, ei_, ej_, zr, zt, w_, N, cfg)
        ),
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    cost_fn = jax.shard_map(
        lambda R_, t_, ei_, ej_, zr, zt, w_: jax.lax.psum(
            graph_cost(R_, t_, ei_, ej_, zr, zt, w_, cfg), axis),
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(),
        check_vma=False,
    )

    @jax.jit
    def run(R, t, ei, ej, Zr, Zt, w):
        return lm_scan(
            R, t, cfg, n_fixed,
            lambda R_, t_: normal_fn(R_, t_, ei, ej, Zr, Zt, w),
            lambda R_, t_: cost_fn(R_, t_, ei, ej, Zr, Zt, w),
        )

    with mesh:
        return run(R, t, ei, ej, Zr, Zt, w)
