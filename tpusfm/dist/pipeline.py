"""Pipeline parallelism: pipeline stages spread over mesh devices.

The reference's two-view pipeline is a strict stage chain
detect -> match -> verify -> pose -> triangulate run serially per pair
(/root/reference/SfM-GMS/SfM-GMS/SfMUtil.cpp:4-83). Here the chain is
software-pipelined over a 1-D device mesh, GPipe-style, with micro-batched
image pairs:

* stage s lives on device s (SPMD: every device traces every stage body,
  `lax.switch` on `axis_index` executes only its own),
* inter-stage activations are fixed-shape pytree "edge" buffers rotated one
  hop per tick with `lax.ppermute` — neighbor ICI traffic only,
* a scan over T = n_micro + n_stages - 1 ticks drains the pipeline; device s
  processes micro-batch (t - s) at tick t, so all stages run concurrently on
  different micro-batches (the bubble is the usual (S-1)/T fraction).

Stage bodies are arbitrary jittable functions; tpusfm.sfm wires the
two-view pipeline through this with detect / geometry stages. Equivalence
against the serial path is tested on the virtual CPU mesh
(tests/test_dist.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
from jax.sharding import Mesh, PartitionSpec as P


def pipeline_map(stage_fns, inputs, mesh: Mesh, axis: str = "d"):
    """Run `stage_fns[0] -> ... -> stage_fns[S-1]` over micro-batches.

    stage_fns: list of S jittable functions; stage 0 consumes one input
      micro-batch (`jtu.tree_map(lambda x: x[i], inputs)`), stage s consumes
      stage s-1's output. All stage outputs must have static shapes/dtypes.
    inputs: pytree with leading micro-batch axis M (replicated; only the
      device hosting stage 0 reads it).
    mesh: 1-D mesh with exactly S devices on `axis`.

    Returns the stacked final-stage outputs with leading axis M, identical
    to `stack([chain(inputs[i]) for i in range(M)])`.
    """
    S = len(stage_fns)
    n_dev = mesh.devices.size
    if n_dev != S:
        raise ValueError(f"pipeline needs mesh size == n_stages ({S}), got {n_dev}")
    M = jtu.tree_leaves(inputs)[0].shape[0]
    T = M + S - 1

    # edge_specs[s] = input spec of stage s; edge_specs[S] = output spec.
    # Derived by abstract evaluation — no FLOPs run here.
    edge_specs = [
        jtu.tree_map(lambda x: jax.ShapeDtypeStruct(x.shape[1:], x.dtype), inputs)
    ]
    for fn in stage_fns:
        edge_specs.append(jax.eval_shape(fn, edge_specs[-1]))

    def _zeros(spec):
        return jtu.tree_map(lambda sp: jnp.zeros(sp.shape, sp.dtype), spec)

    def local(inputs):
        s = jax.lax.axis_index(axis)
        fwd = [(i, (i + 1) % S) for i in range(S)]

        # edges[k] (k=0..S-1) holds the value flowing INTO stage k+1's
        # device; a device reads edges[s-1] (for s>0) as its stage input.
        edges = [_zeros(e) for e in edge_specs[1:]]
        outs = jtu.tree_map(
            lambda sp: jnp.zeros((M,) + sp.shape, sp.dtype), edge_specs[-1]
        )

        def tick(carry, t):
            edges, outs = carry
            mb = t - s  # micro-batch this device works on at this tick
            active = (mb >= 0) & (mb < M)
            mb_c = jnp.clip(mb, 0, M - 1)

            # stage 0 reads its micro-batch from the replicated input stream
            mb_in = jtu.tree_map(
                lambda x: jax.lax.dynamic_index_in_dim(x, mb_c, keepdims=False),
                inputs,
            )

            # every device runs only its own stage's branch; branch i maps
            # its input edge to a full edge list with slot i replaced
            def make_branch(i):
                fn = stage_fns[i]

                def branch(operands):
                    mb_in, edges_t = operands
                    out = fn(mb_in if i == 0 else edges_t[i - 1])
                    return tuple(
                        out if j == i else e for j, e in enumerate(edges_t)
                    )

                return branch

            new_edges = jax.lax.switch(
                s, [make_branch(i) for i in range(S)], (mb_in, tuple(edges))
            )
            # inactive (bubble) ticks must not pollute the stream
            new_edges = [
                jtu.tree_map(lambda n, o: jnp.where(active, n, o), ne, oe)
                for ne, oe in zip(new_edges, edges)
            ]

            # the last stage records its result (before the rotate, so the
            # value lands in device S-1's local accumulator)
            done = active & (s == S - 1)
            outs = jtu.tree_map(
                lambda acc, v: jax.lax.cond(
                    done,
                    lambda a: jax.lax.dynamic_update_index_in_dim(a, v, mb_c, 0),
                    lambda a: a,
                    acc,
                ),
                outs, new_edges[-1],
            )

            # rotate edges one hop forward so stage s+1 sees stage s's output
            # next tick (the final edge feeds the output accumulator only and
            # needs no rotation)
            new_edges = [
                jtu.tree_map(lambda x: jax.lax.ppermute(x, axis, fwd), e)
                for e in new_edges[:-1]
            ] + new_edges[-1:]
            return (new_edges, outs), None

        (edges, outs), _ = jax.lax.scan(tick, (edges, outs), jnp.arange(T), length=T)
        # results live on device S-1; replicate them with a masked psum
        return jtu.tree_map(
            lambda x: jax.lax.psum(
                jnp.where(s == S - 1, x, jnp.zeros_like(x)), axis
            ),
            outs,
        )

    f = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(),), out_specs=P(),
        check_vma=False,
    )
    with mesh:
        return f(inputs)
