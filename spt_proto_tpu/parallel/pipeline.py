"""GPipe-style pipeline parallelism over a 'pipe' mesh axis.

The reference has no pipeline mode (SURVEY §2.8 marks PP optional — its
DeepSpeed config covers memory with ZeRO-3 instead,
script/4-sparse-tuning-1.py:172-175). The TPU-native design makes PP nearly
free to add: DecoderLM already stacks layer params on a leading [n_layers]
axis (nn.scan), which is the natural stage cut — shard it over 'pipe' so
each stage holds n_layers/n_pipe layers, split the batch into M
microbatches, and run the fill/steady/drain schedule (M + n_pipe - 1 ticks)
as ONE lax.scan inside shard_map. Stage-to-stage activation transfer is a
single lax.ppermute over ICI per tick; XLA overlaps the permute DMA with
the next tick's compute. Backward is jax.grad through the scan — the
transposed ppermute runs the reverse schedule automatically (the 1F1B
memory refinement is left to cfg.remat, which re-materializes each block).

Composition: PP x DP ('data' shards the batch per pipeline) works out of
the box. PP x TP works through shard_map AUTO axes: the region is manual
only over ('data', 'pipe') (axis_names=...), every other mesh axis —
'model' in particular — stays auto, so XLA's SPMD partitioner sees the
block math as an ordinary pjit region and inserts the tensor-parallel
collectives implied by the params' 'model' shardings (heads / FFN blocks
split per sharding.py::_BLOCK_RULES) inside each pipeline stage. No
manual per-block collectives needed — the idiomatic JAX composition.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

PIPE_AXIS = 'pipe'


def block_specs(block_params: Any, pipe_axis: str = PIPE_AXIS) -> Any:
    """Per-leaf PartitionSpec sharding the stacked-layer axis on 'pipe'."""
    return jax.tree.map(
        lambda leaf: P(pipe_axis, *([None] * (leaf.ndim - 1))),
        block_params)


def pipeline_blocks(block_apply: Callable[[Any, jax.Array],
                                          tuple[jax.Array, jax.Array]],
                    block_params: Any, h: jax.Array, *, mesh,
                    n_micro: int, data_axis: str = 'data',
                    pipe_axis: str = PIPE_AXIS,
                    remat: bool = False) -> tuple[jax.Array, jax.Array]:
    """Run the stacked transformer blocks as a microbatched pipeline.

    block_apply(layer_params, x) -> (y, aux_scalar) applies ONE layer.
    h [B, S, D] sharded P(data, None, None); block_params stacked
    [n_layers, ...] sharded P(pipe, ...). Returns (h_out with the same
    sharding, aux [n_data] — per-data-shard sum over layers of the
    batch-mean aux, i.e. jnp.mean of it matches DecoderLM's pq_loss).
    """
    n_pipe = mesh.shape[pipe_axis]
    n_layers = jax.tree.leaves(block_params)[0].shape[0]
    assert n_layers % n_pipe == 0, (n_layers, n_pipe)
    one_layer = block_apply if not remat else jax.checkpoint(block_apply)

    def body(bp, h_loc):
        m = n_micro
        stage = jax.lax.axis_index(pipe_axis)
        b_loc, s, d_model = h_loc.shape
        assert b_loc % m == 0, (b_loc, m)
        mb = b_loc // m
        micro = h_loc.reshape(m, mb, s, d_model)

        def local_layers(x):
            def scan_body(x, lp):
                return one_layer(lp, x)
            y, auxs = jax.lax.scan(scan_body, x, bp)
            return y, jnp.sum(auxs).astype(jnp.float32)

        def tick(carry, t):
            state, outputs, aux = carry
            inp = jax.lax.dynamic_index_in_dim(
                micro, jnp.clip(t, 0, m - 1), 0, keepdims=False)
            x = jnp.where(stage == 0, inp, state)
            y, aux_l = local_layers(x)
            # stage p holds a real microbatch during ticks [p, p + m)
            active = jnp.logical_and(stage <= t, t < stage + m)
            aux = aux + jnp.where(active, aux_l, 0.0)
            oidx = jnp.clip(t - (n_pipe - 1), 0, m - 1)
            upd = jax.lax.dynamic_update_index_in_dim(
                outputs, y.astype(outputs.dtype), oidx, 0)
            write = jnp.logical_and(stage == n_pipe - 1, t >= n_pipe - 1)
            outputs = jnp.where(write, upd, outputs)
            nxt = jax.lax.ppermute(
                y, pipe_axis, [(i, i + 1) for i in range(n_pipe - 1)])
            return (nxt, outputs, aux), None

        # pcast: the scan carry becomes device-varying after the first
        # tick (ppermute/axis_index), so the init must be marked varying
        # for shard_map's vma type check
        init = jax.tree.map(
            lambda x: jax.lax.pcast(x, (data_axis, pipe_axis),
                                    to='varying'),
            (jnp.zeros((mb, s, d_model), h_loc.dtype),
             jnp.zeros((m, mb, s, d_model), h_loc.dtype),
             jnp.zeros((), jnp.float32)))
        (_, outputs, aux), _ = jax.lax.scan(
            tick, init, jnp.arange(m + n_pipe - 1))
        # only the last stage holds real outputs; the masked psum is the
        # broadcast back to every pipe rank (out spec is pipe-replicated)
        outputs = jax.lax.psum(
            jnp.where(stage == n_pipe - 1, outputs, 0), pipe_axis)
        # per-layer aux is a batch mean; mean over the m microbatch means
        # equals the full-batch mean
        aux = jax.lax.psum(aux, pipe_axis) / m
        return outputs.reshape(b_loc, s, d_model), aux[None]

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(block_specs(block_params, pipe_axis),
                  P(data_axis, None, None)),
        out_specs=(P(data_axis, None, None), P(data_axis)),
        # manual ONLY over (data, pipe): any other mesh axis (e.g.
        # 'model') stays AUTO, so XLA partitions the stage body over it —
        # this is what lets TP compose with PP (see module docstring)
        axis_names=frozenset({data_axis, pipe_axis}),
    )(block_params, h)
