"""Expert-parallel routed FFN: distributed token routing over a mesh axis.

Completes the EP story (SURVEY §2.8): the TP split already shards the FFN
blocks (experts) across devices, but every device still computes every
token against its local blocks (mask dispatch — compute does not scale
with the routed fraction). True expert parallelism shards tokens AND
experts over the SAME mesh axis and exchanges only the routed tokens:

  1. each device capacity-dispatches its local tokens to all n blocks
     (ops/routed_ffn.py::capacity_dispatch — same plan as the gather impl);
  2. one lax.all_to_all over ICI sends each block's token slots to the
     device that owns the block;
  3. per-local-block batched GEMMs (MXU-dense, flops proportional to the
     activated fraction);
  4. the reverse all_to_all returns the block outputs, which scatter-add
     back into the local token rows.

The reference has no distributed dispatch at all — its routed FFN loops
blocks in Python on one GPU (naive_gpt/layers/sparse/feedforward.py:66-82)
and its only multi-device story is DeepSpeed ZeRO data parallelism
(script/4-sparse-tuning-1.py). This is the TPU-native scale-out of that
layer: the all_to_all pair is XLA's collective (rides ICI), and its
transpose IS the backward exchange, so jax.grad gives the distributed
backward for free.

Usage: the layer reads the mesh from the `ep_mesh(...)` context at trace
time (mirrors how make_cp_train_step binds the mesh for ring attention):

    with ep_mesh(mesh, axis='data'):
        step = jax.jit(make_train_step(cfg_ep, tx))   # cfg.ffn_impl='ep'

Weight layouts match ops/routed_ffn.py; the expert (block) axis of
w1/b1/w2 and the per-block LoRA factors shard P(axis), everything else is
replicated — aligned with the FSDP rules so the d_ff shards double as
ZeRO memory shards.
"""
from __future__ import annotations

import contextlib
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from spt_proto_tpu.ops.routed_ffn import capacity_dispatch

_EP: list = []  # (mesh, axis) stack


@contextlib.contextmanager
def ep_mesh(mesh, axis: str = 'data'):
    """Bind the mesh/axis that expert-parallel FFN layers dispatch over.

    Must be active while the train/eval step is TRACED (the mesh is baked
    into the jaxpr); the context is free to end before execution.
    """
    _EP.append((mesh, axis))
    try:
        yield
    finally:
        _EP.pop()


def current_ep():
    if not _EP:
        raise RuntimeError(
            "ffn_impl='ep' requires an active ep_mesh(mesh, axis) context "
            'around trace time (see ops/routed_ffn_ep.py)')
    return _EP[-1]


def _capacity(t_loc: int, top_k: int, n: int, factor: float) -> int:
    cap = int(-(-t_loc * top_k * factor // n))
    return max(8, min(t_loc, cap))


def _warn_drops(n_dropped):
    jax.lax.cond(
        n_dropped > 0,
        lambda d: jax.debug.print(
            'routed_ffn_ep: {d} token-block assignments dropped '
            '(capacity overflow — raise capacity_factor)', d=d),
        lambda d: None, n_dropped)


def _dispatch(x_loc, probs_loc, top_k, cap):
    """Local capacity plan + gathered payload.

    Returns (xg [n, cap, d] token payload (pads=0), coeff [n, cap] router
    prob of the chosen block per slot (pads=0), token_idx [n, cap] local
    row ids (pad sentinel = t_loc), valid [n, cap])."""
    t_loc, d = x_loc.shape
    n = probs_loc.shape[-1]
    token_idx, valid, n_dropped = capacity_dispatch(probs_loc, top_k, cap)
    _warn_drops(n_dropped)
    xpad = jnp.concatenate([x_loc, jnp.zeros((1, d), x_loc.dtype)], axis=0)
    xg = xpad[token_idx]                                   # [n, cap, d]
    ppad = jnp.concatenate(
        [probs_loc, jnp.zeros((1, n), probs_loc.dtype)], axis=0)
    coeff = jnp.take_along_axis(
        ppad[token_idx.reshape(-1)],
        jnp.repeat(jnp.arange(n), cap)[:, None], axis=1).reshape(n, cap)
    coeff = jnp.where(valid, coeff, 0.0)
    return xg, coeff, token_idx, valid


def _to_experts(arr, axis_name, n_dev):
    """[n, cap, ...] expert-major payload -> [n_loc, n_dev*cap, ...] rows
    for the local experts, gathered from every source device."""
    n = arr.shape[0]
    n_loc = n // n_dev
    a = arr.reshape(n_dev, n_loc, *arr.shape[1:])
    a = jax.lax.all_to_all(a, axis_name, split_axis=0, concat_axis=0)
    a = jnp.swapaxes(a, 0, 1)            # [n_loc, n_dev, cap, ...]
    return a.reshape(n_loc, -1, *arr.shape[2:])


def _from_experts(arr, axis_name, n_dev, cap):
    """Inverse of _to_experts: [n_loc, n_dev*cap, ...] -> [n, cap, ...]."""
    n_loc = arr.shape[0]
    tail = arr.shape[2:]
    a = arr.reshape(n_loc, n_dev, cap, *tail)
    a = jnp.swapaxes(a, 0, 1)            # [n_dev, n_loc, cap, ...]
    a = jax.lax.all_to_all(a, axis_name, split_axis=0, concat_axis=0)
    return a.reshape(n_dev * n_loc, cap, *tail)


def _undispatch(ys, token_idx, valid, t_loc):
    ys = jnp.where(valid[..., None], ys, 0.0)
    d = ys.shape[-1]
    y = jnp.zeros((t_loc + 1, d), ys.dtype)
    y = y.at[token_idx.reshape(-1)].add(ys.reshape(-1, d))
    return y[:t_loc]


def routed_ffn_ep(x: jax.Array, probs: jax.Array, top_k: int,
                  w1: jax.Array, b1: jax.Array,
                  w2: jax.Array, b2: jax.Array,
                  activation: Callable[[jax.Array], jax.Array],
                  *, mesh, axis: str = 'data',
                  capacity_factor: float = 2.0) -> jax.Array:
    """Expert-parallel hard-dispatch routed FFN (== routed_ffn_masked when
    nothing overflows capacity).

    x [T, d] / probs [T, n] shard P(axis) on tokens; w1 [n, d, h] /
    b1 [n, h] / w2 [n, h, d] shard P(axis) on the block axis; b2
    replicated. T and n must divide by the axis size."""
    n_dev = mesh.shape[axis]
    t, d_model = x.shape
    n = w1.shape[0]
    assert t % n_dev == 0 and n % n_dev == 0, (t, n, n_dev)
    cap = _capacity(t // n_dev, top_k, n, capacity_factor)

    def body(x_loc, probs_loc, w1_loc, b1_loc, w2_loc, b2_r):
        t_loc = x_loc.shape[0]
        xg, _, token_idx, valid = _dispatch(x_loc, probs_loc, top_k, cap)
        xr = _to_experts(xg, axis, n_dev)              # [n_loc, R, d]
        h = jnp.einsum('nrd,ndh->nrh', xr, w1_loc) + b1_loc[:, None, :]
        h = activation(h)
        yr = jnp.einsum('nrh,nhd->nrd', h, w2_loc)     # [n_loc, R, d]
        ys = _from_experts(yr, axis, n_dev, cap)       # [n, cap, d]
        return _undispatch(ys, token_idx, valid, t_loc) + b2_r

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis, None, None),
                  P(axis, None), P(axis, None, None), P()),
        out_specs=P(axis, None),
    )(x, probs, w1, b1, w2, b2)


def routed_ffn_lora_ep(x: jax.Array, probs: jax.Array, top_k: int,
                       w1: jax.Array, b1: jax.Array,
                       w2: jax.Array, b2: jax.Array,
                       lora_left1: jax.Array, lora_right1: jax.Array,
                       lora_left2: jax.Array, lora_right2: jax.Array,
                       activation: Callable[[jax.Array], jax.Array],
                       *, mesh, axis: str = 'data',
                       capacity_factor: float = 2.0) -> jax.Array:
    """Expert-parallel LoRA routed FFN (== routed_ffn_lora absent drops).

    Same math as ops/routed_ffn.py::routed_ffn_lora (coeff = 2*prob on the
    frozen path, unscaled LoRA path; ref tuning/lora_ffn.py:52-115). The
    per-slot coeff rides the same all_to_all as the token payload. Sharding:
    per-block factors lora_right1/lora_left2 [n, h, r] shard P(axis);
    shared factors lora_left1/lora_right2 [d, r] replicate."""
    n_dev = mesh.shape[axis]
    t, d_model = x.shape
    n = w1.shape[0]
    assert t % n_dev == 0 and n % n_dev == 0, (t, n, n_dev)
    cap = _capacity(t // n_dev, top_k, n, capacity_factor)

    def body(x_loc, probs_loc, w1_loc, b1_loc, w2_loc, b2_r,
             l1_r, r1_loc, l2_loc, r2_r):
        t_loc = x_loc.shape[0]
        xg, coeff, token_idx, valid = _dispatch(x_loc, probs_loc,
                                                top_k, cap)
        xr = _to_experts(xg, axis, n_dev)              # [n_loc, R, d]
        cr = 2.0 * _to_experts(coeff, axis, n_dev)     # [n_loc, R]
        base_h = jnp.einsum('nrd,ndh->nrh', xr, w1_loc) + b1_loc[:, None, :]
        lora_h = jnp.einsum('nrk,nhk->nrh', jnp.einsum(
            'nrd,dk->nrk', xr, l1_r), r1_loc)
        h = activation(cr[..., None] * base_h + lora_h)
        yr = cr[..., None] * jnp.einsum('nrh,nhd->nrd', h, w2_loc)
        hl = jnp.einsum('nrh,nhk->nrk', h, l2_loc)
        yr = yr + jnp.einsum('nrk,dk->nrd', hl, r2_r)
        ys = _from_experts(yr, axis, n_dev, cap)       # [n, cap, d]
        return _undispatch(ys, token_idx, valid, t_loc) + b2_r

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis, None, None),
                  P(axis, None), P(axis, None, None), P(),
                  P(), P(axis, None, None), P(axis, None, None), P()),
        out_specs=P(axis, None),
    )(x, probs, w1, b1, w2, b2,
      lora_left1, lora_right1, lora_left2, lora_right2)


def routed_ffn_gated_ep(x: jax.Array, probs: jax.Array, top_k: int,
                        w_gate: jax.Array, w_side: jax.Array,
                        w_down: jax.Array,
                        activation: Callable[[jax.Array], jax.Array],
                        *, mesh, axis: str = 'data',
                        capacity_factor: float = 2.0) -> jax.Array:
    """Expert-parallel routed SwiGLU FFN (== routed_ffn_gated_masked
    absent drops; ref sparse/feedforward.py:150-183)."""
    n_dev = mesh.shape[axis]
    t, _ = x.shape
    n = w_gate.shape[0]
    assert t % n_dev == 0 and n % n_dev == 0, (t, n, n_dev)
    cap = _capacity(t // n_dev, top_k, n, capacity_factor)

    def body(x_loc, probs_loc, wg_loc, ws_loc, wd_loc):
        t_loc = x_loc.shape[0]
        xg, _, token_idx, valid = _dispatch(x_loc, probs_loc, top_k, cap)
        xr = _to_experts(xg, axis, n_dev)              # [n_loc, R, d]
        hg = jnp.einsum('nrd,ndh->nrh', xr, wg_loc)
        hs = jnp.einsum('nrd,ndh->nrh', xr, ws_loc)
        h = activation(hg) * hs
        yr = jnp.einsum('nrh,nhd->nrd', h, wd_loc)
        ys = _from_experts(yr, axis, n_dev, cap)
        return _undispatch(ys, token_idx, valid, t_loc)

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis, None, None),
                  P(axis, None, None), P(axis, None, None)),
        out_specs=P(axis, None),
    )(x, probs, w_gate, w_side, w_down)


def routed_ffn_gated_lora_ep(x: jax.Array, probs: jax.Array, top_k: int,
                             w_gate: jax.Array, w_side: jax.Array,
                             w_down: jax.Array,
                             lora_left_g, lora_right_g,
                             lora_left_s, lora_right_s,
                             lora_left_d, lora_right_d,
                             activation: Callable[[jax.Array], jax.Array],
                             *, mesh, axis: str = 'data',
                             capacity_factor: float = 2.0) -> jax.Array:
    """Expert-parallel LoRA routed SwiGLU FFN (== routed_ffn_gated_lora
    absent drops; ref tuning/lora_ffn.py:118-225). coeff = 2*prob scales
    the frozen gate/side/down paths; LoRA paths are unscaled."""
    n_dev = mesh.shape[axis]
    t, _ = x.shape
    n = w_gate.shape[0]
    assert t % n_dev == 0 and n % n_dev == 0, (t, n, n_dev)
    cap = _capacity(t // n_dev, top_k, n, capacity_factor)

    def body(x_loc, probs_loc, wg_loc, ws_loc, wd_loc,
             lg_r, rg_loc, ls_r, rs_loc, ld_loc, rd_r):
        t_loc = x_loc.shape[0]
        xg, coeff, token_idx, valid = _dispatch(x_loc, probs_loc,
                                                top_k, cap)
        xr = _to_experts(xg, axis, n_dev)              # [n_loc, R, d]
        cr = (2.0 * _to_experts(coeff, axis, n_dev))[..., None]
        hg = cr * jnp.einsum('nrd,ndh->nrh', xr, wg_loc) + jnp.einsum(
            'nrk,nhk->nrh', jnp.einsum('nrd,dk->nrk', xr, lg_r), rg_loc)
        hs = cr * jnp.einsum('nrd,ndh->nrh', xr, ws_loc) + jnp.einsum(
            'nrk,nhk->nrh', jnp.einsum('nrd,dk->nrk', xr, ls_r), rs_loc)
        h = activation(hg) * hs
        yr = cr * jnp.einsum('nrh,nhd->nrd', h, wd_loc)
        hl = jnp.einsum('nrh,nhk->nrk', h, ld_loc)
        yr = yr + jnp.einsum('nrk,dk->nrd', hl, rd_r)
        ys = _from_experts(yr, axis, n_dev, cap)
        return _undispatch(ys, token_idx, valid, t_loc)

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis, None, None),
                  P(axis, None, None), P(axis, None, None),
                  P(), P(axis, None, None), P(), P(axis, None, None),
                  P(axis, None, None), P()),
        out_specs=P(axis, None),
    )(x, probs, w_gate, w_side, w_down, lora_left_g, lora_right_g,
      lora_left_s, lora_right_s, lora_left_d, lora_right_d)
