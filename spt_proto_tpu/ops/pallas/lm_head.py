"""Fused lm_head + greedy argmax streaming kernel.

The greedy decode loop computes logits = final_norm(x) @ W_head
([D, V], 77 MB at OPT-125M, 206 MB at 1.3B) and then argmax — two more
dispatches and a [B, V] logits round-trip in the step's FIXED cost
(~0.53 ms at 125M, docs/PERF.md round-3 decomposition). This kernel
streams W in V-tiles with automatic double-buffered pipelining and keeps
a running (max, argmax) per row, so greedy token selection is ONE
dispatch and the full logits are never materialized.

Exactness: logits are rounded to the serving dtype before the compare,
so the winning index equals jnp.argmax over the unfused bf16 logits,
including its lowest-index tie-breaking (running compare is strict >).
Lanes past the true vocab (the ragged last tile) are masked to -inf.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _pick_v_tile(d: int, v: int, itemsize: int) -> int:
    """Largest V-tile whose double-buffered weight blocks fit an ~8 MB
    VMEM budget: ft=2048 at d_model 2048 is 16 MB of W blocks alone and
    trips the 16 MB scoped-VMEM limit on v5e (seen at OPT-1.3B). The
    candidate list extends down to 128 so the guard is self-enforcing
    at any d (d=8192 bf16 needs ft<=256); the floor stays within budget
    for every d the 16 GB chip could hold weights for."""
    budget = 8 * 2**20
    for cand in (2048, 1024, 512, 256, 128):
        if v >= cand and 2 * d * cand * itemsize <= budget:
            return cand
    return 128


def _kernel(x_ref, w_ref, o_ref, bval, *, v: int, ft: int, n_tiles: int,
            out_dtype):
    t = pl.program_id(0)
    x = x_ref[...].astype(jnp.float32)
    lg = jax.lax.dot_general(
        x, w_ref[...].astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # round to the serving dtype so the winner matches the unfused
    # argmax-over-logits path bit-for-bit
    lg = lg.astype(out_dtype).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, lg.shape, 1)
    gidx = lane + t * ft
    lg = jnp.where(gidx < v, lg, NEG)
    loc_val = jnp.max(lg, axis=-1, keepdims=True)         # [B, 1]
    loc_arg = jnp.argmax(lg, axis=-1).astype(jnp.int32)[:, None] + t * ft

    @pl.when(t == 0)
    def _seed():
        bval[...] = jnp.full_like(bval, NEG)
        o_ref[...] = jnp.zeros_like(o_ref)
    take = loc_val > bval[...]                            # strict: keeps
    bval[...] = jnp.where(take, loc_val, bval[...])       # earliest tile
    o_ref[...] = jnp.where(take, loc_arg, o_ref[...])


@functools.partial(jax.jit, static_argnames=('interpret',))
def lm_head_argmax(x: jax.Array, w: jax.Array, *,
                   interpret: Optional[bool] = None) -> jax.Array:
    """x [B, D] @ w [D, V] -> greedy token ids [B] int32, streaming W."""
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    b, d = x.shape
    v = w.shape[1]
    m_pad = max(8, -(-b // 8) * 8)
    ft = _pick_v_tile(d, v, w.dtype.itemsize)
    n_tiles = -(-v // ft)
    xp = x if b == m_pad else jnp.pad(x, ((0, m_pad - b), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_kernel, v=v, ft=ft, n_tiles=n_tiles,
                          out_dtype=x.dtype),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((m_pad, d), lambda t: (0, 0)),
            pl.BlockSpec((d, ft), lambda t: (0, t)),
        ],
        out_specs=pl.BlockSpec((m_pad, 1), lambda t: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((m_pad, 1), jnp.int32),
        scratch_shapes=[pltpu.VMEM((m_pad, 1), jnp.float32)],
        interpret=interpret,
    )(xp, w)
    return out[:b, 0]


def _kernel_int8(x_ref, q_ref, s_ref, o_ref, bval, *, v: int, ft: int,
                 block_k: int, out_dtype):
    """int8 twin: same bf16 dot + per-channel dequant as int8_matmul so
    the winner matches argmax over the unfused int8 logits. The dot
    accumulates f32 partials over the SAME block_k-wide K chunks
    int8_matmul tiles with, so the accumulation order (and therefore
    any near-tie after the out_dtype cast) matches by construction."""
    t = pl.program_id(0)
    x = x_ref[...].astype(jnp.bfloat16)
    d = x.shape[1]
    acc = jnp.zeros((x.shape[0], ft), jnp.float32)
    for k0 in range(0, d, block_k):
        acc += jax.lax.dot(
            x[:, k0:k0 + block_k],
            q_ref[pl.ds(k0, block_k), :].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32)
    lg = (acc * s_ref[...]).astype(out_dtype).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, lg.shape, 1)
    gidx = lane + t * ft
    lg = jnp.where(gidx < v, lg, NEG)
    loc_val = jnp.max(lg, axis=-1, keepdims=True)
    loc_arg = jnp.argmax(lg, axis=-1).astype(jnp.int32)[:, None] + t * ft

    @pl.when(t == 0)
    def _seed():
        bval[...] = jnp.full_like(bval, NEG)
        o_ref[...] = jnp.zeros_like(o_ref)
    take = loc_val > bval[...]
    bval[...] = jnp.where(take, loc_val, bval[...])
    o_ref[...] = jnp.where(take, loc_arg, o_ref[...])


@functools.partial(jax.jit, static_argnames=('interpret',))
def lm_head_argmax_int8(x: jax.Array, wq: dict, *,
                        interpret: Optional[bool] = None) -> jax.Array:
    """Greedy token ids from an int8-quantized lm_head ({'q': [D, V_pad]
    int8, 'scale': [V] f32}), streaming the halved weight bytes."""
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    b, d = x.shape
    q = wq['q']
    v = wq['scale'].reshape(-1).shape[0]
    v_pad = q.shape[1]
    m_pad = max(8, -(-b // 8) * 8)
    # ceil-div tiling with the gidx<v mask (Pallas pads the ragged edge
    # block), mirroring the bf16 twin — a divisibility requirement made
    # real vocabs (OPT 50272 -> padded 50432) fall back to ft=256 and
    # pay ~4x the grid steps of the bf16 kernel
    ft = _pick_v_tile(d, v_pad, q.dtype.itemsize)
    n_tiles = -(-v_pad // ft)
    # K-chunk width matching int8_matmul's block_k rule for this m, so
    # the f32 accumulation order (and any near-tie) matches exactly
    if b < 64 and d % 256 == 0:
        block_k = 256
    elif d % 128 == 0:
        block_k = 128
    else:
        block_k = d
    sp = jnp.pad(wq['scale'].reshape(1, -1).astype(jnp.float32),
                 ((0, 0), (0, v_pad - v)))
    xp = x if b == m_pad else jnp.pad(x, ((0, m_pad - b), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_kernel_int8, v=v, ft=ft, block_k=block_k,
                          out_dtype=x.dtype),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((m_pad, d), lambda t: (0, 0)),
            pl.BlockSpec((d, ft), lambda t: (0, t)),
            pl.BlockSpec((1, ft), lambda t: (0, t)),
        ],
        out_specs=pl.BlockSpec((m_pad, 1), lambda t: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((m_pad, 1), jnp.int32),
        scratch_shapes=[pltpu.VMEM((m_pad, 1), jnp.float32)],
        interpret=interpret,
    )(xp, q, sp)
    return out[:b, 0]
