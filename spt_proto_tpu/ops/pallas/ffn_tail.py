"""Fused skinny-m FFN kernel for the decode tail.

At decode the FFN runs at m = batch (<= ~64) rows: the step is
weight-streaming-bound, and XLA executes it as several separate fusions
(fc1 matmul, bias+act, fc2 matmul, residual add) with a dispatch gap
between each — the measured per-layer decode floor is this dispatch
overhead, not bandwidth (docs/PERF.md round-3 decomposition). This kernel
folds the whole tail into ONE pallas_call whose grid streams the fc1/fc2
weight tiles with Mosaic's automatic double-buffered pipelining:

    out = x_res + act(x @ w1 + b1) @ w2 + b2          (OPT)
    out = x_res + (act(x @ wg) * (x @ ws)) @ wd       (LLaMA / SwiGLU)

Grid iterates over d_ff tiles; x [m, D] stays VMEM-resident, each grid
step fetches w1[:, tile] and w2[tile, :] (bf16, ~2x f_tile*D bytes) while
the previous tile's matmuls run, and the [m, D] f32 accumulator lives in
the output block (revisited across grid steps). One dispatch replaces
4-5, and the weight DMA-compute overlap is guaranteed rather than left to
XLA's scheduler.

Reference parity note: the reference has no decode path at all (SURVEY
§0); this kernel serves the north-star serving engine. The routed-FFN
decode path keeps its einsum form (block gathers don't stream-tile).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_f_tile(d_ff: int, d_model: int, m: int, itemsize: int,
                 n_weights: int) -> int:
    """Largest f-tile whose double-buffered weight blocks fit a VMEM
    budget (~8 MB for weights; x/out/h stay small at skinny m)."""
    budget = 8 * 2**20
    for ft in (2048, 1024, 512, 256, 128):
        if d_ff % ft:
            continue
        # n_weights blocks of [D, ft] (or [ft, D]) x 2 pipeline buffers
        if n_weights * 2 * ft * d_model * itemsize <= budget:
            return ft
    return 128


def _ffn_kernel(x_ref, res_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
                *, act: str, n_tiles: int):
    """One grid step: h = act(x @ w1_t + b1_t); o += h @ w2_t.
    First step seeds the accumulator with res + b2."""
    t = pl.program_id(0)
    x = x_ref[...].astype(jnp.float32)
    h = jax.lax.dot_general(
        x, w1_ref[...].astype(jnp.float32),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    h = h + b1_ref[...].astype(jnp.float32)
    if act == 'relu':
        h = jax.nn.relu(h)
    else:
        h = jax.nn.silu(h)
    y = jax.lax.dot_general(
        h, w2_ref[...].astype(jnp.float32),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(t == 0)
    def _seed():
        o_ref[...] = (res_ref[...].astype(jnp.float32)
                      + b2_ref[...].astype(jnp.float32))
    o_ref[...] += y


def _gated_kernel(x_ref, res_ref, wg_ref, ws_ref, wd_ref, o_ref,
                  *, act: str, n_tiles: int):
    t = pl.program_id(0)
    x = x_ref[...].astype(jnp.float32)
    dot = lambda a, b: jax.lax.dot_general(
        a, b.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    g = dot(x, wg_ref[...])
    s = dot(x, ws_ref[...])
    g = jax.nn.silu(g) if act == 'silu' else jax.nn.relu(g)
    y = dot(g * s, wd_ref[...])

    @pl.when(t == 0)
    def _seed():
        o_ref[...] = res_ref[...].astype(jnp.float32)
    o_ref[...] += y


def _pad_rows(x: jax.Array, m_pad: int) -> jax.Array:
    if x.shape[0] == m_pad:
        return x
    return jnp.pad(x, ((0, m_pad - x.shape[0]), (0, 0)))


@functools.partial(jax.jit, static_argnames=('act', 'interpret'))
def ffn_tail(x: jax.Array, res: jax.Array,
             w1: jax.Array, b1: jax.Array,
             w2: jax.Array, b2: jax.Array, *,
             act: str = 'relu',
             interpret: Optional[bool] = None) -> jax.Array:
    """res + act(x @ w1 + b1) @ w2 + b2 in one fused streaming kernel.

    x/res [m, D] (m <= 256: the skinny decode regime), w1 [D, F],
    b1 [F], w2 [F, D], b2 [D]. Returns [m, D] in x.dtype.
    """
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    m, d = x.shape
    d_ff = w1.shape[1]
    m_pad = max(8, -(-m // 8) * 8)
    ft = _pick_f_tile(d_ff, d, m_pad, w1.dtype.itemsize, 2)
    n_tiles = d_ff // ft
    xp = _pad_rows(x, m_pad)
    rp = _pad_rows(res, m_pad)
    out = pl.pallas_call(
        functools.partial(_ffn_kernel, act=act, n_tiles=n_tiles),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((m_pad, d), lambda t: (0, 0)),
            pl.BlockSpec((m_pad, d), lambda t: (0, 0)),
            pl.BlockSpec((d, ft), lambda t: (0, t)),
            pl.BlockSpec((1, ft), lambda t: (0, t)),
            pl.BlockSpec((ft, d), lambda t: (t, 0)),
            pl.BlockSpec((1, d), lambda t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((m_pad, d), lambda t: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((m_pad, d), jnp.float32),
        interpret=interpret,
    )(xp, rp, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1))
    return out[:m].astype(x.dtype)


@functools.partial(jax.jit, static_argnames=('act', 'interpret'))
def ffn_tail_gated(x: jax.Array, res: jax.Array,
                   wg: jax.Array, ws: jax.Array, wd: jax.Array, *,
                   act: str = 'silu',
                   interpret: Optional[bool] = None) -> jax.Array:
    """res + (act(x @ wg) * (x @ ws)) @ wd (SwiGLU, no biases)."""
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    m, d = x.shape
    d_ff = wg.shape[1]
    m_pad = max(8, -(-m // 8) * 8)
    ft = _pick_f_tile(d_ff, d, m_pad, wg.dtype.itemsize, 3)
    n_tiles = d_ff // ft
    xp = _pad_rows(x, m_pad)
    rp = _pad_rows(res, m_pad)
    out = pl.pallas_call(
        functools.partial(_gated_kernel, act=act, n_tiles=n_tiles),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((m_pad, d), lambda t: (0, 0)),
            pl.BlockSpec((m_pad, d), lambda t: (0, 0)),
            pl.BlockSpec((d, ft), lambda t: (0, t)),
            pl.BlockSpec((d, ft), lambda t: (0, t)),
            pl.BlockSpec((ft, d), lambda t: (t, 0)),
        ],
        out_specs=pl.BlockSpec((m_pad, d), lambda t: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((m_pad, d), jnp.float32),
        interpret=interpret,
    )(xp, rp, wg, ws, wd)
    return out[:m].astype(x.dtype)


def ffn_tail_ref(x, res, w1, b1, w2, b2, act='relu'):
    """jnp oracle (f32 math like the kernel)."""
    f = jax.nn.relu if act == 'relu' else jax.nn.silu
    h = f(x.astype(jnp.float32) @ w1.astype(jnp.float32)
          + b1.astype(jnp.float32))
    y = h @ w2.astype(jnp.float32) + b2.astype(jnp.float32)
    return (res.astype(jnp.float32) + y).astype(x.dtype)


def ffn_tail_gated_ref(x, res, wg, ws, wd, act='silu'):
    f = jax.nn.silu if act == 'silu' else jax.nn.relu
    xf = x.astype(jnp.float32)
    h = f(xf @ wg.astype(jnp.float32)) * (xf @ ws.astype(jnp.float32))
    return (res.astype(jnp.float32) + h @ wd.astype(jnp.float32)
            ).astype(x.dtype)
