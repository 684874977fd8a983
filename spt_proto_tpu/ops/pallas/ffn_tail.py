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


def _ffn_int8_kernel(x_ref, res_ref, w1_ref, s1_ref, b1_ref,
                     w2_ref, s2_ref, b2_ref, o_ref,
                     *, act: str, n_tiles: int):
    """int8 weight-only tile step. Per-output-channel scales: fc1's
    applies per F-tile lane; fc2's is constant per D lane, so the raw
    int8 accumulation is scaled ONCE at the last tile (s2 factors out of
    the sum over tiles)."""
    t = pl.program_id(0)
    x = x_ref[...].astype(jnp.float32)
    h = jax.lax.dot_general(
        x, w1_ref[...].astype(jnp.float32),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    h = h * s1_ref[...] + b1_ref[...].astype(jnp.float32)
    h = jax.nn.relu(h) if act == 'relu' else jax.nn.silu(h)
    y = jax.lax.dot_general(
        h, w2_ref[...].astype(jnp.float32),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(t == 0)
    def _seed():
        o_ref[...] = jnp.zeros_like(o_ref)
    o_ref[...] += y

    @pl.when(t == n_tiles - 1)
    def _final():
        o_ref[...] = (res_ref[...].astype(jnp.float32)
                      + b2_ref[...].astype(jnp.float32)
                      + o_ref[...] * s2_ref[...])


def _gated_int8_kernel(x_ref, res_ref, wg_ref, sg_ref, ws_ref, ss_ref,
                       wd_ref, sd_ref, o_ref, *, act: str, n_tiles: int):
    t = pl.program_id(0)
    x = x_ref[...].astype(jnp.float32)
    dot = lambda a, b: jax.lax.dot_general(
        a, b.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    g = dot(x, wg_ref[...]) * sg_ref[...]
    s = dot(x, ws_ref[...]) * ss_ref[...]
    g = jax.nn.silu(g) if act == 'silu' else jax.nn.relu(g)
    y = dot(g * s, wd_ref[...])

    @pl.when(t == 0)
    def _seed():
        o_ref[...] = jnp.zeros_like(o_ref)
    o_ref[...] += y

    @pl.when(t == n_tiles - 1)
    def _final():
        o_ref[...] = (res_ref[...].astype(jnp.float32)
                      + o_ref[...] * sd_ref[...])


def int8_tile(d_ff: int) -> int:
    """Largest streaming tile dividing the TRUE d_ff (grid never touches
    the int8 tensors' N padding)."""
    for ft in (2048, 1024, 512, 256, 128):
        if d_ff % ft == 0:
            return ft
    return 0


@functools.partial(jax.jit, static_argnames=('act', 'interpret'))
def ffn_tail_int8(x: jax.Array, res: jax.Array,
                  w1q: dict, b1: jax.Array, w2q: dict, b2: jax.Array, *,
                  act: str = 'relu',
                  interpret: Optional[bool] = None) -> jax.Array:
    """res + act((x @ W1q)*s1 + b1) @ W2q * s2 + b2 — int8 weight-only
    fused tail (halves the streamed weight bytes vs bf16).

    w1q/w2q are quantize_int8 dicts ({'q': N-padded int8, 'scale':
    true-width f32}); the grid iterates TRUE d_ff tiles so w2q needs no
    row padding and w1q's column padding is never read."""
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    m, d = x.shape
    d_ff = w1q['scale'].shape[-1]
    d_out = w2q['scale'].shape[-1]
    d_out_pad = w2q['q'].shape[-1]
    assert d_out == d, (d_out, d)
    m_pad = max(8, -(-m // 8) * 8)
    ft = int8_tile(d_ff)
    n_tiles = d_ff // ft
    xp = _pad_rows(x, m_pad)
    rp = jnp.pad(_pad_rows(res, m_pad), ((0, 0), (0, d_out_pad - d)))
    out = pl.pallas_call(
        functools.partial(_ffn_int8_kernel, act=act, n_tiles=n_tiles),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((m_pad, d), lambda t: (0, 0)),
            pl.BlockSpec((m_pad, d_out_pad), lambda t: (0, 0)),
            pl.BlockSpec((d, ft), lambda t: (0, t)),
            pl.BlockSpec((1, ft), lambda t: (0, t)),
            pl.BlockSpec((1, ft), lambda t: (0, t)),
            pl.BlockSpec((ft, d_out_pad), lambda t: (t, 0)),
            pl.BlockSpec((1, d_out_pad), lambda t: (0, 0)),
            pl.BlockSpec((1, d_out_pad), lambda t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((m_pad, d_out_pad), lambda t: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((m_pad, d_out_pad), jnp.float32),
        interpret=interpret,
    )(xp, rp, w1q['q'], w1q['scale'].reshape(1, -1), b1.reshape(1, -1),
      w2q['q'],
      jnp.pad(w2q['scale'].reshape(1, -1), ((0, 0), (0, d_out_pad - d))),
      jnp.pad(b2.reshape(1, -1).astype(jnp.float32),
              ((0, 0), (0, d_out_pad - d))))
    return out[:m, :d].astype(x.dtype)


@functools.partial(jax.jit, static_argnames=('act', 'interpret'))
def ffn_tail_gated_int8(x: jax.Array, res: jax.Array,
                        wgq: dict, wsq: dict, wdq: dict, *,
                        act: str = 'silu',
                        interpret: Optional[bool] = None) -> jax.Array:
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    m, d = x.shape
    d_ff = wgq['scale'].shape[-1]
    d_out = wdq['scale'].shape[-1]
    d_out_pad = wdq['q'].shape[-1]
    assert d_out == d, (d_out, d)
    m_pad = max(8, -(-m // 8) * 8)
    ft = int8_tile(d_ff)
    n_tiles = d_ff // ft
    xp = _pad_rows(x, m_pad)
    rp = jnp.pad(_pad_rows(res, m_pad), ((0, 0), (0, d_out_pad - d)))
    out = pl.pallas_call(
        functools.partial(_gated_int8_kernel, act=act, n_tiles=n_tiles),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((m_pad, d), lambda t: (0, 0)),
            pl.BlockSpec((m_pad, d_out_pad), lambda t: (0, 0)),
            pl.BlockSpec((d, ft), lambda t: (0, t)),
            pl.BlockSpec((1, ft), lambda t: (0, t)),
            pl.BlockSpec((d, ft), lambda t: (0, t)),
            pl.BlockSpec((1, ft), lambda t: (0, t)),
            pl.BlockSpec((ft, d_out_pad), lambda t: (t, 0)),
            pl.BlockSpec((1, d_out_pad), lambda t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((m_pad, d_out_pad), lambda t: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((m_pad, d_out_pad), jnp.float32),
        interpret=interpret,
    )(xp, rp, wgq['q'], wgq['scale'].reshape(1, -1),
      wsq['q'], wsq['scale'].reshape(1, -1), wdq['q'],
      jnp.pad(wdq['scale'].reshape(1, -1), ((0, 0), (0, d_out_pad - d))))
    return out[:m, :d].astype(x.dtype)


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
