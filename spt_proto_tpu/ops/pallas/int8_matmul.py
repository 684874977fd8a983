"""INT8 weight-only matmul with dequantization fused into the kernel.

North-star addition (no reference counterpart — the reference is fp32-only,
SURVEY §0). Weights are stored int8 with per-output-channel scales; the
kernel loads int8 tiles from HBM (halving weight bandwidth vs bf16, 4x vs
f32), upcasts in VMEM, and multiplies on the MXU. Because scales are
per-output-channel, they commute with the K-reduction:
  x @ (q * s) == (x @ q) * s
so the scale multiply happens once per output tile on the final K step.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, q_ref, s_ref, o_ref, acc_ref, *, n_k: int):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = q_ref[...].astype(jnp.bfloat16)
    acc_ref[...] += jax.lax.dot(
        x_ref[...].astype(jnp.bfloat16), w,
        preferred_element_type=jnp.float32)

    @pl.when(ki == n_k - 1)
    def _store():
        o_ref[...] = (acc_ref[...] * s_ref[...]).astype(o_ref.dtype)


def _pad_to(x, mult, axis):
    pad = (-x.shape[axis]) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=('block_m', 'block_n', 'block_k',
                                             'interpret'))
def int8_matmul(x: jax.Array, w_q: jax.Array, scale: jax.Array, *,
                block_m: int = 128, block_n: int = 128, block_k: int = 128,
                interpret: bool | None = None) -> jax.Array:
    """x [..., K] float; w_q [K, N] int8; scale [1, N] or [N] f32.

    Returns [..., N] in x.dtype with dequant fused into the tiled matmul.
    """
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    lead = x.shape[:-1]
    k_dim = x.shape[-1]
    n_dim = w_q.shape[-1]
    xf = x.reshape(-1, k_dim)
    m = xf.shape[0]
    # scale may be narrower than w_q (N was padded at quantization time);
    # zero-pad it here — a [1, N] pad is trivially cheap, unlike a W pad
    n_scale = scale.reshape(1, -1).shape[-1]
    scale = jnp.pad(scale.reshape(1, n_scale).astype(jnp.float32),
                    ((0, 0), (0, n_dim - n_scale)))
    # skinny-m decode: a 128-row block would waste 16x MXU work at m=8;
    # pick blocks that fit m and amortize grid overhead on N/K instead
    if m < 64:
        block_m = max(32, -(-m // 8) * 8)
        if n_dim % 256 == 0:
            block_n = 256
        if k_dim % 256 == 0:
            block_k = 256

    xp = _pad_to(_pad_to(xf, block_m, 0), block_k, 1)
    wp = _pad_to(_pad_to(w_q, block_k, 0), block_n, 1)
    sp = _pad_to(scale, block_n, 1)
    mp, kp = xp.shape
    np_ = wp.shape[1]
    n_k = kp // block_k

    out = pl.pallas_call(
        functools.partial(_kernel, n_k=n_k),
        grid=(mp // block_m, np_ // block_n, n_k),
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, k: (i, k)),
            pl.BlockSpec((block_k, block_n), lambda i, j, k: (k, j)),
            pl.BlockSpec((1, block_n), lambda i, j, k: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), x.dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'arbitrary')),
        interpret=interpret,
    )(xp, wp, sp)
    return out[:m, :n_dim].reshape(*lead, n_dim)


def int8_matmul_ref(x: jax.Array, w_q: jax.Array,
                    scale: jax.Array) -> jax.Array:
    """jnp oracle."""
    n = w_q.shape[-1]
    y = jnp.dot(x.astype(jnp.float32), w_q.astype(jnp.float32))
    return (y * scale.reshape(1, n)).astype(x.dtype)


def _kernel_t(g_ref, q_ref, s_ref, o_ref, acc_ref, *, n_n: int):
    """Transposed form for the backward pass: o = (g * scale) @ q^T,
    accumulated over N tiles. q tiles are read in their stored [K, N]
    layout and contracted on N — the int8 weight is never transposed or
    dequantized in HBM."""
    ni = pl.program_id(2)

    @pl.when(ni == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    gs = (g_ref[...].astype(jnp.float32) * s_ref[...]).astype(jnp.bfloat16)
    w = q_ref[...].astype(jnp.bfloat16)              # [bk, bn]
    acc_ref[...] += jax.lax.dot_general(
        gs, w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(ni == n_n - 1)
    def _store():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=('block_m', 'block_n', 'block_k',
                                             'interpret'))
def int8_matmul_t(g: jax.Array, w_q: jax.Array, scale: jax.Array, *,
                  block_m: int = 128, block_n: int = 256,
                  block_k: int = 256,
                  interpret: bool | None = None) -> jax.Array:
    """g [..., N] float; w_q [K, N] int8; scale [N] f32 ->
    (g * scale) @ dequant(w_q)^T = [..., K].

    The VJP-side twin of int8_matmul: dx for a frozen int8 base weight
    without materializing a bf16 (or transposed) copy of it — the int8
    tiles stream in their stored layout and the MXU contracts on N.
    """
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    lead = g.shape[:-1]
    n_dim = g.shape[-1]
    k_dim = w_q.shape[0]
    gf = g.reshape(-1, n_dim)
    m = gf.shape[0]
    n_scale = scale.reshape(1, -1).shape[-1]
    sp = jnp.pad(scale.reshape(1, n_scale).astype(jnp.float32),
                 ((0, 0), (0, w_q.shape[1] - n_scale)))
    gp = _pad_to(_pad_to(gf, block_m, 0), block_n, 1)
    wp = _pad_to(_pad_to(w_q, block_k, 0), block_n, 1)
    spp = _pad_to(sp, block_n, 1)
    mp = gp.shape[0]
    kp = wp.shape[0]
    np_ = wp.shape[1]
    n_n = np_ // block_n

    out = pl.pallas_call(
        functools.partial(_kernel_t, n_n=n_n),
        grid=(mp // block_m, kp // block_k, n_n),
        in_specs=[
            pl.BlockSpec((block_m, block_n), lambda i, j, n: (i, n)),
            pl.BlockSpec((block_k, block_n), lambda i, j, n: (j, n)),
            pl.BlockSpec((1, block_n), lambda i, j, n: (0, n)),
        ],
        out_specs=pl.BlockSpec((block_m, block_k), lambda i, j, n: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, kp), g.dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_k), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'arbitrary')),
        interpret=interpret,
    )(gp, wp, spp)
    return out[:m, :k_dim].reshape(*lead, k_dim)


@jax.custom_vjp
def int8_frozen_matmul(x: jax.Array, w_q: jax.Array,
                       scale: jax.Array) -> jax.Array:
    """x @ dequant(w_q) for a FROZEN int8 base weight, differentiable in
    x only (QLoRA-shape training: the base stays int8 in HBM through
    both passes; dx streams the same int8 tiles via int8_matmul_t).
    Returns the TRUE-width product [..., scale.size]."""
    y = int8_matmul(x, w_q, scale)
    return y[..., :scale.reshape(-1).shape[0]]


def _ifm_fwd(x, w_q, scale):
    return int8_frozen_matmul(x, w_q, scale), (w_q, scale)


def _ifm_bwd(res, g):
    w_q, scale = res
    # g carries the primal output's dtype == x's dtype (int8_matmul)
    dx = int8_matmul_t(g, w_q, scale)
    import numpy as np  # float0 cotangents for the frozen int operand
    dq = np.zeros(w_q.shape, jax.dtypes.float0)
    return dx, dq, jnp.zeros(scale.shape, scale.dtype)


int8_frozen_matmul.defvjp(_ifm_fwd, _ifm_bwd)
