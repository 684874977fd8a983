"""Pallas TPU kernel: PQ-driven block-sparse flash attention (forward).

The production sparse-attention path. Replaces the reference CUDA pipeline
SDDMM -> masked CSR softmax -> SpMM (extension/{sddmm,softmax,spmm}) and is
the shape its abandoned fused prototype (legacy/sparse_mha.cu) wanted to be:
one kernel per (batch*head, q-tile) computing online-softmax attention over
ONLY the key tiles selected from PQ match scores (ops/block_sparse.py).

TPU-native choices:
  * Selected key-tile indices arrive via PrefetchScalarGridSpec scalar
    prefetch; the K/V BlockSpec index_map reads them, so non-selected tiles
    are never DMA'd from HBM — bandwidth scales with density, not S^2.
  * Fixed n_sel tiles per q tile => static shapes; invalid slots (early
    query tiles) are skipped with @pl.when on the prefetched index.
  * Online softmax (flash) with f32 statistics; logits scaled then clamped
    to +-clamp before masking, matching the reference numerics
    (sparse/attention.py:125-127).

Backward: custom_vjp recomputes through the jnp tile-gather reference
(block_sparse_attention_ref), whose gathers are contiguous tile slices —
flop- and memory-proportional to density. A dedicated bwd kernel can
replace it later without touching callers.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import dtypes
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spt_proto_tpu.ops.block_sparse import block_sparse_attention_ref

MASK_VALUE = -0.7 * float(np.finfo(np.float32).max)


def _fwd_kernel(sel_ref, q_ref, k_ref, v_ref, o_ref,
                m_scr, l_scr, acc_scr, *,
                block_q: int, block_k: int, n_sel: int,
                scale: float, clamp: Optional[float]):
    b = pl.program_id(0)
    qt = pl.program_id(1)
    s_idx = pl.program_id(2)

    @pl.when(s_idx == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, MASK_VALUE)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    tile = sel_ref[b, qt, s_idx]

    @pl.when(tile >= 0)
    def _update():
        # matmuls run in the input dtype (bf16 on the fast path) with f32
        # accumulation — a f32 upcast before the dot would quarter MXU rate
        q = q_ref[0]                              # [block_q, d]
        k = k_ref[0]                              # [block_k, d]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if clamp is not None:
            s = jnp.clip(s, -clamp, clamp)
        rows = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0) \
            + qt * block_q
        cols = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1) \
            + tile * block_k
        s = jnp.where(cols <= rows, s, MASK_VALUE)

        m_prev = m_scr[...]                        # [block_q, 1]
        l_prev = l_scr[...]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)                    # [block_q, block_k]
        # rows where every column is masked: p=exp(MASK-MASK)=1 garbage —
        # kill via explicit mask
        p = jnp.where(cols <= rows, p, 0.0)
        l_scr[...] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_scr[...] = m_next
        v = v_ref[0]
        acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32)

    @pl.when(s_idx == n_sel - 1)
    def _store():
        denom = jnp.maximum(l_scr[...], 1e-9)
        o_ref[0] = (acc_scr[...] / denom).astype(o_ref.dtype)


def _fwd(q, k, v, sel, *, block_q, block_k, scale, clamp, interpret):
    b, s, d = q.shape
    n_qt = s // block_q
    n_sel = sel.shape[-1]
    grid = (b, n_qt, n_sel)

    def q_map(bi, qi, si, sel_ref):
        return (bi, qi, 0)

    def kv_map(bi, qi, si, sel_ref):
        return (bi, jnp.maximum(sel_ref[bi, qi, si], 0), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), q_map),
            pl.BlockSpec((1, block_k, d), kv_map),
            pl.BlockSpec((1, block_k, d), kv_map),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), q_map),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _fwd_kernel, block_q=block_q, block_k=block_k, n_sel=n_sel,
        scale=scale, clamp=clamp)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, s, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'arbitrary')),
        interpret=interpret,
    )(sel, q, k, v)


# ---------------------------------------------------------------------------
# v2: one grid cell per (batch, q-tile); the selected key tiles are fetched
# inside the kernel with double-buffered async DMA from HBM. Collapses the
# grid from B*nq*n_sel cells to B*nq, removing per-cell pipeline overhead
# (the forward's dominant cost at small tile workloads).
# ---------------------------------------------------------------------------

def _fwd_kernel_dma(sel_ref, q_ref, k_hbm, v_hbm, o_ref,
                    k_buf, v_buf, sems, *,
                    block_q: int, block_k: int, n_sel: int,
                    scale: float, clamp: Optional[float]):
    b = pl.program_id(0)
    qt = pl.program_id(1)

    def dma_pair(slot, s_idx):
        tile = jnp.maximum(sel_ref[b, qt, s_idx], 0)
        start = tile * block_k
        return (pltpu.make_async_copy(
                    k_hbm.at[b, pl.ds(start, block_k), :],
                    k_buf.at[slot], sems.at[0, slot]),
                pltpu.make_async_copy(
                    v_hbm.at[b, pl.ds(start, block_k), :],
                    v_buf.at[slot], sems.at[1, slot]))

    kd, vd = dma_pair(0, 0)
    kd.start()
    vd.start()

    q = q_ref[0]

    def body(s_idx, carry):
        m_prev, l_prev, acc = carry
        slot = jax.lax.rem(s_idx, 2)
        nxt = jax.lax.rem(s_idx + 1, 2)

        @pl.when(s_idx + 1 < n_sel)
        def _prefetch():
            kd2, vd2 = dma_pair(nxt, s_idx + 1)
            kd2.start()
            vd2.start()

        kd1, vd1 = dma_pair(slot, s_idx)
        kd1.wait()
        vd1.wait()

        tile = sel_ref[b, qt, s_idx]

        def update(_):
            k = k_buf[slot]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            if clamp is not None:
                s = jnp.clip(s, -clamp, clamp)
            rows = jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0) + qt * block_q
            cols = jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1) + tile * block_k
            s = jnp.where(cols <= rows, s, MASK_VALUE)
            m_curr = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp(m_prev - m_next)
            p = jnp.exp(s - m_next)
            p = jnp.where(cols <= rows, p, 0.0)
            l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
            v = v_buf[slot]
            acc_next = acc * alpha + jax.lax.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32)
            return m_next, l_next, acc_next

        return jax.lax.cond(tile >= 0, update,
                            lambda _: (m_prev, l_prev, acc), None)

    init = (jnp.full((block_q, 1), MASK_VALUE, jnp.float32),
            jnp.zeros((block_q, 1), jnp.float32),
            jnp.zeros((block_q, q_ref.shape[-1]), jnp.float32))
    m, l, acc = jax.lax.fori_loop(0, n_sel, body, init)
    o_ref[0] = (acc / jnp.maximum(l, 1e-9)).astype(o_ref.dtype)


def _fwd_dma(q, k, v, sel, *, block_q, block_k, scale, clamp, interpret):
    b, s, d = q.shape
    if d % 128 != 0 and not interpret:
        # Mosaic requires DMA slice minor dims 128-aligned; smaller head
        # dims use the BlockSpec-grid kernel instead
        return _fwd(q, k, v, sel, block_q=block_q, block_k=block_k,
                    scale=scale, clamp=clamp, interpret=interpret)
    n_qt = s // block_q
    n_sel = sel.shape[-1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_qt),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bi, qi, sref: (bi, qi, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, block_q, d),
                               lambda bi, qi, sref: (bi, qi, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, block_k, d), q.dtype),
            pltpu.VMEM((2, block_k, d), q.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    kernel = functools.partial(
        _fwd_kernel_dma, block_q=block_q, block_k=block_k, n_sel=n_sel,
        scale=scale, clamp=clamp)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, s, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'arbitrary')),
        interpret=interpret,
    )(sel, q, k, v)


def _auto_interpret() -> bool:
    return jax.default_backend() != 'tpu'


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _block_sparse_attention(q, k, v, sel, block_q, block_k, scale, clamp):
    return _fwd(q, k, v, sel, block_q=block_q, block_k=block_k, scale=scale,
                clamp=clamp, interpret=_auto_interpret())


def _vjp_fwd(q, k, v, sel, block_q, block_k, scale, clamp):
    out = _block_sparse_attention(q, k, v, sel, block_q, block_k, scale,
                                  clamp)
    return out, (q, k, v, sel)


def _vjp_bwd(block_q, block_k, scale, clamp, res, g):
    q, k, v, sel = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: block_sparse_attention_ref(
            q_, k_, v_, sel, block_q=block_q, block_k=block_k, scale=scale,
            clamp=clamp), q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, np.zeros(sel.shape, dtype=dtypes.float0)


_block_sparse_attention.defvjp(_vjp_fwd, _vjp_bwd)


def block_sparse_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                           sel: jax.Array, *, block_q: int = 128,
                           block_k: int = 128, scale: float,
                           clamp: Optional[float] = 10.0) -> jax.Array:
    """Public entry. q/k/v [B, S, D]; sel [B, S//block_q, n_sel] int32
    ascending selected key tiles, -1 = invalid (ops/block_sparse.py
    select_tiles). Returns [B, S, D]."""
    assert q.shape == k.shape == v.shape
    assert q.shape[1] % block_q == 0 and q.shape[1] % block_k == 0
    return _block_sparse_attention(q, k, v, sel, block_q, block_k, scale,
                                   clamp)
