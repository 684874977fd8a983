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

Backward: dedicated Pallas kernels (the reference hand-writes every
backward: extension/softmax.cu:50-81, dual-stream kernels/sddmm.py:36-50).
The forward saves the per-row logsumexp; dq runs on the forward's
(batch, q-tile, selected-tile) grid; dk/dv runs on a (batch, k-tile,
reverse-selected q-tile) grid built from the inverted selection table —
both touch only selected tiles, so backward bandwidth also scales with
density. `bwd_impl='ref'` keeps the jnp tile-gather recompute
(block_sparse_attention_ref) as the oracle/fallback.
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
                scale: float, clamp: Optional[float],
                lse_ref=None):
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
        if lse_ref is not None:
            lse_ref[0] = m_scr[...] + jnp.log(denom)    # [block_q, 1]


def _fwd_kernel_lse(sel_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                    m_scr, l_scr, acc_scr, **kw):
    _fwd_kernel(sel_ref, q_ref, k_ref, v_ref, o_ref,
                m_scr, l_scr, acc_scr, lse_ref=lse_ref, **kw)


def _fwd(q, k, v, sel, *, block_q, block_k, scale, clamp, interpret,
         with_lse: bool = False):
    b, s, d = q.shape
    n_qt = s // block_q
    n_sel = sel.shape[-1]
    grid = (b, n_qt, n_sel)

    def q_map(bi, qi, si, sel_ref):
        return (bi, qi, 0)

    def kv_map(bi, qi, si, sel_ref):
        return (bi, jnp.maximum(sel_ref[bi, qi, si], 0), 0)

    out_specs = pl.BlockSpec((1, block_q, d), q_map)
    out_shape = jax.ShapeDtypeStruct((b, s, d), q.dtype)
    kernel = _fwd_kernel
    if with_lse:
        # stats live as [B, S, 1] columns: minor block dim == array dim is
        # Mosaic-legal and matches the [block_q, 1] scratch layout exactly
        out_specs = [out_specs,
                     pl.BlockSpec((1, block_q, 1),
                                  lambda bi, qi, si, sref: (bi, qi, 0))]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((b, s, 1), jnp.float32)]
        kernel = _fwd_kernel_lse
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), q_map),
            pl.BlockSpec((1, block_k, d), kv_map),
            pl.BlockSpec((1, block_k, d), kv_map),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
    )
    kernel = functools.partial(
        kernel, block_q=block_q, block_k=block_k, n_sel=n_sel,
        scale=scale, clamp=clamp)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
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


# ---------------------------------------------------------------------------
# v3: whole-sequence K/V resident in VMEM. At d_head 64, K+V for S=4096 is
# only 1 MB — far under VMEM — so the kernel keeps them resident (the block
# index map is constant per batch row; consecutive q-tiles revisit the same
# block with NO re-fetch) and loops over the selected tiles with in-VMEM
# dynamic slices. Grid shrinks from B*nq*n_sel cells to B*nq: at ~1 us
# fixed Mosaic cost per cell, that is the dominant win at bench shapes.
# ---------------------------------------------------------------------------

_RESIDENT_KV_BYTES = 4 * 1024 * 1024   # use v3 while K+V fit comfortably


def _use_resident(s: int, d: int, dtype) -> bool:
    return 2 * s * d * jnp.dtype(dtype).itemsize <= _RESIDENT_KV_BYTES


def _fwd_kernel_v3(pack_ref, q_ref, k_ref, v_ref, o_ref, *rest,
                   block_q: int, block_k: int, n_sel: int,
                   scale: float, clamp: Optional[float], with_lse: bool):
    # pack_ref = FLAT [b * n_qt * (2 + n_sel)] of per-(b, qt) rows
    # [n_strict, n_valid, sel...] — ONE scalar-prefetch operand (Mosaic
    # reserves a fixed 512K SMEM bank per prefetch operand, so two
    # operands hit the 1M SMEM cap), and 1-D (an [N, n_qt, 2+n_sel]
    # operand is lane-padded 2+n_sel -> 128 in SMEM: at flagship
    # B*H=256 that alone is 1 MB — the whole SMEM budget)
    lse_ref = rest[0] if with_lse else None
    b = pl.program_id(0)
    qt = pl.program_id(1)
    row = (b * pl.num_programs(1) + qt) * (2 + n_sel)
    q = q_ref[0]                                   # [block_q, d]

    def body(masked):
        # sel is ascending with -1 trailing: strictly-causal tiles form a
        # prefix, diagonal tiles a masked tail — two straight-line loops
        # (per-iteration lax.cond both compiles and runs far slower)
        def go(s_idx, carry):
            m_prev, l_prev, acc = carry
            tile = pack_ref[row + 2 + s_idx]
            start = tile * block_k
            k = k_ref[0, pl.ds(start, block_k), :]
            v = v_ref[0, pl.ds(start, block_k), :]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            if clamp is not None:
                s = jnp.clip(s, -clamp, clamp)
            if masked:              # diagonal tile: apply the causal mask
                rows = jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_k), 0) + qt * block_q
                cols = jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_k), 1) + tile * block_k
                s = jnp.where(cols <= rows, s, MASK_VALUE)
            m_curr = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp(m_prev - m_next)
            p = jnp.exp(s - m_next)
            if masked:
                p = jnp.where(cols <= rows, p, 0.0)
            l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
            acc_next = acc * alpha + jax.lax.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32)
            return m_next, l_next, acc_next
        return go

    init = (jnp.full((block_q, 1), MASK_VALUE, jnp.float32),
            jnp.zeros((block_q, 1), jnp.float32),
            jnp.zeros((block_q, q_ref.shape[-1]), jnp.float32))
    n_strict = pack_ref[row]
    n_valid = pack_ref[row + 1]
    carry = jax.lax.fori_loop(0, n_strict, body(False), init)
    m, l, acc = jax.lax.fori_loop(n_strict, n_valid, body(True), carry)
    denom = jnp.maximum(l, 1e-9)
    o_ref[0] = (acc / denom).astype(o_ref.dtype)
    if with_lse:
        lse_ref[0] = m + jnp.log(denom)


def _sel_counts(sel: jax.Array, block_q: int, block_k: int) -> jax.Array:
    """cnt[b, qt] = (#strictly-causal tiles, #valid tiles) per row of the
    ascending selection table (strict tiles are a prefix, see
    select_tiles)."""
    n_qt = sel.shape[1]
    valid = sel >= 0
    qt = jnp.arange(n_qt, dtype=jnp.int32)[None, :, None]
    strict = valid & ((sel + 1) * block_k - 1 <= qt * block_q)
    return jnp.stack([strict.sum(-1), valid.sum(-1)],
                     axis=-1).astype(jnp.int32)


def _fwd_v3(q, k, v, sel, *, block_q, block_k, scale, clamp, interpret,
            with_lse=False):
    b, s, d = q.shape
    n_qt = s // block_q
    n_sel = sel.shape[-1]
    # FLAT 1-D pack (see _fwd_kernel_v3: 2-D+ SMEM operands lane-pad the
    # minor dim to 128 — 32x the SMEM at flagship head counts)
    pack = jnp.concatenate([_sel_counts(sel, block_q, block_k), sel],
                           axis=-1).reshape(-1)

    def q_map(bi, qi, pref):
        return (bi, qi, 0)

    def whole_map(bi, qi, pref):
        return (bi, 0, 0)

    out_specs = pl.BlockSpec((1, block_q, d), q_map)
    out_shape = jax.ShapeDtypeStruct((b, s, d), q.dtype)
    if with_lse:
        out_specs = [out_specs, pl.BlockSpec((1, block_q, 1), q_map)]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((b, s, 1), jnp.float32)]
    return pl.pallas_call(
        functools.partial(_fwd_kernel_v3, block_q=block_q, block_k=block_k,
                          n_sel=n_sel, scale=scale, clamp=clamp,
                          with_lse=with_lse),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, n_qt),
            in_specs=[
                pl.BlockSpec((1, block_q, d), q_map),
                pl.BlockSpec((1, s, d), whole_map),
                pl.BlockSpec((1, s, d), whole_map),
            ],
            out_specs=out_specs,
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'arbitrary')),
        interpret=interpret,
    )(pack, q, k, v)


def _bwd_dq_kernel_v3(pack_ref, q_ref, do_ref, lse_ref, dd_ref,
                      k_ref, v_ref, dq_ref, *,
                      block_q: int, block_k: int, n_sel: int,
                      scale: float, clamp: Optional[float]):
    b = pl.program_id(0)
    qt = pl.program_id(1)
    row = (b * pl.num_programs(1) + qt) * (2 + n_sel)   # flat pack rows
    q = q_ref[0]
    do = do_ref[0]
    lse = lse_ref[0]
    dd = dd_ref[0]

    def body(masked):
        def go(s_idx, acc):
            tile = pack_ref[row + 2 + s_idx]
            start = tile * block_k
            k = k_ref[0, pl.ds(start, block_k), :]
            v = v_ref[0, pl.ds(start, block_k), :]
            s_pre = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            s = s_pre if clamp is None else jnp.clip(s_pre, -clamp, clamp)
            p = jnp.exp(s - lse)
            if masked:
                rows = jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_k), 0) + qt * block_q
                cols = jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_k), 1) + tile * block_k
                p = jnp.where(cols <= rows, p, 0.0)
            dp = jax.lax.dot_general(
                do, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            ds = p * (dp - dd)
            if clamp is not None:
                ds = jnp.where(jnp.abs(s_pre) <= clamp, ds, 0.0)
            return acc + jax.lax.dot(
                ds.astype(k.dtype), k, preferred_element_type=jnp.float32)
        return go

    init = jnp.zeros((block_q, q_ref.shape[-1]), jnp.float32)
    n_strict = pack_ref[row]
    n_valid = pack_ref[row + 1]
    acc = jax.lax.fori_loop(0, n_strict, body(False), init)
    acc = jax.lax.fori_loop(n_strict, n_valid, body(True), acc)
    dq_ref[0] = (acc * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel_v3(rpack_ref, k_ref, v_ref, q_ref, do_ref,
                       lse_ref, dd_ref, dk_ref, dv_ref, *,
                       block_q: int, block_k: int, n_hits: int,
                       scale: float, clamp: Optional[float]):
    b = pl.program_id(0)
    kt = pl.program_id(1)
    row = (b * pl.num_programs(1) + kt) * (2 + n_hits)  # flat rpack rows
    k = k_ref[0]                                   # [block_k, d]
    v = v_ref[0]

    def body(masked):
        # rsel ascending per k-tile: the diagonal q-tile (if hit) is the
        # SMALLEST valid qt, so masked entries form the prefix
        def go(h_idx, carry):
            dk_acc, dv_acc = carry
            qt = rpack_ref[row + 2 + h_idx]
            start = qt * block_q
            q = q_ref[0, pl.ds(start, block_q), :]
            do = do_ref[0, pl.ds(start, block_q), :]
            lse = lse_ref[0, pl.ds(start, block_q), :]
            dd = dd_ref[0, pl.ds(start, block_q), :]
            s_pre = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            s = s_pre if clamp is None else jnp.clip(s_pre, -clamp, clamp)
            p = jnp.exp(s - lse)
            if masked:
                rows = jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_k), 0) + qt * block_q
                cols = jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_k), 1) + kt * block_k
                p = jnp.where(cols <= rows, p, 0.0)
            dv_next = dv_acc + jax.lax.dot_general(
                p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(
                do, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            ds = p * (dp - dd)
            if clamp is not None:
                ds = jnp.where(jnp.abs(s_pre) <= clamp, ds, 0.0)
            dk_next = dk_acc + jax.lax.dot_general(
                ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return dk_next, dv_next
        return go

    d = k_ref.shape[-1]
    init = (jnp.zeros((block_k, d), jnp.float32),
            jnp.zeros((block_k, d), jnp.float32))
    n_masked = rpack_ref[row]
    n_valid = rpack_ref[row + 1]
    carry = jax.lax.fori_loop(0, n_masked, body(True), init)
    dk_acc, dv_acc = jax.lax.fori_loop(n_masked, n_valid, body(False),
                                       carry)
    dk_ref[0] = (dk_acc * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv_acc.astype(dv_ref.dtype)


def _reverse_table(sel: jax.Array, n_kt: int) -> jax.Array:
    """rsel[b, kt, :] = q-tiles whose selection includes k-tile kt
    (ascending, -1 padded, static width n_qt)."""
    b, n_qt, _ = sel.shape
    hits = jnp.zeros((b, n_kt, n_qt), bool)
    qt_idx = jnp.broadcast_to(jnp.arange(n_qt)[None, :, None], sel.shape)
    hits = hits.at[
        jnp.arange(b)[:, None, None],
        jnp.clip(sel, 0, n_kt - 1),
        qt_idx].max(sel >= 0)
    order = jnp.argsort(~hits, axis=-1, stable=True)       # hits first
    taken = jnp.take_along_axis(hits, order, axis=-1)
    return jnp.where(taken, order, -1).astype(jnp.int32)


def _bwd_kernels_v3(q, k, v, sel, o, lse, g, *, block_q, block_k, scale,
                    clamp, interpret):
    b, s, d = q.shape
    n_qt = s // block_q
    n_kt = s // block_k
    n_sel = sel.shape[-1]
    dd = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32),
                 axis=-1, keepdims=True)                   # [B, S, 1]

    pack = jnp.concatenate([_sel_counts(sel, block_q, block_k), sel],
                           axis=-1).reshape(-1)   # flat 1-D (SMEM padding)

    def q_map(bi, qi, pref):
        return (bi, qi, 0)

    def whole_map(bi, qi, pref):
        return (bi, 0, 0)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel_v3, block_q=block_q,
                          block_k=block_k, n_sel=n_sel, scale=scale,
                          clamp=clamp),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, n_qt),
            in_specs=[
                pl.BlockSpec((1, block_q, d), q_map),
                pl.BlockSpec((1, block_q, d), q_map),
                pl.BlockSpec((1, block_q, 1), q_map),
                pl.BlockSpec((1, block_q, 1), q_map),
                pl.BlockSpec((1, s, d), whole_map),
                pl.BlockSpec((1, s, d), whole_map),
            ],
            out_specs=pl.BlockSpec((1, block_q, d), q_map),
        ),
        out_shape=jax.ShapeDtypeStruct((b, s, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'arbitrary')),
        interpret=interpret,
    )(pack, q, g, lse, dd, k, v)

    rsel = _reverse_table(sel, n_kt)
    n_hits = rsel.shape[-1]
    # per k-tile: valid hits, of which the diagonal (masked) q-tile — the
    # smallest valid qt — forms the prefix
    rvalid = rsel >= 0
    kt_idx = jnp.arange(n_kt, dtype=jnp.int32)[None, :, None]
    rmasked = rvalid & ((kt_idx + 1) * block_k - 1 > rsel * block_q)
    rcnt = jnp.stack([rmasked.sum(-1), rvalid.sum(-1)],
                     axis=-1).astype(jnp.int32)
    rpack = jnp.concatenate([rcnt, rsel], axis=-1).reshape(-1)

    def kt_map(bi, ki, rref):
        return (bi, ki, 0)

    def kv_whole(bi, ki, rref):
        return (bi, 0, 0)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel_v3, block_q=block_q,
                          block_k=block_k, n_hits=n_hits, scale=scale,
                          clamp=clamp),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, n_kt),
            in_specs=[
                pl.BlockSpec((1, block_k, d), kt_map),
                pl.BlockSpec((1, block_k, d), kt_map),
                pl.BlockSpec((1, s, d), kv_whole),
                pl.BlockSpec((1, s, d), kv_whole),
                pl.BlockSpec((1, s, 1), kv_whole),
                pl.BlockSpec((1, s, 1), kv_whole),
            ],
            out_specs=[pl.BlockSpec((1, block_k, d), kt_map),
                       pl.BlockSpec((1, block_k, d), kt_map)],
        ),
        out_shape=[jax.ShapeDtypeStruct((b, s, d), k.dtype),
                   jax.ShapeDtypeStruct((b, s, d), v.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'arbitrary')),
        interpret=interpret,
    )(rpack, k, v, q, g, lse, dd)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# backward kernels
# ---------------------------------------------------------------------------

def _bwd_dq_kernel(sel_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, dd_ref,
                   dq_ref, acc_scr, *,
                   block_q: int, block_k: int, n_sel: int,
                   scale: float, clamp: Optional[float]):
    b = pl.program_id(0)
    qt = pl.program_id(1)
    s_idx = pl.program_id(2)

    @pl.when(s_idx == 0)
    def _init():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    tile = sel_ref[b, qt, s_idx]

    @pl.when(tile >= 0)
    def _update():
        q = q_ref[0]                              # [block_q, d]
        k = k_ref[0]                              # [block_k, d]
        v = v_ref[0]
        do = do_ref[0]
        lse = lse_ref[0]                          # [block_q, 1] f32
        dd = dd_ref[0]
        s_pre = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        s = s_pre if clamp is None else jnp.clip(s_pre, -clamp, clamp)
        rows = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0) \
            + qt * block_q
        cols = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1) \
            + tile * block_k
        valid = cols <= rows
        p = jnp.where(valid, jnp.exp(s - lse), 0.0)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)    # [block_q, block_k]
        ds = p * (dp - dd)
        if clamp is not None:                      # clip passes no gradient
            ds = jnp.where(jnp.abs(s_pre) <= clamp, ds, 0.0)
        acc_scr[...] += jax.lax.dot(
            ds.astype(k.dtype), k, preferred_element_type=jnp.float32)

    @pl.when(s_idx == n_sel - 1)
    def _store():
        dq_ref[0] = (acc_scr[...] * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(rkt_ref, rqt_ref, k_ref, v_ref, q_ref, do_ref, lse_ref,
                    dd_ref, dk_ref, dv_ref, dk_scr, dv_scr, *,
                    block_q: int, block_k: int, n_flat: int,
                    scale: float, clamp: Optional[float]):
    """One grid cell per (q-tile -> k-tile) hit, hits sorted by k-tile
    (packed flat list, _reverse_flat): the dk/dv output block for k-tile kt
    stays resident across its consecutive cells; scratch accumulates in f32
    and flushes when kt changes. No skipped-cell DMA waste — backward grid
    size == forward grid size + one dummy cell per k-tile."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    kt = rkt_ref[b, i]
    qt = rqt_ref[b, i]

    first = jnp.logical_or(i == 0, kt != rkt_ref[b, jnp.maximum(i - 1, 0)])

    @pl.when(first)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    @pl.when(qt >= 0)
    def _update():
        k = k_ref[0]                              # [block_k, d]
        v = v_ref[0]
        q = q_ref[0]                              # [block_q, d]
        do = do_ref[0]
        lse = lse_ref[0]                          # [block_q, 1] f32
        dd = dd_ref[0]
        s_pre = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        s = s_pre if clamp is None else jnp.clip(s_pre, -clamp, clamp)
        rows = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0) \
            + qt * block_q
        cols = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1) \
            + kt * block_k
        valid = cols <= rows
        p = jnp.where(valid, jnp.exp(s - lse), 0.0)
        # dv += p^T . do  (contract the q rows)
        dv_scr[...] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - dd)
        if clamp is not None:
            ds = jnp.where(jnp.abs(s_pre) <= clamp, ds, 0.0)
        dk_scr[...] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    last = jnp.logical_or(i == n_flat - 1,
                          kt != rkt_ref[b, jnp.minimum(i + 1, n_flat - 1)])

    @pl.when(last)
    def _store():
        dk_ref[0] = (dk_scr[...] * scale).astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def _reverse_flat(sel: jax.Array, n_kt: int
                  ) -> tuple[jax.Array, jax.Array]:
    """Invert the selection table into a flat per-batch hit list sorted by
    key tile: (rkt, rqt) [B, nq*n_sel + n_kt] where cell i means q-tile
    rqt[i] selected k-tile rkt[i]. One dummy entry per k-tile (qt = -1)
    guarantees every dk/dv output block is visited (zero grads for tiles
    nobody selected); invalid sel entries (-1) sort to the tail with
    kt = n_kt-1 stored so they extend the final block without re-init."""
    b, n_qt, n_sel = sel.shape
    kt_real = sel.reshape(b, n_qt * n_sel)
    qt_real = jnp.broadcast_to(
        jnp.repeat(jnp.arange(n_qt, dtype=jnp.int32), n_sel)[None],
        (b, n_qt * n_sel))
    kt_dummy = jnp.broadcast_to(jnp.arange(n_kt, dtype=jnp.int32)[None],
                                (b, n_kt))
    qt_dummy = jnp.full((b, n_kt), -1, jnp.int32)
    kt_all = jnp.concatenate([kt_real, kt_dummy], axis=1)
    qt_all = jnp.concatenate([qt_real, qt_dummy], axis=1)
    key = jnp.where(kt_all < 0, n_kt, kt_all)       # invalids last
    order = jnp.argsort(key, axis=1, stable=True)
    rkt = jnp.take_along_axis(jnp.where(kt_all < 0, n_kt - 1, kt_all),
                              order, axis=1)
    rqt = jnp.take_along_axis(jnp.where(kt_all < 0, -1, qt_all),
                              order, axis=1)
    return rkt.astype(jnp.int32), rqt.astype(jnp.int32)


def _bwd_kernels(q, k, v, sel, o, lse, g, *, block_q, block_k, scale,
                 clamp, interpret):
    b, s, d = q.shape
    n_qt = s // block_q
    n_kt = s // block_k
    n_sel = sel.shape[-1]
    dd = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32),
                 axis=-1, keepdims=True)                   # [B, S, 1]

    def q_map(bi, qi, si, sref):
        return (bi, qi, 0)

    def kv_map(bi, qi, si, sref):
        return (bi, jnp.maximum(sref[bi, qi, si], 0), 0)

    def row_map(bi, qi, si, sref):
        return (bi, qi, 0)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, block_q=block_q, block_k=block_k,
                          n_sel=n_sel, scale=scale, clamp=clamp),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, n_qt, n_sel),
            in_specs=[
                pl.BlockSpec((1, block_q, d), q_map),
                pl.BlockSpec((1, block_k, d), kv_map),
                pl.BlockSpec((1, block_k, d), kv_map),
                pl.BlockSpec((1, block_q, d), q_map),
                pl.BlockSpec((1, block_q, 1), row_map),
                pl.BlockSpec((1, block_q, 1), row_map),
            ],
            out_specs=pl.BlockSpec((1, block_q, d), q_map),
            scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((b, s, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'arbitrary')),
        interpret=interpret,
    )(sel, q, k, v, g, lse, dd)

    rkt, rqt = _reverse_flat(sel, n_kt)
    n_flat = rkt.shape[-1]

    def kt_map(bi, ii, rkt_ref, rqt_ref):
        return (bi, rkt_ref[bi, ii], 0)

    def rq_map(bi, ii, rkt_ref, rqt_ref):
        return (bi, jnp.maximum(rqt_ref[bi, ii], 0), 0)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, block_q=block_q,
                          block_k=block_k, n_flat=n_flat, scale=scale,
                          clamp=clamp),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, n_flat),
            in_specs=[
                pl.BlockSpec((1, block_k, d), kt_map),
                pl.BlockSpec((1, block_k, d), kt_map),
                pl.BlockSpec((1, block_q, d), rq_map),
                pl.BlockSpec((1, block_q, d), rq_map),
                pl.BlockSpec((1, block_q, 1), rq_map),
                pl.BlockSpec((1, block_q, 1), rq_map),
            ],
            out_specs=[pl.BlockSpec((1, block_k, d), kt_map),
                       pl.BlockSpec((1, block_k, d), kt_map)],
            scratch_shapes=[pltpu.VMEM((block_k, d), jnp.float32),
                            pltpu.VMEM((block_k, d), jnp.float32)],
        ),
        out_shape=[jax.ShapeDtypeStruct((b, s, d), k.dtype),
                   jax.ShapeDtypeStruct((b, s, d), v.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'arbitrary')),
        interpret=interpret,
    )(rkt, rqt, k, v, q, g, lse, dd)
    return dq, dk, dv


def _fwd_dispatch(q, k, v, sel, *, block_q, block_k, scale, clamp,
                  interpret, with_lse=False):
    fwd = _fwd_v3 if _use_resident(q.shape[1], q.shape[2], q.dtype) \
        else _fwd
    return fwd(q, k, v, sel, block_q=block_q, block_k=block_k, scale=scale,
               clamp=clamp, interpret=interpret, with_lse=with_lse)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _block_sparse_attention(q, k, v, sel, block_q, block_k, scale, clamp,
                            bwd_impl):
    return _fwd_dispatch(q, k, v, sel, block_q=block_q, block_k=block_k,
                         scale=scale, clamp=clamp,
                         interpret=_auto_interpret())


def _vjp_fwd(q, k, v, sel, block_q, block_k, scale, clamp, bwd_impl):
    out, lse = _fwd_dispatch(q, k, v, sel, block_q=block_q, block_k=block_k,
                             scale=scale, clamp=clamp,
                             interpret=_auto_interpret(), with_lse=True)
    return out, (q, k, v, sel, out, lse)


def _vjp_bwd(block_q, block_k, scale, clamp, bwd_impl, res, g):
    q, k, v, sel, o, lse = res
    if bwd_impl == 'ref':
        _, vjp = jax.vjp(
            lambda q_, k_, v_: block_sparse_attention_ref(
                q_, k_, v_, sel, block_q=block_q, block_k=block_k,
                scale=scale, clamp=clamp), q, k, v)
        dq, dk, dv = vjp(g)
    else:
        bwd = _bwd_kernels_v3 \
            if _use_resident(q.shape[1], q.shape[2], q.dtype) \
            else _bwd_kernels
        dq, dk, dv = bwd(
            q, k, v, sel, o, lse, g, block_q=block_q, block_k=block_k,
            scale=scale, clamp=clamp, interpret=_auto_interpret())
    return dq, dk, dv, np.zeros(sel.shape, dtype=dtypes.float0)


_block_sparse_attention.defvjp(_vjp_fwd, _vjp_bwd)


def block_sparse_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                           sel: jax.Array, *, block_q: int = 128,
                           block_k: int = 128, scale: float,
                           clamp: Optional[float] = 10.0,
                           bwd_impl: str = 'kernel') -> jax.Array:
    """Public entry. q/k/v [B, S, D]; sel [B, S//block_q, n_sel] int32
    ascending selected key tiles, -1 = invalid (ops/block_sparse.py
    select_tiles). Returns [B, S, D].

    bwd_impl: 'kernel' (dedicated Pallas dq + dk/dv kernels over selected
    tiles only) or 'ref' (jnp tile-gather recompute — the oracle)."""
    assert q.shape == k.shape == v.shape
    assert q.shape[1] % block_q == 0 and q.shape[1] % block_k == 0
    assert bwd_impl in ('kernel', 'ref')
    return _block_sparse_attention(q, k, v, sel, block_q, block_k, scale,
                                   clamp, bwd_impl)
