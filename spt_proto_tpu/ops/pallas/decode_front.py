"""Fused sparse decode FRONT kernel: norm1 + QKV projection + PQ encode +
tile selection in ONE dispatch.

The round-3 decomposition (docs/PERF.md) shows the 125M-class decode step
is ~75% dispatch-bound: besides the attention kernel and the FFN tail
(ops/pallas/ffn_tail.py), each layer pays ~10 XLA fusions for the front —
layernorm, the fused QKV einsum, two PQ encodes (dot + argmin each), the
per-layer code-slab slice, the match compare/mean, top-k, and the table
assembly. This kernel folds all of it into one pallas_call per layer.

Scope (the flagship serving envelope; everything else keeps the XLA path):
  * OPT-style (no RoPE), MHA (kv_heads == n_heads, G == 1)
  * sparse_v2 with per-head selection (sparse_select_heads == 1)
  * pq_metric 'l2', stored code width == n_subspaces (<= 8)
  * qkv fused weight form [3, D, D] (inference/weights.py)
  * VMEM: QKV weights + the layer's code slab must fit (~11 MB)

PQ encode runs as ONE dot per head against a block-diagonal codebook
matrix `bd` [d_head, n_sub*n_code] (built once at weight-build time,
InferenceWeights.from_params) followed by a grouped argmin — the L2
`cb_norm - 2 z.c` form of ops/pq.py::pq_encode, computed from the
dtype-rounded projections so codes match the XLA path bit-for-bit.

Tile selection reproduces inference/engine.py::decode_step's jnp path
exactly (same mean-match scores, same top-k tie-breaking: argmax picks
the lowest index first, which is lax.top_k's order) — asserted in
tests/test_decode_front.py. The whole match is ONE vectorized compare
of the [B, KV, nt, n_sub, T] slab against the query codes + two
reductions; no per-slot loops.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def build_pq_bd(codebook: jax.Array) -> tuple[jax.Array, jax.Array]:
    """codebook [n_sub, n_code, d_code] -> (bd [n_sub*d_code,
    n_sub*n_code] block-diagonal f32, cb_norm [1, n_sub*n_code] f32).
    Computed once per layer stack at weight-build time (vmap over the
    stacked layer axis)."""
    n_sub, n_code, d_code = codebook.shape
    cb = codebook.astype(jnp.float32)
    eye = jnp.eye(n_sub, dtype=jnp.float32)
    # bd[s*d_code + d, s2*n_code + c] = cb[s, c, d] iff s == s2
    bd = jnp.einsum('scd,st->sdtc', cb, eye).reshape(
        n_sub * d_code, n_sub * n_code)
    cb_norm = jnp.sum(cb * cb, axis=-1).reshape(1, n_sub * n_code)
    return bd, cb_norm


def _front_kernel(pos, base,                                   # SMEM
                  x_ref, nsc_ref, nbi_ref, wqkv_ref, bqkv_ref,
                  bd_ref, cbn_ref, posv_ref, cc_ref,
                  q_ref, k_ref, v_ref, cn_ref, tab_ref,
                  slab, qc2, kc2, sem,
                  *, kv: int, d_head: int, n_sub: int, n_code: int,
                  nt: int, nsel: int, ps: int, eps: float):
    b = x_ref.shape[0]
    base0 = base[0]

    # ---- start the code-slab DMA first; the matmuls hide its latency
    rc = pltpu.make_async_copy(
        cc_ref.at[:, :, pl.ds(base0, nt)], slab, sem)
    rc.start()

    # ---- layernorm (f32 rows)
    xf = x_ref[...].astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    hn = (xf - mu) * jax.lax.rsqrt(var + eps)
    hn = hn * nsc_ref[...].astype(jnp.float32) \
        + nbi_ref[...].astype(jnp.float32)
    hn = hn.astype(x_ref.dtype)

    # ---- QKV projection (3 dots); round to the serving dtype BEFORE
    # the PQ encode so codes match the unfused path bit-for-bit
    bqkv = bqkv_ref[...].astype(jnp.float32)               # [3, D]

    def proj(t):
        y = jax.lax.dot_general(
            hn, wqkv_ref[t].astype(hn.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return (y + bqkv[t:t + 1]).astype(x_ref.dtype)     # [B, D]
    q = proj(0)
    k = proj(1)
    v = proj(2)
    q_ref[...] = q
    k_ref[...] = k
    v_ref[...] = v

    # ---- PQ encode q and k: per head one dot against the block-diag
    # codebook + grouped argmin of cb_norm - 2 z.c
    bd = bd_ref[...]                                       # [dh, ns*nc]
    cbn = cbn_ref[...]                                     # [1, ns*nc]

    for h in range(kv):
        for z, dst in ((q, qc2), (k, kc2)):
            zh = z[:, h * d_head:(h + 1) * d_head].astype(jnp.float32)
            dots = jax.lax.dot_general(
                zh, bd, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            score = (cbn - 2.0 * dots).reshape(b, n_sub, n_code)
            dst[pl.ds(h, 1)] = jnp.argmin(
                score, axis=-1).astype(jnp.int32)[None]    # [1, B, ns]

    kc = kc2[...]                                          # [kv, B, ns]
    cn_ref[...] = jnp.transpose(kc, (1, 0, 2))             # [B, kv, ns]

    # ---- match query codes against the layer's code slab, all slots
    # and heads in one vectorized compare
    rc.wait()
    qc = jnp.transpose(qc2[...], (1, 0, 2))                # [B, kv, ns]
    qc5 = qc[:, :, None, :, None]                          # [B,kv,1,ns,1]
    eq = (slab[...] == qc5).astype(jnp.float32)            # [B,kv,nt,ns,T]
    msum = jnp.sum(eq, axis=3)                             # [B, kv, nt, T]
    tscore = jnp.sum(msum, axis=-1) * (1.0 / ps)           # [B, kv, nt]

    cur = posv_ref[...] // ps                              # [B, 1] int32
    cur3 = cur[:, :, None]                                 # [B, 1, 1]
    tile_i = jax.lax.broadcasted_iota(jnp.int32, (b, kv, nt), 2)
    tscore = jnp.where(tile_i < cur3, tscore, NEG)
    for c in range(nsel - 1):
        val = jnp.max(tscore, axis=-1)                     # [B, kv]
        idx = jnp.argmax(tscore, axis=-1).astype(jnp.int32)
        rel = jnp.where(val > NEG / 2, idx + base0, -1)
        tab_ref[:, :, pl.ds(c, 1)] = rel[:, :, None]
        tscore = jnp.where(tile_i == idx[:, :, None], NEG, tscore)
    tab_ref[:, :, pl.ds(nsel - 1, 1)] = jnp.broadcast_to(
        cur3 + base0, (b, kv, 1))


@functools.partial(
    jax.jit, static_argnames=('nt', 'nsel', 'ps', 'eps', 'interpret'))
def decode_front(x, norm_scale, norm_bias, wqkv, bqkv, bd, cb_norm,
                 c_cache, pos, base, *, nt: int, nsel: int,
                 ps: int = 128, eps: float = 1e-5,
                 interpret: Optional[bool] = None):
    """x [B, D] -> (q [B, D], k [B, D], v [B, D],
    c_new [B, KV, n_sub] int32, tables [B, KV, nsel] PHYSICAL tile ids).

    wqkv [3, D, D], bqkv [3, D]; bd/cb_norm from build_pq_bd;
    c_cache [B, KV, L*NT, w, T] int32 (w == n_sub); pos [B] int32;
    base [1] int32 (layer_index * nt)."""
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    b, d = x.shape
    _, kv, _, w, t = c_cache.shape
    n_sub = w
    d_head = d // kv
    n_code = bd.shape[1] // n_sub
    out = pl.pallas_call(
        functools.partial(_front_kernel, kv=kv, d_head=d_head,
                          n_sub=n_sub, n_code=n_code, nt=nt, nsel=nsel,
                          ps=ps, eps=eps),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(1,),
            in_specs=[
                pl.BlockSpec((b, d), lambda i, *_: (0, 0)),
                pl.BlockSpec((1, d), lambda i, *_: (0, 0)),
                pl.BlockSpec((1, d), lambda i, *_: (0, 0)),
                pl.BlockSpec((3, d, d), lambda i, *_: (0, 0, 0)),
                pl.BlockSpec((3, d), lambda i, *_: (0, 0)),
                pl.BlockSpec(bd.shape, lambda i, *_: (0, 0)),
                pl.BlockSpec(cb_norm.shape, lambda i, *_: (0, 0)),
                pl.BlockSpec((b, 1), lambda i, *_: (0, 0)),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            ],
            out_specs=[
                pl.BlockSpec((b, d), lambda i, *_: (0, 0)),
                pl.BlockSpec((b, d), lambda i, *_: (0, 0)),
                pl.BlockSpec((b, d), lambda i, *_: (0, 0)),
                pl.BlockSpec((b, kv, n_sub), lambda i, *_: (0, 0, 0)),
                pl.BlockSpec((b, kv, nsel), lambda i, *_: (0, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((b, kv, nt, n_sub, t), jnp.int32),
                pltpu.VMEM((kv, b, n_sub), jnp.int32),
                pltpu.VMEM((kv, b, n_sub), jnp.int32),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, d), x.dtype),
            jax.ShapeDtypeStruct((b, d), x.dtype),
            jax.ShapeDtypeStruct((b, d), x.dtype),
            jax.ShapeDtypeStruct((b, kv, n_sub), jnp.int32),
            jax.ShapeDtypeStruct((b, kv, nsel), jnp.int32),
        ],
        interpret=interpret,
    )(pos, base, x, norm_scale.reshape(1, -1), norm_bias.reshape(1, -1),
      wqkv, bqkv, bd, cb_norm, pos.reshape(-1, 1), c_cache)
    return out


def front_vmem_mb(b: int, kv: int, nt: int, n_sub: int, t: int,
                  d: int, itemsize: int) -> float:
    """Rough VMEM need: code slab (+ its f32 compare copy) + QKV
    weights + code scratches."""
    slab = b * kv * nt * n_sub * t * 4 * 2
    w = 3 * d * d * itemsize
    return (slab + w) / 2**20
