"""Paged KV cache: non-contiguous HBM pages + block tables.

North-star addition ("paged/tiled HBM layout"): instead of one contiguous
[B, S_max] cache per slot, K/V live in a fixed pool of pages; each slot
owns a per-sequence LOGICAL page table. Memory scales with actual sequence
lengths, not worst case, so more concurrent sequences fit. Page ownership
(free list, lazy growth, release) is managed by the native C++ allocator
in runtime/scheduler.cc.

Pool layout (round 2): the layer dimension is MERGED into the page axis —
pools are [KV, L*n_pages + 1, page_size, D] and layer l's copy of logical
page p lives at physical page l*n_pages + p (the final page is a shared
write sink for released slots). Two wins over the previous [L, KV, N, ...]
layout:

  * the decode layer scan carries the pools and performs only a tiny
    per-layer column scatter (in place under donation) — no per-layer
    pool slicing / wholesale rewrite;
  * a parallel CODE-page pool [KV, L*N+1, ps, n_sub] makes the pages
    double as PQ selection tiles: sparse decode gathers code pages
    (cheap ints), scores pages by PQ match count, and reads only the
    top pages of K/V — the flagship sparse model now serves paged.
"""
from __future__ import annotations

import ctypes
import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from spt_proto_tpu.config import ATTN_SPARSE_V2, ModelConfig
from spt_proto_tpu.inference.engine import (NEG_INF, _apply_rope_1, _dense,
                                            _encode_codes, _ffn,
                                            _ffn_residual, _norm,
                                            _qkv_proj)
from spt_proto_tpu.inference.weights import InferenceWeights
from spt_proto_tpu.models.decoder import PE_OFFSET


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PagedKVCache:
    k_pages: jax.Array       # [KV, L*n_pages + 1, page_size, D]
    v_pages: jax.Array       # [KV, L*n_pages + 1, page_size, D]
    c_pages: jax.Array       # [KV, L*n_pages + 1, page_size, n_sub] int32
    page_indices: jax.Array  # [B, pages_per_seq] int32 LOGICAL, -1 = none
    length: jax.Array        # [B] int32
    # int8 mode: per-token scales in the stock paged-attention
    # QuantizedTensor layout (trailing head dim reduced); None = bf16
    k_scales: Optional[jax.Array] = None   # [KV, L*n_pages+1, ps, 1] f32
    v_scales: Optional[jax.Array] = None   # [KV, L*n_pages+1, ps, 1] f32

    @staticmethod
    def create(cfg: ModelConfig, batch: int, n_pages: int, page_size: int,
               max_len: int, dtype=jnp.bfloat16,
               quantized: bool = False) -> 'PagedKVCache':
        """Allocates L*n_pages + 1 physical pages: the last is a reserved
        write sink — decode writes from slots with no page table (-1
        entries, e.g. released continuous-batching lanes) land there
        instead of corrupting a real page."""
        l, h, d = cfg.n_layers, cfg.kv_heads, cfg.d_head
        n_sub = cfg.n_subspaces if cfg.attention == ATTN_SPARSE_V2 else 1
        pps = -(-max_len // page_size)
        kv_dtype = jnp.int8 if quantized else dtype
        scales = dict()
        if quantized:
            scales = dict(
                k_scales=jnp.zeros((h, l * n_pages + 1, page_size, 1),
                                   jnp.float32),
                v_scales=jnp.zeros((h, l * n_pages + 1, page_size, 1),
                                   jnp.float32))
        return PagedKVCache(
            k_pages=jnp.zeros((h, l * n_pages + 1, page_size, d),
                              kv_dtype),
            v_pages=jnp.zeros((h, l * n_pages + 1, page_size, d),
                              kv_dtype),
            c_pages=jnp.zeros((h, l * n_pages + 1, page_size, n_sub),
                              jnp.int32),
            page_indices=jnp.full((batch, pps), -1, jnp.int32),
            length=jnp.zeros((batch,), jnp.int32), **scales)

    @property
    def quantized(self) -> bool:
        return self.k_scales is not None

    @property
    def page_size(self) -> int:
        return self.k_pages.shape[2]

    def n_logical(self, n_layers: int) -> int:
        return (self.k_pages.shape[1] - 1) // n_layers


class PageAllocator:
    """ctypes wrapper over the native page pool (runtime/scheduler.cc)."""

    def __init__(self, n_pages: int, n_slots: int):
        from spt_proto_tpu.inference.batching import native_scheduler_lib
        self._lib = native_scheduler_lib()
        lib = self._lib
        if not hasattr(lib, '_pages_configured'):
            lib.pages_create.restype = ctypes.c_void_p
            lib.pages_create.argtypes = [ctypes.c_int32, ctypes.c_int32]
            lib.pages_destroy.argtypes = [ctypes.c_void_p]
            lib.pages_free_count.restype = ctypes.c_int32
            lib.pages_free_count.argtypes = [ctypes.c_void_p]
            lib.pages_alloc.restype = ctypes.c_int32
            lib.pages_alloc.argtypes = [ctypes.c_void_p, ctypes.c_int32]
            lib.pages_ensure.restype = ctypes.c_int32
            lib.pages_ensure.argtypes = [ctypes.c_void_p, ctypes.c_int32,
                                         ctypes.c_int32, ctypes.c_int32]
            lib.pages_table.restype = ctypes.c_int32
            lib.pages_table.argtypes = [ctypes.c_void_p, ctypes.c_int32,
                                        ctypes.POINTER(ctypes.c_int32),
                                        ctypes.c_int32]
            lib.pages_release.argtypes = [ctypes.c_void_p, ctypes.c_int32]
            lib._pages_configured = True
        self._pool = lib.pages_create(n_pages, n_slots)
        self.n_pages = n_pages
        self.n_slots = n_slots

    def __del__(self):
        try:
            self._lib.pages_destroy(self._pool)
        except Exception:
            pass

    @property
    def free_count(self) -> int:
        return self._lib.pages_free_count(self._pool)

    def ensure(self, slot: int, tokens: int, page_size: int) -> int:
        n = self._lib.pages_ensure(self._pool, slot, tokens, page_size)
        if n < 0:
            raise MemoryError('page pool exhausted')
        return n

    def table(self, slot: int, cap: int) -> np.ndarray:
        buf = (ctypes.c_int32 * cap)()
        self._lib.pages_table(self._pool, slot, buf, cap)
        return np.frombuffer(buf, dtype=np.int32).copy()

    def release(self, slot: int) -> None:
        self._lib.pages_release(self._pool, slot)


MAX_INT8 = 127.5   # stock paged-attention QuantizedTensor convention


def _quantize_pages(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """[..., D] -> (int8 [..., D], scales [..., 1]), matching
    jax.experimental paged_attention quantization_utils (x*127.5/h)."""
    h = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1,
                            keepdims=True), 1e-8)
    q = jnp.int8(jnp.rint(x.astype(jnp.float32) * (MAX_INT8 / h)))
    return q, h


def _dequantize_pages(q: jax.Array, h: jax.Array, dtype) -> jax.Array:
    return (q.astype(jnp.float32) * h / MAX_INT8).astype(dtype)


# ---------------------------------------------------------------------------
# paged attention (decode)
# ---------------------------------------------------------------------------

def paged_attention_ref(q: jax.Array, k_pages: jax.Array,
                        v_pages: jax.Array, lengths: jax.Array,
                        page_indices: jax.Array, *, scale: float
                        ) -> jax.Array:
    """jnp oracle: q [B, H, D]; pages [KV, P, ps, D];
    page_indices [B, pps] PHYSICAL page ids (already layer-offset)."""
    b = q.shape[0]
    h, n, ps, d = k_pages.shape
    if q.shape[1] != h:                      # GQA: repeat kv pages per group
        g = q.shape[1] // h
        k_pages = jnp.repeat(k_pages, g, axis=0)
        v_pages = jnp.repeat(v_pages, g, axis=0)
        h = q.shape[1]
    pps = page_indices.shape[1]
    safe = jnp.maximum(page_indices, 0)
    # gather per-sequence K/V: [B, H, pps*ps, D]
    kg = jnp.take(k_pages, safe, axis=1)      # [H, B, pps, ps, D]
    vg = jnp.take(v_pages, safe, axis=1)
    kg = kg.transpose(1, 0, 2, 3, 4).reshape(b, h, pps * ps, d)
    vg = vg.transpose(1, 0, 2, 3, 4).reshape(b, h, pps * ps, d)
    scores = jnp.einsum('bhd,bhjd->bhj', q, kg,
                        preferred_element_type=jnp.float32) * scale
    valid = jnp.arange(pps * ps)[None, :] < lengths[:, None]
    scores = jnp.where(valid[:, None, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1).astype(vg.dtype)
    return jnp.einsum('bhj,bhjd->bhd', probs, vg)


def paged_attention_op(q, k_pages, v_pages, lengths, page_indices, *,
                       scale: float, k_scales=None,
                       v_scales=None) -> jax.Array:
    """Stock Pallas paged-attention kernel on TPU, jnp oracle elsewhere.
    `page_indices` must be PHYSICAL page ids. With k_scales/v_scales the
    pages are int8 and ride the stock kernel's QuantizedTensor path.

    The stock kernel needs head_dim aligned to 128 lanes; smaller head dims
    are zero-padded (zeros change neither scores nor outputs)."""
    quant = k_scales is not None
    if jax.default_backend() == 'tpu':
        from jax.experimental.pallas.ops.tpu.paged_attention import (
            paged_attention, quantization_utils)
        d = q.shape[-1]
        pad = (-d) % 128
        if pad:
            widths3 = ((0, 0), (0, 0), (0, pad))
            widths4 = ((0, 0), (0, 0), (0, 0), (0, pad))
            q = jnp.pad(q, widths3)
            k_pages = jnp.pad(k_pages, widths4)
            v_pages = jnp.pad(v_pages, widths4)
        if quant:
            k_pages = quantization_utils.QuantizedTensor(k_pages, k_scales)
            v_pages = quantization_utils.QuantizedTensor(v_pages, v_scales)
        # the stock kernel requires pages_per_sequence % block == 0: pick
        # the largest divisor of pps that is <= 8
        pps = page_indices.shape[1]
        block = max(b for b in range(1, min(8, pps) + 1) if pps % b == 0)
        out = paged_attention(
            q * scale, k_pages, v_pages, lengths,
            jnp.maximum(page_indices, 0),
            pages_per_compute_block=block)
        return out[..., :d]
    if quant:
        k_pages = _dequantize_pages(k_pages, k_scales, q.dtype)
        v_pages = _dequantize_pages(v_pages, v_scales, q.dtype)
    return paged_attention_ref(q, k_pages, v_pages, lengths, page_indices,
                               scale=scale)


def paged_sparse_attention(qg, codes_q, k_pages, v_pages, c_pages, lengths,
                           phys_indices, page_indices, *, scale: float,
                           clamp: float, sparse_coeff: int,
                           k_scales=None, v_scales=None) -> jax.Array:
    """PQ page-sparse decode attention: pages are the selection tiles.

    qg [B, KV, G, D]; codes_q [B, KV, G, n_sub]; pools [KV, P, ps, ...];
    phys_indices [B, pps] physical ids; page_indices [B, pps] logical (for
    validity masks). Scores every cached key's PQ match count by gathering
    only the (tiny, int) code pages, pools them per page, selects the top
    `used/sparse_coeff + 1` pages per head, and reads K/V for those pages
    only — the HBM read shrinks by the sparsity factor, page-aligned.
    Returns [B, KV, G, D].
    """
    b, kv, g, d = qg.shape
    _, _, ps, n_sub = c_pages.shape
    pps = phys_indices.shape[1]
    safe = jnp.maximum(phys_indices, 0)
    # [KV, B, pps, ps, n_sub] -> match counts [B, KV, G, pps, ps]
    cg = jnp.take(c_pages, safe, axis=1)
    match = jnp.sum(
        (cg.transpose(1, 0, 2, 3, 4)[:, :, None]
         == codes_q[:, :, :, None, None, :]).astype(jnp.float32), axis=-1)
    cols = jnp.arange(pps * ps)[None, :] < lengths[:, None]   # [B, pps*ps]
    colsp = cols.reshape(b, pps, ps)
    match = jnp.where(colsp[:, None, None], match, -1.0)
    pscore = match.mean(-1)                                # [B, KV, G, pps]
    page_live = (jnp.arange(pps)[None, :] * ps < lengths[:, None]) \
        & (page_indices >= 0)                              # [B, pps]
    pscore = jnp.where(page_live[:, None, None], pscore, -jnp.inf)
    # force the page holding the most recent token (recency window)
    cur = (jnp.maximum(lengths, 1) - 1) // ps              # [B]
    pscore = jnp.where(
        (jnp.arange(pps)[None, :] == cur[:, None])[:, None, None],
        jnp.inf, pscore)
    nsel = min(pps, max(1, pps // sparse_coeff) + 1)
    pvals, pidx = jax.lax.top_k(pscore, nsel)              # [B, KV, G, nsel]
    page_ok = pvals > -jnp.inf
    sel_logical = jnp.maximum(pidx, 0)
    # physical ids of the selected logical table entries
    sel_phys = jnp.take_along_axis(
        safe[:, None, None, :].astype(jnp.int32),
        sel_logical, axis=-1)                              # [B, KV, G, nsel]
    hidx = jnp.arange(kv)[:, None, None, None]
    kg = k_pages[hidx, sel_phys.transpose(1, 0, 2, 3)]     # [KV,B,G,ns,ps,D]
    vg = v_pages[hidx, sel_phys.transpose(1, 0, 2, 3)]
    if k_scales is not None:
        ksg = k_scales[hidx, sel_phys.transpose(1, 0, 2, 3)]
        vsg = v_scales[hidx, sel_phys.transpose(1, 0, 2, 3)]
        kg = _dequantize_pages(kg, ksg, qg.dtype)
        vg = _dequantize_pages(vg, vsg, qg.dtype)
    kg = kg.transpose(1, 0, 2, 3, 4, 5)                    # [B,KV,G,ns,ps,D]
    vg = vg.transpose(1, 0, 2, 3, 4, 5)
    colpos = sel_logical[..., None] * ps + jnp.arange(ps)  # [B,KV,G,ns,ps]
    ok = (colpos < lengths[:, None, None, None, None]) & page_ok[..., None]
    scores = jnp.einsum('bkgd,bkgspd->bkgsp', qg, kg,
                        preferred_element_type=jnp.float32) * scale
    scores = jnp.clip(scores, -clamp, clamp)
    scores = jnp.where(ok, scores, NEG_INF)
    flat = scores.reshape(b, kv, g, -1)
    probs = jax.nn.softmax(flat, axis=-1).reshape(scores.shape)
    probs = jnp.where(ok, probs, 0.0).astype(vg.dtype)
    return jnp.einsum('bkgsp,bkgspd->bkgd', probs, vg)


# ---------------------------------------------------------------------------
# engine steps over the paged cache
# ---------------------------------------------------------------------------

def paged_prefill(iw: InferenceWeights, tokens: jax.Array,
                  cache: PagedKVCache) -> Tuple[jax.Array, PagedKVCache]:
    """Prompt pass writing K/V (and PQ codes) into assigned pages.
    tokens [B, S]; cache.page_indices rows must already hold >=
    ceil(S/ps) logical pages."""
    from spt_proto_tpu.inference.engine import TILE, KVCache, prefill
    cfg = iw.cfg
    b, s = tokens.shape
    ps = cache.page_size
    n_log = cache.n_logical(cfg.n_layers)
    tmp = KVCache.create(cfg, b, s, dtype=cfg.dtype)
    logits, tmp = prefill(iw, tokens, tmp)
    # tmp is layer-folded tile-major [B, KV, L*NTm, w, T]; unfold to
    # [L, B, KV, S, w] then scatter into merged pools [KV, L*N+1, ps, .]
    pps_used = -(-s // ps)
    pad = pps_used * ps - s
    l, h = cfg.n_layers, cfg.kv_heads
    nt_m = tmp.tiles_per_layer(l)

    def to_std(tiled, width):
        x = tiled.reshape(b, h, l, nt_m, width, TILE)
        x = x.transpose(2, 0, 1, 3, 5, 4)           # [L,B,KV,NTm,T,w]
        return x.reshape(l, b, h, nt_m * TILE, width)[:, :, :, :s]

    def to_pages(x):
        # [L, B, KV, S(+pad), w] -> [KV, L*B*pps, ps, w]
        w = x.shape[-1]
        widths = ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0))
        x = jnp.pad(x, widths).reshape(l, b, h, pps_used, ps, w)
        return x.transpose(2, 0, 1, 3, 4, 5).reshape(h, -1, ps, w)

    logical = jnp.maximum(cache.page_indices[:, :pps_used], 0)  # [B, pps]
    phys = (jnp.arange(l)[:, None, None] * n_log
            + logical[None]).reshape(-1)               # [L*B*pps]
    k_std = to_std(tmp.k, cfg.d_head)
    v_std = to_std(tmp.v, cfg.d_head)
    scales = dict()
    if cache.quantized:
        k_std, ksc = _quantize_pages(k_std)
        v_std, vsc = _quantize_pages(v_std)
        scales = dict(
            k_scales=cache.k_scales.at[:, phys].set(to_pages(ksc)),
            v_scales=cache.v_scales.at[:, phys].set(to_pages(vsc)))
    k_pages = cache.k_pages.at[:, phys].set(to_pages(k_std))
    v_pages = cache.v_pages.at[:, phys].set(to_pages(v_std))
    c_pages = cache.c_pages
    if cfg.attention == ATTN_SPARSE_V2:
        c_pages = c_pages.at[:, phys].set(
            to_pages(to_std(tmp.codes.astype(jnp.int32),
                            tmp.codes.shape[3])))
    return logits, PagedKVCache(
        k_pages=k_pages, v_pages=v_pages, c_pages=c_pages,
        page_indices=cache.page_indices,
        length=jnp.full_like(cache.length, s), **scales)


def paged_decode_step(iw: InferenceWeights, tokens: jax.Array,
                      cache: PagedKVCache
                      ) -> Tuple[jax.Array, PagedKVCache]:
    """One token per slot over the paged cache. Dense attention uses the
    stock Pallas paged-attention kernel; sparse (PQ) attention selects
    top pages by match count (pages = tiles). The pools ride the layer
    scan as carry — each layer performs only a small column scatter, in
    place when the cache argument is donated."""
    cfg = iw.cfg
    p = iw.params
    b = tokens.shape[0]
    ps = cache.page_size
    n_log = cache.n_logical(cfg.n_layers)
    pos = cache.length
    h_tok = p['embedding']['embedding'][tokens][:, None]
    if cfg.arch == 'opt':
        h_tok = h_tok + p['learned_pe']['embedding'][pos + PE_OFFSET][:, None]
    x = h_tok.astype(cfg.dtype)
    scale = cfg.d_head ** -0.5
    kv, g = cfg.kv_heads, cfg.kv_groups
    sparse = cfg.attention == ATTN_SPARSE_V2
    pps = cache.page_indices.shape[1]
    page_of = jnp.take_along_axis(cache.page_indices,
                                  jnp.minimum(pos // ps, pps - 1)[:, None],
                                  axis=1)[:, 0]
    # slots without a page table write into the reserved sink page
    sink = cache.k_pages.shape[1] - 1
    slot_in_page = pos % ps
    hidx = jnp.arange(kv)[:, None]

    def layer(carry, inp):
        x, k_pages, v_pages, c_pages, k_scales, v_scales = carry
        bp, lix = inp
        hn = _norm(cfg, bp['norm1'], x)
        q, k, v = _qkv_proj(bp['mha'], hn)
        q = q.reshape(b, cfg.n_heads, cfg.d_head)
        k = k.reshape(b, kv, cfg.d_head)                 # [B, KV, D]
        v = v.reshape(b, kv, cfg.d_head)
        if cfg.arch == 'llama':
            q = _apply_rope_1(q[:, :, None, :], pos[:, None],
                              cfg.rope_base)[:, :, 0]
            k = _apply_rope_1(k[:, :, None, :], pos[:, None],
                              cfg.rope_base)[:, :, 0]
        write_page = jnp.where(page_of >= 0, lix * n_log + page_of, sink)
        # small in-place column scatters (pools are loop carry)
        if cache.quantized:
            k_w, ksc_w = _quantize_pages(k)        # [B,KV,D] + [B,KV,1]
            v_w, vsc_w = _quantize_pages(v)
            k_scales = k_scales.at[
                hidx, write_page[None, :], slot_in_page].set(
                    ksc_w.transpose(1, 0, 2))
            v_scales = v_scales.at[
                hidx, write_page[None, :], slot_in_page].set(
                    vsc_w.transpose(1, 0, 2))
        else:
            k_w, v_w = k, v
        k_pages = k_pages.at[hidx, write_page[None, :], slot_in_page].set(
            k_w.transpose(1, 0, 2).astype(k_pages.dtype))
        v_pages = v_pages.at[hidx, write_page[None, :], slot_in_page].set(
            v_w.transpose(1, 0, 2).astype(v_pages.dtype))
        phys_idx = jnp.where(cache.page_indices >= 0,
                             lix * n_log + cache.page_indices, sink)
        if sparse:
            qg = q.reshape(b, kv, g, cfg.d_head)
            from spt_proto_tpu.inference.engine import _bd_of
            bd_m = _bd_of(bp['mha'])
            codes_q = _encode_codes(cfg, bp['mha']['quantizer'],
                                    q.reshape(b, kv * g, cfg.d_head),
                                    bd=bd_m)
            codes_q = codes_q.reshape(b, kv, g, -1)
            c_new = _encode_codes(cfg, bp['mha']['quantizer'], k, bd=bd_m)
            c_pages = c_pages.at[
                hidx, write_page[None, :], slot_in_page].set(
                    c_new.transpose(1, 0, 2).astype(c_pages.dtype))
            o = paged_sparse_attention(
                qg, codes_q, k_pages, v_pages, c_pages, pos + 1,
                phys_idx, cache.page_indices, scale=scale,
                clamp=cfg.score_clamp, sparse_coeff=cfg.sparse_coeff,
                k_scales=k_scales, v_scales=v_scales)
            o = o.reshape(b, cfg.n_heads, cfg.d_head)
        else:
            o = paged_attention_op(q, k_pages, v_pages, pos + 1,
                                   phys_idx, scale=scale,
                                   k_scales=k_scales, v_scales=v_scales)
        o = o.reshape(b, 1, cfg.d_model)
        x = x + _dense(bp['mha']['o'], o)
        x = _ffn_residual(cfg, bp['ffn'], bp['norm2'], x)
        return (x, k_pages, v_pages, c_pages, k_scales, v_scales), ()

    (x, k_pages, v_pages, c_pages, k_scales, v_scales), _ = jax.lax.scan(
        layer, (x, cache.k_pages, cache.v_pages, cache.c_pages,
                cache.k_scales, cache.v_scales),
        (p['blocks'], jnp.arange(cfg.n_layers)))
    cache = PagedKVCache(k_pages=k_pages, v_pages=v_pages, c_pages=c_pages,
                         page_indices=cache.page_indices,
                         length=cache.length + 1,
                         k_scales=k_scales, v_scales=v_scales)
    x = _norm(cfg, p['final_norm'], x)
    logits = _dense(p['lm_head'], x[:, 0])
    return logits, cache
