"""Paged KV cache: non-contiguous HBM pages + block tables.

North-star addition ("paged/tiled HBM layout"): instead of one contiguous
[B, S_max] cache per slot, K/V live in a fixed pool of pages
[L, H, n_pages, page_size, D]; each slot owns a per-sequence page table.
Memory scales with actual sequence lengths, not worst case, so more
concurrent sequences fit. Page ownership (free list, lazy growth, release)
is managed by the native C++ allocator in runtime/scheduler.cc; the decode
attention over pages uses the stock Pallas paged_attention kernel on TPU
and a gather-based jnp reference elsewhere.
"""
from __future__ import annotations

import ctypes
import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from spt_proto_tpu.config import ModelConfig
from spt_proto_tpu.inference.engine import (NEG_INF, _apply_rope_1, _dense,
                                            _ffn, _norm)
from spt_proto_tpu.inference.weights import InferenceWeights
from spt_proto_tpu.models.decoder import PE_OFFSET


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PagedKVCache:
    k_pages: jax.Array       # [L, H, n_pages, page_size, D]
    v_pages: jax.Array       # [L, H, n_pages, page_size, D]
    page_indices: jax.Array  # [B, pages_per_seq] int32, -1 = unassigned
    length: jax.Array        # [B] int32

    @staticmethod
    def create(cfg: ModelConfig, batch: int, n_pages: int, page_size: int,
               max_len: int, dtype=jnp.bfloat16) -> 'PagedKVCache':
        """Allocates n_pages + 1 physical pages: the last page is a
        reserved write sink — decode writes from slots with no page table
        (-1 entries, e.g. released continuous-batching lanes) land there
        instead of corrupting a real page."""
        l, h, d = cfg.n_layers, cfg.kv_heads, cfg.d_head
        pps = -(-max_len // page_size)
        return PagedKVCache(
            k_pages=jnp.zeros((l, h, n_pages + 1, page_size, d), dtype),
            v_pages=jnp.zeros((l, h, n_pages + 1, page_size, d), dtype),
            page_indices=jnp.full((batch, pps), -1, jnp.int32),
            length=jnp.zeros((batch,), jnp.int32))

    @property
    def page_size(self) -> int:
        return self.k_pages.shape[3]


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


# ---------------------------------------------------------------------------
# paged attention (decode)
# ---------------------------------------------------------------------------

def paged_attention_ref(q: jax.Array, k_pages: jax.Array,
                        v_pages: jax.Array, lengths: jax.Array,
                        page_indices: jax.Array, *, scale: float
                        ) -> jax.Array:
    """jnp oracle: q [B, H, D]; pages [H, N, ps, D];
    page_indices [B, pps]."""
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
                       scale: float) -> jax.Array:
    """Stock Pallas paged-attention kernel on TPU, jnp oracle elsewhere.

    The stock kernel needs head_dim aligned to 128 lanes; smaller head dims
    are zero-padded (zeros change neither scores nor outputs)."""
    if jax.default_backend() == 'tpu':
        from jax.experimental.pallas.ops.tpu.paged_attention import (
            paged_attention)
        d = q.shape[-1]
        pad = (-d) % 128
        if pad:
            widths3 = ((0, 0), (0, 0), (0, pad))
            widths4 = ((0, 0), (0, 0), (0, 0), (0, pad))
            q = jnp.pad(q, widths3)
            k_pages = jnp.pad(k_pages, widths4)
            v_pages = jnp.pad(v_pages, widths4)
        # the stock kernel requires pages_per_sequence % block == 0: pick
        # the largest divisor of pps that is <= 8
        pps = page_indices.shape[1]
        block = max(b for b in range(1, min(8, pps) + 1) if pps % b == 0)
        out = paged_attention(
            q * scale, k_pages, v_pages, lengths,
            jnp.maximum(page_indices, 0),
            pages_per_compute_block=block)
        return out[..., :d]
    return paged_attention_ref(q, k_pages, v_pages, lengths, page_indices,
                               scale=scale)


# ---------------------------------------------------------------------------
# engine steps over the paged cache (dense attention path)
# ---------------------------------------------------------------------------

def paged_prefill(iw: InferenceWeights, tokens: jax.Array,
                  cache: PagedKVCache) -> Tuple[jax.Array, PagedKVCache]:
    """Prompt pass writing K/V into assigned pages. tokens [B, S];
    cache.page_indices rows must already hold >= ceil(S/ps) pages."""
    from spt_proto_tpu.inference.engine import KVCache, prefill
    cfg = iw.cfg
    b, s = tokens.shape
    ps = cache.page_size
    tmp = KVCache.create(cfg, b, s, dtype=cache.k_pages.dtype)
    logits, tmp = prefill(iw, tokens, tmp)
    # scatter [L, B, H, S, D] into pages [L, H, N, ps, D]
    pps_used = -(-s // ps)
    pad = pps_used * ps - s
    kx = jnp.pad(tmp.k, ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0)))
    vx = jnp.pad(tmp.v, ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0)))
    l, _, h, _, d = kx.shape
    kx = kx.reshape(l, b, h, pps_used, ps, d)
    vx = vx.reshape(l, b, h, pps_used, ps, d)
    pages = jnp.maximum(cache.page_indices[:, :pps_used], 0)  # [B, pps_used]
    # scatter per (b, p): k_pages[:, :, pages[b,p]] = kx[:, b, :, p]
    k_pages = cache.k_pages.at[:, :, pages.reshape(-1)].set(
        kx.transpose(0, 2, 1, 3, 4, 5).reshape(l, h, b * pps_used, ps, d))
    v_pages = cache.v_pages.at[:, :, pages.reshape(-1)].set(
        vx.transpose(0, 2, 1, 3, 4, 5).reshape(l, h, b * pps_used, ps, d))
    return logits, PagedKVCache(
        k_pages=k_pages, v_pages=v_pages,
        page_indices=cache.page_indices,
        length=jnp.full_like(cache.length, s))


def paged_decode_step(iw: InferenceWeights, tokens: jax.Array,
                      cache: PagedKVCache
                      ) -> Tuple[jax.Array, PagedKVCache]:
    """One token per slot over the paged cache (dense attention)."""
    cfg = iw.cfg
    p = iw.params
    b = tokens.shape[0]
    ps = cache.page_size
    pos = cache.length
    h_tok = p['embedding']['embedding'][tokens][:, None]
    if cfg.arch == 'opt':
        h_tok = h_tok + p['learned_pe']['embedding'][pos + PE_OFFSET][:, None]
    x = h_tok.astype(cfg.dtype)
    scale = cfg.d_head ** -0.5
    bidx = jnp.arange(b)
    pps = cache.page_indices.shape[1]
    page_of = jnp.take_along_axis(cache.page_indices,
                                  jnp.minimum(pos // ps, pps - 1)[:, None],
                                  axis=1)[:, 0]
    # slots without a page table write into the reserved sink page
    sink = cache.k_pages.shape[2] - 1
    write_page = jnp.where(page_of >= 0, page_of, sink)
    slot_in_page = pos % ps

    def layer(carry, inp):
        x = carry
        bp, k_pages, v_pages = inp
        hn = _norm(cfg, bp['norm1'], x)
        q = _dense(bp['mha']['q'], hn)
        k = _dense(bp['mha']['k'], hn)
        v = _dense(bp['mha']['v'], hn)
        q = q.reshape(b, cfg.n_heads, cfg.d_head)
        k = k.reshape(b, cfg.kv_heads, cfg.d_head)       # [B, KV, D]
        v = v.reshape(b, cfg.kv_heads, cfg.d_head)
        if cfg.arch == 'llama':
            q = _apply_rope_1(q[:, :, None, :], pos[:, None],
                              cfg.rope_base)[:, :, 0]
            k = _apply_rope_1(k[:, :, None, :], pos[:, None],
                              cfg.rope_base)[:, :, 0]
        # write new K/V into the page slot
        k_pages = k_pages.at[:, write_page, slot_in_page].set(
            k.transpose(1, 0, 2).astype(k_pages.dtype))
        v_pages = v_pages.at[:, write_page, slot_in_page].set(
            v.transpose(1, 0, 2).astype(v_pages.dtype))
        o = paged_attention_op(q, k_pages, v_pages, pos + 1,
                               cache.page_indices, scale=scale)
        o = o.reshape(b, 1, cfg.d_model)
        x = x + _dense(bp['mha']['o'], o)
        x = x + _ffn(cfg, bp['ffn'], _norm(cfg, bp['norm2'], x))
        return x, (k_pages, v_pages)

    x, (k_new, v_new) = jax.lax.scan(
        layer, x, (p['blocks'], cache.k_pages, cache.v_pages))
    cache = PagedKVCache(k_pages=k_new, v_pages=v_new,
                         page_indices=cache.page_indices,
                         length=cache.length + 1)
    x = _norm(cfg, p['final_norm'], x)
    logits = _dense(p['lm_head'], x[:, 0])
    return logits, cache
