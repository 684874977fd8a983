"""Inference engine: prefill + single-token decode with a PQ-coded KV cache.

North-star addition — the reference has no inference path at all (no KV
cache, no generate loop, SURVEY §0). Design points:

  * KV cache is a preallocated [L, B, H, S_max, D] tensor pytree plus a
    parallel PQ-code cache [L, B, H, S_max, n_sub]. K codes are appended
    incrementally at decode time, so candidate lookup for a new token is
    O(S * n_sub) int compares per head — fixing the reference lookup
    kernel's O(S^2) rescan-per-forward (extension/lookup.cu).
  * Sparse decode attends over only the top S_max/sparse_coeff cached keys
    per head (selected by PQ match count): the HBM read of K/V — the decode
    bottleneck — shrinks by the sparsity factor.
  * Per-slot lengths: each batch slot has its own position, so the same
    jitted decode step serves continuous batching (inference/batching.py).
  * All math mirrors models/decoder.py exactly (parity-tested); LoRA is
    pre-folded by inference/weights.py.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from spt_proto_tpu.config import (ATTN_SPARSE_V2, FFN_ROUTED, ModelConfig)
from spt_proto_tpu.inference.weights import InferenceWeights
from spt_proto_tpu.layers.common import rope_cos_sin
from spt_proto_tpu.models.decoder import PE_OFFSET
from spt_proto_tpu.ops import pq as pq_ops
from spt_proto_tpu.ops import routed_ffn as rops

NEG_INF = -1e30


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class KVCache:
    k: jax.Array       # [L, B, H, S_max, D]
    v: jax.Array       # [L, B, H, S_max, D]
    codes: jax.Array   # [L, B, H, S_max, n_sub] int32 (zeros if not sparse)
    length: jax.Array  # [B] int32 — tokens currently in each slot

    @staticmethod
    def create(cfg: ModelConfig, batch: int, max_len: int,
               dtype=jnp.bfloat16) -> 'KVCache':
        l, h, d = cfg.n_layers, cfg.kv_heads, cfg.d_head
        n_sub = cfg.n_subspaces if cfg.attention == ATTN_SPARSE_V2 else 1
        return KVCache(
            k=jnp.zeros((l, batch, h, max_len, d), dtype),
            v=jnp.zeros((l, batch, h, max_len, d), dtype),
            codes=jnp.zeros((l, batch, h, max_len, n_sub), jnp.int32),
            length=jnp.zeros((batch,), jnp.int32))


# ---------------------------------------------------------------------------
# primitive helpers (mirror layers/ math bit-for-bit)
# ---------------------------------------------------------------------------

def _dense(p: dict, x: jax.Array) -> jax.Array:
    kernel = p['kernel']
    if isinstance(kernel, dict):        # int8 weight-only
        from spt_proto_tpu.ops.pallas.int8_matmul import int8_matmul
        y = int8_matmul(x, kernel['q'], kernel['scale'])
    else:
        y = x @ kernel
    if 'bias' in p:
        y = y + p['bias']
    return y


def _layernorm(p: dict, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y.astype(x.dtype) * p['scale'] + p['bias']).astype(x.dtype)


def _rmsnorm(p: dict, x: jax.Array, eps: float = 1e-6) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    return (p['scale'] * y.astype(x.dtype)).astype(x.dtype)


def _norm(cfg: ModelConfig, p: dict, x: jax.Array) -> jax.Array:
    return _rmsnorm(p, x) if cfg.arch == 'llama' else _layernorm(p, x)


def _apply_rope_1(x: jax.Array, positions: jax.Array) -> jax.Array:
    """x [B, H, T, D] with per-batch positions [B, T]."""
    d = x.shape[-1]
    cos, sin = rope_cos_sin(positions.reshape(-1), d, dtype=jnp.float32)
    cos = cos.reshape(*positions.shape, d)[:, None]     # [B, 1, T, D]
    sin = sin.reshape(*positions.shape, d)[:, None]
    xf = x.astype(jnp.float32)
    x1, x2 = jnp.split(xf, 2, axis=-1)
    rot = jnp.concatenate([-x2, x1], axis=-1)
    return (cos * xf + sin * rot).astype(x.dtype)


def _ffn(cfg: ModelConfig, p: dict, x: jax.Array) -> jax.Array:
    act = jax.nn.relu if cfg.arch == 'opt' else jax.nn.silu
    lead = x.shape[:-1]
    xf = x.reshape(-1, cfg.d_model)
    if cfg.ffn == FFN_ROUTED:
        probs = jax.nn.sigmoid(_dense(p['router'], xf))
        n, bs = cfg.n_ffn_blocks, cfg.ffn_block_size
        if cfg.ffn_gated:
            view = lambda name: p[name]['kernel'].reshape(
                cfg.d_model, n, bs).transpose(1, 0, 2)
            y = rops.routed_ffn_gated_masked(
                xf, probs, cfg.ffn_top_k or max(1, n // 4),
                view('gate'), view('side'),
                p['down']['kernel'].reshape(n, bs, cfg.d_model), act)
        else:
            w1 = p['fc1']['kernel'].reshape(cfg.d_model, n, bs).transpose(
                1, 0, 2)
            b1 = p['fc1']['bias'].reshape(n, bs)
            w2 = p['fc2']['kernel'].reshape(n, bs, cfg.d_model)
            top_k = cfg.ffn_active_blocks
            if cfg.ffn_impl == 'gmm' and xf.shape[0] >= 128:
                y = rops.routed_ffn_gmm(xf, probs, top_k, w1, b1, w2,
                                        p['fc2']['bias'], act)
            else:
                y = rops.routed_ffn_masked(xf, probs, top_k, w1, b1, w2,
                                           p['fc2']['bias'], act)
    elif cfg.ffn_gated:
        y = _dense(p['down'],
                   act(_dense(p['gate'], xf)) * _dense(p['side'], xf))
    else:
        y = _dense(p['fc2'], act(_dense(p['fc1'], xf)))
    return y.reshape(*lead, cfg.d_model)


def _encode_codes(cfg: ModelConfig, quantizer: dict, x: jax.Array
                  ) -> jax.Array:
    """x [..., D] -> PQ codes [..., n_sub]."""
    return pq_ops.pq_encode(x, quantizer['codebook'], cfg.pq_metric)


# ---------------------------------------------------------------------------
# prefill
# ---------------------------------------------------------------------------

def prefill(iw: InferenceWeights, tokens: jax.Array,
            cache: KVCache) -> Tuple[jax.Array, KVCache]:
    """Teacher-forced pass over prompts; fills the cache and returns the
    full-sequence logits. tokens [B, S] (left-aligned, zero-padded to S —
    padding handled by the caller setting cache.length)."""
    cfg = iw.cfg
    p = iw.params
    b, s = tokens.shape
    h_tok = p['embedding']['embedding'][tokens]
    if cfg.arch == 'opt':
        pos = jnp.broadcast_to(jnp.arange(s)[None], (b, s))
        h_tok = h_tok + p['learned_pe']['embedding'][pos + PE_OFFSET]
    x = h_tok.astype(cfg.dtype)

    sparse = cfg.attention == ATTN_SPARSE_V2

    def layer(x, bp):
        hn = _norm(cfg, bp['norm1'], x)
        q = _dense(bp['mha']['q'], hn)
        k = _dense(bp['mha']['k'], hn)
        v = _dense(bp['mha']['v'], hn)
        q = q.reshape(b, s, cfg.n_heads, cfg.d_head).transpose(0, 2, 1, 3)
        kvh = lambda t: t.reshape(b, s, cfg.kv_heads, cfg.d_head).transpose(
            0, 2, 1, 3)                           # [B, KV, S, D]
        k, v = kvh(k), kvh(v)
        if cfg.arch == 'llama':
            pos = jnp.broadcast_to(jnp.arange(s)[None], (b, s))
            q = _apply_rope_1(q, pos)
            k = _apply_rope_1(k, pos)
        # cache keeps kv_heads; computation broadcasts per query group
        k_kv, v_kv = k, v
        if cfg.kv_groups > 1:
            k = jnp.repeat(k, cfg.kv_groups, axis=1)
            v = jnp.repeat(v, cfg.kv_groups, axis=1)
        scale = cfg.d_head ** -0.5
        if sparse:
            qz = q.reshape(b * cfg.n_heads, s, cfg.d_head)
            kz = k.reshape(b * cfg.n_heads, s, cfg.d_head)
            codes_q = _encode_codes(cfg, bp['mha']['quantizer'], qz)
            codes_k = _encode_codes(cfg, bp['mha']['quantizer'], kz)
            blk_k = 128
            blk_q = 256 if s % 256 == 0 else 128
            if s % blk_q == 0 and s >= 2 * blk_k:
                from spt_proto_tpu.ops.block_sparse import (
                    pq_tile_scores, select_tiles)
                ratio = blk_q // blk_k
                n_sel = max(ratio, (s // blk_k) // cfg.sparse_coeff)
                ts = pq_tile_scores(codes_q, codes_k,
                                    n_codewords=cfg.n_codewords,
                                    block_q=blk_q, block_k=blk_k)
                sel = select_tiles(ts, n_sel, block_ratio=ratio)
                if cfg.attn_impl == 'pallas':
                    from spt_proto_tpu.ops.pallas.block_sparse_attention \
                        import block_sparse_attention
                    o = block_sparse_attention(
                        qz, kz, v.reshape(qz.shape), sel,
                        block_q=blk_q, block_k=blk_k, scale=scale,
                        clamp=cfg.score_clamp)
                else:
                    from spt_proto_tpu.ops.block_sparse import (
                        block_sparse_attention_ref)
                    o = block_sparse_attention_ref(
                        qz, kz, v.reshape(qz.shape), sel, block_q=blk_q,
                        block_k=blk_k, scale=scale, clamp=cfg.score_clamp)
            else:
                from spt_proto_tpu.ops.lookup import pq_topk_indices
                from spt_proto_tpu.ops.sparse_attention import (
                    sparse_attention)
                idx = pq_topk_indices(
                    codes_q, codes_k,
                    top_k=max(1, s // cfg.sparse_coeff),
                    n_codewords=cfg.n_codewords)
                o = sparse_attention(qz, kz, v.reshape(qz.shape), idx,
                                     scale=scale, clamp=cfg.score_clamp)
            o = o.reshape(b, cfg.n_heads, s, cfg.d_head)
            k_codes_cache = _encode_codes(
                cfg, bp['mha']['quantizer'],
                k_kv.transpose(0, 1, 2, 3))       # [B, KV, S, n_sub]
        else:
            scores = jnp.einsum('bhid,bhjd->bhij', q, k,
                                preferred_element_type=jnp.float32) * scale
            causal = jnp.tril(jnp.ones((s, s), bool))
            scores = jnp.where(causal, scores, NEG_INF)
            probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
            o = jnp.einsum('bhij,bhjd->bhid', probs, v)
            k_codes_cache = jnp.zeros(
                (b, cfg.kv_heads, s, 1), jnp.int32)
        o = o.transpose(0, 2, 1, 3).reshape(b, s, cfg.d_model)
        x = x + _dense(bp['mha']['o'], o)
        x = x + _ffn(cfg, bp['ffn'], _norm(cfg, bp['norm2'], x))
        return x, (k_kv, v_kv, k_codes_cache)

    x, (ks, vs, codes) = jax.lax.scan(layer, x, p['blocks'])
    # write cache (prompt occupies positions [0, s))
    smax = cache.k.shape[3]
    cache = KVCache(
        k=jax.lax.dynamic_update_slice(
            cache.k, ks.astype(cache.k.dtype), (0, 0, 0, 0, 0)),
        v=jax.lax.dynamic_update_slice(
            cache.v, vs.astype(cache.v.dtype), (0, 0, 0, 0, 0)),
        codes=jax.lax.dynamic_update_slice(
            cache.codes, codes.astype(jnp.int32)[..., :cache.codes.shape[-1]],
            (0, 0, 0, 0, 0)),
        length=jnp.full_like(cache.length, s))
    x = _norm(cfg, p['final_norm'], x)
    logits = _dense(p['lm_head'], x)
    return logits, cache


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

def decode_step(iw: InferenceWeights, tokens: jax.Array,
                cache: KVCache) -> Tuple[jax.Array, KVCache]:
    """One token per active slot. tokens [B] int32; positions come from
    cache.length (per-slot). Returns (logits [B, V], new cache)."""
    cfg = iw.cfg
    p = iw.params
    b = tokens.shape[0]
    smax = cache.k.shape[3]
    pos = cache.length                                   # [B]
    h_tok = p['embedding']['embedding'][tokens][:, None]  # [B, 1, D]
    if cfg.arch == 'opt':
        h_tok = h_tok + p['learned_pe']['embedding'][pos + PE_OFFSET][:, None]
    x = h_tok.astype(cfg.dtype)

    sparse = cfg.attention == ATTN_SPARSE_V2
    scale = cfg.d_head ** -0.5

    def layer(carry, inp):
        x = carry
        bp, k_cache, v_cache, c_cache = inp
        hn = _norm(cfg, bp['norm1'], x)
        q = _dense(bp['mha']['q'], hn)
        k = _dense(bp['mha']['k'], hn)
        v = _dense(bp['mha']['v'], hn)
        q = q.reshape(b, 1, cfg.n_heads, cfg.d_head).transpose(0, 2, 1, 3)
        kvh = lambda t: t.reshape(b, 1, cfg.kv_heads, cfg.d_head).transpose(
            0, 2, 1, 3)                                  # [B, KV, 1, D]
        k, v = kvh(k), kvh(v)
        if cfg.arch == 'llama':
            q = _apply_rope_1(q, pos[:, None])
            k = _apply_rope_1(k, pos[:, None])
        # append to cache at per-slot positions. A one-hot masked update
        # streams the whole cache with perfect access patterns; the
        # equivalent scatter (.at[bidx, :, pos].set) lowers to a
        # gather/scatter that measured ~5x slower end-to-end.
        bidx = jnp.arange(b)
        onehot = (jnp.arange(smax)[None, :] == pos[:, None])  # [B, S]
        ksel = onehot[:, None, :, None]
        k_cache = jnp.where(ksel, k[:, :, 0:1, :].astype(k_cache.dtype),
                            k_cache)
        v_cache = jnp.where(ksel, v[:, :, 0:1, :].astype(v_cache.dtype),
                            v_cache)
        valid = (jnp.arange(smax)[None, None, :]
                 <= pos[:, None, None])                  # [B, 1, S]
        # GQA: cache stays at kv_heads; expand views for the attention math
        if cfg.kv_groups > 1:
            k_full = jnp.repeat(k_cache, cfg.kv_groups, axis=1)
            v_full = jnp.repeat(v_cache, cfg.kv_groups, axis=1)
            c_full = jnp.repeat(c_cache, cfg.kv_groups, axis=1)
        else:
            k_full, v_full, c_full = k_cache, v_cache, c_cache
        if sparse:
            qz = q[:, :, 0, :]                            # [B, H, D]
            codes_q = _encode_codes(cfg, bp['mha']['quantizer'], qz)
            codes_k = _encode_codes(cfg, bp['mha']['quantizer'],
                                    k[:, :, 0, :])
            c_cache = jnp.where(ksel, codes_k[:, :, None, :], c_cache)
            if cfg.kv_groups > 1:
                c_full = jnp.repeat(c_cache, cfg.kv_groups, axis=1)
            else:
                c_full = c_cache
            # O(S * n_sub) incremental match count per head
            match = jnp.sum(
                (c_full == codes_q[:, :, None, :]).astype(jnp.float32),
                axis=-1)                                  # [B, H, S]
            match = jnp.where(valid, match, -1.0)
            tile_sz = 128
            use_tiles = (cfg.sparse_decode == 'tiles'
                         and smax % tile_sz == 0 and smax >= 2 * tile_sz)
            if use_tiles:
                # tile-granular selection (the decode analog of the
                # block-sparse prefill): pool match scores per key tile,
                # top-k over n_tiles (tiny), gather contiguous tiles.
                # Avoids the full-row lax.top_k that dominates rows-mode.
                h_ = cfg.n_heads
                nt = smax // tile_sz
                tscore = match.reshape(b, h_, nt, tile_sz).mean(-1)
                t_start = jnp.arange(nt)[None, :] * tile_sz
                t_valid = t_start <= pos[:, None]          # [B, nt]
                tscore = jnp.where(t_valid[:, None, :], tscore, -jnp.inf)
                cur = (pos // tile_sz)[:, None]            # [B, 1]
                tscore = jnp.where(
                    (jnp.arange(nt)[None, :] == cur)[:, None, :],
                    jnp.inf, tscore)                       # force self tile
                nsel = min(nt, max(1, nt // cfg.sparse_coeff) + 1)
                tvals, tidx = jax.lax.top_k(tscore, nsel)  # [B, H, nsel]
                tile_ok = tvals > -jnp.inf
                kt = k_full.reshape(b, h_, nt, tile_sz, cfg.d_head)
                vt = v_full.reshape(b, h_, nt, tile_sz, cfg.d_head)
                safe = jnp.maximum(tidx, 0)
                kg = jnp.take_along_axis(
                    kt, safe[..., None, None], axis=2)     # [B,H,ns,ts,D]
                vg = jnp.take_along_axis(vt, safe[..., None, None], axis=2)
                cols = safe[..., None] * tile_sz + jnp.arange(tile_sz)
                ok = (cols <= pos[:, None, None, None]) & \
                    tile_ok[..., None]                     # [B,H,ns,ts]
                scores = jnp.einsum('bhd,bhstd->bhst', qz, kg,
                                    preferred_element_type=jnp.float32
                                    ) * scale
                scores = jnp.clip(scores, -cfg.score_clamp,
                                  cfg.score_clamp)
                scores = jnp.where(ok, scores, NEG_INF)
                flat = scores.reshape(b, h_, -1)
                probs = jax.nn.softmax(flat, axis=-1).reshape(scores.shape)
                probs = jnp.where(ok, probs, 0.0).astype(vg.dtype)
                o = jnp.einsum('bhst,bhstd->bhd', probs, vg)[:, :, None, :]
            else:
                top_k = max(1, smax // cfg.sparse_coeff)
                mvals, midx = jax.lax.top_k(match, top_k)  # [B, H, K]
                sel_valid = mvals >= 0.0
                kg = jnp.take_along_axis(k_full, midx[..., None], axis=2)
                vg = jnp.take_along_axis(v_full, midx[..., None], axis=2)
                scores = jnp.einsum('bhd,bhkd->bhk', qz, kg,
                                    preferred_element_type=jnp.float32
                                    ) * scale
                scores = jnp.clip(scores, -cfg.score_clamp,
                                  cfg.score_clamp)
                scores = jnp.where(sel_valid, scores, NEG_INF)
                probs = jax.nn.softmax(scores, axis=-1)
                probs = jnp.where(sel_valid, probs, 0.0).astype(vg.dtype)
                o = jnp.einsum('bhk,bhkd->bhd', probs, vg)[:, :, None, :]
        else:
            scores = jnp.einsum('bhqd,bhjd->bhqj', q, k_full,
                                preferred_element_type=jnp.float32) * scale
            scores = jnp.where(valid[:, :, None, :]
                               if valid.ndim == 3 else valid,
                               scores, NEG_INF)
            probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
            o = jnp.einsum('bhqj,bhjd->bhqd', probs, v_full)
        o = o.transpose(0, 2, 1, 3).reshape(b, 1, cfg.d_model)
        x = x + _dense(bp['mha']['o'], o)
        x = x + _ffn(cfg, bp['ffn'], _norm(cfg, bp['norm2'], x))
        return x, (k_cache, v_cache, c_cache)

    x, (k_new, v_new, c_new) = jax.lax.scan(
        layer, x, (p['blocks'], cache.k, cache.v, cache.codes))
    cache = KVCache(k=k_new, v=v_new, codes=c_new, length=cache.length + 1)
    x = _norm(cfg, p['final_norm'], x)
    logits = _dense(p['lm_head'], x[:, 0])
    return logits, cache


# ---------------------------------------------------------------------------
# sampling + generate
# ---------------------------------------------------------------------------

def sample(logits: jax.Array, rng: Optional[jax.Array] = None, *,
           temperature: float = 0.0, top_k: Optional[int] = None,
           top_p: Optional[float] = None) -> jax.Array:
    """Greedy (temperature 0) / temperature / top-k / nucleus sampling."""
    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits.astype(jnp.float32) / temperature
    if top_k is not None:
        kth = jnp.sort(logits, axis=-1)[..., -top_k][..., None]
        logits = jnp.where(logits >= kth, logits, NEG_INF)
    if top_p is not None:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        cutoff_idx = jnp.sum(cum < top_p, axis=-1, keepdims=True)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
        logits = jnp.where(logits >= cutoff, logits, NEG_INF)
    return jax.random.categorical(rng, logits, axis=-1).astype(jnp.int32)


def generate(iw: InferenceWeights, prompts: jax.Array, max_new_tokens: int,
             *, max_len: Optional[int] = None, temperature: float = 0.0,
             rng: Optional[jax.Array] = None,
             eos_id: Optional[int] = None) -> jax.Array:
    """Batch generate. prompts [B, S_prompt] -> [B, S_prompt + max_new]."""
    b, s0 = prompts.shape
    max_len = max_len or (s0 + max_new_tokens)
    cache = KVCache.create(iw.cfg, b, max_len, dtype=iw.cfg.dtype)
    prefill_fn = jax.jit(prefill)
    step_fn = jax.jit(decode_step)
    logits, cache = prefill_fn(iw, prompts, cache)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    out = [prompts]
    tok = sample(logits[:, -1], rng, temperature=temperature)
    done = jnp.zeros((b,), bool) if eos_id is not None else None
    for i in range(max_new_tokens):
        out.append(tok[:, None])
        if eos_id is not None:
            done = done | (tok == eos_id)
            if bool(done.all()):
                break
        if i == max_new_tokens - 1:
            break
        rng, sub = jax.random.split(rng)
        logits, cache = step_fn(iw, tok, cache)
        tok = sample(logits, sub, temperature=temperature)
    return jnp.concatenate(out, axis=1)
