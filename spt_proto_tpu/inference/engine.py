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


TILE = 128   # tokens per cache tile (the decode kernel's page size)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class KVCache:
    """Layer-folded tile-major KV cache.

    K/V live as [B, KV, L*NT, D, TILE]: tokens on the 128-lane minor axis
    (required for aligned HBM tile DMAs at d_head 64, and the natural MXU
    orientation for decode scores), tiles of layer l at [l*NT, (l+1)*NT).
    The fused decode kernel (ops/pallas/decode_attention.py) reads only
    the tiles its tables select and appends the new token's column in
    place. smax = NT * TILE; max_len rounds up to a tile multiple.
    """
    k: jax.Array       # [B, KV, L*NT, D, TILE] (int8 when quantized)
    v: jax.Array       # [B, KV, L*NT, D, TILE] (int8 when quantized)
    codes: jax.Array   # [B, KV, L*NT, n_sub, TILE] int32 (width 1 if dense)
    length: jax.Array  # [B] int32 — tokens currently in each slot
    # int8 mode (ROADMAP 8): per-TOKEN dequant scales; None = bf16 cache.
    # Tile-major-OUTER layout [B, L*NT, KV, TILE] so a layer's scale slab
    # [NT, KV, TILE] is one contiguous HBM burst for the decode kernel.
    k_scale: Optional[jax.Array] = None   # [B, L*NT, KV, TILE] f32
    v_scale: Optional[jax.Array] = None   # [B, L*NT, KV, TILE] f32

    # NOTE codes width: the CACHE stores code columns at code_width(cfg)
    # — cfg.n_subspaces rounded up past 8 to a multiple of 8 (int32
    # sublane tile), because a second-minor dim that STRADDLES a sublane
    # tile (e.g. OPT-2.7B's d_head 80 -> n_subspaces 10) faults Mosaic's
    # tile DMAs at runtime (TPU worker crash; also docs/PERF.md round-2
    # scale-slab note). Pad columns hold -2 and every match computation
    # slices [:n_subspaces], so semantics are unchanged.

    @staticmethod
    def create(cfg: ModelConfig, batch: int, max_len: int,
               dtype=jnp.bfloat16, quantized: bool = False) -> 'KVCache':
        l, h, d = cfg.n_layers, cfg.kv_heads, cfg.d_head
        n_sub = code_width(cfg)
        nt = -(-max_len // TILE)
        kv_dtype = jnp.int8 if quantized else dtype
        scales = dict()
        if quantized:
            hp = -(-h // 8) * 8   # sublane-tile pad (kernel DMA contract)
            scales = dict(
                k_scale=jnp.zeros((batch, l * nt, hp, TILE), jnp.float32),
                v_scale=jnp.zeros((batch, l * nt, hp, TILE), jnp.float32))
        return KVCache(
            k=jnp.zeros((batch, h, l * nt, d, TILE), kv_dtype),
            v=jnp.zeros((batch, h, l * nt, d, TILE), kv_dtype),
            codes=jnp.zeros((batch, h, l * nt, n_sub, TILE), jnp.int32),
            length=jnp.zeros((batch,), jnp.int32), **scales)

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    def tiles_per_layer(self, n_layers: int) -> int:
        return self.k.shape[2] // n_layers

    def smax(self, n_layers: int) -> int:
        return self.tiles_per_layer(n_layers) * TILE


# ---------------------------------------------------------------------------
# primitive helpers (mirror layers/ math bit-for-bit)
# ---------------------------------------------------------------------------

def code_width(cfg: ModelConfig) -> int:
    """Stored width of the PQ-code columns in the KV cache: 1 when dense;
    n_subspaces when it fits one int32 sublane tile (<= 8); else rounded
    up to a multiple of 8 (straddling widths fault Mosaic tile DMAs —
    see KVCache note)."""
    if cfg.attention != ATTN_SPARSE_V2:
        return 1
    n = cfg.n_subspaces
    return n if n <= 8 else -(-n // 8) * 8


def _fit_codes(codes: jax.Array, w: int) -> jax.Array:
    """Pad (with -2: never matches a real code) or slice the code dim to
    the cache's stored width."""
    n = codes.shape[-1]
    if n == w:
        return codes
    if n > w:
        return codes[..., :w]
    pad = [(0, 0)] * (codes.ndim - 1) + [(0, w - n)]
    return jnp.pad(codes, pad, constant_values=-2)


def _qkv_proj(mha: dict, x: jax.Array):
    """q/k/v projections: ONE fused [3, D, O] einsum when the weights
    carry the fused form (inference/weights.py — per-matmul dispatch
    overhead dominates at decode m=batch), else three matmuls."""
    if 'qkv' in mha:
        w = mha['qkv']
        kern = w['kernel']
        if isinstance(kern, dict):      # int8 fused [D, 3D], cols [q|k|v]
            from spt_proto_tpu.ops.pallas.int8_matmul import int8_matmul
            d3 = kern['scale'].shape[-1]
            y = int8_matmul(x, kern['q'], kern['scale'])[..., :d3]
            y = jnp.moveaxis(y.reshape(*x.shape[:-1], 3, d3 // 3), -2, 0)
        else:
            y = jnp.einsum('bsd,tdo->tbso', x, kern)
        if 'bias' in w:
            y = y + w['bias'][:, None, None, :]
        return y[0], y[1], y[2]
    return (_dense(mha['q'], x), _dense(mha['k'], x),
            _dense(mha['v'], x))


def _dense(p: dict, x: jax.Array) -> jax.Array:
    kernel = p['kernel']
    if isinstance(kernel, dict):        # int8 weight-only
        from spt_proto_tpu.ops.pallas.int8_matmul import int8_matmul
        # q is N-padded at quantization time; true width = scale width
        y = int8_matmul(x, kernel['q'],
                        kernel['scale'])[..., :kernel['scale'].shape[-1]]
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


def _apply_rope_1(x: jax.Array, positions: jax.Array,
                  base: float = 10000.0) -> jax.Array:
    """x [B, H, T, D] with per-batch positions [B, T]."""
    d = x.shape[-1]
    cos, sin = rope_cos_sin(positions.reshape(-1), d, base=base,
                            dtype=jnp.float32)
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
        use_gmm = cfg.ffn_impl == 'gmm' and xf.shape[0] >= 128
        lora = 'lora_left' in p['fc1' if not cfg.ffn_gated else 'gate']
        if cfg.ffn_gated:
            view = lambda name: p[name]['kernel'].reshape(
                cfg.d_model, n, bs).transpose(1, 0, 2)
            w_down = p['down']['kernel'].reshape(n, bs, cfg.d_model)
            if lora:
                # serve with the exact training semantics
                # (layers/feedforward.py RoutedGatedFeedforward d_lora path):
                # coeff = 2*prob on the base path, top n//2 blocks
                r = p['gate']['lora_right'].shape[-1]
                y = rops.routed_ffn_gated_lora(
                    xf, probs, cfg.ffn_top_k or max(1, n // 2),
                    view('gate'), view('side'), w_down,
                    p['gate']['lora_left'],
                    p['gate']['lora_right'].reshape(n, bs, r),
                    p['side']['lora_left'],
                    p['side']['lora_right'].reshape(n, bs, r),
                    p['down']['lora_left'].reshape(n, bs, r),
                    p['down']['lora_right'], act)
            else:
                y = rops.routed_ffn_gated_masked(
                    xf, probs, cfg.ffn_top_k or max(1, n // 4),
                    view('gate'), view('side'), w_down, act)
        else:
            w1 = p['fc1']['kernel'].reshape(cfg.d_model, n, bs).transpose(
                1, 0, 2)
            b1 = p['fc1']['bias'].reshape(n, bs)
            w2 = p['fc2']['kernel'].reshape(n, bs, cfg.d_model)
            top_k = cfg.ffn_active_blocks
            if lora:
                r = p['fc1']['lora_right'].shape[-1]
                fn = rops.routed_ffn_lora_gmm if use_gmm \
                    else rops.routed_ffn_lora
                y = fn(xf, probs, top_k, w1, b1, w2, p['fc2']['bias'],
                       p['fc1']['lora_left'],
                       p['fc1']['lora_right'].reshape(n, bs, r),
                       p['fc2']['lora_left'].reshape(n, bs, r),
                       p['fc2']['lora_right'], act)
            elif use_gmm:
                y = rops.routed_ffn_gmm(xf, probs, top_k, w1, b1, w2,
                                        p['fc2']['bias'], act)
            else:
                y = rops.routed_ffn_masked(xf, probs, top_k, w1, b1, w2,
                                           p['fc2']['bias'], act)
    else:
        names = ('gate', 'side', 'down') if cfg.ffn_gated else ('fc1',
                                                                'fc2')
        tp = None
        if cfg.tp_overlap and not any(
                isinstance(p[n]['kernel'], dict) for n in names):
            from spt_proto_tpu.parallel.overlap import current_tp_mesh
            tp = current_tp_mesh()
            if tp is not None and xf.shape[0] % tp[0].shape[tp[1]] != 0:
                tp = None       # ring needs M divisible by the axis
        if tp is not None:
            from spt_proto_tpu.parallel.overlap import (
                tp_ffn_overlapped_biased, tp_ffn_overlapped_gated)
            mesh_, ax = tp
            if cfg.ffn_gated:
                y = tp_ffn_overlapped_gated(
                    xf, p['gate']['kernel'], p['side']['kernel'],
                    p['down']['kernel'], mesh=mesh_, axis_name=ax, act=act)
            else:
                y = tp_ffn_overlapped_biased(
                    xf, p['fc1']['kernel'], p['fc1']['bias'],
                    p['fc2']['kernel'], p['fc2']['bias'], mesh=mesh_,
                    axis_name=ax, act=act)
        elif cfg.ffn_gated:
            y = _dense(p['down'],
                       act(_dense(p['gate'], xf)) * _dense(p['side'], xf))
        else:
            y = _dense(p['fc2'], act(_dense(p['fc1'], xf)))
    return y.reshape(*lead, cfg.d_model)


def _ffn_residual(cfg: ModelConfig, p: dict, pn: dict,
                  x: jax.Array) -> jax.Array:
    """x + ffn(norm2(x)), fused into one streaming Pallas kernel at
    skinny m (ops/pallas/ffn_tail.py) when eligible: dense FFN, fp
    kernels, <=256 rows, lane-aligned dims. Decode is dispatch-bound
    (docs/PERF.md round-3 decomposition) — this folds the 4-5-op tail
    into one dispatch with guaranteed weight-DMA/compute overlap."""
    xn = _norm(cfg, pn, x)
    names = ('gate', 'side', 'down') if cfg.ffn_gated else ('fc1', 'fc2')
    rows = 1
    for s in x.shape[:-1]:
        rows *= s
    quant = [isinstance(p[n]['kernel'], dict) for n in names]
    # auto (None): fuse only for int8-quantized weights (the fused
    # kernel is the only form that streams the halved bytes). For bf16
    # the tail measured round 4 (B=8 ctx 2048 int8-KV): +3% at 125M
    # with a rolled scan, but -14% under the auto full unroll that
    # dominates there (5,243 -> 4,338 tok/s), and -22% at 1.3B
    # (897 -> 700) where XLA's own fc1/fc2 fusions pipeline across
    # layer boundaries better than the serialized kernel — so bf16
    # auto is OFF; force with decode_fused_ffn=True.
    use_fused = cfg.decode_fused_ffn
    if use_fused is None:
        use_fused = all(quant)
    eligible = (
        use_fused and cfg.ffn != FFN_ROUTED and rows <= 256
        and cfg.d_model % 128 == 0 and cfg.d_feedforward % 128 == 0
        and (all(quant) or not any(quant)))
    if eligible and all(quant):
        # int8 fused variant streams true-d_ff tiles; needs a dividing
        # tile width (e.g. LLaMA-7B's 11008 = 43 x 256)
        from spt_proto_tpu.ops.pallas.ffn_tail import int8_tile
        eligible = int8_tile(cfg.d_feedforward) >= 128
    if not eligible:
        return x + _ffn(cfg, p, xn)
    from spt_proto_tpu.ops.pallas.ffn_tail import (ffn_tail,
                                                   ffn_tail_gated,
                                                   ffn_tail_gated_int8,
                                                   ffn_tail_int8)
    lead = x.shape[:-1]
    xf = x.reshape(-1, cfg.d_model)
    xnf = xn.reshape(-1, cfg.d_model)
    if cfg.ffn_gated:
        if all(quant):
            y = ffn_tail_gated_int8(xnf, xf, p['gate']['kernel'],
                                    p['side']['kernel'],
                                    p['down']['kernel'], act='silu')
        else:
            y = ffn_tail_gated(xnf, xf, p['gate']['kernel'],
                               p['side']['kernel'], p['down']['kernel'],
                               act='silu')
    elif all(quant):
        y = ffn_tail_int8(xnf, xf, p['fc1']['kernel'], p['fc1']['bias'],
                          p['fc2']['kernel'], p['fc2']['bias'],
                          act='relu')
    else:
        y = ffn_tail(xnf, xf, p['fc1']['kernel'], p['fc1']['bias'],
                     p['fc2']['kernel'], p['fc2']['bias'], act='relu')
    return y.reshape(*lead, cfg.d_model)


def _decode_unroll(cfg: ModelConfig, l: int) -> int:
    """Resolve decode_scan_unroll. 0 = auto: fully unroll the layer scan
    for the SPARSE serving config in the dispatch-bound small-model
    regime (XLA software-pipelines layer i+1's weight prefetch under
    layer i's math; measured +7% at 125M) but keep the rolled scan at
    flagship scale where the step is weight-streaming-bound (measured
    -42% at 1.3B with unroll=4). Dense decode stays rolled even when
    small: its many-tile grouped-DMA kernel makes the unrolled program
    pathological to compile (~17 min through the tunnel) for a
    within-drift +1.6% — force with decode_scan_unroll=n_layers if the
    compile cost is acceptable."""
    u = cfg.decode_scan_unroll
    if u == 0:
        u = l if (cfg.d_model <= 1024
                  and cfg.attention == ATTN_SPARSE_V2) else 1
    return min(u, l)


def _encode_codes(cfg: ModelConfig, quantizer: dict, x: jax.Array,
                  bd: Optional[dict] = None) -> jax.Array:
    """x [..., D] -> PQ codes [..., n_sub].

    When the block-diagonal encode matrices are supplied (bd = {'bd',
    'cbn'}, from inference/weights.py::_attach_pq_bd), the l2 encode
    runs as ONE [., d_head] @ [d_head, ns*nc] dot — the same shape the
    fused decode-front kernel computes — so fused and unfused decode
    paths produce bit-identical codes (the per-subspace einsum's
    different accumulation order can flip argmin near-ties at bf16)."""
    if bd is not None and cfg.pq_metric == 'l2':
        ns = cfg.n_subspaces
        nc = bd['bd'].shape[-1] // ns
        dots = jnp.einsum('...d,dc->...c', x.astype(jnp.float32),
                          bd['bd'], preferred_element_type=jnp.float32)
        score = (bd['cbn'] - 2.0 * dots).reshape(*x.shape[:-1], ns, nc)
        return jnp.argmin(score, axis=-1).astype(jnp.int32)
    return pq_ops.pq_encode(x, quantizer['codebook'], cfg.pq_metric)


def _bd_of(mha: dict) -> Optional[dict]:
    """Block-diag encode matrices when the weight build attached them."""
    if 'quantizer_bd' in mha:
        return {'bd': mha['quantizer_bd'], 'cbn': mha['quantizer_cbn']}
    return None


def _quantize_kv(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-token int8: x [..., D] -> (int8 [..., D], scale [...]).

    One f32 scale per token per head (max-abs / 127) — the finest
    granularity that never needs requantizing previously written tokens
    when a new outlier arrives (per-tile scales would)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    s = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s[..., None]),
                 -127, 127).astype(jnp.int8)
    return q, s


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
        q, k, v = _qkv_proj(bp['mha'], hn)
        q = q.reshape(b, s, cfg.n_heads, cfg.d_head).transpose(0, 2, 1, 3)
        kvh = lambda t: t.reshape(b, s, cfg.kv_heads, cfg.d_head).transpose(
            0, 2, 1, 3)                           # [B, KV, S, D]
        k, v = kvh(k), kvh(v)
        if cfg.arch == 'llama':
            pos = jnp.broadcast_to(jnp.arange(s)[None], (b, s))
            q = _apply_rope_1(q, pos, cfg.rope_base)
            k = _apply_rope_1(k, pos, cfg.rope_base)
        # cache keeps kv_heads; computation broadcasts per query group
        k_kv, v_kv = k, v
        if cfg.kv_groups > 1:
            k = jnp.repeat(k, cfg.kv_groups, axis=1)
            v = jnp.repeat(v, cfg.kv_groups, axis=1)
        scale = cfg.d_head ** -0.5
        if sparse:
            qz = q.reshape(b * cfg.n_heads, s, cfg.d_head)
            kz = k.reshape(b * cfg.n_heads, s, cfg.d_head)
            bd_m = _bd_of(bp['mha'])
            codes_q = _encode_codes(cfg, bp['mha']['quantizer'], qz,
                                    bd=bd_m)
            codes_k = _encode_codes(cfg, bp['mha']['quantizer'], kz,
                                    bd=bd_m)
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
                if s > 1024:
                    import warnings
                    warnings.warn(
                        f'sparse prefill at S={s} (not a tile multiple) '
                        f'falls back to the O(S^2) per-row oracle — pad '
                        f'prompts to a multiple of {blk_q}', stacklevel=2)
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
                k_kv.transpose(0, 1, 2, 3), bd=bd_m)       # [B, KV, S, n_sub]
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
    # write the cache tile-major: [L, B, KV, S, .] -> [B, KV, L, NTm, ., T]
    l = cfg.n_layers
    nt = cache.tiles_per_layer(l)
    nt_m = -(-s // TILE)

    def to_tiles(x_std, width):
        pad = nt_m * TILE - s
        xp = jnp.pad(x_std, ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0)))
        xp = xp.reshape(l, b, cfg.kv_heads, nt_m, TILE, width)
        return xp.transpose(1, 2, 0, 3, 5, 4)   # [B,KV,L,NTm,w,T]

    def splice(big, tiles):
        view = big.reshape(b, cfg.kv_heads, l, nt, *big.shape[3:])
        view = jax.lax.dynamic_update_slice(
            view, tiles.astype(big.dtype), (0, 0, 0, 0, 0, 0))
        return view.reshape(big.shape)

    codes = _fit_codes(codes.astype(jnp.int32), cache.codes.shape[3])
    scales = dict()
    if cache.quantized:
        ks, ksc = _quantize_kv(ks)         # [L,B,KV,S,D] -> + [L,B,KV,S]
        vs, vsc = _quantize_kv(vs)

        def sc_tiles(x_std):               # [L,B,KV,S] -> [B,L,NTm,KV,T]
            pad = nt_m * TILE - s
            xp = jnp.pad(x_std, ((0, 0), (0, 0), (0, 0), (0, pad)))
            xp = xp.reshape(l, b, cfg.kv_heads, nt_m, TILE)
            return xp.transpose(1, 0, 3, 2, 4)

        def sc_splice(big, tiles):         # big [B, L*NT, KV_pad, T]
            hp = big.shape[2]
            view = big.reshape(b, l, nt, hp, TILE)
            view = jax.lax.dynamic_update_slice(
                view, tiles.astype(big.dtype), (0, 0, 0, 0, 0))
            return view.reshape(big.shape)

        scales = dict(
            k_scale=sc_splice(cache.k_scale, sc_tiles(ksc)),
            v_scale=sc_splice(cache.v_scale, sc_tiles(vsc)))
    cache = KVCache(
        k=splice(cache.k, to_tiles(ks, cfg.d_head)),
        v=splice(cache.v, to_tiles(vs, cfg.d_head)),
        codes=splice(cache.codes, to_tiles(codes, cache.codes.shape[3])),
        length=jnp.full_like(cache.length, s), **scales)
    x = _norm(cfg, p['final_norm'], x)
    logits = _dense(p['lm_head'], x)
    return logits, cache


def prefill_chunk_past(iw: InferenceWeights, cache: KVCache,
                       slot: jax.Array, offset: int):
    """Read (and dequantize) a slot's cached context [0, offset) for
    chunked prefill: token-major [L, 1, KV, offset, D] K/V plus codes.

    Split out of prefill_chunk so the engine can run it as its OWN jit
    dispatch: the compute/write half then never READS the cache, which
    lets XLA actually alias the donated cache buffers in place (reading
    and writing the same donated input in one program made the donation
    unusable — a cache-sized defensive copy per chunk)."""
    cfg = iw.cfg
    l = cfg.n_layers
    kv = cfg.kv_heads
    nt = cache.tiles_per_layer(l)
    t0 = offset // TILE
    t0s = max(t0, 1)

    def slot_past(big):
        row = jax.lax.dynamic_slice(
            big, (slot, 0, 0, 0, 0), (1, kv, l * nt, big.shape[3], TILE))
        per_layer = row.reshape(1, kv, l, nt, big.shape[3], TILE
                                )[:, :, :, :t0s]
        # token-major [L, 1, KV, t0s*T, w] -> clipped to the true offset
        tok = per_layer.transpose(2, 0, 1, 3, 5, 4).reshape(
            l, 1, kv, t0s * TILE, big.shape[3])
        return tok[:, :, :, :offset]

    if cache.quantized:
        # dequantize the past ONCE here; attention over
        # [dequantized past + exact chunk] mirrors decode
        hp = cache.k_scale.shape[2]

        def slot_past_sc(big):             # [B, L*NT, hp, T]
            row = jax.lax.dynamic_slice(
                big, (slot, 0, 0, 0), (1, l * nt, hp, TILE))
            per_layer = row.reshape(1, l, nt, hp, TILE)[:, :, :t0s]
            tok = per_layer.transpose(1, 0, 3, 2, 4).reshape(
                l, 1, hp, t0s * TILE)
            return tok[:, :, :kv, :offset]               # [L,1,KV,off]

        ksc_past = slot_past_sc(cache.k_scale)
        vsc_past = slot_past_sc(cache.v_scale)
        past_k = (slot_past(cache.k).astype(jnp.float32)
                  * ksc_past[..., None]).astype(cfg.dtype)
        past_v = (slot_past(cache.v).astype(jnp.float32)
                  * vsc_past[..., None]).astype(cfg.dtype)
    else:
        past_k, past_v = slot_past(cache.k), slot_past(cache.v)
    return past_k, past_v, slot_past(cache.codes)


def prefill_chunk(iw: InferenceWeights, tokens: jax.Array, cache: KVCache,
                  slot: jax.Array, offset: int
                  ) -> Tuple[jax.Array, KVCache]:
    """Chunked prefill: process tokens [1, C] of one batch slot at positions
    [offset, offset + C), attending over the slot's already-cached context
    [0, offset) plus causal self-attention within the chunk. Appends the
    chunk's K/V (+PQ codes) to the slot's cache tiles and returns the chunk
    logits [1, C, V].

    Continuous batching uses this to split long prompts across engine steps
    so a single admission cannot stall the decode batch (vLLM-style chunked
    prefill; no reference counterpart — the reference has no serving path,
    SURVEY §0). Constraints: C and offset must be multiples of TILE so the
    chunk lands on whole cache tiles; `offset` is static (one jit
    specialization per chunk boundary — bounded by max_len / chunk).

    The engine runs the two halves (prefill_chunk_past above, then this
    compute/write half with `past` supplied) as separate jit dispatches so
    the cache donation aliases cleanly; this composite exists for one-shot
    callers and tests.

    Dense configs are bit-equivalent to one-shot prefill() up to bf16
    accumulation order. Sparse configs run the per-row PQ top-k oracle over
    [past + chunk] with top_k = (offset + C) // sparse_coeff — the same
    selection contract as the non-tile-aligned prefill path; the tile
    pattern may differ from the one-shot block-sparse kernel's.
    """
    past = prefill_chunk_past(iw, cache, slot, offset)
    return prefill_chunk_compute(iw, tokens, cache, past, slot, offset)


def prefill_chunk_compute(iw: InferenceWeights, tokens: jax.Array,
                          cache: KVCache, past, slot: jax.Array,
                          offset: int) -> Tuple[jax.Array, KVCache]:
    """Compute/write half of chunked prefill (see prefill_chunk). Never
    reads `cache` — only scatters the chunk's tiles into it — so a jit
    with donate on `cache` updates it truly in place."""
    cfg = iw.cfg
    p = iw.params
    b, c = tokens.shape
    assert b == 1, 'prefill_chunk serves one slot at a time'
    assert c % TILE == 0 and offset % TILE == 0, \
        f'chunk ({c}) and offset ({offset}) must be multiples of {TILE}'
    l = cfg.n_layers
    nt = cache.tiles_per_layer(l)
    nt_c = c // TILE
    t0 = offset // TILE
    pos = offset + jnp.arange(c)[None]                    # [1, C]
    h_tok = p['embedding']['embedding'][tokens]
    if cfg.arch == 'opt':
        h_tok = h_tok + p['learned_pe']['embedding'][pos + PE_OFFSET]
    x = h_tok.astype(cfg.dtype)

    sparse = cfg.attention == ATTN_SPARSE_V2
    scale = cfg.d_head ** -0.5
    kv, g = cfg.kv_heads, cfg.kv_groups
    s_tot = offset + c
    k_sel = max(1, s_tot // cfg.sparse_coeff) if sparse else 0
    past_k, past_v, past_c = past

    def layer(carry, inp):
        x, kc, vc, cc, ksc, vsc = carry
        bp, lix, k_past, v_past, c_past0 = inp
        hn = _norm(cfg, bp['norm1'], x)
        q, k, v = _qkv_proj(bp['mha'], hn)
        q = q.reshape(b, c, cfg.n_heads, cfg.d_head).transpose(0, 2, 1, 3)
        kvh = lambda t: t.reshape(b, c, kv, cfg.d_head).transpose(0, 2, 1, 3)
        k_new, v_new = kvh(k), kvh(v)                      # [1, KV, C, D]
        if cfg.arch == 'llama':
            q = _apply_rope_1(q, jnp.broadcast_to(pos, (b, c)),
                              cfg.rope_base)
            k_new = _apply_rope_1(k_new, jnp.broadcast_to(pos, (b, c)),
                                  cfg.rope_base)
        k_all = jnp.concatenate([k_past.astype(k_new.dtype), k_new], axis=2)
        v_all = jnp.concatenate([v_past.astype(v_new.dtype), v_new], axis=2)
        if g > 1:
            k_full = jnp.repeat(k_all, g, axis=1)
            v_full = jnp.repeat(v_all, g, axis=1)
        else:
            k_full, v_full = k_all, v_all
        scores = jnp.einsum('bhid,bhjd->bhij', q, k_full,
                            preferred_element_type=jnp.float32) * scale
        row = offset + jnp.arange(c)[:, None]
        col = jnp.arange(s_tot)[None, :]
        causal = col <= row                               # [C, S_tot]
        if sparse:
            qz = q.reshape(cfg.n_heads, c, cfg.d_head)
            bd_m = _bd_of(bp['mha'])
            codes_q = _encode_codes(cfg, bp['mha']['quantizer'], qz,
                                    bd=bd_m)
            c_new = _encode_codes(
                cfg, bp['mha']['quantizer'],
                k_new.reshape(kv, c, cfg.d_head),
                bd=bd_m)                                   # [KV, C, n_sub]
            # past codes arrive at the STORED width (maybe padded,
            # KVCache note); match over the true subspaces only
            codes_k = jnp.concatenate(
                [c_past0[0][..., :cfg.n_subspaces], c_new], axis=1)
            codes_k = jnp.repeat(codes_k, g, axis=0)       # [H, S, n_sub]
            from spt_proto_tpu.ops.lookup import pq_match_scores
            match = pq_match_scores(codes_q, codes_k, cfg.n_codewords)
            match = jnp.where(causal[None], match, -1.0)   # [H, C, S_tot]
            kth = jnp.sort(match, axis=-1)[..., -k_sel][..., None]
            keep = causal[None] & (match >= jnp.maximum(kth, 0.0))
            scores = jnp.clip(scores, -cfg.score_clamp, cfg.score_clamp)
            scores = jnp.where(keep[None], scores, NEG_INF)
        else:
            c_new = jnp.zeros((kv, c, cc.shape[3]), jnp.int32)
            scores = jnp.where(causal[None, None], scores, NEG_INF)
        scores = scores - jnp.max(scores, axis=-1, keepdims=True)
        probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
        o = jnp.einsum('bhij,bhjd->bhid', probs, v_full)
        o = o.transpose(0, 2, 1, 3).reshape(b, c, cfg.d_model)
        x = x + _dense(bp['mha']['o'], o)
        x = _ffn_residual(cfg, bp['ffn'], bp['norm2'], x)

        # append the chunk's tiles in place at [offset, offset + C)
        def write(big, chunk):
            tiles = chunk.reshape(1, kv, nt_c, TILE, chunk.shape[-1]
                                  ).transpose(0, 1, 2, 4, 3)
            return jax.lax.dynamic_update_slice(
                big, tiles.astype(big.dtype), (slot, 0, lix * nt + t0, 0, 0))
        if cache.quantized:
            k_w, ksc_w = _quantize_kv(k_new)   # [1,KV,C,D] + [1,KV,C]
            v_w, vsc_w = _quantize_kv(v_new)

            def write_sc(big, sc):             # big [B, L*NT, hp, T]
                tiles = sc.reshape(1, kv, nt_c, TILE).transpose(0, 2, 1, 3)
                return jax.lax.dynamic_update_slice(
                    big, tiles.astype(big.dtype),
                    (slot, lix * nt + t0, 0, 0))
            ksc = write_sc(ksc, ksc_w)
            vsc = write_sc(vsc, vsc_w)
        else:
            k_w, v_w = k_new, v_new
        kc = write(kc, k_w)
        vc = write(vc, v_w)
        cc = write(cc, _fit_codes(c_new, cc.shape[3])[None]
                   .astype(jnp.int32))
        return (x, kc, vc, cc, ksc, vsc), None

    (x, kc, vc, cc, ksc, vsc), _ = jax.lax.scan(
        layer, (x, cache.k, cache.v, cache.codes,
                cache.k_scale, cache.v_scale),
        (p['blocks'], jnp.arange(l), past_k, past_v, past_c))
    new_len = jax.lax.dynamic_update_slice(
        cache.length, jnp.array([s_tot], jnp.int32), (slot,))
    cache = KVCache(k=kc, v=vc, codes=cc, length=new_len,
                    k_scale=ksc, v_scale=vsc)
    x = _norm(cfg, p['final_norm'], x)
    logits = _dense(p['lm_head'], x)
    return logits, cache


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

def decode_step(iw: InferenceWeights, tokens: jax.Array,
                cache: KVCache) -> Tuple[jax.Array, KVCache]:
    """One token per active slot -> (logits [B, V], new cache)."""
    x, cache = _decode_hidden(iw, tokens, cache)
    return _dense(iw.params['lm_head'], x), cache


def _decode_hidden(iw: InferenceWeights, tokens: jax.Array,
                   cache: KVCache) -> Tuple[jax.Array, KVCache]:
    """One token per active slot. tokens [B] int32; positions come from
    cache.length (per-slot). Returns (logits [B, V], new cache).

    Round-2 design: every mode runs through the fused tile-table decode
    kernel (ops/pallas/decode_attention.py; interpret mode off-TPU).
    Per layer, the step computes the new token's Q/K/V (+PQ codes),
    builds per-(slot, kv-head) tile tables — every tile up to the cursor
    for dense, the top PQ-match tiles (+ the current tile) for sparse —
    and the kernel streams ONLY those tiles, appending the new column in
    place (the cache is the scan carry and the jit caller donates it, so
    there is no per-step cache copy at all). Per-step cost therefore
    tracks the actual context and the configured sparsity, not max_len.

    GQA note: sparse tile selection is per KV head (group-pooled match
    scores) — the kernel packs each kv head's tiles once for its G query
    rows. The reference selects per query row (sparse/attention.py), but
    it has no GQA at all; this is the TPU-native trade.
    """
    from spt_proto_tpu.ops.pallas.decode_attention import (
        decode_attention_rows, decode_attention_rows_ms,
        decode_attention_rows_q, decode_attention_rows_q_ms)
    cfg = iw.cfg
    p = iw.params
    quantized = cache.quantized
    b = tokens.shape[0]
    l = cfg.n_layers
    nt = cache.tiles_per_layer(l)
    pos = cache.length                                   # [B]
    h_tok = p['embedding']['embedding'][tokens][:, None]  # [B, 1, D]
    if cfg.arch == 'opt':
        h_tok = h_tok + p['learned_pe']['embedding'][pos + PE_OFFSET][:, None]
    x = h_tok.astype(cfg.dtype)

    sparse = cfg.attention == ATTN_SPARSE_V2
    scale = cfg.d_head ** -0.5
    kv, g = cfg.kv_heads, cfg.kv_groups
    # multi-slot kernel envelope: at flagship shapes outside it (e.g.
    # OPT-2.7B: d_head 80, 32 KV heads, n_sub 10) the ms kernel faults
    # the TPU worker non-deterministically in the decode_step context —
    # the same call in isolation passes, which points at a DMA-timing
    # race the whole-step schedule exposes. Until root-caused, ms runs
    # only inside the envelope it has been soak-tested in (OPT-125M-
    # class: d_head 64/128, <=16 KV heads, <=8 PQ subspaces); the grid
    # kernel (proven at 2.7B shapes) serves everything else.
    ms_envelope = cfg.d_head in (64, 128) and kv <= 16 \
        and (cfg.attention != ATTN_SPARSE_V2 or cfg.n_subspaces <= 8)
    cur = pos // TILE                                     # [B]
    # dense tables cover [0, cur] in tps-wide supertiles (fat DMAs)
    tps_d = 4 if nt % 4 == 0 and nt >= 8 else 1
    n_sup_max = -(-nt // tps_d)
    if sparse:
        nsel = min(nt, max(1, nt // cfg.sparse_coeff) + 1)
    # fused front kernel (norm1 + QKV (+RoPE) + PQ encode + tile selection
    # (+ int8 KV quantize) in one dispatch, ops/pallas/decode_front.py).
    # v2 streams weights and the code slab from HBM, so the envelope is
    # the flagship serving family itself: sparse_v2, l2 metric, per-head
    # selection, fp weights (int8-weight serving keeps the XLA front for
    # now), OPT or LLaMA, MHA or GQA, any context length.
    use_front = False
    front_w = None
    mha_p = p['blocks']['mha']
    if sparse and cfg.decode_fused_front \
            and cfg.sparse_select_heads == 1 \
            and cfg.pq_metric == 'l2' \
            and cfg.d_model % 128 == 0 \
            and 'quantizer_bd' in mha_p:
        if 'qkv' in mha_p:
            use_front = True
            front_w = 'packed_int8' if isinstance(
                mha_p['qkv']['kernel'], dict) else 'stack'
        elif 'q' in mha_p:
            use_front = True
            front_w = 'triple_int8' if isinstance(
                mha_p['q']['kernel'], dict) else 'triple'
    cos_b = sin_b = None
    if use_front and cfg.arch == 'llama':
        # RoPE tables at each slot's position, hoisted out of the layer
        # scan (shared by every layer's front kernel call)
        cos_b, sin_b = rope_cos_sin(pos, cfg.d_head, base=cfg.rope_base,
                                    dtype=jnp.float32)

    def _attend(carry, bp, lix, q4, k_new, v_new, c_new, tables,
                n_tiles, tps, clamp, kv_quant=None):
        """Shared decode tail: fused attention kernel dispatch + o-proj +
        FFN residual. `tables` are PHYSICAL tile ids (-1 = unused).
        kv_quant: pre-quantized (k8, ks, v8, vs) from the fused front
        (skips the per-layer _quantize_kv ops)."""
        x, kc, vc, cc, ksc, vsc = carry
        base = jnp.full((b,), lix * nt, jnp.int32)
        if quantized:
            if kv_quant is not None:
                k8, ks_new, v8, vs_new = kv_quant
            else:
                k8, ks_new = _quantize_kv(k_new)      # [B,KV,D] + [B,KV]
                v8, vs_new = _quantize_kv(v_new)
            kv_pad = ksc.shape[2]
            stage_mb = 2 * (kv * tables.shape[2] * tps * TILE * 2
                            * cfg.d_head
                            + kv_pad * nt * TILE * 2 * 4) / 2**20
            # unroll cap: the ms kernel unrolls b*kv*t_max DMA pairs —
            # past ~768 the Mosaic compile time outgrows the win; at 768
            # (e.g. 8 slots x 32 kv heads x 3 tiles) the unrolled scalar
            # code also overflows the 1 MB SMEM - cap at 512
            unroll = b * kv * tables.shape[2]
            use_ms = cfg.decode_multislot and ms_envelope \
                and stage_mb < 11 and unroll <= 512
            if use_ms and tables.shape[1] != kv:
                # the ms twin still takes per-head tables; the grid
                # kernel handles grouped tables natively (sel_group)
                tables = jnp.repeat(tables, kv // tables.shape[1], axis=1)
            fn = decode_attention_rows_q_ms if use_ms \
                else decode_attention_rows_q
            o, kc, vc, cc, ksc, vsc = fn(
                q4, kc, vc, cc, ksc, vsc, tables.astype(jnp.int32),
                n_tiles, pos, k8, v8, c_new.astype(jnp.int32),
                ks_new, vs_new, base,
                ps=TILE, tps=tps, scale=scale, clamp=clamp, nt_layer=nt)
        else:
            # multi-slot kernel when the doubled staging fits VMEM
            # (cfg.decode_multislot; amortizes the per-slot kernel-entry
            # floor — docs/PERF.md round 2)
            stage_mb = (2 * 2 * kv * tables.shape[2] * tps * TILE
                        * cfg.d_head * kc.dtype.itemsize) / 2**20
            # unroll cap: see the quantized branch
            unroll = b * kv * tables.shape[2]
            fn = decode_attention_rows_ms \
                if cfg.decode_multislot and ms_envelope \
                and stage_mb < 11 and unroll <= 512 \
                else decode_attention_rows
            o, kc, vc, cc = fn(
                q4, kc, vc, cc, tables.astype(jnp.int32), n_tiles, pos,
                k_new, v_new, c_new.astype(jnp.int32), base,
                ps=TILE, tps=tps, scale=scale, clamp=clamp)
        o = o.reshape(b, 1, cfg.d_model)
        x = x + _dense(bp['mha']['o'], o)
        x = _ffn_residual(cfg, bp['ffn'], bp['norm2'], x)
        return (x, kc, vc, cc, ksc, vsc), None

    def layer(carry, inp):
        x, kc, vc, cc, ksc, vsc = carry
        bp, lix = inp
        if use_front:
            from spt_proto_tpu.ops.pallas.decode_front import decode_front
            bmha = bp['mha']
            if front_w in ('stack', 'packed_int8'):
                w_in = bmha['qkv']['kernel']
                b_in = bmha['qkv'].get('bias')
            else:
                w_in = (bmha['q']['kernel'], bmha['k']['kernel'],
                        bmha['v']['kernel'])
                b_in = None
                if 'bias' in bmha['q']:     # GQA+bias: ragged part stack
                    b_in = [bmha['q']['bias'], bmha['k']['bias'],
                            bmha['v']['bias']]
                    wmax = max(t.shape[-1] for t in b_in)
                    b_in = jnp.stack([
                        jnp.pad(t, (0, wmax - t.shape[-1])) for t in b_in])
            out = decode_front(
                x[:, 0], bp['norm1']['scale'],
                bp['norm1'].get('bias'), w_in, b_in,
                bmha['quantizer_bd'], bmha['quantizer_cbn'],
                cc, pos, jnp.full((1,), lix * nt, jnp.int32),
                cos_b, sin_b, nt=nt, nsel=nsel, n_sub=cfg.n_subspaces,
                ps=TILE, eps=1e-6 if cfg.arch == 'llama' else 1e-5,
                arch=cfg.arch, quantized=quantized)
            qf, kf, vf, c_new, tables = out[:5]
            q4 = qf.reshape(b, kv, g, cfg.d_head)
            k_new = kf.reshape(b, kv, cfg.d_head)
            v_new = vf.reshape(b, kv, cfg.d_head)
            kvq = None
            if quantized:
                k8, v8, ksn, vsn = out[5:]
                kvq = (k8.reshape(b, kv, cfg.d_head), ksn,
                       v8.reshape(b, kv, cfg.d_head), vsn)
            n_tiles = jnp.full((b,), nsel, jnp.int32)
            return _attend(carry, bp, lix, q4, k_new, v_new, c_new,
                           tables, n_tiles, tps=1,
                           clamp=cfg.score_clamp, kv_quant=kvq)
        hn = _norm(cfg, bp['norm1'], x)
        q, k, v = _qkv_proj(bp['mha'], hn)
        q4 = q.reshape(b, kv, g, cfg.d_head)              # [B, KV, G, D]
        k_new = k.reshape(b, kv, cfg.d_head)
        v_new = v.reshape(b, kv, cfg.d_head)
        if cfg.arch == 'llama':
            q4 = _apply_rope_1(q4.reshape(b, kv * g, 1, cfg.d_head),
                               pos[:, None], cfg.rope_base
                               ).reshape(b, kv, g, cfg.d_head)
            k_new = _apply_rope_1(k_new[:, :, None], pos[:, None],
                                  cfg.rope_base)[:, :, 0]
        if sparse:
            bd_m = _bd_of(bp['mha'])
            codes_q = _encode_codes(cfg, bp['mha']['quantizer'],
                                    q4.reshape(b, kv * g, cfg.d_head),
                                    bd=bd_m)
            codes_q = codes_q.reshape(b, kv, g, -1)
            c_new = _fit_codes(
                _encode_codes(cfg, bp['mha']['quantizer'], k_new,
                              bd=bd_m),
                cc.shape[3])
            # per-layer code tiles [B, KV, NT, w, T]; match over the TRUE
            # subspaces only (stored width may be padded, KVCache note)
            c_l = jax.lax.dynamic_slice(
                cc, (0, 0, lix * nt, 0, 0),
                (b, kv, nt, cc.shape[3], TILE))[:, :, :, :cfg.n_subspaces]
            match = jnp.sum(
                (c_l[:, :, None] == codes_q[:, :, :, None, :, None]
                 ).astype(jnp.float32), axis=4)            # [B,KV,G,NT,T]
            # group-pooled tile scores over FULL tiles only (< cur);
            # the current (partial) tile is always appended last
            tscore = match.mean(axis=(2, 4))               # [B, KV, NT]
            # grouped selection: sparse_select_heads consecutive kv heads
            # share one tile table => the kernel fetches each tile with
            # ONE grouped DMA (the per-tile DMA issue count is the decode
            # floor; see _rows_kernel sel_group). 1 = reference-faithful
            # per-head selection.
            gsel = cfg.sparse_select_heads
            if gsel > 1:
                tscore = tscore.reshape(b, kv // gsel, gsel, nt).mean(2)
            n_tab = kv // gsel
            full_t = jnp.arange(nt)[None, :] < cur[:, None]
            tscore = jnp.where(full_t[:, None, :], tscore, -jnp.inf)
            svals, sidx = jax.lax.top_k(tscore, nsel - 1)
            s_ok = svals > -jnp.inf
            rel = jnp.where(s_ok, sidx, -1)
            tables = jnp.concatenate(
                [rel, jnp.broadcast_to(cur[:, None, None],
                                       (b, n_tab, 1))], axis=-1)
            n_tiles = jnp.full((b,), nsel, jnp.int32)
            tps = 1
            clamp = cfg.score_clamp
        else:
            c_new = jnp.zeros((b, kv, cc.shape[3]), jnp.int32)
            e = jnp.arange(n_sup_max, dtype=jnp.int32)
            n_sup = cur // tps_d + 1                       # [B]
            rel = jnp.where(e[None] < n_sup[:, None], e * tps_d, -1)
            # contract: entry n_tiles-1 must contain pos — true since
            # entry n_sup-1 covers [(n_sup-1)*tps, n_sup*tps). ONE table
            # row: dense tables are identical across heads, so the kernel
            # always fetches them with fully grouped DMAs (sel_group=kv)
            tables = rel[:, None, :]                       # [B, 1, n_sup]
            n_tiles = n_sup
            tps = tps_d
            clamp = 0.0
        tables = jnp.where(tables < 0, -1, tables + lix * nt)
        return _attend((x, kc, vc, cc, ksc, vsc), bp, lix, q4, k_new,
                       v_new, c_new, tables, n_tiles, tps, clamp)

    (x, kc, vc, cc, ksc, vsc), _ = jax.lax.scan(
        layer, (x, cache.k, cache.v, cache.codes,
                cache.k_scale, cache.v_scale),
        (p['blocks'], jnp.arange(l)),
        unroll=_decode_unroll(cfg, l))
    cache = KVCache(k=kc, v=vc, codes=cc, length=cache.length + 1,
                    k_scale=ksc, v_scale=vsc)
    x = _norm(cfg, p['final_norm'], x)
    return x[:, 0], cache


def decode_step_greedy(iw: InferenceWeights, tokens: jax.Array,
                       cache: KVCache) -> Tuple[jax.Array, KVCache]:
    """decode_step specialized for greedy sampling: the lm_head matmul
    and the argmax fuse into one streaming kernel (ops/pallas/lm_head.py)
    so the [B, V] logits are never materialized and two dispatches leave
    the step's fixed cost. Returns (next_token [B] int32, cache).

    Token-identical to argmax(decode_step(...)[0]): the kernel rounds
    logits to the serving dtype before comparing and breaks ties toward
    the lowest index, like jnp.argmax. int8-quantized lm_heads stream
    their halved bytes through the int8 twin kernel."""
    cfg = iw.cfg
    kern = iw.params['lm_head']['kernel']
    if not cfg.decode_fused_head:
        logits, cache = decode_step(iw, tokens, cache)
        return jnp.argmax(logits, -1).astype(jnp.int32), cache
    x, cache = _decode_hidden(iw, tokens, cache)
    if isinstance(kern, dict):          # int8 weight-only serving
        from spt_proto_tpu.ops.pallas.lm_head import lm_head_argmax_int8
        return lm_head_argmax_int8(x, kern), cache
    from spt_proto_tpu.ops.pallas.lm_head import lm_head_argmax
    return lm_head_argmax(x, kern), cache


# ---------------------------------------------------------------------------
# block verify (speculative decoding)
# ---------------------------------------------------------------------------

def verify_step(iw: InferenceWeights, tokens: jax.Array,
                cache: KVCache, impl: Optional[str] = None
                ) -> Tuple[jax.Array, KVCache]:
    """Speculative-decoding block verify: process K tokens per slot in ONE
    forward. tokens [B, K] int32 at positions cache.length[b] + [0, K);
    returns (logits [B, K, V], cache with the K columns appended and
    length += K). The caller rolls back by simply lowering cache.length —
    rejected columns stay in the tiles but every attention path masks by
    position, and the next append overwrites them (the rollback design the
    tile-major cache was built for; docs/ROADMAP.md speculative item).

    Attention semantics mirror decode_step EXACTLY per query j (the
    parity requirement for greedy speculative == greedy vanilla):
      * dense — causal over positions <= pos+j;
      * sparse — per-kv-head tile tables from group-pooled PQ match means
        over FULL tiles (< (pos+j)//TILE), top nsel-1 by jax.lax.top_k
        (same tie-breaking) plus the current tile, scores clamped to
        +-score_clamp before masking (ops/pallas/decode_attention.py
        _rows_kernel masking rule: a full tile's lanes are all valid,
        the current tile's lanes up to the query position).
    New-token codes/K/V are inserted up-front: for query j, any later
    token i > j lands in a tile >= its current tile, which the full-tile
    cutoff masks — so one insertion serves all K queries.

    Two implementations (impl: None = auto, 'kernel', 'jnp'):
      * 'kernel' (default when the cache is bf16): the fused Pallas
        block-verify kernel (ops/pallas/decode_attention.py
        verify_attention_rows) — per layer, ONE kernel call DMAs only
        the union of every query's selected tiles, carries a per-entry
        K-bit visibility mask so each query sees exactly its own decode
        selection, and appends the K new columns in place.
      * 'jnp' (default for the int8 cache): reads the layer's cache
        slice and computes the same math in XLA (one defensive cache
        copy per call).
    """
    cfg = iw.cfg
    p = iw.params
    quantized = cache.quantized
    b, kk = tokens.shape
    l = cfg.n_layers
    nt = cache.tiles_per_layer(l)
    s_all = nt * TILE
    kv, g = cfg.kv_heads, cfg.kv_groups
    dh = cfg.d_head
    pos0 = cache.length                                   # [B]
    wpos = pos0[:, None] + jnp.arange(kk)[None]           # [B, K]
    h_tok = p['embedding']['embedding'][tokens]           # [B, K, Dm]
    if cfg.arch == 'opt':
        h_tok = h_tok + p['learned_pe']['embedding'][wpos + PE_OFFSET]
    x = h_tok.astype(cfg.dtype)

    sparse = cfg.attention == ATTN_SPARSE_V2
    scale = dh ** -0.5
    tile_r = wpos // TILE                                 # [B, K]
    col_r = wpos % TILE
    if sparse:
        nsel = min(nt, max(1, nt // cfg.sparse_coeff) + 1)
        gsel = cfg.sparse_select_heads
        n_tab = kv // gsel
        t_sel = min(nt, (nsel - 1) * kk)   # union-table width (kernel)
    use_kernel = (impl or ('jnp' if quantized else 'kernel')) == 'kernel'
    assert not (use_kernel and quantized), \
        'the int8 cache verifies via impl=jnp'
    colpos = jnp.arange(s_all)
    causal = colpos[None, None, :] <= wpos[:, :, None]    # [B, K, S]
    t_io5 = jnp.arange(nt)[None, None, :, None, None]     # tile iota
    c_io5 = jnp.arange(TILE)[None, None, None, None, :]   # lane iota

    def insert_cols(sl, new):
        """sl [B, KV, NT, w, T]; new [B, KV, K, w] -> K columns inserted
        at (tile_r, col_r)."""
        for i in range(kk):
            m = ((t_io5 == tile_r[:, i][:, None, None, None, None])
                 & (c_io5 == col_r[:, i][:, None, None, None, None]))
            sl = jnp.where(m, new[:, :, i][:, :, None, :, None]
                           .astype(sl.dtype), sl)
        return sl

    def select_tiles(c_li, codes_q):
        """Per-query decode tile selection over the (code-inserted) layer
        codes: keep [B, N_TAB, K, NT] bool — cur_j's tile always, plus
        the top nsel-1 FULL tiles by group-pooled match mean (the exact
        decode_step rule, jax.lax.top_k tie-breaking included).
        Vectorized over all K query columns in one compare+top_k (the
        per-query Python loop was K-for-1 glue in the verify step)."""
        c_lt = c_li[:, :, :, :cfg.n_subspaces]   # true-width codes
        # [B,KV,G,K,n_sub] vs [B,KV,NT,ns,T] -> match [B,KV,G,K,NT,T]
        match = jnp.sum(
            (c_lt[:, :, None, None] ==
             codes_q[:, :, :, :, None, :, None]
             ).astype(jnp.float32), axis=5)                # [B,KV,G,K,NT,T]
        tsc = match.mean(axis=(2, 5))                      # [B, KV, K, NT]
        if gsel > 1:
            tsc = tsc.reshape(b, n_tab, gsel, kk, nt).mean(2)
        cur_j = tile_r                                     # [B, K]
        full_t = (jnp.arange(nt)[None, None, :]
                  < cur_j[:, :, None])                     # [B, K, NT]
        tsc = jnp.where(full_t[:, None], tsc, -jnp.inf)
        sel = jnp.zeros((b, n_tab, kk, nt), bool)
        if nsel > 1:
            svals, sidx = jax.lax.top_k(tsc, nsel - 1)
            oh = ((jnp.arange(nt)[None, None, None, None]
                   == sidx[..., None])
                  & (svals > -jnp.inf)[..., None])
            sel = oh.any(axis=3)
        sel = sel | (jnp.arange(nt)[None, None, None]
                     == cur_j[:, None, :, None])
        return sel                                        # [B,n_tab,K,NT]

    def layer(carry, inp):
        x, kc, vc, cc, ksc, vsc = carry
        bp, lix = inp
        hn = _norm(cfg, bp['norm1'], x)
        q3, k3, v3 = _qkv_proj(bp['mha'], hn)
        q = q3.reshape(
            b, kk, kv * g, dh).transpose(0, 2, 1, 3)      # [B, H, K, D]
        k_new = k3.reshape(
            b, kk, kv, dh).transpose(0, 2, 1, 3)          # [B, KV, K, D]
        v_new = v3.reshape(
            b, kk, kv, dh).transpose(0, 2, 1, 3)
        if cfg.arch == 'llama':
            q = _apply_rope_1(q, wpos, cfg.rope_base)
            k_new = _apply_rope_1(k_new, wpos, cfg.rope_base)
        if sparse:
            bd_m = _bd_of(bp['mha'])
            codes_q = _encode_codes(cfg, bp['mha']['quantizer'],
                                    q.reshape(b, kv, g, kk, dh),
                                    bd=bd_m)
            c_new = _fit_codes(
                _encode_codes(cfg, bp['mha']['quantizer'], k_new,
                              bd=bd_m),
                cc.shape[3])
            c_li = insert_cols(
                jax.lax.dynamic_slice(cc, (0, 0, lix * nt, 0, 0),
                                      (b, kv, nt, cc.shape[3], TILE)),
                c_new.astype(jnp.int32))
            keep = select_tiles(c_li, codes_q)            # [B,n_tab,K,NT]

        if use_kernel:
            from spt_proto_tpu.ops.pallas.decode_attention import (
                verify_attention_rows)
            w0r = pos0 // TILE
            w1r = (pos0 + kk - 1) // TILE
            if sparse:
                keep_h = jnp.repeat(keep, gsel, axis=1)   # [B,KV,K,NT]
                jbit = (1 << jnp.arange(kk, dtype=jnp.int32))
                bits = (keep_h.astype(jnp.int32)
                        * jbit[None, None, :, None]).sum(axis=2)
                tiles_i = jnp.arange(nt)
                is_w = ((tiles_i[None, None] == w0r[:, None, None])
                        | (tiles_i[None, None] == w1r[:, None, None]))
                union = keep_h.any(axis=2) & ~is_w
                if t_sel > 0:
                    vals, idx = jax.lax.top_k(
                        union.astype(jnp.float32), t_sel)
                    ent = jnp.where(vals > 0, idx.astype(jnp.int32), -1)
                else:
                    ent = jnp.zeros((b, kv, 0), jnp.int32)
                clamp = cfg.score_clamp
            else:
                e_i = jnp.arange(nt, dtype=jnp.int32)
                ent = jnp.broadcast_to(
                    jnp.where(e_i[None, None] < w0r[:, None, None],
                              e_i[None, None], -1), (b, kv, nt))
                bits = jnp.full((b, kv, nt), (1 << kk) - 1, jnp.int32)
                clamp = 0.0
            wcols = jnp.broadcast_to(
                jnp.stack([w0r, w1r], -1)[:, None], (b, kv, 2))
            ent = jnp.concatenate([ent, wcols], axis=-1).astype(jnp.int32)
            ebits = jnp.take_along_axis(bits, jnp.maximum(ent, 0),
                                        axis=-1)
            ebits = jnp.where(ent >= 0, ebits, 0)
            dup = (w0r == w1r)[:, None]
            ebits = ebits.at[..., -2].set(
                jnp.where(dup, 0, ebits[..., -2]))
            tables = jnp.where(ent >= 0, ent + lix * nt, -1)
            cn_k = (c_new.transpose(0, 1, 3, 2).astype(jnp.int32)
                    if sparse else
                    jnp.zeros((b, kv, cc.shape[3], kk), jnp.int32))
            o, kc, vc, cc = verify_attention_rows(
                q.reshape(b, kv, g, kk, dh).reshape(b, kv, g * kk, dh),
                kc, vc, cc, tables, ebits, pos0,
                k_new.transpose(0, 1, 3, 2).astype(kc.dtype),
                v_new.transpose(0, 1, 3, 2).astype(vc.dtype), cn_k,
                jnp.full((b,), lix * nt, jnp.int32),
                ps=TILE, scale=scale, clamp=clamp)
            o = o.reshape(b, kv, g, kk, dh).transpose(0, 3, 1, 2, 4
                                                      ).reshape(
                b, kk, cfg.d_model)
            x = x + _dense(bp['mha']['o'], o)
            x = _ffn_residual(cfg, bp['ffn'], bp['norm2'], x)
            return (x, kc, vc, cc, ksc, vsc), None

        # ---- jnp path: insert the K new columns into the layer slices
        k_l = jax.lax.dynamic_slice(kc, (0, 0, lix * nt, 0, 0),
                                    (b, kv, nt, dh, TILE))
        v_l = jax.lax.dynamic_slice(vc, (0, 0, lix * nt, 0, 0),
                                    (b, kv, nt, dh, TILE))
        if sparse:
            c_l = c_li
        if quantized:
            k8, ks_new = _quantize_kv(k_new)   # [B,KV,K,D] + [B,KV,K]
            v8, vs_new = _quantize_kv(v_new)
            k_l = insert_cols(k_l, k8)
            v_l = insert_cols(v_l, v8)
            hp = ksc.shape[2]
            ksc_l = jax.lax.dynamic_slice(ksc, (0, lix * nt, 0, 0),
                                          (b, nt, hp, TILE))
            vsc_l = jax.lax.dynamic_slice(vsc, (0, lix * nt, 0, 0),
                                          (b, nt, hp, TILE))
            pad_h = ((0, 0), (0, hp - kv), (0, 0))
            ks_p = jnp.pad(ks_new, pad_h)             # [B, hp, K]
            vs_p = jnp.pad(vs_new, pad_h)
            for i in range(kk):
                m = ((jnp.arange(nt)[None, :, None, None]
                      == tile_r[:, i][:, None, None, None])
                     & (jnp.arange(TILE)[None, None, None, :]
                        == col_r[:, i][:, None, None, None]))
                ksc_l = jnp.where(m, ks_p[:, None, :, i, None], ksc_l)
                vsc_l = jnp.where(m, vs_p[:, None, :, i, None], vsc_l)
            # dequantize for the attention math (scores x kscale /
            # probs x vscale in the kernel == dequantized operands)
            kf = (k_l.astype(jnp.float32)
                  * ksc_l[:, :, :kv].transpose(0, 2, 1, 3)[:, :, :, None]
                  ).astype(cfg.dtype)
            vf = (v_l.astype(jnp.float32)
                  * vsc_l[:, :, :kv].transpose(0, 2, 1, 3)[:, :, :, None]
                  ).astype(cfg.dtype)
        else:
            k_l = insert_cols(k_l, k_new)
            v_l = insert_cols(v_l, v_new)
            kf, vf = k_l, v_l

        # ---- token-major views + attention over [cache + new block]
        k_tok = kf.transpose(0, 1, 2, 4, 3).reshape(b, kv, s_all, dh)
        v_tok = vf.transpose(0, 1, 2, 4, 3).reshape(b, kv, s_all, dh)
        if g > 1:
            k_tok = jnp.repeat(k_tok, g, axis=1)
            v_tok = jnp.repeat(v_tok, g, axis=1)
        scores = jnp.einsum('bhkd,bhjd->bhkj', q, k_tok,
                            preferred_element_type=jnp.float32) * scale
        if sparse:
            scores = jnp.clip(scores, -cfg.score_clamp, cfg.score_clamp)
            keep_s = jnp.repeat(keep, gsel * g, axis=1)   # [B, H, K, NT]
            keep_s = jnp.repeat(keep_s, TILE, axis=3)     # [B, H, K, S]
            allowed = keep_s & causal[:, None]
        else:
            allowed = jnp.broadcast_to(causal[:, None],
                                       scores.shape)
        scores = jnp.where(allowed, scores, NEG_INF)
        probs = jax.nn.softmax(scores, axis=-1).astype(v_tok.dtype)
        o = jnp.einsum('bhkj,bhjd->bhkd', probs, v_tok,
                       preferred_element_type=jnp.float32
                       ).astype(cfg.dtype)
        o = o.transpose(0, 2, 1, 3).reshape(b, kk, cfg.d_model)
        x = x + _dense(bp['mha']['o'], o)
        x = _ffn_residual(cfg, bp['ffn'], bp['norm2'], x)

        # ---- write the updated layer slices back
        kc = jax.lax.dynamic_update_slice(kc, k_l, (0, 0, lix * nt, 0, 0))
        vc = jax.lax.dynamic_update_slice(vc, v_l, (0, 0, lix * nt, 0, 0))
        if sparse:
            cc = jax.lax.dynamic_update_slice(
                cc, c_l, (0, 0, lix * nt, 0, 0))
        if quantized:
            ksc = jax.lax.dynamic_update_slice(
                ksc, ksc_l, (0, lix * nt, 0, 0))
            vsc = jax.lax.dynamic_update_slice(
                vsc, vsc_l, (0, lix * nt, 0, 0))
        return (x, kc, vc, cc, ksc, vsc), None

    (x, kc, vc, cc, ksc, vsc), _ = jax.lax.scan(
        layer, (x, cache.k, cache.v, cache.codes,
                cache.k_scale, cache.v_scale),
        (p['blocks'], jnp.arange(l)),
        unroll=_decode_unroll(cfg, l))
    cache = KVCache(k=kc, v=vc, codes=cc, length=pos0 + kk,
                    k_scale=ksc, v_scale=vsc)
    x = _norm(cfg, p['final_norm'], x)
    logits = _dense(p['lm_head'], x)
    return logits, cache


# ---------------------------------------------------------------------------
# cache growth (length bucketing)
# ---------------------------------------------------------------------------

DECODE_BUCKET = 256   # multiple of the sparse tile size (128)


def round_up(n: int, m: int) -> int:
    return -(-n // m) * m


@functools.partial(jax.jit, static_argnums=(1, 2))
def grow_cache(cache: KVCache, new_len: int, n_layers: int) -> KVCache:
    """Extend smax by zero-padding tiles per layer block. Decode cost
    tracks the current bucket instead of the final max_len. NOT donated:
    the output is strictly larger than the input, so aliasing is
    impossible (a donate here only produced 'donated buffers were not
    usable' warnings); the old buffers free when the caller drops its
    reference, and old+new peak coexistence is inherent to the copy."""
    nt_old = cache.tiles_per_layer(n_layers)
    nt_new = -(-new_len // TILE)
    pad = nt_new - nt_old

    def grow(big):
        b, h = big.shape[:2]
        view = big.reshape(b, h, n_layers, nt_old, *big.shape[3:])
        w = ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0), (0, 0))
        return jnp.pad(view, w).reshape(b, h, n_layers * nt_new,
                                        *big.shape[3:])

    scales = dict()
    if cache.quantized:
        def grow_sc(big):      # [B, L*NT, KV, T]
            b = big.shape[0]
            view = big.reshape(b, n_layers, nt_old, *big.shape[2:])
            w = ((0, 0), (0, 0), (0, pad), (0, 0), (0, 0))
            return jnp.pad(view, w).reshape(b, n_layers * nt_new,
                                            *big.shape[2:])
        scales = dict(k_scale=grow_sc(cache.k_scale),
                      v_scale=grow_sc(cache.v_scale))
    return KVCache(k=grow(cache.k), v=grow(cache.v),
                   codes=grow(cache.codes), length=cache.length, **scales)


# ---------------------------------------------------------------------------
# sampling + generate
# ---------------------------------------------------------------------------

def warp_logits(logits: jax.Array, *, temperature: float,
                top_k: Optional[int] = None,
                top_p: Optional[float] = None) -> jax.Array:
    """Temperature / top-k / nucleus warping (f32 logits out). The warped
    softmax IS the sampling distribution — speculative rejection sampling
    (inference/speculative.py) matches it exactly by warping draft and
    target the same way."""
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
    return logits


def sample(logits: jax.Array, rng: Optional[jax.Array] = None, *,
           temperature: float = 0.0, top_k: Optional[int] = None,
           top_p: Optional[float] = None) -> jax.Array:
    """Greedy (temperature 0) / temperature / top-k / nucleus sampling."""
    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = warp_logits(logits, temperature=temperature, top_k=top_k,
                         top_p=top_p)
    return jax.random.categorical(rng, logits, axis=-1).astype(jnp.int32)


def generate(iw: InferenceWeights, prompts: jax.Array, max_new_tokens: int,
             *, max_len: Optional[int] = None, temperature: float = 0.0,
             top_k: Optional[int] = None, top_p: Optional[float] = None,
             rng: Optional[jax.Array] = None,
             eos_id: Optional[int] = None,
             lengths: Optional[jax.Array] = None,
             quantized_kv: bool = False,
             mesh=None) -> jax.Array:
    """Batch generate. prompts [B, S_prompt] -> [B, S_prompt + max_new].

    quantized_kv=True keeps the KV cache in int8 with per-token scales
    (half the decode HBM traffic; ~1% logit error — see
    tests/test_quantized_kv.py).

    mesh: tensor-parallel serving — weights sharded on 'model', cache
    slots on 'data' / heads on 'model' (parallel/infer_sharding.py);
    prefill and every decode step run as pjit programs over the mesh.

    Ragged batches: right-pad the prompts and pass the true per-row
    `lengths [B]`. The cache length is then set per row (so decode positions
    and attention masks ignore the padding — pads sit to the RIGHT of every
    real token, so causality already hides them during prefill) and the
    first token is sampled at each row's own last-prompt-token logits.
    Generated tokens still land at out[:, S_prompt + i] for every row.
    """
    import contextlib
    tp_ctx = contextlib.nullcontext()
    if mesh is not None and iw.cfg.tp_overlap:
        from spt_proto_tpu.parallel.overlap import tp_mesh
        tp_ctx = tp_mesh(mesh)
    with tp_ctx:
        return _generate_impl(
            iw, prompts, max_new_tokens, max_len=max_len,
            temperature=temperature, top_k=top_k, top_p=top_p, rng=rng,
            eos_id=eos_id, lengths=lengths, quantized_kv=quantized_kv,
            mesh=mesh)


def _generate_impl(iw: InferenceWeights, prompts: jax.Array,
                   max_new_tokens: int, *, max_len, temperature, top_k,
                   top_p, rng, eos_id, lengths, quantized_kv,
                   mesh) -> jax.Array:
    b, s0 = prompts.shape
    limit = max_len or (s0 + max_new_tokens)
    # start at the smallest bucket that fits the prompt; grow as decoding
    # proceeds so per-step cost tracks the live context, not the limit
    cap = min(max(s0, round_up(s0 + 1, DECODE_BUCKET)), max(limit, s0))
    cache = KVCache.create(iw.cfg, b, cap, dtype=iw.cfg.dtype,
                           quantized=quantized_kv)
    if mesh is not None:
        from spt_proto_tpu.parallel.infer_sharding import (
            shard_cache, shard_inference_weights)
        iw = shard_inference_weights(mesh, iw)
        cache = shard_cache(mesh, cache)
    prefill_fn = jax.jit(prefill, donate_argnums=(2,))
    # greedy + no eos scan: fuse the lm_head matmul with the argmax
    # (decode_step_greedy) — the logits are never materialized
    greedy = temperature == 0.0 and eos_id is None
    step_fn = jax.jit(decode_step_greedy if greedy else decode_step,
                      donate_argnums=(2,))
    logits, cache = prefill_fn(iw, prompts, cache)
    if lengths is not None:
        lengths = jnp.asarray(lengths, jnp.int32)
        max_pos = int(lengths.max())
        # .copy(): the cache is donated through decode steps — the
        # caller's lengths buffer must not be deleted with it
        cache = dataclasses.replace(cache, length=lengths.copy())
        last = jnp.take_along_axis(
            logits, (lengths - 1)[:, None, None], axis=1)[:, 0]
    else:
        max_pos = s0
        last = logits[:, -1]
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    out = [prompts]
    tok = sample(last, rng, temperature=temperature,
                 top_k=top_k, top_p=top_p)
    done = jnp.zeros((b,), bool) if eos_id is not None else None
    for i in range(max_new_tokens):
        out.append(tok[:, None])
        if eos_id is not None:
            done = done | (tok == eos_id)
            if bool(done.all()):
                break
        if i == max_new_tokens - 1:
            break
        if max_pos + 1 > cap and cap < limit:
            cap = min(round_up(max_pos + 1, DECODE_BUCKET), limit)
            cache = grow_cache(cache, cap, iw.cfg.n_layers)
            if mesh is not None:
                from spt_proto_tpu.parallel.infer_sharding import \
                    shard_cache
                cache = shard_cache(mesh, cache)
        rng, sub = jax.random.split(rng)
        if greedy:
            tok, cache = step_fn(iw, tok, cache)
            max_pos += 1
        else:
            logits, cache = step_fn(iw, tok, cache)
            max_pos += 1
            tok = sample(logits, sub, temperature=temperature,
                         top_k=top_k, top_p=top_p)
    return jnp.concatenate(out, axis=1)
