"""Multi-head attention: dense, PQ-warm-up (v1), and PQ-sparse (v2) paths.

Reference parity: naive_gpt/layers/basic/{attention,multihead}.py and
naive_gpt/layers/sparse/attention.py. One module covers the reference's
VanillaAttention / RotaryAttention / SparseVanillaAttentionV1/V2 /
SparseRotaryAttentionV1/V2 six-way class hierarchy: rotary-ness comes from
the model arch, sparseness from config.attention.

The stateful `trigger`/`loss` buffers of the reference (sparse/attention.py:
98-104) are replaced by a functional aux output: __call__ returns
(y, pq_aux_loss); the training step decides when to arm quantizer training
via the `train_quantizer` static flag.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from spt_proto_tpu.config import (ATTN_DENSE, ATTN_SPARSE_V1, ATTN_SPARSE_V2,
                                  ModelConfig)
from spt_proto_tpu.layers.common import LoRADense, apply_rope, rope_cos_sin
from spt_proto_tpu.layers.quantizer import PQQuantizer
from spt_proto_tpu.ops.lookup import pq_topk_indices
from spt_proto_tpu.ops.sparse_attention import sparse_attention


class MultiheadAttention(nn.Module):
    cfg: ModelConfig
    deterministic: bool = True
    train_quantizer: bool = False

    def setup(self):
        cfg = self.cfg
        dense = lambda name, feats: LoRADense(
            features=feats, use_bias=cfg.attn_bias, d_lora=cfg.d_lora,
            dtype=cfg.dtype, param_dtype=cfg.param_dtype,
            int8_base=cfg.int8_base, name=name)
        kv_feats = cfg.kv_heads * cfg.d_head
        self.linear_q = dense('q', cfg.d_model)
        self.linear_k = dense('k', kv_feats)
        self.linear_v = dense('v', kv_feats)
        self.linear_o = dense('o', cfg.d_model)
        if cfg.attention in (ATTN_SPARSE_V1, ATTN_SPARSE_V2):
            self.quantizer = PQQuantizer(
                d_codeword=cfg.d_codeword, n_codewords=cfg.n_codewords,
                n_subspaces=cfg.n_subspaces, param_dtype=cfg.param_dtype,
                metric=cfg.pq_metric)
        if cfg.p_dropout > 0.0:
            self.dropout = nn.Dropout(rate=cfg.p_dropout)

    def _dense_attn(self, q, k, v):
        """[B, S, H, E] SDPA with causal mask.

        Ref basic/attention.py:18-39: softmax(scale * (qk + additive_mask)).
        On TPU with tile-aligned shapes this dispatches to the stock Pallas
        flash-attention kernel (never materializes the S x S matrix).
        """
        cfg = self.cfg
        s = q.shape[1]
        scale = cfg.d_head ** -0.5
        if cfg.context_parallel:
            # inside a shard_map: q/k/v are local sequence chunks; ring
            # attention passes K/V chunks around cfg.cp_axis with online
            # softmax (ops/ring_attention.py)
            from spt_proto_tpu.ops.ring_attention import ring_attention_local
            o = ring_attention_local(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3), axis_name=cfg.cp_axis,
                scale=scale, causal=True)
            return o.transpose(0, 2, 1, 3)
        use_flash = (cfg.attn_impl == 'pallas' and s % 128 == 0
                     and (cfg.p_dropout == 0.0 or self.deterministic))
        if use_flash:
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                flash_attention)
            qh = q.transpose(0, 2, 1, 3)      # [B, H, S, E]
            kh = k.transpose(0, 2, 1, 3)
            vh = v.transpose(0, 2, 1, 3)
            o = flash_attention(qh, kh, vh, causal=True, sm_scale=scale)
            return o.transpose(0, 2, 1, 3)
        scores = jnp.einsum('bihe,bjhe->bhij', q, k)
        causal = jnp.tril(jnp.ones((s, s), dtype=bool))
        scores = jnp.where(causal, scale * scores, -jnp.inf)
        probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
        if cfg.p_dropout > 0.0 and not self.deterministic:
            probs = self.dropout(probs, deterministic=False)
        return jnp.einsum('bhij,bjhe->bihe', probs, v)

    def _sparse_attn(self, q, k, v):
        """PQ sparse path. Ref sparse/attention.py:84-142.

        Three implementations sharing the density contract (keep
        ~1/sparse_coeff of the causal context per query):
          'ref'    — per-row top-k gather, bit-faithful to the reference's
                     CSR pipeline (CPU/test oracle).
          'block'  — jnp block-sparse: PQ scores pooled to tile resolution,
                     top key-tiles per query tile (TPU-friendly gathers).
          'pallas' — fused block-sparse flash kernel (production TPU path).
        """
        cfg = self.cfg
        b, s, h, e = q.shape
        scale = cfg.d_head ** -0.5
        # [B, S, H, E] -> [B*H, S, E]
        to_flat = lambda x: x.transpose(0, 2, 1, 3).reshape(b * h, s, e)
        qf, kf, vf = to_flat(q), to_flat(k), to_flat(v)
        aux = jnp.zeros((), jnp.float32)
        if self.train_quantizer:
            _, loss_q = self.quantizer.train_loss(qf)
            _, loss_k = self.quantizer.train_loss(kf)
            aux = (loss_q + loss_k).astype(jnp.float32)
        q_codes = self.quantizer.encode(qf)
        k_codes = self.quantizer.encode(kf)

        if cfg.context_parallel:
            # inside a shard_map: chunks select GLOBALLY from all-gathered
            # K-codes, then K/V ride the ring (ops/ring_attention.py) —
            # sparse x CP composed (the reference's two long-context
            # levers; it can only do one at a time)
            from spt_proto_tpu.ops.ring_attention import \
                ring_sparse_attention_local
            yf = ring_sparse_attention_local(
                qf, kf, vf, q_codes, k_codes, axis_name=cfg.cp_axis,
                scale=scale, clamp=cfg.score_clamp,
                sparse_coeff=cfg.sparse_coeff,
                n_codewords=cfg.n_codewords)
            return yf.reshape(b, h, s, e).transpose(0, 2, 1, 3), aux

        blk_k = 128
        # larger q tiles amortize grid overhead (measured ~1.4x at S=4096);
        # selection granularity stays at blk_k
        blk_q = 256 if s % 256 == 0 else 128
        use_block = cfg.attn_impl in ('block', 'pallas') and s % blk_q == 0
        if use_block:
            from spt_proto_tpu.ops.block_sparse import (
                block_sparse_attention_ref, pq_tile_scores, select_tiles)
            ratio = blk_q // blk_k
            n_sel = max(ratio, (s // blk_k) // cfg.sparse_coeff)
            ts = pq_tile_scores(q_codes, k_codes,
                                n_codewords=cfg.n_codewords,
                                block_q=blk_q, block_k=blk_k)
            sel = select_tiles(ts, n_sel, block_ratio=ratio)
            if cfg.attn_impl == 'pallas':
                from spt_proto_tpu.ops.pallas.block_sparse_attention import (
                    block_sparse_attention)
                yf = block_sparse_attention(qf, kf, vf, sel, block_q=blk_q,
                                            block_k=blk_k, scale=scale,
                                            clamp=cfg.score_clamp)
            else:
                yf = block_sparse_attention_ref(qf, kf, vf, sel,
                                                block_q=blk_q, block_k=blk_k,
                                                scale=scale,
                                                clamp=cfg.score_clamp)
        else:
            if cfg.attn_impl in ('block', 'pallas') and s > 1024:
                import warnings
                warnings.warn(
                    f'sparse attention at S={s} (not a multiple of {blk_q}) '
                    f'falls back to the per-row oracle, which materializes '
                    f'the full [S, S] PQ match matrix — pad the sequence to '
                    f'a tile multiple to stay on the block-sparse path',
                    stacklevel=2)
            top_k = max(1, s // cfg.sparse_coeff)
            idx = pq_topk_indices(q_codes, k_codes, top_k=top_k,
                                  n_codewords=cfg.n_codewords)
            yf = sparse_attention(qf, kf, vf, idx, scale=scale,
                                  clamp=cfg.score_clamp)
        return yf.reshape(b, h, s, e).transpose(0, 2, 1, 3), aux

    def __call__(self, x):
        """x [B, S, D] -> (y [B, S, D], pq_aux_loss scalar)."""
        cfg = self.cfg
        b, s, _ = x.shape
        q = self.linear_q(x).reshape(b, s, cfg.n_heads, cfg.d_head)
        # GQA: project K/V at kv_heads, then broadcast per query group
        kv = lambda t: jnp.repeat(
            t.reshape(b, s, cfg.kv_heads, cfg.d_head), cfg.kv_groups,
            axis=2)
        k = kv(self.linear_k(x))
        v = kv(self.linear_v(x))
        if cfg.arch == 'llama':
            pos = jnp.arange(s)
            if cfg.context_parallel:
                # local chunk: global position = shard_index * chunk + i
                pos = pos + jax.lax.axis_index(cfg.cp_axis) * s
            cos, sin = rope_cos_sin(pos, cfg.d_head,
                                    base=cfg.rope_base, dtype=jnp.float32)
            q = apply_rope(q.astype(jnp.float32), cos, sin).astype(cfg.dtype)
            k = apply_rope(k.astype(jnp.float32), cos, sin).astype(cfg.dtype)

        aux = jnp.zeros((), jnp.float32)
        if cfg.attention == ATTN_SPARSE_V2:
            y, aux = self._sparse_attn(q, k, v)
        else:
            if cfg.attention == ATTN_SPARSE_V1 and self.train_quantizer:
                # codebook warm-up on the (possibly rotary) q/k, dense attn
                # (ref sparse/attention.py:5-43,145-192)
                b_, s_, h_, e_ = q.shape
                flat = lambda t: t.transpose(0, 2, 1, 3).reshape(-1, s_, e_)
                _, lq = self.quantizer.train_loss(flat(q))
                _, lk = self.quantizer.train_loss(flat(k))
                aux = (lq + lk).astype(jnp.float32)
            elif cfg.attention == ATTN_SPARSE_V1:
                # touch params so linen registers them outside training too
                _ = self.quantizer.codebook
            y = self._dense_attn(q, k, v)
        y = y.reshape(b, s, cfg.d_model)
        return self.linear_o(y), aux
