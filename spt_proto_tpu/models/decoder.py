"""Decoder-only LM covering both OPT and LLaMA architectures.

Reference parity: naive_gpt/models/opt.py (token emb + learned PE with
offset 2, pre-norm blocks, final LayerNorm, untied LM head) and
naive_gpt/models/llama.py (token emb only, RMSNorm, RoPE inside attention).

TPU-first deviations from the reference:
  * Layers run under nn.scan with stacked params [n_layers, ...] — one
    compiled block body instead of n_layers unrolled copies; the stacked
    leading axis is also the natural pipeline/FSDP sharding axis.
  * No [max_len, max_len] additive mask buffer — causality is applied inside
    the attention op (dense: tril predicate; sparse: idx <= row).
  * Optional per-block rematerialization (cfg.remat) replaces DeepSpeed's
    CPU activation checkpointing (ref script/4-sparse-tuning-1.py:174).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from spt_proto_tpu.config import ModelConfig
from spt_proto_tpu.layers.common import LoRAEmbed, RMSNorm
from spt_proto_tpu.layers.transformer import TransformerBlock, make_norm

PE_OFFSET = 2  # ref models/opt.py:8 (OPT's learned-PE index offset)


class DecoderLM(nn.Module):
    cfg: ModelConfig
    deterministic: bool = True
    train_quantizer: bool = False

    @nn.compact
    def __call__(self, tokens: jax.Array,
                 positions: Optional[jax.Array] = None) -> dict:
        """tokens [B, S] int32 -> {'logits': [B, S, V], 'pq_loss': scalar}.

        `positions` overrides the default arange positions (used by the
        decode path where S=1 and the true position varies per step).
        """
        cfg = self.cfg
        b, s = tokens.shape
        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(s)[None, :], (b, s))

        h = LoRAEmbed(cfg.vocab_size, cfg.d_model, d_lora=cfg.d_lora,
                      dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                      name='embedding')(tokens)
        if cfg.arch == 'opt':
            # learned positional embedding with offset 2 (ref opt.py:62-68)
            h = h + LoRAEmbed(cfg.max_length + PE_OFFSET, cfg.d_model,
                              d_lora=cfg.d_lora, dtype=cfg.dtype,
                              param_dtype=cfg.param_dtype,
                              name='learned_pe')(positions + PE_OFFSET)

        block_cls = TransformerBlock
        if cfg.remat:
            policy = None
            if cfg.remat_policy == 'dots':
                policy = jax.checkpoint_policies.checkpoint_dots
            block_cls = nn.remat(TransformerBlock,
                                 prevent_cse=False,
                                 policy=policy,
                                 static_argnums=())
        vaxes = {'params': 0}
        if cfg.int8_base:
            # frozen int8 base kernels are stacked [n_layers, ...] too
            vaxes['frozen8'] = 0
        blocks = nn.scan(
            block_cls,
            variable_axes=vaxes,
            split_rngs={'params': True, 'dropout': True},
            length=cfg.n_layers,
            metadata_params={nn.PARTITION_NAME: 'layers'},
        )(cfg=cfg, deterministic=self.deterministic,
          train_quantizer=self.train_quantizer, name='blocks')
        h, aux = blocks(h, None)

        h = make_norm(cfg, 'final_norm')(h)
        logits = nn.Dense(cfg.vocab_size, use_bias=False, dtype=cfg.dtype,
                          param_dtype=cfg.param_dtype, name='lm_head')(h)
        return {'logits': logits, 'pq_loss': jnp.sum(aux)}


def OPTModel(cfg: ModelConfig, **kw) -> DecoderLM:
    assert cfg.arch == 'opt'
    return DecoderLM(cfg=cfg, **kw)


def LLaMAModel(cfg: ModelConfig, **kw) -> DecoderLM:
    assert cfg.arch == 'llama'
    return DecoderLM(cfg=cfg, **kw)
