"""Pre-norm transformer decoder block.

Reference parity: naive_gpt/layers/basic/transformer.py:53-97 (pre_norm path;
the post-norm branch exists in the reference but is never used by OPT/LLaMA —
we support it for completeness).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from spt_proto_tpu.config import FFN_ROUTED, ModelConfig
from spt_proto_tpu.layers.attention import MultiheadAttention
from spt_proto_tpu.layers.common import RMSNorm
from spt_proto_tpu.layers.feedforward import (Feedforward, GatedFeedforward,
                                              RoutedFeedforward,
                                              RoutedGatedFeedforward)


def make_norm(cfg: ModelConfig, name: str):
    if cfg.arch == 'llama':
        return RMSNorm(param_dtype=cfg.param_dtype, name=name)
    # epsilon 1e-5 = torch nn.LayerNorm default (the reference's OPT norm)
    return nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype,
                        param_dtype=cfg.param_dtype, name=name)


def make_ffn(cfg: ModelConfig, deterministic: bool, name: str = 'ffn'):
    if cfg.ffn == FFN_ROUTED:
        cls = RoutedGatedFeedforward if cfg.ffn_gated else RoutedFeedforward
    else:
        cls = GatedFeedforward if cfg.ffn_gated else Feedforward
    return cls(cfg=cfg, deterministic=deterministic, name=name)


class TransformerBlock(nn.Module):
    cfg: ModelConfig
    deterministic: bool = True
    train_quantizer: bool = False
    pre_norm: bool = True

    @nn.compact
    def __call__(self, x, _=None):
        """Scan-compatible: (carry, None) -> (carry, per-layer aux loss)."""
        cfg = self.cfg
        mha = MultiheadAttention(cfg=cfg, deterministic=self.deterministic,
                                 train_quantizer=self.train_quantizer,
                                 name='mha')
        ffn = make_ffn(cfg, self.deterministic)
        norm1 = make_norm(cfg, 'norm1')
        norm2 = make_norm(cfg, 'norm2')
        if self.pre_norm:
            h, aux = mha(norm1(x))
            x = x + h
            x = x + ffn(norm2(x))
        else:
            h, aux = mha(x)
            x = norm1(x + h)
            x = norm2(x + ffn(x))
        return x, aux
