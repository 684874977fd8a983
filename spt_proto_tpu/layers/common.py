"""Norms, rotary position embedding, LoRA-capable dense/embed layers.

Reference parity: naive_gpt/layers/basic/{utils,position}.py and
naive_gpt/layers/tuning/lora.py.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class RMSNorm(nn.Module):
    """LLaMA RMSNorm: fp32 variance, eps 1e-6 (ref basic/utils.py:22-37)."""
    eps: float = 1e-6
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        dtype = x.dtype
        w = self.param('scale', nn.initializers.ones, (x.shape[-1],),
                       self.param_dtype)
        xf = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
        y = xf * jax.lax.rsqrt(var + self.eps)
        return (w * y.astype(dtype)).astype(dtype)


def rope_cos_sin(positions: jax.Array, d_head: int, *,
                 base: float = 10000.0, dtype=jnp.float32):
    """NeoX-style rotary tables for given integer positions [S].

    Returns cos/sin [S, d_head] with the half-dim frequencies concatenated
    twice (ref basic/position.py:12-26, matches HF LLaMA convention).
    """
    inv_freq = 1.0 / (base ** (jnp.arange(0, d_head, 2, dtype=jnp.float32)
                               / d_head))
    freqs = jnp.einsum('i,j->ij', positions.astype(jnp.float32), inv_freq)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Apply rotary embedding. x [B, S, H, E]; cos/sin [S, E].

    y = cos * x + sin * rotate_half(x)  (ref basic/position.py:28-48).
    """
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    x1, x2 = jnp.split(x, 2, axis=-1)
    rot = jnp.concatenate([-x2, x1], axis=-1)
    return c * x + s * rot


class LoRADense(nn.Module):
    """Dense layer with optional additive LoRA adapter.

    Base kernel/bias are intended frozen (the trainable mask in
    tuning/partition.py selects only params named 'lora_*'); the adapter is
    y += (x @ left) @ right.T with right zero-initialized so the base output
    is preserved at init (ref tuning/lora.py:14-27,69-79).
    """
    features: int
    use_bias: bool = True
    d_lora: Optional[int] = None
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    # int8-frozen base (cfg.int8_base): the kernel is NOT a param — it is
    # read from the 'frozen8' collection as {'q' int8, 'scale' f32} and
    # applied via the fused-dequant matmul with a custom VJP (dx streams
    # the same int8 tiles; no bf16 copy of the base ever exists)
    int8_base: bool = False

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        if self.int8_base:
            assert self.has_variable('frozen8', 'kernel'), \
                'int8_base model applied without the frozen8 collection ' \
                '(build it with tuning.surgery.split_int8_base)'
            from spt_proto_tpu.ops.pallas.int8_matmul import \
                int8_frozen_matmul
            q8 = self.get_variable('frozen8', 'kernel')
            y = int8_frozen_matmul(x.astype(self.dtype), q8['q'],
                                   q8['scale'].reshape(-1))
        else:
            kernel = self.param('kernel', nn.initializers.lecun_normal(),
                                (in_features, self.features),
                                self.param_dtype)
            y = jnp.dot(x, kernel.astype(self.dtype))
        if self.use_bias:
            bias = self.param('bias', nn.initializers.zeros,
                              (self.features,), self.param_dtype)
            y = y + bias.astype(self.dtype)
        if self.d_lora:
            left = self.param('lora_left', nn.initializers.normal(1.0),
                              (in_features, self.d_lora), self.param_dtype)
            right = self.param('lora_right', nn.initializers.zeros,
                               (self.features, self.d_lora), self.param_dtype)
            y = y + jnp.dot(jnp.dot(x, left.astype(self.dtype)),
                            right.astype(self.dtype).T)
        return y


class LoRAEmbed(nn.Module):
    """Token embedding with optional LoRA adapter.

    y = E[ids] + left[ids] @ right.T (ref tuning/lora.py:82-126).
    """
    num_embeddings: int
    features: int
    d_lora: Optional[int] = None
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, ids):
        emb = self.param('embedding', nn.initializers.normal(0.02),
                         (self.num_embeddings, self.features),
                         self.param_dtype)
        y = emb[ids].astype(self.dtype)
        if self.d_lora:
            left = self.param('lora_left', nn.initializers.normal(1.0),
                              (self.num_embeddings, self.d_lora),
                              self.param_dtype)
            right = self.param('lora_right', nn.initializers.zeros,
                               (self.features, self.d_lora), self.param_dtype)
            y = y + jnp.dot(left[ids].astype(self.dtype),
                            right.astype(self.dtype).T)
        return y

    def attend(self, x):
        """Tied-weight logit projection (not used by OPT/LLaMA: untied)."""
        emb = self.get_variable('params', 'embedding')
        return jnp.dot(x, emb.astype(self.dtype).T)
