"""Staged model upgrade pipeline: dense -> LoRA -> routed FFN -> sparse MHA.

Reference parity: naive_gpt/utils/adapter.py (ModuleUpgrader + LoRAHandler +
SparseLoRAHandler, stages 'lora' -> 'ffn' -> 'mha_v1' -> 'mha_v2' applied in
order by script/4-sparse-tuning-0.py:33-39). The reference rewrites an
nn.Module tree reflectively; here each stage is (a) a ModelConfig delta and
(b) a param-tree transform: initialize the upgraded model's params, then
overlay every pre-existing leaf — newly-added params (LoRA factors, routers,
PQ codebooks) keep their fresh init, everything else is preserved bit-exact.

Because newly added LoRA right-factors are zero-initialized and sparse_v2 is
a pure config flip, stages 'lora' and 'ffn'(lora) preserve model outputs at
upgrade time exactly — asserted in tests/test_surgery.py, mirroring
test/layer/test_adapter.py:90-190.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from spt_proto_tpu.config import (ATTN_SPARSE_V1, ATTN_SPARSE_V2, FFN_ROUTED,
                                  ModelConfig)
from spt_proto_tpu.models.decoder import DecoderLM
from spt_proto_tpu.utils.tree import flatten, overlay, unflatten

STAGES = ('lora', 'ffn', 'mha_v1', 'mha_v2')


def stage_config(cfg: ModelConfig, stage: str, *,
                 d_lora: int = 16,
                 ffn_block_size: Optional[int] = None,
                 d_codeword: int = 8,
                 n_codewords: int = 16) -> ModelConfig:
    """Config delta for one upgrade stage.

    Defaults follow the reference handler constants: d_codeword=8,
    n_codewords=16 (adapter.py:97-98), block_size=d_ff//4 (adapter.py:163).
    """
    if stage == 'lora':
        return cfg.replace(d_lora=d_lora)
    if stage == 'ffn':
        bs = ffn_block_size or cfg.d_feedforward // 4
        return cfg.replace(ffn=FFN_ROUTED, ffn_block_size=bs)
    if stage == 'mha_v1':
        return cfg.replace(attention=ATTN_SPARSE_V1, d_codeword=d_codeword,
                           n_codewords=n_codewords)
    if stage == 'mha_v2':
        assert cfg.attention == ATTN_SPARSE_V1, \
            'mha_v2 upgrades from mha_v1 (ref SparseVanillaAttentionV2.' \
            'from_pretrained)'
        return cfg.replace(attention=ATTN_SPARSE_V2)
    raise ValueError(f'unknown stage {stage!r}')


def init_params(cfg: ModelConfig, rng: jax.Array,
                sample_len: int = 8) -> Any:
    """Initialize a param tree for the given config."""
    model = DecoderLM(cfg=cfg)
    tokens = jnp.zeros((1, sample_len), jnp.int32)
    # eager (un-jitted) linen init is pathologically slow through nn.scan;
    # jit makes it a single compiled program
    variables = jax.jit(model.init)(rng, tokens)
    return variables['params']


def upgrade(cfg: ModelConfig, params: Any, stage: str, rng: jax.Array,
            **stage_kw) -> tuple[ModelConfig, Any]:
    """Apply one stage: returns (new_cfg, new_params).

    All pre-existing leaves are carried over exactly; only newly introduced
    params (LoRA factors / router / codebook) keep their fresh init.
    """
    new_cfg = stage_config(cfg, stage, **stage_kw)
    new_cfg.validate()
    if flatten_paths_equal(cfg, new_cfg):
        return new_cfg, params
    fresh = init_params(new_cfg, rng)
    old_flat = flatten(params)
    fresh_flat = flatten(fresh)
    missing = set(old_flat) - set(fresh_flat)
    if missing:
        raise KeyError(f'upgrade {stage!r} would drop params: '
                       f'{sorted(missing)[:5]}...')
    merged = overlay(fresh, params)
    return new_cfg, merged


def flatten_paths_equal(cfg_a: ModelConfig, cfg_b: ModelConfig) -> bool:
    """True if the two configs have identical param trees (e.g. the
    mha_v1 -> mha_v2 flip adds nothing: the quantizer already exists)."""
    shape_of = lambda cfg: set(flatten(jax.tree.map(
        lambda x: 0,
        jax.eval_shape(DecoderLM(cfg=cfg).init, jax.random.PRNGKey(0),
                       jnp.zeros((1, 8), jnp.int32))['params'])))
    return shape_of(cfg_a) == shape_of(cfg_b)


def full_upgrade(cfg: ModelConfig, params: Any, rng: jax.Array,
                 d_lora: int = 16,
                 ffn_block_size: Optional[int] = None
                 ) -> tuple[ModelConfig, Any]:
    """The canonical 4-stage pipeline (ref script/4-sparse-tuning-0.py:33-39)."""
    for i, stage in enumerate(STAGES):
        kw = {}
        if stage == 'lora':
            kw['d_lora'] = d_lora
        if stage == 'ffn':
            kw['ffn_block_size'] = ffn_block_size
        cfg, params = upgrade(cfg, params, stage,
                              jax.random.fold_in(rng, i), **kw)
    return cfg, params
