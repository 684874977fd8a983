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


INT8_BASE_KERNELS = ('mha/q/kernel', 'mha/k/kernel', 'mha/v/kernel',
                     'mha/o/kernel', 'ffn/fc1/kernel', 'ffn/fc2/kernel',
                     'ffn/gate/kernel', 'ffn/side/kernel',
                     'ffn/down/kernel')


def split_int8_base(cfg: ModelConfig, params: Any,
                    staged: bool = False) -> tuple[ModelConfig, Any, Any]:
    """QLoRA-shape split: move the big frozen base kernels (attention
    q/k/v/o + FFN matrices) out of the param tree into a 'frozen8'
    collection as int8 + per-output-channel scales.

    Returns (cfg with int8_base=True, params without those kernels,
    frozen8 tree mirroring the flax scope paths). Embeddings, lm_head,
    norms, biases, LoRA factors, router and PQ codebook stay fp in
    `params` (frozen by the trainable mask as before; they are a tiny
    fraction of the memory). With staged=True each kernel is quantized
    through the device one leaf at a time with the fp input freed
    immediately — the 7B bf16 tree is never device-resident at once
    (same trick as InferenceWeights._from_params_staged_int8).

    Ref context: the reference's raison d'etre is parameter-efficient
    7B tuning (script/1-convert.py:202-206) but its frozen base stays
    fp32/bf16 in HBM; this is the capability addition that fits
    LLaMA-7B SPT fine-tuning on one 16 GB chip.
    """
    from spt_proto_tpu.inference.weights import quantize_int8
    flat = flatten(params)
    keep = {}
    frozen = {}

    def q8(leaf):
        leaf = jnp.asarray(leaf)
        out = jax.jit(lambda w: quantize_int8(w.astype(cfg.dtype)),
                      donate_argnums=0)(leaf)
        if staged:
            jax.block_until_ready(out)
        return out

    for path, leaf in flat.items():
        if any(path.endswith(suffix) for suffix in INT8_BASE_KERNELS):
            frozen[path] = q8(leaf)
        else:
            keep[path] = leaf
    return (cfg.replace(int8_base=True), unflatten(keep),
            unflatten(frozen))


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
