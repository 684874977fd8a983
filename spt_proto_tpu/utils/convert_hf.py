"""HuggingFace -> native checkpoint conversion for OPT and LLaMA.

Reference parity: script/1-convert.py (name-by-name state-dict remap with a
strict fully-consumed check and an output-parity test at atol 1e-3). The
native layout stacks per-layer weights along a leading [n_layers] axis to
match the scanned block params (models/decoder.py) — which is also the
natural sharding axis for FSDP/pipeline.

torch is used only as a weight reader (CPU); no torch op runs in the model.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np

from spt_proto_tpu.config import ModelConfig
from spt_proto_tpu.utils.tree import unflatten


def _np(t) -> np.ndarray:
    # ascontiguousarray matters: strided views (e.g. .T) make XLA host
    # transfers pathologically slow
    return np.ascontiguousarray(
        t.detach().cpu().numpy().astype(np.float32))


def _stack(sd: Dict[str, Any], n_layers: int, fmt: str, *,
           transpose: bool = False) -> np.ndarray:
    mats = []
    for i in range(n_layers):
        a = _np(sd.pop(fmt.format(i=i)))
        mats.append(a.T if transpose else a)
    return np.ascontiguousarray(np.stack(mats))


def convert_opt(hf_model, cfg: ModelConfig) -> Any:
    """OPTForCausalLM -> native params (ref script/1-convert.py:9-77)."""
    sd = dict(hf_model.state_dict())
    n = cfg.n_layers
    flat: Dict[str, np.ndarray] = {}
    flat['embedding/embedding'] = _np(sd.pop(
        'model.decoder.embed_tokens.weight'))
    flat['learned_pe/embedding'] = _np(sd.pop(
        'model.decoder.embed_positions.weight'))
    pre = 'model.decoder.layers.{i}.'
    for ours, theirs in (('q', 'self_attn.q_proj'), ('k', 'self_attn.k_proj'),
                         ('v', 'self_attn.v_proj'),
                         ('o', 'self_attn.out_proj')):
        flat[f'blocks/mha/{ours}/kernel'] = _stack(
            sd, n, pre + theirs + '.weight', transpose=True)
        flat[f'blocks/mha/{ours}/bias'] = _stack(
            sd, n, pre + theirs + '.bias')
    flat['blocks/norm1/scale'] = _stack(
        sd, n, pre + 'self_attn_layer_norm.weight')
    flat['blocks/norm1/bias'] = _stack(
        sd, n, pre + 'self_attn_layer_norm.bias')
    flat['blocks/norm2/scale'] = _stack(
        sd, n, pre + 'final_layer_norm.weight')
    flat['blocks/norm2/bias'] = _stack(
        sd, n, pre + 'final_layer_norm.bias')
    for fc in ('fc1', 'fc2'):
        flat[f'blocks/ffn/{fc}/kernel'] = _stack(
            sd, n, pre + fc + '.weight', transpose=True)
        flat[f'blocks/ffn/{fc}/bias'] = _stack(sd, n, pre + fc + '.bias')
    flat['final_norm/scale'] = _np(sd.pop(
        'model.decoder.final_layer_norm.weight'))
    flat['final_norm/bias'] = _np(sd.pop(
        'model.decoder.final_layer_norm.bias'))
    flat['lm_head/kernel'] = np.ascontiguousarray(
        _np(sd.pop('lm_head.weight')).T)
    _check_consumed(sd)
    return unflatten(flat)


def convert_llama(hf_model, cfg: ModelConfig) -> Any:
    """LlamaForCausalLM -> native params (ref script/1-convert.py:81-133).

    HF LLaMA uses the same rotate-half RoPE convention as
    layers/common.py::apply_rope, so projections copy over without
    permutation.
    """
    sd = dict(hf_model.state_dict())
    n = cfg.n_layers
    flat: Dict[str, np.ndarray] = {}
    flat['embedding/embedding'] = _np(sd.pop('model.embed_tokens.weight'))
    pre = 'model.layers.{i}.'
    for ours, theirs in (('q', 'self_attn.q_proj'), ('k', 'self_attn.k_proj'),
                         ('v', 'self_attn.v_proj'),
                         ('o', 'self_attn.o_proj')):
        flat[f'blocks/mha/{ours}/kernel'] = _stack(
            sd, n, pre + theirs + '.weight', transpose=True)
    flat['blocks/norm1/scale'] = _stack(
        sd, n, pre + 'input_layernorm.weight')
    flat['blocks/norm2/scale'] = _stack(
        sd, n, pre + 'post_attention_layernorm.weight')
    for ours, theirs in (('gate', 'gate_proj'), ('side', 'up_proj'),
                         ('down', 'down_proj')):
        flat[f'blocks/ffn/{ours}/kernel'] = _stack(
            sd, n, pre + 'mlp.' + theirs + '.weight', transpose=True)
    flat['final_norm/scale'] = _np(sd.pop('model.norm.weight'))
    if 'lm_head.weight' in sd:
        flat['lm_head/kernel'] = np.ascontiguousarray(
            _np(sd.pop('lm_head.weight')).T)
    else:
        # tied-embedding checkpoints omit lm_head (tie_word_embeddings=True):
        # the logit projection is the token embedding transposed
        flat['lm_head/kernel'] = np.ascontiguousarray(
            flat['embedding/embedding'].T)
    _check_consumed(sd)
    return unflatten(flat)


def _check_consumed(sd: Dict[str, Any]) -> None:
    """Strict fully-consumed check (ref 1-convert.py:77). Rotary inv_freq
    buffers and other non-param buffers are permitted leftovers."""
    leftovers = [k for k in sd
                 if 'rotary_emb' not in k and 'inv_freq' not in k]
    if leftovers:
        raise KeyError(f'unconsumed HF weights: {leftovers}')


def config_from_hf(hf_config) -> ModelConfig:
    """Derive a ModelConfig from an HF config object
    (ref 1-convert.py:155-164).

    DELIBERATE DIVERGENCE — p_dropout=0.0: reference OPT fine-tunes with
    the checkpoint's dropout (0.1), but dropout inside attention forces
    the S x S-materializing path (flash kernels have no in-kernel RNG
    here), costing the memory win that motivates the whole design, and
    LoRA-style fine-tunes conventionally run dropout-free (the trainable
    set is tiny; regularization pressure is minimal). Opt back in with
    cfg.replace(p_dropout=...) — training falls back to the exact jnp
    path, which remains correct, just S x S."""
    mt = hf_config.model_type
    if mt == 'opt':
        return ModelConfig(
            arch='opt', d_model=hf_config.hidden_size,
            n_heads=hf_config.num_attention_heads,
            n_layers=hf_config.num_hidden_layers,
            max_length=hf_config.max_position_embeddings,
            vocab_size=hf_config.vocab_size,
            d_feedforward=hf_config.ffn_dim, p_dropout=0.0)
    if mt == 'llama':
        n_kv = getattr(hf_config, 'num_key_value_heads',
                       hf_config.num_attention_heads)
        return ModelConfig(
            arch='llama', d_model=hf_config.hidden_size,
            n_heads=hf_config.num_attention_heads,
            n_layers=hf_config.num_hidden_layers,
            n_kv_heads=None if n_kv == hf_config.num_attention_heads
            else n_kv,
            max_length=hf_config.max_position_embeddings,
            vocab_size=hf_config.vocab_size,
            d_feedforward=hf_config.intermediate_size, p_dropout=0.0,
            rope_base=float(getattr(hf_config, 'rope_theta', 10000.0)))
    raise ValueError(f'unsupported model type {mt!r}')


def convert(hf_model) -> tuple[ModelConfig, Any]:
    cfg = config_from_hf(hf_model.config)
    if cfg.arch == 'opt':
        return cfg, convert_opt(hf_model, cfg)
    return cfg, convert_llama(hf_model, cfg)
