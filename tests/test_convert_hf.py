"""HF conversion parity: random-init tiny HF models vs converted native
models, logits atol 1e-3 (ref script/1-convert.py:169-181)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip('torch')
transformers = pytest.importorskip('transformers')
torch.set_num_threads(1)  # avoid OMP/XLA threadpool contention

from spt_proto_tpu.models.decoder import DecoderLM
from spt_proto_tpu.utils import convert_hf


def _parity(hf_model, tokens_np, atol=1e-3):
    cfg, params = convert_hf.convert(hf_model)
    params = jax.device_put(params)
    model = DecoderLM(cfg=cfg)
    ours = np.asarray(jax.jit(
        lambda p, t: model.apply({'params': p}, t)['logits'])(
            params, jnp.asarray(tokens_np)))
    with torch.no_grad():
        theirs = hf_model(torch.from_numpy(tokens_np)).logits.numpy()
    np.testing.assert_allclose(ours, theirs, atol=atol)


def test_opt_parity():
    hf_cfg = transformers.OPTConfig(
        hidden_size=64, num_hidden_layers=2, ffn_dim=128,
        num_attention_heads=4, max_position_embeddings=64, vocab_size=128,
        do_layer_norm_before=True, dropout=0.0, activation_function='relu',
        word_embed_proj_dim=64)
    torch.manual_seed(0)
    hf = transformers.OPTForCausalLM(hf_cfg).eval()
    tokens = np.random.RandomState(0).randint(0, 128, size=(2, 16))
    _parity(hf, tokens.astype(np.int64))


def test_llama_parity():
    hf_cfg = transformers.LlamaConfig(
        hidden_size=64, num_hidden_layers=2, intermediate_size=128,
        num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64, vocab_size=128)
    torch.manual_seed(1)
    hf = transformers.LlamaForCausalLM(hf_cfg).eval()
    tokens = np.random.RandomState(1).randint(0, 128, size=(2, 16))
    _parity(hf, tokens.astype(np.int64))


def test_llama3_style_parity():
    """Llama-3-style config: non-default rope_theta + tied embeddings.

    Guards the rope_base threading (config_from_hf must read
    hf_config.rope_theta) and the tied-lm_head fallback in convert_llama."""
    hf_cfg = transformers.LlamaConfig(
        hidden_size=64, num_hidden_layers=2, intermediate_size=128,
        num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, vocab_size=128,
        rope_theta=500000.0, tie_word_embeddings=True)
    torch.manual_seed(3)
    hf = transformers.LlamaForCausalLM(hf_cfg).eval()
    cfg, _ = convert_hf.convert(hf)
    assert cfg.rope_base == 500000.0
    tokens = np.random.RandomState(3).randint(0, 128, size=(2, 16))
    _parity(hf, tokens.astype(np.int64))


def test_llama_gqa_parity():
    hf_cfg = transformers.LlamaConfig(
        hidden_size=64, num_hidden_layers=2, intermediate_size=128,
        num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, vocab_size=128)
    torch.manual_seed(2)
    hf = transformers.LlamaForCausalLM(hf_cfg).eval()
    tokens = np.random.RandomState(2).randint(0, 128, size=(2, 16))
    _parity(hf, tokens.astype(np.int64))
