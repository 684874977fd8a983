"""Model-level tests: shapes, dense-vs-manual attention oracle, rope, norms.
Oracle pattern from reference test/layer/test_attn.py (custom MHA vs
framework reference) and test/layer/test_lora.py (zero-init invariance)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spt_proto_tpu.config import tiny_config
from spt_proto_tpu.layers.common import apply_rope, rope_cos_sin
from spt_proto_tpu.models.decoder import DecoderLM


@pytest.mark.parametrize('arch', ['opt', 'llama'])
def test_forward_shapes(arch):
    cfg = tiny_config(arch)
    model = DecoderLM(cfg=cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(0), (2, 16), 0,
                                cfg.vocab_size)
    variables = jax.jit(model.init)(jax.random.PRNGKey(1), tokens)
    out = model.apply(variables, tokens)
    assert out['logits'].shape == (2, 16, cfg.vocab_size)
    assert np.isfinite(np.asarray(out['logits'])).all()
    assert out['pq_loss'].shape == ()


def test_causality():
    """Changing a future token must not change past logits."""
    cfg = tiny_config('opt')
    model = DecoderLM(cfg=cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(0), (1, 16), 0,
                                cfg.vocab_size)
    variables = jax.jit(model.init)(jax.random.PRNGKey(1), tokens)
    out1 = model.apply(variables, tokens)['logits']
    tokens2 = tokens.at[0, 10].set((tokens[0, 10] + 1) % cfg.vocab_size)
    out2 = model.apply(variables, tokens2)['logits']
    np.testing.assert_allclose(np.asarray(out1[0, :10]),
                               np.asarray(out2[0, :10]), atol=1e-5)
    assert not np.allclose(np.asarray(out1[0, 10:]),
                           np.asarray(out2[0, 10:]), atol=1e-5)


def test_rope_rotation_invariance():
    """RoPE inner products depend only on relative position."""
    d = 32
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 1, d))
    cos1, sin1 = rope_cos_sin(jnp.arange(8), d)
    cos2, sin2 = rope_cos_sin(jnp.arange(8) + 5, d)
    q1 = np.asarray(apply_rope(x, cos1, sin1))
    q2 = np.asarray(apply_rope(x, cos2, sin2))
    # dot between positions (i, j) equals dot between (i+5, j+5)
    d1 = (q1[0, 3, 0] * q1[0, 6, 0]).sum()
    d2 = (q2[0, 3, 0] * q2[0, 6, 0]).sum()
    np.testing.assert_allclose(d1, d2, rtol=1e-4)


@pytest.mark.parametrize('arch', ['opt', 'llama'])
def test_sparse_v2_forward(arch):
    cfg = tiny_config(arch, attention='sparse_v2', d_codeword=4,
                      n_codewords=8, sparse_coeff=4)
    model = DecoderLM(cfg=cfg, train_quantizer=True)
    tokens = jax.random.randint(jax.random.PRNGKey(0), (2, 32), 0,
                                cfg.vocab_size)
    variables = jax.jit(model.init)(jax.random.PRNGKey(1), tokens)
    out = model.apply(variables, tokens)
    assert np.isfinite(np.asarray(out['logits'])).all()
    assert float(out['pq_loss']) > 0.0


def test_routed_ffn_forward():
    cfg = tiny_config('opt', ffn='routed', ffn_block_size=32)
    model = DecoderLM(cfg=cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(0), (2, 16), 0,
                                cfg.vocab_size)
    variables = jax.jit(model.init)(jax.random.PRNGKey(1), tokens)
    out = model.apply(variables, tokens)
    assert np.isfinite(np.asarray(out['logits'])).all()


def test_positions_override_matches_default():
    cfg = tiny_config('opt')
    model = DecoderLM(cfg=cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(0), (1, 8), 0,
                                cfg.vocab_size)
    variables = jax.jit(model.init)(jax.random.PRNGKey(1), tokens)
    out1 = model.apply(variables, tokens)['logits']
    pos = jnp.broadcast_to(jnp.arange(8)[None, :], (1, 8))
    out2 = model.apply(variables, tokens, pos)['logits']
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))
