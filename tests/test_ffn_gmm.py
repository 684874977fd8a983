"""Grouped-matmul routed FFN tests (megablox, interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from spt_proto_tpu.ops import routed_ffn as rops


def weights(key, d_model=16, d_ff=32, n=4, r=4):
    ks = jax.random.split(jax.random.PRNGKey(key), 10)
    bs = d_ff // n
    return dict(
        x=jax.random.normal(ks[0], (24, d_model)),
        probs=jax.nn.sigmoid(jax.random.normal(ks[1], (24, n))),
        w1=jax.random.normal(ks[2], (n, d_model, bs)) * 0.3,
        b1=jax.random.normal(ks[3], (n, bs)) * 0.1,
        w2=jax.random.normal(ks[4], (n, bs, d_model)) * 0.3,
        b2=jax.random.normal(ks[5], (d_model,)) * 0.1,
        ll1=jax.random.normal(ks[6], (d_model, r)) * 0.5,
        lr1=jax.random.normal(ks[7], (n, bs, r)) * 0.5,
        ll2=jax.random.normal(ks[8], (n, bs, r)) * 0.5,
        lr2=jax.random.normal(ks[9], (d_model, r)) * 0.5)


def test_gmm_matches_masked():
    w = weights(0)
    ref = rops.routed_ffn_masked(w['x'], w['probs'], 2, w['w1'], w['b1'],
                                 w['w2'], w['b2'], jax.nn.relu)
    got = rops.routed_ffn_gmm(w['x'], w['probs'], 2, w['w1'], w['b1'],
                              w['w2'], w['b2'], jax.nn.relu, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_lora_gmm_matches_lora_masked():
    w = weights(1)
    args = (w['x'], w['probs'], 2, w['w1'], w['b1'], w['w2'], w['b2'],
            w['ll1'], w['lr1'], w['ll2'], w['lr2'], jax.nn.relu)
    ref = rops.routed_ffn_lora(*args)
    got = rops.routed_ffn_lora_gmm(*args, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_lora_gmm_grads():
    w = weights(2)

    def loss(fn, w1, lr1):
        return jnp.sum(jnp.tanh(fn(
            w['x'], w['probs'], 2, w1, w['b1'], w['w2'], w['b2'],
            w['ll1'], lr1, w['ll2'], w['lr2'], jax.nn.relu)))

    g1 = jax.grad(lambda a, b: loss(
        lambda *args: rops.routed_ffn_lora_gmm(*args, interpret=True), a, b),
        argnums=(0, 1))(w['w1'], w['lr1'])
    g2 = jax.grad(lambda a, b: loss(rops.routed_ffn_lora, a, b),
                  argnums=(0, 1))(w['w1'], w['lr1'])
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_model_with_gmm_ffn_matches_masked():
    from spt_proto_tpu.config import tiny_config
    from spt_proto_tpu.models.decoder import DecoderLM
    cfg_m = tiny_config('opt', ffn='routed', ffn_block_size=32, d_lora=4)
    cfg_g = cfg_m.replace(ffn_impl='gmm')
    tokens = jax.random.randint(jax.random.PRNGKey(0), (4, 64), 0,
                                cfg_m.vocab_size)
    model_m = DecoderLM(cfg=cfg_m)
    variables = jax.jit(model_m.init)(jax.random.PRNGKey(1), tokens)
    out_m = model_m.apply(variables, tokens)['logits']
    out_g = DecoderLM(cfg=cfg_g).apply(variables, tokens)['logits']
    np.testing.assert_allclose(np.asarray(out_g), np.asarray(out_m),
                               atol=5e-5)
