"""Routed FFN tests vs a per-token loop oracle (pattern from reference
test/layer/test_sparse_ffn.py: NaiveRoutedFFN mask-based oracle, fwd + all
weight grads)."""
import jax
import jax.numpy as jnp
import numpy as np

from spt_proto_tpu.ops import routed_ffn as rops


def make_weights(key, d_model=16, d_ff=32, n_blocks=4):
    ks = jax.random.split(jax.random.PRNGKey(key), 8)
    bs = d_ff // n_blocks
    w1 = jax.random.normal(ks[0], (n_blocks, d_model, bs)) * 0.3
    b1 = jax.random.normal(ks[1], (n_blocks, bs)) * 0.1
    w2 = jax.random.normal(ks[2], (n_blocks, bs, d_model)) * 0.3
    b2 = jax.random.normal(ks[3], (d_model,)) * 0.1
    return w1, b1, w2, b2


def loop_oracle(x, probs, top_k, w1, b1, w2, b2, act):
    """Direct transcription of the reference block loop
    (sparse/feedforward.py:66-82) in numpy."""
    x, probs = np.asarray(x), np.asarray(probs)
    w1, b1, w2, b2 = map(np.asarray, (w1, b1, w2, b2))
    t, n = probs.shape
    order = np.argsort(-probs, axis=-1, kind='stable')[:, :top_k]
    y = np.zeros_like(x)
    for i in range(n):
        mask = (order == i).any(-1)
        if not mask.any():
            continue
        h = act(x[mask] @ w1[i] + b1[i])
        y[mask] += h @ w2[i]
    return y + b2


def test_masked_matches_loop_oracle():
    x = jax.random.normal(jax.random.PRNGKey(0), (24, 16))
    probs = jax.nn.sigmoid(jax.random.normal(jax.random.PRNGKey(1), (24, 4)))
    w1, b1, w2, b2 = make_weights(2)
    got = rops.routed_ffn_masked(x, probs, 2, w1, b1, w2, b2, jax.nn.relu)
    ref = loop_oracle(x, probs, 2, w1, b1, w2, b2,
                      lambda a: np.maximum(a, 0))
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)


def test_gather_matches_masked():
    x = jax.random.normal(jax.random.PRNGKey(3), (64, 16))
    probs = jax.nn.sigmoid(jax.random.normal(jax.random.PRNGKey(4), (64, 4)))
    w1, b1, w2, b2 = make_weights(5)
    ref = rops.routed_ffn_masked(x, probs, 2, w1, b1, w2, b2, jax.nn.relu)
    # ample capacity => exact
    got = rops.routed_ffn_gather(x, probs, 2, w1, b1, w2, b2, jax.nn.relu,
                                 capacity_factor=4.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_gather_grads_match_masked():
    x = jax.random.normal(jax.random.PRNGKey(6), (32, 16))
    probs_logits = jax.random.normal(jax.random.PRNGKey(7), (32, 4))
    w1, b1, w2, b2 = make_weights(8)

    def loss(fn, w1, w2):
        probs = jax.nn.sigmoid(probs_logits)
        return jnp.sum(jnp.tanh(
            fn(x, probs, 2, w1, b1, w2, b2, jax.nn.relu)))

    g_ref = jax.grad(lambda a, b: loss(rops.routed_ffn_masked, a, b),
                     argnums=(0, 1))(w1, w2)
    g_got = jax.grad(
        lambda a, b: loss(
            lambda *args, **kw: rops.routed_ffn_gather(
                *args, **kw, capacity_factor=4.0), a, b),
        argnums=(0, 1))(w1, w2)
    for a, b in zip(g_got, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_gated_masked_swiglu():
    """LLaMA-style routed SwiGLU vs loop oracle
    (ref sparse/feedforward.py:150-183)."""
    d_model, d_ff, n = 16, 32, 4
    bs = d_ff // n
    ks = jax.random.split(jax.random.PRNGKey(9), 5)
    x = jax.random.normal(ks[0], (24, d_model))
    probs = jax.nn.sigmoid(jax.random.normal(ks[1], (24, n)))
    wg = jax.random.normal(ks[2], (n, d_model, bs)) * 0.3
    wside = jax.random.normal(ks[3], (n, d_model, bs)) * 0.3
    wd = jax.random.normal(ks[4], (n, bs, d_model)) * 0.3
    got = rops.routed_ffn_gated_masked(x, probs, 1, wg, wside, wd,
                                       jax.nn.silu)
    xn, pn = np.asarray(x), np.asarray(probs)
    order = np.argsort(-pn, axis=-1, kind='stable')[:, :1]
    y = np.zeros_like(xn)
    silu = lambda a: a / (1 + np.exp(-a))
    for i in range(n):
        mask = (order == i).any(-1)
        if not mask.any():
            continue
        h = silu(xn[mask] @ np.asarray(wg)[i]) * (xn[mask] @
                                                  np.asarray(wside)[i])
        y[mask] += h @ np.asarray(wd)[i]
    np.testing.assert_allclose(np.asarray(got), y, atol=1e-5)


def test_lora_coeff_path_router_grads():
    """The 2*prob coeff makes router weights differentiable
    (ref tuning/lora_ffn.py:92-111)."""
    d_model, d_ff, n, r = 16, 32, 4, 4
    bs = d_ff // n
    ks = jax.random.split(jax.random.PRNGKey(10), 9)
    x = jax.random.normal(ks[0], (24, d_model))
    w1 = jax.random.normal(ks[1], (n, d_model, bs)) * 0.3
    b1 = jnp.zeros((n, bs))
    w2 = jax.random.normal(ks[2], (n, bs, d_model)) * 0.3
    b2 = jnp.zeros((d_model,))
    ll1 = jax.random.normal(ks[3], (d_model, r))
    lr1 = jnp.zeros((n, bs, r))
    ll2 = jnp.zeros((n, bs, r))
    lr2 = jnp.zeros((d_model, r))
    router_w = jax.random.normal(ks[4], (d_model, n)) * 0.3

    def loss(router_w):
        probs = jax.nn.sigmoid(x @ router_w)
        y = rops.routed_ffn_lora(x, probs, 2, w1, b1, w2, b2,
                                 ll1, lr1, ll2, lr2, jax.nn.relu)
        return jnp.sum(jnp.square(y))

    g = jax.grad(loss)(router_w)
    assert float(jnp.sum(jnp.abs(g))) > 0.0


def test_lora_zero_init_matches_plain_routed_with_coeff():
    """With zero LoRA factors, the LoRA path reduces to coeff-scaled routed
    FFN: at prob=0.5 exactly, coeff=1 and it equals the plain routed FFN."""
    d_model, d_ff, n, r = 16, 32, 4, 2
    bs = d_ff // n
    x = jax.random.normal(jax.random.PRNGKey(11), (8, d_model))
    w1, b1, w2, b2 = make_weights(12)
    probs = jnp.full((8, n), 0.5)
    y_lora = rops.routed_ffn_lora(
        x, probs, 2, w1, b1, w2, b2,
        jnp.zeros((d_model, r)), jnp.zeros((n, bs, r)),
        jnp.zeros((n, bs, r)), jnp.zeros((d_model, r)), jax.nn.relu)
    y_plain = rops.routed_ffn_masked(x, probs, 2, w1, b1, w2, b2,
                                     jax.nn.relu)
    np.testing.assert_allclose(np.asarray(y_lora), np.asarray(y_plain),
                               atol=1e-5)
