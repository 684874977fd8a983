"""L2 (MXU-fast) PQ metric tests: correctness vs brute force and
assignment-quality equivalence with the reference L1 metric."""
import jax
import jax.numpy as jnp
import numpy as np

from spt_proto_tpu.ops import pq


def test_l2_distances_match_bruteforce():
    n_sub, n_code, d_code = 4, 16, 8
    z = jax.random.normal(jax.random.PRNGKey(0), (32, n_sub * d_code))
    cb = jax.random.normal(jax.random.PRNGKey(1), (n_sub, n_code, d_code))
    d = np.asarray(pq.pq_distances(z, cb, 'l2'))
    zs = np.asarray(z).reshape(32, n_sub, d_code)
    brute = ((zs[:, :, None, :] - np.asarray(cb)[None]) ** 2).sum(-1)
    np.testing.assert_allclose(d, brute, atol=1e-4)
    codes = np.asarray(pq.pq_encode(z, cb, 'l2'))
    np.testing.assert_array_equal(codes, brute.argmin(-1))


def test_l2_training_reaches_l1_quality():
    """Quality gate: L2-trained codebooks quantize clustered data as well
    as L1-trained ones (the production-metric equivalence claim)."""
    import optax
    rng = np.random.RandomState(0)
    n_sub, n_code, d_code = 2, 8, 4
    centers = rng.randn(n_code, n_sub * d_code) * 3.0
    data = jnp.asarray(
        centers[rng.randint(0, n_code, size=1024)]
        + 0.1 * rng.randn(1024, n_sub * d_code), jnp.float32)

    def train(metric, steps=150):
        cb = jax.random.normal(jax.random.PRNGKey(1), (n_sub, n_code, d_code))
        opt = optax.adam(3e-2)
        st = opt.init(cb)

        @jax.jit
        def step(cb, st, batch):
            g = jax.grad(lambda c: pq.pq_train(batch, c, metric)[1])(cb)
            up, st = opt.update(g, st)
            return optax.apply_updates(cb, up), st
        for i in range(steps):
            batch = data[(i * 256) % 1024:(i * 256) % 1024 + 256]
            cb, st = step(cb, st, batch)
        return float(jnp.mean(jnp.square(
            pq.pq_quantize(data, cb, metric) - data)))

    err_l1 = train('l1')
    err_l2 = train('l2')
    assert err_l2 < err_l1 * 1.5 + 0.05, (err_l1, err_l2)


def test_l2_model_forward():
    from spt_proto_tpu.config import tiny_config
    from spt_proto_tpu.models.decoder import DecoderLM
    cfg = tiny_config('opt', attention='sparse_v2', d_codeword=4,
                      n_codewords=8, sparse_coeff=4, pq_metric='l2')
    model = DecoderLM(cfg=cfg, train_quantizer=True)
    tokens = jax.random.randint(jax.random.PRNGKey(0), (2, 32), 0,
                                cfg.vocab_size)
    variables = jax.jit(model.init)(jax.random.PRNGKey(1), tokens)
    out = model.apply(variables, tokens)
    assert np.isfinite(np.asarray(out['logits'])).all()
    assert float(out['pq_loss']) > 0.0
