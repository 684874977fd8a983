"""PQ op tests. Oracle pattern from reference test/kernel/test_cdist.py
(vs torch.cdist p=1 + argmin + gather) re-expressed against numpy."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spt_proto_tpu.ops import pq


def _rand(key, *shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape)


def numpy_l1_cdist(z, cb):
    # z [..., n_sub, d], cb [n_sub, n_code, d]
    return np.abs(z[..., None, :] - cb).sum(-1)


def test_distances_and_encode():
    n_sub, n_code, d_code = 4, 16, 8
    z = _rand(0, 32, n_sub * d_code)
    cb = _rand(1, n_sub, n_code, d_code)
    d = pq.pq_distances(z, cb)
    zs = np.asarray(z).reshape(32, n_sub, d_code)
    ref = numpy_l1_cdist(zs, np.asarray(cb))
    np.testing.assert_allclose(np.asarray(d), ref, atol=1e-5)
    codes = pq.pq_encode(z, cb)
    np.testing.assert_array_equal(np.asarray(codes), ref.argmin(-1))


def test_decode_roundtrip():
    n_sub, n_code, d_code = 2, 4, 8
    cb = _rand(2, n_sub, n_code, d_code)
    codes = jax.random.randint(jax.random.PRNGKey(3), (5, 7, n_sub), 0, n_code)
    z = pq.pq_decode(codes, cb)
    assert z.shape == (5, 7, n_sub * d_code)
    # decoding codes of a codebook vector returns it exactly
    flat_cb = np.asarray(cb).transpose(1, 0, 2).reshape(n_code, -1)
    enc = pq.pq_encode(jnp.asarray(flat_cb), cb)
    dec = pq.pq_decode(enc, cb)
    np.testing.assert_allclose(np.asarray(dec), flat_cb, atol=1e-6)


def test_train_loss_zero_at_centroids():
    """If inputs sit exactly on codewords, the hard-assignment loss term
    vanishes and the gradient pulls codewords together only via the soft
    term (ref quantizer.py:97-108 semantics)."""
    n_sub, n_code, d_code = 2, 8, 4
    cb = _rand(4, n_sub, n_code, d_code)
    flat_cb = np.asarray(cb).transpose(1, 0, 2).reshape(n_code, -1)
    z_q, loss = pq.pq_train(jnp.asarray(flat_cb), cb)
    np.testing.assert_allclose(np.asarray(z_q), flat_cb, atol=1e-6)
    # loss_q term is exactly 0; loss_w >= 0 remains
    _, loss_far = pq.pq_train(_rand(5, 16, n_sub * d_code) * 10.0, cb)
    assert float(loss_far) > float(loss)


def test_train_gradients_flow():
    n_sub, n_code, d_code = 2, 4, 4
    cb = _rand(6, n_sub, n_code, d_code)
    z = _rand(7, 8, n_sub * d_code)

    def loss_fn(cb, z):
        return pq.pq_train(z, cb)[1]

    g_cb, g_z = jax.grad(loss_fn, argnums=(0, 1))(cb, z)
    assert np.isfinite(np.asarray(g_cb)).all()
    assert np.isfinite(np.asarray(g_z)).all()
    assert np.abs(np.asarray(g_cb)).sum() > 0
    assert np.abs(np.asarray(g_z)).sum() > 0


def test_pq_training_improves_assignment():
    """Quality-gate descendant of reference test/layer/test_pq_2.py (blobs
    k-means-like training): SGD on the PQ loss must reduce quantization
    error on clustered data."""
    import optax
    rng = np.random.RandomState(0)
    n_sub, n_code, d_code = 2, 8, 4
    centers = rng.randn(n_code, n_sub * d_code) * 3.0
    assign = rng.randint(0, n_code, size=2048)
    data = centers[assign] + 0.1 * rng.randn(2048, n_sub * d_code)
    data = jnp.asarray(data, jnp.float32)

    cb = jax.random.normal(jax.random.PRNGKey(0), (n_sub, n_code, d_code))
    opt = optax.adam(3e-2)
    state = opt.init(cb)

    @jax.jit
    def step(cb, state, batch):
        loss, g = jax.value_and_grad(lambda c: pq.pq_train(batch, c)[1])(cb)
        up, state = opt.update(g, state)
        return optax.apply_updates(cb, up), state, loss

    def qerr(cb):
        return float(jnp.mean(jnp.square(pq.pq_quantize(data, cb) - data)))

    err0 = qerr(cb)
    for i in range(200):
        batch = data[(i * 256) % 2048:(i * 256) % 2048 + 256]
        cb, state, loss = step(cb, state, batch)
    err1 = qerr(cb)
    assert err1 < err0 * 0.5, (err0, err1)
