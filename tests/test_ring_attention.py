"""Ring attention vs dense causal attention on an 8-device sequence ring."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P


def dense_ref(q, k, v, scale, causal=True):
    s = jnp.einsum('bhid,bhjd->bhij', q, k) * scale
    if causal:
        n = q.shape[2]
        mask = jnp.tril(jnp.ones((n, n), bool))
        s = jnp.where(mask, s, -jnp.inf)
    return jnp.einsum('bhij,bhjd->bhid', jax.nn.softmax(s, -1), v)


@pytest.mark.parametrize('causal', [True, False])
def test_ring_matches_dense(causal):
    from spt_proto_tpu.ops.ring_attention import ring_attention
    devs = np.asarray(jax.devices()[:8])
    mesh = Mesh(devs, ('sp',))
    b, h, s, d = 2, 2, 64, 16
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (b, h, s, d)) for kk in ks)
    scale = d ** -0.5
    ref = dense_ref(q, k, v, scale, causal)
    sh = NamedSharding(mesh, P(None, None, 'sp', None))
    qs, ks_, vs = (jax.device_put(x, sh) for x in (q, k, v))
    out = jax.jit(lambda q, k, v: ring_attention(
        q, k, v, mesh=mesh, scale=scale, causal=causal))(qs, ks_, vs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ring_gradients():
    from spt_proto_tpu.ops.ring_attention import ring_attention
    devs = np.asarray(jax.devices()[:4])
    mesh = Mesh(devs, ('sp',))
    b, h, s, d = 1, 2, 32, 8
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q, k, v = (jax.random.normal(kk, (b, h, s, d)) for kk in ks)
    scale = d ** -0.5

    def loss_ring(q, k, v):
        return jnp.sum(jnp.tanh(ring_attention(q, k, v, mesh=mesh,
                                               scale=scale)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.tanh(dense_ref(q, k, v, scale)))

    sh = NamedSharding(mesh, P(None, None, 'sp', None))
    g1 = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(
        *(jax.device_put(x, sh) for x in (q, k, v)))
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)
