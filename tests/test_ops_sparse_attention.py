"""Sparse attention oracle tests: gather pipeline vs dense-materialized
attention (pattern from reference test/kernel/test_{sddmm,softmax,spmm}.py:
random top-k masks, fwd + grads, atol 1e-3)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spt_proto_tpu.ops.sparse_attention import (dense_reference_attention,
                                                sparse_attention,
                                                sparse_masked_softmax,
                                                sparse_sddmm, sparse_spmm)


def random_case(key, b=2, s=32, d=16, k=8):
    ks = jax.random.split(jax.random.PRNGKey(key), 4)
    q = jax.random.normal(ks[0], (b, s, d))
    k_ = jax.random.normal(ks[1], (b, s, d))
    v = jax.random.normal(ks[2], (b, s, d))
    # random distinct causal indices per row + sentinel padding
    rng = np.random.RandomState(key)
    idx = np.full((b, s, k), s, dtype=np.int32)
    for bi in range(b):
        for row in range(s):
            n = min(row + 1, k)
            idx[bi, row, :n] = rng.choice(row + 1, size=n, replace=False)
    return q, k_, v, jnp.asarray(idx)


def test_pipeline_matches_dense_oracle():
    q, k, v, idx = random_case(0)
    scale = q.shape[-1] ** -0.5
    out = sparse_attention(q, k, v, idx, scale=scale)
    ref = dense_reference_attention(q, k, v, idx, scale=scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3)


def test_softmax_rows_sum_to_one():
    q, k, v, idx = random_case(1)
    scores = sparse_sddmm(q, k, idx)
    probs = sparse_masked_softmax(scores, idx)
    sums = np.asarray(jnp.sum(probs, axis=-1))
    np.testing.assert_allclose(sums, 1.0, atol=1e-5)
    # invalid slots carry zero probability
    row = np.arange(q.shape[1])[None, :, None]
    assert (np.asarray(probs)[np.asarray(idx) > row] == 0).all()


def test_gradients_match_dense_oracle():
    q, k, v, idx = random_case(2)
    scale = q.shape[-1] ** -0.5

    def f_sparse(q, k, v):
        return jnp.sum(jnp.sin(sparse_attention(q, k, v, idx, scale=scale)))

    def f_dense(q, k, v):
        return jnp.sum(jnp.sin(
            dense_reference_attention(q, k, v, idx, scale=scale)))

    gs = jax.grad(f_sparse, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(f_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gs, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_degenerate_full_topk_equals_dense_attention():
    """k = S with all causal columns present ==> sparse == ordinary causal
    attention (reference checks the same degenerate equivalence in
    test/layer/test_sparse_mha.py:37-40)."""
    b, s, d = 2, 16, 8
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    q, k, v = (jax.random.normal(kk, (b, s, d)) for kk in ks)
    idx = np.full((b, s, s), s, dtype=np.int32)
    for row in range(s):
        idx[:, row, :row + 1] = np.arange(row + 1)
    idx = jnp.asarray(idx)
    scale = d ** -0.5
    out = sparse_attention(q, k, v, idx, scale=scale, clamp=1e9)
    causal = jnp.tril(jnp.ones((s, s), dtype=bool))
    scores = jnp.where(causal, scale * jnp.einsum('bsd,btd->bst', q, k),
                       -jnp.inf)
    ref = jnp.einsum('bst,btd->bsd', jax.nn.softmax(scores, -1), v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_clamp_applied():
    q, k, v, idx = random_case(4)
    big_q = q * 100.0
    out = sparse_attention(big_q, k, v, idx, scale=1.0, clamp=10.0)
    assert np.isfinite(np.asarray(out)).all()
