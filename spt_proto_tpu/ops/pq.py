"""Product-quantization core math (pure jnp — the L2 form lowers to MXU
matmuls directly, so no hand-written kernel is needed; see pq_distances_l2).

Reference parity: naive_gpt/layers/basic/quantizer.py (PQBase forward modes
encode/decode/quantize/train) and extension/cdist.cu (batched L1 cdist +
argmin in one pass). The TPU design keeps the math identical but expresses it
functionally: a codebook array is threaded in, and the train mode returns the
auxiliary loss instead of stashing it in a module buffer.

Shapes
  z         [..., n_subspaces * d_codeword]   vectors to be coded
  codebook  [n_subspaces, n_codewords, d_codeword]
  codes     [..., n_subspaces] int32
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def pq_distances(z: jax.Array, codebook: jax.Array,
                 metric: str = 'l1') -> jax.Array:
    """Per-subspace distances to every codeword.

    Returns [..., n_subspaces, n_codewords] (float32 accumulate).

    metric='l1' is the reference's distance (extension/cdist.cu:8-69,
    torch.cdist p=1) — elementwise VPU work. metric='l2' returns SQUARED
    Euclidean distances computed as ||z||^2 - 2 z.c + ||c||^2, which puts
    the dominant term on the MXU and is ~100x faster on TPU at model
    shapes; since the codebook is trained under the same metric, assignment
    quality is equivalent (tested in tests/test_ops_pq.py).
    """
    n_sub, n_code, d_code = codebook.shape
    if metric == 'l2':
        zs = z.reshape(*z.shape[:-1], n_sub, d_code).astype(jnp.float32)
        cb = codebook.astype(jnp.float32)
        dots = jnp.einsum('...sd,scd->...sc', zs, cb,
                          preferred_element_type=jnp.float32)
        z_norm = jnp.sum(zs * zs, axis=-1, keepdims=True)
        cb_norm = jnp.sum(cb * cb, axis=-1)
        return z_norm - 2.0 * dots + cb_norm
    assert metric == 'l1', metric
    zs = z.reshape(*z.shape[:-1], n_sub, 1, d_code)
    return jnp.sum(jnp.abs(zs - codebook), axis=-1)


def pq_encode(z: jax.Array, codebook: jax.Array,
              metric: str = 'l1') -> jax.Array:
    """Vectors -> int32 codes [..., n_subspaces]. Ref: quantizer.py 'encode'."""
    if metric == 'l2':
        # argmin of ||z||^2 - 2 z.c + ||c||^2 over codes: z-norm is constant
        # per row, so only the MXU dot + codeword norms matter.
        n_sub, n_code, d_code = codebook.shape
        zs = z.reshape(*z.shape[:-1], n_sub, d_code).astype(jnp.float32)
        cb = codebook.astype(jnp.float32)
        dots = jnp.einsum('...sd,scd->...sc', zs, cb,
                          preferred_element_type=jnp.float32)
        cb_norm = jnp.sum(cb * cb, axis=-1)
        return jnp.argmin(cb_norm - 2.0 * dots, axis=-1).astype(jnp.int32)
    d = pq_distances(z, codebook, metric)
    return jnp.argmin(d, axis=-1).astype(jnp.int32)


def pq_decode(codes: jax.Array, codebook: jax.Array) -> jax.Array:
    """Codes -> centroid vectors [..., n_subspaces * d_codeword].

    Ref: quantizer.py 'decode' (gather of codebook rows).
    """
    n_sub, n_code, d_code = codebook.shape
    # codes [..., n_sub]; one gather per subspace. take_along_axis over axis 1.
    sub = jnp.arange(n_sub)
    z_q = codebook[sub, codes]          # [..., n_sub, d_code]
    return z_q.reshape(*codes.shape[:-1], n_sub * d_code)


def pq_quantize(z: jax.Array, codebook: jax.Array,
                metric: str = 'l1') -> jax.Array:
    """Round-trip z -> nearest centroids. Ref: quantizer.py 'quantize'."""
    return pq_decode(pq_encode(z, codebook, metric), codebook)


def pq_train(z: jax.Array, codebook: jax.Array,
             metric: str = 'l1') -> tuple[jax.Array, jax.Array]:
    """Training mode: returns (z_q, loss).

    loss = MSE(z_w, z_q) + MSE(z, z_q) where z_w is the soft assignment
    softmax(-log d) @ codebook == (1/d)/sum(1/d) weighted centroid mix.
    Ref: quantizer.py:94-111 (distance clamped >= 1e-5; no stop-gradients —
    gradients flow to both the inputs and the codebook, matching the torch
    MSELoss-on-differentiable-target behaviour). With metric='l2' the same
    construction runs on squared Euclidean distances (clamped positive).
    """
    n_sub, n_code, d_code = codebook.shape
    d = pq_distances(z, codebook, metric)               # [..., n_sub, n_code]
    if metric == 'l2':
        d = jnp.clip(d, 0.0, None)                      # kill -eps roundoff
    idx = jnp.argmin(d, axis=-1)                        # [..., n_sub]
    # hard centroids via one-hot matmul rather than a gather: the VJP of a
    # gather is a scatter-add (slow on TPU); the one-hot form backprops to
    # the codebook through an MXU matmul instead — identical values
    hard = jax.nn.one_hot(idx, n_code, dtype=codebook.dtype)
    z_q_flat = jnp.einsum('...sc,scd->...sd', hard, codebook)
    d = jnp.clip(d, 1e-5, None)
    attn = jax.nn.softmax(-jnp.log(d), axis=-1)         # inverse-distance weights
    z_w = jnp.einsum('...sc,scd->...sd', attn, codebook)
    zs = z.reshape(*z.shape[:-1], n_sub, d_code)
    loss_w = jnp.mean(jnp.square(z_w - z_q_flat))
    loss_q = jnp.mean(jnp.square(zs - z_q_flat))
    z_q = z_q_flat.reshape(z.shape)
    return z_q, loss_w + loss_q
