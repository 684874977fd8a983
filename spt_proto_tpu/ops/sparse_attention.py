"""Fixed-top-k sparse attention: gather-SDDMM + masked softmax + SpMM.

Reference parity: the CUDA pipeline kernels.sddmm -> clamp(+-10)*scale ->
kernels.softmax (causal CSR softmax) -> kernels.spmm
(naive_gpt/layers/sparse/attention.py:105-142, extension/{sddmm,softmax,
spmm}*.{cpp,cu}). The reference stores a batched CSR with a *fixed* nnz per
row; on TPU that CSR is redundant — fixed top-k is already a rectangular
[S, K] index tensor, so the whole pipeline collapses to a gather + small
per-row dense ops that fuse. This file is the pure-jnp reference/oracle; the
fused Pallas kernel lives in ops/pallas/block_sparse_attention.py (tile-granular redesign) and must match it
to atol 1e-3 fwd+bwd (the reference's own parity bar,
test/kernel/test_sddmm.py:83-85).

Conventions
  q, k, v  [B, S, D]    (B = batch * heads, per-head dim D)
  idx      [B, S, K]    int32; slot valid iff idx <= row (covers both the
                        causal mask and the pad sentinel S; see ops/lookup.py)
  out      [B, S, D]

Numerics: scores are scaled by `scale` then clamped to +-clamp before the
softmax (ref: sparse/attention.py:125-127 keeps logits in [-10, 10] instead
of subtracting the row max). We additionally subtract the row max — a no-op
mathematically, but required for bf16 robustness.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _gather_rows(x: jax.Array, idx: jax.Array) -> jax.Array:
    """x [B, S, D], idx [B, S, K] -> x[b, idx[b, s, j], :] as [B, S, K, D]."""
    s = x.shape[-2]
    safe = jnp.minimum(idx, s - 1)
    return jax.vmap(lambda xb, ib: xb[ib])(x, safe)


def sparse_sddmm(q: jax.Array, k: jax.Array, idx: jax.Array) -> jax.Array:
    """Sampled dense-dense matmul: scores[b,s,j] = q[b,s] . k[b,idx[b,s,j]].

    Ref: extension/sddmm.cpp (cusparseSDDMM over batched CSR). Invalid slots
    return garbage values here; masking is the softmax's job, same as the
    reference where the causal mask is re-applied inline in the softmax
    kernel (extension/softmax.cu:25-28).
    """
    kg = _gather_rows(k, idx)
    return jnp.einsum('bsd,bskd->bsk', q, kg)


def sparse_masked_softmax(scores: jax.Array, idx: jax.Array) -> jax.Array:
    """Row softmax over the K slots with causal/pad masking.

    Ref: extension/softmax.cu:8-47 (predicate `index <= row`, denominator
    clamped >= 1e-9).
    """
    s = scores.shape[-2]
    row = jnp.arange(s)[None, :, None]
    valid = idx <= row
    masked = jnp.where(valid, scores, NEG_INF)
    masked = masked - jax.lax.stop_gradient(
        jnp.max(masked, axis=-1, keepdims=True))
    e = jnp.where(valid, jnp.exp(masked), 0.0)
    denom = jnp.clip(jnp.sum(e, axis=-1, keepdims=True), 1e-9, None)
    return e / denom


def sparse_spmm(probs: jax.Array, v: jax.Array, idx: jax.Array) -> jax.Array:
    """out[b,s] = sum_j probs[b,s,j] * v[b, idx[b,s,j]].

    Ref: extension/spmm.cpp (cusparseSpMM). Invalid slots carry prob 0.
    """
    vg = _gather_rows(v, idx)
    return jnp.einsum('bsk,bskd->bsd', probs, vg)


def sparse_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                     idx: jax.Array, *, scale: float,
                     clamp: float = 10.0) -> jax.Array:
    """Full sparse attention pipeline (jnp oracle).

    Ref: naive_gpt/layers/sparse/attention.py:105-142.
    """
    scores = sparse_sddmm(q, k, idx)
    scores = jnp.clip(scale * scores, -clamp, clamp)
    probs = sparse_masked_softmax(scores, idx)
    return sparse_spmm(probs, v, idx)


def dense_reference_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                              idx: jax.Array, *, scale: float,
                              clamp: float = 10.0) -> jax.Array:
    """Dense-materialized oracle for tests: build the [S, S] mask implied by
    idx, run ordinary masked softmax attention. Mirrors the oracle pattern of
    test/kernel/test_softmax.py:48-57 (dense -inf fill)."""
    b, s, d = q.shape
    row = jnp.arange(s)[None, :, None]
    valid = idx <= row
    # scatter: mask[b, s, idx] = True where valid
    mask = jnp.zeros((b, s, s + 1), dtype=bool)
    bb = jnp.arange(b)[:, None, None]
    ss = jnp.broadcast_to(row, idx.shape)
    mask = mask.at[bb, ss, jnp.where(valid, idx, s)].set(True)
    mask = mask[..., :s]
    scores = jnp.einsum('bsd,btd->bst', q, k)
    scores = jnp.clip(scale * scores, -clamp, clamp)
    scores = jnp.where(mask, scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    probs = jnp.where(mask, probs, 0.0)
    return jnp.einsum('bst,btd->bsd', probs, v)
