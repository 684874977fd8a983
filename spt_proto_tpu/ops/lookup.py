"""PQ-code candidate selection: approximate top-k attention columns per row.

Reference parity: extension/lookup.cu (bucket-by-match-count candidate
emission) and naive_gpt/kernels/lookup.py. The reference kernel is a CUDA
shared-memory bucketing idiom with data-dependent cursors; the TPU-native
replacement computes the *same score* (number of matching PQ subspace codes
between a query row and each causal key column) as a one-hot matmul that runs
on the MXU, then takes an exact per-row top-k. The contract carried over is
statistical: recall > 0.8 against exact match-count top-k
(test/kernel/test_lookup.py:73-75) — ours is exact by construction (modulo
ties), so it strictly dominates the reference heuristic.

Conventions
  codes           [..., S, n_subspaces] int32 in [0, n_codewords)
  returned idx    [..., S, top_k] int32, causally valid entries in [0, S);
                  padding slots hold the sentinel value S (rows with fewer
                  than top_k causal candidates). Downstream sparse attention
                  masks a slot iff idx > row, so the sentinel needs no
                  special-casing.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def pq_match_scores(q_codes: jax.Array, k_codes: jax.Array,
                    n_codewords: int) -> jax.Array:
    """Count matching subspace codes for every (row, col) pair.

    Returns [..., S_q, S_k] float32 counts in [0, n_subspaces]. Implemented as
    a one-hot inner product so the O(S^2 * n_sub * n_code) work lands on the
    MXU as a bf16 matmul instead of scalar compares
    (ref: extension/lookup.cu:55-60 does the same count with int compares).
    """
    q_oh = jax.nn.one_hot(q_codes, n_codewords, dtype=jnp.bfloat16)
    k_oh = jax.nn.one_hot(k_codes, n_codewords, dtype=jnp.bfloat16)
    sq = q_oh.reshape(*q_oh.shape[:-2], -1)   # [..., S, n_sub * n_code]
    sk = k_oh.reshape(*k_oh.shape[:-2], -1)
    return jnp.einsum('...ic,...jc->...ij', sq, sk,
                      preferred_element_type=jnp.float32)


def pq_topk_indices(q_codes: jax.Array, k_codes: jax.Array, *,
                    top_k: int, n_codewords: int) -> jax.Array:
    """Causal approximate-top-k candidate columns per query row.

    Scores = PQ match counts; -1 marks non-causal columns so they lose to any
    causal column. Ties break toward lower column index (lax.top_k), which
    biases toward earlier context like the reference's in-order bucket fill
    (extension/lookup.cu:61-66).
    """
    s_q = q_codes.shape[-2]
    s_k = k_codes.shape[-2]
    scores = pq_match_scores(q_codes, k_codes, n_codewords)
    row = jnp.arange(s_q)[:, None]
    col = jnp.arange(s_k)[None, :]
    scores = jnp.where(col <= row, scores, -1.0)
    vals, idx = jax.lax.top_k(scores, top_k)
    idx = jnp.where(vals >= 0.0, idx, s_k)     # pad sentinel = S
    return idx.astype(jnp.int32)
