"""PQ-driven block-sparse attention: tile selection + jnp reference.

TPU-first redesign of the reference's per-row top-k sparse attention
(naive_gpt/layers/sparse/attention.py + extension/{lookup,sddmm,softmax,
spmm}). Per-element gathered sparsity is a GPU/CSR idiom: on TPU, arbitrary
per-row gathers of K/V rows cost more HBM traffic than they save compute.
The equivalent TPU-native contract keeps the same density (1/sparse_coeff of
the causal context per query) at TILE granularity:

  1. Pool PQ match-count scores to (query-tile, key-tile) resolution —
     O(S * n_tiles) via an MXU matmul against per-tile code histograms
     (never materializing the S x S match matrix).
  2. Select the top `n_sel` key tiles per query tile (diagonal tile always
     included — every row must attend to itself; causally invalid tiles
     masked).
  3. Run flash attention restricted to the selected tiles.

This file: selection math + a pure-jnp reference implementation whose
gathers are contiguous [block_k, d] tile slices (XLA-friendly, fully
differentiable — also serves as the custom_vjp backward for the Pallas
forward kernel in ops/pallas/block_sparse_attention.py).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def pq_tile_scores(q_codes: jax.Array, k_codes: jax.Array, *,
                   n_codewords: int, block_q: int, block_k: int
                   ) -> jax.Array:
    """Pooled PQ match scores at tile resolution.

    q_codes/k_codes [B, S, n_sub] int32 -> scores [B, n_q_tiles, n_k_tiles]
    f32 = mean over the q tile of (expected per-row match count against the
    k tile) = q_onehot @ histogram(k tile codes).

    Replaces the reference lookup kernel's O(S^2 * n_sub) scalar compare
    sweep (extension/lookup.cu:55-60) with an O(S * n_k_tiles * n_sub *
    n_codewords) matmul.
    """
    b, s, n_sub = q_codes.shape
    n_qt = s // block_q
    s_k = k_codes.shape[1]
    n_kt = s_k // block_k
    feat = n_sub * n_codewords
    k_oh = jax.nn.one_hot(k_codes, n_codewords, dtype=jnp.float32)
    hist = k_oh.reshape(b, n_kt, block_k, feat).sum(axis=2)   # [B, nk, F]
    q_oh = jax.nn.one_hot(q_codes, n_codewords,
                          dtype=jnp.float32).reshape(b, s, feat)
    row_scores = jnp.einsum('bsf,bkf->bsk', q_oh, hist,
                            preferred_element_type=jnp.float32)
    return row_scores.reshape(b, n_qt, block_q, n_kt).mean(axis=2)


def select_tiles(scores: jax.Array, n_sel: int,
                 block_ratio: int = 1) -> jax.Array:
    """Top-n_sel causal key tiles per query tile, diagonal tiles forced in.

    scores [B, nq, nk] -> sel [B, nq, n_sel] int32, ascending per row,
    invalid slots = -1 (early query tiles with fewer causal tiles than
    n_sel). block_ratio = block_q // block_k: a query tile spans
    `block_ratio` key tiles on the diagonal, all of which are forced
    (every row must be able to attend to itself). Requires
    n_sel >= block_ratio.
    """
    b, n_qt, n_kt = scores.shape
    r = block_ratio
    assert n_kt == n_qt * r, (n_qt, n_kt, r)
    assert n_sel >= r, (n_sel, r)
    qt = jnp.arange(n_qt)[:, None]
    kt = jnp.arange(n_kt)[None, :]
    # causal: key tile starts at/before the q tile's last row
    causal = kt <= qt * r + (r - 1)
    s = jnp.where(causal, scores, -jnp.inf)
    # force the diagonal-overlap key tiles to win
    diag = (kt >= qt * r) & (kt <= qt * r + (r - 1))
    s = jnp.where(diag, jnp.inf, s)
    vals, idx = jax.lax.top_k(s, n_sel)                   # [B, nq, n_sel]
    idx = jnp.where(vals > -jnp.inf, idx, -1)
    # ascending order with invalid (-1) slots pushed to the end
    sort_key = jnp.where(idx < 0, n_kt + 1, idx)
    sorted_key = jnp.sort(sort_key, axis=-1)
    return jnp.where(sorted_key <= n_kt, sorted_key, -1).astype(jnp.int32)


def n_selected_tiles(seq_len: int, block_k: int, sparse_coeff: int) -> int:
    """Fixed tile budget matching the reference's density: keep
    ~seq/sparse_coeff keys per query row (sparse/attention.py:110-117)."""
    n_kt = seq_len // block_k
    return max(1, n_kt // sparse_coeff)


def block_sparse_attention_ref(q: jax.Array, k: jax.Array, v: jax.Array,
                               sel: jax.Array, *, block_q: int,
                               block_k: int, scale: float,
                               clamp: Optional[float] = 10.0) -> jax.Array:
    """jnp reference: attention restricted to selected key tiles.

    q/k/v [B, S, D]; sel [B, nq, n_sel] int32 (from select_tiles).
    Returns [B, S, D]. Gathers are contiguous tile slices; fully
    differentiable (serves as the Pallas kernel's backward).
    """
    b, s, d = q.shape
    n_qt = s // block_q
    n_kt = k.shape[1] // block_k
    n_sel = sel.shape[-1]
    qt = q.reshape(b, n_qt, block_q, d)
    kt = k.reshape(b, n_kt, block_k, d)
    vt = v.reshape(b, n_kt, block_k, d)
    safe = jnp.maximum(sel, 0)
    k_sel = jax.vmap(lambda kb, ib: kb[ib])(kt, safe)     # [B,nq,n_sel,Bk,D]
    v_sel = jax.vmap(lambda vb, ib: vb[ib])(vt, safe)
    scores = jnp.einsum('bqid,bqsjd->bqisj', qt, k_sel,
                        preferred_element_type=jnp.float32) * scale
    if clamp is not None:
        scores = jnp.clip(scores, -clamp, clamp)
    rows = (jnp.arange(n_qt)[:, None] * block_q
            + jnp.arange(block_q)[None, :])               # [nq, Bq]
    cols = safe[..., None] * block_k + jnp.arange(block_k)  # [B,nq,n_sel,Bk]
    valid = (cols[:, :, None, :, :] <= rows[None, :, :, None, None]) & \
        (sel[:, :, None, :, None] >= 0)
    scores = jnp.where(valid, scores, NEG_INF)
    flat = scores.reshape(b, n_qt, block_q, n_sel * block_k)
    flat = flat - jax.lax.stop_gradient(
        jnp.max(flat, axis=-1, keepdims=True))
    e = jnp.exp(flat).reshape(scores.shape)
    e = jnp.where(valid, e, 0.0)
    # per-query-row denominator: sum over (selected tile s, in-tile col j)
    denom = jnp.clip(e.sum(axis=(3, 4))[..., None, None], 1e-9, None)
    p = e / denom
    out = jnp.einsum('bqisj,bqsjd->bqid', p.astype(q.dtype), v_sel)
    return out.reshape(b, s, d)
