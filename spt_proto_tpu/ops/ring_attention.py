"""Ring attention: causal flash attention with the sequence sharded across
devices (context parallelism).

Capability addition over the reference, which caps sequences at 2048 and
has no sequence/context parallelism at all (SURVEY §2.8, §5: its only
long-context lever is attention sparsity). Here the sequence axis is
sharded over a mesh axis; each device holds a K/V chunk and passes it
around the ring with jax.lax.ppermute while accumulating online-softmax
statistics — communication overlaps with the next chunk's compute under
XLA's async collectives.

Layout (inside shard_map): q/k/v local chunks [B, H, C, D] where
C = S / ring_size; device i owns rows [i*C, (i+1)*C).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

NEG_INF = -1e30


def _chunk_attn(q, k, v, row0, col0, *, scale, causal):
    """Scores/probs of a local q chunk against one k/v chunk, returning
    unnormalized flash statistics (m, l, acc)."""
    s = jnp.einsum('bhid,bhjd->bhij', q, k,
                   preferred_element_type=jnp.float32) * scale
    if causal:
        c_q, c_k = q.shape[2], k.shape[2]
        rows = row0 + jax.lax.broadcasted_iota(jnp.int32, (c_q, c_k), 0)
        cols = col0 + jax.lax.broadcasted_iota(jnp.int32, (c_q, c_k), 1)
        s = jnp.where(cols <= rows, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)                  # [B,H,C,1]
    p = jnp.exp(s - m)
    if causal:
        p = jnp.where(s <= NEG_INF / 2, 0.0, p)
    l = jnp.sum(p, axis=-1, keepdims=True)
    acc = jnp.einsum('bhij,bhjd->bhid', p.astype(v.dtype), v
                     ).astype(jnp.float32)
    return m, l, acc


def ring_attention_local(q, k, v, *, axis_name: str, scale: float,
                         causal: bool = True):
    """The shard_map body: q/k/v [B, H, C, D] local chunks."""
    ring = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    c = q.shape[2]
    row0 = idx * c
    perm = [(j, (j + 1) % ring) for j in range(ring)]

    def step(t, carry):
        m, l, acc, kc, vc = carry
        src = (idx - t) % ring
        col0 = src * c
        m_c, l_c, acc_c = _chunk_attn(q, kc, vc, row0, col0, scale=scale,
                                      causal=causal)
        m_new = jnp.maximum(m, m_c)
        alpha = jnp.exp(m - m_new)
        beta = jnp.exp(m_c - m_new)
        l = alpha * l + beta * l_c
        acc = alpha * acc + beta * acc_c
        kc = jax.lax.ppermute(kc, axis_name, perm)
        vc = jax.lax.ppermute(vc, axis_name, perm)
        return m_new, l, acc, kc, vc

    # derive inits from q so shard_map marks them axis-varying like the
    # loop outputs
    zero = jnp.zeros_like(q[..., :1], dtype=jnp.float32)
    init = (zero + NEG_INF, zero,
            jnp.zeros_like(q, dtype=jnp.float32), k, v)
    m, l, acc, _, _ = jax.lax.fori_loop(0, ring, step, init)
    return (acc / jnp.maximum(l, 1e-9)).astype(q.dtype)


def ring_attention(q: jax.Array, k: jax.Array, v: jax.Array, *, mesh: Mesh,
                   axis_name: str = 'sp', scale: Optional[float] = None,
                   causal: bool = True) -> jax.Array:
    """q/k/v global [B, H, S, D]; S is sharded over mesh axis `axis_name`.

    Returns [B, H, S, D] with the same sharding.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    spec = P(None, None, axis_name, None)
    fn = functools.partial(ring_attention_local, axis_name=axis_name,
                           scale=scale, causal=causal)
    mapped = jax.shard_map(fn, mesh=mesh, in_specs=(spec, spec, spec),
                           out_specs=spec)
    return mapped(q, k, v)


def ring_sparse_attention_local(q, k, v, q_codes, k_codes, *,
                                axis_name: str, scale: float,
                                clamp: float, sparse_coeff: int,
                                n_codewords: int):
    """PQ top-k sparse attention with the sequence sharded over a ring
    (sparse x context parallelism — the reference's two long-context
    levers composed; its sparsity is single-device only,
    naive_gpt/layers/sparse/attention.py:109-119, and it has no sequence
    parallelism at all, SURVEY §5).

    Inputs are per-shard chunks: q/k/v [BH, C, D], codes [BH, C, n_sub]
    (BH = batch * heads, C = S_total / ring). Protocol:

      1. all_gather the K-CODES over the ring — tiny (n_sub int32 per
         token, ~1000x smaller than K itself), so global tile selection
         costs almost no bandwidth;
      2. each shard runs the SAME per-row causal top-k selection as the
         unsharded oracle (ops/lookup.py pq_topk_indices: match counts,
         -1 for non-causal, ties toward lower column, k = S_tot/coeff)
         over its local query rows at global positions — selection is
         GLOBAL, so quality matches the unsharded model exactly;
      3. K/V chunks ppermute around the ring; each pass contributes the
         selected columns' exp(clamp(score)) mass (the +-clamp bounds
         the logits, ref sparse/attention.py:125-127, so no cross-chunk
         max tracking is needed — accumulation is exact).

    Per-device memory: O(C * S_tot) for the match/keep masks (the same
    S^2/ring scaling CP gives dense attention) and one K/V chunk in
    flight — never the full K/V.
    """
    from spt_proto_tpu.ops.lookup import pq_match_scores
    ring = jax.lax.psum(1, axis_name)
    idx_dev = jax.lax.axis_index(axis_name)
    bh, c, d = q.shape
    s_tot = c * ring
    row0 = idx_dev * c
    top_k = max(1, s_tot // sparse_coeff)

    # -- global selection from gathered codes (ops/lookup.py semantics)
    codes_all = jax.lax.all_gather(k_codes, axis_name, axis=1, tiled=True)
    match = pq_match_scores(q_codes, codes_all, n_codewords)  # [BH,C,S_tot]
    rows = row0 + jnp.arange(c)[:, None]
    cols = jnp.arange(s_tot)[None, :]
    match = jnp.where(cols <= rows, match, -1.0)
    vals, sel = jax.lax.top_k(match, top_k)
    sel = jnp.where(vals >= 0.0, sel, s_tot)      # pad sentinel
    keep = jnp.zeros((bh, c, s_tot + 1), bool)
    keep = keep.at[jnp.arange(bh)[:, None, None],
                   jnp.arange(c)[None, :, None], sel].set(True)
    keep = keep[..., :s_tot]                      # [BH, C, S_tot]

    # -- ring over K/V chunks, accumulating selected exp mass
    perm = [(j, (j + 1) % ring) for j in range(ring)]

    def step(t, carry):
        num, den, kc, vc = carry
        src = (idx_dev - t) % ring
        col0 = src * c
        s = jnp.einsum('bid,bjd->bij', q, kc,
                       preferred_element_type=jnp.float32) * scale
        s = jnp.clip(s, -clamp, clamp)
        m = jax.lax.dynamic_slice_in_dim(keep, col0, c, axis=2)
        e = jnp.where(m, jnp.exp(s), 0.0)
        den = den + jnp.sum(e, axis=-1, keepdims=True)
        num = num + jnp.einsum('bij,bjd->bid', e.astype(vc.dtype), vc
                               ).astype(jnp.float32)
        kc = jax.lax.ppermute(kc, axis_name, perm)
        vc = jax.lax.ppermute(vc, axis_name, perm)
        return num, den, kc, vc

    # derive inits from q so shard_map marks them axis-varying like the
    # loop outputs (same trick as ring_attention_local)
    init = (jnp.zeros_like(q, dtype=jnp.float32),
            jnp.zeros_like(q[..., :1], dtype=jnp.float32), k, v)
    num, den, _, _ = jax.lax.fori_loop(0, ring, step, init)
    return (num / jnp.clip(den, 1e-9, None)).astype(q.dtype)
