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
