"""Manually-overlapped tensor-parallel matmuls (collective matmul).

North-star: "all-gather/reduce-scatter overlapped with SpMM compute"
(BASELINE.json). Under plain pjit, XLA inserts an all-gather BEFORE a
row-sharded matmul and a reduce-scatter AFTER a column-sharded one; on
current XLA these collectives mostly serialize with the GEMM. This
module implements the classic ring decomposition (Wang et al.,
"Overlap communication with computation in collective matmul"; also the
scaling-book recipe) inside shard_map so the ICI transfer of chunk j+1
overlaps the MXU work on chunk j:

  * ag_matmul:  y = (all_gather x) @ W_shard, as a ring over x chunks —
    each step matmuls the resident chunk while ppermute ships the next.
  * matmul_rs:  y = reduce_scatter(x @ W_shard), as a ring where the
    partial-sum accumulator travels; each step adds its local
    contribution for the destination shard then forwards it.

On a single-TensorCore v5e these measure as parity with pjit (there is
no second core to hide anything behind, and the virtual CPU mesh has no
ICI at all) — the value here is the DESIGNED artifact + parity tests so
multi-chip hardware can flip serving/training FFNs to the overlapped
form and measure (docs/PERF.md round-3 measurement plan).

The reference delegates every collective to NCCL inside Lightning /
DeepSpeed (SURVEY §2.8) and has no overlap mechanism of its own beyond
the dual-stream backward (kernels/sddmm.py:36-50).
"""
from __future__ import annotations

import contextlib
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P


def ag_matmul_local(x, w, *, axis_name: str):
    """shard_map body: x [B, M/n, K] (sharded on M), w [K, N/n] (sharded
    on N). Computes y = all_gather(x) @ w -> [B, M, N/n] with the gather
    decomposed into a ring: chunk j+1 moves over ICI while chunk j is on
    the MXU."""
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    m_loc = x.shape[-2]

    def step(t, carry):
        acc, xc = carry
        src = (idx - t) % n                 # whose rows xc currently holds
        yc = jnp.einsum('...mk,kn->...mn', xc, w)
        acc = jax.lax.dynamic_update_slice_in_dim(
            acc, yc.astype(acc.dtype), src * m_loc, axis=-2)
        xc = jax.lax.ppermute(xc, axis_name,
                              [(j, (j + 1) % n) for j in range(n)])
        return acc, xc

    acc0 = jnp.zeros(x.shape[:-2] + (m_loc * n, w.shape[-1]),
                     jnp.promote_types(x.dtype, w.dtype))
    # mark axis-varying like the loop outputs (shard_map residency rule)
    acc0 = acc0 + jnp.zeros_like(x[..., :1, :1])
    acc, _ = jax.lax.fori_loop(0, n, step, (acc0, x))
    return acc


def matmul_rs_local(x, w, *, axis_name: str):
    """shard_map body: x [B, M, K/n] (sharded on K), w [K/n, N] (sharded
    on K). Computes y = reduce_scatter_M(x @ w) -> [B, M/n, N]: the
    accumulator ring carries the partial sum for each destination shard,
    adding the local contribution while the previous hop is in flight."""
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    m = x.shape[-2]
    assert m % n == 0, (m, n)
    m_loc = m // n

    def local_block(dst):
        xs = jax.lax.dynamic_slice_in_dim(x, dst * m_loc, m_loc, axis=-2)
        return jnp.einsum('...mk,kn->...mn', xs, w)

    def step(t, acc):
        # an accumulator added-to at hop t permutes (n-1-t) more times,
        # landing at idx + (n-1-t); for it to land at its destination,
        # this device must add its block for dst = (idx - 1 - t) mod n
        dst = jax.lax.rem(idx - 1 - t + 2 * n, n)
        acc = acc + local_block(dst)
        return jax.lax.ppermute(acc, axis_name,
                                [(j, (j + 1) % n) for j in range(n)])

    acc0 = jnp.zeros(x.shape[:-2] + (m_loc, w.shape[-1]), jnp.float32)
    acc0 = acc0 + jnp.zeros_like(x[..., :1, :1], dtype=jnp.float32)
    acc = jax.lax.fori_loop(0, n - 1, step, acc0)
    # final: add this device's own rows (dst == idx) — no forward needed
    return (acc + local_block(idx)).astype(
        jnp.promote_types(x.dtype, w.dtype))


_TP: list = []   # (mesh, axis) stack for the tp_overlap config flag


@contextlib.contextmanager
def tp_mesh(mesh: Mesh, axis: str = 'model'):
    """Bind the mesh/axis that cfg.tp_overlap FFNs ring over. Must be
    active while the step is TRACED (the mesh is baked into the jaxpr);
    the context may end before execution — same contract as
    ops.routed_ffn_ep.ep_mesh."""
    _TP.append((mesh, axis))
    try:
        yield
    finally:
        _TP.pop()


def current_tp_mesh():
    """(mesh, axis) of the innermost tp_mesh context, or None."""
    return _TP[-1] if _TP else None


def tp_ffn_overlapped(x, w1, w2, *, mesh: Mesh, axis_name: str = 'model',
                      act=jax.nn.relu):
    """A TP FFN with manual overlap: h = act(x @ W1[:, shard]) stays
    sharded on d_ff; y = reduce-scatter-free second matmul with the
    ring-accumulated sum replicated back over M.

    x [B, M, K] replicated; w1 [K, F] sharded P(None, axis); w2 [F, K]
    sharded P(axis, None). Output replicated [B, M, K] == act(x@W1)@W2.
    """
    def body(xl, w1l, w2l):
        h = act(jnp.einsum('...mk,kf->...mf', xl, w1l))
        # ring reduce-scatter fused with the second matmul: each hop's
        # partial GEMM overlaps the accumulator transfer
        return matmul_rs_local(h, w2l, axis_name=axis_name)

    # the M-scattered shards ARE the full output under this spec (the
    # consumer resharding replaces an explicit all-gather)
    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(None, axis_name), P(axis_name, None)),
        out_specs=P(None, axis_name, None))(x, w1, w2)


def _as3d(x):
    return (x[None], True) if x.ndim == 2 else (x, False)


def tp_ffn_overlapped_biased(x, w1, b1, w2, b2, *, mesh: Mesh,
                             axis_name: str = 'model', act=jax.nn.relu):
    """cfg.tp_overlap production form (OPT dense FFN): y = act(x@W1+b1)@W2
    + b2 with the second matmul's reduce ring-overlapped. x [.., M, K]
    replicated (M % n == 0); w1 [K, F] / b1 [F] sharded on axis; w2
    [F, K] sharded on its input dim; b2 replicated."""
    x3, squeeze = _as3d(x)

    def body(xl, w1l, b1l, w2l):
        h = act(jnp.einsum('...mk,kf->...mf', xl, w1l) + b1l)
        return matmul_rs_local(h, w2l, axis_name=axis_name)

    y = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(None, axis_name), P(axis_name), P(axis_name, None)),
        out_specs=P(None, axis_name, None))(x3, w1, b1, w2)
    y = y + b2
    return y[0] if squeeze else y


def tp_ffn_overlapped_gated(x, wg, ws, wd, *, mesh: Mesh,
                            axis_name: str = 'model', act=jax.nn.silu):
    """cfg.tp_overlap production form (LLaMA SwiGLU): y =
    (act(x@Wg) * (x@Ws)) @ Wd with the down-projection ring-overlapped."""
    x3, squeeze = _as3d(x)

    def body(xl, wgl, wsl, wdl):
        h = act(jnp.einsum('...mk,kf->...mf', xl, wgl)) \
            * jnp.einsum('...mk,kf->...mf', xl, wsl)
        return matmul_rs_local(h, wdl, axis_name=axis_name)

    y = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(None, axis_name), P(None, axis_name),
                  P(axis_name, None)),
        out_specs=P(None, axis_name, None))(x3, wg, ws, wd)
    return y[0] if squeeze else y
