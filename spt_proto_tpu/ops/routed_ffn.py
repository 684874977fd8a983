"""Routed block-FFN: sigmoid router picks top-k contiguous FFN blocks per token.

Reference parity: naive_gpt/layers/sparse/feedforward.py (RoutedFFN /
RoutedLLaMaFFN) and naive_gpt/layers/tuning/lora_ffn.py (LoRA variants with
the differentiable `coeff = 2 * prob` router-prob scaling on the frozen-weight
path). The reference loops blocks in Python with boolean token gathers — a
CPU-bound pattern. The TPU-native design provides:

  * `routed_ffn_masked` — exact-dispatch oracle: computes every block for
    every token and masks. Mathematically identical to the reference's
    gather/scatter loop (test oracle, and genuinely efficient for small
    n_blocks since the block GEMMs batch into one einsum on the MXU).
  * `routed_ffn_gather` — MoE-style capacity dispatch: tokens are sorted by
    chosen block, padded to a fixed per-block capacity, run through batched
    per-block GEMMs, and scattered back. Flop count scales with the activated
    fraction. With sufficient capacity it is exactly equal to the oracle;
    overflowing tokens fall back to... nothing (dropped), which the layer
    avoids by choosing capacity_factor conservatively.

Weight layout convention (TPU-first, differs from torch):
  w1  [n_blocks, d_model, block_size]   (x @ w1[i] -> hidden block i)
  b1  [n_blocks, block_size]
  w2  [n_blocks, block_size, d_model]
  b2  [d_model]                          (added once, ref feedforward.py:82)
For gated (LLaMA/SwiGLU) FFNs: w_gate/w_side [n_blocks, d_model, block_size],
w_down [n_blocks, block_size, d_model], no biases.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def router_gates(probs: jax.Array, top_k: int) -> jax.Array:
    """probs [T, n_blocks] -> boolean gate [T, n_blocks] marking top-k blocks.

    Ref: sparse/feedforward.py:58-63 (torch.topk on sigmoid probs).
    Ties break toward lower block index (lax.top_k order).
    """
    n_blocks = probs.shape[-1]
    _, idx = jax.lax.top_k(probs, top_k)
    return jnp.sum(jax.nn.one_hot(idx, n_blocks, dtype=jnp.bool_), axis=-2)


def routed_ffn_masked(x: jax.Array, probs: jax.Array, top_k: int,
                      w1: jax.Array, b1: jax.Array,
                      w2: jax.Array, b2: jax.Array,
                      activation: Callable[[jax.Array], jax.Array]
                      ) -> jax.Array:
    """Exact routed FFN (OPT-style fc1/act/fc2), mask-dispatch.

    x [T, d_model]; probs [T, n_blocks] (sigmoid router outputs).
    Ref: sparse/feedforward.py:47-85 (per-block gather loop; here every block
    runs for every token and the result is gated — identical math).
    """
    gates = router_gates(probs, top_k).astype(x.dtype)     # [T, n]
    h = jnp.einsum('td,ndh->tnh', x, w1) + b1              # [T, n, hblk]
    h = activation(h)
    y = jnp.einsum('tnh,nhd->td', h * gates[..., None], w2)
    return y + b2


def routed_ffn_gated_masked(x: jax.Array, probs: jax.Array, top_k: int,
                            w_gate: jax.Array, w_side: jax.Array,
                            w_down: jax.Array,
                            activation: Callable[[jax.Array], jax.Array]
                            ) -> jax.Array:
    """Exact routed SwiGLU FFN (LLaMA-style), mask-dispatch.

    Ref: sparse/feedforward.py:150-183 (act(x@gate) * (x@side) @ down per
    block, top n_blocks//4 blocks, no biases).
    """
    gates = router_gates(probs, top_k).astype(x.dtype)
    hg = jnp.einsum('td,ndh->tnh', x, w_gate)
    hs = jnp.einsum('td,ndh->tnh', x, w_side)
    h = activation(hg) * hs
    return jnp.einsum('tnh,nhd->td', h * gates[..., None], w_down)


def routed_ffn_lora(x: jax.Array, probs: jax.Array, top_k: int,
                    w1: jax.Array, b1: jax.Array,
                    w2: jax.Array, b2: jax.Array,
                    lora_left1: jax.Array, lora_right1: jax.Array,
                    lora_left2: jax.Array, lora_right2: jax.Array,
                    activation: Callable[[jax.Array], jax.Array]
                    ) -> jax.Array:
    """LoRA routed FFN with differentiable router-prob scaling.

    Per ref tuning/lora_ffn.py:52-115, for each activated block i:
        coeff = 2 * prob[t, i]
        h     = act( coeff * (x @ w1_i + b1_i) + x @ L1 @ R1_i )
        y    += coeff * (h @ w2_i) + (h @ L2_i) @ R2
    plus the fc2 bias added once. The LoRA path is NOT coeff-scaled (it is
    trainable and learns its own scale).

    LoRA layout: lora_left1 [d_model, r], lora_right1 [n, hblk, r] (per-block
    slice of fc1's right factor); lora_left2 [n, hblk, r] (per-block slice of
    fc2's left factor), lora_right2 [d_model, r].
    """
    gates = router_gates(probs, top_k).astype(x.dtype)     # [T, n]
    coeff = 2.0 * probs * gates                            # [T, n]
    base_h = jnp.einsum('td,ndh->tnh', x, w1) + b1
    xl = x @ lora_left1                                    # [T, r]
    lora_h = jnp.einsum('tr,nhr->tnh', xl, lora_right1)
    h = activation(coeff[..., None] * base_h + lora_h) * gates[..., None]
    y = jnp.einsum('tnh,nhd->td', h * coeff[..., None], w2)
    hl = jnp.einsum('tnh,nhr->tr', h, lora_left2)          # [T, r]
    y = y + hl @ lora_right2.T
    return y + b2


def routed_ffn_gated_lora(x: jax.Array, probs: jax.Array, top_k: int,
                          w_gate: jax.Array, w_side: jax.Array,
                          w_down: jax.Array,
                          lora_left_g: jax.Array, lora_right_g: jax.Array,
                          lora_left_s: jax.Array, lora_right_s: jax.Array,
                          lora_left_d: jax.Array, lora_right_d: jax.Array,
                          activation: Callable[[jax.Array], jax.Array]
                          ) -> jax.Array:
    """LoRA routed SwiGLU FFN (ref: tuning/lora_ffn.py:118-225).

    h = act(coeff * x@gate_i + x@Lg@Rg_i) * (coeff * x@side_i + x@Ls@Rs_i)
    y += coeff * h@down_i + (h@Ld_i)@Rd ; top n_blocks//2 blocks.
    """
    gates = router_gates(probs, top_k).astype(x.dtype)
    coeff = 2.0 * probs * gates
    hg = coeff[..., None] * jnp.einsum('td,ndh->tnh', x, w_gate) + \
        jnp.einsum('tr,nhr->tnh', x @ lora_left_g, lora_right_g)
    hs = coeff[..., None] * jnp.einsum('td,ndh->tnh', x, w_side) + \
        jnp.einsum('tr,nhr->tnh', x @ lora_left_s, lora_right_s)
    h = activation(hg) * hs * gates[..., None]
    y = jnp.einsum('tnh,nhd->td', h * coeff[..., None], w_down)
    y = y + jnp.einsum('tnh,nhr->tr', h, lora_left_d) @ lora_right_d.T
    return y


# ---------------------------------------------------------------------------
# Grouped-matmul dispatch (production TPU path, flop-proportional)
# ---------------------------------------------------------------------------

def routed_ffn_gmm(x: jax.Array, probs: jax.Array, top_k: int,
                   w1: jax.Array, b1: jax.Array,
                   w2: jax.Array, b2: jax.Array,
                   activation: Callable[[jax.Array], jax.Array],
                   *, interpret: bool | None = None) -> jax.Array:
    """Exact-dispatch routed FFN on the megablox grouped-matmul kernel.

    Tokens are replicated per chosen block, sorted by block id, and run
    through two ragged grouped GEMMs (MXU-dense per group) — the TPU-native
    equivalent of the reference's per-block Python gather loop
    (sparse/feedforward.py:66-82) and its abandoned cublasSgemvBatched
    prototype (legacy/blkmv.cpp). Flops scale with top_k/n_blocks.
    """
    from jax.experimental.pallas.ops.tpu.megablox import gmm as _gmm
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    t, d = x.shape
    n = w1.shape[0]
    _, ids = jax.lax.top_k(probs, top_k)               # [T, top_k]
    e = ids.reshape(-1)                                # [T*top_k]
    order = jnp.argsort(e, stable=True)
    tok = order // top_k                               # source token per slot
    e_sorted = e[order]
    group_sizes = jnp.bincount(e, length=n).astype(jnp.int32)
    # pad rows up to the gmm row tile (128); pads join the last group and
    # scatter to a dummy token slot
    m = t * top_k
    pad = -(-m // 128) * 128 - m
    xs = jnp.concatenate([x[tok], jnp.zeros((pad, d), x.dtype)], axis=0)
    e_padded = jnp.concatenate(
        [e_sorted, jnp.full((pad,), n - 1, e_sorted.dtype)])
    tok_padded = jnp.concatenate([tok, jnp.full((pad,), t, tok.dtype)])
    group_sizes = group_sizes.at[n - 1].add(pad)
    h = _gmm(xs, w1, group_sizes,
             preferred_element_type=jnp.float32,
             interpret=interpret)
    h = activation(h.astype(x.dtype) + b1[e_padded])
    ys = _gmm(h, w2, group_sizes,
              preferred_element_type=jnp.float32,
              interpret=interpret).astype(x.dtype)
    y = jnp.zeros((t + 1, d), x.dtype).at[tok_padded].add(ys)
    return y[:t] + b2


def routed_ffn_lora_gmm(x: jax.Array, probs: jax.Array, top_k: int,
                        w1: jax.Array, b1: jax.Array,
                        w2: jax.Array, b2: jax.Array,
                        lora_left1: jax.Array, lora_right1: jax.Array,
                        lora_left2: jax.Array, lora_right2: jax.Array,
                        activation: Callable[[jax.Array], jax.Array],
                        *, interpret: bool | None = None) -> jax.Array:
    """Grouped-matmul version of routed_ffn_lora (same math, flops scale
    with top_k/n_blocks). The per-block LoRA slices also run as grouped
    GEMMs: lora_h = (x @ L1) @ R1[e]^T and hl = h @ L2[e] are ragged
    grouped matmuls over the same token ordering."""
    from jax.experimental.pallas.ops.tpu.megablox import gmm as _gmm
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    t, d = x.shape
    n = w1.shape[0]
    _, ids = jax.lax.top_k(probs, top_k)
    e = ids.reshape(-1)
    order = jnp.argsort(e, stable=True)
    tok = order // top_k
    e_sorted = e[order]
    group_sizes = jnp.bincount(e, length=n).astype(jnp.int32)
    m = t * top_k
    pad = -(-m // 128) * 128 - m
    xs = jnp.concatenate([x[tok], jnp.zeros((pad, d), x.dtype)], axis=0)
    e_padded = jnp.concatenate(
        [e_sorted, jnp.full((pad,), n - 1, e_sorted.dtype)])
    tok_padded = jnp.concatenate([tok, jnp.full((pad,), t, tok.dtype)])
    group_sizes = group_sizes.at[n - 1].add(pad)
    # coeff = 2 * prob of the chosen block, per sorted row (pads -> 0)
    coeff_rows = jnp.take_along_axis(probs[tok], e_sorted[:, None],
                                     axis=1)[:, 0]
    coeff = 2.0 * jnp.concatenate(
        [coeff_rows, jnp.zeros((pad,), probs.dtype)])[:, None]
    h = _gmm(xs, w1, group_sizes, preferred_element_type=jnp.float32,
             interpret=interpret).astype(x.dtype)
    h = h + b1[e_padded]
    xl = xs @ lora_left1                                   # [m_pad, r]
    lora_h = _gmm(xl, jnp.swapaxes(lora_right1, 1, 2), group_sizes,
                  preferred_element_type=jnp.float32,
                  interpret=interpret).astype(x.dtype)
    h = activation(coeff * h + lora_h)
    ys = coeff * _gmm(h, w2, group_sizes,
                      preferred_element_type=jnp.float32,
                      interpret=interpret).astype(x.dtype)
    hl = _gmm(h, lora_left2, group_sizes,
              preferred_element_type=jnp.float32,
              interpret=interpret).astype(x.dtype)        # [m_pad, r]
    ys = ys + hl @ lora_right2.T
    y = jnp.zeros((t + 1, d), x.dtype).at[tok_padded].add(ys)
    return y[:t] + b2


# ---------------------------------------------------------------------------
# Capacity-bucketed gather dispatch (flop-proportional, MoE-style)
# ---------------------------------------------------------------------------

def capacity_dispatch(probs: jax.Array, top_k: int, capacity: int):
    """Build gather/scatter plan: for each block, up to `capacity` token slots.

    Returns (token_idx [n, capacity] int32 index into T (T = pad sentinel),
             slot_valid [n, capacity] bool,
             n_dropped scalar int32 — assignments beyond capacity, silently
             dropped from the output; callers should surface this).
    """
    t, n = probs.shape
    gates = router_gates(probs, top_k)                     # [T, n] bool
    # position of each token within its block's token list
    pos = jnp.cumsum(gates.astype(jnp.int32), axis=0) - 1  # [T, n]
    keep = gates & (pos < capacity)
    n_dropped = jnp.sum(gates) - jnp.sum(keep)
    # scatter token ids into [n, capacity]
    token_idx = jnp.full((n, capacity), t, dtype=jnp.int32)
    bb = jnp.broadcast_to(jnp.arange(n)[None, :], (t, n))
    tt = jnp.broadcast_to(jnp.arange(t)[:, None], (t, n))
    safe_pos = jnp.where(keep, pos, capacity)              # overflow -> dropped
    token_idx = token_idx.at[bb.reshape(-1),
                             jnp.clip(safe_pos, 0, capacity).reshape(-1)
                             ].set(jnp.where(keep, tt, t).reshape(-1),
                                   mode='drop')
    valid = token_idx < t
    return token_idx, valid, n_dropped


def routed_ffn_gather(x: jax.Array, probs: jax.Array, top_k: int,
                      w1: jax.Array, b1: jax.Array,
                      w2: jax.Array, b2: jax.Array,
                      activation: Callable[[jax.Array], jax.Array],
                      *, capacity_factor: float = 2.0) -> jax.Array:
    """Capacity-dispatch routed FFN. Equal to routed_ffn_masked when no token
    overflows capacity = ceil(T * top_k / n_blocks * capacity_factor)."""
    t, d_model = x.shape
    n = w1.shape[0]
    capacity = int(-(-t * top_k * capacity_factor // n))
    capacity = max(8, min(t, capacity))
    token_idx, valid, n_dropped = capacity_dispatch(probs, top_k, capacity)
    # overflow is a silent accuracy loss — make it loud (prints only when
    # a drop actually happens; no cost on the clean path)
    jax.lax.cond(
        n_dropped > 0,
        lambda d: jax.debug.print(
            'routed_ffn_gather: {d} token-block assignments dropped '
            '(capacity overflow — raise capacity_factor)', d=d),
        lambda d: None, n_dropped)
    xpad = jnp.concatenate([x, jnp.zeros((1, d_model), x.dtype)], axis=0)
    xg = xpad[token_idx]                                    # [n, cap, d]
    h = activation(jnp.einsum('ncd,ndh->nch', xg, w1) + b1[:, None, :])
    yg = jnp.einsum('nch,nhd->ncd', h, w2)                  # [n, cap, d]
    yg = jnp.where(valid[..., None], yg, 0.0)
    y = jnp.zeros((t + 1, d_model), x.dtype)
    y = y.at[token_idx.reshape(-1)].add(yg.reshape(-1, d_model))
    return y[:t] + b2


# ---------------------------------------------------------------------------
# int8-frozen-base variants (cfg.int8_base QLoRA-shape training)
# ---------------------------------------------------------------------------
# The base FFN matrices stay int8 in HBM through BOTH passes
# (ops/pallas/int8_matmul.int8_frozen_matmul: fused-dequant forward +
# transposed-int8 dx). The math is the flat form of the masked variants:
# einsum('td,ndh->tnh', x, w1) == (x @ W1_flat).reshape(t, n, h) because
# the canonical weight storage is the DENSE layout (fc1 [d, d_ff]) whose
# contiguous d_ff slices are the blocks — so the frozen8 leaves are just
# quantize_int8 of the original kernels, identical to the attention ones.

def _ifm(x, q8):
    from spt_proto_tpu.ops.pallas.int8_matmul import int8_frozen_matmul
    return int8_frozen_matmul(x, q8['q'], q8['scale'].reshape(-1)
                              ).astype(x.dtype)


def routed_ffn_masked_int8(x, probs, top_k, w1q8, b1, w2q8, b2,
                           activation):
    """routed_ffn_masked with int8-frozen base weights.
    w1q8 = quantize_int8(fc1 [d, d_ff]); w2q8 = quantize_int8(fc2
    [d_ff, d]); b1 [n, bs]."""
    t = x.shape[0]
    n, bs = b1.shape
    gates = router_gates(probs, top_k).astype(x.dtype)
    h = _ifm(x, w1q8).reshape(t, n, bs) + b1
    h = activation(h)
    y = _ifm((h * gates[..., None]).reshape(t, n * bs), w2q8)
    return y + b2


def routed_ffn_lora_int8(x, probs, top_k, w1q8, b1, w2q8, b2,
                         lora_left1, lora_right1, lora_left2, lora_right2,
                         activation):
    """routed_ffn_lora (2*prob coeff on the frozen path) with int8 base."""
    t = x.shape[0]
    n, bs = b1.shape
    gates = router_gates(probs, top_k).astype(x.dtype)
    coeff = 2.0 * probs * gates
    base_h = _ifm(x, w1q8).reshape(t, n, bs) + b1
    lora_h = jnp.einsum('tr,nhr->tnh', x @ lora_left1, lora_right1)
    h = activation(coeff[..., None] * base_h + lora_h) * gates[..., None]
    y = _ifm((h * coeff[..., None]).reshape(t, n * bs), w2q8)
    hl = jnp.einsum('tnh,nhr->tr', h, lora_left2)
    return y + hl @ lora_right2.T + b2


def routed_ffn_gated_masked_int8(x, probs, top_k, wgq8, wsq8, wdq8,
                                 activation, n_blocks):
    t = x.shape[0]
    gates = router_gates(probs, top_k).astype(x.dtype)
    n = n_blocks
    hg = _ifm(x, wgq8).reshape(t, n, -1)
    hs = _ifm(x, wsq8).reshape(t, n, -1)
    h = activation(hg) * hs * gates[..., None]
    return _ifm(h.reshape(t, -1), wdq8)


def routed_ffn_gated_lora_int8(x, probs, top_k, wgq8, wsq8, wdq8,
                               lora_left_g, lora_right_g,
                               lora_left_s, lora_right_s,
                               lora_left_d, lora_right_d, activation):
    t = x.shape[0]
    n = lora_right_g.shape[0]
    gates = router_gates(probs, top_k).astype(x.dtype)
    coeff = 2.0 * probs * gates
    hg = coeff[..., None] * _ifm(x, wgq8).reshape(t, n, -1) + \
        jnp.einsum('tr,nhr->tnh', x @ lora_left_g, lora_right_g)
    hs = coeff[..., None] * _ifm(x, wsq8).reshape(t, n, -1) + \
        jnp.einsum('tr,nhr->tnh', x @ lora_left_s, lora_right_s)
    h = activation(hg) * hs * gates[..., None]
    y = _ifm((h * coeff[..., None]).reshape(t, -1), wdq8)
    return y + jnp.einsum('tnh,nhr->tr', h, lora_left_d) @ lora_right_d.T
