"""Inference weight preprocessing.

The training stack keeps LoRA factors separate (they are the trainables);
at serving time the adapter is folded into the base weight
(W' = W + left @ right.T — exact, since the LoRA path is a plain additive
low-rank term, ref tuning/lora.py:69-79). Routed-FFN routers and PQ
codebooks are carried as-is. Optionally quantizes the big GEMM weights to
INT8 weight-only (per-output-channel absmax scales) for the fused
dequant matmul kernel (ops/pallas/int8_matmul.py) — a north-star addition
with no reference counterpart.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from spt_proto_tpu.config import ModelConfig


def fold_lora(p: dict) -> dict:
    """{'kernel', 'bias'?, 'lora_left'?, 'lora_right'?} -> folded dense."""
    out = {'kernel': p['kernel']}
    if 'bias' in p:
        out['bias'] = p['bias']
    if 'lora_left' in p:
        # works for both stacked [L, in, r] and unstacked [in, r] factors
        out['kernel'] = out['kernel'] + jnp.einsum(
            '...ir,...or->...io', p['lora_left'], p['lora_right'])
    return out


def fold_lora_embed(p: dict) -> dict:
    out = {'embedding': p['embedding']}
    if 'lora_left' in p:
        out['embedding'] = out['embedding'] + jnp.einsum(
            '...ir,...or->...io', p['lora_left'], p['lora_right'])
    return out


def quantize_int8(w: jax.Array, pad_to: int = 256) -> dict:
    """Per-output-channel (last axis) symmetric INT8 quantization.

    The quantized tensor's N axis is zero-padded to a multiple of `pad_to`
    HERE, at quantization time — otherwise the matmul kernel would pad
    (i.e. copy) the whole weight on every call (the lm_head's vocab 50272
    is not even 128-aligned). `scale` keeps the ORIGINAL width: consumers
    recover the true N statically from scale.shape[-1] and slice."""
    scale = jnp.max(jnp.abs(w), axis=-2, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    pad = (-q.shape[-1]) % pad_to
    if pad:
        widths = [(0, 0)] * (q.ndim - 1) + [(0, pad)]
        q = jnp.pad(q, widths)
    return {'q': q, 'scale': scale.astype(jnp.float32)}


def _attach_pq_bd(out: dict) -> None:
    """Derive the fused decode-front kernel's block-diagonal PQ matrices
    from the (already dtype-cast) codebook: quantizer_bd [L, d_head,
    n_sub*n_code] f32 + quantizer_cbn [L, 1, n_sub*n_code] f32 (see
    ops/pallas/decode_front.py::build_pq_bd). Built from the CAST
    codebook so in-kernel encode matches the XLA path bit-for-bit."""
    mha = out.get('blocks', {}).get('mha', {})
    if 'quantizer' not in mha:
        return
    from spt_proto_tpu.ops.pallas.decode_front import build_pq_bd
    cb = mha['quantizer']['codebook']      # [L, n_sub, n_code, d_code]
    bd, cbn = jax.vmap(build_pq_bd)(cb)
    mha['quantizer_bd'] = bd
    mha['quantizer_cbn'] = cbn


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class InferenceWeights:
    cfg: ModelConfig = dataclasses.field(metadata=dict(static=True))
    params: Any = None   # folded param tree (blocks stacked [L, ...])
    quant: Optional[str] = dataclasses.field(
        default=None, metadata=dict(static=True))

    @staticmethod
    def from_params(cfg: ModelConfig, params: Any,
                    quant: Optional[str] = None,
                    dtype=None, staged: Optional[bool] = None
                    ) -> 'InferenceWeights':
        """Build serving weights from a (host or device) param tree.

        staged=True streams the tree leaf-by-leaf through the device while
        int8-quantizing: each big kernel is device_put, folded+quantized in
        one jitted call with the fp input donated, so the full-precision
        tree is never device-resident at once. This is what lets LLaMA-7B
        (13.5 GB bf16) serve from one 16 GB chip as int8 (6.7 GB): the
        unstaged path transiently needs fp + int8 (~20 GB) on device.
        Default: staged when quantizing AND the tree is host-resident.
        """
        dtype = dtype or cfg.dtype
        if staged is None:
            leaves = jax.tree.leaves(params)
            staged = quant == 'int8' and bool(leaves) and not isinstance(
                leaves[0], jax.Array)
        if staged and quant == 'int8':
            return InferenceWeights._from_params_staged_int8(
                cfg, params, dtype)
        p = jax.tree.map(lambda x: jnp.asarray(x), params)
        out: dict = {}
        out['embedding'] = fold_lora_embed(p['embedding'])
        if cfg.arch == 'opt':
            out['learned_pe'] = fold_lora_embed(p['learned_pe'])
        blocks = p['blocks']
        b_out: dict = {'mha': {}, 'ffn': {}, 'norm1': blocks['norm1'],
                       'norm2': blocks['norm2']}
        for name in ('q', 'k', 'v', 'o'):
            b_out['mha'][name] = fold_lora(blocks['mha'][name])
        if cfg.kv_heads == cfg.n_heads and quant != 'int8':
            # fuse q/k/v into ONE [L, 3, D, O] projection: at decode
            # (m = batch) the per-matmul dispatch overhead — not
            # bandwidth — dominates the proj half of the step, so one
            # fat einsum beats three skinny matmuls. The stack axis
            # keeps TP alignment: sharding the LAST dim on 'model'
            # shards each of q/k/v by head, exactly like the separate
            # form (parallel/sharding.py mha/qkv rule). GQA (kv < h)
            # keeps separate projections (widths differ); int8 fuses
            # below as a [D, 3D] column-concat instead (2-D kernel).
            qkv = {'kernel': jnp.stack(
                [b_out['mha'][n]['kernel'] for n in ('q', 'k', 'v')],
                axis=-3)}
            if 'bias' in b_out['mha']['q']:
                qkv['bias'] = jnp.stack(
                    [b_out['mha'][n]['bias'] for n in ('q', 'k', 'v')],
                    axis=-2)
            for n in ('q', 'k', 'v'):
                del b_out['mha'][n]
            b_out['mha']['qkv'] = qkv
        if 'quantizer' in blocks['mha']:
            b_out['mha']['quantizer'] = blocks['mha']['quantizer']
        ffn_names = ('gate', 'side', 'down') if cfg.ffn_gated \
            else ('fc1', 'fc2')
        routed = 'router' in blocks['ffn']
        for name in ffn_names:
            if routed and cfg.d_lora:
                # routed + LoRA must NOT fold: training scales the frozen
                # base path by coeff = 2 * router_prob while the LoRA path
                # is unscaled (ref tuning/lora_ffn.py:92-111) — folding
                # would apply coeff to the adapter too. Keep factors
                # separate; _ffn routes through routed_ffn_lora.
                b_out['ffn'][name] = dict(blocks['ffn'][name])
            else:
                b_out['ffn'][name] = fold_lora(blocks['ffn'][name])
        if routed:
            b_out['ffn']['router'] = blocks['ffn']['router']
        out['blocks'] = b_out
        out['final_norm'] = p['final_norm']
        out['lm_head'] = {'kernel': p['lm_head']['kernel']}

        def cast(path_leaf):
            return path_leaf.astype(dtype) if jnp.issubdtype(
                path_leaf.dtype, jnp.floating) else path_leaf
        out = jax.tree.map(cast, out)
        _attach_pq_bd(out)

        if quant == 'int8':
            # quantize the big per-layer GEMMs (weight-only); biases, norms,
            # router, codebook stay fp. Routed-FFN kernels are consumed as
            # reshaped per-block views (not via _dense), so they stay fp too.
            mha_o = out['blocks']['mha']
            if cfg.kv_heads == cfg.n_heads:
                # fuse q/k/v into ONE [L, D, 3D] int8 matmul (columns
                # [q|k|v]): per-output-channel scales make the fold
                # exact, and decode pays one fused-dequant dispatch
                # instead of three (same motivation as the bf16 fused
                # form above; the 2-D dequant kernel takes the concat)
                qkv = {'kernel': quantize_int8(jnp.concatenate(
                    [mha_o[n]['kernel'] for n in ('q', 'k', 'v')],
                    axis=-1))}
                if 'bias' in mha_o['q']:
                    qkv['bias'] = jnp.stack(
                        [mha_o[n]['bias'] for n in ('q', 'k', 'v')],
                        axis=-2)
                for n in ('q', 'k', 'v'):
                    del mha_o[n]
                mha_o['qkv'] = qkv
            else:
                for name in ('q', 'k', 'v'):
                    mha_o[name]['kernel'] = quantize_int8(
                        mha_o[name]['kernel'])
            mha_o['o']['kernel'] = quantize_int8(mha_o['o']['kernel'])
            if not routed:
                for name in ffn_names:
                    out['blocks']['ffn'][name]['kernel'] = quantize_int8(
                        out['blocks']['ffn'][name]['kernel'])
            out['lm_head']['kernel'] = quantize_int8(out['lm_head']['kernel'])
        return InferenceWeights(cfg=cfg, params=out, quant=quant)

    @staticmethod
    def _from_params_staged_int8(cfg: ModelConfig, params: Any,
                                 dtype) -> 'InferenceWeights':
        """Leaf-streamed int8 build (see from_params docstring).

        Device peak = accumulated int8 tree + ONE fp kernel (donated into
        its folded form) instead of the whole fp tree + int8.
        """
        def _cast(x):
            x = jnp.asarray(x)
            return x.astype(dtype) if jnp.issubdtype(
                x.dtype, jnp.floating) else x

        put_small = jax.jit(lambda t: jax.tree.map(_cast, t))

        # One jitted fold+cast+quantize per kernel; the fp input dict is
        # donated so XLA frees it the moment the folded product exists.
        # (int8 outputs can never alias the fp inputs, so the donation is
        # free-early-only — silence the aliasing warning it provokes)
        def _fold_quant(leaf: dict) -> dict:
            w = fold_lora(leaf)['kernel'].astype(dtype)
            return quantize_int8(w)
        _fq = jax.jit(_fold_quant, donate_argnums=0)

        def fold_quant(leaf):
            import warnings
            with warnings.catch_warnings():
                warnings.filterwarnings(
                    'ignore', message='Some donated buffers were not usable')
                return _fq(leaf)

        def quant_dense(leaf: dict) -> dict:
            kern_parts = {k: jnp.asarray(v) for k, v in leaf.items()
                          if k in ('kernel', 'lora_left', 'lora_right')}
            out = {'kernel': fold_quant(kern_parts)}
            jax.block_until_ready(out['kernel'])   # bound transient peak
            if 'bias' in leaf:
                out['bias'] = put_small(leaf['bias'])
            return out

        out: dict = {}
        out['embedding'] = put_small(fold_lora_embed(
            jax.tree.map(jnp.asarray, params['embedding'])))
        if cfg.arch == 'opt':
            out['learned_pe'] = put_small(fold_lora_embed(
                jax.tree.map(jnp.asarray, params['learned_pe'])))
        blocks = params['blocks']
        b_out: dict = {'mha': {}, 'ffn': {},
                       'norm1': put_small(blocks['norm1']),
                       'norm2': put_small(blocks['norm2'])}
        for name in ('q', 'k', 'v', 'o'):
            b_out['mha'][name] = quant_dense(blocks['mha'][name])
        if cfg.kv_heads == cfg.n_heads:
            # fuse the already-quantized q/k/v into the [L, D, 3D] form
            # the unstaged build produces (concat of per-column-scaled
            # int8 is exact; strip each part's tail padding first so the
            # [q|k|v] column boundaries land at D and 2D)
            d = cfg.d_model
            parts = [b_out['mha'][n] for n in ('q', 'k', 'v')]
            qcat = jnp.concatenate(
                [p_['kernel']['q'][..., :d] for p_ in parts], axis=-1)
            pad = (-qcat.shape[-1]) % 256
            if pad:
                qcat = jnp.pad(
                    qcat, [(0, 0)] * (qcat.ndim - 1) + [(0, pad)])
            qkv = {'kernel': {
                'q': qcat,
                'scale': jnp.concatenate(
                    [p_['kernel']['scale'] for p_ in parts], axis=-1)}}
            if 'bias' in parts[0]:
                qkv['bias'] = jnp.stack(
                    [p_['bias'] for p_ in parts], axis=-2)
            for n in ('q', 'k', 'v'):
                del b_out['mha'][n]
            b_out['mha']['qkv'] = qkv
        if 'quantizer' in blocks['mha']:
            b_out['mha']['quantizer'] = put_small(
                blocks['mha']['quantizer'])
        ffn_names = ('gate', 'side', 'down') if cfg.ffn_gated \
            else ('fc1', 'fc2')
        routed = 'router' in blocks['ffn']
        for name in ffn_names:
            if routed:
                # routed FFN consumes fp block views (+ separate LoRA when
                # cfg.d_lora — the coeff-scaling contract, see from_params)
                leaf = blocks['ffn'][name]
                if cfg.d_lora:
                    b_out['ffn'][name] = put_small(dict(leaf))
                else:
                    folded = put_small(jax.tree.map(jnp.asarray, leaf))
                    b_out['ffn'][name] = jax.jit(fold_lora,
                                                 donate_argnums=0)(folded)
            else:
                b_out['ffn'][name] = quant_dense(blocks['ffn'][name])
        if routed:
            b_out['ffn']['router'] = put_small(blocks['ffn']['router'])
        out['blocks'] = b_out
        out['final_norm'] = put_small(params['final_norm'])
        out['lm_head'] = {'kernel': fold_quant(
            {'kernel': jnp.asarray(params['lm_head']['kernel'])})}
        _attach_pq_bd(out)
        return InferenceWeights(cfg=cfg, params=out, quant='int8')
