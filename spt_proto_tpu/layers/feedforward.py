"""Feedforward layers: dense (OPT ReLU / LLaMA SwiGLU) and routed variants.

Reference parity: naive_gpt/layers/basic/feedforward.py,
naive_gpt/layers/sparse/feedforward.py, naive_gpt/layers/tuning/lora_ffn.py.

Canonical weight storage keeps the *dense* layout ([d_model, d_ff] etc.) for
both dense and routed FFNs, so the dense -> routed upgrade is a pure config
change plus router init (no param reshuffle) and the block view is a free
reshape at call time (contiguous d_ff slices = blocks,
ref sparse/feedforward.py:88-99). DenseParams mirrors LoRADense's param names
so param-tree paths are identical across dense/routed stages.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from spt_proto_tpu.config import ModelConfig
from spt_proto_tpu.layers.common import LoRADense
from spt_proto_tpu.ops import routed_ffn as rops


def _activation(cfg: ModelConfig):
    return jax.nn.relu if cfg.arch == 'opt' else jax.nn.silu


def _tp_overlap_active(cfg: ModelConfig, x, deterministic: bool = True
                       ) -> bool:
    """cfg.tp_overlap takes effect when a parallel.overlap.tp_mesh
    context is active at trace time, the FFN is plain dense (no LoRA,
    no dropout in play), and the ring's row dim divides the axis."""
    if not cfg.tp_overlap or cfg.d_lora or \
            (cfg.p_dropout > 0.0 and not deterministic):
        return False
    from spt_proto_tpu.parallel.overlap import current_tp_mesh
    tp = current_tp_mesh()
    return tp is not None and x.shape[-2] % tp[0].shape[tp[1]] == 0


class DenseParams(nn.Module):
    """Declares LoRADense-compatible params and returns them raw.

    Used by routed FFNs that need block views of the weights instead of a
    plain x @ W application. Param names/shapes match LoRADense exactly:
    kernel [in, out], bias [out], lora_left [in, r], lora_right [out, r].
    """
    in_features: int
    features: int
    use_bias: bool = True
    d_lora: Optional[int] = None
    param_dtype: Any = jnp.float32
    int8_base: bool = False   # kernel lives int8 in the 'frozen8' collection

    @nn.compact
    def __call__(self):
        if self.int8_base:
            assert self.has_variable('frozen8', 'kernel'), \
                'int8_base model applied without the frozen8 collection'
            out = {'kernel_q8': self.get_variable('frozen8', 'kernel')}
        else:
            out = {'kernel': self.param('kernel',
                                        nn.initializers.lecun_normal(),
                                        (self.in_features, self.features),
                                        self.param_dtype)}
        if self.use_bias:
            out['bias'] = self.param('bias', nn.initializers.zeros,
                                     (self.features,), self.param_dtype)
        if self.d_lora:
            out['lora_left'] = self.param(
                'lora_left', nn.initializers.normal(1.0),
                (self.in_features, self.d_lora), self.param_dtype)
            out['lora_right'] = self.param(
                'lora_right', nn.initializers.zeros,
                (self.features, self.d_lora), self.param_dtype)
        return out


class Feedforward(nn.Module):
    """OPT-style fc1 -> act -> fc2 (ref basic/feedforward.py:5-34)."""
    cfg: ModelConfig
    deterministic: bool = True

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        act = _activation(cfg)
        if _tp_overlap_active(cfg, x, self.deterministic):
            from spt_proto_tpu.parallel.overlap import (
                current_tp_mesh, tp_ffn_overlapped_biased)
            p1 = DenseParams(cfg.d_model, cfg.d_feedforward,
                             param_dtype=cfg.param_dtype, name='fc1')()
            p2 = DenseParams(cfg.d_feedforward, cfg.d_model,
                             param_dtype=cfg.param_dtype, name='fc2')()
            mesh, ax = current_tp_mesh()
            return tp_ffn_overlapped_biased(
                x.astype(cfg.dtype), p1['kernel'].astype(cfg.dtype),
                p1['bias'].astype(cfg.dtype),
                p2['kernel'].astype(cfg.dtype),
                p2['bias'].astype(cfg.dtype), mesh=mesh, axis_name=ax,
                act=act).astype(cfg.dtype)
        h = LoRADense(cfg.d_feedforward, use_bias=True, d_lora=cfg.d_lora,
                      dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                      int8_base=cfg.int8_base, name='fc1')(x)
        if cfg.p_dropout > 0.0 and not self.deterministic:
            h = nn.Dropout(rate=cfg.p_dropout)(h, deterministic=False)
        h = act(h)
        return LoRADense(cfg.d_model, use_bias=True, d_lora=cfg.d_lora,
                         dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                         int8_base=cfg.int8_base, name='fc2')(h)


class GatedFeedforward(nn.Module):
    """LLaMA SwiGLU: down(act(gate(x)) * side(x)), no biases
    (ref basic/feedforward.py:37-62)."""
    cfg: ModelConfig
    deterministic: bool = True

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        act = _activation(cfg)
        if _tp_overlap_active(cfg, x, self.deterministic):
            from spt_proto_tpu.parallel.overlap import (
                current_tp_mesh, tp_ffn_overlapped_gated)
            ps = {n: DenseParams(
                cfg.d_model if n != 'down' else cfg.d_feedforward,
                cfg.d_feedforward if n != 'down' else cfg.d_model,
                use_bias=False, param_dtype=cfg.param_dtype, name=n)()
                for n in ('gate', 'side', 'down')}
            mesh, ax = current_tp_mesh()
            return tp_ffn_overlapped_gated(
                x.astype(cfg.dtype),
                ps['gate']['kernel'].astype(cfg.dtype),
                ps['side']['kernel'].astype(cfg.dtype),
                ps['down']['kernel'].astype(cfg.dtype), mesh=mesh,
                axis_name=ax, act=act).astype(cfg.dtype)
        mk = lambda feats, name: LoRADense(
            feats, use_bias=False, d_lora=cfg.d_lora, dtype=cfg.dtype,
            param_dtype=cfg.param_dtype, int8_base=cfg.int8_base,
            name=name)
        g = mk(cfg.d_feedforward, 'gate')(x)
        s = mk(cfg.d_feedforward, 'side')(x)
        return mk(cfg.d_model, 'down')(act(g) * s)


def _block_views(cfg: ModelConfig, p_in: dict, p_out: dict):
    """Dense-layout params -> routed block layout.

    fc1 kernel [d_model, d_ff] -> w1 [n, d_model, bs] (contiguous slices of
    the d_ff axis are blocks); fc2 kernel [d_ff, d_model] -> w2 [n, bs,
    d_model]. LoRA right factor of fc1 and left factor of fc2 are likewise
    per-block slices of the d_ff axis (ref tuning/lora_ffn.py:65-84).
    """
    n, bs = cfg.n_ffn_blocks, cfg.ffn_block_size
    d = cfg.d_model
    w1 = p_in['kernel'].reshape(d, n, bs).transpose(1, 0, 2)
    w2 = p_out['kernel'].reshape(n, bs, d)
    views = {'w1': w1, 'w2': w2}
    if 'bias' in p_in:
        views['b1'] = p_in['bias'].reshape(n, bs)
    if 'lora_right' in p_in:
        r = p_in['lora_right'].shape[-1]
        views['lora_right1'] = p_in['lora_right'].reshape(n, bs, r)
        views['lora_left1'] = p_in['lora_left']
        views['lora_left2'] = p_out['lora_left'].reshape(n, bs, r)
        views['lora_right2'] = p_out['lora_right']
    return views


class RoutedFeedforward(nn.Module):
    """Routed block-FFN (OPT-style fc1/fc2).

    Router = Dense -> sigmoid, top-k blocks per token. With cfg.d_lora set,
    uses the differentiable 2*prob coeff path (ref tuning/lora_ffn.py:52-115);
    otherwise exact hard dispatch (ref sparse/feedforward.py:47-103, where
    top-k defaults to n_blocks//2).
    """
    cfg: ModelConfig
    deterministic: bool = True

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        act = _activation(cfg)
        lead = x.shape[:-1]
        xf = x.reshape(-1, cfg.d_model)
        probs = jax.nn.sigmoid(
            nn.Dense(cfg.n_ffn_blocks, dtype=cfg.dtype,
                     param_dtype=cfg.param_dtype, name='router')(xf))
        p1 = DenseParams(cfg.d_model, cfg.d_feedforward, use_bias=True,
                         d_lora=cfg.d_lora, param_dtype=cfg.param_dtype,
                         int8_base=cfg.int8_base, name='fc1')()
        p2 = DenseParams(cfg.d_feedforward, cfg.d_model, use_bias=True,
                         d_lora=cfg.d_lora, param_dtype=cfg.param_dtype,
                         int8_base=cfg.int8_base, name='fc2')()
        cast = lambda t: t.astype(cfg.dtype)
        top_k = cfg.ffn_active_blocks
        if cfg.int8_base:
            # frozen int8 base path (masked-dispatch math; the flat int8
            # matmuls ARE the block einsums — routed_ffn.py int8 notes)
            assert cfg.ffn_impl in ('masked', 'gmm'), \
                'int8_base routed FFN uses the masked-dispatch form'
            nb, bs = cfg.n_ffn_blocks, cfg.ffn_block_size
            b1v = cast(p1['bias'].reshape(nb, bs))
            if cfg.d_lora:
                r = cfg.d_lora
                y = rops.routed_ffn_lora_int8(
                    xf, probs, top_k, p1['kernel_q8'], b1v,
                    p2['kernel_q8'], cast(p2['bias']),
                    cast(p1['lora_left']),
                    cast(p1['lora_right'].reshape(nb, bs, r)),
                    cast(p2['lora_left'].reshape(nb, bs, r)),
                    cast(p2['lora_right']), act)
            else:
                y = rops.routed_ffn_masked_int8(
                    xf, probs, top_k, p1['kernel_q8'], b1v,
                    p2['kernel_q8'], cast(p2['bias']), act)
            return y.reshape(*lead, cfg.d_model)
        v = _block_views(cfg, p1, p2)
        use_gmm = cfg.ffn_impl == 'gmm' and xf.shape[0] >= 128
        if cfg.ffn_impl == 'ep':
            # expert parallelism: blocks + tokens sharded over one mesh
            # axis, all_to_all token exchange (ops/routed_ffn_ep.py)
            from spt_proto_tpu.ops import routed_ffn_ep as eps
            mesh, axis = eps.current_ep()
            if cfg.d_lora:
                y = eps.routed_ffn_lora_ep(
                    xf, probs, top_k, cast(v['w1']), cast(v['b1']),
                    cast(v['w2']), cast(p2['bias']),
                    cast(v['lora_left1']), cast(v['lora_right1']),
                    cast(v['lora_left2']), cast(v['lora_right2']), act,
                    mesh=mesh, axis=axis)
            else:
                y = eps.routed_ffn_ep(
                    xf, probs, top_k, cast(v['w1']), cast(v['b1']),
                    cast(v['w2']), cast(p2['bias']), act,
                    mesh=mesh, axis=axis)
        elif cfg.d_lora:
            fn = rops.routed_ffn_lora_gmm if use_gmm else rops.routed_ffn_lora
            y = fn(xf, probs, top_k, cast(v['w1']), cast(v['b1']),
                   cast(v['w2']), cast(p2['bias']),
                   cast(v['lora_left1']), cast(v['lora_right1']),
                   cast(v['lora_left2']), cast(v['lora_right2']), act)
        elif use_gmm:
            y = rops.routed_ffn_gmm(
                xf, probs, top_k, cast(v['w1']), cast(v['b1']),
                cast(v['w2']), cast(p2['bias']), act)
        elif cfg.ffn_impl == 'gather':
            y = rops.routed_ffn_gather(
                xf, probs, top_k, cast(v['w1']), cast(v['b1']),
                cast(v['w2']), cast(p2['bias']), act)
        else:
            y = rops.routed_ffn_masked(
                xf, probs, top_k, cast(v['w1']), cast(v['b1']),
                cast(v['w2']), cast(p2['bias']), act)
        return y.reshape(*lead, cfg.d_model)


class RoutedGatedFeedforward(nn.Module):
    """Routed SwiGLU FFN (LLaMA).

    Non-LoRA top-k = n_blocks//4 (ref sparse/feedforward.py:155-159); LoRA
    variant uses n_blocks//2 + the 2*prob coeff (ref tuning/lora_ffn.py:
    171-175) — the reference's own inconsistency, preserved deliberately.
    """
    cfg: ModelConfig
    deterministic: bool = True

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        act = _activation(cfg)
        n, bs = cfg.n_ffn_blocks, cfg.ffn_block_size
        lead = x.shape[:-1]
        xf = x.reshape(-1, cfg.d_model)
        probs = jax.nn.sigmoid(
            nn.Dense(n, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                     name='router')(xf))
        mk = lambda i, o, name: DenseParams(
            i, o, use_bias=False, d_lora=cfg.d_lora,
            param_dtype=cfg.param_dtype, int8_base=cfg.int8_base,
            name=name)()
        pg = mk(cfg.d_model, cfg.d_feedforward, 'gate')
        ps = mk(cfg.d_model, cfg.d_feedforward, 'side')
        pd = mk(cfg.d_feedforward, cfg.d_model, 'down')
        d = cfg.d_model
        cast = lambda t: t.astype(cfg.dtype)
        if cfg.int8_base:
            assert cfg.ffn_impl in ('masked', 'gmm'), \
                'int8_base routed FFN uses the masked-dispatch form'
            if cfg.d_lora:
                r = cfg.d_lora
                y = rops.routed_ffn_gated_lora_int8(
                    xf, probs, cfg.ffn_top_k or max(1, n // 2),
                    pg['kernel_q8'], ps['kernel_q8'], pd['kernel_q8'],
                    cast(pg['lora_left']),
                    cast(pg['lora_right'].reshape(n, bs, r)),
                    cast(ps['lora_left']),
                    cast(ps['lora_right'].reshape(n, bs, r)),
                    cast(pd['lora_left'].reshape(n, bs, r)),
                    cast(pd['lora_right']), act)
            else:
                y = rops.routed_ffn_gated_masked_int8(
                    xf, probs, cfg.ffn_top_k or max(1, n // 4),
                    pg['kernel_q8'], ps['kernel_q8'], pd['kernel_q8'],
                    act, n)
            return y.reshape(*lead, cfg.d_model)
        w_gate = cast(pg['kernel'].reshape(d, n, bs).transpose(1, 0, 2))
        w_side = cast(ps['kernel'].reshape(d, n, bs).transpose(1, 0, 2))
        w_down = cast(pd['kernel'].reshape(n, bs, d))
        if cfg.ffn_impl == 'ep':
            from spt_proto_tpu.ops import routed_ffn_ep as eps
            mesh, axis = eps.current_ep()
            if cfg.d_lora:
                r = cfg.d_lora
                y = eps.routed_ffn_gated_lora_ep(
                    xf, probs, cfg.ffn_top_k or max(1, n // 2),
                    w_gate, w_side, w_down,
                    cast(pg['lora_left']),
                    cast(pg['lora_right'].reshape(n, bs, r)),
                    cast(ps['lora_left']),
                    cast(ps['lora_right'].reshape(n, bs, r)),
                    cast(pd['lora_left'].reshape(n, bs, r)),
                    cast(pd['lora_right']), act, mesh=mesh, axis=axis)
            else:
                y = eps.routed_ffn_gated_ep(
                    xf, probs, cfg.ffn_top_k or max(1, n // 4),
                    w_gate, w_side, w_down, act, mesh=mesh, axis=axis)
        elif cfg.d_lora:
            r = cfg.d_lora
            y = rops.routed_ffn_gated_lora(
                xf, probs, cfg.ffn_top_k or max(1, n // 2),
                w_gate, w_side, w_down,
                cast(pg['lora_left']),
                cast(pg['lora_right'].reshape(n, bs, r)),
                cast(ps['lora_left']),
                cast(ps['lora_right'].reshape(n, bs, r)),
                cast(pd['lora_left'].reshape(n, bs, r)),
                cast(pd['lora_right']), act)
        else:
            y = rops.routed_ffn_gated_masked(
                xf, probs, cfg.ffn_top_k or max(1, n // 4),
                w_gate, w_side, w_down, act)
        return y.reshape(*lead, cfg.d_model)
