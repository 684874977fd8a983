"""Decompose the flagship (OPT-1.3B-shape) train step to find where the
time goes.

PERF.md round-3 measured 149 tok/s at B=2 x S=1024 on the full 24-layer
1.3B SPT train step (~170x off the MXU roofline) and named three suspects:
the sparse attention backward, the LoRA routed-FFN dispatch at d_ff 8192,
and remat recompute of the PQ encode. This probe runs the train step at a
reduced layer count with one component toggled at a time, on-device scan
timing, and prints one JSON line per variant.

Usage:
  python benchmarks/bench_train_decomposition.py [--layers 4] [--batch 2]
      [--seq 1024] [--variants all]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build(size, layers, **over):
    from spt_proto_tpu.config import opt_config
    kw = dict(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
              attn_impl='pallas', pq_metric='l2', max_length=2048,
              n_layers=layers)
    kw.update(over)
    return opt_config(size, **kw)


def time_step(cfg, params, batch, iters, *, freeze=True, fwd_only=False,
              train_quantizer=True):
    from spt_proto_tpu.tuning.partition import trainable_mask
    from spt_proto_tpu.tuning.trainer import (TrainState, lm_loss,
                                              make_optimizer,
                                              make_train_step)
    if fwd_only:
        from spt_proto_tpu.models.decoder import DecoderLM
        model = DecoderLM(cfg=cfg, deterministic=True,
                          train_quantizer=False)

        def loop(params, batch):
            def body(c, _):
                out = model.apply({'params': params}, batch['inputs'])
                return c + lm_loss(out['logits'], batch['targets']), ()
            c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=iters)
            return c
        # host numpy params would be re-uploaded through the tunnel on
        # every timed call (see bench_ladder.bench_train)
        params = jax.device_put(params)
        compiled = jax.jit(loop).lower(params, batch).compile()
        compiled(params, batch).block_until_ready()
        best = float('inf')
        for _ in range(2):
            t0 = time.perf_counter()
            float(compiled(params, batch))
            best = min(best, time.perf_counter() - t0)
        return best / iters

    tx = make_optimizer(params, freeze_base=freeze)
    trainable = trainable_mask(params) if freeze else None
    step = make_train_step(cfg, tx, trainable=trainable,
                           train_quantizer=train_quantizer)
    state = jax.device_put(
        TrainState(params, tx.init(params), jnp.zeros((), jnp.int32)))

    def loop(state, batch):
        def body(st, _):
            st, m = step(st, batch)
            return st, m['loss']
        st, losses = jax.lax.scan(body, state, None, length=iters)
        return losses[-1]
    compiled = jax.jit(loop).lower(state, batch).compile()
    l0 = float(compiled(state, batch))
    assert l0 == l0, 'NaN loss'
    best = float('inf')
    for _ in range(2):
        t0 = time.perf_counter()
        float(compiled(state, batch))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--size', default='1.3b')
    ap.add_argument('--layers', type=int, default=4)
    ap.add_argument('--batch', type=int, default=2)
    ap.add_argument('--seq', type=int, default=1024)
    ap.add_argument('--iters', type=int, default=4)
    ap.add_argument('--variants', default='all')
    args = ap.parse_args()

    from spt_proto_tpu.tuning import surgery

    rng = np.random.RandomState(0)
    batch = {
        'inputs': jnp.asarray(
            rng.randint(0, 50272, (args.batch, args.seq)), jnp.int32),
        'targets': jnp.asarray(
            rng.randint(0, 50272, (args.batch, args.seq)), jnp.int32)}

    dcfg = build(args.size, args.layers)
    dparams = jax.device_get(surgery.init_params(dcfg,
                                                 jax.random.PRNGKey(0)))

    def sparse_cfg(**over):
        c, p = surgery.full_upgrade(
            dcfg, dparams, jax.random.PRNGKey(2), d_lora=16,
            ffn_block_size=dcfg.d_feedforward // 4)
        return c.replace(**over), p

    VARIANTS = {}

    def add(name, fn):
        VARIANTS[name] = fn

    add('fwd_dense', lambda: time_step(
        dcfg, dparams, batch, args.iters, fwd_only=True))
    add('fwd_sparse', lambda: (lambda cp: time_step(
        cp[0].replace(remat=False), cp[1], batch, args.iters,
        fwd_only=True))(sparse_cfg()))
    add('train_dense_fullft', lambda: time_step(
        dcfg, dparams, batch, args.iters, freeze=False,
        train_quantizer=False))
    add('train_spt_remat', lambda: (lambda cp: time_step(
        cp[0].replace(remat=True), cp[1], batch, args.iters))(sparse_cfg()))
    add('train_spt_noremat', lambda: (lambda cp: time_step(
        cp[0].replace(remat=False), cp[1], batch,
        args.iters))(sparse_cfg()))
    add('train_spt_noquant', lambda: (lambda cp: time_step(
        cp[0].replace(remat=True), cp[1], batch, args.iters,
        train_quantizer=False))(sparse_cfg()))
    add('train_spt_remat_dots', lambda: (lambda cp: time_step(
        cp[0].replace(remat=True, remat_policy='dots'), cp[1], batch,
        args.iters))(sparse_cfg()))
    add('train_spt_gmm_ffn', lambda: (lambda cp: time_step(
        cp[0].replace(remat=True, ffn_impl='gmm'), cp[1], batch,
        args.iters))(sparse_cfg()))
    # isolate: sparse attention with DENSE ffn (strip the routed stage)
    def _attn_only():
        c, p = surgery.upgrade(dcfg, dparams, 'lora',
                               jax.random.PRNGKey(2), d_lora=16)
        c, p = surgery.upgrade(c, p, 'mha_v1', jax.random.PRNGKey(3))
        c, p = surgery.upgrade(c, p, 'mha_v2', jax.random.PRNGKey(4))
        return time_step(c.replace(remat=True), p, batch, args.iters)
    add('train_attn_only', _attn_only)
    # isolate: routed LoRA ffn with DENSE attention
    def _ffn_only():
        c, p = surgery.upgrade(dcfg, dparams, 'lora',
                               jax.random.PRNGKey(2), d_lora=16)
        c, p = surgery.upgrade(c, p, 'ffn', jax.random.PRNGKey(3),
                               ffn_block_size=dcfg.d_feedforward // 4)
        return time_step(c.replace(remat=True), p, batch, args.iters,
                         train_quantizer=False)
    add('train_ffn_only', _ffn_only)
    # LoRA only (dense attn + dense ffn, frozen base)
    def _lora_only():
        c, p = surgery.upgrade(dcfg, dparams, 'lora',
                               jax.random.PRNGKey(2), d_lora=16)
        return time_step(c.replace(remat=True), p, batch, args.iters,
                         train_quantizer=False)
    add('train_lora_only', _lora_only)

    names = list(VARIANTS) if args.variants == 'all' \
        else args.variants.split(',')
    out = {'size': args.size, 'layers': args.layers, 'batch': args.batch,
           'seq': args.seq}
    for name in names:
        t = VARIANTS[name]()
        print(json.dumps({**out, 'variant': name,
                          'ms_per_step': round(t * 1e3, 2),
                          'tokens_per_sec': round(
                              args.batch * args.seq / t, 1)}), flush=True)


if __name__ == '__main__':
    main()
