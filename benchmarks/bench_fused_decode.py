"""Measure the round-4 decode fusion work at the bench config.

Grid: {fused front on/off} x {fused FFN tail on/off} x {scan unroll}
on OPT-125M sparse (+ optional int8 KV), B=8 ctx 2048 — the BENCH
headline config. One JSON line per variant.

Usage: python benchmarks/bench_fused_decode.py [--batch 8] [--ctx 2048]
           [--steps 64] [--quantized]
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


def measure(cfg, params, batch, prompt_len, max_len, steps, quantized):
    from spt_proto_tpu.inference.engine import (KVCache,
                                                decode_step_greedy,
                                                prefill)
    from spt_proto_tpu.inference.weights import InferenceWeights
    iw = InferenceWeights.from_params(cfg, params)
    rng = np.random.RandomState(0)
    prompts = jnp.asarray(
        rng.randint(1, cfg.vocab_size, size=(batch, prompt_len)),
        jnp.int32)
    cache = KVCache.create(cfg, batch, max_len, dtype=cfg.dtype,
                           quantized=quantized)
    logits, cache = jax.jit(prefill)(iw, prompts, cache)

    @jax.jit
    def k_steps(iw, tok, cache):
        def body(carry, _):
            tok, cache = carry
            tok, cache = decode_step_greedy(iw, tok, cache)
            return (tok, cache), ()
        (tok, cache), _ = jax.lax.scan(body, (tok, cache), None,
                                       length=steps)
        return tok, cache

    tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
    tok2, _ = k_steps(iw, tok, cache)
    np.asarray(tok2)
    best = float('inf')
    for _ in range(2):
        t0 = time.perf_counter()
        tok3, _ = k_steps(iw, tok, cache)
        np.asarray(tok3)
        best = min(best, time.perf_counter() - t0)
    return batch * steps / best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--ctx', type=int, default=2048)
    ap.add_argument('--steps', type=int, default=64)
    ap.add_argument('--quantized', action='store_true')
    ap.add_argument('--variants', default='all')
    ap.add_argument('--size', default='125m')
    args = ap.parse_args()

    from spt_proto_tpu.config import opt_config
    from spt_proto_tpu.tuning import surgery

    max_len = args.ctx + 128
    dcfg = opt_config(args.size).replace(
        dtype=jnp.bfloat16,
        param_dtype=jnp.bfloat16 if args.size != '125m' else jnp.float32,
        attn_impl='pallas', pq_metric='l2', max_length=max_len)
    params = surgery.init_params(dcfg, jax.random.PRNGKey(0))
    if args.size != '125m':
        params = jax.device_get(params)   # keep the fp tree off-chip
    scfg, sparams = surgery.upgrade(dcfg, params, 'mha_v1',
                                    jax.random.PRNGKey(0))
    scfg, sparams = surgery.upgrade(scfg, sparams, 'mha_v2',
                                    jax.random.PRNGKey(1))
    if args.size != '125m':
        sparams = jax.device_get(sparams)

    VARIANTS = {
        'defaults': {},   # whatever config auto-resolution picks
        'baseline_r3': dict(decode_fused_front=False,
                            decode_fused_ffn=False,
                            decode_fused_head=False,
                            decode_scan_unroll=1),
        'tail': dict(decode_fused_front=False, decode_fused_ffn=True),
        'front': dict(decode_fused_front=True, decode_fused_ffn=False),
        'front_tail': dict(decode_fused_front=True,
                           decode_fused_ffn=True),
        'front_tail_unroll': dict(decode_fused_front=True,
                                  decode_fused_ffn=True,
                                  decode_scan_unroll=12),
        'unroll_only': dict(decode_fused_front=False,
                            decode_fused_ffn=False,
                            decode_scan_unroll=12),
        'unroll2': dict(decode_fused_front=False, decode_fused_ffn=False,
                        decode_scan_unroll=2),
        'unroll4': dict(decode_fused_front=False, decode_fused_ffn=False,
                        decode_scan_unroll=4),
        'unroll6': dict(decode_fused_front=False, decode_fused_ffn=False,
                        decode_scan_unroll=6),
        'tail_unroll2': dict(decode_fused_front=False,
                             decode_fused_ffn=True, decode_scan_unroll=2),
        'tail_unroll4': dict(decode_fused_front=False,
                             decode_fused_ffn=True, decode_scan_unroll=4),
        'tail_unroll12': dict(decode_fused_front=False,
                              decode_fused_ffn=True,
                              decode_scan_unroll=12),
        'front_tail_unroll2': dict(decode_fused_front=True,
                                   decode_fused_ffn=True,
                                   decode_scan_unroll=2),
        'front_tail_unroll4': dict(decode_fused_front=True,
                                   decode_fused_ffn=True,
                                   decode_scan_unroll=4),
        'front_unroll12': dict(decode_fused_front=True,
                               decode_fused_ffn=False,
                               decode_scan_unroll=12),
        'tail_only_unroll12': dict(decode_fused_front=False,
                                   decode_fused_ffn=True,
                                   decode_scan_unroll=12),
    }
    names = list(VARIANTS) if args.variants == 'all' \
        else args.variants.split(',')
    for name in names:
        cfg_v = scfg.replace(**VARIANTS[name])
        tps = measure(cfg_v, sparams, args.batch, args.ctx, max_len,
                      args.steps, args.quantized)
        print(json.dumps({'variant': name, 'size': args.size,
                          'quantized': args.quantized,
                          'batch': args.batch, 'ctx': args.ctx,
                          'tokens_per_sec': round(tps, 1)}), flush=True)


if __name__ == '__main__':
    main()
