"""Decode-floor decomposition by layer-count scaling (round 3).

VERDICT r2 asks either >=40% of the decode roofline at the 125M bench
config or a measured decomposition proving the residual irreducible.
Scaling n_layers at fixed everything-else gives a clean linear model

    step_ms(L) = fixed + per_layer * L

where `fixed` = embed + lm_head + sampling + scan/dispatch overhead and
`per_layer` = attention kernel + proj/FFN matmuls + layer glue. Running
it for dense and sparse splits per-layer cost into attention-dependent
and attention-independent parts (the two modes share everything but the
attention path).

Usage: python benchmarks/bench_decode_decomposition.py [--batch 8]
       [--ctx 2048] [--layers 12 6 3]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--ctx', type=int, default=2048)
    ap.add_argument('--steps', type=int, default=48)
    ap.add_argument('--layers', type=int, nargs='+', default=[12, 6, 3])
    ap.add_argument('--modes', default='sparse_int8,dense')
    args = ap.parse_args()

    from benchmarks.bench_ladder import bench_decode
    from spt_proto_tpu.config import opt_config
    from spt_proto_tpu.tuning import surgery

    on_tpu = jax.devices()[0].platform == 'tpu'
    max_len = args.ctx + 128
    rows = {}
    for n_l in args.layers:
        cfg = opt_config('125m',
                         n_layers=n_l, max_length=max_len,
                         dtype=jnp.bfloat16 if on_tpu else jnp.float32,
                         param_dtype=jnp.bfloat16 if on_tpu else
                         jnp.float32,
                         attn_impl='pallas' if on_tpu else 'ref',
                         pq_metric='l2' if on_tpu else 'l1')
        params = jax.device_get(surgery.init_params(
            cfg, jax.random.PRNGKey(0)))
        scfg, sparams = surgery.upgrade(cfg, params, 'mha_v1',
                                        jax.random.PRNGKey(0))
        scfg, sparams = surgery.upgrade(scfg, sparams, 'mha_v2',
                                        jax.random.PRNGKey(1))
        for mode in args.modes.split(','):
            c, p, q = {'dense': (cfg, params, False),
                       'sparse': (scfg, sparams, False),
                       'sparse_int8': (scfg, sparams, True)}[mode]
            tps, _ = bench_decode(c, p, args.batch, args.ctx, max_len,
                                  args.steps, quantized_kv=q)
            ms = args.batch / tps * 1e3
            rows[(mode, n_l)] = ms
            print(json.dumps({'mode': mode, 'n_layers': n_l,
                              'ms_per_step': round(ms, 3),
                              'tokens_per_sec': round(tps, 1)}),
                  flush=True)

    # least-squares line per mode
    import numpy as np
    for mode in args.modes.split(','):
        ls = [l for (m, l) in rows if m == mode]
        ys = [rows[(mode, l)] for l in ls]
        a, b = np.polyfit(ls, ys, 1)
        print(json.dumps({'mode': mode,
                          'per_layer_ms': round(float(a), 4),
                          'fixed_ms': round(float(b), 4)}), flush=True)


if __name__ == '__main__':
    main()
