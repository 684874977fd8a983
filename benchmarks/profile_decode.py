"""Profiler-trace attribution of the decode step's FIXED cost (round 5).

The round-4 layer-count decomposition left ~0.55 ms/step of the 125M
decode unattributed (fixed 0.73 ms - lm_head 0.10 - embed 0.05). The
linear fit cannot see INSIDE the step; this probe captures a real
jax.profiler device trace of the scanned decode loop at the bench config
and aggregates per-op device time so the glue is named, not guessed.

Usage:  python benchmarks/profile_decode.py [--steps 16] [--mode sparse_int8]
Writes /tmp/decode_trace/... and prints a per-op duration table parsed
from the xplane/perfetto output.
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    'jax_compilation_cache_dir',
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 '.jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--steps', type=int, default=16)
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--ctx', type=int, default=2048)
    ap.add_argument('--mode', default='sparse_int8',
                    choices=['sparse_int8', 'sparse', 'dense'])
    ap.add_argument('--size', default='125m',
                    help='opt size or llama-7b (flagship trace, VERDICT '
                         'r4 weak #5: the 29%%-of-roofline attribution)')
    ap.add_argument('--quant', default=None, choices=[None, 'int8'],
                    help='int8 WEIGHTS (required for 7B on one chip)')
    ap.add_argument('--layers', type=int, default=None)
    ap.add_argument('--out', default='/tmp/decode_trace')
    args = ap.parse_args()

    import numpy as np

    from spt_proto_tpu.config import llama_config, opt_config
    from spt_proto_tpu.inference.engine import (KVCache, decode_step_greedy,
                                                prefill)
    from spt_proto_tpu.inference.weights import InferenceWeights
    from spt_proto_tpu.tuning import surgery

    max_len = args.ctx + 128
    kw = dict(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
              attn_impl='pallas', pq_metric='l2', max_length=max_len)
    if args.layers:
        kw['n_layers'] = args.layers
    if args.size.startswith('llama-'):
        cfg = llama_config(args.size[len('llama-'):], **kw)
    else:
        cfg = opt_config(args.size, **kw)
    params = jax.device_get(surgery.init_params(cfg, jax.random.PRNGKey(0)))
    quant = args.mode == 'sparse_int8'
    if args.mode != 'dense':
        cfg, params = surgery.upgrade(cfg, params, 'mha_v1',
                                      jax.random.PRNGKey(0))
        cfg, params = surgery.upgrade(cfg, params, 'mha_v2',
                                      jax.random.PRNGKey(1))
        params = jax.device_get(params)
    iw = InferenceWeights.from_params(cfg, params, quant=args.quant)
    rng = np.random.RandomState(0)
    prompts = jnp.asarray(
        rng.randint(1, cfg.vocab_size, size=(args.batch, args.ctx)),
        jnp.int32)
    cache = KVCache.create(cfg, args.batch, max_len, dtype=cfg.dtype,
                           quantized=quant)
    logits, cache = jax.jit(prefill)(iw, prompts, cache)

    @jax.jit
    def k_steps(iw, tok, cache):
        def body(carry, _):
            tok, cache = carry
            tok, cache = decode_step_greedy(iw, tok, cache)
            return (tok, cache), ()
        (tok, cache), _ = jax.lax.scan(body, (tok, cache), None,
                                       length=args.steps)
        return tok, cache

    tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
    tok2, _ = k_steps(iw, tok, cache)
    np.asarray(tok2)     # compile + run once

    os.makedirs(args.out, exist_ok=True)
    with jax.profiler.trace(args.out):
        tok3, _ = k_steps(iw, tok, cache)
        np.asarray(tok3)

    # ---- aggregate: find the newest trace.json.gz (perfetto/chrome)
    cands = sorted(glob.glob(os.path.join(
        args.out, 'plugins/profile/*/*.trace.json.gz')), key=os.path.getmtime)
    if not cands:
        print('NO trace.json.gz produced; files:', file=sys.stderr)
        for f in glob.glob(os.path.join(args.out, '**/*'), recursive=True):
            print('  ', f, file=sys.stderr)
        return
    with gzip.open(cands[-1], 'rt') as f:
        tr = json.load(f)
    events = tr.get('traceEvents', [])
    # device-side complete events, grouped by name
    import re
    agg = {}
    pid_names = {e.get('pid'): e.get('args', {}).get('name', '')
                 for e in events if e.get('ph') == 'M'
                 and e.get('name') == 'process_name'}
    strip = re.compile(r'[.\d]+$')
    for e in events:
        if e.get('ph') != 'X':
            continue
        pname = pid_names.get(e.get('pid'), '')
        if 'TPU' not in pname and 'tpu' not in pname:
            continue
        name = e.get('name', '?')
        if name.startswith(('jit_', 'while')):
            # container events double-count their children
            print(f'# container: {name[:60]} dur={e.get("dur",0)/1e3:.3f} ms')
            continue
        name = strip.sub('', name)
        dur = e.get('dur', 0)   # us
        a = agg.setdefault(name, [0, 0.0])
        a[0] += 1
        a[1] += dur
    total = sum(v[1] for v in agg.values())
    print(f'# leaf device ops total {total/1e3:.3f} ms over {args.steps} '
          f'steps ({total/1e3/args.steps:.3f} ms/step)')
    rows = sorted(agg.items(), key=lambda kv: -kv[1][1])
    for name, (n, dur) in rows[:40]:
        print(f'{dur/1e3:9.3f} ms  n={n:5d}  avg={dur/max(n,1):8.1f} us  '
              f'per-step={dur/1e3/args.steps:7.4f} ms  {name[:90]}')


if __name__ == '__main__':
    main()
