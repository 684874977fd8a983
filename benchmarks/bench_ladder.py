"""Flagship-scale benchmark ladder: decode + train step at OPT-1.3B/2.7B.

BASELINE.md's model ladder starts at OPT-1.3B (reference model menu:
/root/reference/script/1-convert.py:202-206); every round-1/2 number was
measured on the OPT-125M toy. This script runs the same dense-vs-sparse
decode comparison (and a LoRA train step) at real flagship shapes with
random-init weights on the chip, and reports XLA's compiled memory
analysis as the HBM peak (device.memory_stats() is unavailable through
the axon plugin).

Notes on shapes:
  - OPT-1.3B: d_model 2048, 32 heads  -> d_head 64
  - OPT-2.7B: d_model 2560, 32 heads  -> d_head 80 (non-128, the decode
    kernel's sublane stress case: 80 = 5*16 bf16 sublanes, but NOT a
    multiple of the 32-row int8 tile)

Usage:
  python benchmarks/bench_ladder.py --size 1.3b --batch 8 --ctx 2048 \
      --modes dense,sparse,sparse_int8 [--steps 32] [--train]

Prints one JSON line per measurement.
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


def _mem_gb(compiled) -> float:
    """XLA-reported peak HBM of a compiled executable in GB: arguments +
    outputs + temps (donation makes arg/output overlap; this is the
    conservative upper bound XLA itself plans against)."""
    try:
        m = compiled.memory_analysis()
        tot = (m.argument_size_in_bytes + m.output_size_in_bytes +
               m.temp_size_in_bytes - m.alias_size_in_bytes)
        return round(tot / 1e9, 2)
    except Exception:
        return -1.0


def bench_decode(cfg, params, batch, prompt_len, max_len, steps,
                 quantized_kv=False, quant=None):
    """Steady-state decode tok/s + compiled memory, on-device loop."""
    import numpy as np

    from spt_proto_tpu.inference.engine import (KVCache, decode_step,
                                                decode_step_greedy,
                                                prefill)
    from spt_proto_tpu.inference.weights import InferenceWeights
    iw = InferenceWeights.from_params(cfg, params, quant=quant)
    rng = np.random.RandomState(0)
    prompts = jnp.asarray(
        rng.randint(1, cfg.vocab_size, size=(batch, prompt_len)), jnp.int32)
    cache = KVCache.create(cfg, batch, max_len, dtype=cfg.dtype,
                           quantized=quantized_kv)
    logits, cache = jax.jit(prefill, donate_argnums=(2,))(iw, prompts,
                                                          cache)
    # keep only the last column: full prefill logits are 1.6 GB at 1.3B
    logits = jnp.array(logits[:, -1:])
    jax.block_until_ready(logits)

    def k_steps_fn(iw, tok, cache):
        def body(carry, _):
            tok, cache = carry
            tok, cache = decode_step_greedy(iw, tok, cache)
            return (tok, cache), ()
        (tok, cache), _ = jax.lax.scan(body, (tok, cache), None,
                                       length=steps)
        return tok, cache

    tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
    compiled = jax.jit(k_steps_fn).lower(iw, tok, cache).compile()
    mem = _mem_gb(compiled)
    tok2, _ = compiled(iw, tok, cache)
    np.asarray(tok2)              # full host fetch (tunnel-safe)
    best = float('inf')
    for _ in range(2):
        t0 = time.perf_counter()
        tok3, _ = compiled(iw, tok, cache)
        np.asarray(tok3)
        best = min(best, time.perf_counter() - t0)
    return batch * steps / best, mem


def bench_train(cfg, params, batch, seq, iters=8, frozen8=None):
    """LoRA/sparse train-step tok/s (on-device scan) + compiled memory.
    frozen8: int8-frozen-base collection (cfg.int8_base, already on
    device) — passed as a RUNTIME argument: baked as jit constants a 7B
    base is a 6.5 GB compile payload, which breaks remote compile."""
    import numpy as np

    from spt_proto_tpu.tuning.partition import trainable_mask
    from spt_proto_tpu.tuning.trainer import (TrainState, make_optimizer,
                                              make_train_step)
    tx = make_optimizer(params)
    step = make_train_step(cfg, tx, trainable=trainable_mask(params))
    # params arrive as host (device_get'd) numpy trees — put the whole
    # state on device BEFORE timing, or every timed call re-uploads the
    # full parameter tree through the ~0.3 s/dispatch tunnel and the
    # measurement is host-transfer, not the train step (this artifact
    # produced the bogus round-3 "149 tok/s at 1.3B" number)
    state = jax.device_put(
        TrainState(params, tx.init(params), jnp.zeros((), jnp.int32)))
    rng = np.random.RandomState(0)
    batch_d = {
        'inputs': jnp.asarray(rng.randint(0, cfg.vocab_size, (batch, seq)),
                              jnp.int32),
        'targets': jnp.asarray(rng.randint(0, cfg.vocab_size, (batch, seq)),
                               jnp.int32)}

    def loop(state, batch, f8):
        def body(st, _):
            st, m = step(st, batch, f8)
            return st, m['loss']
        st, losses = jax.lax.scan(body, state, None, length=iters)
        return losses[-1]

    # no donate: the loop returns only the loss scalar, so the state
    # could never alias an output (donation would just warn)
    compiled = jax.jit(loop).lower(state, batch_d, frozen8).compile()
    mem = _mem_gb(compiled)
    l0 = float(compiled(state, batch_d, frozen8))
    assert l0 == l0, 'NaN loss'
    t0 = time.perf_counter()
    float(compiled(state, batch_d, frozen8))
    dt = (time.perf_counter() - t0) / iters
    return batch * seq / dt, mem


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--size', default='1.3b',
                    choices=['125m', '350m', '1.3b', '2.7b', 'llama-7b'])
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--ctx', type=int, default=2048)
    ap.add_argument('--steps', type=int, default=32)
    ap.add_argument('--modes', default='dense,sparse,sparse_int8',
                    help='also: sparse_w8 (int8 WEIGHTS + int8 KV — the '
                         'only way LLaMA-7B fits one 16 GB chip); '
                         'sparse_routed (the FULL SPT serving config: '
                         'routed FFN + folded-coeff LoRA + PQ attention '
                         '— VERDICT r4 item 9)')
    ap.add_argument('--train', action='store_true',
                    help='also measure the LoRA/sparse train step')
    ap.add_argument('--train_int8_base', action='store_true',
                    help='measure the int8-frozen-base (QLoRA-shape) SPT '
                         'train step: base kernels int8 in HBM via the '
                         'frozen8 collection (the only way a 7B base '
                         'fits training on one 16 GB chip)')
    ap.add_argument('--train_batch', type=int, default=4)
    ap.add_argument('--train_seq', type=int, default=2048)
    ap.add_argument('--layers', type=int, default=None,
                    help='override n_layers (quick kernel-shape probes)')
    args = ap.parse_args()

    from spt_proto_tpu.config import llama_config, opt_config
    from spt_proto_tpu.tuning import surgery

    on_tpu = jax.devices()[0].platform == 'tpu'
    max_len = args.ctx + 128
    kw = dict(dtype=jnp.bfloat16 if on_tpu else jnp.float32,
              param_dtype=jnp.bfloat16 if on_tpu else jnp.float32,
              attn_impl='pallas' if on_tpu else 'ref',
              pq_metric='l2' if on_tpu else 'l1',
              max_length=max(max_len, args.train_seq))
    if args.layers:
        kw['n_layers'] = args.layers
    if args.size.startswith('llama-'):
        dcfg = llama_config(args.size[len('llama-'):], **kw)
    else:
        dcfg = opt_config(args.size, **kw)
    # park both param trees on HOST: at 1.3b+ two device-resident copies
    # (dense + sparse) plus the bf16 serving cast and the double-buffered
    # KV cache exceed 16 GB
    params = jax.device_get(surgery.init_params(dcfg, jax.random.PRNGKey(0)))
    scfg, sparams = surgery.upgrade(dcfg, params, 'mha_v1',
                                    jax.random.PRNGKey(0))
    scfg, sparams = surgery.upgrade(scfg, sparams, 'mha_v2',
                                    jax.random.PRNGKey(1))
    sparams = jax.device_get(sparams)

    modes = [m for m in args.modes.split(',') if m]
    if 'sparse_routed' in modes:
        # full SPT serving: LoRA + routed FFN + PQ attention (the
        # reference's complete 4-stage pipeline served as-is)
        rcfg, rparams = surgery.full_upgrade(
            dcfg, params, jax.random.PRNGKey(2), d_lora=16,
            ffn_block_size=dcfg.d_feedforward // 4)
        rparams = jax.device_get(rparams)
    out = {'size': args.size, 'd_head': dcfg.d_model // dcfg.n_heads,
           'n_layers': dcfg.n_layers, 'batch': args.batch, 'ctx': args.ctx}
    results = {}
    for mode in modes:
        menu = {
            'dense': (dcfg, params, False, None),
            'sparse': (scfg, sparams, False, None),
            'sparse_int8': (scfg, sparams, True, None),
            'sparse_w8': (scfg, sparams, True, 'int8'),
        }
        if 'sparse_routed' in modes:
            menu['sparse_routed'] = (rcfg, rparams, True, None)
        cfg_m, p_m, q, w8 = menu[mode]
        tps, mem = bench_decode(cfg_m, p_m, args.batch, args.ctx, max_len,
                                args.steps, quantized_kv=q, quant=w8)
        results[mode] = tps
        print(json.dumps({**out, 'bench': f'decode_{mode}',
                          'tokens_per_sec': round(tps, 1),
                          'hbm_gb': mem}), flush=True)
    if 'dense' in results and ('sparse' in results or
                               'sparse_int8' in results):
        best = max(results.get('sparse', 0), results.get('sparse_int8', 0))
        print(json.dumps({**out, 'bench': 'decode_sparse_vs_dense',
                          'speedup': round(best / results['dense'], 3)}),
              flush=True)
    if args.train:
        # the REFERENCE pipeline's trainable set: full 4-stage upgrade
        # (LoRA + routed FFN + PQ), not just the serving mha stages
        tcfg, tparams = surgery.full_upgrade(
            dcfg, params, jax.random.PRNGKey(2), d_lora=16,
            ffn_block_size=dcfg.d_feedforward // 4)
        tcfg = tcfg.replace(remat=True)   # 24L x S=1024 activations
                                          # don't fit 16 GB otherwise
        tps, mem = bench_train(tcfg, tparams, args.train_batch,
                               args.train_seq)
        print(json.dumps({**out, 'bench': 'train_step_sparse_lora',
                          'batch': args.train_batch, 'seq': args.train_seq,
                          'tokens_per_sec': round(tps, 1),
                          'hbm_gb': mem}), flush=True)
    if args.train_int8_base:
        tcfg, tparams = surgery.full_upgrade(
            dcfg, params, jax.random.PRNGKey(2), d_lora=16,
            ffn_block_size=dcfg.d_feedforward // 4)
        tcfg = tcfg.replace(remat=True)
        tcfg8, p_small, frozen8 = surgery.split_int8_base(tcfg, tparams,
                                                          staged=True)
        tps, mem = bench_train(tcfg8, jax.device_get(p_small),
                               args.train_batch, args.train_seq,
                               frozen8=frozen8)
        print(json.dumps({**out, 'bench': 'train_step_int8_base',
                          'batch': args.train_batch, 'seq': args.train_seq,
                          'tokens_per_sec': round(tps, 1),
                          'hbm_gb': mem}), flush=True)


if __name__ == '__main__':
    main()
