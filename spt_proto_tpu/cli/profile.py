"""Profiling harness CLI.

Reference parity: script/0-profile.py (build a block/model at a named size,
optionally upgrade full/lora/sparse, warm up, time, dump profiler trace +
memory stats). TPU equivalents: on-device lax.scan timing loops (host
per-dispatch latency excluded), jax.profiler traces, device memory_stats.

    python -m spt_proto_tpu.cli.profile --config opt-125m --tuning sparse \
        --seq_length 1024 --batch_size 4 --backward
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    from spt_proto_tpu.cli.common import add_model_args, apply_dtype, \
        load_or_init
    add_model_args(p)
    p.add_argument('--tuning', choices=['dense', 'lora', 'sparse'],
                   default='dense')
    p.add_argument('--seq_length', type=int, default=1024)
    p.add_argument('--batch_size', type=int, default=4)
    p.add_argument('--iters', type=int, default=10)
    p.add_argument('--backward', action='store_true')
    p.add_argument('--decode', action='store_true',
                   help='profile the serving decode step instead: prefill '
                        '--seq_length tokens, time --iters decode steps '
                        '(the north-star regime; no reference analog)')
    p.add_argument('--quantized_kv', action='store_true',
                   help='with --decode: int8 KV cache')
    p.add_argument('--spec_k', type=int, default=None,
                   help='with --decode: also time a speculative verify '
                        'block of k proposals (k+1 columns) and report '
                        'the mechanism ceiling vs sequential decode — '
                        'the end-to-end win is ceiling x acceptance, '
                        'which needs trained weights to measure')
    p.add_argument('--trace_dir', type=str, default=None,
                   help='write a jax.profiler trace here')
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax
    from spt_proto_tpu.models.decoder import DecoderLM
    from spt_proto_tpu.tuning import surgery
    from spt_proto_tpu.tuning.trainer import (make_optimizer, make_train_step,
                                              TrainState)

    cfg, params = load_or_init(args)
    cfg = apply_dtype(cfg, args)
    if jax.default_backend() == 'tpu':
        cfg = cfg.replace(attn_impl='pallas')
    rng = jax.random.PRNGKey(0)
    if args.tuning == 'lora':
        cfg, params = surgery.upgrade(cfg, params, 'lora', rng)
    elif args.tuning == 'sparse':
        cfg, params = surgery.full_upgrade(cfg, params, rng)
    cfg.validate()

    tokens = jnp.zeros((args.batch_size, args.seq_length), jnp.int32)
    n = args.iters

    if args.decode:
        assert not args.backward, '--decode and --backward are exclusive'
        from spt_proto_tpu.inference.engine import (KVCache, decode_step,
                                                    prefill)
        from spt_proto_tpu.inference.weights import InferenceWeights
        iw = InferenceWeights.from_params(cfg, params)
        rs = np.random.RandomState(0)
        prompts = jnp.asarray(
            rs.randint(1, cfg.vocab_size,
                       (args.batch_size, args.seq_length)), jnp.int32)
        cache = KVCache.create(cfg, args.batch_size,
                               args.seq_length + n + 2 + (args.spec_k or 0),
                               dtype=cfg.dtype,
                               quantized=args.quantized_kv)
        logits, cache = jax.jit(prefill)(iw, prompts, cache)

        @jax.jit
        def loop(iw, tok, cache):
            def body(carry, _):
                tok, cache = carry
                lg, cache = decode_step(iw, tok, cache)
                return (jnp.argmax(lg, -1).astype(jnp.int32), cache), ()
            (tok, cache), _ = jax.lax.scan(body, (tok, cache), None,
                                           length=n)
            return tok, cache

        tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
        t0 = time.perf_counter()
        t2, _ = loop(iw, tok, cache)
        np.asarray(t2)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        t3, _ = loop(iw, tok, cache)
        np.asarray(t3)
        dt = (time.perf_counter() - t0) / n
        state = batch = None   # not used below
        toks_per_s = args.batch_size / dt
        spec = {}
        if args.spec_k:
            import dataclasses

            from spt_proto_tpu.inference.engine import verify_step
            kk = args.spec_k + 1
            block = jnp.tile(tok[:, None], (1, kk))

            @jax.jit
            def sloop(iw, block, cache):
                def body(cache, _):
                    lg, cache = verify_step(iw, block, cache)
                    # roll back so every iteration verifies at the same
                    # context (a clean per-block cost at this ctx)
                    cache = dataclasses.replace(
                        cache, length=cache.length - kk)
                    return cache, jnp.sum(lg[:, -1, :8]
                                          .astype(jnp.float32))
                cache, accs = jax.lax.scan(body, cache, None, length=n)
                return accs.sum(), cache

            s, _ = sloop(iw, block, cache)
            float(s)                      # compile + warm
            t0 = time.perf_counter()
            s, _ = sloop(iw, block, cache)
            float(s)
            dt_blk = (time.perf_counter() - t0) / n
            spec = {
                'spec_k': args.spec_k,
                'spec_block_ms': round(dt_blk * 1e3, 3),
                # >1 means one verify block is cheaper than the k+1
                # decode steps it can replace (the 100%-acceptance bound)
                'spec_ceiling_speedup': round(kk * dt / dt_blk, 2),
            }
    elif args.backward:
        freeze = args.tuning != 'dense'
        tx = make_optimizer(params, lr=1e-4, freeze_base=freeze)
        trainable = None
        if freeze:
            from spt_proto_tpu.tuning.partition import trainable_mask
            trainable = trainable_mask(params)
        step = make_train_step(cfg, tx,
                               train_quantizer=args.tuning == 'sparse',
                               trainable=trainable)
        state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
        batch = {'inputs': tokens, 'targets': tokens}

        @jax.jit
        def loop(state, batch):
            def body(st, _):
                st, m = step(st, batch)
                return st, m['loss']
            st, losses = jax.lax.scan(body, state, jnp.arange(n))
            return st, losses[-1]

        t0 = time.perf_counter()
        state, _ = loop(state, batch)
        jax.block_until_ready(state.params)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        state, last = loop(state, batch)
        float(last)
        dt = (time.perf_counter() - t0) / n
    else:
        model = DecoderLM(cfg=cfg)

        @jax.jit
        def loop(params, tokens):
            def body(c, i):
                out = model.apply({'params': params},
                                  (tokens + i) % cfg.vocab_size)['logits']
                return c + jnp.sum(out[:, -1, :8].astype(jnp.float32)), None
            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                  jnp.arange(n))
            return acc

        t0 = time.perf_counter()
        float(loop(params, tokens))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(loop(params, tokens))
        dt = (time.perf_counter() - t0) / n

    if not args.decode:
        toks_per_s = args.batch_size * args.seq_length / dt
    dev = jax.devices()[0]
    mem = {}
    try:
        stats = dev.memory_stats() or {}
        mem = {k: v for k, v in stats.items()
               if k in ('bytes_in_use', 'peak_bytes_in_use',
                        'bytes_limit')}
    except Exception:
        pass

    if args.trace_dir:
        with jax.profiler.trace(args.trace_dir):
            if args.decode:
                t4, _ = loop(iw, tok, cache)
                np.asarray(t4)
            elif args.backward:
                st2, last = loop(state, batch)
                jax.block_until_ready(st2.params)
            else:
                float(loop(params, tokens))

    print(json.dumps({
        'config': args.config if not args.ckpt else args.ckpt,
        'tuning': args.tuning,
        'mode': 'decode' if args.decode else
                ('train_step' if args.backward else 'forward'),
        'batch': args.batch_size, 'seq': args.seq_length,
        'compile_s': round(compile_s, 2),
        'step_ms': round(dt * 1e3, 3),
        'tokens_per_s': round(toks_per_s, 1),
        'memory': mem,
        **(spec if args.decode and args.spec_k else {}),
    }))


if __name__ == '__main__':
    main()
