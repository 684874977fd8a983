"""Decode-throughput benchmark: steady-state output tokens/sec/chip.

North-star metric instrumentation. Runs K greedy decode steps fully
on-device (lax.scan over the functional decode step — one dispatch, so
host/tunnel latency does not pollute the measurement) after a prefill.

    python -m spt_proto_tpu.cli.bench_serving --config opt-125m \
        --batch 8 --prompt_len 512 --max_len 1024 --steps 32 \
        --mode dense sparse int8
"""
from __future__ import annotations

import argparse
import json
import time


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    from spt_proto_tpu.cli.common import add_model_args, load_or_init
    add_model_args(p)
    p.add_argument('--batch', type=int, default=8)
    p.add_argument('--prompt_len', type=int, default=512)
    p.add_argument('--max_len', type=int, default=1024)
    p.add_argument('--steps', type=int, default=32)
    p.add_argument('--mode', nargs='+',
                   default=['dense', 'sparse'],
                   choices=['dense', 'sparse', 'int8', 'paged'])
    from spt_proto_tpu.cli.common import add_mesh_args, mesh_from_args
    add_mesh_args(p)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from spt_proto_tpu.inference.engine import KVCache, decode_step, prefill
    from spt_proto_tpu.inference.weights import InferenceWeights
    from spt_proto_tpu.tuning import surgery

    on_tpu = jax.default_backend() == 'tpu'
    base_cfg, params = load_or_init(args)
    base_cfg = base_cfg.replace(
        dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        attn_impl='pallas' if on_tpu else 'ref',
        pq_metric='l2' if on_tpu else 'l1')

    rng = np.random.RandomState(0)
    prompts = jnp.asarray(rng.randint(
        1, base_cfg.vocab_size, size=(args.batch, args.prompt_len)),
        jnp.int32)

    results = {}
    for mode in args.mode:
        cfg = base_cfg
        quant = None
        if mode == 'sparse':
            cfg = cfg.replace(attention='sparse_v2')
            cfg.validate()
        elif mode == 'int8':
            quant = 'int8'
        mparams = params
        if mode == 'sparse' and 'quantizer' not in \
                params['blocks']['mha']:
            _, mparams = surgery.upgrade(
                base_cfg, params, 'mha_v1', jax.random.PRNGKey(0))
            _c, mparams = surgery.upgrade(
                cfg.replace(attention='sparse_v1'), mparams, 'mha_v2',
                jax.random.PRNGKey(1))
        iw = InferenceWeights.from_params(cfg, mparams, quant=quant)
        mesh = mesh_from_args(args)
        if mesh is not None:
            assert mode != 'paged', '--mesh_model needs contiguous cache'
            from spt_proto_tpu.parallel.infer_sharding import \
                shard_inference_weights
            iw = shard_inference_weights(mesh, iw)

        if mode == 'paged':
            from spt_proto_tpu.inference.paged import (PageAllocator,
                                                       PagedKVCache,
                                                       paged_decode_step,
                                                       paged_prefill)
            ps = 64
            n_pages = args.batch * (args.max_len // ps) + 8
            alloc = PageAllocator(n_pages, args.batch)
            cache = PagedKVCache.create(cfg, args.batch, n_pages, ps,
                                        args.max_len, dtype=cfg.dtype)
            pi = []
            for slot in range(args.batch):
                alloc.ensure(slot, args.max_len, ps)
                pi.append(alloc.table(slot, cache.page_indices.shape[1]))
            cache = PagedKVCache(cache.k_pages, cache.v_pages,
                                 cache.c_pages,
                                 jnp.asarray(np.stack(pi)), cache.length)
            logits, cache = jax.jit(paged_prefill)(iw, prompts, cache)
            step = paged_decode_step
        else:
            cache = KVCache.create(cfg, args.batch, args.max_len,
                                   dtype=cfg.dtype)
            if mesh is not None:
                from spt_proto_tpu.parallel.infer_sharding import \
                    shard_cache
                cache = shard_cache(mesh, cache)
            logits, cache = jax.jit(prefill)(iw, prompts, cache)
            step = decode_step

        @jax.jit
        def k_steps(iw, tok, cache):
            def body(carry, _):
                tok, cache = carry
                lg, cache = step(iw, tok, cache)
                return (jnp.argmax(lg, -1).astype(jnp.int32), cache), ()
            (tok, cache), _ = jax.lax.scan(body, (tok, cache), None,
                                           length=args.steps)
            return tok, cache

        tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
        t0 = time.perf_counter()
        tok2, cache2 = k_steps(iw, tok, cache)
        np.asarray(tok2)   # full host fetch: block_until_ready can return
        compile_s = time.perf_counter() - t0   # early through a TPU tunnel
        t0 = time.perf_counter()
        tok3, cache3 = k_steps(iw, tok, cache)
        np.asarray(tok3)
        dt = time.perf_counter() - t0
        tps = args.batch * args.steps / dt
        results[mode] = {'tokens_per_s': round(tps, 1),
                         'ms_per_step': round(dt / args.steps * 1e3, 2),
                         'compile_s': round(compile_s, 1)}
        print(json.dumps({mode: results[mode]}), flush=True)

    print(json.dumps({'decode_throughput': results,
                      'batch': args.batch, 'prompt_len': args.prompt_len,
                      'max_len': args.max_len}))


if __name__ == '__main__':
    main()
