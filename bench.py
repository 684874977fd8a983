"""Benchmark entry: prints ONE JSON line with the headline metric.

Headline (north star, BASELINE.md): steady-state decode OUTPUT tokens/sec/chip
for the flagship SPT configuration (PQ tile-sparse attention over the
tile-major KV cache) on OPT-125M at context 2048, batch 8. vs_baseline
compares against the same-shape dense-attention decode measured in the same
run: vs_baseline = sparse_decode_tps / dense_decode_tps.

Supplementary keys report the reference's own regime — teacher-forced
full-sequence forward (the reference has no decode loop; SURVEY §0) — for
continuity with BENCH_r01.json, mapped onto the paper's "up to 2.2x
fine-tuning speedup" claim (reference README.md:5).

All timing loops run ON DEVICE (lax.scan inside one jit dispatch, one scalar
host fetch): the TPU sits behind a tunnel with ~0.3 s/dispatch latency and
an early-returning block_until_ready, so host-side per-call timing would
fake the numbers.
"""
from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

# Persistent compilation cache: the round-4 auto full-unroll decode
# programs take minutes each to compile through the tunnel; cached
# executables bring a warm bench run down to measurement time only
# (verified working through the axon remote-compile path).
jax.config.update(
    'jax_compilation_cache_dir',
    os.path.join(os.path.dirname(os.path.abspath(__file__)), '.jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)


def _bench_forward(cfg, batch_size: int, seq_len: int, iters: int = 20):
    """Teacher-forced forward tokens/s, iterated on device."""
    from spt_proto_tpu.models.decoder import DecoderLM
    model = DecoderLM(cfg=cfg)
    tokens = jnp.zeros((batch_size, seq_len), jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), tokens)['params']

    @jax.jit
    def loop(params, tokens):
        def body(carry, i):
            # vary inputs across iterations so nothing folds away
            out = model.apply({'params': params},
                              (tokens + i) % cfg.vocab_size)['logits']
            return carry + jnp.sum(out[:, -1, :8].astype(jnp.float32)), None
        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                              jnp.arange(iters))
        return acc

    float(loop(params, tokens))  # compile + full round trip
    t0 = time.perf_counter()
    acc = float(loop(params, tokens))
    dt = (time.perf_counter() - t0) / iters
    assert acc == acc, 'NaN in benchmark output'
    return batch_size * seq_len / dt


def _bench_decode(cfg, params, batch: int, prompt_len: int, max_len: int,
                  steps: int, quantized_kv: bool = False):
    """Steady-state greedy decode output tokens/s after a prefill."""
    import numpy as np
    from spt_proto_tpu.inference.engine import KVCache, decode_step, prefill
    from spt_proto_tpu.inference.weights import InferenceWeights

    iw = InferenceWeights.from_params(cfg, params)
    rng = np.random.RandomState(0)
    prompts = jnp.asarray(
        rng.randint(1, cfg.vocab_size, size=(batch, prompt_len)), jnp.int32)
    cache = KVCache.create(cfg, batch, max_len, dtype=cfg.dtype,
                           quantized=quantized_kv)
    logits, cache = jax.jit(prefill)(iw, prompts, cache)

    def run_steps(iw):
        return _decode_loop(iw, logits, cache, batch, steps)
    try:
        try:
            return run_steps(iw)
        except Exception as e:
            # transient tunnel/worker INTERNAL errors happen (memory:
            # axon-tpu-benchmarking) — retry once before concluding the
            # kernel path is at fault
            import sys
            import time as _t
            print(f'WARNING: decode loop failed once '
                  f'({type(e).__name__}: {e}); retrying after 90 s',
                  file=sys.stderr)
            _t.sleep(90)
            return run_steps(iw)
    except Exception as e:
        # the multi-slot decode kernel is the default; if it fails to
        # compile/run on this backend, fall back to the per-slot grid
        # kernel rather than failing the whole benchmark — but say so
        # LOUDLY: a silent fallback would change what BENCH_rXX measures
        if not cfg.decode_multislot:
            raise
        import sys
        print(f'WARNING: multi-slot decode kernel failed '
              f'({type(e).__name__}: {e}); falling back to the per-slot '
              f'grid kernel — headline measures the FALLBACK', file=sys.stderr)
        return run_steps(InferenceWeights.from_params(
            cfg.replace(decode_multislot=False), params))


def _decode_loop(iw, logits, cache, batch, steps):
    import numpy as np
    from spt_proto_tpu.inference.engine import decode_step

    # NOTE: discarding the final cache leaves the scan carry un-donatable
    # and XLA keeps a second cache-sized temp buffer (~612 MB at the
    # bench config) — harmless on a 16 GB chip, and donating here
    # triggered TPU backend errors on the sparse path, so keep it simple
    from spt_proto_tpu.inference.engine import decode_step_greedy

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
    np.asarray(tok2)          # compile; full host fetch (tunnel-safe)
    # best of two timed runs: the tunneled chip's throughput drifts, and
    # max() of repeated same-binary runs is the stable estimator
    best = float('inf')
    for _ in range(2):
        t0 = time.perf_counter()
        tok3, _ = k_steps(iw, tok, cache)
        np.asarray(tok3)
        best = min(best, time.perf_counter() - t0)
    return batch * steps / best


def _phase(msg):
    import sys
    print(f'[bench +{time.perf_counter() - _T0:7.1f}s] {msg}',
          file=sys.stderr, flush=True)


_T0 = time.perf_counter()


def main():
    from spt_proto_tpu.config import ModelConfig, opt_config
    from spt_proto_tpu.tuning import surgery

    on_tpu = jax.devices()[0].platform == 'tpu'

    # --- decode (headline): OPT-125M, ctx 2048, batch 8 ---------------
    if on_tpu:
        dcfg = opt_config('125m').replace(
            dtype=jnp.bfloat16, attn_impl='pallas', pq_metric='l2')
        # 120 steps (max the 2048+128 cache allows): the tunnel adds
        # ~25 ms of fixed dispatch+fetch per k_steps call — at 64 steps
        # that inflated the per-step cost ~0.4 ms (round-5 trace:
        # 1.0 ms/step device time vs 1.4 measured); 120 amortizes it to
        # ~0.2 ms. Steady-state throughput, not harness latency, is the
        # metric.
        batch, prompt_len, steps = 8, 2048, 120
    else:
        dcfg = ModelConfig(arch='opt', d_model=256, n_heads=4, n_layers=2,
                           max_length=512, vocab_size=1024,
                           d_feedforward=1024)
        batch, prompt_len, steps = 2, 256, 8
    max_len = prompt_len + 128
    dcfg = dcfg.replace(max_length=max_len)
    params = surgery.init_params(dcfg, jax.random.PRNGKey(0))
    scfg, sparams = surgery.upgrade(dcfg, params, 'mha_v1',
                                    jax.random.PRNGKey(0))
    scfg, sparams = surgery.upgrade(scfg, sparams, 'mha_v2',
                                    jax.random.PRNGKey(1))
    _phase('decode: dense')
    dense_dec = _bench_decode(dcfg, params, batch, prompt_len, max_len,
                              steps)
    _phase('decode: sparse bf16')
    sparse_bf16 = _bench_decode(scfg, sparams, batch, prompt_len, max_len,
                                steps)
    # flagship serving config: PQ tile-sparse attention + int8 KV cache
    # (per-token scales; wins or ties bf16 at every measured batch, half
    # the cache bytes — docs/PERF.md round-2 table)
    _phase('decode: sparse int8-KV')
    sparse_int8 = _bench_decode(scfg, sparams, batch, prompt_len, max_len,
                                steps, quantized_kv=True) if on_tpu else 0.0
    sparse_dec = max(sparse_int8, sparse_bf16)

    # --- flagship scale: OPT-1.3B decode (BASELINE's ladder starts at
    # 1.3B; benchmarks/bench_ladder.py has the full ladder incl. 2.7B
    # and train steps). Random-init real-shape weights on the chip;
    # HBM from XLA's compiled memory analysis (device.memory_stats()
    # is unavailable through the axon tunnel). Guarded: a failure here
    # must not take down the headline.
    big = {}
    if on_tpu and not os.environ.get('SPT_BENCH_FAST'):
        try:
            _phase('1.3B section')
            big = _bench_1p3b()
        except Exception as e:
            import sys
            print(f'WARNING: 1.3B bench failed ({type(e).__name__}: {e})',
                  file=sys.stderr)

    # --- forward (reference's regime, supplementary) ------------------
    fbatch, fseq = (4, 2048) if on_tpu else (2, 256)
    base = dict(arch='opt', d_model=768, n_heads=12, n_layers=4,
                max_length=2048, vocab_size=50272, d_feedforward=3072,
                dtype=jnp.bfloat16 if on_tpu else jnp.float32,
                param_dtype=jnp.float32,
                attn_impl='pallas' if on_tpu else 'ref')
    dense_cfg = ModelConfig(**base)
    # ffn_impl stays 'masked': at 4 blocks / 50% density the dense-masked
    # einsum beats grouped-matmul dispatch (sort+scatter overhead); 'gmm'
    # wins at many-block / low-density configs
    sparse_cfg = ModelConfig(**base, d_lora=16, attention='sparse_v2',
                             ffn='routed', ffn_block_size=768,
                             pq_metric='l2' if on_tpu else 'l1')
    sparse_cfg.validate()
    _phase('forward: dense')
    dense_fwd = _bench_forward(dense_cfg, fbatch, fseq)
    _phase('forward: sparse')
    sparse_fwd = _bench_forward(sparse_cfg, fbatch, fseq)

    print(json.dumps({
        'metric': 'spt_decode_output_tokens_per_sec_per_chip',
        'value': round(sparse_dec, 1),
        'unit': 'tokens/s',
        'vs_baseline': round(sparse_dec / dense_dec, 3),
        'decode_dense_tokens_per_sec': round(dense_dec, 1),
        'decode_sparse_bf16_tokens_per_sec': round(sparse_bf16, 1),
        'decode_context': prompt_len,
        'decode_batch': batch,
        'forward_tokens_per_sec': round(sparse_fwd, 1),
        'forward_vs_dense': round(sparse_fwd / dense_fwd, 3),
        **big,
    }))


def _bench_1p3b(batch: int = 8, ctx: int = 2048, steps: int = 96):
    """OPT-1.3B decode: dense vs sparse-int8 (the flagship serving
    config), with XLA-reported HBM peaks."""
    import jax

    from benchmarks.bench_ladder import bench_decode
    from spt_proto_tpu.config import opt_config
    from spt_proto_tpu.tuning import surgery
    max_len = ctx + 128
    cfg = opt_config('1.3b', dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
                     attn_impl='pallas', pq_metric='l2', max_length=max_len)
    params = jax.device_get(surgery.init_params(cfg, jax.random.PRNGKey(0)))
    scfg, sparams = surgery.upgrade(cfg, params, 'mha_v1',
                                    jax.random.PRNGKey(0))
    scfg, sparams = surgery.upgrade(scfg, sparams, 'mha_v2',
                                    jax.random.PRNGKey(1))
    sparams = jax.device_get(sparams)
    d_tps, d_mem = bench_decode(cfg, params, batch, ctx, max_len, steps)
    s_tps, s_mem = bench_decode(scfg, sparams, batch, ctx, max_len, steps,
                                quantized_kv=True)
    return {
        'decode_1p3b_dense_tokens_per_sec': round(d_tps, 1),
        'decode_1p3b_sparse_int8_tokens_per_sec': round(s_tps, 1),
        'decode_1p3b_sparse_vs_dense': round(s_tps / d_tps, 3),
        'decode_1p3b_dense_hbm_gb': d_mem,
        'decode_1p3b_sparse_int8_hbm_gb': s_mem,
    }


if __name__ == '__main__':
    main()
