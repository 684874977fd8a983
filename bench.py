"""Benchmark entry: prints ONE JSON line with the headline metric.

Headline: decoder tokens/sec/chip for the flagship SPT configuration
(PQ sparse attention + routed FFN + LoRA over an OPT backbone) on a
teacher-forced full-sequence forward pass (the reference's evaluation
regime — it has no decode loop; SURVEY §0). vs_baseline compares against the
same-shape dense-attention dense-FFN model measured in the same run, mapped
onto the paper's headline "up to 2.2x fine-tuning speedup" (README.md:5):
vs_baseline = sparse_tokens_per_s / dense_tokens_per_s.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def _bench_forward(cfg, batch_size: int, seq_len: int, iters: int = 20):
    """Time `iters` forward passes looped ON DEVICE (lax.scan inside one
    jit dispatch) — host-side per-call latency (e.g. a tunneled TPU) would
    otherwise dominate and fake the measurement."""
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


def main():
    from spt_proto_tpu.config import ModelConfig

    on_tpu = jax.devices()[0].platform == 'tpu'
    batch, seq = (4, 2048) if on_tpu else (2, 256)
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

    dense_tps = _bench_forward(dense_cfg, batch, seq)
    sparse_tps = _bench_forward(sparse_cfg, batch, seq)

    print(json.dumps({
        'metric': 'spt_forward_tokens_per_sec_per_chip',
        'value': round(sparse_tps, 1),
        'unit': 'tokens/s',
        'vs_baseline': round(sparse_tps / dense_tps, 3),
    }))


if __name__ == '__main__':
    main()
