"""Prefix-cache payoff: time-to-first-token prefill work, full prompt vs
tail-only after a prefix hit (OPT-125M, prompt 2048, shared prefix 1792).

The prefix cache (inference/batching.py) removes the shared head's
prefill; what remains at admission is one tail prefill_chunk. Both sides
run as on-device lax.scan loops with one scalar fetch (tunnel-safe, see
benchmarks/README.md). The splice itself is a pure HBM write of the
stored tiles (~cache bytes of the prefix; negligible next to the saved
transformer FLOPs) and is timed separately.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

assert jax.devices()[0].platform == 'tpu'

from spt_proto_tpu.config import opt_config
from spt_proto_tpu.inference.batching import _splice_slot
from spt_proto_tpu.inference.engine import KVCache, prefill, prefill_chunk
from spt_proto_tpu.inference.weights import InferenceWeights
from spt_proto_tpu.tuning import surgery

PROMPT, PREFIX, ITERS = 2048, 1792, 8
TAIL = PROMPT - PREFIX

cfg = opt_config('125m').replace(dtype=jnp.bfloat16, attn_impl='pallas',
                                 pq_metric='l2', max_length=PROMPT + 128)
params = surgery.init_params(cfg, jax.random.PRNGKey(0))
iw = InferenceWeights.from_params(cfg, params)
r = np.random.RandomState(0)
tokens = jnp.asarray(r.randint(1, cfg.vocab_size, (1, PROMPT)), jnp.int32)


def timed(fn, *args):
    np.asarray(jax.block_until_ready(fn(*args))[0])  # compile + round trip
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        np.asarray(jax.block_until_ready(fn(*args))[0])
        best = min(best, time.perf_counter() - t0)
    return best / ITERS


@jax.jit
def full_prefill(iw, tokens, cache):
    def body(cache, i):
        lg, cache = prefill(iw, (tokens + i) % cfg.vocab_size, cache)
        return cache, lg[0, -1, 0]
    _, out = jax.lax.scan(body, cache, jnp.arange(ITERS))
    return out, None


@jax.jit
def tail_prefill(iw, tokens, cache):
    def body(cache, i):
        lg, cache = prefill_chunk(iw, (tokens[:, PREFIX:] + i)
                                  % cfg.vocab_size, cache, 0, PREFIX)
        return cache, lg[0, -1, 0]
    _, out = jax.lax.scan(body, cache, jnp.arange(ITERS))
    return out, None


cache = KVCache.create(cfg, 1, PROMPT, dtype=cfg.dtype)
t_full = timed(full_prefill, iw, tokens, cache)

# a prefix-hit admission = splice stored tiles + tail chunk
mini = KVCache.create(cfg, 1, PREFIX, dtype=cfg.dtype)
_, mini = jax.jit(prefill)(iw, tokens[:, :PREFIX], mini)
cache = KVCache.create(cfg, 1, PROMPT, dtype=cfg.dtype)


@jax.jit
def splice(cache, mini):
    def body(cache, _):
        cache = _splice_slot(cache, 0, mini.k, mini.v,
                             mini.codes, PREFIX, cfg.n_layers)
        return cache, cache.length[0]
    _, out = jax.lax.scan(body, cache, jnp.arange(ITERS))
    return out, None


t_splice = timed(splice, cache, mini)
cache = _splice_slot(cache, 0, mini.k, mini.v, mini.codes, PREFIX,
                     cfg.n_layers)
t_tail = timed(tail_prefill, iw, tokens, cache)

t_hit = t_tail + t_splice
print(f'full prefill ({PROMPT} tok):            {t_full*1e3:8.1f} ms')
print(f'prefix hit = splice({PREFIX}) + tail({TAIL}):'
      f' {t_hit*1e3:8.1f} ms  (splice {t_splice*1e3:.1f})')
print(f'TTFT prefill speedup: {t_full/t_hit:.2f}x '
      f'(prefix covers {PREFIX/PROMPT:.0%} of the prompt)', flush=True)
