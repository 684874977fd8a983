"""Grid (B,) kernel vs multi-slot single-program kernel, on-chip, one
process back-to-back. Default config mirrors bench.py: OPT-125M sparse
decode shapes (B=8, kv=12, g=1, d=64, ps=128, sparse nsel=3 tables) and
dense ctx-2048 supertile tables (tps=4, t_max=4), folded-layer pools
(12 layers). --size 1.3b measures the flagship-shape envelope (VERDICT
r4 item 10) at the admissible multi-slot batch: the SMEM unroll cap
(b*kv*t_max <= 512) excludes B=8 x KV=32, so that row runs B=4."""
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

assert jax.devices()[0].platform == 'tpu'
from spt_proto_tpu.ops.pallas.decode_attention import (
    decode_attention_rows, decode_attention_rows_ms)

ap = argparse.ArgumentParser()
ap.add_argument('--size', default='125m', choices=['125m', '1.3b'])
ap.add_argument('--iters', type=int, default=64)
_a = ap.parse_args()
if _a.size == '1.3b':
    # OPT-1.3B: 32 kv heads x d_head 64, 24 layers; B=4 is the largest
    # batch the multi-slot SMEM unroll admits (4*32*4 = 512)
    B, KV, G, D, PS, L = 4, 32, 1, 64, 128, 24
else:
    B, KV, G, D, PS, L = 8, 12, 1, 64, 128, 12
CTX = 2048
NT = CTX // PS          # tiles per layer
ITERS = _a.iters


def setup(t_max, tps, sparse, ctx=CTX):
    nt = ctx // PS
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    n_sub = 8 if sparse else 1
    q = jax.random.normal(ks[0], (B, KV, G, D), jnp.bfloat16)
    kc = jax.random.normal(ks[1], (B, KV, L * nt, D, PS), jnp.bfloat16)
    vc = jax.random.normal(ks[2], (B, KV, L * nt, D, PS), jnp.bfloat16)
    cc = jax.random.randint(ks[3], (B, KV, L * nt, n_sub, PS), 0, 16,
                            jnp.int32)
    rs = np.random.RandomState(0)
    pos = np.full(B, ctx - 2, np.int32)
    cur = pos // PS
    tables = np.full((B, KV, t_max), -1, np.int32)
    if sparse:
        n_tiles = np.full(B, t_max, np.int32)
        for i in range(B):
            for h in range(KV):
                chosen = np.sort(rs.choice(cur[i], t_max - 1, replace=False))
                tables[i, h] = list(chosen) + [cur[i]]
    else:
        n_tiles = cur // tps + 1
        for i in range(B):
            tables[i, :, :n_tiles[i]] = np.arange(n_tiles[i]) * tps
    k_new = jax.random.normal(ks[4], (B, KV, D), jnp.bfloat16)
    v_new = jax.random.normal(ks[5], (B, KV, D), jnp.bfloat16)
    c_new = jax.random.randint(ks[6], (B, KV, n_sub), 0, 16, jnp.int32)
    return (q, kc, vc, cc, jnp.asarray(tables), jnp.asarray(n_tiles),
            jnp.asarray(pos), k_new, v_new, c_new)


def bench(fn, args, tps, clamp, label):
    @jax.jit
    def run(a):
        def body(carry, _):
            q, kc, vc, cc, tb, nt_, pos, kn, vn, cn = carry
            o, kc, vc, cc = fn(q, kc, vc, cc, tb, nt_, pos, kn, vn, cn,
                               None, ps=PS, tps=tps, scale=D ** -0.5,
                               clamp=clamp)
            # L layer applications per step equivalent: fold o back to q
            q = q + o * 1e-6
            return (q, kc, vc, cc, tb, nt_, pos, kn, vn, cn), o[0, 0, 0, 0]
        carry, os_ = jax.lax.scan(body, a, None, length=ITERS * L)
        return os_[-1]

    r = run(args)
    float(r)          # force fetch
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(args))
        best = min(best, time.perf_counter() - t0)
    per_step = best / ITERS
    print(f'{label}: {per_step * 1e3:.3f} ms/step ({L} layers), '
          f'{B / per_step:,.0f} tok/s attention-only', flush=True)
    return per_step


print('== sparse (nsel=3, tps=1) ==', flush=True)
args = setup(t_max=3, tps=1, sparse=True)
g1 = bench(decode_attention_rows, args, 1, 10.0, 'grid ')
m1 = bench(decode_attention_rows_ms, args, 1, 10.0, 'multi')
print(f'speedup {g1 / m1:.2f}x', flush=True)

print('== dense ctx 1024 (tps=4, t_max=2) ==', flush=True)
args = setup(t_max=2, tps=4, sparse=False, ctx=1024)
g2 = bench(decode_attention_rows, args, 4, 0.0, 'grid ')
m2 = bench(decode_attention_rows_ms, args, 4, 0.0, 'multi')
print(f'speedup {g2 / m2:.2f}x', flush=True)

# ---- int8 pair (the headline serving config: sparse + int8 KV) ----
from spt_proto_tpu.inference.engine import _quantize_kv
from spt_proto_tpu.ops.pallas.decode_attention import (
    decode_attention_rows_q, decode_attention_rows_q_ms)


def setup_q(t_max, tps, sparse, ctx=CTX):
    (q, kc, vc, cc, tables, n_tiles, pos, k_new, v_new,
     c_new) = setup(t_max, tps, sparse, ctx)
    nt = ctx // PS
    k8, ks = _quantize_kv(kc.swapaxes(3, 4).astype(jnp.float32))
    v8, vs = _quantize_kv(vc.swapaxes(3, 4).astype(jnp.float32))
    k8, v8 = k8.swapaxes(3, 4), v8.swapaxes(3, 4)
    kv_pad = -(-KV // 8) * 8  # KV rounded to a sublane tile
    pad = lambda s: jnp.pad(s.transpose(0, 2, 1, 3),
                            ((0, 0), (0, 0), (0, kv_pad - KV), (0, 0)))
    kn8, ksn = _quantize_kv(k_new.astype(jnp.float32))
    vn8, vsn = _quantize_kv(v_new.astype(jnp.float32))
    return (q, k8, v8, cc, pad(ks), pad(vs), tables, n_tiles, pos,
            kn8, vn8, c_new, ksn, vsn), nt


def bench_q(fn, args, nt, tps, clamp, label):
    @jax.jit
    def run(a):
        def body(carry, _):
            (q, kc, vc, cc, ks, vs, tb, nt_, pos, kn, vn, cn, ksn,
             vsn) = carry
            o, kc, vc, cc, ks, vs = fn(
                q, kc, vc, cc, ks, vs, tb, nt_, pos, kn, vn, cn, ksn,
                vsn, None, ps=PS, tps=tps, scale=D ** -0.5, clamp=clamp,
                nt_layer=nt)
            q = q + o * 1e-6
            return (q, kc, vc, cc, ks, vs, tb, nt_, pos, kn, vn, cn,
                    ksn, vsn), o[0, 0, 0, 0]
        carry, os_ = jax.lax.scan(body, a, None, length=ITERS * L)
        return os_[-1]

    float(run(args))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(args))
        best = min(best, time.perf_counter() - t0)
    per_step = best / ITERS
    print(f'{label}: {per_step * 1e3:.3f} ms/step ({L} layers), '
          f'{B / per_step:,.0f} tok/s attention-only', flush=True)
    return per_step


print('== int8 sparse (nsel=3, tps=1) ==', flush=True)
args, nt = setup_q(t_max=3, tps=1, sparse=True)
g3 = bench_q(decode_attention_rows_q, args, nt, 1, 10.0, 'grid ')
m3 = bench_q(decode_attention_rows_q_ms, args, nt, 1, 10.0, 'multi')
print(f'speedup {g3 / m3:.2f}x', flush=True)
