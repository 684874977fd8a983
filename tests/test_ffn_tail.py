"""Fused skinny-m decode-tail FFN kernel (ops/pallas/ffn_tail.py):
interpret-mode parity vs the jnp oracle, and end-to-end decode parity
with the fused path on vs off."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spt_proto_tpu.config import tiny_config
from spt_proto_tpu.ops.pallas.ffn_tail import (ffn_tail, ffn_tail_gated,
                                               ffn_tail_gated_ref,
                                               ffn_tail_ref)


@pytest.mark.parametrize('m,d,f', [(8, 128, 256), (3, 256, 512),
                                   (16, 128, 128)])
def test_ffn_tail_matches_ref(m, d, f):
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    x = jax.random.normal(ks[0], (m, d), jnp.float32)
    res = jax.random.normal(ks[1], (m, d), jnp.float32)
    w1 = jax.random.normal(ks[2], (d, f), jnp.float32) * 0.05
    b1 = jax.random.normal(ks[3], (f,), jnp.float32)
    w2 = jax.random.normal(ks[4], (f, d), jnp.float32) * 0.05
    b2 = jax.random.normal(ks[5], (d,), jnp.float32)
    got = ffn_tail(x, res, w1, b1, w2, b2, act='relu')
    ref = ffn_tail_ref(x, res, w1, b1, w2, b2, act='relu')
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_ffn_tail_gated_matches_ref():
    m, d, f = 5, 128, 384
    ks = jax.random.split(jax.random.PRNGKey(1), 5)
    x = jax.random.normal(ks[0], (m, d), jnp.float32)
    res = jax.random.normal(ks[1], (m, d), jnp.float32)
    wg = jax.random.normal(ks[2], (d, f), jnp.float32) * 0.05
    ws = jax.random.normal(ks[3], (d, f), jnp.float32) * 0.05
    wd = jax.random.normal(ks[4], (f, d), jnp.float32) * 0.05
    got = ffn_tail_gated(x, res, wg, ws, wd, act='silu')
    ref = ffn_tail_gated_ref(x, res, wg, ws, wd, act='silu')
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('arch', ['opt', 'llama'])
def test_generate_fused_ffn_matches_unfused(arch):
    from spt_proto_tpu.inference.engine import generate
    from spt_proto_tpu.inference.weights import InferenceWeights
    from spt_proto_tpu.tuning import surgery
    cfg = tiny_config(arch, d_model=128, n_heads=4, d_feedforward=256,
                      vocab_size=256).replace(dtype=jnp.float32)
    params = surgery.init_params(cfg, jax.random.PRNGKey(0))
    # auto (None) resolves to OFF for bf16/f32 weights — force the fused
    # bf16 tail ON so this parity test actually exercises the kernel
    iw_f = InferenceWeights.from_params(
        cfg.replace(decode_fused_ffn=True), params, dtype=jnp.float32)
    iw_u = InferenceWeights.from_params(
        cfg.replace(decode_fused_ffn=False), params, dtype=jnp.float32)
    p = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0,
                           cfg.vocab_size)
    out_f = np.asarray(generate(iw_f, p, 6, max_len=16))
    out_u = np.asarray(generate(iw_u, p, 6, max_len=16))
    np.testing.assert_array_equal(out_f, out_u)


def test_sparse_generate_fused_ffn_matches_unfused():
    from spt_proto_tpu.inference.engine import generate
    from spt_proto_tpu.inference.weights import InferenceWeights
    from spt_proto_tpu.tuning import surgery
    cfg = tiny_config('opt', d_model=128, n_heads=4, d_feedforward=256,
                      vocab_size=256).replace(dtype=jnp.float32)
    params = surgery.init_params(cfg, jax.random.PRNGKey(0))
    cfg, params = surgery.upgrade(cfg, params, 'mha_v1',
                                  jax.random.PRNGKey(1))
    cfg, params = surgery.upgrade(cfg, params, 'mha_v2',
                                  jax.random.PRNGKey(2))
    # force the fused bf16 tail ON (auto = OFF for fp weights)
    iw_f = InferenceWeights.from_params(
        cfg.replace(decode_fused_ffn=True), params, dtype=jnp.float32)
    iw_u = InferenceWeights.from_params(
        cfg.replace(decode_fused_ffn=False), params, dtype=jnp.float32)
    p = jax.random.randint(jax.random.PRNGKey(3), (2, 8), 0,
                           cfg.vocab_size)
    out_f = np.asarray(generate(iw_f, p, 6, max_len=16))
    out_u = np.asarray(generate(iw_u, p, 6, max_len=16))
    np.testing.assert_array_equal(out_f, out_u)


def test_ffn_tail_int8_matches_dequant_ref():
    from spt_proto_tpu.inference.weights import quantize_int8
    from spt_proto_tpu.ops.pallas.ffn_tail import ffn_tail_int8
    m, d, f = 8, 128, 256
    ks = jax.random.split(jax.random.PRNGKey(2), 6)
    x = jax.random.normal(ks[0], (m, d), jnp.float32)
    res = jax.random.normal(ks[1], (m, d), jnp.float32)
    w1 = jax.random.normal(ks[2], (d, f), jnp.float32) * 0.05
    b1 = jax.random.normal(ks[3], (f,), jnp.float32) * 0.1
    w2 = jax.random.normal(ks[4], (f, d), jnp.float32) * 0.05
    b2 = jax.random.normal(ks[5], (d,), jnp.float32) * 0.1
    q1, q2 = quantize_int8(w1), quantize_int8(w2)
    got = ffn_tail_int8(x, res, q1, b1, q2, b2, act='relu')
    deq = lambda q: q['q'][..., :q['scale'].shape[-1]].astype(
        jnp.float32) * q['scale']
    ref = ffn_tail_ref(x, res, deq(q1), b1, deq(q2), b2, act='relu')
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_ffn_tail_gated_int8_matches_dequant_ref():
    from spt_proto_tpu.inference.weights import quantize_int8
    from spt_proto_tpu.ops.pallas.ffn_tail import ffn_tail_gated_int8
    m, d, f = 4, 128, 384
    ks = jax.random.split(jax.random.PRNGKey(3), 5)
    x = jax.random.normal(ks[0], (m, d), jnp.float32)
    res = jax.random.normal(ks[1], (m, d), jnp.float32)
    wg = jax.random.normal(ks[2], (d, f), jnp.float32) * 0.05
    ws = jax.random.normal(ks[3], (d, f), jnp.float32) * 0.05
    wd = jax.random.normal(ks[4], (f, d), jnp.float32) * 0.05
    qg, qs, qd = quantize_int8(wg), quantize_int8(ws), quantize_int8(wd)
    got = ffn_tail_gated_int8(x, res, qg, qs, qd, act='silu')
    deq = lambda q: q['q'][..., :q['scale'].shape[-1]].astype(
        jnp.float32) * q['scale']
    ref = ffn_tail_gated_ref(x, res, deq(qg), deq(qs), deq(qd), act='silu')
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize('arch', ['opt', 'llama'])
def test_int8_decode_fused_close_to_unfused(arch):
    """int8 serving: fused tail vs the int8_matmul path. Different
    rounding orders (f32 in-kernel vs bf16 MXU dequant), so compare
    decode logits with tolerance rather than greedy tokens."""
    from spt_proto_tpu.inference.engine import KVCache, decode_step, prefill
    from spt_proto_tpu.inference.weights import InferenceWeights
    from spt_proto_tpu.tuning import surgery
    cfg = tiny_config(arch, d_model=128, n_heads=4, d_feedforward=256,
                      vocab_size=256).replace(dtype=jnp.float32)
    params = surgery.init_params(cfg, jax.random.PRNGKey(0))
    iw_f = InferenceWeights.from_params(cfg, params, quant='int8',
                                        staged=False, dtype=jnp.float32)
    iw_u = InferenceWeights.from_params(
        cfg.replace(decode_fused_ffn=False), params, quant='int8',
        staged=False, dtype=jnp.float32)
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0,
                              cfg.vocab_size)
    cache_f = KVCache.create(cfg, 2, 16, dtype=jnp.float32)
    cache_u = KVCache.create(cfg, 2, 16, dtype=jnp.float32)
    lf, cache_f = jax.jit(prefill)(iw_f, toks, cache_f)
    lu, cache_u = jax.jit(prefill)(iw_u, toks, cache_u)
    nxt = jnp.argmax(lu[:, -1], -1).astype(jnp.int32)
    df, _ = decode_step(iw_f, nxt, cache_f)
    du, _ = decode_step(iw_u, nxt, cache_u)
    err = float(jnp.max(jnp.abs(df - du)))
    rng = float(jnp.max(jnp.abs(du)))
    assert err / rng < 0.02, (err, rng)


def test_lm_head_argmax_matches_jnp():
    from spt_proto_tpu.ops.pallas.lm_head import lm_head_argmax
    for b, d, v in ((8, 128, 300), (3, 256, 2500), (8, 128, 4096)):
        x = jax.random.normal(jax.random.PRNGKey(b + v), (b, d),
                              jnp.float32)
        w = jax.random.normal(jax.random.PRNGKey(v), (d, v), jnp.float32)
        got = lm_head_argmax(x, w)
        want = jnp.argmax(x @ w, axis=-1).astype(jnp.int32)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_lm_head_argmax_int8_matches_unfused():
    """Winner must equal argmax over the unfused int8-dequant logits
    (int8_matmul semantics: bf16 dot, per-channel scale, cast to the
    serving dtype), including V padding never winning."""
    from spt_proto_tpu.inference.weights import quantize_int8
    from spt_proto_tpu.ops.pallas.int8_matmul import int8_matmul
    from spt_proto_tpu.ops.pallas.lm_head import lm_head_argmax_int8
    # d=512 forces multiple K blocks in int8_matmul (block_k=256 at
    # m<64): the fused kernel chunks its accumulation to match, so
    # near-ties resolve identically (ADVICE r4)
    for b, d, v in ((8, 128, 300), (3, 256, 2500), (4, 512, 3000)):
        x = jax.random.normal(jax.random.PRNGKey(b + v), (b, d),
                              jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(v), (d, v), jnp.float32)
        wq = quantize_int8(w)
        got = lm_head_argmax_int8(x, wq)
        logits = int8_matmul(x, wq['q'], wq['scale'])[:, :v]
        want = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_lm_head_v_tile_fits_vmem():
    """Flagship shapes must never exceed the v5e 16 MB scoped-VMEM limit:
    double-buffered [D, ft] weight blocks are the dominant term (the
    un-budgeted ft=2048 pick OOM'd the 1.3B bench, d_model 2048 bf16)."""
    from spt_proto_tpu.ops.pallas.lm_head import _pick_v_tile
    for d, itemsize in ((768, 2), (2048, 2), (2560, 2), (4096, 2),
                        (5120, 2), (2048, 4)):
        ft = _pick_v_tile(d, 50272, itemsize)
        assert 2 * d * ft * itemsize <= 12 * 2**20, (d, itemsize, ft)
    # and parity still holds at the flagship width (interpret mode)
    from spt_proto_tpu.ops.pallas.lm_head import lm_head_argmax
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 2048), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (2048, 4096),
                          jnp.float32)
    got = lm_head_argmax(x, w)
    want = jnp.argmax(x @ w, axis=-1).astype(jnp.int32)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize('arch', ['opt', 'llama'])
def test_decode_step_greedy_matches_argmax(arch):
    from spt_proto_tpu.inference.engine import (KVCache, decode_step,
                                                decode_step_greedy,
                                                prefill)
    from spt_proto_tpu.inference.weights import InferenceWeights
    from spt_proto_tpu.tuning import surgery
    cfg = tiny_config(arch, d_model=128, n_heads=4, d_feedforward=256,
                      vocab_size=300).replace(dtype=jnp.float32)
    params = surgery.init_params(cfg, jax.random.PRNGKey(0))
    iw = InferenceWeights.from_params(cfg, params, dtype=jnp.float32)
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0,
                              cfg.vocab_size)
    cache_a = KVCache.create(cfg, 2, 16, dtype=jnp.float32)
    cache_b = KVCache.create(cfg, 2, 16, dtype=jnp.float32)
    la, cache_a = jax.jit(prefill)(iw, toks, cache_a)
    _, cache_b = jax.jit(prefill)(iw, toks, cache_b)
    nxt = jnp.argmax(la[:, -1], -1).astype(jnp.int32)
    for _ in range(3):
        lg, cache_a = decode_step(iw, nxt, cache_a)
        want = jnp.argmax(lg, -1).astype(jnp.int32)
        got, cache_b = decode_step_greedy(iw, nxt, cache_b)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        nxt = want
