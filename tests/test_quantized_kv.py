"""int8 quantized KV cache (ROADMAP 8): kernel parity + end-to-end decode.

The quantized tile-major decode kernel (decode_attention_rows_q) must
match its jnp oracle exactly (same int8 inputs => same f32 math), and the
end-to-end generate() with quantized_kv must track the bf16 cache within
quantization error (logit drift ~1%, greedy tokens largely unchanged on a
trained-scale model; here random-init tiny models + logit comparison).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spt_proto_tpu.config import tiny_config
from spt_proto_tpu.inference.engine import (KVCache, _quantize_kv,
                                            decode_step, generate, prefill)
from spt_proto_tpu.inference.weights import InferenceWeights
from spt_proto_tpu.ops.pallas.decode_attention import (
    decode_attention_rows_q, decode_attention_rows_q_ref)
from spt_proto_tpu.tuning import surgery

PS = 128


def _kernel_case(b=2, kv=2, g=2, d=64, nt=4, t_max=3, tps=1, n_sub=1,
                 seed=0):
    r = np.random.RandomState(seed)
    kf = r.randn(b, kv, nt, d, PS).astype(np.float32)
    vf = r.randn(b, kv, nt, d, PS).astype(np.float32)
    k8, ks = _quantize_kv(jnp.asarray(kf).swapaxes(3, 4))   # per-token
    v8, vs = _quantize_kv(jnp.asarray(vf).swapaxes(3, 4))
    k8 = k8.swapaxes(3, 4)
    v8 = v8.swapaxes(3, 4)
    ks = ks.transpose(0, 2, 1, 3)                           # [B,NT,KV,PS]
    vs = vs.transpose(0, 2, 1, 3)
    c = jnp.zeros((b, kv, nt, n_sub, PS), jnp.int32)
    q = jnp.asarray(r.randn(b, kv, g, d).astype(np.float32))
    kn8, ksn = _quantize_kv(jnp.asarray(r.randn(b, kv, d), jnp.float32))
    vn8, vsn = _quantize_kv(jnp.asarray(r.randn(b, kv, d), jnp.float32))
    pos = jnp.asarray(r.randint(0, nt * PS - 1, size=(b,)), jnp.int32)
    # dense-style tables: entries cover [0, cur] (cur tile last)
    cur = pos // PS
    e = jnp.arange(t_max)[None]
    n_tiles = jnp.minimum(cur + 1, t_max)
    # last entry must contain the write tile: slide a window ending at cur
    start = jnp.maximum(0, cur - (n_tiles - 1))
    tables = jnp.where(e < n_tiles[:, None], start[:, None] + e, -1)
    tables = jnp.broadcast_to(tables[:, None], (b, kv, t_max)).astype(
        jnp.int32)
    return (q, k8, v8, c, ks, vs, tables, n_tiles, pos, kn8, vn8,
            jnp.zeros((b, kv, n_sub), jnp.int32), ksn, vsn)


@pytest.mark.parametrize('tps', [1, 2])
def test_rows_q_kernel_matches_oracle(tps):
    nt = 8
    args = _kernel_case(nt=nt, t_max=4 if tps == 1 else 2, tps=tps)
    if tps > 1:  # dense supertile tables: stride-tps entries
        (q, k8, v8, c, ks, vs, _, _, pos, kn8, vn8, cn, ksn, vsn) = args
        b, kv = q.shape[:2]
        cur = pos // PS
        n_sup = cur // tps + 1
        t_max = nt // tps
        e = jnp.arange(t_max)[None]
        tables = jnp.where(e < n_sup[:, None], e * tps, -1)
        tables = jnp.broadcast_to(tables[:, None], (b, kv, t_max)).astype(
            jnp.int32)
        args = (q, k8, v8, c, ks, vs, tables, n_sup, pos, kn8, vn8, cn,
                ksn, vsn)
    got = decode_attention_rows_q(*args, ps=PS, tps=tps, scale=0.125,
                                  interpret=True)
    want = decode_attention_rows_q_ref(*args, ps=PS, tps=tps, scale=0.125)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                               atol=2e-5, rtol=1e-5)
    for g_, w_, name in [(got[1], want[1], 'k'), (got[2], want[2], 'v'),
                         (got[4], want[4], 'ks'), (got[5], want[5], 'vs')]:
        np.testing.assert_array_equal(np.asarray(g_), np.asarray(w_),
                                      err_msg=name)


@pytest.mark.parametrize('tps', [1, 2])
def test_rows_q_ms_kernel_matches_oracle(tps):
    """Multi-slot quantized kernel == the shared jnp oracle."""
    from spt_proto_tpu.ops.pallas.decode_attention import (
        decode_attention_rows_q_ms)
    nt = 8
    args = _kernel_case(b=3, nt=nt, t_max=4 if tps == 1 else 2, tps=tps)
    if tps > 1:
        (q, k8, v8, c, ks, vs, _, _, pos, kn8, vn8, cn, ksn, vsn) = args
        b, kv = q.shape[:2]
        cur = pos // PS
        n_sup = cur // tps + 1
        t_max = nt // tps
        e = jnp.arange(t_max)[None]
        tables = jnp.where(e < n_sup[:, None], e * tps, -1)
        tables = jnp.broadcast_to(tables[:, None], (b, kv, t_max)).astype(
            jnp.int32)
        args = (q, k8, v8, c, ks, vs, tables, n_sup, pos, kn8, vn8, cn,
                ksn, vsn)
    got = decode_attention_rows_q_ms(*args, ps=PS, tps=tps, scale=0.125,
                                     interpret=True)
    want = decode_attention_rows_q_ref(*args, ps=PS, tps=tps, scale=0.125)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                               atol=2e-5, rtol=1e-5)
    for g_, w_, name in [(got[1], want[1], 'k'), (got[2], want[2], 'v'),
                         (got[4], want[4], 'ks'), (got[5], want[5], 'vs')]:
        np.testing.assert_array_equal(np.asarray(g_), np.asarray(w_),
                                      err_msg=name)


def test_rows_q_ms_with_codes_and_tile_base():
    """ms quantized kernel writes PQ codes and honors tile_base."""
    from spt_proto_tpu.ops.pallas.decode_attention import (
        decode_attention_rows_q_ms)
    (q, k8, v8, c, ks, vs, tables, n_tiles, pos, kn8, vn8, cn, ksn,
     vsn) = _kernel_case(b=2, nt=8, t_max=3, n_sub=4, seed=3)
    r = np.random.RandomState(3)
    c = jnp.asarray(r.randint(0, 16, c.shape), jnp.int32)
    cn = jnp.asarray(r.randint(0, 16, cn.shape), jnp.int32)
    nt_layer = 4   # two folded layers of 4 tiles each
    base = jnp.asarray([0, nt_layer], jnp.int32)
    # clamp tables into the slot's layer block
    tables = jnp.where(tables >= 0,
                       jnp.clip(tables, 0, nt_layer - 1) + base[:, None,
                                                                None], -1)
    pos = jnp.clip(pos, 0, nt_layer * PS - 1)
    # rebuild validity: window ending at cur within the layer block
    cur = pos // PS
    t_max = tables.shape[2]
    n_tiles = jnp.minimum(cur + 1, t_max)
    e = jnp.arange(t_max)[None]
    start = jnp.maximum(0, cur - (n_tiles - 1))
    tables = jnp.where(e < n_tiles[:, None],
                       (start[:, None] + e) + base[:, None], -1)
    tables = jnp.broadcast_to(tables[:, None],
                              (2, q.shape[1], t_max)).astype(jnp.int32)
    args = (q, k8, v8, c, ks, vs, tables, n_tiles, pos, kn8, vn8, cn,
            ksn, vsn, base)
    got = decode_attention_rows_q_ms(*args, ps=PS, scale=0.125,
                                     nt_layer=nt_layer, interpret=True)
    want = decode_attention_rows_q_ref(*args, ps=PS, scale=0.125)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                               atol=2e-5, rtol=1e-5)
    for i, name in [(1, 'k'), (2, 'v'), (3, 'c'), (4, 'ks'), (5, 'vs')]:
        np.testing.assert_array_equal(np.asarray(got[i]),
                                      np.asarray(want[i]), err_msg=name)


def _setup_model(attention='dense', seed=0):
    cfg = tiny_config('opt', vocab_size=128, n_layers=2,
                      max_length=512)
    params = surgery.init_params(cfg, jax.random.PRNGKey(seed))
    if attention != 'dense':
        cfg, params = surgery.upgrade(cfg, params, 'mha_v1',
                                      jax.random.PRNGKey(1))
        cfg, params = surgery.upgrade(cfg, params, 'mha_v2',
                                      jax.random.PRNGKey(2))
    return cfg, InferenceWeights.from_params(cfg, params)


@pytest.mark.parametrize('attention', ['dense', 'sparse_v2'])
def test_quantized_decode_tracks_bf16(attention):
    """Prefill + a few decode steps: int8-cache logits stay within
    quantization error of the bf16-cache logits."""
    cfg, iw = _setup_model(attention)
    b, s = 2, 160
    prompts = jnp.asarray(
        np.random.RandomState(0).randint(1, cfg.vocab_size, (b, s)),
        jnp.int32)
    caches = {
        False: KVCache.create(cfg, b, 256, dtype=cfg.dtype),
        True: KVCache.create(cfg, b, 256, dtype=cfg.dtype, quantized=True),
    }
    logits = {}
    for quant, cache in caches.items():
        lg, cache = jax.jit(prefill)(iw, prompts, cache)
        tok = jnp.argmax(lg[:, -1], -1).astype(jnp.int32)
        steps = []
        for _ in range(4):
            lg2, cache = jax.jit(decode_step)(iw, tok, cache)
            steps.append(np.asarray(lg2, np.float32))
            tok = jnp.argmax(lg2, -1).astype(jnp.int32)
        logits[quant] = np.stack(steps)
    ref, got = logits[False], logits[True]
    assert np.all(np.isfinite(got))
    # relative error of the logit vector, per step/row
    err = np.linalg.norm(got - ref, axis=-1) / np.linalg.norm(ref, axis=-1)
    assert err.max() < 0.05, err


def test_generate_quantized_kv_runs_and_matches_shape():
    cfg, iw = _setup_model('sparse_v2')
    prompts = jnp.asarray(
        np.random.RandomState(1).randint(1, cfg.vocab_size, (2, 100)),
        jnp.int32)
    out = generate(iw, prompts, 12, quantized_kv=True)
    assert out.shape == (2, 112)
    assert np.all(np.asarray(out) >= 0)


def test_cache_memory_halves():
    cfg = tiny_config('opt', n_layers=2)
    c16 = KVCache.create(cfg, 2, 256)
    c8 = KVCache.create(cfg, 2, 256, quantized=True)
    bytes16 = c16.k.nbytes + c16.v.nbytes
    bytes8 = (c8.k.nbytes + c8.v.nbytes + c8.k_scale.nbytes
              + c8.v_scale.nbytes)
    # int8 halves the values; per-token f32 scales add 4/(2*D) x (pad 8/KV)
    # overhead — 25% at this tiny d_head=16/kv=4, ~4% at the production
    # d_head=64/kv=12 (ratio ~0.54)
    assert bytes8 <= bytes16 * 0.8, (bytes8, bytes16)


def test_chunked_prefill_quantized_tracks_bf16_chunked():
    """prefill_chunk over the int8 cache: decode logits after a chunked
    quantized prefill track the SAME chunked prefill on the bf16 cache
    (isolates quantization error from the chunk path's different sparse
    selection contract vs whole-prompt prefill)."""
    from spt_proto_tpu.inference.engine import prefill_chunk

    cfg, iw = _setup_model('sparse_v2')
    s = 256
    prompts = jnp.asarray(
        np.random.RandomState(3).randint(1, cfg.vocab_size, (1, s)),
        jnp.int32)
    caches = {
        False: KVCache.create(cfg, 1, 384, dtype=cfg.dtype),
        True: KVCache.create(cfg, 1, 384, dtype=cfg.dtype, quantized=True),
    }
    dec = {}
    slot = jnp.int32(0)
    for quant, c in caches.items():
        for off in (0, 128):
            lg, c = prefill_chunk(iw, prompts[:, off:off + 128], c,
                                  slot, off)
        tok = jnp.argmax(lg[:, -1], -1).astype(jnp.int32)
        d, c = jax.jit(decode_step)(iw, tok, c)
        dec[quant] = np.asarray(d, np.float32)
    err = (np.linalg.norm(dec[True] - dec[False])
           / np.linalg.norm(dec[False]))
    assert err < 0.05, err


def test_continuous_batching_quantized_matches_generate():
    """ContinuousBatchingEngine(quantized_kv=True) greedy completions ==
    isolated generate(quantized_kv=True): identical quantized math on
    both paths."""
    from spt_proto_tpu.inference.batching import ContinuousBatchingEngine

    cfg = tiny_config('opt').replace(dtype=jnp.float32)
    params = surgery.init_params(cfg, jax.random.PRNGKey(0))
    iw = InferenceWeights.from_params(cfg, params, dtype=jnp.float32)
    rng = np.random.RandomState(0)
    prompts = [list(rng.randint(1, cfg.vocab_size, size=n))
               for n in (5, 9, 3)]
    eng = ContinuousBatchingEngine(iw, n_slots=2, max_len=64,
                                   prefill_bucket=16, quantized_kv=True)
    rids = [eng.submit(p, max_new_tokens=5) for p in prompts]
    completions = {c.request_id: c.tokens for c in eng.run_until_done()}
    assert set(completions) == set(rids)
    for p, rid in zip(prompts, rids):
        ref = generate(iw, jnp.asarray([p], jnp.int32), 5, max_len=64,
                       quantized_kv=True)
        ref_new = list(np.asarray(ref)[0, len(p):])
        assert completions[rid] == ref_new, (completions[rid], ref_new)


def test_chunked_quantized_in_engine():
    """Chunked prefill + int8 cache inside the batching engine."""
    from spt_proto_tpu.inference.batching import ContinuousBatchingEngine

    cfg = tiny_config('opt', max_length=512).replace(dtype=jnp.float32)
    params = surgery.init_params(cfg, jax.random.PRNGKey(4))
    iw = InferenceWeights.from_params(cfg, params, dtype=jnp.float32)
    rng = np.random.RandomState(5)
    prompts = [list(rng.randint(1, cfg.vocab_size, size=n))
               for n in (300, 6)]
    eng = ContinuousBatchingEngine(iw, n_slots=2, max_len=448,
                                   prefill_bucket=16, prefill_chunk=128,
                                   quantized_kv=True)
    rids = [eng.submit(p, max_new_tokens=4) for p in prompts]
    completions = eng.run_until_done()
    assert len(completions) == 2
    assert all(len(c.tokens) == 4 for c in completions)


def test_paged_quantized_decode_tracks_bf16():
    """Paged int8 pools: prefill + decode logits track the bf16 paged
    cache within quantization error (dense and sparse page selection)."""
    from spt_proto_tpu.inference.paged import (PageAllocator, PagedKVCache,
                                               paged_decode_step,
                                               paged_prefill)
    for attention in ('dense', 'sparse_v2'):
        cfg, iw = _setup_model(attention)
        b, s, ps = 2, 160, 64
        n_pages = 2 * (-(-256 // ps))
        prompts = jnp.asarray(
            np.random.RandomState(0).randint(1, cfg.vocab_size, (b, s)),
            jnp.int32)
        dec = {}
        for quant in (False, True):
            alloc = PageAllocator(n_pages, b)
            cache = PagedKVCache.create(cfg, b, n_pages, ps, 256,
                                        dtype=cfg.dtype, quantized=quant)
            rows = []
            for slot in range(b):
                alloc.ensure(slot, 256, ps)
                rows.append(alloc.table(slot, cache.page_indices.shape[1]))
            cache = dataclasses.replace(
                cache, page_indices=jnp.asarray(np.stack(rows), jnp.int32))
            lg, cache = jax.jit(paged_prefill)(iw, prompts, cache)
            tok = jnp.argmax(lg[:, -1], -1).astype(jnp.int32)
            d, cache = jax.jit(paged_decode_step)(iw, tok, cache)
            dec[quant] = np.asarray(d, np.float32)
            assert np.all(np.isfinite(dec[quant]))
        err = (np.linalg.norm(dec[True] - dec[False])
               / np.linalg.norm(dec[False]))
        assert err < 0.05, (attention, err)


def test_paged_engine_quantized():
    """Continuous batching over paged int8 pools completes requests."""
    from spt_proto_tpu.inference.batching import ContinuousBatchingEngine

    cfg = tiny_config('opt').replace(dtype=jnp.float32)
    params = surgery.init_params(cfg, jax.random.PRNGKey(0))
    iw = InferenceWeights.from_params(cfg, params, dtype=jnp.float32)
    rng = np.random.RandomState(2)
    prompts = [list(rng.randint(1, cfg.vocab_size, size=n))
               for n in (5, 9, 3)]
    eng = ContinuousBatchingEngine(iw, n_slots=2, max_len=64,
                                   prefill_bucket=16, paged=True,
                                   page_size=16, quantized_kv=True)
    rids = [eng.submit(p, max_new_tokens=4) for p in prompts]
    completions = eng.run_until_done()
    assert len(completions) == 3
    assert all(len(c.tokens) == 4 for c in completions)


def _q_mb(hc, t_max, tps, d, nt, kv_pad):
    slab = 2 * nt * kv_pad * PS * 4 / 2**20
    return (2 * hc * t_max * tps * PS * d
            + 2 * tps * hc * t_max * PS * 4) / 2**20 + slab


def test_rows_q_grouped_tables():
    """Grouped tables (N_TAB < KV) on the quantized kernel: one DMA per
    entry covers sel_group heads (round-4 port of the bf16 sel_group
    path); results must match the oracle."""
    args = list(_kernel_case(kv=4, g=1, nt=6, t_max=3, seed=3))
    for n_tab in (1, 2):
        a = list(args)
        a[6] = a[6][:, :n_tab]               # shared table rows
        got = decode_attention_rows_q(*a, ps=PS, tps=1, scale=0.125,
                                      interpret=True)
        want = decode_attention_rows_q_ref(*a, ps=PS, tps=1, scale=0.125)
        np.testing.assert_allclose(np.asarray(got[0]),
                                   np.asarray(want[0]),
                                   atol=2e-5, rtol=1e-5,
                                   err_msg=str(n_tab))
        for i in (1, 2, 4, 5):
            np.testing.assert_array_equal(np.asarray(got[i]),
                                          np.asarray(want[i]))


def test_rows_q_head_chunked():
    """h_chunk < kv on the quantized kernel (the flagship VMEM path,
    e.g. OPT-2.7B 32 KV heads): bit-identical to whole-slot."""
    args = _kernel_case(kv=4, g=1, nt=6, t_max=3, seed=4)
    whole = decode_attention_rows_q(*args, ps=PS, tps=1, scale=0.125,
                                    interpret=True)
    for hc in (2, 1):
        mb = _q_mb(hc, 3, 1, 64, 6, 4)
        chunked = decode_attention_rows_q(
            *args, ps=PS, tps=1, scale=0.125, interpret=True,
            max_vmem_mb=mb * 1.01)
        # o: interpret-mode CPU dots block differently per shape (~1e-8
        # noise); caches/scales must be bit-identical
        np.testing.assert_allclose(np.asarray(whole[0]),
                                   np.asarray(chunked[0]),
                                   rtol=1e-6, atol=1e-6)
        for w, c in zip(whole[1:], chunked[1:]):
            np.testing.assert_array_equal(np.asarray(w), np.asarray(c))


def test_rows_q_grouped_head_chunked():
    """sel_group > h_chunk on the quantized kernel: per-chunk grouped
    DMAs shrink to g_eff heads, results bit-identical."""
    args = list(_kernel_case(kv=4, g=1, nt=6, t_max=3, seed=5))
    args[6] = args[6][:, :1]                 # ONE table row, sel_group=4
    whole = decode_attention_rows_q(*args, ps=PS, tps=1, scale=0.125,
                                    interpret=True)
    mb = _q_mb(2, 3, 1, 64, 6, 4)
    chunked = decode_attention_rows_q(*args, ps=PS, tps=1, scale=0.125,
                                      interpret=True,
                                      max_vmem_mb=mb * 1.01)
    np.testing.assert_allclose(np.asarray(whole[0]), np.asarray(chunked[0]),
                               rtol=1e-6, atol=1e-6)
    for w, c in zip(whole[1:], chunked[1:]):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(c))
