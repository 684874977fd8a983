"""Inference engine tests: prefill/decode parity vs the training model,
LoRA folding, sparse decode contract, int8 quantization, sampling."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spt_proto_tpu.config import tiny_config
from spt_proto_tpu.inference.engine import (KVCache, decode_step, generate,
                                            prefill, sample)
from spt_proto_tpu.inference.weights import InferenceWeights, quantize_int8
from spt_proto_tpu.models.decoder import DecoderLM
from spt_proto_tpu.tuning import surgery


def setup_model(arch='opt', **kw):
    cfg = tiny_config(arch, **kw).replace(dtype=jnp.float32)
    params = surgery.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


@pytest.mark.parametrize('arch', ['opt', 'llama'])
def test_prefill_matches_model(arch):
    cfg, params = setup_model(arch)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 12), 0,
                                cfg.vocab_size)
    iw = InferenceWeights.from_params(cfg, params, dtype=jnp.float32)
    cache = KVCache.create(cfg, 2, 16, dtype=jnp.float32)
    logits, cache = jax.jit(prefill)(iw, tokens, cache)
    model = DecoderLM(cfg=cfg)
    ref = model.apply({'params': params}, tokens)['logits']
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref),
                               atol=2e-4)
    assert int(cache.length[0]) == 12


@pytest.mark.parametrize('arch', ['opt', 'llama'])
def test_decode_matches_teacher_forced(arch):
    """prefill(s) + decode steps must reproduce the full-forward logits."""
    cfg, params = setup_model(arch)
    full = jax.random.randint(jax.random.PRNGKey(2), (2, 10), 0,
                              cfg.vocab_size)
    iw = InferenceWeights.from_params(cfg, params, dtype=jnp.float32)
    cache = KVCache.create(cfg, 2, 16, dtype=jnp.float32)
    logits_p, cache = jax.jit(prefill)(iw, full[:, :6], cache)
    outs = [logits_p[:, -1]]
    step = jax.jit(decode_step)
    for t in range(6, 10):
        lg, cache = step(iw, full[:, t], cache)
        outs.append(lg)
    model = DecoderLM(cfg=cfg)
    ref = model.apply({'params': params}, full)['logits']
    for i, lg in enumerate(outs):
        np.testing.assert_allclose(np.asarray(lg), np.asarray(ref[:, 5 + i]),
                                   atol=5e-4,
                                   err_msg=f'step {i}')


def test_lora_folding_preserves_logits():
    cfg, params = setup_model('opt')
    cfg2, params2 = surgery.upgrade(cfg, params, 'lora',
                                    jax.random.PRNGKey(3), d_lora=4)
    # perturb lora_right so folding is non-trivial
    from spt_proto_tpu.utils.tree import flatten, unflatten
    flat = flatten(params2)
    for k in flat:
        if 'lora_right' in k:
            flat[k] = flat[k] + 0.05 * np.random.RandomState(0).randn(
                *flat[k].shape).astype(np.float32)
    params2 = unflatten(flat)
    tokens = jax.random.randint(jax.random.PRNGKey(4), (1, 8), 0,
                                cfg.vocab_size)
    ref = DecoderLM(cfg=cfg2).apply({'params': params2}, tokens)['logits']
    iw = InferenceWeights.from_params(cfg2, params2, dtype=jnp.float32)
    cache = KVCache.create(cfg2, 1, 8, dtype=jnp.float32)
    logits, _ = jax.jit(prefill)(iw, tokens, cache)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref),
                               atol=2e-4)


@pytest.mark.parametrize('arch', ['opt', 'llama'])
def test_full_upgrade_prefill_parity(arch):
    """Serving a full_upgrade model (LoRA + routed FFN + sparse MHA — the
    flagship config) must reproduce the training model's forward exactly:
    the routed-LoRA path must keep coeff = 2*router_prob semantics and the
    training top-k defaults (ADVICE r1: folding LoRA into routed kernels
    silently changed both)."""
    cfg, params = setup_model(arch, d_codeword=4, n_codewords=8)
    cfg2, params2 = surgery.full_upgrade(cfg, params, jax.random.PRNGKey(3),
                                         d_lora=4)
    # perturb LoRA right factors so the adapter path is non-trivial
    from spt_proto_tpu.utils.tree import flatten, unflatten
    flat = flatten(params2)
    for k in flat:
        if 'lora_right' in k:
            flat[k] = flat[k] + 0.05 * np.random.RandomState(0).randn(
                *flat[k].shape).astype(np.float32)
    params2 = unflatten(flat)
    tokens = jax.random.randint(jax.random.PRNGKey(4), (2, 8), 0,
                                cfg2.vocab_size)
    ref = DecoderLM(cfg=cfg2).apply({'params': params2}, tokens)['logits']
    iw = InferenceWeights.from_params(cfg2, params2, dtype=jnp.float32)
    cache = KVCache.create(cfg2, 2, 8, dtype=jnp.float32)
    logits, _ = jax.jit(prefill)(iw, tokens, cache)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref),
                               atol=5e-4)


def test_sparse_decode_runs_and_uses_topk():
    cfg, params = setup_model('opt', attention='sparse_v2', d_codeword=4,
                              n_codewords=8, sparse_coeff=4)
    iw = InferenceWeights.from_params(cfg, params, dtype=jnp.float32)
    cache = KVCache.create(cfg, 2, 32, dtype=jnp.float32)
    tokens = jax.random.randint(jax.random.PRNGKey(5), (2, 8), 0,
                                cfg.vocab_size)
    logits, cache = jax.jit(prefill)(iw, tokens, cache)
    assert np.isfinite(np.asarray(logits)).all()
    step = jax.jit(decode_step)
    tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
    for _ in range(3):
        lg, cache = step(iw, tok, cache)
        assert np.isfinite(np.asarray(lg)).all()
        tok = jnp.argmax(lg, -1).astype(jnp.int32)
    assert int(cache.length[0]) == 11
    # code cache was filled for the decoded positions
    assert np.asarray(cache.codes[:, :, :, :11]).any()


def test_generate_greedy_deterministic():
    cfg, params = setup_model('opt')
    iw = InferenceWeights.from_params(cfg, params, dtype=jnp.float32)
    prompts = jax.random.randint(jax.random.PRNGKey(6), (2, 4), 0,
                                 cfg.vocab_size)
    out1 = generate(iw, prompts, 5)
    out2 = generate(iw, prompts, 5)
    assert out1.shape == (2, 9)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    # greedy continuation must match teacher-forced argmax
    model = DecoderLM(cfg=cfg)
    ref = model.apply({'params': params}, out1[:, :-1])['logits']
    np.testing.assert_array_equal(np.asarray(out1[:, 4:]),
                                  np.asarray(jnp.argmax(ref[:, 3:], -1)))


def test_generate_ragged_prompts_match_single():
    """A right-padded ragged batch with per-row lengths must generate the
    same continuation for each row as an unpadded single-row generate
    (ADVICE r1: pads used to count as context and sampling read the pad
    position's logits)."""
    cfg, params = setup_model('opt')
    iw = InferenceWeights.from_params(cfg, params, dtype=jnp.float32)
    rs = np.random.RandomState(11)
    p0 = rs.randint(0, cfg.vocab_size, size=(6,)).astype(np.int32)
    p1 = rs.randint(0, cfg.vocab_size, size=(3,)).astype(np.int32)
    width = 6
    batch = np.zeros((2, width), np.int32)
    batch[0] = p0
    batch[1, :3] = p1
    out = np.asarray(generate(iw, jnp.asarray(batch), 4,
                              lengths=jnp.asarray([6, 3])))
    solo0 = np.asarray(generate(iw, jnp.asarray(p0[None]), 4,
                                max_len=width + 4))
    solo1 = np.asarray(generate(iw, jnp.asarray(p1[None]), 4,
                                max_len=width + 4))
    np.testing.assert_array_equal(out[0, width:], solo0[0, 6:])
    np.testing.assert_array_equal(out[1, width:], solo1[0, 3:])


def test_int8_quantization_error_small():
    w = jax.random.normal(jax.random.PRNGKey(7), (64, 32))
    qd = quantize_int8(w)
    assert qd['q'].dtype == jnp.int8
    assert qd['q'].shape[-1] % 256 == 0   # N padded at quantization time
    deq = qd['q'][..., :w.shape[-1]].astype(jnp.float32) * qd['scale']
    rel = float(jnp.max(jnp.abs(deq - w)) / jnp.max(jnp.abs(w)))
    assert rel < 0.01


def test_int8_matmul_kernel_matches_ref():
    from spt_proto_tpu.ops.pallas.int8_matmul import (int8_matmul,
                                                      int8_matmul_ref)
    x = jax.random.normal(jax.random.PRNGKey(8), (48, 96))
    w = jax.random.normal(jax.random.PRNGKey(9), (96, 160))
    qd = quantize_int8(w)
    got = int8_matmul(x, qd['q'], qd['scale'])[..., :w.shape[-1]]
    ref = int8_matmul_ref(x, qd['q'][..., :w.shape[-1]], qd['scale'])
    # kernel computes in bf16 on the MXU; oracle is f32
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2,
                               atol=1e-1)


@pytest.mark.parametrize('kw', [dict(arch='opt'),
                                dict(arch='llama', n_kv_heads=2)])
def test_int8_engine_end_to_end(kw):
    """MHA exercises the fused [D, 3D] int8 qkv; GQA (llama kv=2) the
    separate-projection fallback."""
    cfg, params = setup_model(**kw)
    iw8 = InferenceWeights.from_params(cfg, params, quant='int8',
                                       dtype=jnp.float32)
    if cfg.kv_heads == cfg.n_heads:
        mha = iw8.params['blocks']['mha']
        assert 'qkv' in mha and isinstance(mha['qkv']['kernel'], dict)
    iw = InferenceWeights.from_params(cfg, params, dtype=jnp.float32)
    tokens = jax.random.randint(jax.random.PRNGKey(10), (1, 8), 0,
                                cfg.vocab_size)
    cache8 = KVCache.create(cfg, 1, 8, dtype=jnp.float32)
    cache = KVCache.create(cfg, 1, 8, dtype=jnp.float32)
    l8, _ = jax.jit(prefill)(iw8, tokens, cache8)
    lf, _ = jax.jit(prefill)(iw, tokens, cache)
    # int8 weight-only should stay close to fp logits
    err = float(jnp.mean(jnp.abs(l8 - lf)))
    rng = float(jnp.max(jnp.abs(lf)))
    assert err / rng < 0.05, (err, rng)


def test_sampling_modes():
    logits = jnp.asarray([[0.0, 5.0, 1.0, -2.0]])
    assert int(sample(logits)[0]) == 1
    rng = jax.random.PRNGKey(0)
    s = sample(logits, rng, temperature=1.0, top_k=2)
    assert int(s[0]) in (1, 2)
    s = sample(logits, rng, temperature=0.5, top_p=0.9)
    assert int(s[0]) in (1, 2, 0)


def test_tiles_decode_degenerate_equals_dense():
    """With enough selected tiles to cover the whole causal context, tiles
    sparse decode must equal dense decode exactly (clamp wide open)."""
    cfg = tiny_config('opt', attention='sparse_v2', d_codeword=4,
                      n_codewords=8, sparse_coeff=1, score_clamp=1e9,
                      sparse_decode='tiles').replace(dtype=jnp.float32)
    cfg.validate()
    params = surgery.init_params(cfg, jax.random.PRNGKey(0))
    iw = InferenceWeights.from_params(cfg, params, dtype=jnp.float32)
    dense_cfg = cfg.replace(attention='dense')
    iw_d = InferenceWeights.from_params(dense_cfg, params,
                                        dtype=jnp.float32)
    b, s, smax = 2, 140, 256     # smax = 2 tiles; nsel = 2+1 covers all
    tokens = jax.random.randint(jax.random.PRNGKey(1), (b, s), 0,
                                cfg.vocab_size)
    cache = KVCache.create(cfg, b, smax, dtype=jnp.float32)
    cache_d = KVCache.create(dense_cfg, b, smax, dtype=jnp.float32)
    lg, cache = jax.jit(prefill)(iw, tokens, cache)
    lg_d, cache_d = jax.jit(prefill)(iw_d, tokens, cache_d)
    tok = jnp.argmax(lg_d[:, -1], -1).astype(jnp.int32)
    for _ in range(3):
        out_s, cache = jax.jit(decode_step)(iw, tok, cache)
        out_d, cache_d = jax.jit(decode_step)(iw_d, tok, cache_d)
        np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_d),
                                   atol=2e-3)
        tok = jnp.argmax(out_d, -1).astype(jnp.int32)


def test_tiles_decode_sparse_runs():
    cfg = tiny_config('opt', attention='sparse_v2', d_codeword=4,
                      n_codewords=8, sparse_coeff=4,
                      sparse_decode='tiles').replace(dtype=jnp.float32)
    cfg.validate()
    params = surgery.init_params(cfg, jax.random.PRNGKey(0))
    iw = InferenceWeights.from_params(cfg, params, dtype=jnp.float32)
    cache = KVCache.create(cfg, 2, 512, dtype=jnp.float32)
    tokens = jax.random.randint(jax.random.PRNGKey(2), (2, 130), 0,
                                cfg.vocab_size)
    lg, cache = jax.jit(prefill)(iw, tokens, cache)
    step = jax.jit(decode_step)
    tok = jnp.argmax(lg[:, -1], -1).astype(jnp.int32)
    for _ in range(3):
        lg2, cache = step(iw, tok, cache)
        assert np.isfinite(np.asarray(lg2)).all()
        tok = jnp.argmax(lg2, -1).astype(jnp.int32)
    assert int(cache.length[0]) == 133


def test_gqa_decode_matches_teacher_forced():
    cfg = tiny_config('llama', n_kv_heads=2).replace(dtype=jnp.float32)
    params = surgery.init_params(cfg, jax.random.PRNGKey(0))
    full = jax.random.randint(jax.random.PRNGKey(3), (2, 10), 0,
                              cfg.vocab_size)
    iw = InferenceWeights.from_params(cfg, params, dtype=jnp.float32)
    cache = KVCache.create(cfg, 2, 16, dtype=jnp.float32)
    # cache holds kv_heads, not n_heads
    assert cache.k.shape[2] == 2
    lg, cache = jax.jit(prefill)(iw, full[:, :6], cache)
    outs = [lg[:, -1]]
    step = jax.jit(decode_step)
    for t in range(6, 10):
        o, cache = step(iw, full[:, t], cache)
        outs.append(o)
    from spt_proto_tpu.models.decoder import DecoderLM
    ref = DecoderLM(cfg=cfg).apply({'params': params}, full)['logits']
    for i, lg_ in enumerate(outs):
        np.testing.assert_allclose(np.asarray(lg_),
                                   np.asarray(ref[:, 5 + i]), atol=5e-4,
                                   err_msg=f'step {i}')


def test_prefill_chunk_matches_prefill():
    """Chunk-by-chunk prefill must reproduce one-shot prefill exactly for
    dense configs (same math, same cache tiles), including llama RoPE+GQA."""
    from spt_proto_tpu.inference.engine import prefill_chunk
    for kw in (dict(arch='opt'), dict(arch='llama', n_kv_heads=2)):
        cfg = tiny_config(max_length=512, **kw).replace(dtype=jnp.float32)
        params = surgery.init_params(cfg, jax.random.PRNGKey(0))
        iw = InferenceWeights.from_params(cfg, params, dtype=jnp.float32)
        toks = jnp.asarray(np.random.RandomState(0).randint(
            1, cfg.vocab_size, (1, 384)), jnp.int32)
        cache_f = KVCache.create(cfg, 1, 512, dtype=jnp.float32)
        lg_f, cache_f = jax.jit(prefill)(iw, toks, cache_f)
        cache_c = KVCache.create(cfg, 1, 512, dtype=jnp.float32)
        outs = []
        for off in range(0, 384, 128):
            lg, cache_c = prefill_chunk(iw, toks[:, off:off + 128],
                                        cache_c, jnp.int32(0), off)
            outs.append(lg)
        lg_c = jnp.concatenate(outs, axis=1)
        np.testing.assert_allclose(np.asarray(lg_c), np.asarray(lg_f),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(cache_c.k),
                                   np.asarray(cache_f.k), atol=1e-5)
        np.testing.assert_allclose(np.asarray(cache_c.v),
                                   np.asarray(cache_f.v), atol=1e-5)
        assert int(cache_c.length[0]) == int(cache_f.length[0]) == 384


def test_straddling_subspace_count_padded_cache():
    """n_subspaces that straddle the int32 sublane tile (e.g. OPT-2.7B:
    d_head 80 -> n_sub 10) fault Mosaic tile DMAs unless the cache pads
    the stored code width to a multiple of 8 (KVCache note). The padded
    cache must be functionally invisible: engine completions match
    generate() exactly at n_sub=10 (stored width 16)."""
    import numpy as np

    from spt_proto_tpu.config import ModelConfig
    from spt_proto_tpu.inference.batching import ContinuousBatchingEngine
    from spt_proto_tpu.inference.engine import (KVCache, code_width,
                                                generate)
    from spt_proto_tpu.inference.weights import InferenceWeights
    from spt_proto_tpu.tuning import surgery
    cfg = ModelConfig(arch='opt', d_model=160, n_heads=4, n_layers=2,
                      max_length=128, vocab_size=128, d_feedforward=64,
                      attention='sparse_v2', d_codeword=4, n_codewords=8,
                      sparse_coeff=4, dtype=jnp.float32,
                      param_dtype=jnp.float32)
    cfg.validate()
    assert cfg.n_subspaces == 10 and code_width(cfg) == 16
    params = surgery.init_params(cfg, jax.random.PRNGKey(0))
    iw = InferenceWeights.from_params(cfg, params, dtype=jnp.float32)
    cache = KVCache.create(cfg, 2, 64, dtype=jnp.float32)
    assert cache.codes.shape[3] == 16
    rng = np.random.RandomState(3)
    # bucket-aligned prompt lengths: engine and generate() then see the
    # same padded length, so the per-row sparse selection matches exactly
    prompts = [list(map(int, rng.randint(1, cfg.vocab_size, size=16)))
               for _ in range(2)]
    ref = generate(iw, jnp.asarray(prompts, jnp.int32), 5, max_len=64)
    eng = ContinuousBatchingEngine(iw, n_slots=2, max_len=64,
                                   prefill_bucket=16)
    rids = [eng.submit(p, max_new_tokens=5) for p in prompts]
    done = {c.request_id: c.tokens for c in eng.run_until_done()}
    for i, rid in enumerate(rids):
        exp = list(np.asarray(ref)[i, 16:16 + 5])
        assert done[rid] == exp, (done[rid], exp)


def test_int8_staged_build_matches_unstaged():
    """Leaf-streamed int8 weight build (the path that lets LLaMA-7B fit one
    chip) produces the exact same tree structure and near-identical values
    as the all-at-once build."""
    cfg, params = setup_model('opt')
    cfg, params = surgery.full_upgrade(cfg, params, jax.random.PRNGKey(3),
                                       d_lora=4,
                                       ffn_block_size=cfg.d_feedforward // 4)
    host = jax.device_get(params)
    a = InferenceWeights.from_params(cfg, params, quant='int8', staged=False)
    b = InferenceWeights.from_params(cfg, host, quant='int8')  # auto-staged
    ka = {jax.tree_util.keystr(k): v
          for k, v in jax.tree_util.tree_leaves_with_path(a.params)}
    kb = {jax.tree_util.keystr(k): v
          for k, v in jax.tree_util.tree_leaves_with_path(b.params)}
    assert set(ka) == set(kb)
    for k in ka:
        va, vb = np.asarray(ka[k]), np.asarray(kb[k])
        assert va.shape == vb.shape and va.dtype == vb.dtype, k
        np.testing.assert_allclose(va.astype(np.float32),
                                   vb.astype(np.float32),
                                   atol=2e-2, rtol=1e-2, err_msg=k)
