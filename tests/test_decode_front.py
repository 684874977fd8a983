"""Fused decode-front kernel (ops/pallas/decode_front.py): component
parity vs the engine's jnp path and end-to-end token parity."""
import jax
import jax.numpy as jnp
import numpy as np


from spt_proto_tpu.config import tiny_config
from spt_proto_tpu.inference.engine import KVCache, generate, prefill
from spt_proto_tpu.inference.weights import InferenceWeights
from spt_proto_tpu.tuning import surgery


def sparse_model(d_model=128, n_heads=2, seed=0, arch='opt', **kw):
    """Tiny sparse_v2 model inside the fused-front envelope (l2 metric,
    per-head selection). kw reaches tiny_config (e.g. n_kv_heads for
    GQA, d_codeword for wide-code models)."""
    cfg = tiny_config(arch, d_model=d_model, n_heads=n_heads,
                      d_feedforward=256, vocab_size=256,
                      max_length=512, **kw).replace(dtype=jnp.float32,
                                                    pq_metric='l2')
    params = surgery.init_params(cfg, jax.random.PRNGKey(seed))
    cfg, params = surgery.upgrade(cfg, params, 'mha_v1',
                                  jax.random.PRNGKey(seed + 1))
    cfg, params = surgery.upgrade(cfg, params, 'mha_v2',
                                  jax.random.PRNGKey(seed + 2))
    return cfg, params


def test_build_pq_bd_matches_encode():
    from spt_proto_tpu.ops.pallas.decode_front import build_pq_bd
    from spt_proto_tpu.ops.pq import pq_encode
    cb = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 8))
    bd, cbn = build_pq_bd(cb)
    z = jax.random.normal(jax.random.PRNGKey(1), (6, 32))
    # kernel form: argmin of cbn - 2 * (z_head @ bd) per 16-lane group
    dots = z @ bd                                  # [6, 64]
    scores = (cbn - 2.0 * dots).reshape(6, 4, 16)
    got = jnp.argmin(scores, axis=-1)
    want = pq_encode(z, cb, 'l2')
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_front_kernel_matches_jnp_path():
    """Drive decode_front directly and compare every output against the
    engine's unfused computation."""
    from spt_proto_tpu.inference.engine import TILE, _norm, _qkv_proj
    from spt_proto_tpu.ops.pallas.decode_front import decode_front
    from spt_proto_tpu.ops.pq import pq_encode
    cfg, params = sparse_model()
    iw = InferenceWeights.from_params(cfg, params, dtype=jnp.float32)
    p = iw.params
    b, prompt = 3, 300                       # cur tile = 2, partial 3rd
    toks = jax.random.randint(jax.random.PRNGKey(3), (b, prompt), 0,
                              cfg.vocab_size)
    cache = KVCache.create(cfg, b, 512, dtype=jnp.float32)
    _, cache = jax.jit(prefill)(iw, toks, cache)
    nt = cache.tiles_per_layer(cfg.n_layers)
    nsel = min(nt, max(1, nt // cfg.sparse_coeff) + 1)
    pos = cache.length
    x = jax.random.normal(jax.random.PRNGKey(4), (b, cfg.d_model),
                          jnp.float32)
    lix = 1                                   # second layer's slab
    bp = jax.tree.map(lambda a: a[lix], p['blocks'])

    qf, kf, vf, c_new, tables = decode_front(
        x, bp['norm1']['scale'], bp['norm1']['bias'],
        bp['mha']['qkv']['kernel'], bp['mha']['qkv']['bias'],
        bp['mha']['quantizer_bd'], bp['mha']['quantizer_cbn'],
        cache.codes, pos, jnp.full((1,), lix * nt, jnp.int32),
        nt=nt, nsel=nsel, n_sub=cfg.n_subspaces, ps=TILE)

    # ---- jnp reference (decode_step's unfused path)
    kv = cfg.kv_heads
    hn = _norm(cfg, bp['norm1'], x[:, None])
    q, k, v = _qkv_proj(bp['mha'], hn)
    np.testing.assert_allclose(np.asarray(qf), np.asarray(q[:, 0]),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(kf), np.asarray(k[:, 0]),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(vf), np.asarray(v[:, 0]),
                               rtol=2e-5, atol=2e-5)
    cb = bp['mha']['quantizer']['codebook']
    codes_q = pq_encode(q[:, 0].reshape(b, kv, cfg.d_head), cb, 'l2')
    codes_k = pq_encode(k[:, 0].reshape(b, kv, cfg.d_head), cb, 'l2')
    np.testing.assert_array_equal(np.asarray(c_new), np.asarray(codes_k))

    cur = pos // TILE
    c_l = jax.lax.dynamic_slice(
        cache.codes, (0, 0, lix * nt, 0, 0),
        (b, kv, nt, cfg.n_subspaces, TILE))
    match = jnp.sum(
        (c_l == codes_q[:, :, None, :, None]).astype(jnp.float32),
        axis=3)
    tscore = match.mean(axis=-1)
    full_t = jnp.arange(nt)[None, :] < cur[:, None]
    tscore = jnp.where(full_t[:, None, :], tscore, -jnp.inf)
    svals, sidx = jax.lax.top_k(tscore, nsel - 1)
    rel = jnp.where(svals > -jnp.inf, sidx, -1)
    want = jnp.concatenate(
        [rel, jnp.broadcast_to(cur[:, None, None], (b, kv, 1))], axis=-1)
    want = jnp.where(want < 0, -1, want + lix * nt)
    np.testing.assert_array_equal(np.asarray(tables), np.asarray(want))


def test_generate_fused_front_matches_unfused():
    cfg, params = sparse_model()
    iw_f = InferenceWeights.from_params(cfg, params, dtype=jnp.float32)
    iw_u = InferenceWeights.from_params(
        cfg.replace(decode_fused_front=False), params, dtype=jnp.float32)
    p = jax.random.randint(jax.random.PRNGKey(5), (2, 200), 0,
                           cfg.vocab_size)
    out_f = np.asarray(generate(iw_f, p, 8, max_len=256))
    out_u = np.asarray(generate(iw_u, p, 8, max_len=256))
    np.testing.assert_array_equal(out_f, out_u)


def test_generate_fused_front_int8_kv_matches_unfused():
    """Also exercises the IN-KERNEL int8 KV quantization (v2): the fused
    path emits k8/v8/scales from the kernel while the unfused path runs
    engine._quantize_kv — tokens must still match exactly."""
    cfg, params = sparse_model()
    iw_f = InferenceWeights.from_params(cfg, params, dtype=jnp.float32)
    iw_u = InferenceWeights.from_params(
        cfg.replace(decode_fused_front=False), params, dtype=jnp.float32)
    p = jax.random.randint(jax.random.PRNGKey(6), (2, 200), 0,
                           cfg.vocab_size)
    out_f = np.asarray(generate(iw_f, p, 8, max_len=256,
                                quantized_kv=True))
    out_u = np.asarray(generate(iw_u, p, 8, max_len=256,
                                quantized_kv=True))
    np.testing.assert_array_equal(out_f, out_u)


def test_generate_fused_front_llama_rope_matches_unfused():
    """v2 envelope: LLaMA (RMSNorm + in-kernel RoPE rotation via the
    rotate-half matmul). Token parity incl. the int8-KV fused quantize."""
    cfg, params = sparse_model(arch='llama')
    iw_f = InferenceWeights.from_params(cfg, params, dtype=jnp.float32)
    iw_u = InferenceWeights.from_params(
        cfg.replace(decode_fused_front=False), params, dtype=jnp.float32)
    p = jax.random.randint(jax.random.PRNGKey(7), (2, 200), 0,
                           cfg.vocab_size)
    for q in (False, True):
        out_f = np.asarray(generate(iw_f, p, 8, max_len=256,
                                    quantized_kv=q))
        out_u = np.asarray(generate(iw_u, p, 8, max_len=256,
                                    quantized_kv=q))
        np.testing.assert_array_equal(out_f, out_u)


def test_generate_fused_front_gqa_matches_unfused():
    """v2 envelope: GQA (separate q/k/v projections, group-pooled match
    scores in-kernel)."""
    cfg, params = sparse_model(arch='llama', d_model=256, n_heads=4,
                               n_kv_heads=2)
    iw_f = InferenceWeights.from_params(cfg, params, dtype=jnp.float32)
    iw_u = InferenceWeights.from_params(
        cfg.replace(decode_fused_front=False), params, dtype=jnp.float32)
    p = jax.random.randint(jax.random.PRNGKey(8), (2, 200), 0,
                           cfg.vocab_size)
    out_f = np.asarray(generate(iw_f, p, 8, max_len=256))
    out_u = np.asarray(generate(iw_u, p, 8, max_len=256))
    np.testing.assert_array_equal(out_f, out_u)


def test_generate_fused_front_padded_code_width():
    """v2 envelope: n_subspaces = 10 (d_head 80) — the 2.7B shape whose
    stored code width is sublane-padded to 16 with -2 columns."""
    cfg, params = sparse_model(d_model=640, n_heads=8)
    assert cfg.n_subspaces == 10
    iw_f = InferenceWeights.from_params(cfg, params, dtype=jnp.float32)
    iw_u = InferenceWeights.from_params(
        cfg.replace(decode_fused_front=False), params, dtype=jnp.float32)
    p = jax.random.randint(jax.random.PRNGKey(9), (2, 200), 0,
                           cfg.vocab_size)
    out_f = np.asarray(generate(iw_f, p, 6, max_len=256))
    out_u = np.asarray(generate(iw_u, p, 6, max_len=256))
    np.testing.assert_array_equal(out_f, out_u)


def test_generate_fused_front_int8_weights_matches_unfused():
    """v2 envelope: int8 WEIGHT serving (the 7B w8 configuration) — the
    front kernel streams the packed [D, 3D] int8 QKV with fused dequant.
    At d_model=128 int8_matmul uses a single K block, so the fused dot's
    accumulation matches and tokens are exact (at flagship d the two
    chunk differently; near-tie code flips are tolerated there, same as
    every int8-weight parity contract in this suite)."""
    from spt_proto_tpu.inference.engine import generate
    cfg, params = sparse_model()
    iw_f = InferenceWeights.from_params(cfg, params, quant='int8',
                                        staged=False, dtype=jnp.float32)
    iw_u = InferenceWeights.from_params(
        cfg.replace(decode_fused_front=False), params, quant='int8',
        staged=False, dtype=jnp.float32)
    assert isinstance(iw_f.params['blocks']['mha']['qkv']['kernel'], dict)
    p = jax.random.randint(jax.random.PRNGKey(11), (2, 200), 0,
                           cfg.vocab_size)
    for q in (False, True):
        out_f = np.asarray(generate(iw_f, p, 8, max_len=256,
                                    quantized_kv=q))
        out_u = np.asarray(generate(iw_u, p, 8, max_len=256,
                                    quantized_kv=q))
        np.testing.assert_array_equal(out_f, out_u)


def test_generate_fused_front_int8_weights_llama():
    """int8 weights + LLaMA RoPE through the fused front (the exact 7B
    serving shape family)."""
    from spt_proto_tpu.inference.engine import generate
    cfg, params = sparse_model(arch='llama')
    iw_f = InferenceWeights.from_params(cfg, params, quant='int8',
                                        staged=False, dtype=jnp.float32)
    iw_u = InferenceWeights.from_params(
        cfg.replace(decode_fused_front=False), params, quant='int8',
        staged=False, dtype=jnp.float32)
    p = jax.random.randint(jax.random.PRNGKey(12), (2, 200), 0,
                           cfg.vocab_size)
    out_f = np.asarray(generate(iw_f, p, 8, max_len=256,
                                quantized_kv=True))
    out_u = np.asarray(generate(iw_u, p, 8, max_len=256,
                                quantized_kv=True))
    np.testing.assert_array_equal(out_f, out_u)
