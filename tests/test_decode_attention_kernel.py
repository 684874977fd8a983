"""Fused decode-attention kernel vs jnp oracle (interpret mode on CPU).

Pools are token-minor ([P, D, ps] — tokens on the lane axis)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spt_proto_tpu.ops.pallas.decode_attention import (decode_attention,
                                                       decode_attention_ref)


def _setup(bk=6, g=2, d=64, ps=32, t_max=4, n_sub=4, seed=0):
    n_pool = bk * t_max
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 8)
    q = jax.random.normal(ks[0], (bk, g, d), jnp.float32)
    k_pool = jax.random.normal(ks[1], (n_pool, d, ps), jnp.float32)
    v_pool = jax.random.normal(ks[2], (n_pool, d, ps), jnp.float32)
    c_pool = jax.random.randint(ks[3], (n_pool, n_sub, ps), 0, 16,
                                jnp.int32)
    rs = np.random.RandomState(seed)
    # each (slot, head) owns a DISJOINT tile set (the engine contract:
    # a tile belongs to exactly one sequence row)
    perm = rs.permutation(n_pool)
    tables = np.stack([
        rs.permutation(perm[i * t_max:(i + 1) * t_max])
        for i in range(bk)]).astype(np.int32)
    n_tiles = rs.randint(1, t_max + 1, size=bk).astype(np.int32)
    last_count = rs.randint(1, ps + 1, size=bk).astype(np.int32)
    # the write target is the last valid table entry at the last slot
    write_tile = tables[np.arange(bk), n_tiles - 1].astype(np.int32)
    write_slot = (last_count - 1).astype(np.int32)
    k_new = jax.random.normal(ks[4], (bk, d), jnp.float32)
    v_new = jax.random.normal(ks[5], (bk, d), jnp.float32)
    c_new = jax.random.randint(ks[6], (bk, n_sub), 0, 16, jnp.int32)
    return (q, k_pool, v_pool, c_pool, jnp.asarray(tables),
            jnp.asarray(n_tiles), jnp.asarray(last_count), k_new, v_new,
            c_new, jnp.asarray(write_tile), jnp.asarray(write_slot))


@pytest.mark.parametrize('clamp', [0.0, 10.0])
@pytest.mark.parametrize('g', [1, 2])
def test_kernel_matches_ref(g, clamp):
    args = _setup(g=g)
    scale = 64 ** -0.5
    o_k, kp_k, vp_k, cp_k = decode_attention(*args, ps=32, scale=scale,
                                             clamp=clamp, interpret=True)
    o_r, kp_r, vp_r, cp_r = decode_attention_ref(*args, ps=32, scale=scale,
                                                 clamp=clamp)
    np.testing.assert_allclose(np.asarray(o_k), np.asarray(o_r), atol=2e-5)
    np.testing.assert_array_equal(np.asarray(cp_k), np.asarray(cp_r))
    np.testing.assert_allclose(np.asarray(kp_k), np.asarray(kp_r),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(vp_k), np.asarray(vp_r),
                               atol=1e-6)


def test_ref_matches_full_softmax():
    """The oracle itself vs a naive masked softmax over gathered tiles."""
    (q, k_pool, v_pool, c_pool, tables, n_tiles, last_count, k_new, v_new,
     c_new, wt, ws) = _setup(bk=3, g=1, t_max=3)
    scale = 64 ** -0.5
    ps = 32
    o, kp, vp, _ = decode_attention_ref(
        q, k_pool, v_pool, c_pool, tables, n_tiles, last_count, k_new,
        v_new, c_new, wt, ws, ps=ps, scale=scale)
    for i in range(3):
        cols_k, cols_v = [], []
        for t in range(int(n_tiles[i])):
            tid = int(tables[i, t])
            n = ps if t < int(n_tiles[i]) - 1 else int(last_count[i])
            cols_k.append(np.asarray(kp[tid])[:, :n].T)   # [n, D]
            cols_v.append(np.asarray(vp[tid])[:, :n].T)
        kk = np.concatenate(cols_k)
        vv = np.concatenate(cols_v)
        s = (np.asarray(q[i, 0]) @ kk.T) * scale
        p = np.exp(s - s.max())
        p /= p.sum()
        np.testing.assert_allclose(np.asarray(o[i, 0]), p @ vv, atol=1e-5)


# ---------------------------------------------------------------------------
# v2 tile-major kernel
# ---------------------------------------------------------------------------

from spt_proto_tpu.ops.pallas.decode_attention import (  # noqa: E402
    decode_attention_rows, decode_attention_rows_ref)


def _setup_rows(b=3, kv=4, g=2, d=64, ps=32, smax=128, n_sub=4, seed=1,
                sparse_sel=None, tps=1):
    nt_all = smax // ps
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 8)
    q = jax.random.normal(ks[0], (b, kv, g, d), jnp.float32)
    k_cache = jax.random.normal(ks[1], (b, kv, nt_all, d, ps), jnp.float32)
    v_cache = jax.random.normal(ks[2], (b, kv, nt_all, d, ps), jnp.float32)
    c_cache = jax.random.randint(ks[3], (b, kv, nt_all, n_sub, ps), 0, 16,
                                 jnp.int32)
    rs = np.random.RandomState(seed)
    pos = rs.randint(ps, smax - 1, size=b).astype(np.int32)
    cur = pos // ps
    if sparse_sel is None:
        # dense: supertile starts 0, tps, 2*tps, ... covering the write
        # tile; per slot n_tiles = #supertiles
        t_max = -(-nt_all // tps)
        tables = np.full((b, kv, t_max), -1, np.int32)
        n_tiles = np.zeros(b, np.int32)
        for i in range(b):
            n_sup = cur[i] // tps + 1
            n_tiles[i] = n_sup
            tables[i, :, :n_sup] = np.arange(n_sup) * tps
    else:
        # sparse: sparse_sel entries, padding allowed, current last
        assert tps == 1
        t_max = sparse_sel
        tables = np.full((b, kv, t_max), -1, np.int32)
        n_tiles = np.full(b, t_max, np.int32)
        for i in range(b):
            for h in range(kv):
                avail = np.arange(cur[i])
                k_n = min(t_max - 1, len(avail))
                chosen = np.sort(rs.choice(avail, size=k_n, replace=False))
                row = list(chosen) + [-1] * (t_max - 1 - k_n) + [cur[i]]
                tables[i, h] = row
    k_new = jax.random.normal(ks[4], (b, kv, d), jnp.float32)
    v_new = jax.random.normal(ks[5], (b, kv, d), jnp.float32)
    c_new = jax.random.randint(ks[6], (b, kv, n_sub), 0, 16, jnp.int32)
    return (q, k_cache, v_cache, c_cache, jnp.asarray(tables),
            jnp.asarray(n_tiles), jnp.asarray(pos), k_new, v_new, c_new)


@pytest.mark.parametrize('mode', ['dense', 'dense-tps2', 'sparse'])
@pytest.mark.parametrize('g', [1, 2])
def test_rows_kernel_matches_ref(mode, g):
    tps = 2 if mode == 'dense-tps2' else 1
    args = _setup_rows(g=g, sparse_sel=3 if mode == 'sparse' else None,
                       tps=tps)
    scale = 64 ** -0.5
    clamp = 10.0 if mode == 'sparse' else 0.0
    o_k, k_k, v_k, c_k = decode_attention_rows(
        *args, ps=32, tps=tps, scale=scale, clamp=clamp, interpret=True)
    o_r, k_r, v_r, c_r = decode_attention_rows_ref(
        *args, ps=32, tps=tps, scale=scale, clamp=clamp)
    np.testing.assert_allclose(np.asarray(o_k), np.asarray(o_r), atol=2e-5)
    np.testing.assert_array_equal(np.asarray(c_k), np.asarray(c_r))
    np.testing.assert_allclose(np.asarray(k_k), np.asarray(k_r), atol=1e-6)
    np.testing.assert_allclose(np.asarray(v_k), np.asarray(v_r), atol=1e-6)


@pytest.mark.parametrize('mode', ['dense', 'dense-tps2', 'sparse'])
@pytest.mark.parametrize('g', [1, 2])
def test_rows_ms_kernel_matches_ref(mode, g):
    """Multi-slot single-program kernel == per-slot grid kernel oracle."""
    from spt_proto_tpu.ops.pallas.decode_attention import (
        decode_attention_rows_ms)
    tps = 2 if mode == 'dense-tps2' else 1
    args = _setup_rows(g=g, sparse_sel=3 if mode == 'sparse' else None,
                       tps=tps)
    scale = 64 ** -0.5
    clamp = 10.0 if mode == 'sparse' else 0.0
    o_k, k_k, v_k, c_k = decode_attention_rows_ms(
        *args, ps=32, tps=tps, scale=scale, clamp=clamp, interpret=True)
    o_r, k_r, v_r, c_r = decode_attention_rows_ref(
        *args, ps=32, tps=tps, scale=scale, clamp=clamp)
    np.testing.assert_allclose(np.asarray(o_k), np.asarray(o_r), atol=2e-5)
    np.testing.assert_array_equal(np.asarray(c_k), np.asarray(c_r))
    np.testing.assert_allclose(np.asarray(k_k), np.asarray(k_r), atol=1e-6)
    np.testing.assert_allclose(np.asarray(v_k), np.asarray(v_r), atol=1e-6)


def test_rows_ms_single_slot():
    """b=1 (the single-prompt CLI path) through the multi-slot kernel."""
    from spt_proto_tpu.ops.pallas.decode_attention import (
        decode_attention_rows_ms)
    args = _setup_rows(b=1, kv=3, g=2, sparse_sel=3)
    o_k, k_k, v_k, c_k = decode_attention_rows_ms(
        *args, ps=32, scale=0.125, clamp=10.0, interpret=True)
    o_r, k_r, v_r, c_r = decode_attention_rows_ref(
        *args, ps=32, scale=0.125, clamp=10.0)
    np.testing.assert_allclose(np.asarray(o_k), np.asarray(o_r), atol=2e-5)
    np.testing.assert_allclose(np.asarray(k_k), np.asarray(k_r), atol=1e-6)


def test_rows_ms_grouped_tables_and_tile_base():
    """ms kernel expands grouped tables and honors tile_base (layer
    folding), matching the per-head oracle."""
    from spt_proto_tpu.ops.pallas.decode_attention import (
        decode_attention_rows_ms)
    (q, k_cache, v_cache, c_cache, tables, n_tiles, pos, k_new, v_new,
     c_new) = _setup_rows(b=2, kv=4, g=1, smax=64)
    # two "layers" folded on the tile axis: duplicate the cache, offset
    # the second slot's tables by tile_base
    k2 = jnp.concatenate([k_cache, k_cache], axis=2)
    v2 = jnp.concatenate([v_cache, v_cache], axis=2)
    c2 = jnp.concatenate([c_cache, c_cache], axis=2)
    nt = k_cache.shape[2]
    base = jnp.asarray([0, nt], jnp.int32)
    tb = jnp.where(tables >= 0, tables + base[:, None, None], -1)
    grouped = tb[:, :1]    # one row serving all 4 heads
    o_k, kk, vk, ck = decode_attention_rows_ms(
        q, k2, v2, c2, grouped, n_tiles, pos, k_new, v_new, c_new, base,
        ps=32, scale=0.125, interpret=True)
    o_r, kr, vr, cr = decode_attention_rows_ref(
        q, k2, v2, c2, jnp.repeat(grouped, 4, axis=1), n_tiles, pos,
        k_new, v_new, c_new, base, ps=32, scale=0.125)
    np.testing.assert_allclose(np.asarray(o_k), np.asarray(o_r), atol=2e-5)
    np.testing.assert_allclose(np.asarray(kk), np.asarray(kr), atol=1e-6)
    np.testing.assert_allclose(np.asarray(vk), np.asarray(vr), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ck), np.asarray(cr))


def test_rows_ref_matches_direct_softmax():
    """Dense-mode oracle vs a direct masked softmax over the cache."""
    (q, k_cache, v_cache, c_cache, tables, n_tiles, pos, k_new, v_new,
     c_new) = _setup_rows(b=2, kv=2, g=1)
    scale = 64 ** -0.5
    ps = 32
    o, kc, vc, _ = decode_attention_rows_ref(
        q, k_cache, v_cache, c_cache, tables, n_tiles, pos, k_new, v_new,
        c_new, ps=ps, scale=scale)
    for i in range(2):
        for h in range(2):
            n = int(pos[i]) + 1
            # reassemble the row from tiles: [NT, D, ps] -> [D, NT*ps]
            row_k = np.concatenate(
                [np.asarray(kc[i, h, t]) for t in range(kc.shape[2])],
                axis=-1)
            row_v = np.concatenate(
                [np.asarray(vc[i, h, t]) for t in range(vc.shape[2])],
                axis=-1)
            kk = row_k[:, :n].T
            vv = row_v[:, :n].T
            s = (np.asarray(q[i, h, 0]) @ kk.T) * scale
            p = np.exp(s - s.max())
            p /= p.sum()
            np.testing.assert_allclose(np.asarray(o[i, h, 0]), p @ vv,
                                       atol=1e-5)


def test_rows_kernel_grouped_tables():
    """Grouped head selection (tables [B, N_TAB < KV, T]): one DMA per
    entry covers sel_group heads; output must equal the per-head oracle
    with the tables expanded."""
    import numpy as np
    from spt_proto_tpu.ops.pallas.decode_attention import (
        decode_attention_rows, decode_attention_rows_ref)
    b, kv, g, d, nt, t_max = 2, 4, 2, 64, 6, 3
    ps = 128
    r = np.random.RandomState(5)
    kc = jnp.asarray(r.randn(b, kv, nt, d, ps), jnp.float32)
    vc = jnp.asarray(r.randn(b, kv, nt, d, ps), jnp.float32)
    cc = jnp.zeros((b, kv, nt, 1, ps), jnp.int32)
    q = jnp.asarray(r.randn(b, kv, g, d), jnp.float32)
    k_new = jnp.asarray(r.randn(b, kv, d), jnp.float32)
    v_new = jnp.asarray(r.randn(b, kv, d), jnp.float32)
    c_new = jnp.zeros((b, kv, 1), jnp.int32)
    pos = jnp.asarray([300, 500], jnp.int32)
    cur = pos // ps
    e = jnp.arange(t_max)[None]
    n_tiles = jnp.minimum(cur + 1, t_max)
    start = jnp.maximum(0, cur - (n_tiles - 1))
    tab1 = jnp.where(e < n_tiles[:, None], start[:, None] + e, -1)
    for n_tab in (1, 2):  # fully shared / pairs of heads
        tables = jnp.broadcast_to(tab1[:, None], (b, n_tab, t_max)
                                  ).astype(jnp.int32)
        got = decode_attention_rows(q, kc, vc, cc, tables, n_tiles, pos,
                                    k_new, v_new, c_new, ps=ps, tps=1,
                                    scale=0.125, interpret=True)
        want = decode_attention_rows_ref(q, kc, vc, cc, tables, n_tiles,
                                         pos, k_new, v_new, c_new,
                                         ps=ps, tps=1, scale=0.125)
        np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                                   atol=2e-5, rtol=1e-5, err_msg=str(n_tab))
        np.testing.assert_array_equal(np.asarray(got[1]),
                                      np.asarray(want[1]))


def test_decode_sparse_select_heads_end_to_end():
    """cfg.sparse_select_heads pools tile selection across head groups;
    decode still runs and attends over valid context."""
    import numpy as np
    from spt_proto_tpu.config import tiny_config
    from spt_proto_tpu.inference.engine import (KVCache, decode_step,
                                                prefill)
    from spt_proto_tpu.inference.weights import InferenceWeights
    from spt_proto_tpu.tuning import surgery
    cfg = tiny_config('opt', vocab_size=128, n_layers=2, max_length=512)
    params = surgery.init_params(cfg, jax.random.PRNGKey(0))
    cfg, params = surgery.upgrade(cfg, params, 'mha_v1',
                                  jax.random.PRNGKey(1))
    cfg, params = surgery.upgrade(cfg, params, 'mha_v2',
                                  jax.random.PRNGKey(2))
    prompts = jnp.asarray(
        np.random.RandomState(0).randint(1, cfg.vocab_size, (2, 300)),
        jnp.int32)
    outs = {}
    for gsel in (1, cfg.kv_heads):
        c = cfg.replace(sparse_select_heads=gsel)
        c.validate()
        iw = InferenceWeights.from_params(c, params)
        cache = KVCache.create(c, 2, 512, dtype=c.dtype)
        lg, cache = jax.jit(prefill)(iw, prompts, cache)
        tok = jnp.argmax(lg[:, -1], -1).astype(jnp.int32)
        lg2, cache = jax.jit(decode_step)(iw, tok, cache)
        outs[gsel] = np.asarray(lg2, np.float32)
        assert np.all(np.isfinite(outs[gsel]))
    # pooled selection changes which tiles are read => logits differ but
    # stay in the same ballpark (same softmax family over a subset)
    a, b_ = outs[1], outs[cfg.kv_heads]
    na = np.linalg.norm(a - b_) / np.linalg.norm(a)
    assert na < 1.0, na


@pytest.mark.parametrize('mode', ['dense', 'sparse'])
def test_rows_kernel_head_chunked(mode):
    """Forcing h_chunk < kv (the flagship-head-count VMEM path, e.g.
    OPT-1.3B's 32 KV heads x 17 dense tiles) must be bit-identical to the
    whole-slot kernel."""
    args = _setup_rows(kv=4, g=2,
                       sparse_sel=3 if mode == 'sparse' else None)
    scale = 64 ** -0.5
    clamp = 10.0 if mode == 'sparse' else 0.0
    whole = decode_attention_rows(*args, ps=32, scale=scale, clamp=clamp,
                                  interpret=True)
    # budget that only fits 2 (then 1) head-spans per chunk
    per_head_mb = 2 * 1 * args[4].shape[2] * 32 * 64 * 4 / 2**20
    for hc in (2, 1):
        chunked = decode_attention_rows(
            *args, ps=32, scale=scale, clamp=clamp, interpret=True,
            max_vmem_mb=per_head_mb * hc * 1.01)
        for w, c in zip(whole, chunked):
            np.testing.assert_array_equal(np.asarray(w), np.asarray(c))


def test_rows_kernel_grouped_head_chunked():
    """Grouped tables (sel_group > h_chunk): per-chunk DMAs shrink to
    g_eff heads but results stay bit-identical."""
    args = list(_setup_rows(kv=4, g=1))
    tables = np.asarray(args[4])[:, :1]     # ONE table row for all heads
    args[4] = jnp.asarray(tables)
    whole = decode_attention_rows(*args, ps=32, scale=0.125,
                                  interpret=True)
    per_head_mb = 2 * 1 * tables.shape[2] * 32 * 64 * 4 / 2**20
    chunked = decode_attention_rows(*args, ps=32, scale=0.125,
                                    interpret=True,
                                    max_vmem_mb=per_head_mb * 2 * 1.01)
    for w, c in zip(whole, chunked):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(c))
