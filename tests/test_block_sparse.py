"""Block-sparse attention tests: tile selection semantics, jnp-vs-dense
degenerate equivalence, and the Pallas kernel (interpret mode) vs the jnp
reference, fwd + grads."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spt_proto_tpu.ops.block_sparse import (block_sparse_attention_ref,
                                            n_selected_tiles, pq_tile_scores,
                                            select_tiles)
from spt_proto_tpu.ops.pallas.block_sparse_attention import (
    block_sparse_attention)


def full_causal_selection(b, n_tiles):
    sel = jnp.broadcast_to(jnp.arange(n_tiles)[None, None, :],
                           (b, n_tiles, n_tiles))
    qt = jnp.arange(n_tiles)[None, :, None]
    return jnp.where(sel <= qt, sel, -1).astype(jnp.int32)


def test_tile_scores_match_bruteforce():
    rng = np.random.RandomState(0)
    b, s, n_sub, n_code, blk = 2, 32, 4, 8, 8
    cq = rng.randint(0, n_code, size=(b, s, n_sub))
    ck = rng.randint(0, n_code, size=(b, s, n_sub))
    ts = np.asarray(pq_tile_scores(jnp.asarray(cq), jnp.asarray(ck),
                                   n_codewords=n_code, block_q=blk,
                                   block_k=blk))
    # brute force: mean over q-tile rows of total match count vs k tile
    matches = (cq[:, :, None, :] == ck[:, None, :, :]).sum(-1)  # [b, s, s]
    pooled = matches.reshape(b, s // blk, blk, s // blk, blk)
    brute = pooled.sum(-1).mean(2)
    np.testing.assert_allclose(ts, brute, atol=1e-4)


def test_select_tiles_semantics():
    scores = jnp.asarray(np.random.RandomState(1).rand(1, 8, 8) * 10)
    sel = np.asarray(select_tiles(scores, 3))
    for qt in range(8):
        row = sel[0, qt]
        valid = row[row >= 0]
        assert qt in valid, 'diagonal tile must be selected'
        assert (valid <= qt).all(), 'causality'
        assert (np.diff(valid) > 0).all(), 'ascending, distinct'
        assert len(valid) == min(qt + 1, 3)
        assert (row[len(valid):] == -1).all()


def test_full_selection_equals_dense():
    b, s, d, blk = 2, 64, 16, 8
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (b, s, d)) for kk in ks)
    sel = full_causal_selection(b, s // blk)
    scale = d ** -0.5
    out = block_sparse_attention_ref(q, k, v, sel, block_q=blk, block_k=blk,
                                     scale=scale, clamp=None)
    causal = jnp.tril(jnp.ones((s, s), bool))
    sc = jnp.where(causal, scale * jnp.einsum('bsd,btd->bst', q, k),
                   -jnp.inf)
    ref = jnp.einsum('bst,btd->bsd', jax.nn.softmax(sc, -1), v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def _random_case(key=0, b=2, s=256, d=32, n_sel=2):
    ks = jax.random.split(jax.random.PRNGKey(key), 5)
    q, k, v = (jax.random.normal(kk, (b, s, d)) for kk in ks[:3])
    cq = jax.random.randint(ks[3], (b, s, 8), 0, 16)
    ck = jax.random.randint(ks[4], (b, s, 8), 0, 16)
    ts = pq_tile_scores(cq, ck, n_codewords=16, block_q=128, block_k=128)
    sel = select_tiles(ts, n_sel)
    return q, k, v, sel


def test_pallas_kernel_matches_ref():
    q, k, v, sel = _random_case()
    scale = q.shape[-1] ** -0.5
    ref = block_sparse_attention_ref(q, k, v, sel, block_q=128, block_k=128,
                                     scale=scale)
    out = block_sparse_attention(q, k, v, sel, scale=scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_pallas_kernel_grads_match_ref():
    q, k, v, sel = _random_case(1)
    scale = q.shape[-1] ** -0.5

    def loss(fn, q, k, v):
        return jnp.sum(jnp.tanh(fn(q, k, v)))

    g1 = jax.grad(lambda q, k, v: loss(
        lambda *a: block_sparse_attention(*a, sel, scale=scale), q, k, v),
        argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda q, k, v: loss(
        lambda *a: block_sparse_attention_ref(
            *a, sel, block_q=128, block_k=128, scale=scale), q, k, v),
        argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_selection_recall_on_clustered_codes():
    """When key codes cluster by tile, PQ tile scores must find the matching
    tiles — statistical contract descending from the reference's lookup
    recall > 0.8 gate (test/kernel/test_lookup.py:73-75)."""
    rng = np.random.RandomState(2)
    b, s, n_sub, n_code, blk = 1, 64, 8, 16, 8
    n_tiles = s // blk
    # each k tile uses a distinctive code pattern; queries copy the pattern
    # of their "target" tile
    tile_patterns = rng.randint(0, n_code, size=(n_tiles, n_sub))
    ck = np.repeat(tile_patterns, blk, axis=0)[None]
    target = rng.randint(0, n_tiles, size=s)
    cq = tile_patterns[target][None]
    ts = pq_tile_scores(jnp.asarray(cq), jnp.asarray(ck), n_codewords=n_code,
                        block_q=blk, block_k=blk)
    sel = np.asarray(select_tiles(ts, 3))
    hits = total = 0
    for qt in range(n_tiles):
        # majority target of this q tile, when causally reachable
        tgt = np.bincount(target[qt * blk:(qt + 1) * blk]).argmax()
        if tgt <= qt:
            total += 1
            hits += int(tgt in sel[0, qt])
    assert total > 0 and hits / total > 0.8, (hits, total)


def test_n_selected_tiles():
    assert n_selected_tiles(1024, 128, 8) == 1
    assert n_selected_tiles(4096, 128, 8) == 4
    assert n_selected_tiles(128, 128, 8) == 1


def test_dma_kernel_matches_ref():
    """v2 kernel (in-kernel double-buffered DMA over selected tiles)."""
    from spt_proto_tpu.ops.pallas.block_sparse_attention import _fwd_dma
    q, k, v, sel = _random_case(3, s=512)
    # rebuild sel at 256/128 rectangular tiling
    b = q.shape[0]
    cq = jax.random.randint(jax.random.PRNGKey(7), (b, q.shape[1], 8), 0, 16)
    ck = jax.random.randint(jax.random.PRNGKey(8), (b, q.shape[1], 8), 0, 16)
    ts = pq_tile_scores(cq, ck, n_codewords=16, block_q=256, block_k=128)
    sel = select_tiles(ts, 3, block_ratio=2)
    scale = q.shape[-1] ** -0.5
    ref = block_sparse_attention_ref(q, k, v, sel, block_q=256, block_k=128,
                                     scale=scale)
    out = _fwd_dma(q, k, v, sel, block_q=256, block_k=128, scale=scale,
                   clamp=10.0, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_reverse_flat():
    from spt_proto_tpu.ops.pallas.block_sparse_attention import _reverse_flat
    sel = jnp.asarray([[[0, -1], [0, 1], [2, -1]]], jnp.int32)  # nq=3
    rkt, rqt = map(np.asarray, _reverse_flat(sel, 4))
    assert rkt.shape == rqt.shape == (1, 3 * 2 + 4)
    # sorted by k-tile; each k-tile has its dummy (qt=-1); invalid sel
    # entries extend the final block with kt = n_kt-1 stored
    assert list(rkt[0]) == [0, 0, 0, 1, 1, 2, 2, 3, 3, 3]
    hits = [(k, q) for k, q in zip(rkt[0], rqt[0]) if q >= 0]
    assert hits == [(0, 0), (0, 1), (1, 1), (2, 2)]
    # kt values are monotone non-decreasing (block revisit contract)
    assert (np.diff(rkt[0]) >= 0).all()


@pytest.mark.parametrize('bq,mult', [(256, 1.0), (128, 4.0)])
def test_bwd_kernels_match_ref(bq, mult):
    """Dedicated Pallas backward (dq + dk/dv kernels) vs the jnp
    tile-gather vjp — rectangular q-tiles and clamp-saturated logits
    (mult=4 drives >50% of logits past the +-10 clamp, exercising the
    clip gradient mask). The reference's bar is hand-written backwards
    for every kernel (extension/softmax.cu:50-81, kernels/sddmm.py)."""
    b, s, d = 2, 512, 64
    rng = np.random.RandomState(11)
    q = jnp.asarray(rng.randn(b, s, d) * mult, jnp.float32)
    k = jnp.asarray(rng.randn(b, s, d) * mult, jnp.float32)
    v = jnp.asarray(rng.randn(b, s, d), jnp.float32)
    codes = jnp.asarray(rng.randint(0, 16, (b, s, 8)), jnp.int32)
    ts = pq_tile_scores(codes, codes, n_codewords=16, block_q=bq,
                        block_k=128)
    sel = select_tiles(ts, 3, block_ratio=bq // 128)
    scale = d ** -0.5

    def loss(impl):
        def f(q, k, v):
            return jnp.sum(jnp.sin(block_sparse_attention(
                q, k, v, sel, block_q=bq, block_k=128, scale=scale,
                bwd_impl=impl)))
        return f

    gk = jax.grad(loss('kernel'), argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss('ref'), argnums=(0, 1, 2))(q, k, v)
    for name, a, b_ in zip(('dq', 'dk', 'dv'), gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-3, err_msg=name)
