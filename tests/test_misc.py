"""Odds and ends: post-norm blocks, dropout training, wikitext flow,
metrics logger, remat."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from spt_proto_tpu.config import tiny_config
from spt_proto_tpu.models.decoder import DecoderLM
from spt_proto_tpu.tuning import surgery


def test_post_norm_block():
    """Reference supports post-norm (basic/transformer.py:88-96); unused by
    OPT/LLaMA but kept for completeness."""
    from spt_proto_tpu.layers.transformer import TransformerBlock
    cfg = tiny_config('opt')
    block = TransformerBlock(cfg=cfg, pre_norm=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, cfg.d_model))
    variables = jax.jit(block.init)(jax.random.PRNGKey(1), x)
    y, aux = block.apply(variables, x)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


def test_dropout_training_path():
    cfg = tiny_config('opt', vocab_size=64, p_dropout=0.1)
    params = surgery.init_params(cfg, jax.random.PRNGKey(0))
    from spt_proto_tpu.tuning.trainer import (TrainState, make_optimizer,
                                              make_train_step)
    tx = make_optimizer(params, freeze_base=False)
    step = jax.jit(make_train_step(
        cfg, tx, train_quantizer=False,
        dropout_rng=jax.random.PRNGKey(42)))
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    r = np.random.RandomState(0)
    batch = {'inputs': r.randint(0, 64, (2, 16)).astype(np.int32),
             'targets': r.randint(0, 64, (2, 16)).astype(np.int32)}
    s1, m1 = step(state, batch)
    s2, m2 = step(s1, batch)
    assert np.isfinite(float(m1['loss'])) and np.isfinite(float(m2['loss']))
    # different dropout masks per step -> different losses on same batch
    assert float(m1['loss']) != float(m2['loss'])


def test_remat_matches_no_remat():
    cfg = tiny_config('opt', vocab_size=64)
    params = surgery.init_params(cfg, jax.random.PRNGKey(0))
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, 64)

    def loss(cfg, params):
        out = DecoderLM(cfg=cfg).apply({'params': params}, tokens)
        return jnp.sum(jnp.square(out['logits']))

    g1 = jax.grad(lambda p: loss(cfg, p))(params)
    g2 = jax.grad(lambda p: loss(cfg.replace(remat=True), p))(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    # 'dots' policy (save matmul outputs, recompute elementwise only)
    # must be gradient-identical too
    g3 = jax.grad(lambda p: loss(
        cfg.replace(remat=True, remat_policy='dots'), p))(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g3)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_wikitext_flow(tmp_path):
    folder = tmp_path / 'wikitext-103'
    folder.mkdir()
    lines = ['= Heading ='] + [
        f'A reasonably long wikitext line number {i} with enough characters.'
        for i in range(20)]
    (folder / 'wiki.valid.tokens').write_text('\n'.join(lines))
    from spt_proto_tpu.data.datamodule import wikitext_batches
    tok = lambda s: [min(ord(c), 255) for c in s]
    batches = list(wikitext_batches(str(tmp_path), tok, split='valid',
                                    seq_length=32, batch_size=4))
    assert batches
    assert batches[0]['inputs'].shape == (4, 31)


def test_metrics_logger(tmp_path):
    from spt_proto_tpu.utils.metrics import MetricsLogger
    path = str(tmp_path / 'm.jsonl')
    with MetricsLogger(path) as log:
        log.log(0, {'loss': jnp.asarray(1.5)}, phase='train')
        log.log(1, {'loss': 1.2})
    recs = [json.loads(l) for l in open(path)]
    assert recs[0]['loss'] == 1.5
    assert recs[0]['phase'] == 'train'
    assert recs[1]['step'] == 1
