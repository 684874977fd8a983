"""Upgrade-pipeline tests mirroring reference test/layer/test_adapter.py:
output preservation at upgrade time, trainable-param accounting, delta
checkpoints."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spt_proto_tpu.config import tiny_config
from spt_proto_tpu.models.decoder import DecoderLM
from spt_proto_tpu.tuning import partition, surgery
from spt_proto_tpu.utils import checkpoint as ckpt
from spt_proto_tpu.utils.tree import flatten


def make_base(arch='opt'):
    cfg = tiny_config(arch)
    tokens = jax.random.randint(jax.random.PRNGKey(0), (2, 16), 0,
                                cfg.vocab_size)
    params = surgery.init_params(cfg, jax.random.PRNGKey(1))
    return cfg, params, tokens


def logits(cfg, params, tokens, **kw):
    model = DecoderLM(cfg=cfg, **kw)
    return np.asarray(model.apply({'params': params}, tokens)['logits'])


@pytest.mark.parametrize('arch', ['opt', 'llama'])
def test_lora_upgrade_preserves_output(arch):
    """LoRA right factors are zero-init => identical logits
    (ref test/layer/test_lora.py:26-30)."""
    cfg, params, tokens = make_base(arch)
    base_out = logits(cfg, params, tokens)
    cfg2, params2 = surgery.upgrade(cfg, params, 'lora',
                                    jax.random.PRNGKey(2), d_lora=4)
    np.testing.assert_allclose(logits(cfg2, params2, tokens), base_out,
                               atol=1e-5)


def test_full_pipeline_runs_and_counts(capsys):
    cfg, params, tokens = make_base('opt')
    cfg4, params4 = surgery.full_upgrade(cfg, params, jax.random.PRNGKey(3),
                                         d_lora=4, ffn_block_size=32)
    assert cfg4.attention == 'sparse_v2'
    assert cfg4.ffn == 'routed'
    out = logits(cfg4, params4, tokens)
    assert np.isfinite(out).all()
    train, frozen = partition.count_trainable(params4)
    assert 0 < train < frozen
    # every trainable path is lora/router/codebook
    for p in flatten(partition.trainable_mask(params4)):
        if partition.is_trainable_path(p):
            assert any(m in p for m in partition.TRAINABLE_MARKERS)


def test_mha_v2_is_param_free_flip():
    cfg, params, _ = make_base('opt')
    cfg1, params1 = surgery.upgrade(cfg, params, 'mha_v1',
                                    jax.random.PRNGKey(4))
    cfg2, params2 = surgery.upgrade(cfg1, params1, 'mha_v2',
                                    jax.random.PRNGKey(5))
    assert set(flatten(params1)) == set(flatten(params2))
    a, b = flatten(params1), flatten(params2)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


def test_base_weights_bit_exact_after_upgrade():
    cfg, params, _ = make_base('opt')
    cfg2, params2 = surgery.full_upgrade(cfg, params, jax.random.PRNGKey(6),
                                         d_lora=4, ffn_block_size=32)
    old = flatten(params)
    new = flatten(params2)
    for k, v in old.items():
        np.testing.assert_array_equal(np.asarray(v), np.asarray(new[k]))


def test_checkpoint_roundtrip(tmp_path):
    cfg, params, tokens = make_base('opt')
    ckpt.save_checkpoint(str(tmp_path / 'c'), cfg, params)
    cfg2, params2 = ckpt.load_checkpoint(str(tmp_path / 'c'))
    assert cfg2 == cfg
    np.testing.assert_allclose(logits(cfg, params, tokens),
                               logits(cfg2, params2, tokens), atol=0)


def test_delta_checkpoint_roundtrip(tmp_path):
    """Delta = changed + new tensors only; overlay restores tuned model
    (ref script/8-dump-spt.py + 3-mmlu-evaluate.py:52-60)."""
    cfg, params, tokens = make_base('opt')
    cfg2, params2 = surgery.upgrade(cfg, params, 'lora',
                                    jax.random.PRNGKey(7), d_lora=4)
    # pretend training: perturb only lora_right leaves
    tuned = jax.tree.map(lambda x: x, params2)
    flat = flatten(tuned)
    for k in flat:
        if 'lora_right' in k:
            flat[k] = flat[k] + 0.1
    from spt_proto_tpu.utils.tree import unflatten
    tuned = unflatten(flat)

    # delta vs the ORIGINAL base tree => every LoRA leaf (absent from base)
    # is included, matching 8-dump-spt.py's base-vs-tuned comparison
    n = ckpt.save_delta_checkpoint(str(tmp_path / 'd'), cfg2, params, tuned)
    assert n > 0
    # fresh upgrade from base (different rng => same zero-init lora struct)
    _, params3 = surgery.upgrade(cfg, params, 'lora', jax.random.PRNGKey(8),
                                 d_lora=4)
    cfg_l, restored = ckpt.load_delta_checkpoint(str(tmp_path / 'd'), params3)
    np.testing.assert_allclose(logits(cfg_l, restored, tokens),
                               logits(cfg2, tuned, tokens), atol=1e-6)
