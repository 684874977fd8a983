"""int8-frozen-base (QLoRA-shape) training: the frozen base kernels live
int8 in a 'frozen8' collection and stream through int8_frozen_matmul in
both passes (custom VJP). Gradient parity: a step on the int8 base must
match a bf16/f32-base step whose base weights are the DEQUANTIZED int8
values — same math, so trainable-leaf grads agree to matmul precision."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spt_proto_tpu.config import tiny_config
from spt_proto_tpu.tuning import surgery
from spt_proto_tpu.tuning.partition import trainable_mask
from spt_proto_tpu.tuning.trainer import (TrainState, make_optimizer,
                                          make_train_step)
from spt_proto_tpu.utils.tree import flatten, unflatten


def _spt_model(arch='opt'):
    cfg = tiny_config(arch, d_model=64, n_heads=4, d_feedforward=128,
                      vocab_size=128)
    params = surgery.init_params(cfg, jax.random.PRNGKey(0))
    cfg, params = surgery.full_upgrade(cfg, params, jax.random.PRNGKey(1),
                                       d_lora=4, ffn_block_size=32)
    return cfg, params


def _dequant_tree(frozen8):
    out = {}
    for path, q8 in flatten(frozen8, stop=lambda d: 'q' in d
                            and 'scale' in d).items():
        n = q8['scale'].shape[-1]
        out[path] = (q8['q'][..., :n].astype(jnp.float32)
                     * q8['scale'])
    return unflatten(out)


def _flat_q8(frozen8):
    """{path: {'q','scale'}} with the dict leaves kept intact."""
    flat = {}

    def walk(d, prefix=''):
        for k, v in d.items():
            p = f'{prefix}/{k}' if prefix else k
            if isinstance(v, dict) and 'q' in v and 'scale' in v:
                flat[p] = v
            elif isinstance(v, dict):
                walk(v, p)
    walk(frozen8)
    return flat


@pytest.mark.parametrize('arch', ['opt', 'llama'])
def test_int8_base_grad_parity(arch):
    cfg, params = _spt_model(arch)
    cfg8, p_small, frozen8 = surgery.split_int8_base(cfg, params)
    assert cfg8.int8_base

    # reference: same architecture with the base kernels REPLACED by the
    # dequantized int8 values (identical math up to matmul precision)
    deq = _flat_q8(frozen8)
    ref_flat = flatten(params)
    for path, q8 in deq.items():
        n = q8['scale'].shape[-1]
        ref_flat[path] = (q8['q'][..., :n].astype(jnp.float32)
                          * q8['scale']).astype(ref_flat[path].dtype)
    ref_params = unflatten(ref_flat)

    batch = {
        'inputs': np.random.RandomState(0).randint(
            0, cfg.vocab_size, (2, 16)).astype(np.int32),
        'targets': np.random.RandomState(1).randint(
            0, cfg.vocab_size, (2, 16)).astype(np.int32)}

    from spt_proto_tpu.models.decoder import DecoderLM
    from spt_proto_tpu.tuning.trainer import lm_loss

    def loss_and_grads(cfg_run, p_run, frozen8=None):
        model = DecoderLM(cfg=cfg_run, deterministic=True,
                          train_quantizer=True)
        mask = flatten(trainable_mask(p_run))
        flat = flatten(p_run)
        train = {k: v for k, v in flat.items() if mask[k]}
        frozen = {k: v for k, v in flat.items() if not mask[k]}

        def fwd(t):
            variables = {'params': unflatten({**t, **frozen})}
            if frozen8 is not None:
                variables['frozen8'] = frozen8
            out = model.apply(variables, jnp.asarray(batch['inputs']))
            return lm_loss(out['logits'],
                           jnp.asarray(batch['targets'])) \
                + 1e-2 * out['pq_loss']
        loss, grads = jax.jit(jax.value_and_grad(fwd))(train)
        return float(loss), grads

    l8, g8 = loss_and_grads(cfg8, p_small, frozen8)
    lr_, gr = loss_and_grads(cfg, ref_params)

    # the int8 kernel computes its dots on bf16-cast activations (the
    # int8_matmul contract) — losses agree to bf16-matmul precision and
    # gradients agree directionally per leaf
    assert abs(l8 - lr_) < 0.05 * max(1.0, abs(lr_)), (l8, lr_)
    checked = 0
    for path, ga in g8.items():
        gb = gr[path]
        a = np.asarray(ga, np.float64).ravel()
        b = np.asarray(gb, np.float64).ravel()
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if nb < 1e-8:
            assert na < 1e-6, path
            continue
        cos = float(a @ b / (max(na, 1e-12) * nb))
        assert cos > 0.95, (path, cos)
        assert abs(na - nb) / nb < 0.15, (path, na, nb)
        checked += 1
    assert checked >= 10, checked


def test_int8_base_loss_decreases():
    """A short int8-base tuning run actually learns (loss decreases)."""
    from spt_proto_tpu.tuning.trainer import train_loop
    cfg, params = _spt_model('opt')
    cfg8, p_small, frozen8 = surgery.split_int8_base(cfg, params)
    r = np.random.RandomState(0)

    def batches(n):
        for _ in range(n):
            x = np.zeros((4, 17), np.int32)
            x[:, 0] = r.randint(0, cfg.vocab_size, size=4)
            for j in range(1, 17):
                x[:, j] = (x[:, j - 1] * 5 + 3) % cfg.vocab_size
            yield {'inputs': x[:, :-1], 'targets': x[:, 1:]}

    _, hist = train_loop(cfg8, p_small, batches(120), lr=5e-3,
                         max_steps=120, log_every=20, frozen8=frozen8)
    first, last = hist[0][1]['loss'], hist[-1][1]['loss']
    assert last < first * 0.85, (first, last)


def test_split_int8_base_memory_shape():
    """The split moves every big kernel (and only those) out of params."""
    cfg, params = _spt_model('opt')
    cfg8, p_small, frozen8 = surgery.split_int8_base(cfg, params)
    moved = set(_flat_q8(frozen8))
    for p in moved:
        assert p.endswith('/kernel')
    small = set(flatten(p_small))
    assert not (moved & small)
    # attention + fc1/fc2 kernels moved; embeddings/lora/router stayed
    assert any('mha/q/kernel' in p for p in moved)
    assert any('ffn/fc1/kernel' in p for p in moved)
    assert any('lora_left' in p for p in small)
    assert any('embedding' in p for p in small)
    assert any('router' in p for p in small)
