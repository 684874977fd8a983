"""SPT quality gate: the full dense -> sparse conversion pipeline must
preserve task performance after sparse fine-tuning.

Synthetic stand-in for the reference's MMLU-delta contract (north star:
>=95% of dense accuracy at the same sparsity): train a dense model on a
deterministic next-token task, run the 4-stage upgrade, sparse-fine-tune
only {LoRA, router, codebook}, and require the sparse model to recover to
near the dense cross-entropy.
"""
import jax
import jax.numpy as jnp
import numpy as np

from spt_proto_tpu.config import tiny_config
from spt_proto_tpu.tuning import surgery
from spt_proto_tpu.tuning.trainer import train_loop
from spt_proto_tpu.tuning.evaluate import make_forward
from spt_proto_tpu.tuning.trainer import lm_loss


def batches(cfg, n, batch=8, seq=32, seed=0):
    r = np.random.RandomState(seed)
    for _ in range(n):
        x = np.zeros((batch, seq), np.int32)
        x[:, 0] = r.randint(0, cfg.vocab_size, size=batch)
        for j in range(1, seq):
            x[:, j] = (x[:, j - 1] * 3 + 1) % cfg.vocab_size
        yield {'inputs': x[:, :-1], 'targets': x[:, 1:]}


def eval_ce(cfg, params, seed=99):
    fwd = make_forward(cfg)
    batch = next(batches(cfg, 1, batch=16, seed=seed))
    logits = fwd(params, jnp.asarray(batch['inputs']))
    return float(lm_loss(logits, jnp.asarray(batch['targets'])))


def test_sparse_conversion_recovers_dense_quality():
    cfg = tiny_config('opt', vocab_size=32)
    params = surgery.init_params(cfg, jax.random.PRNGKey(0))
    # 1) dense training to competence (full fine-tune)
    params, hist = train_loop(cfg, params, batches(cfg, 150), lr=3e-3,
                              max_steps=150, log_every=10,
                              freeze_base=False)
    dense_ce = eval_ce(cfg, params)

    # 2) upgrade to full SPT
    cfg_s, params_s = surgery.full_upgrade(cfg, params, jax.random.PRNGKey(1),
                                           d_lora=4, ffn_block_size=32)
    ce_after_upgrade = eval_ce(cfg_s, params_s)

    # 3) sparse fine-tune (LoRA/router/codebook only, PQ aux armed)
    params_s, _ = train_loop(cfg_s, params_s, batches(cfg_s, 120, seed=1),
                             lr=3e-3, max_steps=120, log_every=10)
    sparse_ce = eval_ce(cfg_s, params_s)

    print('dense', dense_ce, 'after-upgrade', ce_after_upgrade,
          'sparse-tuned', sparse_ce)
    # sparse fine-tuning must improve on the raw upgrade, and land near
    # the dense quality
    assert sparse_ce <= ce_after_upgrade * 1.05
    assert sparse_ce < dense_ce + 1.0, (dense_ce, ce_after_upgrade,
                                        sparse_ce)
