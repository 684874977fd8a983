"""SPT quality gate: the full dense -> sparse conversion pipeline must
preserve task performance after sparse fine-tuning.

Synthetic stand-in for the reference's MMLU-delta contract (north star:
>=95% of dense accuracy at the same sparsity, BASELINE.md): train a dense
model on a deterministic next-token task, run the 4-stage upgrade,
sparse-fine-tune only {LoRA, router, codebook}, and gate on

  1. next-token accuracy >= 0.95 * dense accuracy  (the north-star bar,
     applied literally to this task), and
  2. CE recovery of >= 70% of the upgrade-induced quality gap  (so the
     gate fails if sparse fine-tuning stops improving on the raw
     upgrade, not just if the pipeline crashes).

Calibration (measured at these seeds/steps): dense acc 1.00 / CE 0.0013;
raw upgrade acc 0.74 / CE ~1.07; sparse-tuned acc 0.984 / CE 0.082 —
both gates hold with real margin and FAIL if tuning is disabled.
"""
import jax
import jax.numpy as jnp
import numpy as np

from spt_proto_tpu.config import tiny_config
from spt_proto_tpu.tuning import surgery
from spt_proto_tpu.tuning.evaluate import make_forward
from spt_proto_tpu.tuning.trainer import lm_loss, train_loop


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


def eval_acc(cfg, params, seed=99):
    """Next-token argmax accuracy on a held-out seed — the synthetic
    analogue of the reference's MMLU answer accuracy
    (script/3-mmlu-evaluate.py:78-90)."""
    fwd = make_forward(cfg)
    batch = next(batches(cfg, 1, batch=16, seed=seed))
    logits = fwd(params, jnp.asarray(batch['inputs']))
    pred = np.asarray(jnp.argmax(logits, -1))
    return float((pred == batch['targets']).mean())


def test_sparse_conversion_recovers_dense_quality():
    cfg = tiny_config('opt', vocab_size=32)
    params = surgery.init_params(cfg, jax.random.PRNGKey(0))
    # 1) dense training to competence (full fine-tune)
    params, hist = train_loop(cfg, params, batches(cfg, 150), lr=3e-3,
                              max_steps=150, log_every=10,
                              freeze_base=False)
    dense_ce = eval_ce(cfg, params)
    dense_acc = eval_acc(cfg, params)

    # 2) upgrade to full SPT
    cfg_s, params_s = surgery.full_upgrade(cfg, params,
                                           jax.random.PRNGKey(1),
                                           d_lora=8, ffn_block_size=32)
    ce_after_upgrade = eval_ce(cfg_s, params_s)
    acc_after_upgrade = eval_acc(cfg_s, params_s)

    # 3) sparse fine-tune (LoRA/router/codebook only, PQ aux armed)
    params_s, _ = train_loop(cfg_s, params_s, batches(cfg_s, 300, seed=1),
                             lr=3e-3, max_steps=300, log_every=50)
    sparse_ce = eval_ce(cfg_s, params_s)
    sparse_acc = eval_acc(cfg_s, params_s)

    print(f'dense ce={dense_ce:.4f} acc={dense_acc:.3f} | '
          f'upgrade ce={ce_after_upgrade:.4f} acc={acc_after_upgrade:.3f} '
          f'| sparse-tuned ce={sparse_ce:.4f} acc={sparse_acc:.3f}')
    # north-star bar: >=95% of dense accuracy after sparse tuning
    assert sparse_acc >= 0.95 * dense_acc, (sparse_acc, dense_acc)
    # and the tuning must RECOVER most of the upgrade-induced CE gap —
    # this fails if fine-tuning silently stops improving on the upgrade
    gap = ce_after_upgrade - dense_ce
    assert gap > 0.1, 'upgrade should cost quality before tuning ' \
        f'(gap={gap}); if not, this gate is no longer testing recovery'
    assert sparse_ce <= dense_ce + 0.3 * gap, \
        (dense_ce, ce_after_upgrade, sparse_ce)
