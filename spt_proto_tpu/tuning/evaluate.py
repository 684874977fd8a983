"""Evaluation: perplexity + MMLU answer-position accuracy.

Reference parity: script/3-mmlu-evaluate.py:65-90 — ppl via next-token CE on
(inputs = row[1:-1], targets = row[2:]), and MMLU accuracy by reading the
answer token at the TruncPadding length prefix: answer = row[position],
prediction = argmax(logits[:, position - 2]).
"""
from __future__ import annotations

from typing import Any, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from spt_proto_tpu.config import ModelConfig
from spt_proto_tpu.models.decoder import DecoderLM
from spt_proto_tpu.tuning.trainer import lm_loss


def make_forward(cfg: ModelConfig):
    model = DecoderLM(cfg=cfg, deterministic=True, train_quantizer=False)

    @jax.jit
    def forward(params, inputs):
        return model.apply({'params': params}, inputs)['logits']

    return forward


def evaluate(cfg: ModelConfig, params: Any, batches: Iterable[dict], *,
             max_batches: Optional[int] = None) -> dict:
    """Run ppl + MMLU accuracy over batches from data/datamodule.py.

    Returns {'ppl', 'accuracy', 'n_examples'}; mirrors the reference's
    limit_test_batches=64 cap via max_batches.
    """
    forward = make_forward(cfg)
    total_ce, total_tok = 0.0, 0.0
    correct, count = 0, 0
    for i, batch in enumerate(batches):
        if max_batches is not None and i >= max_batches:
            break
        logits = forward(params, jnp.asarray(batch['inputs']))
        ce = lm_loss(logits, jnp.asarray(batch['targets']),
                     jnp.asarray(batch['mask']))
        ntok = float(np.sum(batch['mask']))
        total_ce += float(ce) * ntok
        total_tok += ntok
        # MMLU answer-position decode (ref 3-mmlu-evaluate.py:78-90)
        lengths = batch['lengths']
        lg = np.asarray(logits)
        tg = np.asarray(batch['targets'])
        for b in range(lg.shape[0]):
            pos = int(lengths[b]) - 2
            if 0 <= pos < lg.shape[1]:
                pred = int(np.argmax(lg[b, pos]))
                correct += int(pred == int(tg[b, pos]))
                count += 1
    ppl = float(np.exp(total_ce / max(total_tok, 1.0)))
    return {'ppl': ppl,
            'accuracy': correct / max(count, 1),
            'n_examples': count}
