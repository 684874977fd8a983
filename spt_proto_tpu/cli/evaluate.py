"""MMLU evaluation CLI.

Reference parity: script/3-mmlu-evaluate.py (load base ckpt, optionally
4-stage upgrade + overlay a delta checkpoint, run ppl + MMLU
answer-position accuracy on limited batches).

    python -m spt_proto_tpu.cli.evaluate --ckpt .data/opt-125m \
        --data_root ~/Public/Datasets/text --n_shots 5 --max_batches 64
"""
from __future__ import annotations

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    from spt_proto_tpu.cli.common import add_model_args, apply_dtype, \
        load_or_init
    add_model_args(p)
    p.add_argument('--spt_ckpt', type=str, default=None,
                   help='delta checkpoint dir to overlay (ref 8-dump-spt)')
    p.add_argument('--data_root', type=str, required=True)
    p.add_argument('--tokenizer', type=str, default='facebook/opt-1.3b')
    p.add_argument('--n_shots', type=int, default=5)
    p.add_argument('--seq_length', type=int, default=513)
    p.add_argument('--batch_size', type=int, default=8)
    p.add_argument('--max_batches', type=int, default=64)
    args = p.parse_args(argv)

    import jax
    from spt_proto_tpu.data.datamodule import default_tokenizer, mmlu_batches
    from spt_proto_tpu.tuning import surgery
    from spt_proto_tpu.tuning.evaluate import evaluate
    from spt_proto_tpu.utils import checkpoint as ckpt_io

    cfg, params = load_or_init(args)
    cfg = apply_dtype(cfg, args)
    if args.spt_ckpt:
        # upgrade base to SPT structure, then overlay the tuned delta
        # (ref 3-mmlu-evaluate.py:26-63)
        cfg, params = surgery.full_upgrade(cfg, params,
                                           jax.random.PRNGKey(0))
        cfg_l, params = ckpt_io.load_delta_checkpoint(args.spt_ckpt, params)
        cfg = cfg_l.replace(dtype=cfg.dtype)
    if jax.default_backend() == 'tpu':
        cfg = cfg.replace(attn_impl='pallas')
    cfg.validate()

    tok = default_tokenizer(args.tokenizer)
    batches = mmlu_batches(args.data_root, tok, mode='test',
                           n_shots=args.n_shots,
                           seq_length=args.seq_length,
                           batch_size=args.batch_size)
    metrics = evaluate(cfg, params, batches, max_batches=args.max_batches)
    print(json.dumps(metrics))
    return metrics


if __name__ == '__main__':
    main()
