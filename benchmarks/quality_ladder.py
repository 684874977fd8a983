"""One-command real-data quality ladder (north star: sparse-tuned MMLU
accuracy >= 95% of dense at 1/8 attention density, BASELINE.md).

The synthetic stand-in gate lives in tests/test_quality_gate.py (dense ->
upgrade -> sparse-tune -> >=0.95x dense next-token accuracy, runs in CI).
THIS script is the real thing, runnable the day the environment provides
HF weights + the dataset tree (neither is present in the build image —
zero egress, no ~/Public/Datasets; checked again round 3):

  python benchmarks/quality_ladder.py --name facebook/opt-1.3b \
      --data_root ~/Public/Datasets/text [--steps 1000]

Pipeline (reference scripts 1-convert -> 4-sparse-tuning-0 -> 8-dump-spt
-> 3-mmlu-evaluate, SURVEY §2.7):
  1. convert the HF checkpoint (logits-parity asserted),
  2. MMLU 5-shot eval of the DENSE model -> dense_acc,
  3. 4-stage SPT upgrade + sparse fine-tune on MMLU-aux/Flan mixture,
  4. delta checkpoint (<50M params asserted),
  5. MMLU eval of the sparse-tuned model -> sparse_acc,
  6. PRINT the gate: sparse_acc >= 0.95 * dense_acc.

Every stage is an existing tested CLI; this file only sequences them and
fails fast with a precise message when a prerequisite is missing.
"""
from __future__ import annotations

import argparse
import json
import os
import sys


def _require(cond: bool, msg: str) -> None:
    if not cond:
        print(json.dumps({'quality_ladder': 'SKIPPED', 'missing': msg}))
        sys.exit(0)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('--name', default='facebook/opt-1.3b')
    ap.add_argument('--data_root', default=os.path.expanduser(
        '~/Public/Datasets/text'))
    ap.add_argument('--work', default='.data/quality_ladder')
    ap.add_argument('--steps', type=int, default=1000)
    ap.add_argument('--max_batches', type=int, default=64)
    ap.add_argument('--n_shots', type=int, default=5)
    args = ap.parse_args(argv)

    _require(os.path.isdir(os.path.join(args.data_root, 'mmlu')),
             f'{args.data_root}/mmlu (dataset tree not in this image)')
    try:
        from transformers import AutoConfig
        AutoConfig.from_pretrained(args.name)
    except Exception as e:
        _require(False, f'HF weights for {args.name}: {e}')

    from spt_proto_tpu.cli import convert, dump_delta, evaluate, tune
    os.makedirs(args.work, exist_ok=True)
    base = os.path.join(args.work, 'base')
    tuned = os.path.join(args.work, 'tuned')
    delta = os.path.join(args.work, 'delta')

    print('== 1. convert (parity-checked) ==', flush=True)
    convert.main(['--name', args.name, '--out', base])

    print('== 2. dense MMLU eval ==', flush=True)
    dense = evaluate.main([
        '--ckpt', base, '--data_root', args.data_root,
        '--n_shots', str(args.n_shots),
        '--max_batches', str(args.max_batches)])

    print('== 3. sparse upgrade + fine-tune ==', flush=True)
    tune.main(['--ckpt', base, '--data_root', args.data_root,
               '--tokenizer', args.name, '--out', tuned,
               '--steps', str(args.steps)])

    print('== 4. delta checkpoint ==', flush=True)
    dump_delta.main(['--base', base, '--tuned', tuned, '--out', delta])

    print('== 5. sparse MMLU eval (delta overlaid) ==', flush=True)
    sparse = evaluate.main([
        '--ckpt', base, '--spt_ckpt', delta,
        '--data_root', args.data_root, '--n_shots', str(args.n_shots),
        '--max_batches', str(args.max_batches)])

    d_acc = (dense or {}).get('accuracy')
    s_acc = (sparse or {}).get('accuracy')
    out = {'dense_mmlu_acc': d_acc, 'sparse_mmlu_acc': s_acc}
    if d_acc and s_acc:
        out['ratio'] = round(s_acc / d_acc, 4)
        out['north_star_95pct'] = bool(s_acc >= 0.95 * d_acc)
    print(json.dumps({'quality_ladder': out}))


if __name__ == '__main__':
    main()
