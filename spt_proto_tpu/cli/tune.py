"""Sparse fine-tuning CLI.

Reference parity: script/4-sparse-tuning-0.py (base ckpt -> 4-stage
upgrade lora->ffn->mha_v1->mha_v2 -> AdamW lr 1e-4 wd 0.1 clip 1.0, CE +
1e-2 * PQ aux loss armed every step) and 4-sparse-tuning-1.py (ZeRO-3 ==
sharded params/optimizer via --mesh_model/--mesh_data; CPU activation ckpt
== --remat). Checkpoints are written every --save_every steps (ref:
Lightning ModelCheckpoint save_last).

    python -m spt_proto_tpu.cli.tune --ckpt .data/opt-125m \
        --data_root ~/Public/Datasets/text --steps 1000 --out .data/tuned
"""
from __future__ import annotations

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    from spt_proto_tpu.cli.common import add_model_args, apply_dtype, \
        load_or_init
    add_model_args(p)
    p.add_argument('--data_root', type=str, default=None,
                   help='dataset tree (mmlu + flan-mini); synthetic LM '
                        'batches if omitted')
    p.add_argument('--tokenizer', type=str, default='facebook/opt-1.3b')
    p.add_argument('--out', type=str, required=True)
    p.add_argument('--d_lora', type=int, default=16)
    p.add_argument('--steps', type=int, default=100)
    p.add_argument('--lr', type=float, default=1e-4)
    p.add_argument('--weight_decay', type=float, default=0.1)
    p.add_argument('--seq_length', type=int, default=513)
    p.add_argument('--batch_size', type=int, default=8)
    p.add_argument('--accumulate', type=int, default=1,
                   help='gradient-accumulation micro-batches per optimizer '
                        'step (ref accumulate_grad_batches, '
                        '4-sparse-tuning-0.py:186); --batch_size stays the '
                        'micro-batch size')
    p.add_argument('--save_every', type=int, default=500)
    p.add_argument('--resume', action='store_true',
                   help='resume from --out/checkpoint train state')
    p.add_argument('--remat', action='store_true')
    p.add_argument('--mesh_data', type=int, default=None)
    p.add_argument('--mesh_model', type=int, default=None)
    p.add_argument('--fsdp', action='store_true',
                   help='ZeRO-3-equivalent: shard params + optimizer '
                        "state over the 'data' axis "
                        '(ref 4-sparse-tuning-1.py DeepSpeed stage 3)')
    p.add_argument('--mesh_pipe', type=int, default=1,
                   help='pipeline stages (GPipe over the stacked-layer '
                        'axis; parallel/pipeline.py)')
    p.add_argument('--pp_micro', type=int, default=2,
                   help='microbatches per pipeline step')
    p.add_argument('--mesh_sp', type=int, default=1,
                   help='context-parallel shards: the sequence is sharded '
                        "over the 'sp' axis and dense attention runs as "
                        'ring attention (sets cfg.context_parallel; '
                        'dense/mha_v1 stages only, seq_length-2 must '
                        'divide by it)')
    p.add_argument('--ep', action='store_true',
                   help='expert-parallel routed FFN: tokens+blocks shard '
                        "over 'data', all_to_all dispatch "
                        '(ops/routed_ffn_ep.py)')
    p.add_argument('--int8_base', action='store_true',
                   help='QLoRA-shape: freeze the base kernels as int8 in '
                        'HBM (streamed through the fused-dequant matmul '
                        'in both passes) — fits LLaMA-7B SPT tuning on '
                        'one 16 GB chip (surgery.split_int8_base)')
    p.add_argument('--stages', type=str,
                   default='lora,ffn,mha_v1,mha_v2',
                   help='comma-separated upgrade stages to apply')
    args = p.parse_args(argv)

    import jax
    import numpy as np
    from spt_proto_tpu.tuning import surgery
    from spt_proto_tpu.tuning.trainer import train_loop
    from spt_proto_tpu.utils import checkpoint as ckpt_io

    cfg, params = load_or_init(args)
    cfg = apply_dtype(cfg, args)
    base_params = params
    rng = jax.random.PRNGKey(0)
    for i, stage in enumerate([s for s in args.stages.split(',') if s]):
        kw = {'d_lora': args.d_lora} if stage == 'lora' else {}
        cfg, params = surgery.upgrade(cfg, params, stage,
                                      jax.random.fold_in(rng, i), **kw)
    if args.remat:
        cfg = cfg.replace(remat=True)
    if jax.default_backend() == 'tpu':
        cfg = cfg.replace(attn_impl='pallas')
    frozen8 = None
    if args.int8_base:
        cfg, params, frozen8 = surgery.split_int8_base(cfg, params,
                                                       staged=True)
    cfg.validate()

    mesh = None
    if args.mesh_data or args.mesh_model or args.mesh_pipe > 1 \
            or args.mesh_sp > 1:
        from spt_proto_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(args.mesh_data, args.mesh_model,
                         n_sp=args.mesh_sp, n_pipe=args.mesh_pipe)
    if args.mesh_sp > 1:
        cfg = cfg.replace(context_parallel=True)
        cfg.validate()
    if args.ep:
        assert mesh is not None, '--ep requires --mesh_data/--mesh_model'
        cfg = cfg.replace(ffn_impl='ep')

    if args.data_root:
        from spt_proto_tpu.data.datamodule import (default_tokenizer,
                                                   mmlu_flan_mixture)
        tok = default_tokenizer(args.tokenizer)
        batches = mmlu_flan_mixture(args.data_root, tok,
                                    seq_length=args.seq_length,
                                    batch_size=args.batch_size)
    else:
        def synthetic():
            r = np.random.RandomState(0)
            while True:
                x = r.randint(0, cfg.vocab_size,
                              size=(args.batch_size, args.seq_length - 1),
                              ).astype(np.int32)
                yield {'inputs': x[:, :-1], 'targets': x[:, 1:]}
        batches = synthetic()

    if args.accumulate > 1:
        def accumulated(src, a):
            it = iter(src)
            while True:
                group = [next(it) for _ in range(a)]
                yield {k: np.concatenate([g[k] for g in group])
                       for k in group[0]}
        batches = accumulated(batches, args.accumulate)

    def log(i, m):
        print(json.dumps({'step': i, **{k: round(v, 5)
                                        for k, v in m.items()}}))

    params, history = train_loop(
        cfg, params, batches, lr=args.lr, weight_decay=args.weight_decay,
        max_steps=args.steps, log_every=10, log_fn=log, mesh=mesh,
        fsdp=args.fsdp, frozen8=frozen8,
        pp_micro=args.pp_micro if args.mesh_pipe > 1 else None,
        accumulate=args.accumulate,
        checkpoint_dir=args.out + '-trainstate',
        checkpoint_every=args.save_every, resume=args.resume)

    ckpt_io.save_checkpoint(args.out, cfg, jax.device_get(params))
    n = ckpt_io.save_delta_checkpoint(args.out + '-delta', cfg,
                                      base_params, jax.device_get(params))
    print(json.dumps({'saved': args.out, 'delta_params': int(n)}))


if __name__ == '__main__':
    main()
