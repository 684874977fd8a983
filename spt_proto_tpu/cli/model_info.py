"""Model info CLI: trainable/frozen parameter accounting after upgrades.

Reference parity: script/2-model-info.py.

    python -m spt_proto_tpu.cli.model_info --config opt-125m --tuning sparse
"""
from __future__ import annotations

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    from spt_proto_tpu.cli.common import add_model_args, load_or_init
    add_model_args(p)
    p.add_argument('--tuning', choices=['dense', 'lora', 'sparse'],
                   default='dense')
    p.add_argument('--d_lora', type=int, default=16)
    args = p.parse_args(argv)

    import jax
    from spt_proto_tpu.tuning import surgery
    from spt_proto_tpu.tuning.partition import count_trainable

    cfg, params = load_or_init(args)
    rng = jax.random.PRNGKey(0)
    if args.tuning == 'lora':
        cfg, params = surgery.upgrade(cfg, params, 'lora', rng,
                                      d_lora=args.d_lora)
    elif args.tuning == 'sparse':
        cfg, params = surgery.full_upgrade(cfg, params, rng,
                                           d_lora=args.d_lora)
    train, frozen = count_trainable(params)
    print(json.dumps({
        'config': args.config if not args.ckpt else args.ckpt,
        'tuning': args.tuning,
        'trainable_params': train,
        'frozen_params': frozen,
        'total_params': train + frozen,
        'trainable_pct': round(100 * train / max(train + frozen, 1), 3),
    }))


if __name__ == '__main__':
    main()
