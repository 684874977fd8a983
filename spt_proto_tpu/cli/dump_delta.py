"""Delta-checkpoint CLI: keep only tensors that changed vs the base.

Reference parity: script/8-dump-spt.py (allclose atol 1e-3 filter,
assert < 50M params).

    python -m spt_proto_tpu.cli.dump_delta --base .data/opt-125m \
        --tuned .data/tuned --out .data/spt-delta
"""
from __future__ import annotations

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--base', required=True)
    p.add_argument('--tuned', required=True)
    p.add_argument('--out', required=True)
    p.add_argument('--atol', type=float, default=1e-3)
    args = p.parse_args(argv)

    from spt_proto_tpu.utils import checkpoint as ckpt_io

    _, base_params = ckpt_io.load_checkpoint(args.base)
    cfg, tuned_params = ckpt_io.load_checkpoint(args.tuned)
    n = ckpt_io.save_delta_checkpoint(args.out, cfg, base_params,
                                      tuned_params, atol=args.atol)
    print(json.dumps({'out': args.out, 'delta_params': int(n)}))


if __name__ == '__main__':
    main()
