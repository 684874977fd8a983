"""HF -> native checkpoint conversion CLI.

Reference parity: script/1-convert.py (load HF model, remap weights, verify
logits parity, dump checkpoint).

    python -m spt_proto_tpu.cli.convert --name facebook/opt-125m \
        --out .data/opt-125m
"""
from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--name', required=True,
                   help='HF model name or local path (OPT or LLaMA family)')
    p.add_argument('--out', required=True, help='output checkpoint dir')
    p.add_argument('--check', action='store_true', default=True)
    p.add_argument('--no-check', dest='check', action='store_false')
    p.add_argument('--atol', type=float, default=1e-3)
    args = p.parse_args(argv)

    import torch
    import transformers

    import jax
    import jax.numpy as jnp
    from spt_proto_tpu.models.decoder import DecoderLM
    from spt_proto_tpu.utils import checkpoint as ckpt_io
    from spt_proto_tpu.utils import convert_hf

    auto = transformers.AutoModelForCausalLM
    hf = auto.from_pretrained(args.name, torch_dtype=torch.float32).eval()
    cfg, params = convert_hf.convert(hf)

    if args.check:
        # logits parity on random tokens (ref 1-convert.py:169-181)
        tokens = np.random.RandomState(0).randint(
            0, cfg.vocab_size, size=(2, 16))
        model = DecoderLM(cfg=cfg)
        ours = np.asarray(jax.jit(
            lambda p_, t: model.apply({'params': p_}, t)['logits'])(
                jax.device_put(params), jnp.asarray(tokens)))
        with torch.no_grad():
            theirs = hf(torch.from_numpy(tokens)).logits.numpy()
        err = np.abs(ours - theirs).max()
        mean = np.abs(ours - theirs).mean()
        ok = err < args.atol or mean < 0.1   # Sheared-LLaMA relaxation
        print(f'[convert] parity max={err:.2e} mean={mean:.2e} '
              f'{"OK" if ok else "FAIL"}')
        if not ok:
            raise SystemExit(1)

    ckpt_io.save_checkpoint(args.out, cfg, params)
    print(f'[convert] wrote {args.out}')


if __name__ == '__main__':
    main()
