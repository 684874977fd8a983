"""SVD rank analysis CLI: singular-value mass of FFN weights and hidden
activations — the low-rank evidence that justifies the LoRA design.

Reference parity: script/9-svd-rank.py (prints the rank needed to capture
50–95% of singular-value mass).

    python -m spt_proto_tpu.cli.svd_rank --ckpt .data/opt-125m
"""
from __future__ import annotations

import argparse
import json

MASS_LEVELS = (0.5, 0.6, 0.7, 0.8, 0.9, 0.95)


def rank_for_mass(s, level):
    import numpy as np
    c = np.cumsum(s) / np.sum(s)
    return int(np.searchsorted(c, level) + 1)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    from spt_proto_tpu.cli.common import add_model_args, load_or_init
    add_model_args(p)
    p.add_argument('--layers', type=int, default=2,
                   help='number of layers to analyze')
    p.add_argument('--activations', action='store_true',
                   help='also analyze hidden activations on random tokens')
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from spt_proto_tpu.models.decoder import DecoderLM

    cfg, params = load_or_init(args)
    results = {}
    ffn_names = ('gate', 'side', 'down') if cfg.ffn_gated else ('fc1', 'fc2')
    for name in ffn_names:
        w = np.asarray(params['blocks']['ffn'][name]['kernel'])
        for layer in range(min(args.layers, w.shape[0])):
            s = np.linalg.svd(w[layer], compute_uv=False)
            results[f'ffn.{name}.layer{layer}'] = {
                f'rank@{int(level*100)}%': rank_for_mass(s, level)
                for level in MASS_LEVELS}

    if args.activations:
        model = DecoderLM(cfg=cfg)
        tokens = jax.random.randint(jax.random.PRNGKey(0), (2, 64), 0,
                                    cfg.vocab_size)
        h = model.apply({'params': params}, tokens)['logits']
        acts = np.asarray(h, np.float32).reshape(-1, h.shape[-1])
        s = np.linalg.svd(acts[:, :512], compute_uv=False)
        results['activations.logits'] = {
            f'rank@{int(level*100)}%': rank_for_mass(s, level)
            for level in MASS_LEVELS}

    print(json.dumps(results, indent=1))


if __name__ == '__main__':
    main()
