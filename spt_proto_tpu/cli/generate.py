"""Text generation / serving CLI (north-star addition, no reference
counterpart).

    python -m spt_proto_tpu.cli.generate --ckpt .data/opt-125m \
        --prompt "The meaning of life is" --max_new_tokens 32
"""
from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    from spt_proto_tpu.cli.common import add_model_args, apply_dtype, \
        load_or_init
    add_model_args(p)
    p.add_argument('--prompt', action='append', default=None,
                   help='prompt text (repeatable for a batch)')
    p.add_argument('--tokenizer', type=str, default='facebook/opt-1.3b')
    p.add_argument('--max_new_tokens', type=int, default=32)
    p.add_argument('--temperature', type=float, default=0.0)
    p.add_argument('--top_k', type=int, default=None,
                   help='top-k sampling cutoff (with --temperature > 0)')
    p.add_argument('--top_p', type=float, default=None,
                   help='nucleus sampling cutoff (with --temperature > 0)')
    p.add_argument('--seed', type=int, default=0,
                   help='sampling rng seed')
    p.add_argument('--quantized_kv', action='store_true',
                   help='int8 KV cache (per-token scales)')
    p.add_argument('--int8', action='store_true',
                   help='INT8 weight-only quantized serving')
    p.add_argument('--continuous', action='store_true',
                   help='serve via the continuous batching engine')
    p.add_argument('--prefix_cache', action='store_true',
                   help='continuous engine: reuse KV of shared TILE-'
                        'aligned prompt prefixes across requests')
    p.add_argument('--prefill_chunk', type=int, default=None,
                   help='chunked prefill: split prompts longer than this '
                        'across engine steps (multiple of 128; '
                        '--continuous only)')
    p.add_argument('--speculative', action='store_true',
                   help='speculative decoding (lossless: greedy output '
                        'matches plain greedy; sampled output matches the '
                        'warped target distribution). Drafts with '
                        '--draft_ckpt if given, else prompt-lookup '
                        '(n-gram) proposals')
    p.add_argument('--draft_ckpt', type=str, default=None,
                   help='draft model checkpoint dir for --speculative')
    from spt_proto_tpu.cli.common import add_mesh_args, mesh_from_args
    add_mesh_args(p)
    p.add_argument('--spec_k', type=int, default=4,
                   help='draft depth (proposed tokens per verify block)')
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from spt_proto_tpu.inference.engine import generate
    from spt_proto_tpu.inference.weights import InferenceWeights

    cfg, params = load_or_init(args)
    cfg = apply_dtype(cfg, args)
    if jax.default_backend() == 'tpu':
        cfg = cfg.replace(attn_impl='pallas')
    cfg.validate()
    iw = InferenceWeights.from_params(
        cfg, params, quant='int8' if args.int8 else None)

    from transformers import AutoTokenizer
    tok = AutoTokenizer.from_pretrained(args.tokenizer)
    prompts = args.prompt or ['Hello world']
    enc = [tok.encode(t) for t in prompts]

    if args.continuous:
        from spt_proto_tpu.inference.batching import ContinuousBatchingEngine
        eng = ContinuousBatchingEngine(
            iw, n_slots=min(8, len(enc)),
            max_len=max(len(e) for e in enc) + args.max_new_tokens,
            temperature=args.temperature, eos_id=tok.eos_token_id,
            prefill_chunk=args.prefill_chunk,
            quantized_kv=args.quantized_kv,
            speculative=args.spec_k if args.speculative else None,
            prefix_cache=args.prefix_cache,
            mesh=mesh_from_args(args))
        rids = [eng.submit(e, args.max_new_tokens) for e in enc]
        by_id = {c.request_id: c.tokens for c in eng.run_until_done()}
        outs = [by_id[r] for r in rids]
        for text, new in zip(prompts, outs):
            print(repr(text), '->', repr(tok.decode(new)))
    elif args.speculative:
        from spt_proto_tpu.inference.speculative import generate_speculative
        draft = None
        if args.draft_ckpt:
            from spt_proto_tpu.utils import checkpoint as ckpt_io
            dcfg, dparams = ckpt_io.load_checkpoint(args.draft_ckpt)
            dcfg = apply_dtype(dcfg, args)
            if jax.default_backend() == 'tpu':
                dcfg = dcfg.replace(attn_impl='pallas')
            draft = InferenceWeights.from_params(dcfg, dparams)
        width = max(len(e) for e in enc)
        batch = np.zeros((len(enc), width), np.int32)
        for i, e in enumerate(enc):
            batch[i, :len(e)] = e
        lengths = np.asarray([len(e) for e in enc], np.int32)
        out, stats = generate_speculative(
            iw, jnp.asarray(batch), args.max_new_tokens, draft=draft,
            k=args.spec_k, eos_id=tok.eos_token_id,
            lengths=jnp.asarray(lengths), quantized_kv=args.quantized_kv,
            temperature=args.temperature, top_k=args.top_k,
            top_p=args.top_p, rng=jax.random.PRNGKey(args.seed))
        for i, text in enumerate(prompts):
            new = np.asarray(out)[i, width:]
            print(repr(text), '->', repr(tok.decode(new)))
        print(f"[speculative] rounds={stats['rounds']} "
              f"acceptance={stats['acceptance']:.2f}")
    else:
        width = max(len(e) for e in enc)
        batch = np.zeros((len(enc), width), np.int32)
        for i, e in enumerate(enc):
            batch[i, :len(e)] = e     # right-pad; true lengths passed below
        lengths = np.asarray([len(e) for e in enc], np.int32)
        out = generate(iw, jnp.asarray(batch), args.max_new_tokens,
                       temperature=args.temperature,
                       top_k=args.top_k, top_p=args.top_p,
                       rng=jax.random.PRNGKey(args.seed),
                       eos_id=tok.eos_token_id,
                       mesh=mesh_from_args(args),
                       lengths=jnp.asarray(lengths),
                       quantized_kv=args.quantized_kv)
        for i, text in enumerate(prompts):
            new = np.asarray(out)[i, width:]
            print(repr(text), '->', repr(tok.decode(new)))


if __name__ == '__main__':
    main()
