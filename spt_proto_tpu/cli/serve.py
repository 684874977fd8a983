"""HTTP serving CLI: continuous batching engine behind /v1/completions.

    python -m spt_proto_tpu.cli.serve --ckpt .data/opt-125m \
        --port 8000 --n_slots 8 --max_len 1024 --quantized_kv \
        --prefix_cache

North-star addition (no reference counterpart — the reference has no
serving path, SURVEY §0). The server is stdlib http.server; see
spt_proto_tpu/inference/server.py for the threading contract.
"""
from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    from spt_proto_tpu.cli.common import add_model_args, apply_dtype, \
        load_or_init
    add_model_args(p)
    p.add_argument('--host', type=str, default='127.0.0.1')
    p.add_argument('--port', type=int, default=8000)
    p.add_argument('--tokenizer', type=str, default=None,
                   help='HF tokenizer name; omit to serve token ids only')
    p.add_argument('--n_slots', type=int, default=8)
    p.add_argument('--max_len', type=int, default=1024)
    p.add_argument('--temperature', type=float, default=0.0)
    p.add_argument('--quantized_kv', action='store_true')
    p.add_argument('--int8', action='store_true',
                   help='INT8 weight-only quantized serving')
    p.add_argument('--prefix_cache', action='store_true')
    p.add_argument('--prefill_chunk', type=int, default=None)
    p.add_argument('--speculative', type=int, default=None,
                   help='k: n-gram speculative decoding per engine step')
    from spt_proto_tpu.cli.common import add_mesh_args, mesh_from_args
    add_mesh_args(p)
    args = p.parse_args(argv)

    import jax

    from spt_proto_tpu.inference.batching import ContinuousBatchingEngine
    from spt_proto_tpu.inference.server import make_server
    from spt_proto_tpu.inference.weights import InferenceWeights

    cfg, params = load_or_init(args)
    cfg = apply_dtype(cfg, args)
    if jax.default_backend() == 'tpu':
        cfg = cfg.replace(attn_impl='pallas')
    cfg.validate()
    iw = InferenceWeights.from_params(
        cfg, params, quant='int8' if args.int8 else None)

    tok = None
    eos_id = None
    if args.tokenizer:
        from transformers import AutoTokenizer
        tok = AutoTokenizer.from_pretrained(args.tokenizer)
        eos_id = tok.eos_token_id
    eng = ContinuousBatchingEngine(
        iw, n_slots=args.n_slots, max_len=args.max_len,
        temperature=args.temperature, eos_id=eos_id,
        prefill_chunk=args.prefill_chunk, quantized_kv=args.quantized_kv,
        speculative=args.speculative, prefix_cache=args.prefix_cache,
        mesh=mesh_from_args(args))
    server, frontend = make_server(eng, args.host, args.port, tokenizer=tok)
    print(f'serving on http://{server.server_address[0]}:'
          f'{server.server_address[1]} (POST /v1/completions)')
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
        frontend.shutdown()


if __name__ == '__main__':
    main()
