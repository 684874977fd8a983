"""spt_proto_tpu — a TPU-native framework for sparse parameter-efficient tuning
and inference of decoder-only LMs.

Capability parity target: ytgui/SPT-proto (`naive_gpt`), re-designed TPU-first:
  - PQ (product quantization) of per-head Q/K vectors predicts large attention
    scores; attention runs as a fused gather-SDDMM + masked softmax + SpMM
    Pallas kernel over a fixed top-k-per-row index set.
  - Routed block-FFN: a sigmoid router picks top-k contiguous FFN blocks per
    token; tokens are dispatched per block with capacity bucketing and the
    block GEMMs run dense on the MXU (INT8 weight-only dequant fuseable).
  - LoRA adapters over frozen base weights; staged dense->LoRA->routed->sparse
    upgrade pipeline; delta checkpoints.
  - SPMD scaling via jax.sharding Mesh + pjit (data/tensor/expert axes).

Subpackages:
  ops       -- pure-jnp reference ops + Pallas TPU kernels (custom_vjp)
  layers    -- flax.linen building blocks
  models    -- OPT / LLaMA model definitions + configs
  tuning    -- LoRA/sparse upgrade pipeline, train step, delta checkpoints
  parallel  -- mesh construction, sharding rules, multi-chip train/infer steps
  inference -- KV cache, decode loop, continuous batching engine
  data      -- text pipeline: sanitize/padding transforms, MMLU/wikitext/flan
  utils     -- checkpoint io, HF conversion, profiling
"""

__version__ = "0.1.0"
