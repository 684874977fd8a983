"""Model / layer configuration.

One frozen dataclass drives the whole stack; the reference's staged module
surgery (naive_gpt/utils/adapter.py: 'lora' -> 'ffn' -> 'mha_v1' -> 'mha_v2')
becomes config deltas + param-tree transforms (see tuning/surgery.py), which
is the idiomatic JAX equivalent of rewriting an nn.Module tree in place.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax.numpy as jnp

# Attention kinds (ref naive_gpt/layers/sparse/attention.py)
ATTN_DENSE = 'dense'          # VanillaAttention / RotaryAttention
ATTN_SPARSE_V1 = 'sparse_v1'  # dense attention + PQ codebook warm-up aux loss
ATTN_SPARSE_V2 = 'sparse_v2'  # PQ top-k sparse attention

# FFN kinds (ref naive_gpt/layers/sparse/feedforward.py)
FFN_DENSE = 'dense'
FFN_ROUTED = 'routed'


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture + upgrade-stage configuration for OPT/LLaMA models."""
    arch: str                       # 'opt' | 'llama'
    d_model: int
    n_heads: int
    n_layers: int
    max_length: int
    vocab_size: int
    d_feedforward: int
    p_dropout: float = 0.0
    n_kv_heads: Optional[int] = None  # grouped-query attention; None = MHA
    rope_base: float = 10000.0      # RoPE theta (HF rope_theta; Llama-3: 5e5)

    # --- tuning / sparsity stages -----------------------------------------
    d_lora: Optional[int] = None    # LoRA rank; None = no adapters
    attention: str = ATTN_DENSE
    ffn: str = FFN_DENSE
    # PQ configuration (ref utils/adapter.py:97-98: d_codeword=8,
    # n_codewords=16, n_subspaces=d_head//8)
    d_codeword: int = 8
    n_codewords: int = 16
    sparse_coeff: int = 8           # keep S/8 scores per row
    score_clamp: float = 10.0       # logit clamp (ref sparse/attention.py:125)
    pq_metric: str = 'l1'           # 'l1' = reference cdist; 'l2' = MXU-fast
    sparse_decode: str = 'tiles'    # decode selection: 'tiles' | 'rows'
    # kv heads sharing one decode tile table (1 = per-head selection;
    # kv_heads = fully shared). >1 pools PQ tile scores across the group
    # and lets the decode kernel fetch each tile with one grouped DMA —
    # the per-tile DMA issue count is the measured decode floor
    # (docs/PERF.md round 2)
    sparse_select_heads: int = 1
    # decode attention kernel: one grid program loops all batch slots
    # with double-buffered tile staging (amortizes the measured
    # ~10us/slot/layer kernel-entry floor and overlaps slot b+1's DMAs
    # with slot b's math; docs/PERF.md). Auto-falls-back to the per-slot
    # grid kernel when the doubled staging exceeds VMEM or the cache is
    # int8-quantized (no ms twin for the quantized kernel yet).
    decode_multislot: bool = True
    # unroll factor for the decode step's layer scan: >1 lets XLA
    # software-pipeline across layer boundaries (prefetch layer i+1's
    # weights during layer i's math) at the cost of code size / compile
    # time. 0 = AUTO: full unroll for sparse_v2 serving at
    # d_model <= 1024 (the dispatch-bound regime, measured +7% at
    # 125M), rolled scan otherwise (unrolling measured -42% at 1.3B;
    # dense decode's unrolled program compiles pathologically slowly
    # for a within-drift gain). docs/PERF.md round-4.
    decode_scan_unroll: int = 0
    # fuse the decode tail (norm2 -> fc1 -> act -> fc2 -> residual) into
    # one streaming Pallas kernel at skinny m (ops/pallas/ffn_tail.py):
    # one dispatch replaces 4-5 and the fc1/fc2 weight tiles stream with
    # guaranteed DMA/compute overlap. Dense-FFN serving only (routed
    # paths keep their existing forms). None = AUTO: fuse only for
    # int8-quantized weights (the fused kernel is the only form that
    # streams the halved bytes); bf16 keeps XLA's fusions, which beat
    # the kernel under the auto layer-scan unroll at 125M (-14%) and
    # at 1.3B (-22%) — docs/PERF.md round-4. True forces it on.
    decode_fused_ffn: Optional[bool] = None
    # fuse the greedy lm_head matmul + argmax into one streaming kernel
    # (ops/pallas/lm_head.py): the [B, V] logits are never materialized.
    # Separate from decode_fused_ffn because their regimes differ — the
    # head fusion is a per-STEP win, the FFN tail is per-LAYER and
    # competes with decode_scan_unroll's cross-layer software pipelining
    # (measured round 4: tail+full-unroll is slower than either alone).
    decode_fused_head: bool = True
    # fuse the decode FRONT (norm1 + QKV proj + PQ encode + tile
    # selection) into one kernel (ops/pallas/decode_front.py) in the
    # flagship OPT sparse serving envelope (MHA, per-head selection,
    # l2 metric, code width <= 8, QKV weights + code slab fit VMEM)
    decode_fused_front: bool = True
    # route dense-FFN TP matmuls through the manually-overlapped ring
    # collective-matmul forms (parallel/overlap.py) instead of pjit's
    # inserted collectives. Takes effect when a parallel.overlap.tp_mesh
    # context is active at trace time (train + serving). Exact (parity-
    # tested on the virtual mesh); the ring overlaps ICI transfer with
    # MXU work on multi-chip hardware — single-chip it is a no-op ring
    # of length 1.
    tp_overlap: bool = False
    # routed FFN (ref adapter.py:163: block_size = d_ff//4 => 4 blocks)
    ffn_block_size: Optional[int] = None
    ffn_top_k: Optional[int] = None  # default: n_blocks//2

    # --- numerics / implementation selection ------------------------------
    dtype: Any = jnp.float32         # activation/compute dtype
    param_dtype: Any = jnp.float32
    attn_impl: str = 'ref'           # 'ref' (jnp) | 'pallas'
    # 'masked' (exact oracle) | 'gather' (capacity) | 'gmm' (grouped
    # matmul) | 'ep' (expert-parallel all_to_all dispatch — requires an
    # active ops.routed_ffn_ep.ep_mesh(...) context at trace time)
    ffn_impl: str = 'masked'
    remat: bool = False              # rematerialize blocks (training memory)
    # QLoRA-shape training: the FROZEN base kernels (attention q/k/v/o and
    # the FFN matrices) live as int8 + per-output-channel scales in a
    # separate 'frozen8' flax collection, streamed through
    # ops/pallas/int8_matmul.int8_frozen_matmul in BOTH passes (custom
    # VJP: dx reuses the same int8 tiles via the transposed kernel). This
    # is what fits LLaMA-7B SPT fine-tuning on one 16 GB chip (bf16 base
    # alone is 13.5 GB). Build the split trees with
    # tuning/surgery.py::split_int8_base; trainables (LoRA/router/
    # codebook) stay fp in 'params'.
    int8_base: bool = False
    # remat policy: 'full' recomputes everything in the backward pass
    # (minimum memory); 'dots' saves every matmul output (XLA's
    # checkpoint_dots policy) — the backward then recomputes only cheap
    # elementwise work, trading ~2x activation memory for skipping the
    # recompute of the attention kernel / PQ encode / FFN matmuls. The
    # reference's DeepSpeed config checkpoints whole blocks to CPU
    # (script/4-sparse-tuning-1.py:174); on TPU recompute-vs-save is the
    # equivalent lever.
    remat_policy: str = 'full'       # 'full' | 'dots'
    # --- context (sequence) parallelism ------------------------------------
    # When True the model runs INSIDE a shard_map whose `cp_axis` shards the
    # sequence: dense attention becomes ring attention (ops/ring_attention),
    # RoPE/positions are offset by the shard index. Use via
    # trainer.make_cp_train_step. Dense/v1 attention only (the PQ-sparse
    # path is itself the short-context memory lever; composing both is
    # future work).
    context_parallel: bool = False
    cp_axis: str = 'sp'

    # ----------------------------------------------------------------------
    @property
    def d_head(self) -> int:
        return self.d_model // self.n_heads

    @property
    def kv_heads(self) -> int:
        return self.n_kv_heads or self.n_heads

    @property
    def kv_groups(self) -> int:
        assert self.n_heads % self.kv_heads == 0
        return self.n_heads // self.kv_heads

    @property
    def n_subspaces(self) -> int:
        return self.d_head // self.d_codeword

    @property
    def attn_bias(self) -> bool:
        return self.arch == 'opt'

    @property
    def ffn_gated(self) -> bool:
        return self.arch == 'llama'

    @property
    def n_ffn_blocks(self) -> int:
        assert self.ffn_block_size is not None
        return self.d_feedforward // self.ffn_block_size

    @property
    def ffn_active_blocks(self) -> int:
        if self.ffn_top_k is not None:
            return self.ffn_top_k
        return max(1, self.n_ffn_blocks // 2)

    def replace(self, **kw) -> 'ModelConfig':
        return dataclasses.replace(self, **kw)

    def validate(self) -> None:
        assert self.arch in ('opt', 'llama')
        assert self.d_model % self.n_heads == 0
        if self.attention != ATTN_DENSE:
            assert self.d_head % self.d_codeword == 0, \
                f'd_head {self.d_head} must divide into d_codeword ' \
                f'{self.d_codeword} subspaces'
        if self.ffn == FFN_ROUTED:
            assert self.ffn_block_size is not None
            assert self.d_feedforward % self.ffn_block_size == 0
        if self.attention == ATTN_SPARSE_V2:
            assert self.kv_heads % self.sparse_select_heads == 0, \
                (self.kv_heads, self.sparse_select_heads)
        # context parallelism composes with every attention mode:
        # dense/v1 ride ring attention, sparse_v2 rides
        # ring_sparse_attention_local (global PQ selection from
        # all-gathered codes; ops/ring_attention.py)


# Canonical model menu (ref script/1-convert.py:202-206)
def opt_config(name: str = '125m', **kw) -> ModelConfig:
    menu = {
        '125m': dict(d_model=768, n_heads=12, n_layers=12, d_feedforward=3072),
        '350m': dict(d_model=1024, n_heads=16, n_layers=24, d_feedforward=4096),
        '1.3b': dict(d_model=2048, n_heads=32, n_layers=24, d_feedforward=8192),
        '2.7b': dict(d_model=2560, n_heads=32, n_layers=32, d_feedforward=10240),
    }
    base = dict(arch='opt', max_length=2048, vocab_size=50272, **menu[name])
    base.update(kw)
    return ModelConfig(**base)


def llama_config(name: str = '7b', **kw) -> ModelConfig:
    menu = {
        'sheared-2.7b': dict(d_model=2560, n_heads=20, n_layers=32,
                             d_feedforward=6912),
        '7b': dict(d_model=4096, n_heads=32, n_layers=32, d_feedforward=11008),
        '13b': dict(d_model=5120, n_heads=40, n_layers=40, d_feedforward=13824),
        # GQA generations (beyond the reference's menu)
        '3-8b': dict(d_model=4096, n_heads=32, n_kv_heads=8, n_layers=32,
                     d_feedforward=14336, vocab_size=128256,
                     max_length=8192, rope_base=500000.0),
    }
    base = dict(arch='llama', max_length=2048, vocab_size=32000)
    base.update(menu[name])
    base.update(kw)
    return ModelConfig(**base)


def tiny_config(arch: str = 'opt', **kw) -> ModelConfig:
    """Small config for tests."""
    base = dict(arch=arch, d_model=64, n_heads=4, n_layers=2, max_length=128,
                vocab_size=256, d_feedforward=128)
    base.update(kw)
    return ModelConfig(**base)
