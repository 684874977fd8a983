"""Shared CLI helpers."""
from __future__ import annotations

import argparse
from typing import Any, Tuple

import jax
import jax.numpy as jnp

from spt_proto_tpu.config import ModelConfig, llama_config, opt_config
from spt_proto_tpu.utils import checkpoint as ckpt_io


def load_or_init(args) -> Tuple[ModelConfig, Any]:
    """Load a checkpoint dir, or init a named config from scratch."""
    if getattr(args, 'ckpt', None):
        return ckpt_io.load_checkpoint(args.ckpt)
    name = getattr(args, 'config', 'opt-125m')
    fam, size = name.split('-', 1)
    cfg = opt_config(size) if fam == 'opt' else llama_config(size)
    from spt_proto_tpu.tuning import surgery
    params = surgery.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def add_model_args(p: argparse.ArgumentParser) -> None:
    p.add_argument('--ckpt', type=str, default=None,
                   help='checkpoint directory (config.json + params.npz)')
    p.add_argument('--config', type=str, default='opt-125m',
                   help='named config when no --ckpt (opt-125m, opt-1.3b, '
                        'opt-2.7b, llama-7b, llama-13b, '
                        'llama-sheared-2.7b)')
    p.add_argument('--dtype', type=str, default='float32',
                   choices=['float32', 'bfloat16'])


def apply_dtype(cfg: ModelConfig, args) -> ModelConfig:
    return cfg.replace(dtype=jnp.dtype(args.dtype))


def add_mesh_args(p: argparse.ArgumentParser) -> None:
    p.add_argument('--mesh_model', type=int, default=None,
                   help='tensor-parallel width for serving: weights '
                        'sharded on the model axis, KV cache heads '
                        'sharded (parallel/infer_sharding.py)')
    p.add_argument('--mesh_data', type=int, default=1,
                   help='data axis width for serving (cache slots '
                        'sharded across it)')


def mesh_from_args(args):
    """None when no --mesh_model: single-device serving."""
    if getattr(args, 'mesh_model', None) is None:
        return None
    from spt_proto_tpu.parallel.mesh import make_mesh
    import jax
    n = args.mesh_data * args.mesh_model
    return make_mesh(args.mesh_data, args.mesh_model,
                     devices=jax.devices()[:n])
