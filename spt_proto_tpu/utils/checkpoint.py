"""Checkpoint IO: full checkpoints, delta checkpoints, config round-trip.

Reference parity: the three-tier scheme of SURVEY §5 —
  (1) converted base checkpoint {'config', 'state_dict'}
      (ref script/1-convert.py:189-195) -> here a .npz of flattened param
      paths + a JSON config sidecar in one directory;
  (2) periodic training checkpoints (ref Lightning ModelCheckpoint) ->
      same format, written by tuning/trainer.py;
  (3) delta checkpoints holding only tensors that changed vs base
      (ref script/8-dump-spt.py: allclose atol 1e-3, assert < 50M params).
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional, Tuple

import jax
import numpy as np

from spt_proto_tpu.config import ModelConfig
from spt_proto_tpu.utils.tree import (flatten, overlay, param_count,
                                      tree_diff, unflatten)

MAX_DELTA_PARAMS = 50_000_000  # ref script/8-dump-spt.py:34


def _config_to_json(cfg: ModelConfig) -> str:
    d = dataclasses.asdict(cfg)
    for key in ('dtype', 'param_dtype'):
        d[key] = np.dtype(d[key]).name
    return json.dumps(d, indent=2)


def _config_from_json(s: str) -> ModelConfig:
    import jax.numpy as jnp
    d = json.loads(s)
    for key in ('dtype', 'param_dtype'):
        d[key] = jnp.dtype(d[key])
    return ModelConfig(**d)


def save_checkpoint(path: str, cfg: ModelConfig, params: Any) -> None:
    os.makedirs(path, exist_ok=True)
    flat = {k: np.asarray(v) for k, v in flatten(params).items()}
    np.savez(os.path.join(path, 'params.npz'), **flat)
    with open(os.path.join(path, 'config.json'), 'w') as f:
        f.write(_config_to_json(cfg))


def load_checkpoint(path: str) -> Tuple[ModelConfig, Any]:
    with open(os.path.join(path, 'config.json')) as f:
        cfg = _config_from_json(f.read())
    data = np.load(os.path.join(path, 'params.npz'))
    params = unflatten({k: data[k] for k in data.files})
    return cfg, params


def save_delta_checkpoint(path: str, cfg: ModelConfig, base_params: Any,
                          tuned_params: Any, *, atol: float = 1e-3,
                          max_params: int = MAX_DELTA_PARAMS) -> int:
    """Save only tensors that differ from base. Returns delta param count.

    Ref script/8-dump-spt.py:17-35 (including the <50M param assert).
    """
    delta = tree_diff(base_params, tuned_params, atol=atol)
    n = sum(int(np.prod(np.shape(v))) for v in delta.values())
    assert n < max_params, f'delta too large: {n} params'
    os.makedirs(path, exist_ok=True)
    np.savez(os.path.join(path, 'delta.npz'),
             **{k: np.asarray(v) for k, v in delta.items()})
    with open(os.path.join(path, 'config.json'), 'w') as f:
        f.write(_config_to_json(cfg))
    return n


def load_delta_checkpoint(path: str, base_params: Any
                          ) -> Tuple[ModelConfig, Any]:
    """Overlay a delta onto upgraded base params.

    The base tree must already have the upgraded structure (LoRA/router/
    codebook leaves present) — mirroring script/3-mmlu-evaluate.py:52-60
    which upgrades first, then loads the delta with strict=False while
    asserting every missing key is a non-LoRA base weight.
    """
    with open(os.path.join(path, 'config.json')) as f:
        cfg = _config_from_json(f.read())
    data = np.load(os.path.join(path, 'delta.npz'))
    delta = unflatten({k: data[k] for k in data.files})
    return cfg, overlay(base_params, delta)
