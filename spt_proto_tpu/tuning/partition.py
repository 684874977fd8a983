"""Trainable/frozen parameter partitioning.

Reference parity: the reference freezes base weights inside LoRALinear
(tuning/lora.py:43-44) and trains only LoRA factors, routers, and PQ
codebooks. Functionally that is a boolean mask over the param tree consumed
by optax.masked / multi_transform.
"""
from __future__ import annotations

from typing import Any

import jax
import optax

TRAINABLE_MARKERS = ('lora_left', 'lora_right', 'router', 'codebook')


def is_trainable_path(path: str) -> bool:
    parts = path.split('/')
    return any(m in parts for m in TRAINABLE_MARKERS)


def trainable_mask(params: Any) -> Any:
    """Pytree of bools: True = trainable (LoRA / router / PQ codebook)."""
    from spt_proto_tpu.utils.tree import flatten, unflatten
    flat = flatten(params)
    return unflatten({p: is_trainable_path(p) for p in flat})


def count_trainable(params: Any) -> tuple[int, int]:
    """(trainable, frozen) param counts — ref script/2-model-info.py."""
    import numpy as np
    from spt_proto_tpu.utils.tree import flatten
    flat = flatten(params)
    train = sum(int(np.prod(np.shape(v))) for p, v in flat.items()
                if is_trainable_path(p))
    total = sum(int(np.prod(np.shape(v))) for v in flat.values())
    return train, total - train


def masked_optimizer(tx: optax.GradientTransformation,
                     params: Any) -> optax.GradientTransformation:
    """Wrap an optimizer so frozen params receive zero updates."""
    mask = trainable_mask(params)
    return optax.multi_transform(
        {'train': tx, 'freeze': optax.set_to_zero()},
        jax.tree.map(lambda t: 'train' if t else 'freeze', mask))
