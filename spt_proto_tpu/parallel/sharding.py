"""Parameter and activation sharding rules.

Path-pattern -> PartitionSpec rules for the DecoderLM param tree (stacked
[n_layers, ...] leading axis from nn.scan). Replaces the reference's
ZeRO-3 parameter sharding (script/4-sparse-tuning-1.py:172-175) with
explicit NamedSharding: tensor-parallel on 'model' (heads / FFN blocks /
vocab), optionally fully-sharded on 'data' for ZeRO-like memory scaling.

Any rule here is a performance choice, not a correctness one — pjit inserts
the collectives implied by whatever shardings we pick.
"""
from __future__ import annotations

import re
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from spt_proto_tpu.utils.tree import flatten, unflatten

# (regex over '/'-joined path, spec-without-layer-axis)
# Stacked block params get the layer axis prepended automatically.
_BLOCK_RULES = [
    # attention projections: q/k/v shard the head (output) dim, o the input
    (r'mha/(q|k|v)/kernel$', P(None, 'model')),
    (r'mha/(q|k|v)/bias$', P('model')),
    (r'mha/(q|k|v)/lora_right$', P('model', None)),
    (r'mha/(q|k|v)/lora_left$', P(None, None)),
    (r'mha/o/kernel$', P('model', None)),
    (r'mha/o/bias$', P(None)),
    (r'mha/o/lora_left$', P('model', None)),
    (r'mha/o/lora_right$', P(None, None)),
    # PQ codebooks replicate (tiny; every shard needs all subspaces)
    (r'quantizer/codebook$', P(None, None, None)),
    # FFN: fc1/gate/side shard d_ff (blocks = experts on the model axis),
    # fc2/down shard the input d_ff dim
    (r'ffn/(fc1|gate|side)/kernel$', P(None, 'model')),
    (r'ffn/fc1/bias$', P('model')),
    (r'ffn/(fc1|gate|side)/lora_right$', P('model', None)),
    (r'ffn/(fc1|gate|side)/lora_left$', P(None, None)),
    (r'ffn/(fc2|down)/kernel$', P('model', None)),
    (r'ffn/fc2/bias$', P(None)),
    (r'ffn/(fc2|down)/lora_left$', P('model', None)),
    (r'ffn/(fc2|down)/lora_right$', P(None, None)),
    (r'ffn/router/kernel$', P(None, None)),
    (r'ffn/router/bias$', P(None)),
    # norms replicate
    (r'norm\d/(scale|bias)$', P(None)),
]

_TOP_RULES = [
    (r'^embedding/embedding$', P('model', None)),
    (r'^embedding/lora_left$', P('model', None)),
    (r'^embedding/lora_right$', P(None, None)),
    (r'^learned_pe/', P(None, None)),
    (r'^final_norm/', P(None)),
    (r'^lm_head/kernel$', P(None, 'model')),
]


def spec_for_path(path: str):
    for pat, spec in _TOP_RULES:
        if re.search(pat, path):
            return spec
    if path.startswith('blocks/'):
        for pat, spec in _BLOCK_RULES:
            if re.search(pat, path):
                return P(None, *spec)  # leading stacked-layer axis
    return None  # replicate


def param_specs(params: Any) -> Any:
    """PartitionSpec pytree matching the param tree."""
    flat = flatten(params)
    specs = {}
    for path, leaf in flat.items():
        spec = spec_for_path(path)
        if spec is None:
            spec = P()
        # guard: spec rank must not exceed leaf rank
        ndim = getattr(leaf, 'ndim', len(getattr(leaf, 'shape', ())))
        if len(spec) > ndim:
            spec = P(*list(spec)[:ndim])
        specs[path] = spec
    return unflatten(specs)


def param_shardings(mesh: Mesh, params: Any) -> Any:
    return jax.tree.map(lambda s: NamedSharding(mesh, s), param_specs(params),
                        is_leaf=lambda x: isinstance(x, P))


def shard_params(mesh: Mesh, params: Any) -> Any:
    """Place params onto the mesh with the canonical shardings."""
    return jax.device_put(params, param_shardings(mesh, params))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P('data', None))
