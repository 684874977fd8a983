"""Parameter and activation sharding rules.

Path-pattern -> PartitionSpec rules for the DecoderLM param tree (stacked
[n_layers, ...] leading axis from nn.scan). Replaces the reference's
ZeRO-3 parameter sharding (script/4-sparse-tuning-1.py:172-175) with
explicit NamedSharding:

  * tensor-parallel on 'model' (heads / FFN blocks / vocab) — always on;
  * `fsdp=True` additionally shards the stacked-layer axis of every block
    parameter (and the big top-level embeddings/head) on 'data', which is
    the ZeRO-3 equivalent: parameters AND optimizer state (optax states
    mirror the param shardings) are partitioned across data-parallel
    ranks, so per-device memory shrinks ~linearly with DP width; XLA
    inserts the per-layer all-gathers inside the scan exactly where
    DeepSpeed would gather ZeRO-3 shards.

Any rule here is a performance choice, not a correctness one — pjit inserts
the collectives implied by whatever shardings we pick.
"""
from __future__ import annotations

import re
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from spt_proto_tpu.utils.tree import flatten, unflatten

# (regex over '/'-joined path, spec-without-layer-axis)
# Stacked block params get the layer axis prepended automatically.
_BLOCK_RULES = [
    # attention projections: q/k/v shard the head (output) dim, o the input
    # (the serving-side fused form [3, D, O] shards the same output dim —
    # each of q/k/v lands head-aligned on 'model', inference/weights.py)
    (r'mha/qkv/kernel$', P(None, None, 'model')),
    (r'mha/qkv/bias$', P(None, 'model')),
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

# ZeRO-3-equivalent overrides: shard the big top-level matrices on 'data'
# along a dim 'model' does not already occupy
_TOP_RULES_FSDP = [
    (r'^embedding/embedding$', P('model', 'data')),
    (r'^embedding/lora_left$', P('model', None)),
    (r'^embedding/lora_right$', P(None, None)),
    (r'^learned_pe/embedding$', P(None, 'data')),
    (r'^final_norm/', P(None)),
    (r'^lm_head/kernel$', P('data', 'model')),
]


def spec_for_path(path: str, fsdp: bool = False, pp: bool = False):
    for pat, spec in (_TOP_RULES_FSDP if fsdp else _TOP_RULES):
        if re.search(pat, path):
            return spec
    if path.startswith('blocks/'):
        for pat, spec in _BLOCK_RULES:
            if re.search(pat, path):
                # leading stacked-layer axis; under fsdp it is the ZeRO
                # shard axis (each DP rank stores n_layers/n_data layers);
                # under pp it is the pipeline-stage axis (each stage holds
                # n_layers/n_pipe layers, parallel/pipeline.py)
                lead = 'pipe' if pp else ('data' if fsdp else None)
                return P(lead, *spec)
    return None  # replicate


def param_specs(params: Any, fsdp: bool = False, pp: bool = False) -> Any:
    """PartitionSpec pytree matching the param tree."""
    assert not (fsdp and pp), \
        'fsdp and pp both shard the stacked-layer axis — pick one'
    flat = flatten(params)
    specs = {}
    for path, leaf in flat.items():
        spec = spec_for_path(path, fsdp=fsdp, pp=pp)
        if spec is None:
            spec = P()
        # guard: spec rank must not exceed leaf rank
        ndim = getattr(leaf, 'ndim', len(getattr(leaf, 'shape', ())))
        if len(spec) > ndim:
            spec = P(*list(spec)[:ndim])
        specs[path] = spec
    return unflatten(specs)


def _fit_spec(mesh: Mesh, spec: P, shape):
    """Strip mesh axes from dims they do not divide evenly (device_put
    rejects uneven shardings; e.g. n_layers=2 over data=4). Returns
    (fitted spec, list of stripped axis names)."""
    out = []
    stripped = []
    for dim, entry in enumerate(spec):
        if entry is None:
            out.append(None)
            continue
        axes = entry if isinstance(entry, tuple) else (entry,)
        kept = []
        for ax in axes:
            size = mesh.shape[ax]
            prod = int(np.prod([mesh.shape[a] for a in kept] or [1]))
            if size > 1 and shape[dim] % (prod * size) != 0:
                stripped.append(ax)
                continue
            kept.append(ax)
        out.append(tuple(kept) if len(kept) > 1 else
                   (kept[0] if kept else None))
    return P(*out), stripped


def _reassign_axis(mesh: Mesh, spec: P, shape, ax: str):
    """Move a stripped mesh axis onto the first free dim it divides
    (sharding placement is a performance choice, never a correctness
    one — pjit inserts whatever collectives the placement implies).
    Returns the new spec, or None if no dim fits."""
    entries = list(spec) + [None] * (len(shape) - len(spec))
    for dim in range(len(shape)):
        if entries[dim] is None and shape[dim] % mesh.shape[ax] == 0 \
                and mesh.shape[ax] > 1:
            entries[dim] = ax
            return P(*entries)
    return None


def param_shardings(mesh: Mesh, params: Any, fsdp: bool = False,
                    pp: bool = False) -> Any:
    """NamedSharding pytree. With fsdp=True the ZeRO shard axis ('data')
    falls back to another dividing dim when the stacked-layer axis is not
    divisible (e.g. 12 layers over 8-way DP: the layer axis can't shard,
    so the parameter's feature dim takes the 'data' shard instead — the
    memory still shrinks). A loud warning names every leaf that ends up
    fully replicated against a requested shard axis."""
    import warnings
    flat_specs = flatten(param_specs(params, fsdp=fsdp, pp=pp))
    flat_params = flatten(params)
    out = {}
    lost = []
    for path, spec in flat_specs.items():
        shape = flat_params[path].shape
        fitted, stripped = _fit_spec(mesh, spec, shape)
        for ax in stripped:
            if fsdp and ax == 'data':
                alt = _reassign_axis(mesh, fitted, shape, ax)
                if alt is not None:
                    fitted = alt
                    continue
            lost.append((path, ax, shape))
        out[path] = NamedSharding(mesh, fitted)
    if lost:
        ex = ', '.join(f'{p} (axis {a!r}, shape {s})'
                       for p, a, s in lost[:3])
        warnings.warn(
            f'{len(lost)} parameter(s) could not be sharded on a requested '
            f'mesh axis and are replicated there instead — e.g. {ex}. '
            f'With fsdp=True this means less ZeRO memory saving than the '
            f'DP width implies.', RuntimeWarning, stacklevel=2)
    return unflatten(out)


def shard_params(mesh: Mesh, params: Any, fsdp: bool = False,
                 pp: bool = False) -> Any:
    """Place params onto the mesh with the canonical shardings."""
    return jax.device_put(params,
                          param_shardings(mesh, params, fsdp=fsdp, pp=pp))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P('data', None))
