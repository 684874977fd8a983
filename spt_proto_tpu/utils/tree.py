"""Param-tree path utilities (flatten/merge/compare).

The reference's ModuleUpgrader rewrites an nn.Module tree in place by
reflection (naive_gpt/utils/adapter.py:186-223); in JAX the same job is a
pure function over the param pytree — these helpers are its vocabulary.
"""
from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import numpy as np


def flatten(tree: Any, sep: str = '/') -> Dict[str, Any]:
    flat = {}

    def rec(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                rec(f'{prefix}{sep}{k}' if prefix else str(k), v)
        else:
            flat[prefix] = node
    rec('', tree)
    return flat


def unflatten(flat: Dict[str, Any], sep: str = '/') -> Any:
    tree: Dict[str, Any] = {}
    for path, leaf in flat.items():
        parts = path.split(sep)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = leaf
    return tree


def overlay(base: Any, patch: Any, *, require_all_used: bool = True) -> Any:
    """Copy every leaf of `patch` into a copy of `base` at the same path.

    Shapes must match; paths in `patch` missing from `base` raise (mirrors
    the reference's strict key-consumption check, script/1-convert.py:77).
    """
    fb = flatten(base)
    fp = flatten(patch)
    out = dict(fb)
    for path, leaf in fp.items():
        if path not in fb:
            if require_all_used:
                raise KeyError(f'patch path {path!r} not present in base tree')
            continue
        if tuple(np.shape(fb[path])) != tuple(np.shape(leaf)):
            raise ValueError(
                f'shape mismatch at {path!r}: '
                f'{np.shape(fb[path])} vs {np.shape(leaf)}')
        out[path] = leaf
    return unflatten(out)


def tree_diff(base: Any, tuned: Any, atol: float = 1e-3) -> Dict[str, Any]:
    """Leaves of `tuned` that differ from `base` (or are new).

    Delta-checkpoint core (ref script/8-dump-spt.py:17-35: keep tensors not
    allclose to base at atol 1e-3, plus tensors absent from base).
    """
    fb = flatten(base)
    ft = flatten(tuned)
    delta = {}
    for path, leaf in ft.items():
        if path not in fb:
            delta[path] = leaf
            continue
        a, b = np.asarray(fb[path]), np.asarray(leaf)
        if a.shape != b.shape or not np.allclose(a, b, atol=atol):
            delta[path] = leaf
    return delta


def map_with_path(fn: Callable[[str, Any], Any], tree: Any) -> Any:
    flat = flatten(tree)
    return unflatten({p: fn(p, v) for p, v in flat.items()})


def param_count(tree: Any) -> int:
    return sum(int(np.prod(np.shape(x))) for x in jax.tree.leaves(tree))
