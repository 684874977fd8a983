"""Sharded serving: tensor-parallel weights + head-sharded KV cache.

The folded inference param tree (inference/weights.py) keeps the training
param paths, so the canonical TP rules (parallel/sharding.py) apply as-is:
q/k/v shard the head (output) dim on 'model', o and fc2/down shard the
input dim, vocab/lm_head shard on 'model', PQ codebooks and routers
replicate. The KV cache shards its head axis on 'model' and its batch
(slot) axis on 'data' — attention never crosses heads, so decode runs
collective-free up to the o-projection reduce and the lm_head gather,
which pjit inserts automatically.
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from spt_proto_tpu.inference.engine import KVCache
from spt_proto_tpu.inference.weights import InferenceWeights
from spt_proto_tpu.parallel.sharding import param_shardings


def shard_inference_weights(mesh: Mesh, iw: InferenceWeights
                            ) -> InferenceWeights:
    params = jax.device_put(iw.params, param_shardings(mesh, iw.params))
    return InferenceWeights(cfg=iw.cfg, params=params, quant=iw.quant)


def cache_shardings(mesh: Mesh, cache: KVCache,
                    batch_axis: str = 'data',
                    head_axis: str = 'model') -> KVCache:
    """batch_axis=None: shard heads only (e.g. [1, ...] prefill mini
    caches, whose slot dim cannot divide over 'data')."""
    # tile-major layout [B, KV, L*NT, D, TILE]
    kv = NamedSharding(mesh, P(batch_axis, head_axis, None, None, None))
    scales = dict()
    if cache.quantized:
        # scale layout [B, L*NT, KV, TILE] — heads on dim 2
        sc = NamedSharding(mesh, P(batch_axis, None, head_axis, None))
        scales = dict(k_scale=sc, v_scale=sc)
    return KVCache(
        k=kv, v=kv, codes=kv,
        length=NamedSharding(mesh, P(batch_axis)), **scales)


def shard_paged_cache(mesh: Mesh, cache):
    """TP sharding for the paged cache (inference/paged.py): the page
    pools [KV, L*P+1, ps, .] shard their HEAD axis on 'model' (pages are
    not slot-major, so the 'data' axis has nothing to shard); page
    tables and lengths replicate (they are host-maintained scheduler
    state). Attention never crosses heads, so paged decode runs
    collective-free up to the o-projection psum, same as contiguous."""
    from spt_proto_tpu.inference.paged import PagedKVCache
    kv = cache.k_pages.shape[0]
    head = 'model' if kv % mesh.shape['model'] == 0 else None
    pool = NamedSharding(mesh, P(head, None, None, None))
    rep1 = NamedSharding(mesh, P(None))
    rep2 = NamedSharding(mesh, P(None, None))
    scales = dict()
    if cache.quantized:
        scales = dict(k_scales=jax.device_put(cache.k_scales, pool),
                      v_scales=jax.device_put(cache.v_scales, pool))
    return PagedKVCache(
        k_pages=jax.device_put(cache.k_pages, pool),
        v_pages=jax.device_put(cache.v_pages, pool),
        c_pages=jax.device_put(cache.c_pages, pool),
        page_indices=jax.device_put(cache.page_indices, rep2),
        length=jax.device_put(cache.length, rep1), **scales)


def shard_cache(mesh: Mesh, cache: KVCache,
                batch_axis: str = 'data') -> KVCache:
    if batch_axis == 'data' and \
            cache.k.shape[0] % mesh.shape['data'] != 0:
        batch_axis = None       # e.g. a single-slot mini cache
    head_axis = 'model' if cache.k.shape[1] % mesh.shape['model'] == 0 \
        else None               # non-dividing KV heads: replicate
    sh = cache_shardings(mesh, cache, batch_axis=batch_axis,
                         head_axis=head_axis)
    scales = dict()
    if cache.quantized:
        scales = dict(k_scale=jax.device_put(cache.k_scale, sh.k_scale),
                      v_scale=jax.device_put(cache.v_scale, sh.v_scale))
    return KVCache(
        k=jax.device_put(cache.k, sh.k),
        v=jax.device_put(cache.v, sh.v),
        codes=jax.device_put(cache.codes, sh.codes),
        length=jax.device_put(cache.length, sh.length), **scales)
