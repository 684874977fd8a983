"""Continuous batching engine: slot-based prefill/decode interleaving.

North-star addition (no reference counterpart). The scheduler core —
request queue, slot allocation, decode-batch composition, completion
accounting — is native C++ (runtime/scheduler.cc) consumed through ctypes;
the Python side only moves tensors. If the shared library is missing it is
built on first use with the repo Makefile (g++, no external deps).

Flow per `step()`:
  1. admit queued requests into free slots (C++ decides),
  2. prefill each newly admitted slot (bucketed prompt lengths => few jit
     specializations) and splice its KV into the shared batch cache,
  3. one batched decode step over all active slots,
  4. report tokens back to the scheduler; finished slots free immediately.
"""
from __future__ import annotations

import ctypes
import dataclasses
import functools
import os
import subprocess
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from spt_proto_tpu.inference.engine import (DECODE_BUCKET, TILE, KVCache,
                                            decode_step, grow_cache, prefill,
                                            round_up, sample, verify_step)
from spt_proto_tpu.inference.engine import (
    prefill_chunk_compute as _chunk_compute)
from spt_proto_tpu.inference.engine import prefill_chunk_past as _chunk_past
from spt_proto_tpu.inference.weights import InferenceWeights

_RUNTIME_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), 'runtime')


def _load_native():
    lib_path = os.path.join(_RUNTIME_DIR, 'libsptrt.so')
    # make is a no-op when the .so is newer than the sources
    subprocess.run(['make', '-C', _RUNTIME_DIR], check=True,
                   capture_output=True)
    lib = ctypes.CDLL(lib_path)
    lib.sched_create.restype = ctypes.c_void_p
    lib.sched_create.argtypes = [ctypes.c_int32, ctypes.c_int32]
    lib.sched_destroy.argtypes = [ctypes.c_void_p]
    lib.sched_submit.restype = ctypes.c_int64
    lib.sched_submit.argtypes = [ctypes.c_void_p, ctypes.c_int32,
                                 ctypes.c_int32]
    lib.sched_admit.restype = ctypes.c_int32
    lib.sched_admit.argtypes = [ctypes.c_void_p,
                                ctypes.POINTER(ctypes.c_int32),
                                ctypes.POINTER(ctypes.c_int64)]
    lib.sched_prefill_done.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.sched_decode_mask.restype = ctypes.c_int32
    lib.sched_decode_mask.argtypes = [ctypes.c_void_p,
                                      ctypes.POINTER(ctypes.c_int8)]
    lib.sched_token_decoded.restype = ctypes.c_int32
    lib.sched_token_decoded.argtypes = [ctypes.c_void_p, ctypes.c_int32,
                                        ctypes.c_int8]
    lib.sched_num_active.restype = ctypes.c_int32
    lib.sched_num_active.argtypes = [ctypes.c_void_p]
    lib.sched_queue_depth.restype = ctypes.c_int32
    lib.sched_queue_depth.argtypes = [ctypes.c_void_p]
    lib.sched_slot_request.restype = ctypes.c_int64
    lib.sched_slot_request.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.sched_requeue.argtypes = [ctypes.c_void_p, ctypes.c_int32,
                                  ctypes.c_int32, ctypes.c_int32]
    return lib


_LIB = None


def native_scheduler_lib():
    global _LIB
    if _LIB is None:
        _LIB = _load_native()
    return _LIB


# ---------------------------------------------------------------------------
# jitted serving steps (donated caches => in-place updates, no per-step copy)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=('temperature',),
                   donate_argnums=(2,))
def _decode_and_sample(iw, tokens, cache, active, rng, *, temperature):
    """Decode + mask inactive lanes + sample, in ONE dispatch. Only the
    per-lane length needs masking: an inactive lane's garbage column write
    lands at its held-back position and is overwritten before it can ever
    become attention-visible."""
    if temperature == 0.0:
        # greedy: lm_head matmul + argmax fuse into one streaming kernel
        # (engine.decode_step_greedy; token-identical to argmax(logits))
        from spt_proto_tpu.inference.engine import decode_step_greedy
        tok, new = decode_step_greedy(iw, tokens, cache)
    else:
        logits, new = decode_step(iw, tokens, cache)
        tok = sample(logits, rng, temperature=temperature)
    new = dataclasses.replace(
        new, length=jnp.where(active, new.length, new.length - 1))
    return tok, new


@functools.partial(jax.jit, static_argnames=('temperature',),
                   donate_argnums=(2,))
def _paged_decode_and_sample(iw, tokens, cache, active, rng, *, temperature):
    from spt_proto_tpu.inference.paged import paged_decode_step
    logits, new = paged_decode_step(iw, tokens, cache)
    new = dataclasses.replace(
        new, length=jnp.where(active, new.length, new.length - 1))
    tok = sample(logits, rng, temperature=temperature)
    return tok, new


@functools.partial(jax.jit, static_argnames=('temperature',),
                   donate_argnums=(2,))
def _verify_and_accept(iw, block, cache, active, rng, *, temperature):
    """Speculative round for the batching engine in ONE dispatch: block
    verify (engine.verify_step — the fused Pallas kernel on bf16 caches),
    greedy or rejection-sampling acceptance, and rollback. Inactive lanes
    roll back fully (their lengths never move; the garbage columns are
    overwritten before becoming attention-visible, same argument as
    _decode_and_sample). Returns (n_acc [B], correction token [B], cache).
    """
    b, kk = block.shape
    logits, new = verify_step(iw, block, cache)
    len0 = new.length - kk
    if temperature == 0.0:
        t_hat = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        match = (t_hat[:, :kk - 1] == block[:, 1:]).astype(jnp.int32)
        n_acc = jnp.cumprod(match, axis=1).sum(axis=1)
        corr = t_hat[jnp.arange(b), n_acc]
    else:
        from spt_proto_tpu.inference.speculative import spec_accept
        n_acc, corr = spec_accept(logits, None, block[:, 1:], rng,
                                  temperature=temperature)
    new = dataclasses.replace(
        new, length=jnp.where(active, len0 + 1 + n_acc, len0))
    return n_acc, corr, new


@functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(6,))
def _splice_slot(cache: KVCache, slot, mk, mv, mc, new_len,
                 n_layers) -> KVCache:
    """Write a prefilled mini-cache ([1, KV, L*NTm, ., T] tile-major) into
    `slot` of the shared cache, in place under donation. Layer blocks are
    strided (NTm vs NT tiles per layer), so the splice runs on the
    [B, KV, L, NT, ., T] views."""
    nt = cache.tiles_per_layer(n_layers)
    nt_m = mk.shape[2] // n_layers

    def spl(big, mini):
        b, h = big.shape[:2]
        view = big.reshape(b, h, n_layers, nt, *big.shape[3:])
        mview = mini.reshape(1, h, n_layers, nt_m, *mini.shape[3:])
        view = jax.lax.dynamic_update_slice(
            view, mview.astype(big.dtype), (slot, 0, 0, 0, 0, 0))
        return view.reshape(big.shape)

    return KVCache(
        k=spl(cache.k, mk), v=spl(cache.v, mv), codes=spl(cache.codes, mc),
        length=cache.length.at[slot].set(new_len))


@functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(8,))
def _splice_slot_q(cache: KVCache, slot, mk, mv, mc, mks, mvs, new_len,
                   n_layers) -> KVCache:
    """_splice_slot for the int8 cache: also splices the mini scale pools
    ([1, L*NTm, KV_pad, T] tile-major-outer) into the slot row."""
    base = _splice_slot(dataclasses.replace(cache, k_scale=None,
                                            v_scale=None),
                        slot, mk, mv, mc, new_len, n_layers)
    nt = cache.tiles_per_layer(n_layers)
    nt_m = mks.shape[1] // n_layers
    hp = cache.k_scale.shape[2]

    def spl_sc(big, mini):
        b = big.shape[0]
        view = big.reshape(b, n_layers, nt, hp, big.shape[-1])
        mview = mini.reshape(1, n_layers, nt_m, hp, mini.shape[-1])
        view = jax.lax.dynamic_update_slice(
            view, mview.astype(big.dtype), (slot, 0, 0, 0, 0))
        return view.reshape(big.shape)

    return dataclasses.replace(base,
                               k_scale=spl_sc(cache.k_scale, mks),
                               v_scale=spl_sc(cache.v_scale, mvs))


@functools.partial(jax.jit, static_argnums=(1, 2))
def _slice_tiles(arr, nt_p, n_layers):
    """First `nt_p` tiles of each layer block of a [1, KV, L*NTm, ., T]
    mini-cache array (prefix extraction for the prefix cache)."""
    one, h = arr.shape[:2]
    nt_m = arr.shape[2] // n_layers
    view = arr.reshape(one, h, n_layers, nt_m, *arr.shape[3:])[:, :, :, :nt_p]
    return view.reshape(one, h, n_layers * nt_p, *arr.shape[3:])


@functools.partial(jax.jit, static_argnums=(1, 2))
def _slice_tiles_sc(arr, nt_p, n_layers):
    """_slice_tiles for the int8 scale pools ([1, L*NTm, KV_pad, T])."""
    one = arr.shape[0]
    nt_m = arr.shape[1] // n_layers
    view = arr.reshape(one, n_layers, nt_m, *arr.shape[2:])[:, :, :nt_p]
    return view.reshape(one, n_layers * nt_p, *arr.shape[2:])


@dataclasses.dataclass
class _Live:
    request_id: int
    tokens: List[int]
    last_token: int
    prompt_len: int = 0      # tokens in the cache right after prefill
    carried: int = 0         # tokens in `tokens` that predate this prefill
                             # (preemption carry — already inside prompt_len)


@dataclasses.dataclass
class Completion:
    request_id: int
    tokens: List[int]       # generated tokens (prompt excluded)


class ContinuousBatchingEngine:
    """Serve generate() requests with continuous batching over fixed slots."""

    def __init__(self, iw: InferenceWeights, *, n_slots: int = 8,
                 max_len: int = 256, prefill_bucket: int = 64,
                 temperature: float = 0.0, eos_id: Optional[int] = None,
                 paged: bool = False, page_size: int = 64,
                 n_pages: Optional[int] = None, seed: int = 0,
                 prefill_chunk: Optional[int] = None,
                 quantized_kv: bool = False,
                 speculative: Optional[int] = None,
                 prefix_cache: bool = False,
                 prefix_cache_entries: int = 8,
                 mesh=None):
        # mesh: tensor-parallel serving — weights TP-sharded on 'model'
        # (heads / FFN / vocab), KV cache sharded (slots on 'data', heads
        # on 'model'); every jitted engine step then runs as one pjit
        # program over the mesh, with XLA inserting the o-projection
        # psum and lm_head gather (parallel/infer_sharding.py). The
        # scheduler and slot logic are unchanged — sharding is carried
        # by the arrays. Paged mode shards the page pools' head axis on
        # 'model' (infer_sharding.shard_paged_cache).
        if mesh is not None:
            from spt_proto_tpu.parallel.infer_sharding import \
                shard_inference_weights
            iw = shard_inference_weights(mesh, iw)
        self.mesh = mesh
        self.iw = iw
        self.n_slots = n_slots
        self.max_len = max_len
        self.bucket = prefill_bucket
        self.temperature = temperature
        self.eos_id = eos_id
        self.paged = paged
        # chunked prefill: prompts longer than `prefill_chunk` are split
        # across engine steps (one chunk per step) so a long admission
        # can't stall the decode batch. Contiguous cache only.
        if prefill_chunk is not None:
            assert not paged, 'prefill_chunk requires the contiguous cache'
            assert prefill_chunk % TILE == 0, \
                f'prefill_chunk must be a multiple of {TILE}'
        self.chunk = prefill_chunk
        # int8 KV cache (per-token scales): halves cache bytes => double
        # the slots (or pages) a chip can hold
        self.quantized_kv = quantized_kv
        # speculative=k: each engine step runs ONE verify block of k
        # prompt-lookup (n-gram) proposals per slot instead of one decode
        # step — lossless (greedy matches plain greedy; sampled matches
        # the warped target), pays off when generations repeat their
        # context. Contiguous cache only (verify_step contract).
        if speculative is not None:
            assert not paged, 'speculative requires the contiguous cache'
            assert speculative >= 1
        self.spec_k = speculative
        self.spec_stats = dict(rounds=0, proposed=0, accepted=0)
        # prefix caching: KV of TILE-aligned prompt prefixes is kept in an
        # LRU store and spliced into a slot at admission, so requests that
        # share a system prompt / few-shot preamble only prefill their
        # tail (vLLM-style automatic prefix caching; no reference
        # counterpart — the reference has no serving path, SURVEY §0).
        # Contiguous cache only: the tail rides prefill_chunk's offset
        # contract. Dense configs reproduce uncached outputs exactly;
        # sparse_v2 follows prefill_chunk's per-row selection contract
        # (selection for reused rows was made at prefix length, not full
        # prompt length — same approximation family as chunked prefill).
        if prefix_cache:
            assert not paged, 'prefix_cache requires the contiguous cache'
        self.prefix_on = prefix_cache
        self.prefix_entries = prefix_cache_entries
        self._prefix_store: 'Dict[tuple, dict]' = {}
        self._prefix_lru: List[tuple] = []
        self.prefix_hits = 0
        self.prefix_tokens_reused = 0
        self._chunking: Dict[int, dict] = {}   # slot -> chunked-prefill state
        self.last_step_prefill_tokens = 0      # jitter observability
        self._lib = native_scheduler_lib()
        self._sched = self._lib.sched_create(n_slots, max_len)
        if paged:
            from spt_proto_tpu.inference.paged import (PageAllocator,
                                                       PagedKVCache,
                                                       paged_decode_step,
                                                       paged_prefill)
            self.page_size = page_size
            if n_pages is None:
                n_pages = n_slots * (-(-max_len // page_size))
            self.alloc = PageAllocator(n_pages, n_slots)
            self.cache = PagedKVCache.create(iw.cfg, n_slots, n_pages,
                                             page_size, max_len,
                                             dtype=iw.cfg.dtype,
                                             quantized=quantized_kv)
            if mesh is not None:
                from spt_proto_tpu.parallel.infer_sharding import \
                    shard_paged_cache
                self.cache = shard_paged_cache(mesh, self.cache)
            self._prefill_fn = jax.jit(paged_prefill)
            self._decode_fn = functools.partial(
                _paged_decode_and_sample, temperature=temperature)
        else:
            # contiguous cache starts at one bucket and grows with the
            # longest live sequence (decode cost tracks context, not
            # max_len); prefill donates its mini cache, splice is in place
            self.cap = min(max_len, DECODE_BUCKET)
            self.cache = KVCache.create(iw.cfg, n_slots, self.cap,
                                        dtype=iw.cfg.dtype,
                                        quantized=quantized_kv)
            if mesh is not None:
                from spt_proto_tpu.parallel.infer_sharding import \
                    shard_cache
                self.cache = shard_cache(mesh, self.cache)
            self._prefill_fn = jax.jit(prefill, donate_argnums=(2,))
            # two dispatches per chunk: the past-read never donates, the
            # compute/write half never READS the cache => its donation
            # aliases in place (no cache-sized copy per chunk)
            self._past_fn = jax.jit(_chunk_past, static_argnums=(3,))
            self._chunk_fn = jax.jit(_chunk_compute, static_argnums=(5,),
                                     donate_argnums=(2,))
            self._decode_fn = functools.partial(
                _decode_and_sample, temperature=temperature)
        self._prompts: Dict[int, List[int]] = {}
        self._max_new: Dict[int, int] = {}
        self._stop_ids: Dict[int, set] = {}     # rid -> per-request stops
        self._carry: Dict[int, List[int]] = {}  # preempted partial outputs
        self._live: Dict[int, _Live] = {}       # slot -> live state
        self._tokens = np.zeros((n_slots,), np.int32)
        self._rng = jax.random.PRNGKey(seed)
        self.completions: List[Completion] = []
        self.n_preemptions = 0

    def __del__(self):
        try:
            self._lib.sched_destroy(self._sched)
        except Exception:
            pass

    # ------------------------------------------------------------------
    def submit(self, prompt_tokens: List[int],
               max_new_tokens: int = 32,
               stop_ids: Optional[List[int]] = None) -> int:
        """Queue a request. `stop_ids`: per-request stop tokens — the
        generation ends early when any is produced (the stop token is
        included in the completion, like the engine-wide eos_id)."""
        if self.paged:
            # worst case the request ever needs as the pool's sole occupant:
            # its bucketed prompt at prefill, or its full final length
            total = len(prompt_tokens) + max_new_tokens
            worst = max(total, min(self._bucketed(total), self.max_len))
            if -(-worst // self.page_size) > self.alloc.n_pages:
                raise ValueError('request needs more pages than the pool '
                                 'holds — it could never be scheduled')
        rid = self._lib.sched_submit(self._sched, len(prompt_tokens),
                                     max_new_tokens)
        if rid < 0:
            raise ValueError('request cannot fit in max_len')
        self._prompts[rid] = list(prompt_tokens)
        self._max_new[rid] = max_new_tokens
        if stop_ids:
            self._stop_ids[rid] = {int(t) for t in stop_ids}
        return int(rid)

    @property
    def num_active(self) -> int:
        return self._lib.sched_num_active(self._sched)

    @property
    def queue_depth(self) -> int:
        return self._lib.sched_queue_depth(self._sched)

    # ------------------------------------------------------------------
    def _bucketed(self, n: int) -> int:
        return max(self.bucket, -(-n // self.bucket) * self.bucket)

    # ------------------------------------------------------------------
    # prefix cache (contiguous engine only)
    def cache_prefix(self, tokens: List[int]) -> int:
        """Precompute and pin a shared prefix (e.g. a system prompt) in
        the prefix cache. Only the TILE-aligned head is cacheable; returns
        the number of tokens actually cached (0 if shorter than one tile).
        """
        assert self.prefix_on, 'engine built without prefix_cache=True'
        p_len = (len(tokens) // TILE) * TILE
        if p_len == 0:
            return 0
        key = tuple(int(t) for t in tokens[:p_len])
        if key in self._prefix_store:
            return p_len
        mini = KVCache.create(self.iw.cfg, 1, p_len,
                              dtype=self.iw.cfg.dtype,
                              quantized=self.quantized_kv)
        _, mini = self._prefill_fn(
            self.iw, jnp.asarray([key], jnp.int32), mini)
        self._store_prefix(key, dict(k=mini.k, v=mini.v, codes=mini.codes,
                                     k_scale=mini.k_scale,
                                     v_scale=mini.v_scale))
        return p_len

    def _store_prefix(self, key: tuple, entry: dict) -> None:
        if key not in self._prefix_store:
            self._prefix_store[key] = entry
            self._prefix_lru.append(key)
            if len(self._prefix_lru) > self.prefix_entries:
                del self._prefix_store[self._prefix_lru.pop(0)]
        else:
            self._prefix_lru.remove(key)
            self._prefix_lru.append(key)

    def _lookup_prefix(self, cache_tokens: List[int]) -> Optional[tuple]:
        """Longest stored key that is a STRICT prefix of the prompt (at
        least one tail token must remain to produce sampling logits)."""
        best = None
        for key in self._prefix_store:
            if len(key) < len(cache_tokens) and \
                    (best is None or len(key) > len(best)) and \
                    list(key) == cache_tokens[:len(key)]:
                best = key
        if best is not None:
            self._prefix_lru.remove(best)
            self._prefix_lru.append(best)
        return best

    def _prefill_slot(self, slot: int, rid: int) -> None:
        prompt = self._prompts[rid]
        carry = self._carry.pop(rid, [])   # preempted partial generation
        cache_tokens = prompt + carry
        s = len(cache_tokens)
        sb = min(self._bucketed(s), self.max_len)
        padded = np.zeros((1, sb), np.int32)
        padded[0, :s] = cache_tokens
        if self.paged:
            from spt_proto_tpu.inference.paged import PagedKVCache
            # admission control: the padded prompt needs ceil(sb/ps) pages
            # NOW; further pages are allocated lazily as the sequence grows.
            pages_needed = -(-sb // self.page_size)
            if self.alloc.free_count < pages_needed:
                # pool can't hold the prompt yet — requeue at the front
                # (FCFS preserved) and retry when other slots release pages
                if carry:
                    self._carry[rid] = carry
                self._lib.sched_requeue(self._sched, slot, s,
                                        self._max_new[rid] - len(carry))
                return
            self.alloc.ensure(slot, sb, self.page_size)
            table = self.alloc.table(slot,
                                     self.cache.page_indices.shape[1])
            pi = self.cache.page_indices.at[slot].set(jnp.asarray(table))
            mini = PagedKVCache(self.cache.k_pages, self.cache.v_pages,
                                self.cache.c_pages, pi[slot][None],
                                jnp.zeros((1,), jnp.int32),
                                k_scales=self.cache.k_scales,
                                v_scales=self.cache.v_scales)
            logits, mini = self._prefill_fn(self.iw, jnp.asarray(padded),
                                            mini)
            self.cache = PagedKVCache(
                k_pages=mini.k_pages, v_pages=mini.v_pages,
                c_pages=mini.c_pages, page_indices=pi,
                length=self.cache.length.at[slot].set(s),
                k_scales=mini.k_scales, v_scales=mini.v_scales)
        else:
            hit = (self._lookup_prefix(cache_tokens) if self.prefix_on
                   else None)
            if hit is not None:
                # splice the cached prefix KV into the slot, then run only
                # the tail through the chunked-prefill machinery (offset
                # starts at the prefix length)
                p_len = len(hit)
                # bucket the padded tail to the next power-of-two multiple
                # of TILE: bounds _chunk_fn's (tail_len, offset) jit
                # specializations to O(log(max_len/TILE)) per prefix length
                # instead of one compile per distinct tail length
                tail_pad = TILE
                while p_len + tail_pad < s:
                    tail_pad *= 2
                smax = -(-self.max_len // TILE) * TILE
                pad_len = min(p_len + tail_pad, smax)
                if pad_len > self.cap:
                    self._grow(pad_len)
                e = self._prefix_store[hit]
                nl = self.iw.cfg.n_layers
                if self.quantized_kv:
                    self.cache = _splice_slot_q(
                        self.cache, slot, e['k'], e['v'], e['codes'],
                        e['k_scale'], e['v_scale'], p_len, nl)
                else:
                    self.cache = _splice_slot(self.cache, slot, e['k'],
                                              e['v'], e['codes'], p_len, nl)
                self.prefix_hits += 1
                self.prefix_tokens_reused += p_len
                toks = np.zeros((1, pad_len), np.int32)
                toks[0, :s] = cache_tokens
                self._chunking[slot] = dict(rid=rid, tokens=toks,
                                            true_len=s, carry=carry,
                                            done=p_len)
                self._advance_chunk(slot)
                return
            if self.chunk and s > self.chunk:
                # chunked path: stash the prompt, process chunks one per
                # engine step (first one now) — decode of other slots
                # proceeds between chunks
                pad_len = -(-s // TILE) * TILE
                if pad_len > self.cap:
                    self._grow(pad_len)
                toks = np.zeros((1, pad_len), np.int32)
                toks[0, :s] = cache_tokens
                self._chunking[slot] = dict(
                    rid=rid, tokens=toks, true_len=s, carry=carry, done=0)
                self._advance_chunk(slot)
                return
            if sb > self.cap:
                self._grow(sb)
            mini = KVCache.create(self.iw.cfg, 1, sb,
                                  dtype=self.iw.cfg.dtype,
                                  quantized=self.quantized_kv)
            logits, mini = self._prefill_fn(self.iw, jnp.asarray(padded),
                                            mini)
            # automatic prefix insertion: pin this prompt's TILE-aligned
            # head so later requests sharing it skip that prefill work
            if self.prefix_on:
                p_len = (s // TILE) * TILE
                key = tuple(int(t) for t in cache_tokens[:p_len])
                if p_len and key not in self._prefix_store:
                    nt_p, nl = p_len // TILE, self.iw.cfg.n_layers
                    q = self.quantized_kv
                    self._store_prefix(key, dict(
                        k=_slice_tiles(mini.k, nt_p, nl),
                        v=_slice_tiles(mini.v, nt_p, nl),
                        codes=_slice_tiles(mini.codes, nt_p, nl),
                        k_scale=_slice_tiles_sc(mini.k_scale, nt_p, nl)
                        if q else None,
                        v_scale=_slice_tiles_sc(mini.v_scale, nt_p, nl)
                        if q else None))
            # splice slot cache in place; true length is s (not padded sb)
            if self.quantized_kv:
                self.cache = _splice_slot_q(
                    self.cache, slot, mini.k, mini.v, mini.codes,
                    mini.k_scale, mini.v_scale, s, self.iw.cfg.n_layers)
            else:
                self.cache = _splice_slot(self.cache, slot, mini.k, mini.v,
                                          mini.codes, s,
                                          self.iw.cfg.n_layers)
        self._rng, sub = jax.random.split(self._rng)
        tok = int(sample(logits[:, s - 1], sub,
                         temperature=self.temperature)[0])
        self._live[slot] = _Live(request_id=rid, tokens=carry + [tok],
                                 last_token=tok, prompt_len=s,
                                 carried=len(carry))
        self._tokens[slot] = tok
        self._lib.sched_prefill_done(self._sched, slot)
        self._report_token(slot, tok)

    def _advance_chunk(self, slot: int) -> None:
        """Process the next prompt chunk for a slot in chunked prefill.
        On the final chunk, sample the first token and join the decode
        batch (sched_prefill_done)."""
        st = self._chunking[slot]
        total = st['tokens'].shape[1]
        offset = st['done']
        # self.chunk is None when only the prefix cache routed us here:
        # the whole tail is processed as one chunk
        c = min(self.chunk or (total - offset), total - offset)
        chunk = jnp.asarray(st['tokens'][:, offset:offset + c])
        past = self._past_fn(self.iw, self.cache, jnp.int32(slot), offset)
        logits, self.cache = self._chunk_fn(
            self.iw, chunk, self.cache, past, jnp.int32(slot), offset)
        st['done'] = offset + c
        self.last_step_prefill_tokens += c
        if st['done'] < total:
            return
        del self._chunking[slot]
        s, carry, rid = st['true_len'], st['carry'], st['rid']
        # cache length was set to the padded total; correct to true length
        self.cache = dataclasses.replace(
            self.cache, length=self.cache.length.at[slot].set(s))
        self._rng, sub = jax.random.split(self._rng)
        tok = int(sample(logits[:, (s - 1) - offset], sub,
                         temperature=self.temperature)[0])
        self._live[slot] = _Live(request_id=rid, tokens=carry + [tok],
                                 last_token=tok, prompt_len=s,
                                 carried=len(carry))
        self._tokens[slot] = tok
        self._lib.sched_prefill_done(self._sched, slot)
        self._report_token(slot, tok)

    def _report_token(self, slot: int, tok: int) -> None:
        stops = self._stop_ids.get(self._live[slot].request_id)
        eos = 1 if ((self.eos_id is not None and tok == self.eos_id)
                    or (stops is not None and tok in stops)) else 0
        done = self._lib.sched_token_decoded(self._sched, slot,
                                             ctypes.c_int8(eos))
        if done:
            live = self._live.pop(slot)
            self.completions.append(Completion(live.request_id, live.tokens))
            self._prompts.pop(live.request_id, None)
            self._max_new.pop(live.request_id, None)
            self._stop_ids.pop(live.request_id, None)
            if self.paged:
                self.alloc.release(slot)
                self.cache = dataclasses.replace(
                    self.cache,
                    page_indices=self.cache.page_indices.at[slot].set(-1))

    def _grow(self, needed: int) -> None:
        """Grow the contiguous cache to the next bucket covering `needed`."""
        self.cap = min(round_up(needed, DECODE_BUCKET), self.max_len)
        self.cache = grow_cache(self.cache, self.cap,
                                self.iw.cfg.n_layers)
        if self.mesh is not None:
            # pin the canonical shardings after growth (a same-sharding
            # device_put is a no-op)
            from spt_proto_tpu.parallel.infer_sharding import shard_cache
            self.cache = shard_cache(self.mesh, self.cache)

    def _cache_len(self, live: _Live) -> int:
        """Tokens currently in the slot's KV cache: the prefilled context
        plus every decode step taken since (the freshly sampled token is
        written by the NEXT decode step, so it does not count yet)."""
        return live.prompt_len + len(live.tokens) - live.carried - 1

    def _preempt(self, slot: int) -> None:
        """Preemption-by-recompute (vLLM-style): release the slot's pages
        and requeue prompt + generated-so-far as a new front-of-queue
        request with the remaining token budget."""
        live = self._live.pop(slot)
        rid = live.request_id
        self._carry[rid] = list(live.tokens)
        remaining = self._max_new[rid] - len(live.tokens)
        self._lib.sched_requeue(self._sched, slot,
                                len(self._prompts[rid]) + len(live.tokens),
                                remaining)
        self.alloc.release(slot)
        self.cache = dataclasses.replace(
            self.cache,
            page_indices=self.cache.page_indices.at[slot].set(-1))
        self.n_preemptions += 1

    def _grow_pages(self) -> None:
        """Lazily extend page tables so every live slot can write its next
        token. On pool exhaustion, preempt the youngest request (largest
        id) until the oldest ones fit — memory now scales with actual
        sequence lengths instead of n_slots * max_len."""
        order = sorted(self._live.items(), key=lambda kv: kv[1].request_id)
        for slot, live in order:
            if slot not in self._live:      # preempted earlier this round
                continue
            while True:
                try:
                    added = self.alloc.ensure(slot, self._cache_len(live) + 1,
                                              self.page_size)
                except MemoryError:
                    victims = [s for s in self._live if s != slot]
                    victim = max(victims,
                                 key=lambda s: self._live[s].request_id) \
                        if victims else slot
                    self._preempt(victim)
                    if victim == slot:
                        break
                    continue
                if added:
                    table = self.alloc.table(
                        slot, self.cache.page_indices.shape[1])
                    self.cache = dataclasses.replace(
                        self.cache,
                        page_indices=self.cache.page_indices.at[slot].set(
                            jnp.asarray(table)))
                break

    # ------------------------------------------------------------------
    def step(self) -> int:
        """Admit + prefill + one decode step. Returns #tokens produced."""
        self.last_step_prefill_tokens = 0
        slots = (ctypes.c_int32 * self.n_slots)()
        ids = (ctypes.c_int64 * self.n_slots)()
        n_adm = self._lib.sched_admit(self._sched, slots, ids)
        admitted = set()
        for i in range(n_adm):
            self._prefill_slot(int(slots[i]), int(ids[i]))
            admitted.add(int(slots[i]))
        # advance in-flight chunked prefills by exactly one chunk each
        # (slots admitted this step already got their first chunk)
        for slot in list(self._chunking):
            if slot not in admitted:
                self._advance_chunk(slot)
        if self.paged:
            self._grow_pages()

        mask = (ctypes.c_int8 * self.n_slots)()
        n_dec = self._lib.sched_decode_mask(self._sched, mask)
        if n_dec == 0:
            return 0
        active = np.frombuffer(mask, dtype=np.int8).astype(bool).copy()
        if self.spec_k:
            return self._spec_round(active)
        if not self.paged and self._live:
            need = max(self._cache_len(l) for l in self._live.values()) + 1
            if need > self.cap and self.cap < self.max_len:
                self._grow(need)
        self._rng, sub = jax.random.split(self._rng)
        # decode + inactive-lane masking + sampling run as one jitted
        # dispatch over the donated cache (in-place update, and only the
        # sampled token ids [B] cross back to the host)
        toks, self.cache = self._decode_fn(
            self.iw, jnp.asarray(self._tokens), self.cache,
            jnp.asarray(active), sub)
        toks = np.asarray(toks)
        produced = 0
        for slot in range(self.n_slots):
            if not active[slot] or slot not in self._live:
                continue
            tok = int(toks[slot])
            self._live[slot].tokens.append(tok)
            self._live[slot].last_token = tok
            self._tokens[slot] = tok
            self._report_token(slot, tok)
            produced += 1
        return produced

    def _spec_round(self, active: np.ndarray) -> int:
        """One speculative round over the active decode batch: n-gram
        proposals per slot (host-side, over prompt + generated), ONE
        verify dispatch, per-slot acceptance + emission. A slot that
        completes mid-block (budget or eos) drops the rest of its block;
        its cache columns beyond the emitted tokens are dead and get
        overwritten by the next admission's prefill splice."""
        from spt_proto_tpu.inference.speculative import ngram_propose
        lives = [(s, l) for s, l in self._live.items() if active[s]]
        if not lives:
            return 0
        max_need = max(self._cache_len(l) for _, l in lives)
        # near max_len the block shrinks so writes never exceed capacity
        kk_r = min(self.spec_k + 1, self.max_len - max_need)
        k_r = kk_r - 1
        if max_need + kk_r > self.cap and self.cap < self.max_len:
            self._grow(max_need + kk_r)
        stream = np.zeros((self.n_slots, self.max_len), np.int64)
        lens = np.zeros((self.n_slots,), np.int64)
        for slot, live in lives:
            seq = (self._prompts[live.request_id] + live.tokens
                   )[-self.max_len:]
            stream[slot, :len(seq)] = seq
            lens[slot] = len(seq)
        props = (ngram_propose(stream, lens, k_r) if k_r > 0
                 else np.zeros((self.n_slots, 0), np.int64))
        block = jnp.concatenate(
            [jnp.asarray(self._tokens)[:, None],
             jnp.asarray(props, jnp.int32)], axis=1)
        self._rng, sub = jax.random.split(self._rng)
        n_acc, corr, self.cache = _verify_and_accept(
            self.iw, block, self.cache, jnp.asarray(active), sub,
            temperature=self.temperature)
        n_acc, corr = np.asarray(n_acc), np.asarray(corr)
        produced = 0
        self.spec_stats['rounds'] += 1
        for slot, _ in lives:
            self.spec_stats['proposed'] += k_r
            self.spec_stats['accepted'] += int(n_acc[slot])
            emitted = list(props[slot, :n_acc[slot]]) + [int(corr[slot])]
            for tok in emitted:
                live = self._live.get(slot)
                if live is None:
                    break               # completed mid-block
                tok = int(tok)
                live.tokens.append(tok)
                live.last_token = tok
                self._tokens[slot] = tok
                self._report_token(slot, tok)
                produced += 1
            if slot in self._live:
                self._tokens[slot] = int(corr[slot])
        return produced

    def live_progress(self) -> Dict[int, List[int]]:
        """Snapshot of in-flight generations: {request_id: tokens so far}
        (prompt excluded; includes tokens carried across preemptions).
        Completed requests appear in `completions`, not here."""
        return {l.request_id: list(l.tokens) for l in self._live.values()}

    def run_until_done(self, max_steps: int = 10_000) -> List[Completion]:
        steps = 0
        while (self.num_active or self.queue_depth) and steps < max_steps:
            self.step()
            steps += 1
        out, self.completions = self.completions, []
        return out
