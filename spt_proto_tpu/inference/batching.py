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
import os
import subprocess
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from spt_proto_tpu.inference.engine import (KVCache, decode_step, prefill,
                                            sample)
from spt_proto_tpu.inference.weights import InferenceWeights

_RUNTIME_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), 'runtime')


def _load_native():
    lib_path = os.path.join(_RUNTIME_DIR, 'libsptrt.so')
    if not os.path.exists(lib_path):
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
    return lib


_LIB = None


def native_scheduler_lib():
    global _LIB
    if _LIB is None:
        _LIB = _load_native()
    return _LIB


@dataclasses.dataclass
class _Live:
    request_id: int
    tokens: List[int]
    last_token: int


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
                 n_pages: Optional[int] = None, seed: int = 0):
        self.iw = iw
        self.n_slots = n_slots
        self.max_len = max_len
        self.bucket = prefill_bucket
        self.temperature = temperature
        self.eos_id = eos_id
        self.paged = paged
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
                                             dtype=iw.cfg.dtype)
            self._prefill_fn = jax.jit(paged_prefill)
            self._decode_fn = jax.jit(paged_decode_step)
        else:
            self.cache = KVCache.create(iw.cfg, n_slots, max_len,
                                        dtype=iw.cfg.dtype)
            self._prefill_fn = jax.jit(prefill)
            self._decode_fn = jax.jit(decode_step)
        self._prompts: Dict[int, List[int]] = {}
        self._live: Dict[int, _Live] = {}       # slot -> live state
        self._tokens = np.zeros((n_slots,), np.int32)
        self._rng = jax.random.PRNGKey(seed)
        self.completions: List[Completion] = []

    def __del__(self):
        try:
            self._lib.sched_destroy(self._sched)
        except Exception:
            pass

    # ------------------------------------------------------------------
    def submit(self, prompt_tokens: List[int],
               max_new_tokens: int = 32) -> int:
        rid = self._lib.sched_submit(self._sched, len(prompt_tokens),
                                     max_new_tokens)
        if rid < 0:
            raise ValueError('request cannot fit in max_len')
        self._prompts[rid] = list(prompt_tokens)
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

    def _prefill_slot(self, slot: int, rid: int) -> None:
        prompt = self._prompts.pop(rid)
        s = len(prompt)
        sb = min(self._bucketed(s), self.max_len)
        padded = np.zeros((1, sb), np.int32)
        padded[0, :s] = prompt
        if self.paged:
            from spt_proto_tpu.inference.paged import PagedKVCache
            # allocate pages for the whole request up front (table is then
            # fixed for the slot's lifetime); release returns them
            self.alloc.ensure(slot, self.max_len, self.page_size)
            table = self.alloc.table(slot,
                                     self.cache.page_indices.shape[1])
            pi = self.cache.page_indices.at[slot].set(jnp.asarray(table))
            mini = PagedKVCache(self.cache.k_pages, self.cache.v_pages,
                                pi[slot][None], jnp.zeros((1,), jnp.int32))
            logits, mini = self._prefill_fn(self.iw, jnp.asarray(padded),
                                            mini)
            self.cache = PagedKVCache(
                k_pages=mini.k_pages, v_pages=mini.v_pages,
                page_indices=pi,
                length=self.cache.length.at[slot].set(s))
        else:
            mini = KVCache.create(self.iw.cfg, 1, self.max_len,
                                  dtype=self.cache.k.dtype)
            logits, mini = self._prefill_fn(self.iw, jnp.asarray(padded),
                                            mini)
            # splice slot cache; true length is s (not the padded sb)
            self.cache = KVCache(
                k=self.cache.k.at[:, slot].set(mini.k[:, 0]),
                v=self.cache.v.at[:, slot].set(mini.v[:, 0]),
                codes=self.cache.codes.at[:, slot].set(mini.codes[:, 0]),
                length=self.cache.length.at[slot].set(s))
        self._rng, sub = jax.random.split(self._rng)
        tok = int(sample(logits[:, s - 1], sub,
                         temperature=self.temperature)[0])
        self._live[slot] = _Live(request_id=rid, tokens=[tok],
                                 last_token=tok)
        self._tokens[slot] = tok
        self._lib.sched_prefill_done(self._sched, slot)
        self._report_token(slot, tok)

    def _report_token(self, slot: int, tok: int) -> None:
        eos = 1 if (self.eos_id is not None and tok == self.eos_id) else 0
        done = self._lib.sched_token_decoded(self._sched, slot,
                                             ctypes.c_int8(eos))
        if done:
            live = self._live.pop(slot)
            self.completions.append(Completion(live.request_id, live.tokens))
            if self.paged:
                self.alloc.release(slot)
                self.cache = dataclasses.replace(
                    self.cache,
                    page_indices=self.cache.page_indices.at[slot].set(-1))

    # ------------------------------------------------------------------
    def step(self) -> int:
        """Admit + prefill + one decode step. Returns #tokens produced."""
        slots = (ctypes.c_int32 * self.n_slots)()
        ids = (ctypes.c_int64 * self.n_slots)()
        n_adm = self._lib.sched_admit(self._sched, slots, ids)
        for i in range(n_adm):
            self._prefill_slot(int(slots[i]), int(ids[i]))

        mask = (ctypes.c_int8 * self.n_slots)()
        n_dec = self._lib.sched_decode_mask(self._sched, mask)
        if n_dec == 0:
            return 0
        active = np.frombuffer(mask, dtype=np.int8).astype(bool).copy()
        logits, cache = self._decode_fn(
            self.iw, jnp.asarray(self._tokens), self.cache)
        # only advance the cache for active slots (inactive lanes computed
        # garbage; mask their length update and keep old K/V rows)
        act = jnp.asarray(active)
        if self.paged:
            from spt_proto_tpu.inference.paged import PagedKVCache
            # pages are disjoint per slot, so only lengths need masking:
            # an inactive-but-owned slot rewrote its own current position
            # (harmless, length held back), and slots with released tables
            # (-1) wrote into the cache's reserved sink page.
            self.cache = PagedKVCache(
                k_pages=cache.k_pages, v_pages=cache.v_pages,
                page_indices=self.cache.page_indices,
                length=jnp.where(act, cache.length, self.cache.length))
        else:
            self.cache = KVCache(
                k=jnp.where(act[None, :, None, None, None], cache.k,
                            self.cache.k),
                v=jnp.where(act[None, :, None, None, None], cache.v,
                            self.cache.v),
                codes=jnp.where(act[None, :, None, None, None], cache.codes,
                                self.cache.codes),
                length=jnp.where(act, cache.length, self.cache.length))
        self._rng, sub = jax.random.split(self._rng)
        toks = np.asarray(sample(logits, sub, temperature=self.temperature))
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

    def run_until_done(self, max_steps: int = 10_000) -> List[Completion]:
        steps = 0
        while (self.num_active or self.queue_depth) and steps < max_steps:
            self.step()
            steps += 1
        out, self.completions = self.completions, []
        return out
