"""Speculative decoding: draft k tokens cheaply, verify them with ONE
target-model block forward, keep the longest accepted prefix (+1
correction/bonus token), roll both caches back by lowering lengths.

North-star addition — the reference has no inference path at all
(SURVEY §0). TPU-native design points:

  * Verification is engine.verify_step: a K=k+1-column block forward
    whose attention mirrors decode_step per query position, so greedy
    speculative output EXACTLY matches greedy vanilla generate()
    (tests/test_speculative.py). One block forward replaces up to k+1
    sequential decode steps — the win is the per-step kernel-entry +
    weight-read floor (docs/PERF.md "decode floor"), which dominates
    decode at small batch.
  * Rollback is free by construction: the tile-major KV cache masks
    every attention path by position < length, so rejecting tokens is
    `length -= n_rejected`; stale columns are overwritten by the next
    append (docs/ROADMAP.md speculative item).
  * Two draft sources: a smaller draft MODEL (its own KVCache, decoded
    with the same fused decode kernel), or model-free PROMPT-LOOKUP
    (n-gram) drafting that proposes the continuation of the most recent
    matching n-gram in the already-generated stream — zero extra
    weights, pure host-side numpy between steps.

Two acceptance regimes:
  * temperature 0 (greedy): acceptance is exact token match — the
    output EQUALS plain greedy generate() token for token.
  * temperature > 0: standard draft/target rejection sampling
    (spec_accept) over temperature/top-k/top-p-warped distributions —
    the emitted tokens are distributed exactly as ancestral sampling
    from the warped target (verified distributionally in tests).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from spt_proto_tpu.inference.engine import (
    DECODE_BUCKET, KVCache, decode_step, grow_cache, prefill, round_up,
    sample, verify_step, warp_logits)
from spt_proto_tpu.inference.weights import InferenceWeights


def spec_accept(p_logits: jax.Array, q_logits: Optional[jax.Array],
                props: jax.Array, rng: jax.Array, *, temperature: float,
                top_k: Optional[int] = None, top_p: Optional[float] = None
                ) -> Tuple[jax.Array, jax.Array]:
    """Stochastic speculative acceptance (the standard draft/target
    rejection-sampling rule): proposal x_i ~ q_i is accepted with
    probability min(1, p_i(x_i)/q_i(x_i)); the first rejection resamples
    from norm(max(p_i - q_i, 0)); if all k are accepted the extra token
    is a plain sample from p_k. The emitted sequence is then distributed
    EXACTLY as ancestral sampling from the (warped) target — the
    lossless-acceleration guarantee, tested distributionally in
    tests/test_speculative.py.

    p_logits [B, k+1, V] target block logits; q_logits [B, k, V] draft
    logits, or None for deterministic (point-mass) drafts like n-gram
    lookup — the rule then degenerates to accept-with-prob-p_i(x_i) and
    a zeroed-proposal residual. Both sides are warped with the SAME
    temperature/top_k/top_p. Returns (n_acc [B], correction token [B]).
    """
    b, k = props.shape
    p = jax.nn.softmax(warp_logits(p_logits, temperature=temperature,
                                   top_k=top_k, top_p=top_p), axis=-1)
    if q_logits is None:
        q = jax.nn.one_hot(props, p.shape[-1], dtype=jnp.float32)
    else:
        q = jax.nn.softmax(warp_logits(q_logits, temperature=temperature,
                                       top_k=top_k, top_p=top_p), axis=-1)
    p_i = jnp.take_along_axis(p[:, :k], props[..., None], -1)[..., 0]
    q_i = jnp.take_along_axis(q, props[..., None], -1)[..., 0]
    rng_u, rng_c = jax.random.split(rng)
    u = jax.random.uniform(rng_u, (b, k))
    acc = u < jnp.minimum(1.0, p_i / jnp.maximum(q_i, 1e-20))
    n_acc = jnp.cumprod(acc.astype(jnp.int32), axis=1).sum(axis=1)
    # correction at position n_acc: residual for a rejection, plain
    # target sample for the all-accepted bonus (q row k is zero)
    q_pad = jnp.concatenate([q, jnp.zeros_like(q[:, :1])], axis=1)
    p_star = jnp.take_along_axis(p, n_acc[:, None, None], 1)[:, 0]
    q_star = jnp.take_along_axis(q_pad, n_acc[:, None, None], 1)[:, 0]
    resid = jnp.maximum(p_star - q_star, 0.0)
    s = resid.sum(axis=-1, keepdims=True)
    resid = jnp.where(s > 1e-12, resid / s, p_star)
    tok = jax.random.categorical(
        rng_c, jnp.log(jnp.maximum(resid, 1e-38)), axis=-1
        ).astype(jnp.int32)
    return n_acc, tok


def ngram_propose(stream: np.ndarray, lens: np.ndarray, k: int,
                  max_n: int = 3) -> np.ndarray:
    """Prompt-lookup drafting: for each row, find the most recent earlier
    occurrence of the longest suffix n-gram (n = max_n..1) of
    stream[i, :lens[i]] and propose the k tokens that followed it.
    Rows with no match (or empty stream) repeat the last token. Proposals
    are host-side guesses — verification makes any proposal safe."""
    b = stream.shape[0]
    out = np.zeros((b, k), np.int64)
    for i in range(b):
        s = stream[i, :lens[i]]
        if len(s) == 0:
            continue
        got = False
        for n in range(min(max_n, len(s) - 1), 0, -1):
            tail = s[-n:]
            # most recent occurrence strictly before the suffix itself:
            # windows of width n over s[:-1] (so a continuation exists)
            win = np.lib.stride_tricks.sliding_window_view(s[:-1], n)
            hits = np.nonzero((win == tail).all(axis=1))[0]
            if len(hits):
                j = int(hits[-1])
                cont = s[j + n:j + n + k]
                out[i, :len(cont)] = cont
                if len(cont) < k:
                    out[i, len(cont):] = s[-1]
                got = True
                break
        if not got:
            out[i] = s[-1]
    return out


def generate_speculative(
        iw: InferenceWeights, prompts: jax.Array, max_new_tokens: int, *,
        draft: Optional[InferenceWeights] = None, k: int = 4,
        max_len: Optional[int] = None, eos_id: Optional[int] = None,
        lengths: Optional[jax.Array] = None, quantized_kv: bool = False,
        ngram_max_n: int = 3, temperature: float = 0.0,
        top_k: Optional[int] = None, top_p: Optional[float] = None,
        rng: Optional[jax.Array] = None,
        ) -> Tuple[jax.Array, dict]:
    """Speculative generate. prompts [B, S0] -> (tokens
    [B, S0 + max_new_tokens], stats).

    draft=None uses prompt-lookup (n-gram) drafting; otherwise `draft`
    is a (smaller) InferenceWeights whose continuations propose the
    block. temperature 0 (greedy): output is exactly greedy generate()'s
    for the same `max_len` (give both the same max_len for bit-matching
    runs: the cache bucket size participates in sparse tile selection).
    temperature > 0: draft proposals are SAMPLED (same
    temperature/top_k/top_p warps) and accepted by the standard
    rejection-sampling rule (spec_accept) — emitted tokens are
    distributed exactly as sampling from the warped target model.

    stats: {'rounds', 'proposed', 'accepted', 'acceptance'} — acceptance
    is accepted/proposed over live rows.
    """
    assert k >= 1
    stochastic = temperature > 0.0
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    warps = dict(temperature=temperature, top_k=top_k, top_p=top_p)
    b, s0 = prompts.shape
    kk = k + 1
    # room for a full verify block past the last committed token
    limit = max_len or round_up(s0 + max_new_tokens + kk, DECODE_BUCKET)
    cap = min(max(s0, round_up(s0 + kk, DECODE_BUCKET)), max(limit, s0))
    cache = KVCache.create(iw.cfg, b, cap, dtype=iw.cfg.dtype,
                           quantized=quantized_kv)
    prefill_fn = jax.jit(prefill, donate_argnums=(2,))
    verify_fn = jax.jit(verify_step, donate_argnums=(2,))
    logits, cache = prefill_fn(iw, prompts, cache)
    if lengths is not None:
        lengths = jnp.asarray(lengths, jnp.int32)
        # .copy(): the cache is donated — never delete the caller's array
        cache = dataclasses.replace(cache, length=lengths.copy())
        last = jnp.take_along_axis(
            logits, (lengths - 1)[:, None, None], axis=1)[:, 0]
        np_lens = np.asarray(lengths)
    else:
        last = logits[:, -1]
        np_lens = np.full((b,), s0)
    if draft is not None:
        dcap = cap
        dcache = KVCache.create(draft.cfg, b, dcap, dtype=draft.cfg.dtype,
                                quantized=quantized_kv)
        dprefill_fn = jax.jit(prefill, donate_argnums=(2,))
        dstep_fn = jax.jit(decode_step, donate_argnums=(2,))
        _, dcache = dprefill_fn(draft, prompts, dcache)
        if lengths is not None:
            # distinct buffer from the target cache's (both donate)
            dcache = dataclasses.replace(dcache, length=lengths.copy())

    rng, sub = jax.random.split(rng)
    pending = sample(last, sub, **warps)                    # [B]
    # host-side stream: prompt + emitted tokens (drives n-gram drafting
    # and the output assembly — emission counts differ per row)
    total = s0 + max_new_tokens
    stream = np.zeros((b, total + kk), np.int64)
    stream[:, :s0] = np.asarray(prompts)
    cursor = np_lens.copy()                  # next write index per row
    done = np.zeros((b,), bool)
    stats = dict(rounds=0, proposed=0, accepted=0)

    def emit(i: int, toks: np.ndarray) -> None:
        nonlocal done
        for t in toks:
            if done[i] or cursor[i] >= np_lens[i] + max_new_tokens:
                return
            stream[i, cursor[i]] = t
            cursor[i] += 1
            if eos_id is not None and t == eos_id:
                done[i] = True

    np_pending = np.asarray(pending)
    for i in range(b):
        emit(i, np_pending[i:i + 1])         # the prefill-sampled token

    assert limit >= s0 + max_new_tokens, (limit, s0, max_new_tokens)
    while True:
        live = ~done & (cursor < np_lens + max_new_tokens)
        if not live.any():
            break
        stats['rounds'] += 1
        max_pos = int(np.asarray(cache.length).max())
        # near max_len the block shrinks so writes never exceed capacity
        # (a width-1 block is a plain decode step through verify_step)
        kk_r = min(kk, limit - max_pos)
        k_r = kk_r - 1
        if max_pos + kk_r > cap and cap < limit:
            cap = min(round_up(max_pos + kk_r, DECODE_BUCKET), limit)
            cache = grow_cache(cache, cap, iw.cfg.n_layers)
        # ---- draft k_r proposals
        d_logits = None
        if draft is not None and k_r > 0:
            if max_pos + kk_r > dcap:
                dcap = min(round_up(max_pos + kk_r, DECODE_BUCKET), limit)
                dcache = grow_cache(dcache, dcap, draft.cfg.n_layers)
            d_toks = [pending]
            dls = []
            for _ in range(k_r):
                dl, dcache = dstep_fn(draft, d_toks[-1], dcache)
                dls.append(dl)
                rng, sub = jax.random.split(rng)
                d_toks.append(sample(dl, sub, **warps))
            # extra append so the draft cache also covers p_k (its
            # logits are unused); rollback below re-aligns both caches
            _, dcache = dstep_fn(draft, d_toks[-1], dcache)
            props = jnp.stack(d_toks[1:], axis=1)           # [B, k_r]
            if stochastic:
                d_logits = jnp.stack(dls, axis=1)           # [B, k_r, V]
        elif k_r > 0:
            props = jnp.asarray(
                ngram_propose(stream, cursor, k_r, max_n=ngram_max_n),
                jnp.int32)
        else:
            props = jnp.zeros((b, 0), jnp.int32)
        # ---- one block verify on [pending, p_1..p_k]
        block = jnp.concatenate([pending[:, None], props], axis=1)
        vlogits, cache = verify_fn(iw, block, cache)
        # pre-verify lengths, recovered from the (donated) cache's new
        # lengths — reading them before the call would touch a deleted
        # buffer after donation
        len0 = cache.length - kk_r                          # [B]
        if stochastic:
            rng, sub = jax.random.split(rng)
            n_acc, corr = spec_accept(vlogits, d_logits, props, sub,
                                      **warps)
        else:
            t_hat = jnp.argmax(vlogits, axis=-1
                               ).astype(jnp.int32)          # [B, K]
            match = (t_hat[:, :k_r] == props).astype(jnp.int32)
            n_acc = jnp.cumprod(match, axis=1).sum(axis=1)  # [B] in [0,k]
            corr = t_hat[jnp.arange(b), n_acc]
        # ---- rollback: committed-in-cache = old + pending + accepted;
        # finished rows roll back fully so their lengths never grow
        live_j = jnp.asarray(live)
        new_len = jnp.where(live_j, len0 + 1 + n_acc, len0)
        cache = dataclasses.replace(cache, length=new_len)
        if draft is not None:
            # distinct buffer: both loops donate their cache, and a
            # shared length array would be donated twice
            dcache = dataclasses.replace(dcache, length=new_len.copy())
        # ---- emit accepted prefix + the correction/bonus token
        np_props = np.asarray(props)
        np_corr = np.asarray(corr)
        np_acc = np.asarray(n_acc)
        for i in range(b):
            if not live[i]:
                continue
            emit(i, np.concatenate(
                [np_props[i, :np_acc[i]], np_corr[i:i + 1]]))
            stats['proposed'] += k_r
            stats['accepted'] += int(np_acc[i])
        pending = corr
    stats['acceptance'] = (stats['accepted'] / stats['proposed']
                           if stats['proposed'] else 0.0)
    # output contract matches generate(): prompts at [:, :s0] (padded as
    # given), generated token j at [:, s0 + j] for every row
    out = np.zeros((b, total), np.int64)
    out[:, :s0] = np.asarray(prompts)
    for i in range(b):
        n_emit = cursor[i] - np_lens[i]
        out[i, s0:s0 + n_emit] = stream[i, np_lens[i]:cursor[i]]
        if eos_id is not None and n_emit and done[i]:
            out[i, s0 + n_emit:] = eos_id     # pad finished rows
    return jnp.asarray(out, jnp.int32), stats
