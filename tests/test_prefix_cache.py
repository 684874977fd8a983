"""Prefix caching in the continuous batching engine: requests sharing a
TILE-aligned prompt prefix (system prompt / few-shot preamble) reuse its
KV from an LRU store and only prefill their tail.

North-star serving addition (no reference counterpart — the reference has
no serving path, SURVEY §0). The reuse path composes the existing
primitives: _splice_slot writes the stored prefix mini-cache into the
slot, then the tail rides prefill_chunk's offset contract."""
import jax
import jax.numpy as jnp
import numpy as np

from spt_proto_tpu.config import tiny_config
from spt_proto_tpu.inference.batching import ContinuousBatchingEngine
from spt_proto_tpu.inference.engine import TILE, generate
from spt_proto_tpu.inference.weights import InferenceWeights
from spt_proto_tpu.tuning import surgery


def _model(seed=3, **cfg_kw):
    cfg = tiny_config('opt', max_length=512, **cfg_kw).replace(
        dtype=jnp.float32)
    params = surgery.init_params(cfg, jax.random.PRNGKey(seed))
    return cfg, InferenceWeights.from_params(cfg, params, dtype=jnp.float32)


def test_pinned_prefix_matches_generate():
    """Explicitly pinned shared prefix: every request hits, completions
    equal isolated whole-prompt generate()."""
    cfg, iw = _model()
    rng = np.random.RandomState(11)
    shared = list(rng.randint(1, cfg.vocab_size, size=TILE))
    tails = [list(rng.randint(1, cfg.vocab_size, size=n))
             for n in (9, 17, 4)]
    eng = ContinuousBatchingEngine(iw, n_slots=2, max_len=384,
                                   prefill_bucket=16, prefix_cache=True)
    assert eng.cache_prefix(shared) == TILE
    prompts = [shared + t for t in tails]
    rids = [eng.submit(p, max_new_tokens=5) for p in prompts]
    completions = {c.request_id: c.tokens for c in eng.run_until_done()}
    assert set(completions) == set(rids)
    assert eng.prefix_hits == 3
    assert eng.prefix_tokens_reused == 3 * TILE
    for p, rid in zip(prompts, rids):
        ref = generate(iw, jnp.asarray([p], jnp.int32), 5, max_len=384)
        ref_new = list(np.asarray(ref)[0, len(p):])
        assert completions[rid] == ref_new, (completions[rid], ref_new)


def test_automatic_prefix_insertion_and_reuse():
    """No explicit pin: the first request's TILE-aligned head is inserted
    automatically; a later request sharing it prefills only its tail."""
    cfg, iw = _model(seed=4)
    rng = np.random.RandomState(12)
    shared = list(rng.randint(1, cfg.vocab_size, size=2 * TILE))
    p1 = shared + list(rng.randint(1, cfg.vocab_size, size=7))
    p2 = shared + list(rng.randint(1, cfg.vocab_size, size=12))
    eng = ContinuousBatchingEngine(iw, n_slots=2, max_len=448,
                                   prefill_bucket=16, prefix_cache=True)
    r1 = eng.submit(p1, max_new_tokens=4)
    done1 = {c.request_id: c.tokens for c in eng.run_until_done()}
    assert eng.prefix_hits == 0 and len(eng._prefix_store) == 1
    r2 = eng.submit(p2, max_new_tokens=4)
    done2 = {c.request_id: c.tokens for c in eng.run_until_done()}
    assert eng.prefix_hits == 1
    assert eng.prefix_tokens_reused == 2 * TILE
    # prefill work for request 2 was only its (padded) tail
    for p, rid, done in ((p1, r1, done1), (p2, r2, done2)):
        ref = generate(iw, jnp.asarray([p], jnp.int32), 4, max_len=448)
        ref_new = list(np.asarray(ref)[0, len(p):])
        assert done[rid] == ref_new, (done[rid], ref_new)


def test_prefix_cache_lru_eviction():
    cfg, iw = _model(seed=5)
    rng = np.random.RandomState(13)
    eng = ContinuousBatchingEngine(iw, n_slots=1, max_len=384,
                                   prefill_bucket=16, prefix_cache=True,
                                   prefix_cache_entries=2)
    keys = []
    for _ in range(3):
        toks = list(rng.randint(1, cfg.vocab_size, size=TILE))
        assert eng.cache_prefix(toks) == TILE
        keys.append(tuple(toks))
    assert len(eng._prefix_store) == 2
    assert keys[0] not in eng._prefix_store      # oldest evicted
    assert keys[1] in eng._prefix_store and keys[2] in eng._prefix_store
    # short prefixes are not cacheable
    assert eng.cache_prefix([1, 2, 3]) == 0


def test_prefix_cache_quantized_kv():
    """Prefix reuse over the int8 KV cache (scale pools spliced too)."""
    cfg, iw = _model(seed=6)
    rng = np.random.RandomState(14)
    shared = list(rng.randint(1, cfg.vocab_size, size=TILE))
    prompts = [shared + list(rng.randint(1, cfg.vocab_size, size=n))
               for n in (6, 11)]

    def run(prefix_on):
        eng = ContinuousBatchingEngine(iw, n_slots=2, max_len=384,
                                       prefill_bucket=16,
                                       quantized_kv=True,
                                       prefix_cache=prefix_on)
        if prefix_on:
            eng.cache_prefix(shared)
        rids = [eng.submit(p, max_new_tokens=4) for p in prompts]
        done = {c.request_id: c.tokens for c in eng.run_until_done()}
        return [done[r] for r in rids], eng

    plain, _ = run(False)
    cached, eng = run(True)
    assert eng.prefix_hits == 2
    assert cached == plain, (cached, plain)


def test_prefix_cache_sparse_smoke():
    """Sparse (PQ) config: splices code tiles too; completions have the
    right shape and the store is exercised. Exact equality with one-shot
    prefill is not contracted for sparse_v2 (prefill_chunk's per-row
    selection contract, same as chunked prefill)."""
    cfg = tiny_config('opt', max_length=512).replace(
        dtype=jnp.float32, attention='sparse_v2', d_codeword=4,
        n_codewords=8)
    cfg.validate()
    params = surgery.init_params(cfg, jax.random.PRNGKey(7))
    iw = InferenceWeights.from_params(cfg, params, dtype=jnp.float32)
    rng = np.random.RandomState(15)
    shared = list(rng.randint(1, cfg.vocab_size, size=TILE))
    prompts = [shared + list(rng.randint(1, cfg.vocab_size, size=n))
               for n in (8, 5)]
    eng = ContinuousBatchingEngine(iw, n_slots=2, max_len=384,
                                   prefill_bucket=16, prefix_cache=True)
    eng.cache_prefix(shared)
    rids = [eng.submit(p, max_new_tokens=4) for p in prompts]
    completions = {c.request_id: c.tokens for c in eng.run_until_done()}
    assert set(completions) == set(rids)
    assert all(len(t) == 4 for t in completions.values())
    assert eng.prefix_hits == 2


def test_prefix_cache_composes_with_chunked_prefill():
    """prefix_cache + prefill_chunk: a hit's tail longer than one chunk is
    split across engine steps (offset starts at the prefix length)."""
    cfg, iw = _model(seed=8)
    rng = np.random.RandomState(16)
    shared = list(rng.randint(1, cfg.vocab_size, size=TILE))
    p = shared + list(rng.randint(1, cfg.vocab_size, size=2 * TILE + 9))
    eng = ContinuousBatchingEngine(iw, n_slots=1, max_len=512,
                                   prefill_bucket=16, prefix_cache=True,
                                   prefill_chunk=TILE)
    eng.cache_prefix(shared)
    rid = eng.submit(p, max_new_tokens=3)
    max_step_prefill = 0
    steps = 0
    while (eng.num_active or eng.queue_depth) and steps < 50:
        eng.step()
        steps += 1
        max_step_prefill = max(max_step_prefill,
                               eng.last_step_prefill_tokens)
    done = {c.request_id: c.tokens for c in eng.completions}
    assert eng.prefix_hits == 1
    assert max_step_prefill <= TILE, max_step_prefill
    ref = generate(iw, jnp.asarray([p], jnp.int32), 3, max_len=512)
    ref_new = list(np.asarray(ref)[0, len(p):])
    assert done[rid] == ref_new, (done[rid], ref_new)
