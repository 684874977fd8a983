"""HTTP serving front-end: concurrent /v1/completions requests batch
through one engine thread and return the same greedy tokens as isolated
generate(); /stats and /health report engine state."""
import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spt_proto_tpu.config import tiny_config
from spt_proto_tpu.inference.batching import ContinuousBatchingEngine
from spt_proto_tpu.inference.engine import generate
from spt_proto_tpu.inference.server import make_server
from spt_proto_tpu.inference.weights import InferenceWeights
from spt_proto_tpu.tuning import surgery


@pytest.fixture(scope='module')
def served():
    cfg = tiny_config('opt').replace(dtype=jnp.float32)
    params = surgery.init_params(cfg, jax.random.PRNGKey(0))
    iw = InferenceWeights.from_params(cfg, params, dtype=jnp.float32)
    eng = ContinuousBatchingEngine(iw, n_slots=2, max_len=64,
                                   prefill_bucket=16)
    server, frontend = make_server(eng, port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    url = f'http://{server.server_address[0]}:{server.server_address[1]}'
    yield cfg, iw, url
    server.shutdown()
    frontend.shutdown()


def _post(url, payload):
    req = urllib.request.Request(
        url + '/v1/completions', data=json.dumps(payload).encode(),
        headers={'Content-Type': 'application/json'})
    try:
        with urllib.request.urlopen(req, timeout=300) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_health_and_unknown(served):
    _, _, url = served
    with urllib.request.urlopen(url + '/health', timeout=30) as r:
        assert json.loads(r.read()) == {'ok': True}
    status, body = _post(url, {'prompt': 'text without tokenizer'})
    assert status == 400 and 'tokenizer' in body['error']
    status, body = _post(url, {})
    assert status == 400


def test_concurrent_completions_match_generate(served):
    cfg, iw, url = served
    rng = np.random.RandomState(2)
    prompts = [list(map(int, rng.randint(1, cfg.vocab_size, size=n)))
               for n in (5, 9, 3, 7)]
    results = [None] * len(prompts)

    def worker(i):
        status, body = _post(url, {'prompt': prompts[i], 'max_tokens': 6})
        assert status == 200, body
        results[i] = body['tokens']

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(len(prompts))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    for p, got in zip(prompts, results):
        ref = generate(iw, jnp.asarray([p], jnp.int32), 6, max_len=64)
        ref_new = list(np.asarray(ref)[0, len(p):])
        assert got == ref_new, (got, ref_new)

    with urllib.request.urlopen(url + '/stats', timeout=30) as r:
        stats = json.loads(r.read())
    assert stats['served'] >= len(prompts)
    assert stats['active'] == 0 and stats['queued'] == 0


def test_streaming_completion(served):
    """stream=true yields incremental NDJSON token lines whose
    concatenation equals the non-streamed greedy completion."""
    cfg, iw, url = served
    prompt = [4, 11, 7, 2, 9]
    _, whole = _post(url, {'prompt': prompt, 'max_tokens': 6})
    req = urllib.request.Request(
        url + '/v1/completions',
        data=json.dumps({'prompt': prompt, 'max_tokens': 6,
                         'stream': True}).encode())
    lines = []
    with urllib.request.urlopen(req, timeout=300) as r:
        assert r.headers['Content-Type'] == 'application/x-ndjson'
        for raw in r:
            lines.append(json.loads(raw))
    assert lines[-1]['done'] is True
    streamed = [t for ln in lines[:-1] for t in ln['tokens']]
    assert streamed == whole['tokens'], (streamed, whole['tokens'])
    assert lines[-1]['n_tokens'] == len(streamed)
    # (line granularity is timing-dependent — the tiny model can decode
    # the whole budget between handler wakeups; incrementality itself is
    # covered deterministically by test_live_progress_grows)


def test_live_progress_grows():
    """engine.live_progress() (the streaming source) exposes tokens as
    they decode, before the request completes."""
    cfg = tiny_config('opt').replace(dtype=jnp.float32)
    params = surgery.init_params(cfg, jax.random.PRNGKey(1))
    iw = InferenceWeights.from_params(cfg, params, dtype=jnp.float32)
    eng = ContinuousBatchingEngine(iw, n_slots=1, max_len=64,
                                   prefill_bucket=16)
    rid = eng.submit([3, 1, 4, 1, 5], max_new_tokens=5)
    eng.step()       # prefill (samples token 1) + one decode (token 2)
    snap1 = eng.live_progress()
    assert list(snap1) == [rid] and len(snap1[rid]) == 2
    eng.step()
    snap2 = eng.live_progress()
    assert len(snap2[rid]) == 3
    assert snap2[rid][:2] == snap1[rid]
    done = eng.run_until_done()
    assert done[0].tokens[:3] == snap2[rid]
    assert eng.live_progress() == {}


def test_oversized_request_400_and_server_survives(served):
    """An unschedulable request gets 400 (not a hung server): both the
    do_POST early check and the engine-thread submit guard keep the loop
    alive for subsequent requests."""
    cfg, iw, url = served
    status, body = _post(url, {'prompt': [1, 2, 3], 'max_tokens': 1000})
    assert status == 400 and 'max_len' in body['error']
    # the server still serves normal requests afterwards
    status, body = _post(url, {'prompt': [4, 5, 6], 'max_tokens': 3})
    assert status == 200 and len(body['tokens']) == 3


def test_frontend_engine_error_resolves_ticket():
    """engine.submit raising inside _loop must fail only that ticket (as
    ValueError from wait()), not kill the engine thread."""
    from spt_proto_tpu.inference.server import ServingFrontend
    cfg = tiny_config('opt').replace(dtype=jnp.float32)
    params = surgery.init_params(cfg, jax.random.PRNGKey(3))
    iw = InferenceWeights.from_params(cfg, params, dtype=jnp.float32)
    eng = ContinuousBatchingEngine(iw, n_slots=1, max_len=32,
                                   prefill_bucket=16)
    fe = ServingFrontend(eng)
    try:
        bad = fe.submit([1] * 30, 30)      # passes no pre-check here
        with pytest.raises(ValueError):
            fe.wait(bad, timeout=60)
        ok = fe.submit([1, 2, 3], 2)       # loop must still be alive
        assert len(fe.wait(ok, timeout=120)) == 2
        assert fe._errors == {} and fe._tickets == {}
    finally:
        fe.shutdown()


def test_wait_timeout_cleans_up_ticket_state():
    """A timed-out wait() abandons the ticket: its eventual completion is
    dropped by the engine loop instead of leaking in _tickets/_progress."""
    from spt_proto_tpu.inference.server import ServingFrontend
    cfg = tiny_config('opt').replace(dtype=jnp.float32)
    params = surgery.init_params(cfg, jax.random.PRNGKey(4))
    iw = InferenceWeights.from_params(cfg, params, dtype=jnp.float32)
    eng = ContinuousBatchingEngine(iw, n_slots=1, max_len=32,
                                   prefill_bucket=16)
    fe = ServingFrontend(eng)
    try:
        t0 = fe.submit([7, 8, 9], 4)
        with pytest.raises(TimeoutError):
            fe.wait(t0, timeout=0.0)
        ok = fe.submit([1, 2, 3], 2)       # drives the loop to completion
        assert len(fe.wait(ok, timeout=120)) == 2
        import time
        deadline = time.time() + 60
        while fe._rid_to_ticket and time.time() < deadline:
            time.sleep(0.05)
        with fe._cv:
            assert fe._tickets == {} and fe._progress == {}
            assert fe._rid_to_ticket == {}
    finally:
        fe.shutdown()
