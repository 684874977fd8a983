"""Simulated multi-host training: 2 OS processes x 4 virtual CPU devices
with gloo collectives (jax.distributed over localhost). Validates the
per-host data path the reference delegates to Lightning/DeepSpeed samplers
(SURVEY §2.8):

  * each process feeds only its process-local batch rows; train_loop
    assembles the global array (make_array_from_process_local_data),
  * both processes follow the same loss trajectory, which matches a
    single-controller run on the concatenated global batch,
  * checkpoint writes are process-0-gated (one train_state.npz, loadable).
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r'''
import json, os, sys
pid = int(sys.argv[1]); port = sys.argv[2]; ckpt = sys.argv[3]
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=4'
os.environ['JAX_PLATFORMS'] = 'cpu'
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_default_matmul_precision', 'highest')
jax.config.update('jax_cpu_collectives_implementation', 'gloo')
from spt_proto_tpu.parallel.mesh import (initialize_multihost,
                                         is_main_process, make_mesh)
initialize_multihost(f'localhost:{port}', num_processes=2, process_id=pid)
assert jax.process_count() == 2 and len(jax.devices()) == 8
import jax.numpy as jnp
import numpy as np
from spt_proto_tpu.config import tiny_config
from spt_proto_tpu.tuning import surgery
from spt_proto_tpu.tuning.trainer import train_loop

cfg = tiny_config('opt').replace(dtype=jnp.float32)
params = surgery.init_params(cfg, jax.random.PRNGKey(0))
mesh = make_mesh(n_data=8, n_model=1)
rng = np.random.RandomState(100 + pid)
local = {'inputs': rng.randint(1, cfg.vocab_size, (4, 16)).astype(np.int32),
         'targets': rng.randint(1, cfg.vocab_size, (4, 16)).astype(np.int32)}
_, hist = train_loop(cfg, params, [dict(local) for _ in range(3)],
                     mesh=mesh, max_steps=3, log_every=1,
                     freeze_base=False, checkpoint_dir=ckpt)
print('RESULT', json.dumps({'pid': pid, 'main': is_main_process(),
                            'losses': [m['loss'] for _, m in hist]}),
      flush=True)
'''


def test_two_process_train_loop(tmp_path):
    port = '12473'
    ckpt = str(tmp_path / 'ckpt')
    env = {k: v for k, v in os.environ.items()
           if k not in ('XLA_FLAGS', 'JAX_PLATFORMS')}
    procs = [subprocess.Popen(
        [sys.executable, '-c', _WORKER, str(pid), port, ckpt],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=os.path.dirname(os.path.dirname(__file__)))
        for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail('multi-host worker timed out')
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
    results = {}
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith('RESULT ')]
        assert line, out[-2000:]
        r = json.loads(line[-1][len('RESULT '):])
        results[r['pid']] = r
    assert results[0]['main'] and not results[1]['main']
    # identical trajectory on both processes (same global computation)
    np.testing.assert_allclose(results[0]['losses'], results[1]['losses'],
                               rtol=1e-6)

    # single-controller reference on the concatenated global batch
    import jax
    import jax.numpy as jnp
    from spt_proto_tpu.config import tiny_config
    from spt_proto_tpu.parallel.mesh import make_mesh
    from spt_proto_tpu.tuning import surgery
    from spt_proto_tpu.tuning.trainer import train_loop
    cfg = tiny_config('opt').replace(dtype=jnp.float32)
    params = surgery.init_params(cfg, jax.random.PRNGKey(0))
    rows = []
    for pid in range(2):
        rng = np.random.RandomState(100 + pid)
        rows.append({
            'inputs': rng.randint(1, cfg.vocab_size, (4, 16)).astype(
                np.int32),
            'targets': rng.randint(1, cfg.vocab_size, (4, 16)).astype(
                np.int32)})
    batch = {k: np.concatenate([r[k] for r in rows]) for k in rows[0]}
    mesh = make_mesh(n_data=8, n_model=1)
    _, hist = train_loop(cfg, params, [dict(batch) for _ in range(3)],
                         mesh=mesh, max_steps=3, log_every=1,
                         freeze_base=False)
    ref_losses = [m['loss'] for _, m in hist]
    np.testing.assert_allclose(results[0]['losses'], ref_losses, atol=1e-4)

    # process-0-gated checkpoint exists and loads
    assert os.path.exists(os.path.join(ckpt, 'train_state.npz'))
    data = np.load(os.path.join(ckpt, 'train_state.npz'))
    assert len(data.files) > 0
