"""Device mesh construction.

The reference delegates all distribution to Lightning DDP / DeepSpeed ZeRO-3
(SURVEY §2.8); the TPU-native story is an explicit jax.sharding.Mesh with a
('data', 'model') axis pair: 'data' shards the batch (DP; over DCN between
hosts), 'model' shards heads / FFN blocks / vocab (TP+EP; over ICI).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = 'data'
MODEL_AXIS = 'model'
SP_AXIS = 'sp'    # context/sequence parallelism (ring attention)
PIPE_AXIS = 'pipe'  # pipeline stages (parallel/pipeline.py)


def make_mesh(n_data: Optional[int] = None, n_model: Optional[int] = None,
              n_sp: int = 1, n_pipe: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ('data', 'model', 'sp', 'pipe') mesh over the devices.

    Defaults: all devices on the model axis if n_model covers them, else
    fill data with the remainder. `n_sp` > 1 enables context parallelism
    (sequence sharded over 'sp'; see ops/ring_attention.py); `n_pipe` > 1
    enables pipeline parallelism (stacked-layer axis sharded over 'pipe';
    see parallel/pipeline.py).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    n_rest = n // (n_sp * n_pipe)
    if n_model is None and n_data is None:
        n_data, n_model = 1, n_rest
    elif n_model is None:
        n_model = n_rest // n_data
    elif n_data is None:
        n_data = n_rest // n_model
    assert n_data * n_model * n_sp * n_pipe == n, \
        (n_data, n_model, n_sp, n_pipe, n)
    arr = np.asarray(devices).reshape(n_data, n_model, n_sp, n_pipe)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS, SP_AXIS, PIPE_AXIS))


def single_device_mesh() -> Mesh:
    return make_mesh(1, 1, devices=jax.devices()[:1])


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Multi-host init (TPU pods discover topology automatically).

    TPU-native replacement for Lightning's NCCL process-group bring-up.
    Simulated-multi-host recipe (CPU, any machine — used by
    tests/test_multihost.py): per process set
    XLA_FLAGS=--xla_force_host_platform_device_count=K, select the 'gloo'
    CPU collectives implementation, then call this with an explicit
    coordinator_address and process_id.
    """
    kw = {}
    if coordinator_address is not None:
        kw = dict(coordinator_address=coordinator_address,
                  num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kw)


def is_main_process() -> bool:
    """True on the process that owns checkpointing/logging (process 0).
    The reference's analog is Lightning's rank-zero gating."""
    return jax.process_index() == 0


def put_global_batch(batch, sharding):
    """Place a batch with the given sharding(s).

    Single controller: plain device_put of the global batch. Under
    jax.distributed (process_count > 1): each process passes only its
    PROCESS-LOCAL rows (global_batch_rows / process_count of them) and the
    global array is assembled from every host's local shards without any
    cross-host data movement (jax.make_array_from_process_local_data) —
    the per-host data path DeepSpeed/Lightning provide via their samplers
    (SURVEY §2.8)."""
    if jax.process_count() == 1:
        return jax.device_put(batch, sharding)
    put = lambda s: lambda x: jax.make_array_from_process_local_data(
        s, np.asarray(x))
    if isinstance(sharding, dict):
        return {k: jax.tree.map(put(sharding[k]), v)
                for k, v in batch.items()}
    return jax.tree.map(put(sharding), batch)


def fully_replicate(tree):
    """Gather every cross-host-sharded leaf to full replication (so each
    process can device_get it, e.g. for checkpointing). No-op on a single
    controller."""
    if jax.process_count() == 1:
        return tree
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    def rep(a):
        if hasattr(a, 'sharding') and isinstance(a.sharding, NamedSharding) \
                and not a.is_fully_replicated:
            out = NamedSharding(a.sharding.mesh, P())
            return jax.jit(lambda t: t, out_shardings=out)(a)
        return a

    return jax.tree.map(rep, tree)
