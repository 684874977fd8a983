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


def make_mesh(n_data: Optional[int] = None, n_model: Optional[int] = None,
              n_sp: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ('data', 'model', 'sp') mesh over the available devices.

    Defaults: all devices on the model axis if n_model covers them, else
    fill data with the remainder. `n_sp` > 1 enables context parallelism
    (sequence sharded over 'sp'; see ops/ring_attention.py).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    n_rest = n // n_sp
    if n_model is None and n_data is None:
        n_data, n_model = 1, n_rest
    elif n_model is None:
        n_model = n_rest // n_data
    elif n_data is None:
        n_data = n_rest // n_model
    assert n_data * n_model * n_sp == n, (n_data, n_model, n_sp, n)
    arr = np.asarray(devices).reshape(n_data, n_model, n_sp)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS, SP_AXIS))


def single_device_mesh() -> Mesh:
    return make_mesh(1, 1, devices=jax.devices()[:1])


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Multi-host init (TPU pods discover topology automatically).

    TPU-native replacement for Lightning's NCCL process-group bring-up.
    """
    kw = {}
    if coordinator_address is not None:
        kw = dict(coordinator_address=coordinator_address,
                  num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kw)
