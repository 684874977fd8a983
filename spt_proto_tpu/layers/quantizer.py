"""PQ quantizer as a flax module (thin stateful wrapper over ops/pq.py).

Reference parity: naive_gpt/layers/basic/quantizer.py (PQV1/PQV2). The V1/V2
split (torch.cdist vs custom CUDA kernel) disappears: one module, and the
distance computation dispatches to the Pallas kernel when configured.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from spt_proto_tpu.ops import pq


class PQQuantizer(nn.Module):
    d_codeword: int
    n_codewords: int
    n_subspaces: int
    param_dtype: Any = jnp.float32
    metric: str = 'l1'

    def setup(self):
        # ref quantizer.py:19-23 (randn init)
        self.codebook = self.param(
            'codebook', nn.initializers.normal(1.0),
            (self.n_subspaces, self.n_codewords, self.d_codeword),
            self.param_dtype)

    def encode(self, z):
        return pq.pq_encode(z, self.codebook, self.metric)

    def decode(self, codes):
        return pq.pq_decode(codes, self.codebook)

    def quantize(self, z):
        return pq.pq_quantize(z, self.codebook, self.metric)

    def train_loss(self, z):
        """Returns (z_q, aux_loss) — ref quantizer.py 'train' mode."""
        return pq.pq_train(z, self.codebook, self.metric)

    def __call__(self, z):
        # default mode: encode (needed so linen initializes params)
        return self.encode(z)
