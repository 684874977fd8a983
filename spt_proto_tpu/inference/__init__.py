from spt_proto_tpu.inference.engine import (KVCache, decode_step, generate,
                                            prefill, sample)
from spt_proto_tpu.inference.weights import InferenceWeights

__all__ = ['KVCache', 'decode_step', 'generate', 'prefill', 'sample',
           'InferenceWeights']
