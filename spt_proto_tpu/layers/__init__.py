from spt_proto_tpu.layers.common import (LoRADense, LoRAEmbed, RMSNorm,
                                         apply_rope, rope_cos_sin)
from spt_proto_tpu.layers.quantizer import PQQuantizer
from spt_proto_tpu.layers.attention import MultiheadAttention
from spt_proto_tpu.layers.feedforward import (DenseParams, Feedforward,
                                              GatedFeedforward,
                                              RoutedFeedforward,
                                              RoutedGatedFeedforward)
from spt_proto_tpu.layers.transformer import TransformerBlock, make_norm

__all__ = [
    'LoRADense', 'LoRAEmbed', 'RMSNorm', 'apply_rope', 'rope_cos_sin',
    'PQQuantizer', 'MultiheadAttention', 'DenseParams', 'Feedforward',
    'GatedFeedforward', 'RoutedFeedforward', 'RoutedGatedFeedforward',
    'TransformerBlock', 'make_norm',
]
