from spt_proto_tpu.ops import pq, lookup, sparse_attention, routed_ffn

__all__ = ['pq', 'lookup', 'sparse_attention', 'routed_ffn']
