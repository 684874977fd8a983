from spt_proto_tpu.utils import checkpoint, tree

__all__ = ['checkpoint', 'tree']
