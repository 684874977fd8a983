from spt_proto_tpu.tuning import partition, surgery

__all__ = ['partition', 'surgery']
