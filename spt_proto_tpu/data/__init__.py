from spt_proto_tpu.data import datamodule, mmlu, reader, transform

__all__ = ['datamodule', 'mmlu', 'reader', 'transform']
