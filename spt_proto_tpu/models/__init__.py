from spt_proto_tpu.models.decoder import DecoderLM, OPTModel, LLaMAModel

__all__ = ['DecoderLM', 'OPTModel', 'LLaMAModel']
