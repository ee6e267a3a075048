from ldpc_decoder_tpu.runtime.params import DynamicParams, StaticParams
from ldpc_decoder_tpu.runtime.decoder import LDPCDecoder

__all__ = ["LDPCDecoder", "StaticParams", "DynamicParams"]
