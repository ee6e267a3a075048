from ldpc_decoder_tpu.codes.alist import parse_alist, write_alist
from ldpc_decoder_tpu.codes.code import LDPCCode, compute_syndrome, rate
from ldpc_decoder_tpu.codes.compiled import CompiledCode, compile_code

__all__ = [
    "parse_alist",
    "write_alist",
    "LDPCCode",
    "compute_syndrome",
    "rate",
    "CompiledCode",
    "compile_code",
]
