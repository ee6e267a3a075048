from ldpc_decoder_tpu.ops.phi import phi, phi_abs

__all__ = ["phi", "phi_abs"]
