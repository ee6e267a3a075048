from ldpc_decoder_tpu.rng.chacha_np import PrngChacha, chacha_blocks, stream_words

__all__ = ["PrngChacha", "chacha_blocks", "stream_words"]
