from ldpc_decoder_tpu.channels.base import Channel
from ldpc_decoder_tpu.channels.bsc import BSCChannel
from ldpc_decoder_tpu.channels.biawgn import BIAWGNChannel


def make_channel(channel_idx: int, noise: float) -> Channel:
    """CLI channel selection: 0 = BSC, 1 = AWGN (main.cpp:228-246)."""
    if channel_idx == 0:
        return BSCChannel(noise)
    if channel_idx == 1:
        return BIAWGNChannel(noise)
    raise ValueError(f"unknown channel type {channel_idx}")


__all__ = ["Channel", "BSCChannel", "BIAWGNChannel", "make_channel"]
