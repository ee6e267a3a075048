"""Binary erasure channel.

The reference declares an ``erasure_channel`` behind its (disabled)
``EXTRA_CHANNELS`` build flag (h/channel.h:112-133); this framework ships a
working implementation. Symbols are erased (channel value 0) with
probability ε and received intact otherwise; the decoder sees LLR 0 for
erasures and a saturated LLR for known bits, and BP performs classical
peeling-equivalent decoding. Capacity = 1 - ε.

The companion ``multigauss_channel`` (grouped-Gaussian, h/channel.h:81-110)
has no implementation translation unit in the reference tree (like the
AES-NI PRNG, it is declared dead code) and is intentionally not mirrored.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ldpc_decoder_tpu.channels.base import Channel

# LLR magnitude assigned to unerased (perfectly known) bits; within the
# clamp range of ops/phi.py so φ stays a normal bfloat16
KNOWN_LLR = 40.0


class ErasureChannel(Channel):
    """BEC(ε): value 0 = erased, ±1 = known."""

    channel_type = "erasure"

    def __init__(self, epsilon: float):
        if not 0.0 < epsilon < 1.0:
            raise ValueError("erasure probability must be in (0, 1)")
        self.epsilon = float(epsilon)

    def add_noise_np(self, prng, values: np.ndarray) -> np.ndarray:
        # one unit() draw per sample, erase if < epsilon (the BSC pattern,
        # channel.cpp:34-38, with erasure instead of flip)
        erased = prng.units(values.shape[0]) < np.float32(self.epsilon)
        out = values.copy()
        out[erased] = 0.0
        return out

    def llr_from_channel(self, values: jnp.ndarray) -> jnp.ndarray:
        v = values.astype(jnp.float32)
        return jnp.where(v == 0.0, 0.0, jnp.sign(v) * jnp.float32(KNOWN_LLR))

    def llr_np(self, values: np.ndarray) -> np.ndarray:
        v = values.astype(np.float32)
        return np.where(v == 0.0, np.float32(0.0),
                        np.sign(v) * np.float32(KNOWN_LLR))

    def capacity(self) -> float:
        return 1.0 - self.epsilon

    def description(self) -> str:
        return (
            f"Binary erasure channel with erasure probability: "
            f"{self.epsilon:g}"
        )
