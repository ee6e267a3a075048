"""Native C++ host library vs the numpy reference implementations."""

import numpy as np
import pytest

from ldpc_decoder_tpu import native
from ldpc_decoder_tpu.channels import BIAWGNChannel, BSCChannel
from ldpc_decoder_tpu.codes.code import compute_syndrome
from ldpc_decoder_tpu.codes.generate import make_regular_code
from ldpc_decoder_tpu.rng.chacha_np import stream_words
from ldpc_decoder_tpu.runtime.datagen import create_data

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def test_stream_words_exact():
    for seed, start, count in [(0, 0, 64), (12345, 7, 1000),
                               ((77 | 1 << 32), 383, 800)]:
        assert np.array_equal(
            native.stream_words(seed, start, count),
            stream_words(seed, start, count),
        )


def test_ref_words_layout():
    rw = native.gen_ref_words(100, 48, 2)
    # bit b of word [v, g] = bit v of frame 32g+b
    for g in range(2):
        words = stream_words(100 + 32 * g, 0, 48)
        assert np.array_equal(rw[:, g], words)


@pytest.mark.parametrize("channel", [BIAWGNChannel(0.8), BSCChannel(0.05)])
def test_create_data_matches_numpy(channel):
    code = make_regular_code(256, 3, 6, seed=3)
    a = create_data(code, channel, 17, 40, backend="numpy")
    b = create_data(code, channel, 17, 40, backend="native")
    assert np.array_equal(a.ref_bits, b.ref_bits)
    assert np.array_equal(a.syndromes, b.syndromes)
    # same draws; values equal to the last ulp (libm vs numpy log/sqrt)
    assert np.allclose(a.values, b.values, rtol=5e-5, atol=2e-5)
    # BSC is pure sign flips -> bit exact
    if channel.channel_type == "bsc":
        assert np.array_equal(a.values, b.values)


def test_syndrome_words_vs_numpy():
    code = make_regular_code(512, 3, 6, seed=5)
    rw = native.gen_ref_words(0, code.n_vars, 2)
    syn_w = native.compute_syndrome_words(
        code.out_bit_to_edge.astype(np.int64), code.out_edge_to_in_bit, rw)
    shifts = np.arange(32, dtype=np.uint32)
    bits = ((rw[:, :, None] >> shifts) & 1).astype(np.int8)
    bits = bits.reshape(code.n_vars, -1)
    syn = compute_syndrome(code, bits)
    syn_unpacked = ((syn_w[:, :, None] >> shifts) & 1).astype(np.int8)
    assert np.array_equal(syn_unpacked.reshape(code.n_checks, -1), syn)


def test_deinterlace_words_roundtrip():
    rng = np.random.default_rng(0)
    n_words, n_groups = 96, 3
    interleaved = rng.integers(0, 2**32, (n_words, n_groups), dtype=np.uint32)
    per_frame = native.deinterlace_words(interleaved)
    assert per_frame.shape == (n_groups * 32, (n_words + 31) // 32)
    # frame f = 32g+b, word t, bit i == bit b of interleaved[32t+i, g]
    f, t = 37, 2
    g, b = f // 32, f % 32
    expect = 0
    for i in range(32):
        expect |= int((interleaved[32 * t + i, g] >> b) & 1) << i
    assert int(per_frame[f, t]) == expect
