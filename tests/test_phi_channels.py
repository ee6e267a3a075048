"""φ numerics and channel model tests."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from ldpc_decoder_tpu.channels import BIAWGNChannel, BSCChannel, make_channel
from ldpc_decoder_tpu.ops.phi import PRE_THRESHOLD, phi, phi_abs, phi_abs_np
from ldpc_decoder_tpu.rng.chacha_np import PrngChacha


def exact_phi(x):
    # stable float64 oracle: -log(tanh(x/2)) = log1p(e^-x) - log1p(-e^-x)
    e = np.exp(-np.asarray(x, dtype=np.float64))
    return np.log1p(e) - np.log1p(-e)


def test_phi_abs_accuracy():
    xs = np.concatenate(
        [np.linspace(1e-4, 5.0, 2001), np.linspace(5.0, 30.0, 101)[1:]]
    )
    got = np.asarray(phi_abs(jnp.asarray(xs, dtype=jnp.float32)))
    want = exact_phi(xs)
    # main branch: tight; Taylor tail 2e^{-x}: relative error < 2e^{-2x} small
    rel = np.abs(got - want) / np.maximum(np.abs(want), 1e-30)
    assert rel[xs <= 5].max() < 1e-4
    assert rel[xs > 5].max() < 1e-4


def test_phi_self_inverse():
    xs = np.linspace(0.05, 8.0, 500)
    once = np.asarray(phi_abs(jnp.asarray(xs, dtype=jnp.float32)))
    twice = np.asarray(phi_abs(jnp.asarray(once)))
    np.testing.assert_allclose(twice, xs, rtol=2e-3, atol=2e-3)


def test_phi_clamp_matches_reference():
    # inputs below pre_threshold clamp to phi_abs(1e-5) (flood.cu:33)
    v = np.asarray(phi_abs(jnp.asarray([0.0, 1e-7, PRE_THRESHOLD])))
    assert v[0] == v[1] == v[2]
    assert v[0] == pytest.approx(exact_phi(1e-5), rel=1e-4)


def test_phi_sign_handling():
    out = np.asarray(phi(jnp.asarray([-2.0, 2.0, -0.0, 0.0], dtype=jnp.float32)))
    assert out[0] == -out[1]
    assert np.signbit(out[2]) and not np.signbit(out[3])
    np.testing.assert_allclose(out[1], exact_phi(2.0), rtol=1e-5)


def test_phi_np_matches_jax():
    xs = np.linspace(0.001, 20, 777)
    np.testing.assert_allclose(
        np.asarray(phi_abs(jnp.asarray(xs, dtype=jnp.float32))),
        phi_abs_np(xs),
        rtol=1e-5,
    )


def test_bsc_llr_and_capacity():
    ch = BSCChannel(0.09)
    assert ch.llr_ref == pytest.approx(math.log(0.91 / 0.09))
    # capacity formula channel.cpp:70-73
    p = 0.09
    assert ch.capacity() == pytest.approx(
        1 + p * math.log2(p) + (1 - p) * math.log2(1 - p)
    )
    vals = jnp.asarray([1.0, -1.0, 0.5, -0.0, 0.0])
    llrs = np.asarray(ch.llr_from_channel(vals))
    np.testing.assert_allclose(
        llrs,
        [ch.llr_ref, -ch.llr_ref, ch.llr_ref, -ch.llr_ref, ch.llr_ref],
        rtol=1e-6,
    )
    np.testing.assert_allclose(llrs, ch.llr_np(np.asarray(vals)), rtol=1e-7)


def test_awgn_llr_and_capacity():
    ch = BIAWGNChannel(0.9399414)
    # README.md:77-78: sigma 0.939941 -> SNR 1.13187, capacity 0.5268
    assert ch.snr == pytest.approx(1.13187, abs=2e-5)
    assert ch.capacity() == pytest.approx(0.5268, abs=2e-4)
    vals = jnp.asarray([0.7, -1.3])
    np.testing.assert_allclose(
        np.asarray(ch.llr_from_channel(vals)),
        np.asarray(vals) * 2 * ch.snr,
        rtol=1e-6,
    )


def test_bsc_noise_statistics_and_determinism():
    ch = BSCChannel(0.2)
    vals = np.ones(50000, dtype=np.float32)
    out = ch.add_noise_np(PrngChacha(1), vals)
    flip_rate = float((out < 0).mean())
    assert abs(flip_rate - 0.2) < 0.01
    out2 = ch.add_noise_np(PrngChacha(1), vals)
    np.testing.assert_array_equal(out, out2)


def test_awgn_noise_statistics():
    ch = BIAWGNChannel(0.8)
    vals = np.ones(100000, dtype=np.float32)
    out = ch.add_noise_np(PrngChacha(2), vals)
    assert abs(float(out.mean()) - 1.0) < 0.01
    assert abs(float(out.std()) - 0.8) < 0.01


def test_make_channel():
    assert isinstance(make_channel(0, 0.1), BSCChannel)
    assert isinstance(make_channel(1, 0.9), BIAWGNChannel)
    with pytest.raises(ValueError):
        make_channel(7, 0.1)


def test_erasure_channel():
    import numpy as np

    from ldpc_decoder_tpu.channels import ErasureChannel, make_channel
    from ldpc_decoder_tpu.rng.chacha_np import PrngChacha

    ch = make_channel(2, 0.3)
    assert isinstance(ch, ErasureChannel)
    assert abs(ch.capacity() - 0.7) < 1e-12
    prng = PrngChacha(5)
    vals = np.ones(10000, np.float32)
    out = ch.add_noise_np(prng, vals)
    frac = (out == 0).mean()
    assert 0.25 < frac < 0.35
    llr = ch.llr_np(out)
    assert (llr[out == 0] == 0).all()
    assert (llr[out != 0] > 0).all()


def test_erasure_decode_end_to_end():
    import numpy as np

    from ldpc_decoder_tpu.channels import ErasureChannel
    from ldpc_decoder_tpu.codes.generate import make_regular_code
    from ldpc_decoder_tpu.runtime.datagen import create_data
    from ldpc_decoder_tpu.runtime.decoder import LDPCDecoder
    from ldpc_decoder_tpu.runtime.params import DynamicParams, StaticParams

    code = make_regular_code(1024, 3, 6, seed=4)
    ch = ErasureChannel(0.3)  # well below the (3,6) BEC threshold 0.4294
    dec = LDPCDecoder(code, ch, StaticParams(max_log_parallel_factor_user=3))
    dyn = DynamicParams(num_iter_max=60, num_iter_check_parity=5,
                        loading_factor=1)
    n = dec.parallel_factor()
    batch = create_data(code, ch, 0, n)
    res, _ = dec.decode(dyn, n, batch.values, batch.syndromes)
    errors = np.bitwise_count(batch.ref_bits_packed() ^ res).sum()
    assert errors == 0


def test_pre_from_infinity_threshold():
    """The OpenCL-backend derivation phi(t+1)=2e^-(t+1) (flood_vec2.cl
    defines phi(c_threshold+1)=c_pre_threshold) and the None default
    (the CUDA backend's hard-coded 1e-5)."""
    import math

    from ldpc_decoder_tpu.ops.phi import (
        PRE_THRESHOLD,
        phi_abs_np,
        pre_from_infinity_threshold,
    )

    assert pre_from_infinity_threshold(None) == PRE_THRESHOLD
    pre10 = pre_from_infinity_threshold(10.0)
    assert abs(pre10 - 2 * math.exp(-11)) < 1e-12
    # flooring phi's input at phi(t+1) caps the output at ~t+1
    assert abs(float(phi_abs_np(1e-9, pre=pre10)) - 11.0) < 0.01
