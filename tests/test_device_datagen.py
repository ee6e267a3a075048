"""On-device ChaCha + data generation vs the CPU-exact numpy paths."""

import jax.numpy as jnp
import numpy as np

from ldpc_decoder_tpu.channels import BIAWGNChannel, BSCChannel
from ldpc_decoder_tpu.codes.compiled import compile_code
from ldpc_decoder_tpu.codes.generate import make_regular_code
from ldpc_decoder_tpu.ops.decode import DecodeTables
from ldpc_decoder_tpu.rng import chacha_jax as cj
from ldpc_decoder_tpu.rng.chacha_np import stream_words
from ldpc_decoder_tpu.runtime.datagen import create_data
from ldpc_decoder_tpu.runtime.datagen_device import (
    count_bit_errors,
    create_pool_device,
)


def test_device_chacha_matches_numpy():
    seeds = np.array([[5, 6, 7], [0, 0, 1]], dtype=np.uint32)
    words = np.asarray(cj.stream_words_2d(jnp.asarray(seeds), 800))
    for i, seed in enumerate([5, 6, 7 + (1 << 32)]):
        np.testing.assert_array_equal(words[i], stream_words(seed, 0, 800))


def test_device_reference_bits_exact():
    from ldpc_decoder_tpu.runtime.datagen import generate_reference_bits

    bits_dev = np.asarray(
        cj.reference_bits_device(jnp.asarray(17, jnp.uint32), 500, 64)
    )
    bits_np = generate_reference_bits(500, 17, 64)
    np.testing.assert_array_equal(bits_dev, bits_np)


def test_device_bsc_values_exact():
    code = make_regular_code(512, 3, 6, seed=2)
    ch = BSCChannel(0.07)
    batch = create_data(code, ch, start_index=9, n_frames=32)
    ref_dev = cj.reference_bits_device(
        jnp.asarray(9, jnp.uint32), code.n_vars, 32
    )
    vals_dev = np.asarray(
        cj.bsc_values_device(ref_dev, jnp.asarray(9, jnp.uint32),
                             code.n_vars, 32, 0.07)
    )
    np.testing.assert_array_equal(vals_dev, batch.values)


def test_device_awgn_statistics_and_determinism():
    ref = jnp.ones((4096, 32), jnp.int8)
    a = np.asarray(
        cj.awgn_values_device(ref, jnp.asarray(0, jnp.uint32), 4096, 32, 0.9)
    )
    b = np.asarray(
        cj.awgn_values_device(ref, jnp.asarray(0, jnp.uint32), 4096, 32, 0.9)
    )
    np.testing.assert_array_equal(a, b)
    noise = a - 1.0
    assert abs(float(noise.mean())) < 0.01
    assert abs(float(noise.std()) - 0.9) < 0.01
    # different start index -> different noise
    c = np.asarray(
        cj.awgn_values_device(ref, jnp.asarray(1, jnp.uint32), 4096, 32, 0.9)
    )
    assert not np.array_equal(a, c)


def test_device_pool_matches_cpu_datagen_bsc():
    code = make_regular_code(512, 3, 6, seed=3)
    cc = compile_code(code)
    tables = DecodeTables.from_compiled(cc)
    ch = BSCChannel(0.05)
    pool = create_pool_device(cc, tables, ch, start_index=0, n_frames=32)
    batch = create_data(code, ch, 0, 32)
    np.testing.assert_array_equal(
        np.asarray(pool.values_sorted), batch.values[np.asarray(cc.vn_order)]
    )
    np.testing.assert_array_equal(
        np.asarray(pool.syn_sorted), batch.syndromes[np.asarray(cc.cn_order)]
    )
    np.testing.assert_array_equal(
        np.asarray(pool.ref_packed), batch.ref_bits_packed()
    )


def test_device_pool_matches_cpu_datagen_erasure():
    from ldpc_decoder_tpu.channels import ErasureChannel

    code = make_regular_code(512, 3, 6, seed=3)
    cc = compile_code(code)
    tables = DecodeTables.from_compiled(cc)
    ch = ErasureChannel(0.3)
    pool = create_pool_device(cc, tables, ch, start_index=5, n_frames=32)
    batch = create_data(code, ch, 5, 32)
    np.testing.assert_array_equal(
        np.asarray(pool.values_sorted), batch.values[np.asarray(cc.vn_order)]
    )
    np.testing.assert_array_equal(
        np.asarray(pool.syn_sorted), batch.syndromes[np.asarray(cc.cn_order)]
    )


def test_count_bit_errors():
    ref = jnp.asarray(np.array([[0b1011, 0], [0, 0]], dtype=np.uint32))
    res = jnp.asarray(np.array([[0b1000, 0], [0, 1 << 31]], dtype=np.uint32))
    np.testing.assert_array_equal(
        np.asarray(count_bit_errors(res, ref)), [2, 1]
    )


def test_full_device_pipeline_decodes():
    """generate-on-device -> decode -> count errors, no host data at all."""
    from ldpc_decoder_tpu.runtime.decoder import LDPCDecoder
    from ldpc_decoder_tpu.runtime.params import DynamicParams, StaticParams

    code = make_regular_code(1024, 3, 6, seed=4)
    ch = BIAWGNChannel(0.65)
    dec = LDPCDecoder(code, ch, StaticParams(max_log_parallel_factor_user=4))
    dyn = DynamicParams(num_iter_max=50, num_iter_check_parity=5,
                        loading_factor=2)
    n = dec.parallel_factor() * dyn.loading_factor
    pool = create_pool_device(dec.cc, dec.tables, ch, 0, n)
    results, stats = dec.decode_presorted(
        dyn, n, pool.values_sorted, pool.syn_sorted, fetch_results=False
    )
    errors = np.asarray(count_bit_errors(results, pool.ref_packed))
    assert errors.sum() == 0
