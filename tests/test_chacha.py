"""ChaCha8 PRNG tests: golden keystream vectors + draw semantics.

Golden data (tests/data/chacha_golden.txt) holds keystream bytes produced by
the reference's own ChaCha core for several (seed, refill) pairs: columns are
``seed refill_index hex(first 64 bytes) hex(last 64 bytes)`` of a 1536-byte
refill. Line 1 (seed 0, refill 0) equals the published ChaCha8 all-zero-key
test vector, independently pinning the variant.
"""

import os

import numpy as np
import pytest

from ldpc_decoder_tpu.rng.chacha_np import (
    BLOCKS_PER_REFILL,
    PrngChacha,
    WORDS_PER_REFILL,
    chacha_blocks,
    stream_words,
    units_from_words,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "data", "chacha_golden.txt")


def _golden_cases():
    with open(GOLDEN) as f:
        for line in f:
            seed, iv, first, last = line.split()
            yield int(seed), int(iv), bytes.fromhex(first), bytes.fromhex(last)


@pytest.mark.parametrize("seed,iv,first,last", list(_golden_cases()))
def test_keystream_matches_reference(seed, iv, first, last):
    # first block of refill iv: stream words 384*iv .. +16
    words = stream_words(seed, WORDS_PER_REFILL * iv, 16)
    assert words.tobytes() == first
    words = stream_words(
        seed, WORDS_PER_REFILL * iv + 16 * (BLOCKS_PER_REFILL - 1), 16
    )
    assert words.tobytes() == last


def test_stream_words_arbitrary_offsets():
    full = stream_words(42, 0, 3 * WORDS_PER_REFILL)
    for start, count in [(0, 5), (15, 3), (383, 10), (384, 384), (700, 401)]:
        np.testing.assert_array_equal(
            stream_words(42, start, count), full[start : start + count]
        )


def test_scalar_matches_bulk():
    r1, r2 = PrngChacha(7), PrngChacha(7)
    scalars = np.array([r1.random_int() for _ in range(1000)], dtype=np.uint32)
    np.testing.assert_array_equal(scalars, r2.random_ints(1000))


def test_unit_range_and_dtype():
    r = PrngChacha(3)
    u = r.units(10000)
    assert u.dtype == np.float32
    assert (u > 0).all() and (u < 1).all()
    assert abs(float(u.mean()) - 0.5) < 0.02


def test_gaussian_scalar_vs_bulk():
    r1, r2 = PrngChacha(11), PrngChacha(11)
    scalars = np.array([r1.gaussian() for _ in range(501)], dtype=np.float32)
    bulk = r2.gaussians(501)
    np.testing.assert_array_equal(scalars, bulk)
    # positions must agree so subsequent draws line up
    assert r1.random_int() == r2.random_int()


def test_gaussian_bulk_split_invariance():
    r1, r2 = PrngChacha(13), PrngChacha(13)
    a = np.concatenate([r1.gaussians(17), r1.gaussians(1), r1.gaussians(100)])
    b = r2.gaussians(118)
    np.testing.assert_array_equal(a, b)


def test_gaussian_statistics():
    g = PrngChacha(5).gaussians(200000)
    assert abs(float(g.mean())) < 0.01
    assert abs(float(g.std()) - 1.0) < 0.01


def test_reset_seed_reproduces():
    r = PrngChacha(99)
    a = r.random_ints(10)
    r.reset_seed(99)
    np.testing.assert_array_equal(a, r.random_ints(10))


def test_blocks_vectorized_consistency():
    key = np.zeros(8, dtype=np.uint32)
    key[0] = 123
    singles = [
        chacha_blocks(key, np.array([c], dtype=np.uint64),
                      np.array([n], dtype=np.uint64))[:, 0]
        for c, n in [(0, 0), (1, 0), (0, 1), (23, 5)]
    ]
    batch = chacha_blocks(
        key,
        np.array([0, 1, 0, 23], dtype=np.uint64),
        np.array([0, 0, 1, 5], dtype=np.uint64),
    )
    for i, s in enumerate(singles):
        np.testing.assert_array_equal(batch[:, i], s)


def test_units_float32_semantics():
    # (float32(u) + 0.5) * 2^-32 — check the exact rounding path
    words = np.array([0, 1, 2**31, 2**32 - 1], dtype=np.uint32)
    u = units_from_words(words)
    expect = (words.astype(np.float32) + np.float32(0.5)) * np.float32(2.0**-32)
    np.testing.assert_array_equal(u, expect)
