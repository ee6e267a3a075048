"""P-EXIT threshold analysis sanity checks against known ensembles."""

import numpy as np

from ldpc_decoder_tpu.codes.pexit import J, J_inv, pexit_threshold
from ldpc_decoder_tpu.codes.protographs import ar4ja_base, regular_base


def test_j_roundtrip():
    xs = np.linspace(0.05, 6.0, 60)
    assert np.abs(J_inv(J(xs)) - xs).max() < 0.1  # approximation-level


def test_regular_36_threshold():
    base = regular_base(4, 8, 3, 6, seed=1)
    thr = pexit_threshold(base)
    # true DE threshold of the (3,6) ensemble is 0.8790; the Gaussian
    # approximation lands within ~0.005
    assert abs(thr - 0.879) < 0.01


def test_ar4ja_threshold():
    base, punct = ar4ja_base()
    thr = pexit_threshold(base, punct)
    assert abs(thr - 0.93) < 0.015  # literature ~0.93 for rate-1/2 AR4JA


def test_iteration_constrained_threshold_is_lower():
    base = regular_base(4, 8, 3, 6, seed=1)
    thr_inf = pexit_threshold(base, max_iters=2000)
    thr_40 = pexit_threshold(base, max_iters=40)
    assert thr_40 < thr_inf


def test_minsum_de_known_thresholds():
    """Sampled min-sum DE reproduces the (3,6) literature thresholds:
    plain MS ~0.82, NMS alpha=0.8 ~0.87-0.88 (vs BP 0.879)."""
    from ldpc_decoder_tpu.codes.pexit import minsum_de_run

    base = np.full((1, 2), 3)  # (3,6) protograph
    ok, _ = minsum_de_run(base, 0.80, n_samples=4000, max_iters=150, seed=1)
    assert ok  # plain MS converges below its ~0.825 threshold
    ok, _ = minsum_de_run(base, 0.86, n_samples=4000, max_iters=150, seed=1)
    assert not ok  # ...and fails above it
    ok, _ = minsum_de_run(base, 0.86, alpha=0.8, n_samples=4000,
                          max_iters=200, seed=1)
    assert ok  # normalization recovers most of the BP gap


def test_minsum_de_sum_product_mode_matches_ga():
    """The sampled DE's exact-BP mode agrees with the GA P-EXIT threshold
    (cross-validation of both implementations)."""
    from ldpc_decoder_tpu.codes.pexit import minsum_de_run

    base = np.full((1, 2), 3)
    ok, _ = minsum_de_run(base, 0.87, alg="sum-product", n_samples=4000,
                          max_iters=250, seed=1)
    assert ok
    ok, _ = minsum_de_run(base, 0.90, alg="sum-product", n_samples=4000,
                          max_iters=250, seed=1)
    assert not ok


def test_minsum_de_per_degree_alpha_and_puncture():
    from ldpc_decoder_tpu.codes.pexit import minsum_de_run
    from ldpc_decoder_tpu.codes.protographs import P41_BASE

    # per-degree alpha table runs and punctured columns are honored
    ok, _ = minsum_de_run(P41_BASE, 0.85, (6,),
                          alpha=((3, 1.0), (6, 0.9), (0, 0.875)),
                          n_samples=4000, max_iters=150, seed=1)
    assert ok
