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
