"""Interleaved-QC autodetection + cover-fraction analysis (VERDICT r4 #4).

A QC code whose alist numbers nodes lift-index-first (node (b, j) at
index j*nb + b — a common tool output) defeats the aligned detector but
is the SAME circulant code. detect_qc_structure_permuted must recover
it, and the decoder must decode the user's untouched natural-layout
arrays bit-identically to the aligned twin. qc_cover_stats provides the
measured evidence that random codes admit no useful partial circulant
cover (the hybrid-kernel dead end).
"""

import numpy as np
import pytest

from ldpc_decoder_tpu.channels import BIAWGNChannel
from ldpc_decoder_tpu.codes.generate import make_regular_code
from ldpc_decoder_tpu.codes.protographs import regular_base
from ldpc_decoder_tpu.codes.qc import (
    detect_qc_structure,
    detect_qc_structure_permuted,
    interleave_code_numbering,
    make_qc_code,
    qc_cover_stats,
)
from ldpc_decoder_tpu.runtime.datagen import create_data
from ldpc_decoder_tpu.runtime.decoder import LDPCDecoder
from ldpc_decoder_tpu.runtime.params import DynamicParams, StaticParams


_interleave = interleave_code_numbering


@pytest.fixture(scope="module")
def qc_small():
    base = regular_base(4, 8, 3, 6, seed=5)
    code, s = make_qc_code(base, Z=256, seed=2, coarse=64, fine_mod=16,
                           min_girth=0)
    return code, s


def test_interleaved_detection(qc_small):
    code, s = qc_small
    icode, to_new_v, to_new_c = _interleave(code, s.Z)
    # the aligned detector must fail on the interleaved numbering
    assert detect_qc_structure(icode, min_Z=64, require_tile=32) is None
    res = detect_qc_structure_permuted(icode, min_Z=64, require_tile=32)
    assert res is not None
    qc, perm_v, perm_c = res
    assert qc.Z == s.Z
    assert qc.n_base_rows == s.n_base_rows
    assert qc.n_base_cols == s.n_base_cols
    # perm maps user (interleaved) -> aligned: applying it must undo
    # _interleave's renumbering
    assert np.array_equal(perm_v[to_new_v], np.arange(code.n_vars))
    assert np.array_equal(perm_c[to_new_c], np.arange(code.n_checks))


def test_interleaved_decode_matches_aligned(qc_small):
    code, s = qc_small
    icode, to_new_v, to_new_c = _interleave(code, s.Z)
    ch = BIAWGNChannel(0.7)
    sp = StaticParams(max_log_parallel_factor_user=5,
                      message_dtype="float32")
    dyn = DynamicParams(num_iter_max=30, num_iter_check_parity=5,
                        loading_factor=1)
    dec_a = LDPCDecoder(code, ch, sp, qc=s)
    dec_i = LDPCDecoder(icode, ch, sp)  # autodetects the interleave
    assert dec_i.qc is not None and dec_i.qc.Z == s.Z

    n = 32
    batch = create_data(code, ch, start_index=0, n_frames=n)
    vals, syn = batch.values, batch.syndromes
    # the same physical frames in the interleaved numbering
    vals_i = np.empty_like(vals)
    vals_i[to_new_v] = vals
    syn_i = np.empty_like(syn)
    syn_i[to_new_c] = syn

    res_a, st_a = dec_a.decode(dyn, n, vals, syn)
    res_i, st_i = dec_i.decode(dyn, n, vals_i, syn_i)
    # packed results are in each decoder's own natural layout; unpack and
    # compare bitwise under the renumbering
    bits_a = np.unpackbits(
        res_a.view(np.uint8), bitorder="little", axis=1)[:, :code.n_vars]
    bits_i = np.unpackbits(
        res_i.view(np.uint8), bitorder="little", axis=1)[:, :code.n_vars]
    assert np.array_equal(bits_i[:, to_new_v], bits_a)
    assert np.array_equal(st_a.iterations, st_i.iterations)


def test_cover_stats_qc_vs_random(qc_small):
    code, s = qc_small
    covers = qc_cover_stats(code)
    assert covers[0][1] == 1.0 and covers[0][0] >= s.Z
    # random code: no candidate Z covers more than a few percent — the
    # measured dead-end evidence for partial-rotation hybrid kernels
    rnd = make_regular_code(4096, 3, 6, seed=3)
    covers_r = qc_cover_stats(rnd)
    assert covers_r, "random n=4096 has candidate divisors"
    assert max(f for _, f in covers_r) < 0.02
    # even allowing 7/8-filled diagonals, nothing rotatable appears
    covers_r78 = qc_cover_stats(rnd, min_fill=0.875)
    assert max(f for _, f in covers_r78) < 0.02
