"""Protograph bases and multi-edge QC lifts."""

import numpy as np
import pytest

from ldpc_decoder_tpu.codes.protographs import (
    ar4ja_base,
    regular_base,
    ru_irregular_base,
)
from ldpc_decoder_tpu.codes.qc import (
    _count_6cycles,
    _has_4cycle,
    make_qc_code,
    make_qc_structure,
)


def test_regular_base_degrees():
    b = regular_base(16, 32, 3, 6, seed=1)
    assert (b.sum(axis=0) == 3).all() and (b.sum(axis=1) == 6).all()
    assert b.max() == 1


def test_regular_base_girth8_lift_decodes():
    from ldpc_decoder_tpu.channels import BIAWGNChannel
    from ldpc_decoder_tpu.runtime.datagen import create_data
    from ldpc_decoder_tpu.runtime.decoder import LDPCDecoder
    from ldpc_decoder_tpu.runtime.params import DynamicParams, StaticParams

    base = regular_base(8, 16, 3, 6, seed=3)
    code, s = make_qc_code(base, Z=512, seed=1, coarse=128, fine_mod=32,
                           min_girth=8)
    assert _count_6cycles(s) == 0
    ch = BIAWGNChannel(0.75)
    dec = LDPCDecoder(
        code, ch, StaticParams(max_log_parallel_factor_user=3), qc=s
    )
    dyn = DynamicParams(num_iter_max=50, num_iter_check_parity=5,
                        loading_factor=1)
    n = dec.parallel_factor()
    batch = create_data(code, ch, 0, n)
    res, _ = dec.decode(dyn, n, batch.values, batch.syndromes)
    errors = np.bitwise_count(batch.ref_bits_packed() ^ res).sum()
    assert errors == 0


def test_ru_irregular_base_profile():
    b, punct = ru_irregular_base(8, seed=1)
    assert punct == ()
    assert set(np.unique(b.sum(axis=0))) <= {2, 3, 8}
    assert set(np.unique(b.sum(axis=1))) <= {6, 7}
    # rate 1/2 by construction
    assert b.shape == (24, 48)


def test_ar4ja_multiedge_lift():
    base, punct = ar4ja_base()
    assert base.sum() == 15  # 15 protograph edges incl. parallel ones
    s = make_qc_structure(base, Z=64, seed=2)
    assert s.n_base_edges == 15
    assert not _has_4cycle(s)
    # parallel edges in cell (0,1): distinct shifts
    m = (s.edge_row == 0) & (s.edge_col == 1)
    assert m.sum() == 2
    assert len(set(s.edge_shift[m].tolist())) == 2


def test_multiedge_collapse_is_4cycle():
    base, _ = ar4ja_base()
    s = make_qc_structure(base, Z=64, seed=2)
    shifts = s.edge_shift.copy()
    m = np.nonzero((s.edge_row == 0) & (s.edge_col == 1))[0]
    shifts[m[1]] = shifts[m[0]]  # collapse the parallel pair
    from ldpc_decoder_tpu.codes.qc import QCStructure

    bad = QCStructure(Z=s.Z, n_base_rows=s.n_base_rows,
                      n_base_cols=s.n_base_cols, edge_row=s.edge_row,
                      edge_col=s.edge_col, edge_shift=shifts)
    assert _has_4cycle(bad)


def test_two_stage_lift_girth8():
    """prelift + repair lift: 0/1 pre-lifted base, girth >= 8 verified by
    the independent counters, punctured columns land last."""
    from ldpc_decoder_tpu.codes.protographs import (
        make_protograph_code_two_stage,
        prelift_base,
    )
    from ldpc_decoder_tpu.codes.qc import _count_6cycles

    base, punct = ar4ja_base()
    m = 4
    big = prelift_base(base[:, [0, 2, 3, 4, 1]], m, seed=0)
    assert big.shape == (base.shape[0] * m, base.shape[1] * m)
    assert big.max() == 1
    # degrees preserved m-fold
    assert big.sum() == base.sum() * m
    code, s = make_protograph_code_two_stage(
        base, punct, m=m, Z=256, seed=3, coarse=64, fine_mod=16)
    assert code.n_vars == base.shape[1] * m * 256
    assert code.n_erased_vars == m * 256
    assert not _has_4cycle(s)
    assert _count_6cycles(s) == 0


def test_two_stage_lift_decodes_end_to_end():
    """Punctured AR4JA two-stage lift decodes through the grouped kernels
    below threshold (sigma 0.80 << sigma* 0.93)."""
    import numpy as np_

    from ldpc_decoder_tpu.channels import BIAWGNChannel
    from ldpc_decoder_tpu.codes.protographs import (
        make_protograph_code_two_stage,
    )
    from ldpc_decoder_tpu.runtime.datagen import create_data
    from ldpc_decoder_tpu.runtime.decoder import LDPCDecoder
    from ldpc_decoder_tpu.runtime.params import DynamicParams, StaticParams

    base, punct = ar4ja_base()
    code, s = make_protograph_code_two_stage(
        base, punct, m=4, Z=128, seed=5, coarse=32, fine_mod=8)
    ch = BIAWGNChannel(0.80)
    dec = LDPCDecoder(
        code, ch, StaticParams(max_log_parallel_factor_user=3), qc=s)
    dyn = DynamicParams(num_iter_max=100, num_iter_check_parity=10,
                        loading_factor=1)
    n = dec.parallel_factor()
    batch = create_data(code, ch, 0, n)
    results, stats = dec.decode(dyn, n, batch.values, batch.syndromes)
    errors = np_.bitwise_count(batch.ref_bits_packed() ^ results).sum(axis=1)
    assert errors.sum() == 0, f"errors: {errors}"


def test_p41_code_shipped_defaults():
    """Pin the shipped flagship instance parameters (round-3 ship:
    coarse=1024 lattice, lift seed 3 — scripts/try_coarse1024_seeds.py)
    and smoke the constructor at small Z: valid girth-8 punctured
    instance with the punctured column landing last."""
    import inspect

    from ldpc_decoder_tpu.codes.protographs import p41_code

    sig = inspect.signature(p41_code)
    assert [p.default for p in sig.parameters.values()] == [
        18432, 3, 8, 1024, 64], (
        "flagship defaults drifted from the validated shipped instance")

    code, s = p41_code(Z=128, m=4, coarse=64, fine_mod=16)
    assert code.n_vars == 7 * 4 * 128
    assert code.n_erased_vars == 4 * 128
    assert not _has_4cycle(s)
    assert _count_6cycles(s) == 0
