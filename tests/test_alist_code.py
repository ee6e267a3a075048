"""alist parsing, index-table construction, syndrome computation."""

import numpy as np
import pytest

from ldpc_decoder_tpu.codes.alist import AlistData, parse_alist, write_alist
from ldpc_decoder_tpu.codes.code import LDPCCode, compute_syndrome, rate
from ldpc_decoder_tpu.codes.compiled import compile_code
from ldpc_decoder_tpu.codes.generate import make_irregular_code, make_regular_code

# A tiny hand-checked code: 3 checks, 6 vars.
# H rows: c0 = {v0, v1, v2}, c1 = {v2, v3, v4}, c2 = {v0, v4, v5}
TINY_ALIST = """3 6
3 2
3 3 3
2 1 2 1 2 1
1 2 3
3 4 5
1 5 6
"""


def tiny_code():
    return LDPCCode.from_alist(TINY_ALIST)


def test_parse_tiny():
    code = tiny_code()
    assert code.n_vars == 6 and code.n_checks == 3 and code.n_edges == 9
    assert code.max_degree_out == 3 and code.max_degree_in == 2
    np.testing.assert_array_equal(code.check_degrees, [3, 3, 3])
    np.testing.assert_array_equal(code.var_degrees, [2, 1, 2, 1, 2, 1])
    np.testing.assert_array_equal(code.out_bit_to_edge, [0, 3, 6, 9])
    np.testing.assert_array_equal(code.in_bit_to_edge, [0, 2, 3, 5, 6, 8, 9])
    # check-major adjacency round trip
    np.testing.assert_array_equal(
        code.out_edge_to_in_bit, [0, 1, 2, 2, 3, 4, 0, 4, 5]
    )


def test_edge_permutations_are_inverse():
    code = tiny_code()
    e = np.arange(code.n_edges)
    np.testing.assert_array_equal(code.edge_in_to_out[code.edge_out_to_in], e)
    np.testing.assert_array_equal(code.edge_out_to_in[code.edge_in_to_out], e)
    # in-edge i belongs to var in_edge_to_bit[i]; its out-edge must touch
    # the same variable
    np.testing.assert_array_equal(
        code.in_edge_to_bit,
        code.out_edge_to_in_bit[code.edge_in_to_out],
    )


def test_reference_edge_order_semantics():
    """in-edges of one variable appear in increasing out-edge order
    (ldpc_code.cpp:139-149: occurrence counting in file order)."""
    code = make_irregular_code(
        60, 30, {2: 0.5, 3: 0.5}, {4: 1.0}, seed=1
    )
    for v in range(code.n_vars):
        edges = code.edge_in_to_out[
            code.in_bit_to_edge[v] : code.in_bit_to_edge[v + 1]
        ]
        assert (np.diff(edges) > 0).all()


def test_headers_and_roundtrip():
    text = "#e=2\n#ec=1\n" + TINY_ALIST
    code = LDPCCode.from_alist(text)
    assert code.n_erased_vars == 2 and code.n_erased_checks == 1
    assert code.n_effective_inputs == 4
    assert code.n_effective_outputs == 2
    # round-trip through writer
    out = write_alist(code.to_alist_data())
    code2 = LDPCCode.from_alist(out)
    np.testing.assert_array_equal(
        code.out_edge_to_in_bit, code2.out_edge_to_in_bit
    )
    assert code2.n_erased_vars == 2 and code2.n_erased_checks == 1


def test_padded_alist_rows():
    # zero-padded adjacency rows (MacKay style) must parse identically
    padded = """3 6
3 2
3 3 3
2 1 2 1 2 1
1 2 3
3 4 5
1 5 6
"""
    # build a padded variant with max-degree columns
    lines = padded.splitlines()
    lines[4] = "1 2 3"
    code_plain = LDPCCode.from_alist(padded)
    padded2 = "\n".join(lines[:4] + ["1 2 3", "3 4 5", "1 5 6 0"]) + "\n"
    # the extra 0 makes the token count wrong -> falls back to line parsing
    code_padded = LDPCCode.from_alist(padded2)
    np.testing.assert_array_equal(
        code_plain.out_edge_to_in_bit, code_padded.out_edge_to_in_bit
    )


def test_malformed_alist_rejected():
    with pytest.raises(ValueError):
        parse_alist("3 6\n3 2\n3 3 3\n2 1 2 1 2 2\n1 2 3\n3 4 5\n1 5 6\n")


def test_rate():
    code = tiny_code()
    assert rate(code) == pytest.approx(0.5)
    data = code.to_alist_data()
    data.n_erased_vars = 2
    assert rate(LDPCCode.from_alist_data(data)) == pytest.approx(3 / 4)


def test_syndrome_tiny():
    code = tiny_code()
    bits = np.array([1, 0, 1, 1, 0, 1], dtype=np.int8)
    syn = compute_syndrome(code, bits)
    # c0 = v0^v1^v2 = 0, c1 = v2^v3^v4 = 0, c2 = v0^v4^v5 = 0
    np.testing.assert_array_equal(syn, [0, 0, 0])
    bits[3] = 0
    np.testing.assert_array_equal(compute_syndrome(code, bits), [0, 1, 0])


def test_syndrome_batched_matches_matrix():
    code = make_regular_code(96, 3, 6, seed=2)
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, size=(code.n_vars, 17)).astype(np.int8)
    syn = compute_syndrome(code, bits)
    # dense H comparison
    H = np.zeros((code.n_checks, code.n_vars), dtype=np.int64)
    for c in range(code.n_checks):
        for e in range(code.out_bit_to_edge[c], code.out_bit_to_edge[c + 1]):
            H[c, code.out_edge_to_in_bit[e]] += 1
    np.testing.assert_array_equal(syn, (H @ bits.astype(np.int64)) % 2)


def test_generator_properties():
    code = make_irregular_code(
        1000, 500, {2: 0.4, 3: 0.4, 6: 0.2}, {6: 0.5, 7: 0.5}, seed=3
    )
    assert code.n_vars == 1000 and code.n_checks == 500
    # simple graph: no duplicate (check, var) pairs
    pairs = (
        code.out_edge_to_bit.astype(np.int64) * code.n_vars
        + code.out_edge_to_in_bit
    )
    assert len(np.unique(pairs)) == code.n_edges
    assert code.var_degrees.min() >= 2


def test_compiled_code_consistency():
    code = make_irregular_code(
        200, 100, {2: 0.5, 3: 0.3, 5: 0.2}, {5: 0.5, 6: 0.5}, seed=4
    )
    cc = compile_code(code)
    E = code.n_edges
    # permutations are inverse of each other
    np.testing.assert_array_equal(cc.perm_v2c[cc.perm_c2v], np.arange(E))
    np.testing.assert_array_equal(cc.perm_c2v[cc.perm_v2c], np.arange(E))
    # sorted degrees are nondecreasing and buckets tile the node space
    for buckets, n, degs in [
        (cc.vn_buckets, code.n_vars, code.var_degrees[cc.vn_order]),
        (cc.cn_buckets, code.n_checks, code.check_degrees[cc.cn_order]),
    ]:
        assert (np.diff(degs) >= 0).all()
        assert sum(b.count for b in buckets) == n
        edge_cursor = 0
        row_cursor = 0
        for b in buckets:
            assert b.row_start == row_cursor
            assert b.edge_start == edge_cursor
            row_cursor += b.count
            edge_cursor += b.count * b.degree
        assert edge_cursor == E
    # cn_edge_vnrow consistency: the variable of cn-edge t, seen through the
    # v2c permutation, must map to the same sorted vn row
    # build vnedge -> sorted vn row from buckets
    vnrow_of_vnedge = np.empty(E, dtype=np.int64)
    for b in cc.vn_buckets:
        rows = np.repeat(
            np.arange(b.row_start, b.row_start + b.count), b.degree
        )
        vnrow_of_vnedge[b.edge_start : b.edge_start + b.count * b.degree] = rows
    np.testing.assert_array_equal(
        cc.cn_edge_vnrow, vnrow_of_vnedge[cc.perm_v2c]
    )


def test_compiled_permutation_carries_edges():
    """A vn-edge and its image under perm_c2v must be the same physical
    (variable, check) edge."""
    code = make_regular_code(60, 3, 6, seed=5)
    cc = compile_code(code)
    E = code.n_edges
    # physical (var, check) of each vnedge
    from ldpc_decoder_tpu.codes.compiled import _concat_ranges

    vnedge_to_inedge = _concat_ranges(
        code.in_bit_to_edge[cc.vn_order], code.var_degrees[cc.vn_order]
    )
    cnedge_to_outedge = _concat_ranges(
        code.out_bit_to_edge[cc.cn_order], code.check_degrees[cc.cn_order]
    )
    var_of_vnedge = code.in_edge_to_bit[vnedge_to_inedge]
    check_of_vnedge = code.out_edge_to_bit[
        code.edge_in_to_out[vnedge_to_inedge]
    ]
    var_of_cnedge = code.in_edge_to_bit[
        code.edge_out_to_in[cnedge_to_outedge]
    ]
    check_of_cnedge = code.out_edge_to_bit[cnedge_to_outedge]
    np.testing.assert_array_equal(var_of_cnedge, var_of_vnedge[cc.perm_v2c])
    np.testing.assert_array_equal(
        check_of_cnedge, check_of_vnedge[cc.perm_v2c]
    )
