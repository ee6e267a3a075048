"""BP decode core: algorithmic identity vs a literal numpy reference,
plus end-to-end convergence on small codes."""

import jax.numpy as jnp
import numpy as np

from ldpc_decoder_tpu.channels import BIAWGNChannel, BSCChannel
from ldpc_decoder_tpu.codes.code import compute_syndrome
from ldpc_decoder_tpu.codes.compiled import compile_code
from ldpc_decoder_tpu.codes.generate import make_irregular_code, make_regular_code
from ldpc_decoder_tpu.ops.decode import (
    DecodeTables,
    bp_iteration,
    hard_bits,
    init_messages,
    parity_violations,
    run_iterations,
)
from ldpc_decoder_tpu.ops.phi import phi_abs_np


def _phi_np(x):
    return np.copysign(phi_abs_np(np.abs(x)), x)


def numpy_flood_reference(code, llr, syn, iters):
    """Literal float64 transcription of the reference algorithm
    (flood.cu:77-156) on natural-order arrays. llr: [n_vars, B],
    syn: [n_checks, B]. Returns (msgs_outedge [E, B], totals [n_vars, B])."""
    B = llr.shape[1]
    var_of_outedge = code.out_edge_to_in_bit
    msgs = _phi_np(llr[var_of_outedge].astype(np.float64))
    totals = np.zeros((code.n_vars, B))
    for _ in range(iters):
        # check-node pass
        r = np.empty_like(msgs)
        for c in range(code.n_checks):
            sl = slice(code.out_bit_to_edge[c], code.out_bit_to_edge[c + 1])
            m = msgs[sl]
            ext = np.abs(m).sum(axis=0, keepdims=True)
            parity = (
                syn[c].astype(np.int64)
                + (~np.signbit(m)).sum(axis=0)
            ) & 1
            res = phi_abs_np(ext - np.abs(m))
            is_neg = np.signbit(m).astype(np.int64) ^ parity[None, :]
            r[sl] = np.where(is_neg == 1, -res, res)
        # variable-node pass
        for v in range(code.n_vars):
            sl = slice(code.in_bit_to_edge[v], code.in_bit_to_edge[v + 1])
            incoming = r[code.edge_in_to_out[sl]]
            total = llr[v].astype(np.float64) + incoming.sum(axis=0)
            totals[v] = total
            msgs[code.edge_in_to_out[sl]] = _phi_np(total[None, :] - incoming)
    return msgs, totals


def _setup(code, sigma=0.8, B=4, seed=0):
    rng = np.random.default_rng(seed)
    cc = compile_code(code)
    tables = DecodeTables.from_compiled(cc)
    bits = rng.integers(0, 2, size=(code.n_vars, B)).astype(np.int8)
    syn = compute_syndrome(code, bits)
    ch = BIAWGNChannel(sigma)
    tx = np.where(bits > 0, 1.0, -1.0).astype(np.float32)
    rx = tx + rng.normal(0, sigma, size=tx.shape).astype(np.float32)
    llr = ch.llr_np(rx)
    return cc, tables, bits, syn, llr


def test_bp_iteration_matches_numpy_reference():
    code = make_irregular_code(
        48, 24, {2: 0.5, 3: 0.3, 4: 0.2}, {5: 0.5, 6: 0.5}, seed=1
    )
    cc, tables, bits, syn, llr = _setup(code, sigma=0.9, B=3, seed=2)

    llr_s = jnp.asarray(llr[cc.vn_order])
    syn_s = jnp.asarray(syn[cc.cn_order])
    msgs = init_messages(llr_s, tables)
    for it in range(1, 4):
        msgs, totals = bp_iteration(msgs, llr_s, syn_s, tables)
        ref_msgs, ref_totals = numpy_flood_reference(
            code, llr, syn, iters=it
        )
        # map natural-order reference to sorted layout for comparison
        np.testing.assert_allclose(
            np.asarray(totals), ref_totals[cc.vn_order],
            rtol=2e-3, atol=2e-3,
        )
        # msgs are cn-edge (sorted) order; reference is out-edge natural
        from ldpc_decoder_tpu.codes.compiled import _concat_ranges

        cnedge_to_outedge = _concat_ranges(
            code.out_bit_to_edge[cc.cn_order],
            code.check_degrees[cc.cn_order],
        )
        np.testing.assert_allclose(
            np.asarray(msgs), ref_msgs[cnedge_to_outedge],
            rtol=2e-3, atol=2e-3,
        )


def test_init_messages_is_phi_of_llr():
    code = make_regular_code(32, 3, 6, seed=3)
    cc, tables, _, syn, llr = _setup(code, B=2, seed=4)
    msgs = np.asarray(init_messages(jnp.asarray(llr[cc.vn_order]), tables))
    from ldpc_decoder_tpu.codes.compiled import _concat_ranges

    cnedge_to_outedge = _concat_ranges(
        code.out_bit_to_edge[cc.cn_order], code.check_degrees[cc.cn_order]
    )
    want = _phi_np(llr.astype(np.float64))[code.out_edge_to_in_bit][
        cnedge_to_outedge
    ]
    np.testing.assert_allclose(msgs, want, rtol=1e-3, atol=1e-4)


def test_end_to_end_syndrome_decode_awgn():
    """Random data (not codewords) + syndrome decoding below threshold
    recovers the exact reference bits — the reference's core test
    mechanism (README.md:11)."""
    code = make_regular_code(1024, 3, 6, seed=5)
    cc, tables, bits, syn, llr = _setup(code, sigma=0.72, B=8, seed=6)
    llr_s = jnp.asarray(llr[cc.vn_order])
    syn_s = jnp.asarray(syn[cc.cn_order])
    msgs = init_messages(llr_s, tables)
    msgs, out_bits, violated = run_iterations(msgs, llr_s, syn_s, tables, 40)
    assert not bool(np.asarray(violated).any())
    decoded_nat = np.asarray(out_bits)[np.asarray(tables.vn_pos)]
    np.testing.assert_array_equal(decoded_nat, bits)


def test_end_to_end_bsc():
    code = make_regular_code(1024, 3, 6, seed=7)
    rng = np.random.default_rng(8)
    cc = compile_code(code)
    tables = DecodeTables.from_compiled(cc)
    bits = rng.integers(0, 2, size=(code.n_vars, 4)).astype(np.int8)
    syn = compute_syndrome(code, bits)
    ch = BSCChannel(0.04)
    tx = np.where(bits > 0, 1.0, -1.0).astype(np.float32)
    flips = rng.random(tx.shape) < 0.04
    rx = np.where(flips, -tx, tx)
    llr = ch.llr_np(rx)
    llr_s = jnp.asarray(llr[cc.vn_order])
    syn_s = jnp.asarray(syn[cc.cn_order])
    msgs = init_messages(llr_s, tables)
    msgs, out_bits, violated = run_iterations(msgs, llr_s, syn_s, tables, 40)
    assert not bool(np.asarray(violated).any())
    np.testing.assert_array_equal(
        np.asarray(out_bits)[np.asarray(tables.vn_pos)], bits
    )


def test_parity_violations_flags_bad_frames():
    code = make_regular_code(128, 3, 6, seed=9)
    cc = compile_code(code)
    tables = DecodeTables.from_compiled(cc)
    rng = np.random.default_rng(10)
    bits = rng.integers(0, 2, size=(code.n_vars, 3)).astype(np.int8)
    syn = compute_syndrome(code, bits)
    bits_bad = bits.copy()
    bits_bad[5, 1] ^= 1  # corrupt frame 1
    v = parity_violations(
        jnp.asarray(bits_bad[cc.vn_order]),
        jnp.asarray(syn[cc.cn_order]),
        tables,
    )
    np.testing.assert_array_equal(np.asarray(v), [False, True, False])


def test_bf16_message_storage_still_decodes():
    code = make_regular_code(1024, 3, 6, seed=11)
    cc, tables, bits, syn, llr = _setup(code, sigma=0.7, B=4, seed=12)
    llr_s = jnp.asarray(llr[cc.vn_order])
    syn_s = jnp.asarray(syn[cc.cn_order])
    msgs = init_messages(llr_s, tables, dtype=jnp.bfloat16)
    assert msgs.dtype == jnp.bfloat16
    msgs, out_bits, violated = run_iterations(msgs, llr_s, syn_s, tables, 40)
    assert msgs.dtype == jnp.bfloat16
    assert not bool(np.asarray(violated).any())
    np.testing.assert_array_equal(
        np.asarray(out_bits)[np.asarray(tables.vn_pos)], bits
    )
