"""Hybrid chains to find which grouped pass poisons long runs on TPU."""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from ldpc_decoder_tpu.codes.protographs import ru_irregular_base
from ldpc_decoder_tpu.codes.qc import make_qc_code
from ldpc_decoder_tpu.channels import BIAWGNChannel
from ldpc_decoder_tpu.runtime.datagen import create_data
from ldpc_decoder_tpu.runtime.decoder import LDPCDecoder
from ldpc_decoder_tpu.runtime.params import StaticParams
from ldpc_decoder_tpu.ops import qc_decode as qx
from ldpc_decoder_tpu.ops import qc_pallas_grouped as qg


def main():
    base, _ = ru_irregular_base(4, seed=7)
    code, s = make_qc_code(base, Z=32768, seed=2, coarse=1024, fine_mod=64)
    ch = BIAWGNChannel(0.70)
    dec = LDPCDecoder(code, ch, StaticParams(max_log_parallel_factor_user=7,
                                             kernel_impl="pallas"), qc=s)
    dec_x = LDPCDecoder(code, ch, StaticParams(max_log_parallel_factor_user=7,
                                               kernel_impl="xla"), qc=s)
    t, tx = dec.tables, dec_x.tables
    print("tile", t.tile, "seam", t.seam, flush=True)
    B = 128
    batch = create_data(code, ch, 0, B, backend="native")
    llr = jnp.asarray(ch.llr_np(batch.values)[np.asarray(t.vn_order)])
    syn = jnp.asarray(batch.syndromes[np.asarray(t.cn_order)])
    Z = t.Z
    syn3 = syn.reshape(t.R, Z, B)
    llr3 = llr.reshape(t.C, Z, B)
    pc = np.zeros(t.nb, np.int64)
    pv = np.zeros(t.nb, np.int64)
    for bg, g in zip(tx.row_groups, t.row_groups):
        n = g.count * g.degree
        pc[bg.block_start:bg.block_start + n] = g.block_start + np.arange(n)
    for bg, g in zip(tx.col_groups, t.col_groups):
        n = g.count * g.degree
        pv[bg.block_start:bg.block_start + n] = g.block_start + np.arange(n)
    jpc = jnp.asarray(pc)
    jpv = jnp.asarray(pv)

    def fer(m_v):  # vn-order [nb, Z, B] messages -> FER via totals
        r_v = None
        m_c = qx.vn_to_cn(m_v, tx)
        rc = qx.cn_update_qc(m_c, syn3, tx)
        rv = qx.cn_to_vn(rc, tx)
        _, totals = qx.vn_update_qc(rv, llr3, tx)
        bits = (~jnp.signbit(totals)).astype(jnp.int8)
        bits_nat = np.asarray(bits.reshape(t.n_vars, B))[np.asarray(t.vn_pos)]
        errs = (bits_nat != batch.ref_bits).sum(axis=0)
        return (errs > 0).mean()

    m0_v = qx.cn_to_vn(
        dec_x._init_messages(llr, tx, dtype=jnp.float32).reshape(
            tx.n_blocks, Z, B), tx)

    # A: pallas CN + XLA VN
    m_v = m0_v
    for i in range(30):
        rc_pad = qg.cn_pass_grouped(
            jnp.zeros((t.nbv_pad, Z, B), jnp.float32).at[jpv].set(m_v),
            syn3, jnp.zeros((t.nbc_pad, Z, B), jnp.float32), t)
        rc_c = rc_pad[jpc]
        rv = qx.cn_to_vn(rc_c, tx)
        m_v, _ = qx.vn_update_qc(rv, llr3, tx)
    print("hybrid A (pallas CN): FER", fer(m_v), flush=True)

    # B: XLA CN + pallas VN
    m_v = m0_v
    for i in range(30):
        m_c = qx.vn_to_cn(m_v, tx)
        rc_c = qx.cn_update_qc(m_c, syn3, tx)
        rc_pad = jnp.zeros((t.nbc_pad, Z, B), jnp.float32).at[jpc].set(rc_c)
        m_pad, _ = qg.vn_pass_grouped(
            rc_pad, llr3, jnp.zeros((t.nbv_pad, Z, B), jnp.float32), t,
            emit_bits=False)
        m_v = m_pad[jpv]
    print("hybrid B (pallas VN): FER", fer(m_v), flush=True)


if __name__ == "__main__":
    main()
