"""Indict/exonerate input_output_aliases in the grouped kernels: run the
same decode with per-group outputs assembled by concatenation (no aliasing)
and compare convergence."""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ldpc_decoder_tpu.codes.qc import load_qc_alist
from ldpc_decoder_tpu.channels import BIAWGNChannel
from ldpc_decoder_tpu.runtime.datagen import create_data
from ldpc_decoder_tpu.runtime.decoder import LDPCDecoder
from ldpc_decoder_tpu.runtime.params import StaticParams
from ldpc_decoder_tpu.ops import qc_pallas_grouped as qg


def cn_pass_noalias(msgs_v, syn3, tables, alg="sum-product", beta=0.0):
    T, Z, B = tables.tile, tables.Z, msgs_v.shape[-1]
    NT = Z // T
    lb = qg._lane_block(B)
    rps = qg._rps(tables.seam)
    parts = []
    pos = 0
    for g in tables.row_groups:
        d = g.degree
        if g.block_start > pos:
            parts.append(jnp.zeros((g.block_start - pos, Z, B),
                                   msgs_v.dtype))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(g.count, NT, B // lb),
            in_specs=qg._rot_specs_flat(d, T, NT, lb, tables.seam,
                                        g.block_start)
            + [
                pl.BlockSpec((1, T, lb),
                             lambda i, j, l, *_, _ns=g.node_start:
                             (_ns + i, j, l),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (d, T, lb),
                lambda i, j, l, *_, _bs=g.block_start // d:
                (_bs - g.block_start // d + i, j, l),
                memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((qg._scratch_rows(T, tables.seam), lb),
                           jnp.float32)
            ],
        )
        out = pl.pallas_call(
            partial(qg._cn_kernel_g, d=d, tile=T, seam=tables.seam, alg=alg,
                    beta=beta, block_start=g.block_start),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((g.count * d, Z, B),
                                           msgs_v.dtype),
        )(tables.cn_read, *([msgs_v] * (rps * d)), syn3,
          jnp.zeros((1,), msgs_v.dtype))
        parts.append(out)
        pos = g.block_start + g.count * d
    return jnp.concatenate(parts, axis=0)


def vn_pass_noalias(r_c, llr3, tables, emit_bits, alg="sum-product",
                    clamp=64.0):
    T, Z, B = tables.tile, tables.Z, r_c.shape[-1]
    NT = Z // T
    lb = qg._lane_block(B)
    rps = qg._rps(tables.seam)
    parts, bits_parts = [], []
    pos = 0
    for g in tables.col_groups:
        d = g.degree
        if g.block_start > pos:
            parts.append(jnp.zeros((g.block_start - pos, Z, B), r_c.dtype))
        out_specs = [pl.BlockSpec((d, T, lb),
                                  lambda i, j, l, *_: (i, j, l),
                                  memory_space=pltpu.VMEM)]
        out_shape = [jax.ShapeDtypeStruct((g.count * d, Z, B), r_c.dtype)]
        if emit_bits:
            out_specs.append(pl.BlockSpec((1, T, lb),
                                          lambda i, j, l, *_: (i, j, l),
                                          memory_space=pltpu.VMEM))
            out_shape.append(jax.ShapeDtypeStruct((g.count, Z, B),
                                                  jnp.int8))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(g.count, NT, B // lb),
            in_specs=qg._rot_specs_flat(d, T, NT, lb, tables.seam,
                                        g.block_start)
            + [
                pl.BlockSpec((1, T, lb),
                             lambda i, j, l, *_, _ns=g.node_start:
                             (_ns + i, j, l),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((qg._scratch_rows(T, tables.seam), lb),
                           jnp.float32)
            ],
        )
        out = pl.pallas_call(
            partial(qg._vn_kernel_g, d=d, tile=T, seam=tables.seam,
                    emit_bits=emit_bits, alg=alg, clamp=clamp,
                    block_start=g.block_start),
            grid_spec=grid_spec,
            out_shape=out_shape,
        )(tables.vn_read, *([r_c] * (rps * d)), llr3,
          jnp.zeros((1,), r_c.dtype))
        if emit_bits:
            parts.append(out[0])
            bits_parts.append(out[1])
        else:
            parts.append(out[0] if isinstance(out, (list, tuple)) else out)
        pos = g.block_start + g.count * d
    msgs = jnp.concatenate(parts, axis=0)
    if emit_bits:
        return msgs, jnp.concatenate(bits_parts, axis=0)
    return msgs, None


@partial(jax.jit, static_argnames=("k",))
def run_noalias(msgs2d, llr2d, syn2d, tables, k):
    B = msgs2d.shape[-1]
    Z = tables.Z
    msgs = msgs2d.reshape(tables.nbv_pad, Z, B)
    llr = llr2d.reshape(tables.C, Z, B).astype(msgs.dtype)
    syn = syn2d.reshape(tables.R, Z, B)

    def body(_, m):
        rc = cn_pass_noalias(m, syn, tables)
        m2, _ = vn_pass_noalias(rc, llr, tables, emit_bits=False)
        return m2

    msgs = jax.lax.fori_loop(0, k - 1, body, msgs)
    rc = cn_pass_noalias(msgs, syn, tables)
    msgs, bits = vn_pass_noalias(rc, llr, tables, emit_bits=True)
    violated = qg.parity_pass_grouped(bits, syn, tables)
    return msgs.reshape(-1, B), bits.reshape(tables.n_vars, B), violated


def main():
    code, s = load_qc_alist("codes_cache/bench_ru24_awgn_r05_1032192_g8.alist")
    ch = BIAWGNChannel(0.70)
    dec = LDPCDecoder(code, ch, StaticParams(max_log_parallel_factor_user=5,
                                             kernel_impl="pallas",
                                             message_dtype="bfloat16"),
                      qc=s)
    t = dec.tables
    B = 32
    batch = create_data(code, ch, 0, B, backend="native")
    llr = jnp.asarray(ch.llr_np(batch.values)[np.asarray(t.vn_order)])
    syn = jnp.asarray(batch.syndromes[np.asarray(t.cn_order)])
    m = dec._init_messages(llr, t, dtype=jnp.bfloat16)
    _, bits, viol = run_noalias(m, llr, syn, t, 30)
    bits_nat = np.asarray(bits)[np.asarray(t.vn_pos)]
    errs = (bits_nat != batch.ref_bits).sum(axis=0)
    print(f"NO-ALIAS Z=43008 sigma 0.70 bf16: viol "
          f"{np.asarray(viol).mean():.3f} FER {(errs > 0).mean():.3f}",
          flush=True)


if __name__ == "__main__":
    main()
