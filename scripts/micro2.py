"""Round-2 kernel decomposition: where do the ~2x-over-roofline cycles go?

Measures on the flagship (3,6) 2^20 code, bf16, B=256:
  1. cn/vn/parity at tile 1024 (the decoder's actual bf16 config) and 512
  2. staging-skip variants (monkeypatched _window -> aligned read, no
     VMEM staging copy, no dynamic slice) to isolate the VPU staging cost
  3. a pure copy kernel (same block pipeline, no compute) as the DMA
     roofline probe

Usage: python scripts/micro2.py [B]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from bench import get_reg36_code as get_code  # noqa: E402
from ldpc_decoder_tpu.ops import qc_pallas as qp  # noqa: E402
from ldpc_decoder_tpu.ops.qc_decode import QCDecodeTables  # noqa: E402


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def bench_tables(tp, msgs, syn3, llr3, label):
    E, B = tp.n_edges, msgs.shape[-1]
    ev = E * B * 2 / 1e9  # bf16 edge volume GB
    cn = jax.jit(lambda m, s: qp.cn_pass(m, s, tp))
    vn = jax.jit(lambda r, l: qp.vn_pass(r, l, tp, emit_bits=False))
    t_cn = timeit(cn, msgs, syn3)
    r_c = cn(msgs, syn3)
    t_vn = timeit(vn, r_c, llr3)
    # true traffic: read E + seam/tile halo + write E (+ llr for vn)
    halo = tp.seam / tp.tile if tp.seam else 1.0
    cn_gb = ev * (1 + halo) + ev + tp.n_checks * B / 1e9
    vn_gb = ev * (1 + halo) + ev + tp.n_vars * B * 2 / 1e9
    print(f"{label}: cn {t_cn*1e3:7.3f} ms ({cn_gb/t_cn:.0f} GB/s)   "
          f"vn {t_vn*1e3:7.3f} ms ({vn_gb/t_vn:.0f} GB/s)", flush=True)
    return t_cn, t_vn, r_c


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    code, qc = get_code()
    t = QCDecodeTables.from_structure(qc)
    key = jax.random.PRNGKey(0)
    llr2 = jax.random.normal(key, (t.n_vars, B), jnp.float32) * 4

    import os
    for mb in (2,):
        tp = qp.QCPallasTables.from_qc_tables(t, msg_bytes=mb)
        Z, C, R, d_v, d_c = tp.Z, tp.C, tp.R, tp.d_v, tp.d_c
        msgs2 = qp.init_messages_qc_pallas(llr2, tp, dtype=jnp.bfloat16)
        msgs = msgs2.reshape(C, d_v, Z, B)
        llr3 = llr2.reshape(C, Z, B).astype(jnp.bfloat16)
        syn3 = jnp.zeros((R, Z, B), jnp.int8)
        label = f"tile={tp.tile} seam={tp.seam}"
        t_cn, t_vn, r_c = bench_tables(tp, msgs, syn3, llr3, label)

        # parity cost
        bits = jnp.zeros((C, Z, B), jnp.int8)
        par = jax.jit(lambda b, s: qp.parity_pass(b, s, tp))
        t_par = timeit(par, bits, syn3)
        print(f"  parity: {t_par*1e3:.3f} ms", flush=True)

        # wider lane blocks: 512B contiguous DMA rows instead of 256B
        os.environ["LDPC_LANE_BLOCK"] = "256"
        os.environ["LDPC_VMEM_LIMIT_MB"] = "64"
        os.environ["LDPC_TILE_BUDGET"] = "6144"  # tile 512 at d=6 bf16
        try:
            bench_tables(tp, msgs, syn3, llr3, label + " LB256")
            t_par = timeit(jax.jit(lambda b, s: qp.parity_pass(b, s, tp)),
                           bits, syn3)
            print(f"  parity LB256: {t_par*1e3:.3f} ms", flush=True)
        except Exception as e:
            print(f"  LB256 failed: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
        finally:
            del os.environ["LDPC_LANE_BLOCK"]
            del os.environ["LDPC_VMEM_LIMIT_MB"]
            del os.environ["LDPC_TILE_BUDGET"]

    # roofline probe: copy E bf16 values through the same grid shape
    tp = qp.QCPallasTables.from_qc_tables(t, msg_bytes=2)
    Z, C, R, d_v, d_c = tp.Z, tp.C, tp.R, tp.d_v, tp.d_c
    from functools import partial
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T = tp.tile
    NT = Z // T
    lb = qp._lane_block(B)
    msgs2 = qp.init_messages_qc_pallas(llr2, tp, dtype=jnp.bfloat16)
    msgs = msgs2.reshape(C, d_v, Z, B)

    def copy_kernel(tab_ref, *refs):
        for k in range(d_c):
            refs[d_c + 1][0, k] = refs[k][0, 0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(R, NT, B // lb),
        in_specs=[
            pl.BlockSpec((1, 1, T, lb),
                         (lambda i, j, l, tab, _k=k:
                          (tab[i, _k, 0], tab[i, _k, 1],
                           (tab[i, _k, 2] + j) % NT, l)),
                         memory_space=pltpu.VMEM)
            for k in range(d_c)
        ] + [
            pl.BlockSpec((1, T, lb), lambda i, j, l, *_: (i, j, l),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, d_c, T, lb),
                               lambda i, j, l, *_: (i, 0, j, l),
                               memory_space=pltpu.VMEM),
    )
    syn3 = jnp.zeros((R, Z, B), jnp.int8)
    copy = jax.jit(lambda m, s: pl.pallas_call(
        copy_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, d_c, Z, B), msgs.dtype),
        compiler_params=qp._compiler_params(3),
        interpret=qp._interpret(),
    )(tp.cn_read, *([m] * d_c), s))
    t_copy = timeit(copy, msgs, syn3)
    ev = tp.n_edges * B * 2 / 1e9
    print(f"pure-copy probe (tile {T}): {t_copy*1e3:.3f} ms "
          f"({2*ev/t_copy:.0f} GB/s of 819)", flush=True)


if __name__ == "__main__":
    main()
