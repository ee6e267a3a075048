"""Microbenchmark: per-pass timing of the fused QC Pallas kernels.

Decomposes one BP iteration (cn_pass + vn_pass) on the flagship bench code
to find where time goes (HBM traffic vs VPU/staging overhead).

Usage: python scripts/micro_qc.py [B] [dtype]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from bench import get_reg36_code as get_code  # noqa: E402
from ldpc_decoder_tpu.ops.qc_decode import QCDecodeTables  # noqa: E402
from ldpc_decoder_tpu.ops.qc_pallas import (  # noqa: E402
    QCPallasTables,
    cn_pass,
    vn_pass,
    init_messages_qc_pallas,
    run_iterations_qc_pallas,
)


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    dtype = jnp.bfloat16 if (len(sys.argv) < 3
                             or sys.argv[2] in ("bf16", "bfloat16")) \
        else jnp.float32
    code, qc = get_code()
    t = QCDecodeTables.from_structure(qc)
    tp = QCPallasTables.from_qc_tables(t)
    Z, C, R, d_v, d_c = tp.Z, tp.C, tp.R, tp.d_v, tp.d_c
    E = tp.n_edges
    mb = 2 if dtype == jnp.bfloat16 else 4
    print(f"Z={Z} C={C} R={R} d_v={d_v} d_c={d_c} E={E} B={B} "
          f"tile={tp.tile} dtype={dtype.__name__}")

    key = jax.random.PRNGKey(0)
    llr2 = jax.random.normal(key, (tp.n_vars, B), jnp.float32) * 4
    syn2 = jnp.zeros((tp.n_checks, B), jnp.int8)
    msgs2 = init_messages_qc_pallas(llr2, tp, dtype=dtype)

    msgs = msgs2.reshape(C, d_v, Z, B)
    llr3 = llr2.reshape(C, Z, B)
    syn3 = syn2.reshape(R, Z, B)

    cn = jax.jit(lambda m, s: cn_pass(m, s, tp))
    vn = jax.jit(lambda r, l: vn_pass(r, l, tp))

    t_cn = timeit(cn, msgs, syn3)
    r_c = cn(msgs, syn3)
    t_vn = timeit(vn, r_c, llr3)

    ev = E * B * mb / 1e9  # edge volume GB
    # traffic: cn reads 2x pairs + syn int8 + writes 1x
    cn_gb = 2 * ev + ev + tp.n_checks * B / 1e9
    vn_gb = 2 * ev + ev + tp.n_vars * B * 4 / 1e9 + tp.n_vars * B * 4 / 1e9
    print(f"cn_pass: {t_cn*1e3:8.3f} ms  ({cn_gb:.2f} GB -> "
          f"{cn_gb/t_cn:.0f} GB/s apparent)")
    print(f"vn_pass: {t_vn*1e3:8.3f} ms  ({vn_gb:.2f} GB -> "
          f"{vn_gb/t_vn:.0f} GB/s apparent)")

    t_it = timeit(
        lambda m, l, s: run_iterations_qc_pallas(m, l, s, tp, 10),
        msgs2, llr2, syn2, n=3, warmup=1)
    print(f"10-iter superstep: {t_it*1e3:.1f} ms -> {t_it*1e2:.2f} ms/iter "
          f"(sum of passes {1e3*(t_cn+t_vn):.2f} ms)")
    mbps = code.n_vars / (90.7 * (t_it / 10 / B) * 1048576)
    print(f"implied decode throughput @90.7 iters: {mbps:.1f} Mb/s")


if __name__ == "__main__":
    main()
