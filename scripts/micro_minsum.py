"""Measure the min-sum marginal iteration time on the flagship tables.

The round-3 profile (scripts/micro_phi.py) showed the grouped kernels are
compute-bound on φ: 15.3 ms/iter vs 11.98 ms with φ stubbed (607 GB/s DMA
floor). Min-sum replaces the φ chain (tanh+log+exp per CN input + per VN
output) with a two-minimum compare ladder — this script measures how much
of the 3.3 ms φ budget it actually recovers (the compare ladder is not
free on the VPU, and the CN kernel's min1/min2/pos tracking adds selects).

Method per CLAUDE.md: k=14 vs k=28 superstep slope at B=256, values
fetched, min of reps.
"""

import sys
import time

import jax
import numpy as np

sys.path.insert(0, "/root/repo")

from bench import get_code  # noqa: E402
from ldpc_decoder_tpu.ops import qc_pallas_grouped as g  # noqa: E402
from ldpc_decoder_tpu.ops.qc_decode import QCDecodeTables  # noqa: E402
from ldpc_decoder_tpu.runtime import perf  # noqa: E402
from scripts.micro_phi import make_state, B  # noqa: E402


def run(tables, state, k, alg, alpha=1.0, reps=4):
    (m, rc), llr, syn = state
    fn = lambda: g.run_iterations_qc_grouped(  # noqa: E731
        (m, rc), llr, syn, tables, k, alg=alg, beta=0.0, alpha=alpha)
    jax.block_until_ready(fn())  # compile
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def make_state_int8(tables, key):
    import jax.numpy as jnp

    Z = tables.Z
    k1, k2, k3, _ = jax.random.split(key, 4)
    m32 = (jax.random.normal(k1, (tables.nbv_pad * Z, B), jnp.float32)
           * 2.0 + 1.0)
    m = jnp.clip(jnp.round(m32 * 4.0), -127, 127).astype(jnp.int8)
    rc = jnp.zeros((tables.nbc_pad * Z, B), jnp.int8)
    llr = (jax.random.normal(k2, (tables.n_vars, B), jnp.float32)
           * 2.0 + 1.0).astype(jnp.bfloat16)
    syn = jax.random.bernoulli(k3, 0.5, (tables.n_checks, B)).astype(
        jnp.int8)
    return (m, rc), llr, syn


def main():
    import os

    code, qc = get_code()
    t = QCDecodeTables.from_structure(qc, code.n_erased_vars)
    which = os.environ.get("MM_WHICH", "bf16,int8")
    if "bf16" in which:
        tables = g.GroupedQCPallasTables.from_qc_tables(t, msg_bytes=2)
        state = make_state(tables, jax.random.PRNGKey(0))
        bpi = perf.grouped_bytes_per_iter(tables, B, msg_bytes=2)
        for alg, alpha in (("sum-product", 1.0), ("min-sum", 1.0),
                           ("min-sum", 0.875)):
            t14 = run(tables, state, 14, alg, alpha)
            t28 = run(tables, state, 28, alg, alpha)
            marg = (t28 - t14) / 14
            print(f"bf16 {alg} alpha={alpha}: k14={t14*1e3:.1f}ms "
                  f"k28={t28*1e3:.1f}ms marginal={marg*1e3:.2f}ms/iter"
                  f"  achieved={bpi/marg/1e9:.0f} GB/s", flush=True)
    if "int8" in which:
        tables8 = g.GroupedQCPallasTables.from_qc_tables(t, msg_bytes=1)
        state8 = make_state_int8(tables8, jax.random.PRNGKey(0))
        bpi8 = perf.grouped_bytes_per_iter(tables8, B, msg_bytes=1)
        print(f"int8 tables: tile={tables8.tile} seam={tables8.seam} "
              f"bytes/iter={bpi8/1e9:.2f} GB", flush=True)
        for alpha in (1.0, 0.95):
            t14 = run(tables8, state8, 14, "min-sum", alpha)
            t28 = run(tables8, state8, 28, "min-sum", alpha)
            marg = (t28 - t14) / 14
            print(f"int8 min-sum alpha={alpha}: k14={t14*1e3:.1f}ms "
                  f"k28={t28*1e3:.1f}ms marginal={marg*1e3:.2f}ms/iter"
                  f"  achieved={bpi8/marg/1e9:.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()
