"""Split the grouped-superstep time into compute (phi) vs HBM traffic.

Times run_iterations_qc_grouped on the flagship p41 tables at B=256:
  (a) as shipped (phi = -log tanh + exp tail, 2E evals/iter)
  (b) phi monkeypatched to identity (same traffic, ~zero transcendentals)
  (c) k scaling (k=4 vs k=14) to expose per-superstep fixed cost
and prints achieved GB/s against runtime/perf.py's exact byte accounting.

Timing per CLAUDE.md: end-to-end wall with values fetched (axon elides
unfetched work); several reps, min taken.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from bench import get_code  # noqa: E402
from ldpc_decoder_tpu.ops import qc_pallas_grouped as g  # noqa: E402
from ldpc_decoder_tpu.ops.qc_decode import QCDecodeTables  # noqa: E402
from ldpc_decoder_tpu.runtime import perf  # noqa: E402

B = 256
DTYPE = jnp.bfloat16


def make_state(tables, key):
    Z = tables.Z
    k1, k2, k3, k4 = jax.random.split(key, 4)
    m = (jax.random.normal(k1, (tables.nbv_pad * Z, B), jnp.float32)
         * 0.5 + 1.0).astype(DTYPE)
    rc = jnp.zeros((tables.nbc_pad * Z, B), DTYPE)
    llr = (jax.random.normal(k2, (tables.n_vars, B), jnp.float32)
           * 2.0 + 1.0).astype(DTYPE)
    syn = jax.random.bernoulli(k3, 0.5, (tables.n_checks, B)).astype(
        jnp.int8)
    return (m, rc), llr, syn


def run(tables, state, k, reps=4, tag=""):
    (m, rc), llr, syn = state
    # fresh trace every time (phi may have been monkeypatched)
    g.run_iterations_qc_grouped.clear_cache()
    t0 = time.perf_counter()
    out = g.run_iterations_qc_grouped((m, rc), llr, syn, tables, k)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = g.run_iterations_qc_grouped((m, rc), llr, syn, tables, k)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    bpi = perf.grouped_bytes_per_iter(tables, B, msg_bytes=2)
    per_iter = best / k
    print(f"{tag}: k={k} best={best*1e3:.1f}ms  per-iter={per_iter*1e3:.2f}ms"
          f"  achieved={bpi/per_iter/1e9:.0f} GB/s"
          f"  (compile {compile_s:.1f}s)", flush=True)
    return per_iter


def main():
    code, qc = get_code()
    t = QCDecodeTables.from_structure(qc, code.n_erased_vars)
    tables = g.GroupedQCPallasTables.from_qc_tables(t, msg_bytes=2)
    print(f"Z={tables.Z} C={tables.C} R={tables.R} tile={tables.tile} "
          f"seam={tables.seam} nb={tables.nb}", flush=True)
    print("row groups:", [(gr.count, gr.degree) for gr in tables.row_groups])
    print("col groups:", [(gr.count, gr.degree) for gr in tables.col_groups])
    bpi = perf.grouped_bytes_per_iter(tables, B, msg_bytes=2)
    print(f"bytes/iter = {bpi/1e9:.2f} GB", flush=True)

    state = make_state(tables, jax.random.PRNGKey(0))

    run(tables, state, 14, tag="baseline")
    run(tables, state, 4, tag="baseline")

    orig = g._phi_abs_f32
    try:
        g._phi_abs_f32 = lambda x, high=None, pre=None: x
        run(tables, state, 14, tag="phi=identity")
        run(tables, state, 4, tag="phi=identity")
    finally:
        g._phi_abs_f32 = orig
        g.run_iterations_qc_grouped.clear_cache()


if __name__ == "__main__":
    main()
