"""Break down the per-superstep fixed cost of run_iterations_qc_grouped.

Times: trivial dispatch RTT, body-only loops (cn+vn, no emit/parity) at
several k, and the full superstep at several k. Slope = marginal
iteration; intercept = per-call fixed (emit + parity + dispatch).
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from bench import get_code  # noqa: E402
from ldpc_decoder_tpu.ops import qc_pallas_grouped as g  # noqa: E402
from ldpc_decoder_tpu.ops.qc_decode import QCDecodeTables  # noqa: E402
from scripts.micro_phi import make_state, B  # noqa: E402


@partial(jax.jit, static_argnames=("k",))
def body_only(msgs2d, llr2d, syn2d, tables, k):
    msgs2d, rc2d = msgs2d
    Bl = msgs2d.shape[-1]
    Z = tables.Z
    msgs = msgs2d.reshape(tables.nbv_pad, Z, Bl)
    llr = llr2d.reshape(tables.C, Z, Bl).astype(msgs.dtype)
    syn = syn2d.reshape(tables.R, Z, Bl)
    r_c0 = rc2d.reshape(tables.nbc_pad, Z, Bl)

    def body(_, carry):
        m, rc = carry
        rc = g.cn_pass_grouped(m, syn, rc, tables)
        m, _ = g.vn_pass_grouped(rc, llr, m, tables, emit_bits=False)
        return m, rc

    m, rc = jax.lax.fori_loop(0, k, body, (msgs, r_c0))
    return m.reshape(-1, Bl), rc.reshape(-1, Bl)


def t_best(fn, reps=4):
    fn()  # compile
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    code, qc = get_code()
    t = QCDecodeTables.from_structure(qc, code.n_erased_vars)
    tables = g.GroupedQCPallasTables.from_qc_tables(t, msg_bytes=2)
    state = make_state(tables, jax.random.PRNGKey(0))
    (m, rc), llr, syn = state

    x = jnp.ones((8, 128), jnp.float32)
    f = jax.jit(lambda a: a + 1.0)
    rtt = t_best(lambda: jax.block_until_ready(f(x)), reps=8)
    print(f"trivial dispatch RTT: {rtt*1e3:.2f}ms", flush=True)

    for k in (4, 14, 28):
        bt = t_best(lambda k=k: jax.block_until_ready(
            body_only((m, rc), llr, syn, tables, k)))
        print(f"body-only k={k}: {bt*1e3:.1f}ms  ({bt/k*1e3:.2f}ms/iter)",
              flush=True)
    for k in (4, 14, 28):
        ft = t_best(lambda k=k: jax.block_until_ready(
            g.run_iterations_qc_grouped((m, rc), llr, syn, tables, k)))
        print(f"full k={k}: {ft*1e3:.1f}ms  ({ft/k*1e3:.2f}ms/iter)",
              flush=True)


if __name__ == "__main__":
    main()
