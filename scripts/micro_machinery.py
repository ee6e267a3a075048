"""Bisect the ~11 ms/superstep always-on machinery of the fused driver.

Variants, all 5 supersteps of k=14 inside one while_loop dispatch:
  A. bare run_iterations (the kernel floor)
  B. A + the retire pack/scatter lax.cond (predicate always False)
  C. B + the refill lax.cond (predicate always False)
  D. the real _build_superstep core (never-converging data)
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from bench import get_code  # noqa: E402
from ldpc_decoder_tpu.channels import BIAWGNChannel  # noqa: E402
from ldpc_decoder_tpu.ops.phi import PRE_THRESHOLD  # noqa: E402
from ldpc_decoder_tpu.runtime.datagen_device import create_pool_device  # noqa: E402
from ldpc_decoder_tpu.runtime.decoder import (  # noqa: E402
    LDPCDecoder,
    _pack_bits_natural,
)
from ldpc_decoder_tpu.runtime.params import DynamicParams, StaticParams  # noqa: E402

K = 14
N_SUPER = 5


def t_best(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    code, qc = get_code()
    ch = BIAWGNChannel(1.2)  # nothing converges
    dec = LDPCDecoder(code, ch, StaticParams(
        max_log_parallel_factor_user=8, message_dtype="bfloat16"), qc=qc)
    B = dec.parallel_factor()
    pool = create_pool_device(dec.cc, dec.tables, ch, 0, B)
    jax.block_until_ready(pool.values_sorted)
    state = dec._init_state(pool.values_sorted, pool.syn_sorted, B)
    tables = dec.tables
    n_words = dec.n_words

    run_it = dec._run_iterations

    def whileify(body_state_fn, init):
        @jax.jit
        def run(s0, pv, ps):
            def body(c):
                i, s = c
                return i + 1, body_state_fn(s, pv, ps)
            _, s = jax.lax.while_loop(
                lambda c: c[0] < N_SUPER, body, (jnp.int32(0), s0))
            return s
        return run, init

    # A: bare
    def body_a(s, pv, ps):
        msgs, bits, viol = run_it(s.msgs, s.llr, s.syn, tables, K,
                                  fresh=s.fresh)
        return s._replace(msgs=msgs)

    # B: + retire cond (never taken)
    def body_b(s, pv, ps):
        msgs, bits, viol = run_it(s.msgs, s.llr, s.syn, tables, K,
                                  fresh=s.fresh)
        iters_done = s.iters_done + K
        done = s.active & (~viol | (iters_done >= 10**9))

        def _retire(op):
            r0, i0 = op
            packed = _pack_bits_natural(bits, tables.vn_pos, n_words)
            rows = jnp.where(done, s.frame_ids, B)
            return r0.at[rows].set(packed), i0.at[rows].set(iters_done)

        results, iters_out = jax.lax.cond(
            jnp.any(done), _retire, lambda op: op,
            (s.results, s.iters_out))
        return s._replace(msgs=msgs, results=results, iters_out=iters_out,
                          iters_done=iters_done)

    # C: B + refill cond (never taken)
    def body_c(s, pv, ps):
        s = body_b(s, pv, ps)
        has_new = s.active & False

        def _refill(op):
            llr0, syn0 = op
            safe = jnp.clip(s.frame_ids, 0, B - 1)
            vals = jnp.take(pv, safe, axis=1)
            llr_new = ch.llr_from_channel(vals).astype(llr0.dtype)
            syn_new = jnp.take(ps, safe, axis=1)
            return (jnp.where(has_new[None, :], llr_new, llr0),
                    jnp.where(has_new[None, :], syn_new, syn0))

        llr, syn = jax.lax.cond(jnp.any(has_new), _refill, lambda op: op,
                                (s.llr, s.syn))
        return s._replace(llr=llr, syn=syn)

    # D: the real core
    core = dec._build_superstep(K, 10**9, B, PRE_THRESHOLD)

    for name, body in (("A bare", body_a), ("B +retire", body_b),
                       ("C +refill", body_c), ("D real", core)):
        run, _ = whileify(body, state)
        t = t_best(run, state, pool.values_sorted, pool.syn_sorted)
        print(f"{name}: {t/N_SUPER*1e3:.1f}ms/superstep", flush=True)


if __name__ == "__main__":
    main()
