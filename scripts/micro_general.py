"""Per-op breakdown of the general (non-QC) path's BP iteration.

Round-4 finding: jnp.take on [3.1M, 256] f32 runs at ~127 GB/s and is
THROUGHPUT-bound (sorted indices time the same as a random permutation —
scripts/micro_gather.py after the elision fix), overturning the round-2/3
"latency-bound gather" diagnosis (those microbenches were elided by axon;
CLAUDE.md). If two gathers cost ~25 ms/iter, the measured ~143 ms/iter
(44.7 Mb/s at B=128, avg 20 iters) hides ~110 ms elsewhere. This script
times each stage of ops/decode.bp_iteration chained-and-fetched.

Usage: python scripts/micro_general.py [B] [dtype]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from ldpc_decoder_tpu.codes.generate import make_regular_code  # noqa: E402
from ldpc_decoder_tpu.ops import decode as D  # noqa: E402


def chain_time(fn, x0, *args, reps=6, tag=""):
    """Chained timing: out = fn(out, *args) reps times inside jit, fetch.

    The operands (index tables included) are passed as jit ARGUMENTS, not
    closures — closure-captured multi-MB index arrays become HLO constants
    and stall the remote TPU compile indefinitely (measured: >12 min with
    no output vs seconds as arguments; the decoder's run_iterations always
    passes tables as a pytree arg, which is why it never hit this)."""

    def chained(x, *a):
        return jax.lax.fori_loop(0, reps, lambda _, y: fn(y, *a), x)

    jfn = jax.jit(chained)
    out = jfn(x0, *args)
    np.asarray(jax.tree_util.tree_leaves(out)[0][:1, :1])
    t0 = time.perf_counter()
    out = jfn(x0, *args)
    np.asarray(jax.tree_util.tree_leaves(out)[0][:1, :1])
    t = (time.perf_counter() - t0) / reps
    print(f"{tag:34s}: {t*1e3:8.2f} ms/iter", flush=True)
    return t


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    dt = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
        sys.argv[2] if len(sys.argv) > 2 else "bfloat16"]
    print("building random (3,6) 2^20 code...", flush=True)
    code = make_regular_code(1 << 20, 3, 6, seed=1)
    from ldpc_decoder_tpu.codes.compiled import compile_code

    cc = compile_code(code)
    tables = D.DecodeTables.from_compiled(cc)
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    gen = jax.jit(lambda k: (
        (jax.random.normal(k, (tables.n_edges, B), jnp.float32) * 0.5
         + 1.0).astype(dt)))
    msgs = jax.block_until_ready(gen(k1))
    llr = jax.block_until_ready(jax.jit(
        lambda k: jax.random.normal(k, (tables.n_vars, B), jnp.float32)
        * 2.0 + 1.0)(k2))
    syn = jax.block_until_ready(jax.jit(
        lambda k: jax.random.bernoulli(k, 0.5, (tables.n_checks, B))
        .astype(jnp.int8))(k3))
    E = tables.n_edges
    gb_gather = 2 * E * B * jnp.dtype(dt).itemsize / 1e9
    print(f"E={E} B={B} dtype={dt.__name__}; one [E,B] pass = "
          f"{gb_gather/2:.2f} GB", flush=True)

    # full iteration
    t_full = chain_time(
        lambda m, ll, sy, tb: D.bp_iteration(m, ll, sy, tb)[0],
        msgs, llr, syn, tables, tag="full bp_iteration")
    # cn_update alone
    t_cn = chain_time(
        lambda m, sy, tb: D.cn_update(m, sy, tb), msgs, syn, tables,
        tag="cn_update (phi)")
    # the two gathers alone (chained through each other)
    t_g1 = chain_time(
        lambda m, p: jnp.take(m, p, axis=0), msgs, tables.perm_c2v,
        tag="gather perm_c2v [E,B]")
    t_g2 = chain_time(
        lambda m, p: jnp.take(m, p, axis=0)[:E], msgs,
        tables.cn_edge_vnrow, tag="gather cn_edge_vnrow [E,B]")
    # vn_totals alone (the degree-bucket segment sum)
    def _vt(m, ll, tb):
        t = D.vn_totals(m, ll, tb)
        # chain through a same-shape output so fori_loop carries [E, B]
        return m + t[:1, :].astype(m.dtype)

    t_vt = chain_time(_vt, msgs, llr, tables, tag="vn_totals (seg-sum)")
    print(f"residual (full - cn - 2 gathers - vt): "
          f"{(t_full - t_cn - t_g1 - t_g2 - t_vt)*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
