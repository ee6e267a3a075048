"""Pallas-gather experiment for the general (non-QC) path.

The general path's edge permutation is an arbitrary 3.1M-row gather;
measured end-to-end it runs at ~5 Mb/s (scripts/bench_general.py) because
XLA's TPU gather of short rows is latency-bound. This script measures the
candidate mitigation the ROADMAP calls for: a Pallas kernel that issues
many outstanding per-row async DMA copies from HBM (manual gather with
deep pipelining), vs jnp.take.

Verdict recorded in ROADMAP.md — random codes have no locality (expander
graphs), so every scheme pays per-row latency; QC structure is the real
fix (that is the framework's co-design thesis).

Usage: python scripts/micro_gather.py [n_rows] [B] [G]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def timeit(fn, *args, n=10, warmup=2):
    # NB round-4 fix: axon elides dispatches whose outputs are never
    # fetched (CLAUDE.md) — fetch a tiny device slice to force execution;
    # chained variants below additionally serialize the work
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(out[:1, :1])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(out[:1, :1])
    return (time.perf_counter() - t0) / n


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 21
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    G = int(sys.argv[3]) if len(sys.argv) > 3 else 512  # rows per grid step
    rng = np.random.default_rng(0)
    # generate src ON DEVICE: a host 3 GB array would take ~50 min to
    # upload over the axon tunnel (~60 MB/s)
    src = jax.block_until_ready(
        jax.jit(lambda k: jax.random.normal(k, (N, B), jnp.float32))(
            jax.random.PRNGKey(0)))
    idx = jnp.asarray(rng.permutation(N).astype(np.int32))
    gb = 2 * N * B * 4 / 1e9

    # chain R gathers inside one jit so none can be elided or overlapped
    R = 8

    def chained(s, i):
        return jax.lax.fori_loop(
            0, R, lambda _, x: jnp.take(x, i, axis=0), s)

    take_c = jax.jit(chained)
    t = timeit(take_c, src, idx, n=3) / R
    print(f"jnp.take   random perm (chained x{R}): {t*1e3:8.2f} ms  "
          f"{gb/t:6.1f} GB/s ({t/N*1e9:.1f} ns/row)", flush=True)

    srt = jnp.sort(idx)
    t = timeit(take_c, src, srt, n=3) / R
    print(f"jnp.take   sorted idx  (chained x{R}): {t*1e3:8.2f} ms  "
          f"{gb/t:6.1f} GB/s", flush=True)

    # row-bound or byte-bound? sweep (dtype, lane width): if ns/row is
    # ~constant across B and dtype the gather is descriptor/row-bound
    # (the general path's floor is then 2E rows/iter no matter the
    # message dtype); if GB/s is ~constant it is byte-bound and bf16
    # halves the cost (round-4, VERDICT r3 #3 evidence)
    if os.environ.get("GATHER_SWEEP", "1") != "0":
        for dt, bw in [(jnp.float32, 128), (jnp.float32, 256),
                       (jnp.float32, 512), (jnp.bfloat16, 256),
                       (jnp.bfloat16, 512)]:
            s2 = jax.block_until_ready(jax.jit(
                lambda k: jax.random.normal(k, (N, bw), jnp.float32)
                .astype(dt))(jax.random.PRNGKey(1)))
            t = timeit(take_c, s2, idx, n=3) / R
            gb2 = 2 * N * bw * jnp.dtype(dt).itemsize / 1e9
            print(f"jnp.take {jnp.dtype(dt).name:9s} B={bw:4d}: "
                  f"{t*1e3:8.2f} ms  {gb2/t:6.1f} GB/s "
                  f"({t/N*1e9:.1f} ns/row)", flush=True)
            del s2

    UNROLL = int(os.environ.get("GATHER_UNROLL", "0"))

    def kernel(idx_ref, src_ref, out_ref, scratch, sem):
        i = pl.program_id(0)

        def copy(g):
            row = idx_ref[i * G + g]
            return pltpu.make_async_copy(
                src_ref.at[pl.ds(row, 1), :],
                scratch.at[pl.ds(g, 1), :],
                sem,
            )

        if UNROLL:
            for g in range(G):
                copy(g).start()
            for g in range(G):
                copy(g).wait()
        else:
            jax.lax.fori_loop(0, G, lambda g, _: (copy(g).start(), 0)[1], 0)
            jax.lax.fori_loop(0, G, lambda g, _: (copy(g).wait(), 0)[1], 0)
        out_ref[...] = scratch[...]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N // G,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],  # src stays HBM
        out_specs=pl.BlockSpec((G, B), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((G, B), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    gather = jax.jit(lambda s, i: pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, B), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2**20),
    )(i, s))
    try:
        t = timeit(gather, src, idx)
        print(f"pallas async-copy gather (G={G}): {t*1e3:8.2f} ms  "
              f"{gb/t:6.1f} GB/s ({t/N*1e9:.1f} ns/row)", flush=True)
    except Exception as e:
        print(f"pallas gather FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)


if __name__ == "__main__":
    main()
