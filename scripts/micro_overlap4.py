"""Bisect WHICH production-kernel feature breaks DMA/VPU overlap.

micro_overlap3 proved the platform CAN hide a full phi pass under DMA
(H=8 k=0 -> k=1: +0.0 ms) in a bare 2-ref streaming kernel, while the
production CN/VN kernels expose phi almost fully (micro_kernel_split:
CN +2.9 ms, VN +1.4 ms). This script adds production features one at a
time to the bare kernel until the overlap breaks:

  v0  1 ref, out = phi(x)                      (known: overlaps)
  v1  d=6 refs (same block), out = phi(sum)    (ref count / DMA streams)
  v2  + f32 scratch staging, static offsets    (the VPU copy cost)
  v3  + DYNAMIC offsets from the prefetch tab  (Mosaic deferred slices)
  v4  + d outputs, one phi per output          (CN-like leave-one-out)
  v5  v4 with phi stubbed                      (the v4 DMA+copy floor)

Per variant: wall, GB/s against its true bytes, and the phi marginal
(phi live minus stub where both are measured).
"""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from ldpc_decoder_tpu.ops.qc_pallas import _phi_abs_f32  # noqa: E402

T = 1024
LB = 128
D = 6
NSTEPS = 512
K = int(os.environ.get("MO4_K", "8"))


def timeit(fn, args, reps=4):
    t0 = time.perf_counter()
    float(fn(*args)[1])
    comp = time.perf_counter() - t0
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args)[1])
        best = min(best, time.perf_counter() - t0)
    return best / K, comp


def build(variant: int, phi_live: bool = True):
    """Returns (jitted fn taking (x, tab), bytes_per_call, n_outs)."""
    d = 1 if variant == 0 else D
    staged = variant >= 2
    dynamic = variant >= 3
    multi_out = variant >= 4
    phi = (lambda v: _phi_abs_f32(jnp.abs(v) + 0.125)) if phi_live else (
        lambda v: v + 0.125)

    def kernel(tab_ref, *refs):
        outs = refs[d] if not multi_out else None
        scratch = refs[-1] if staged else None
        i = pl.program_id(0)
        ws = []
        for s in range(d):
            if staged:
                scratch[s, 0:T, :] = refs[s][0].astype(jnp.float32)
                if dynamic:
                    off = tab_ref[3, i * d + s]
                else:
                    off = 0
                ws.append(scratch[s, pl.ds(off, T), :])
            else:
                ws.append(refs[s][0].astype(jnp.float32))
        total = ws[0]
        for w in ws[1:]:
            total = total + w
        if multi_out:
            out_ref = refs[d]
            for s in range(d):
                out_ref[s] = phi(total - ws[s]).astype(out_ref.dtype)
        else:
            refs[d][0] = phi(total).astype(refs[d].dtype)

    # tab layout (8, NSTEPS*D): row 0 = src block, row 3 = fine offset —
    # TRANSPOSED vs production so the SMEM lane dim is the long one (a
    # [3072, 4] i32 prefetch operand lane-pads 4 -> 128 and overflows the
    # 1 MiB SMEM; measured on this probe)
    in_specs = [pl.BlockSpec((1, T, LB),
                             (lambda s: (lambda i, tab: (tab[0, i * D + s],
                                                         0, 0)))(s)
                             if dynamic else
                             (lambda i, tab: (i % NSTEPS, 0, 0)),
                             memory_space=pltpu.VMEM)
                for s in range(d)]
    if multi_out:
        out_specs = pl.BlockSpec((D, T, LB), lambda i, tab: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((NSTEPS * D, T, LB), jnp.bfloat16)
    else:
        out_specs = pl.BlockSpec((1, T, LB), lambda i, tab: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((NSTEPS, T, LB), jnp.bfloat16)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NSTEPS,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=(
            [pltpu.VMEM((d, 2 * T, LB), jnp.float32)] if staged else []),
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )
    # reads: d refs, all mapping into the SAME NSTEPS-block input array —
    # distinct blocks per (step, slot) under dynamic (tab covers d*NSTEPS
    # rows), same block repeated d times otherwise (VMEM may dedup same-
    # block fetches; the dynamic variant's tab spreads them to be honest)
    bytes_in = NSTEPS * T * LB * 2 * d
    bytes_out = NSTEPS * T * LB * 2 * (D if multi_out else 1)

    @jax.jit
    def fn(x, tab):
        def body(_, carry):
            xi, acc = carry
            # scalar poke ties each call to the previous one's result so
            # XLA cannot CSE the K calls into one
            xi = xi.at[0, 0, 0].set(acc.astype(xi.dtype))
            o = call(tab, *([xi] * d))
            return xi, acc + o[0, 0, 0].astype(jnp.float32)

        _, acc = jax.lax.fori_loop(0, K, body, (x, jnp.float32(0)))
        return acc, acc

    return fn, bytes_in + bytes_out


def main():
    x = (jax.random.normal(jax.random.PRNGKey(0), (NSTEPS, T, LB),
                           jnp.float32) + 1.5).astype(jnp.bfloat16)
    x = jax.device_put(x)
    rng = np.random.default_rng(0)
    tab = np.zeros((8, NSTEPS * D), np.int32)
    tab[0] = rng.integers(0, NSTEPS, NSTEPS * D)
    tab[3] = rng.integers(0, T, NSTEPS * D)
    tab = jnp.asarray(tab)
    print(f"NSTEPS={NSTEPS} T={T} LB={LB} D={D} K={K}", flush=True)
    for variant in range(5):
        walls = {}
        for live in (False, True):
            fn, nbytes = build(variant, phi_live=live)
            t, comp = timeit(fn, (x, tab))
            walls[live] = t
            print(f"v{variant} phi={'live' if live else 'stub'}: "
                  f"{t*1e3:7.3f} ms  {nbytes/t/1e9:4.0f} GB/s "
                  f" (compile {comp:.1f}s)", flush=True)
        print(f"   -> phi marginal {1e3*(walls[True]-walls[False]):+.3f} ms",
              flush=True)


if __name__ == "__main__":
    main()
