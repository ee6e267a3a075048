"""Minimal-platform probe: does Mosaic hide VPU work under DMA here?

micro_overlap.py showed the production kernels expose most of phi's VPU
time on top of their DMA walls (CN +2.9/3.3 ms, VN +1.4/2.9 ms) and that
dimension_semantics / scoped-VMEM don't move it. This probe strips the
question to a bare streaming kernel shaped like one production slot
(blocks [1, 1024, 128] bf16, grid over blocks) and measures the wall as a
function of per-element transcendental work:

  k=0   out = x            (pure DMA: read + write)
  k=1   out = phi(x)
  k=2   out = phi(phi(x))
  k=4   four chained phis

If wall(k) is flat until compute > DMA (max-bound), the platform CAN
overlap and the production kernels' structure (multi-ref windows, f32
scratch staging, dynamic slices) is what breaks it. If wall(k) climbs
linearly from k=0 (additive), the remote-compiler Mosaic never overlaps
HBM DMA with VPU work on this target and the fix must reduce bytes or
phi ops, not scheduling.

Variants probed on the same sweep:
  - cost-estimate: pl.CostEstimate with the true transcendental count
    (the guide says it informs scheduling; production kernels pass none)
  - staged: stage x into an f32 scratch then compute from a dynamic
    slice of it, as the production _window_flat does
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
N = int(os.environ.get("MO2_N", "4096"))  # 4096 blocks = 1.07 GB bf16
K = int(os.environ.get("MO2_K", "8"))     # chained calls per dispatch
BYTES = 2 * N * T * LB * 2  # read + write, bf16


def make_kernel(k: int, staged: bool):
    def kernel(tab_ref, x_ref, o_ref, *scr):
        if staged:
            scratch = scr[0]
            scratch[0, 0:T, :] = x_ref[0].astype(jnp.float32)
            v = scratch[0, pl.ds(0, T), :]
        else:
            v = x_ref[0].astype(jnp.float32)
        for _ in range(k):
            v = _phi_abs_f32(jnp.abs(v) + 0.125)
        o_ref[0] = v.astype(o_ref.dtype)

    return kernel


def build(k: int, staged: bool, cost: bool):
    kw = {}
    if cost:
        # phi = tanh + log (+ exp on the Taylor branch): count 3/element
        kw["cost_estimate"] = pl.CostEstimate(
            flops=N * T * LB * (10 * k + 2),
            bytes_accessed=BYTES,
            transcendentals=N * T * LB * 3 * k,
        )
    # prefetch-grid spec: plain-grid pallas calls get ELIDED by the axon
    # runtime (CLAUDE.md round-4 facts) — the prefetch table keeps it live
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N,),
        in_specs=[pl.BlockSpec((1, T, LB),
                               lambda i, tab: (tab[i], 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, T, LB), lambda i, tab: (tab[i], 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=(
            [pltpu.VMEM((1, T, LB), jnp.float32)] if staged else []
        ),
    )
    call = pl.pallas_call(
        make_kernel(k, staged),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, T, LB), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
        **kw,
    )
    tab = jnp.arange(N, dtype=jnp.int32)

    @jax.jit
    def chained(x):
        def body(_, v):
            return call(tab, v)

        out = jax.lax.fori_loop(0, K, body, x)
        # scalar fetched by the caller defeats elision
        return out, out[0, 0, 0].astype(jnp.float32)

    return chained


def timeit(fn, x, reps=4):
    t0 = time.perf_counter()
    float(fn(x)[1])
    comp = time.perf_counter() - t0
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(x)[1])  # scalar fetch: ~33 ms RTT, constant across k
        best = min(best, time.perf_counter() - t0)
    return best / K, comp


def main():
    x = (jax.random.normal(jax.random.PRNGKey(0), (N, T, LB), jnp.float32)
         + 1.5).astype(jnp.bfloat16)
    x = jax.device_put(x)
    print(f"N={N} T={T} LB={LB} K={K}  {BYTES/1e9:.2f} GB/call", flush=True)
    for staged in (False, True):
        for cost in (False, True):
            prev = None
            for k in (0, 1, 2, 4):
                fn = build(k, staged, cost)
                t, comp = timeit(fn, x)
                d = f"  (+{1e3*(t-prev):6.3f} ms)" if prev is not None else ""
                print(f"staged={int(staged)} cost={int(cost)} k={k}: "
                      f"{t*1e3:7.3f} ms  {BYTES/t/1e9:4.0f} GB/s"
                      f"  (compile {comp:.1f}s){d}", flush=True)
                prev = t


if __name__ == "__main__":
    main()
