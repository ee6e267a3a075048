"""Grid-step overhead vs DMA vs VPU decomposition on the axon v5e.

micro_overlap2 (prefetch-grid, fetched) showed a bare 2-ref copy kernel
with (1,1024,128) bf16 blocks runs at 2.5 us/grid-step = 211 GB/s —
overhead-bound, not DMA-bound — and phi's marginal cost grows with k
(0.84, 1.2, 2.25 ms per extra phi-pass), i.e. partial overlap that
saturates. This script maps the model wall(step) =
max(fixed_overhead, bytes/BW, vpu) + leak by sweeping:

  - H: block height (rows per grid step) in {1, 2, 4, 8} at k=0
    -> per-step bytes 0.5..4 MB; slope gives true DMA BW, intercept the
    per-step overhead.
  - k in {0,1,2,4} at the H that is DMA-bound -> does a DMA-bound step
    hide phi?
  - refs: 6 input refs reading the SAME block (mimics production's d=6
    slot windows) at H=1, k=0 -> does per-step overhead scale with ref
    count (scalar-core index-map cost) or with bytes?
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from ldpc_decoder_tpu.ops.qc_pallas import _phi_abs_f32  # noqa: E402

T = 1024
LB = 128
NROWS = 4096
K = int(os.environ.get("MO3_K", "8"))


def build(h: int, k: int, nrefs: int = 1):
    n_steps = NROWS // h

    def kernel(tab_ref, *refs):
        o_ref = refs[nrefs]
        v = refs[0][...].astype(jnp.float32)
        for r in range(1, nrefs):
            v = v + refs[r][...].astype(jnp.float32)
        for _ in range(k):
            v = _phi_abs_f32(jnp.abs(v) + 0.125)
        o_ref[...] = v.astype(o_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=[pl.BlockSpec((1, h, T, LB),
                               lambda i, tab: (tab[i], 0, 0, 0),
                               memory_space=pltpu.VMEM)] * nrefs,
        out_specs=pl.BlockSpec((1, h, T, LB),
                               lambda i, tab: (tab[i], 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NROWS // h, h, T, LB), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )
    tab = jnp.arange(n_steps, dtype=jnp.int32)

    @jax.jit
    def chained(x):
        def body(_, v):
            return call(tab, v)

        out = jax.lax.fori_loop(0, K, body, x)
        return out, out[0, 0, 0, 0].astype(jnp.float32)

    return chained, n_steps


def timeit(fn, x, reps=4):
    t0 = time.perf_counter()
    float(fn(x)[1])
    comp = time.perf_counter() - t0
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(x)[1])
        best = min(best, time.perf_counter() - t0)
    return best / K, comp


def run(h, k, nrefs, x):
    fn, n_steps = build(h, k, nrefs)
    t, comp = timeit(fn, x)
    bytes_moved = 2 * NROWS * T * LB * 2  # in once + out, bf16 (refs share)
    print(f"H={h} k={k} refs={nrefs}: {t*1e3:7.3f} ms  "
          f"{bytes_moved/t/1e9:4.0f} GB/s  {t/n_steps*1e6:5.2f} us/step"
          f"  (compile {comp:.1f}s)", flush=True)
    return t


def main():
    print(f"NROWS={NROWS} T={T} LB={LB} K={K} "
          f"{2*NROWS*T*LB*2/1e9:.2f} GB r+w per call", flush=True)
    for h in (1, 2, 4, 8):
        x = (jax.random.normal(jax.random.PRNGKey(0),
                               (NROWS // h, h, T, LB), jnp.float32)
             + 1.5).astype(jnp.bfloat16)
        x = jax.device_put(x)
        run(h, 0, 1, x)
    h = 8
    x = (jax.random.normal(jax.random.PRNGKey(0),
                           (NROWS // h, h, T, LB), jnp.float32)
         + 1.5).astype(jnp.bfloat16)
    x = jax.device_put(x)
    for k in (1, 2, 4):
        run(h, k, 1, x)
    h = 1
    x = (jax.random.normal(jax.random.PRNGKey(0),
                           (NROWS, 1, T, LB), jnp.float32)
         + 1.5).astype(jnp.bfloat16)
    x = jax.device_put(x)
    for refs in (2, 6):
        run(1, 0, refs, x)


if __name__ == "__main__":
    main()
