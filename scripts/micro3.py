"""DMA-efficiency curve: rotated-block copy at different lane widths.

The decode kernels move (1, 1, T, lb) blocks whose rows are lb*2 bytes
contiguous (bf16). micro2 measured the full cn/vn kernels at ~360-460 GB/s
and a pure copy at ~474 GB/s with lb=128 (256-byte rows) — DMA-pattern
bound. This script maps copy bandwidth vs row width to size the win of a
lane-folded layout (z % G folded into lanes -> G*B*2-byte rows).

Usage: python scripts/micro3.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from functools import partial  # noqa: E402

from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def probe(Zq, W, T, lb, d=6, R=16, label=""):
    """Copy d rotated (1,1,T,lb) blocks per node from [N, Zq, W] bf16."""
    N = 96  # source nodes
    NT = Zq // T
    rng = np.random.default_rng(0)
    tab = jnp.asarray(
        np.stack([rng.integers(0, N, (R, d)),
                  np.zeros((R, d), np.int64),
                  rng.integers(0, NT, (R, d)),
                  np.zeros((R, d), np.int64)], axis=-1).astype(np.int32))
    src = jnp.asarray(rng.standard_normal((N, Zq, W)).astype(jnp.bfloat16))

    def kernel(tab_ref, *refs):
        out = refs[d]
        for k in range(d):
            out[k] = refs[k][0]

    specs = [
        pl.BlockSpec((1, T, lb),
                     (lambda i, j, l, tab, _k=k:
                      (tab[i, _k, 0], (tab[i, _k, 2] + j) % NT, l)),
                     memory_space=pltpu.VMEM)
        for k in range(d)
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(R, NT, W // lb),
        in_specs=specs,
        out_specs=pl.BlockSpec((d, T, lb),
                               lambda i, j, l, *_: (0, j, l),
                               memory_space=pltpu.VMEM),
    )
    fn = jax.jit(lambda s: pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((d, Zq, W), src.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2**20),
    )(tab, *([s] * d)))
    try:
        t = timeit(fn, src)
    except Exception as e:
        print(f"{label}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        return
    gb = 2 * d * R * NT * T * W * 2 / 1e9  # read + write
    print(f"{label}: {t*1e3:7.3f} ms  {gb/t:5.0f} GB/s "
          f"(rows {lb*2} B)", flush=True)


def main():
    import os

    which = os.environ.get("PROBES", "base,lb256,g2,g4").split(",")
    # equal total volume per config: R*d*Zq*W = const
    # baseline: today's shape (Z=32768 plane, W=B=256, lb=128, T=1024)
    if "base" in which:
        probe(Zq=32768, W=256, T=1024, lb=128, label="lb=128 T=1024")
    if "lb256" in which:
        probe(Zq=32768, W=256, T=1024, lb=256, label="lb=256 T=1024")
    if "g2" in which:
        # G=2 fold: Zq=16384, W=512
        probe(Zq=16384, W=512, T=512, lb=512, label="G2 fold lb=512")
    if "g4" in which:
        # G=4 fold: Zq=8192, W=1024
        probe(Zq=8192, W=1024, T=256, lb=1024, label="G4 fold lb=1024")
    if "g8" in which:
        probe(Zq=4096, W=2048, T=128, lb=2048, label="G8 fold lb=2048")


if __name__ == "__main__":
    main()
