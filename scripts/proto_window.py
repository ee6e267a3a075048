"""Prototype: strategies for rotated-window reads inside a Pallas kernel.

Compares, on a synthetic CN-like pass (d windows summed):
  A) scratch f32 staging + dynamic-start ref slice   (current kernel)
  B) value-level pltpu.roll of the bf16 tile pair + static slice
  C) aligned reads (no rotation)                      (ceiling)
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T = 512
LB = 128
D = 6
R = 3
NT = 340  # tiles per circulant (Z = NT*T)
B = 256


def make_specs(d, tile, n_tiles, lb):
    specs = []
    for k in range(d):
        for which in (0, 1):
            def index_map(i, j, l, tab, _k=k, _w=which):
                t0 = tab[i, _k, 2] + j + _w
                return (tab[i, _k, 0], tab[i, _k, 1], t0 % n_tiles, l)
            specs.append(pl.BlockSpec((1, 1, tile, lb), index_map,
                                      memory_space=pltpu.VMEM))
    return specs


def kern_a(tab_ref, *refs, d, tile):
    out_ref = refs[2 * d]
    scratch = refs[2 * d + 1]
    i = pl.program_id(0)
    acc = jnp.zeros((tile, LB), jnp.float32)
    for k in range(d):
        scratch[0:tile] = refs[2 * k][0, 0].astype(jnp.float32)
        scratch[tile:2 * tile] = refs[2 * k + 1][0, 0].astype(jnp.float32)
        s = tab_ref[i, k, 3]
        acc = acc + scratch[pl.ds(s, tile), :]
    out_ref[0, 0] = acc.astype(out_ref.dtype)


def kern_b(tab_ref, *refs, d, tile):
    out_ref = refs[2 * d]
    i = pl.program_id(0)
    acc = jnp.zeros((tile, LB), jnp.float32)
    for k in range(d):
        pair = jnp.concatenate(
            [refs[2 * k][0, 0], refs[2 * k + 1][0, 0]], axis=0)
        s = tab_ref[i, k, 3]
        w = pltpu.roll(pair, -s, 0)[0:tile]
        acc = acc + w.astype(jnp.float32)
    out_ref[0, 0] = acc.astype(out_ref.dtype)


def kern_c(tab_ref, *refs, d, tile):
    out_ref = refs[2 * d]
    acc = jnp.zeros((tile, LB), jnp.float32)
    for k in range(d):
        acc = acc + refs[2 * k][0, 0].astype(jnp.float32)
    out_ref[0, 0] = acc.astype(out_ref.dtype)


def run(kern, msgs, tab, scratch, name):
    d, tile, n_tiles, lb = D, T, NT, LB
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(R, NT, B // LB),
        in_specs=make_specs(d, tile, n_tiles, lb),
        out_specs=pl.BlockSpec((1, 1, tile, lb),
                               lambda i, j, l, *_: (i, 0, j, l),
                               memory_space=pltpu.VMEM),
        scratch_shapes=(
            [pltpu.VMEM((2 * tile, lb), jnp.float32)] if scratch else []),
    )
    def g(tab, m):
        return pl.pallas_call(
            partial(kern, d=d, tile=tile),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((R, 1, NT * T, B), m.dtype),
        )(tab, *([m] * (2 * d)))

    f = jax.jit(g)
    try:
        out = f(tab, msgs)
        jax.block_until_ready(out)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")
        return
    t0 = time.perf_counter()
    n = 20
    for _ in range(n):
        out = f(tab, msgs)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    gb = (2 * D + 1) * R * NT * T * B * msgs.dtype.itemsize / 1e9
    print(f"{name}: {dt*1e3:8.3f} ms   ({gb:.2f} GB touched -> "
          f"{gb/dt:.0f} GB/s apparent)")


def main():
    dtype = jnp.bfloat16 if (len(sys.argv) < 2 or sys.argv[1] == "bf16") \
        else jnp.float32
    key = jax.random.PRNGKey(0)
    msgs = jax.random.normal(key, (D, D, NT * T, B), dtype=jnp.bfloat16 if dtype == jnp.bfloat16 else jnp.float32)
    rng = np.random.default_rng(0)
    tab = np.zeros((R, D, 4), np.int32)
    tab[..., 0] = rng.integers(0, D, (R, D))
    tab[..., 1] = rng.integers(0, D, (R, D))
    tab[..., 2] = rng.integers(0, NT, (R, D))
    tab[..., 3] = rng.integers(0, T, (R, D))
    tab = jnp.asarray(tab)
    print(f"dtype={dtype.__name__} T={T} NT={NT} B={B} D={D} R={R}")
    run(kern_c, msgs, tab, False, "C aligned   ")
    run(kern_a, msgs, tab, True, "A scratch+ds")
    run(kern_b, msgs, tab, False, "B roll      ")


if __name__ == "__main__":
    main()
