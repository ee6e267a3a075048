"""Final bisect: which remaining production feature costs the overlap?

micro_overlap4's v4 (staging + dynamic offsets + 6 leave-one-out outputs)
still hides phi (+0.29 ms). The production CN exposes ~1.9 ms even after
the bitwise sign fix. Remaining differences, added here one at a time on
top of a v4-like kernel shaped exactly like one production d=6 group:

  w0  v4 baseline (contiguous blocks, 1-D grid)          [control]
  w1  + halo ref per slot, sign-selected dynamic-DEST staging store
  w2  + 3-D grid (nodes, NT, lanes) with modular (tab+j)%NT index maps
      over a [nb, Z, B]-shaped source (strided lane slice, B=256)
  w3  + input_output_aliases carry chained through a fori_loop (the
      production r_c recycling)

Walls phi live vs stub; the config where the marginal jumps is the
culprit.
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
D = 6
SEAM = 64
NB = 176          # blocks in the flat source (production p41 scale)
Z = 18432
NT = Z // T       # 18
B = 256
NNODES = 16       # one production d=6 group
K = int(os.environ.get("MO6_K", "28"))


def timeit(fn, args, reps=4):
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*args))
    comp = time.perf_counter() - t0
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best, comp


def build(level: int, phi_live: bool):
    """level: 0..3 per the module docstring."""
    halo = level >= 1
    grid3 = level >= 2
    alias = level >= 3
    phi = (lambda v: _phi_abs_f32(v + 0.125)) if phi_live else (
        lambda v: v + 0.125)
    rps = 2 if halo else 1

    def kernel(tab_ref, *refs):
        syn_ref = refs[rps * D]
        out_ref = refs[rps * D + (2 if alias else 1)]
        scratch = refs[-1]
        i = pl.program_id(0)
        ws = []
        for s in range(D):
            if halo:
                scratch[s, SEAM:SEAM + T, :] = (
                    refs[2 * s][0].astype(jnp.float32))
                pos = jnp.where(tab_ref[3, i * D + s] >= SEAM, SEAM + T, 0)
                scratch[s, pl.ds(pos, SEAM), :] = (
                    refs[2 * s + 1][0].astype(jnp.float32))
                off = tab_ref[3, i * D + s]
                ws.append(scratch[s, pl.ds(off, T), :])
            else:
                scratch[s, 0:T, :] = refs[s][0].astype(jnp.float32)
                off = tab_ref[3, i * D + s]
                ws.append(scratch[s, pl.ds(off, T), :])
        a = [jnp.abs(w) for w in ws]
        u32 = jnp.uint32
        sbit = jnp.uint32(0x80000000)
        sb = [jax.lax.bitcast_convert_type(w, u32) & sbit for w in ws]
        X = syn_ref[0].astype(u32) << 31
        for b in sb:
            X = X ^ b
        ext = a[0]
        for x in a[1:]:
            ext = ext + x
        for s in range(D):
            res = phi(ext - a[s])
            r = jax.lax.bitcast_convert_type(res, u32) | (sb[s] ^ X)
            out_ref[s] = jax.lax.bitcast_convert_type(
                r, jnp.float32).astype(out_ref.dtype)

    scratch_rows = SEAM + T + SEAM if halo else T

    if grid3:
        grid = (NNODES, NT, B // LB)

        def mk_main(s):
            return lambda i, j, l, tab: (
                tab[0, i * D + s], (tab[2, i * D + s] + j) % NT, l)

        def mk_halo(s):
            return lambda i, j, l, tab: (
                tab[0, i * D + s],
                ((tab[2, i * D + s] + j + 1) % NT) * (T // SEAM), l)

        in_specs = []
        for s in range(D):
            in_specs.append(pl.BlockSpec((1, T, LB), mk_main(s),
                                         memory_space=pltpu.VMEM))
            if halo:
                in_specs.append(pl.BlockSpec((1, SEAM, LB), mk_halo(s),
                                             memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec((1, T, LB),
                                     lambda i, j, l, tab: (i, j, l),
                                     memory_space=pltpu.VMEM))  # syn
        src_shape = (NB, Z, B)
        halo_shape = (NB, Z // SEAM * SEAM, B)  # viewed as halo blocks
        syn_shape = (NNODES, Z, B)
        out_specs = pl.BlockSpec(
            (D, T, LB), lambda i, j, l, tab: (i, j, l),
            memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((NNODES * D, Z, B), jnp.bfloat16)
    else:
        nsteps = NNODES * NT * (B // LB)
        grid = (nsteps,)

        # contiguous-block control: distinct random blocks per (step, s)
        def mk_flat(s):
            return lambda i, tab: (tab[0, (i * D + s) % (8 * NB)], 0, 0)

        in_specs = []
        for s in range(D):
            in_specs.append(pl.BlockSpec((1, T, LB), mk_flat(s),
                                         memory_space=pltpu.VMEM))
            if halo:
                in_specs.append(pl.BlockSpec((1, SEAM, LB), mk_flat(s),
                                             memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec(
            (1, T, LB), lambda i, tab: (i % NB, 0, 0),
            memory_space=pltpu.VMEM))  # syn
        src_shape = (NB, T, LB)
        halo_shape = (NB, SEAM, LB)
        syn_shape = (NB, T, LB)
        out_specs = pl.BlockSpec(
            (D, T, LB), lambda i, tab: (i, 0, 0),
            memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((nsteps * D, T, LB), jnp.bfloat16)

    if alias:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((D, scratch_rows, LB), jnp.float32)],
    )
    kw = {}
    if alias:
        kw["input_output_aliases"] = {1 + rps * D + 1: 0}
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
        **kw,
    )
    return call, src_shape, halo_shape, syn_shape, out_shape.shape


def run(level, phi_live):
    call, src_shape, halo_shape, syn_shape, out_sh = build(level, phi_live)
    halo = level >= 1
    key = jax.random.PRNGKey(0)
    x = (jax.random.normal(key, src_shape, jnp.float32) + 1.5).astype(
        jnp.bfloat16)
    hx = x if level >= 2 else (
        jax.random.normal(key, halo_shape, jnp.float32).astype(jnp.bfloat16))
    syn = jnp.zeros(syn_shape, jnp.int8)
    rng = np.random.default_rng(0)
    ntab = max(NNODES * D, 8 * NB)
    tab = np.zeros((8, ntab), np.int32)
    tab[0] = rng.integers(0, src_shape[0], ntab)
    tab[2] = rng.integers(0, NT, ntab)
    tab[3] = rng.integers(0, 2 * SEAM, ntab)
    tab = jnp.asarray(tab)

    operands = []
    for s in range(D):
        operands.append(x)
        if halo:
            operands.append(hx)
    operands.append(syn)

    @jax.jit
    def fn(tab, *ops):
        if level >= 3:
            def body(_, carry):
                return call(tab, *ops, carry)

            init = jnp.zeros(out_sh, jnp.bfloat16)
            return jax.lax.fori_loop(0, K, body, init)
        else:
            def body(_, acc):
                o = call(tab, *ops)
                return acc + o[0, 0, 0].astype(jnp.float32)

            return jax.lax.fori_loop(0, K, body, jnp.float32(0))

    t, comp = timeit(fn, (tab, *operands))
    per = t / K
    # bytes: D mains + (halos) + syn read + D out blocks per step
    steps = NNODES * NT * (B // LB)
    byt = steps * (D * T * LB * 2 + (D * SEAM * LB * 2 if halo else 0)
                   + T * LB + D * T * LB * 2)
    print(f"w{level} phi={'live' if phi_live else 'stub'}: "
          f"{per*1e3:7.3f} ms  {byt/per/1e9:4.0f} GB/s (compile {comp:.1f}s)",
          flush=True)
    return per


def main():
    print(f"D={D} T={T} SEAM={SEAM} NNODES={NNODES} NT={NT} B={B} K={K}",
          flush=True)
    for level in (0, 1, 2, 3):
        try:
            t1 = run(level, True)
            t0 = run(level, False)
            print(f"   -> w{level} phi marginal {1e3*(t1-t0):+.3f} ms",
                  flush=True)
        except Exception as e:
            print(f"w{level} FAILED: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:200]}", flush=True)


if __name__ == "__main__":
    main()
