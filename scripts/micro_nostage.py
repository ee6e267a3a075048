"""Quantify VMEM-staging + phi cost: run cn_pass with _window monkeypatched
to (a) skip the dynamic slice (aligned read), (b) also skip phi."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from bench import get_reg36_code as get_code  # noqa: E402
from ldpc_decoder_tpu.ops import qc_pallas as qp  # noqa: E402
from ldpc_decoder_tpu.ops.qc_decode import QCDecodeTables  # noqa: E402


def timeit(fn, *args, n=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    B = 256
    code, qc = get_code()
    t = QCDecodeTables.from_structure(qc)
    tp = qp.QCPallasTables.from_qc_tables(t)
    print(f"tile={tp.tile} seam={tp.seam}")
    Z, C, R, d_v, d_c = tp.Z, tp.C, tp.R, tp.d_v, tp.d_c
    key = jax.random.PRNGKey(0)
    msgs = (jax.random.normal(key, (C, d_v, Z, B), jnp.float32) * 2).astype(
        jnp.bfloat16)
    syn3 = jnp.zeros((R, Z, B), jnp.int8)

    cn = jax.jit(lambda m, s: qp.cn_pass(m, s, tp))
    t0 = timeit(cn, msgs, syn3)
    print(f"cn baseline:      {t0*1e3:7.3f} ms")

    orig_window = qp._window
    orig_phi = qp._phi_abs_f32

    def window_nostage(refs, k, tab_ref, i, tile, seam, scratch):
        return refs[3 * k + 1][0, 0].astype(jnp.float32)

    qp._window = window_nostage
    cn2 = jax.jit(lambda m, s: qp.cn_pass(m, s, tp))
    t1 = timeit(cn2, msgs, syn3)
    print(f"cn no-staging:    {t1*1e3:7.3f} ms  (staging cost "
          f"{(t0-t1)*1e3:.2f} ms)")

    qp._phi_abs_f32 = lambda x: x * jnp.float32(0.5)
    cn3 = jax.jit(lambda m, s: qp.cn_pass(m, s, tp))
    t2 = timeit(cn3, msgs, syn3)
    print(f"cn no-stage+phi:  {t2*1e3:7.3f} ms  (phi cost "
          f"{(t1-t2)*1e3:.2f} ms)")

    qp._window = orig_window
    cn4 = jax.jit(lambda m, s: qp.cn_pass(m, s, tp))
    t3 = timeit(cn4, msgs, syn3)
    print(f"cn staged, no-phi:{t3*1e3:7.3f} ms")
    qp._phi_abs_f32 = orig_phi


if __name__ == "__main__":
    main()
