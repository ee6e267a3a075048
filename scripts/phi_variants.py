"""Candidate fast φ implementations, raced by micro_phi2.py on the TPU.

All take (x, high=80.0, pre=1e-5) like qc_pallas._phi_abs_f32 and are
f32-in/f32-out. Target: rel err <= ~1e-4 (invisible under bf16 message
storage) over x in [1e-5, 80].
"""

import jax
import jax.numpy as jnp

LN2 = 0.6931471805599453
LOG2E = 1.4426950408889634


def phi_current(x, high=80.0, pre=1e-5):
    xm = jnp.clip(x, jnp.float32(pre), jnp.float32(high))
    main = -jnp.log(jnp.tanh(xm * jnp.float32(0.5)))
    return jnp.where(xm > 5.0, 2.0 * jnp.exp(-xm), main)


def phi_exp_series(x, high=80.0, pre=1e-5):
    """t = e^-x; branch A (x>=1): 2*atanh(t) series; branch B: log series."""
    xm = jnp.clip(x, jnp.float32(pre), jnp.float32(high))
    t = jnp.exp(-xm)
    t2 = t * t
    A = 2.0 * t * (1.0 + t2 * (1.0 / 3.0 + t2 * (0.2 + t2 * (1.0 / 7.0))))
    x2 = xm * xm
    Bv = (jnp.float32(LN2) - jnp.log(xm)
          + x2 * (1.0 / 12.0 + x2 * (-7.0 / 1440.0 + x2 * (62.0 / 181440.0))))
    return jnp.where(xm < 1.0, Bv, A)


def _exp2_int_scale(n):
    """2^n for int32 n via exponent-field construction."""
    return jax.lax.bitcast_convert_type(
        ((n + 127) << 23).astype(jnp.int32), jnp.float32)


def _fast_exp_neg(xm):
    """e^-x for x in [0, 88], rel err ~1e-6; mul/add/bitcast only."""
    z = xm * jnp.float32(LOG2E)
    n = jnp.floor(z + 0.5)
    f = z - n  # [-0.5, 0.5]
    # 2^-f minimax-ish deg-4 (Taylor in -f*ln2 is within 4e-6 here)
    g = -f * jnp.float32(LN2)
    q = 1.0 + g * (1.0 + g * (0.5 + g * (1.0 / 6.0 + g * (1.0 / 24.0 + g * (1.0 / 120.0)))))
    return q * _exp2_int_scale(-n.astype(jnp.int32))


def _fast_log(xm):
    """ln(x) for normal positive f32; mul/add/bitcast only."""
    bits = jax.lax.bitcast_convert_type(xm, jnp.int32)
    e = (bits >> 23) - 127
    m = jax.lax.bitcast_convert_type(
        (bits & jnp.int32(0x007FFFFF)) | jnp.int32(0x3F800000), jnp.float32)
    big = m > jnp.float32(1.4142135623730951)
    m = jnp.where(big, m * 0.5, m)
    e = jnp.where(big, e + 1, e)
    w = m - 1.0  # [-0.2929, 0.4142]
    # ln(1+w), deg-8 Taylor (alternating, |w|<=0.415 -> err ~4e-5*w)
    p = w * (1.0 + w * (-0.5 + w * (1.0 / 3.0 + w * (-0.25 + w * (
        0.2 + w * (-1.0 / 6.0 + w * (1.0 / 7.0 + w * (-0.125))))))))
    return e.astype(jnp.float32) * jnp.float32(LN2) + p


def phi_bittrick(x, high=80.0, pre=1e-5):
    xm = jnp.clip(x, jnp.float32(pre), jnp.float32(high))
    t = _fast_exp_neg(xm)
    t2 = t * t
    A = 2.0 * t * (1.0 + t2 * (1.0 / 3.0 + t2 * (0.2 + t2 * (1.0 / 7.0))))
    x2 = xm * xm
    Bv = (jnp.float32(LN2) - _fast_log(xm)
          + x2 * (1.0 / 12.0 + x2 * (-7.0 / 1440.0 + x2 * (62.0 / 181440.0))))
    return jnp.where(xm < 1.0, Bv, A)


def phi_identity(x, high=80.0, pre=1e-5):
    return x


VARIANTS = {
    "current": phi_current,
    "exp_series": phi_exp_series,
    "bittrick": phi_bittrick,
    "identity": phi_identity,
}


if __name__ == "__main__":
    # accuracy check on CPU
    import numpy as np

    jax.config.update("jax_platforms", "cpu")
    x = np.concatenate([
        np.logspace(-5, 0, 4000, dtype=np.float64),
        np.linspace(1.0, 80.0, 8000, dtype=np.float64),
    ])
    ref = 2.0 * np.arctanh(np.exp(-np.clip(x, 1e-5, 80.0)))
    for name in ("exp_series", "bittrick"):
        got = np.asarray(VARIANTS[name](jnp.asarray(x, jnp.float32)),
                         np.float64)
        rel = np.abs(got - ref) / np.maximum(np.abs(ref), 1e-300)
        i = int(np.argmax(rel))
        print(f"{name}: max rel err {rel.max():.2e} at x={x[i]:.4g} "
              f"(got {got[i]:.6g} want {ref[i]:.6g})")
