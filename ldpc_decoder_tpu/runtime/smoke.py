"""On-device numerics smoke checks (VERDICT r3 weak #4).

The φ Taylor tail (ops/phi.py) is load-bearing specifically because the
v5e's *hardware* tanh saturates to exactly 1.0 at arguments >= ~5.5 —
-log(tanh(x/2)) then returns -0.0, the message sign is lost, and decoding
collapses. CPU tests cannot catch a regression (XLA:CPU's tanh is
correctly rounded), so this module turns the invariant into an enforced
on-device check that bench.py runs before every measurement.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def tpu_numerics_smoke(verbose=print) -> None:
    """Assert the φ invariants hold ON THE DEFAULT DEVICE.

    Raises AssertionError on regression. Fast (<1 s after compile): pure
    elementwise checks, no code/decoder construction.
    """
    from ldpc_decoder_tpu.ops.phi import HIGH_THRESHOLD, phi_abs, phi_abs_np

    dev = jax.devices()[0]
    # 1. characterize hw tanh saturation (diagnostic, not an assert: on
    #    CPU this prints "exact")
    args = jnp.arange(4.0, 16.0, 0.5, dtype=jnp.float32)
    t = np.asarray(jax.jit(jnp.tanh)(args))
    sat = np.flatnonzero(t >= 1.0)
    sat_at = float(args[sat[0]]) if sat.size else None
    verbose(f"smoke[{dev.platform}]: tanh saturates to 1.0 at arg "
            f"{'>= %.1f' % sat_at if sat_at is not None else 'never (exact)'}")

    # 2. φ must stay strictly positive up to the high clamp — the exact
    #    failure mode of removing the Taylor branch (φ(12) -> -0.0 on v5e)
    xs = jnp.array([6.0, 12.0, 25.0, 50.0, HIGH_THRESHOLD], jnp.float32)
    vals = np.asarray(jax.jit(phi_abs)(xs))
    assert (vals > 0.0).all(), (
        f"phi_abs returned non-positive values {vals} at {np.asarray(xs)} "
        f"on {dev} — the x>5 Taylor branch (ops/phi.py) has regressed; "
        f"decoding WILL collapse (hw tanh saturation)")

    # 3. φ matches the float64 reference across the operating range
    #    (incl. the tanh/Taylor crossover at 5.0). Error model: the v5e hw
    #    tanh carries ~2e-5 RELATIVE error with t = tanh(x/2) near 1, so
    #    φ = -log(t) inherits an ~2e-5 ABSOLUTE error (|dφ| = |dt|/t) —
    #    relatively dominant exactly where φ is small (x near 5: measured
    #    7.2e-4 rel = 1.0e-5 abs on v5e, round 4). Bound rel + abs floor.
    grid = np.concatenate([
        np.geomspace(1e-5, 4.9, 64), np.linspace(5.1, 79.0, 32)])
    got = np.asarray(jax.jit(phi_abs)(jnp.asarray(grid, jnp.float32)))
    want = phi_abs_np(grid)
    err = np.abs(got - want)
    bad = err > want * 5e-4 + 5e-5
    assert not bad.any(), (
        f"phi_abs deviates from the f64 reference by abs {err[bad].max():.2e}"
        f" (worst at x={grid[bad][np.argmax(err[bad])]:.4g}, beyond the hw-"
        f"tanh error model rel 5e-4 + abs 5e-5) on {dev}")

    # 4. self-inverse roundtrip keeps the operating range stable
    mid = jnp.asarray(np.geomspace(1e-4, 11.0, 32), jnp.float32)
    rt = np.asarray(jax.jit(lambda v: phi_abs(phi_abs(v)))(mid))
    rel = np.abs(rt - np.asarray(mid)) / np.asarray(mid)
    assert rel.max() < 2e-2, (
        f"phi roundtrip error {rel.max():.2e} on {dev}")
    verbose(f"smoke[{dev.platform}]: phi invariants OK "
            f"(phi(12)={vals[1]:.3e}, max rel err {rel.max():.1e})")
