"""Race φ implementations inside the real grouped superstep on the TPU."""

import sys

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

from bench import get_code  # noqa: E402
from ldpc_decoder_tpu.ops import qc_pallas_grouped as g  # noqa: E402
from ldpc_decoder_tpu.ops.qc_decode import QCDecodeTables  # noqa: E402
from scripts.micro_phi import make_state, run  # noqa: E402
from scripts.phi_variants import VARIANTS  # noqa: E402


def main():
    code, qc = get_code()
    t = QCDecodeTables.from_structure(qc, code.n_erased_vars)
    tables = g.GroupedQCPallasTables.from_qc_tables(t, msg_bytes=2)
    state = make_state(tables, jax.random.PRNGKey(0))

    orig = g._phi_abs_f32
    try:
        for name, fn in VARIANTS.items():
            g._phi_abs_f32 = fn
            a = run(tables, state, 28, tag=f"phi={name}")
            b = run(tables, state, 14, tag=f"phi={name}")
            marginal = (28 * a - 14 * b) / 14
            print(f"  -> marginal iter {marginal*1e3:.2f}ms", flush=True)
    finally:
        g._phi_abs_f32 = orig
        g.run_iterations_qc_grouped.clear_cache()


if __name__ == "__main__":
    main()
