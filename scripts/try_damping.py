"""Relaxed/over-relaxed flood BP: does blending successive messages cut
the iteration count at the 0.94 operating point?

m_{t} <- (1-g)*m_{t-1} + g*m_t in the (signed, phi-domain) check-order
message array, applied after the full VN->CN rotation. g=1 is the shipped
plain flood schedule; g<1 is successive relaxation (Hemati/Banihashemi),
g>1 over-relaxation. Measures per-lane first-convergence iteration on the
real p41 pool at sigma 0.94 through the XLA oracle (bit-semantics of the
shipped path, bf16 storage); gamma is traced so the scan compiles once.

Iterations are ~22% of the headline's cost structure per unit (avg 71.9
at 206-209 Mb/s): a gamma that drops avg first-convergence by >5% with
FER intact would be worth wiring into the kernels (one extra aligned
edge-array read + FMA per iteration, no extra phi).
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

B = 64
MAX_IT = 120
SIGMA = 0.94
GAMMAS = (1.0, 0.9, 0.8, 1.1, 1.2)


def main():
    import jax
    import jax.numpy as jnp

    from bench import get_code
    from ldpc_decoder_tpu.channels import BIAWGNChannel
    from ldpc_decoder_tpu.ops import qc_decode as Q
    from ldpc_decoder_tpu.runtime.datagen_device import create_pool_device
    from ldpc_decoder_tpu.runtime.decoder import LDPCDecoder
    from ldpc_decoder_tpu.runtime.params import StaticParams

    code, s = get_code()
    channel = BIAWGNChannel(SIGMA)
    dec = LDPCDecoder(
        code, channel,
        StaticParams(max_log_parallel_factor_user=8,
                     message_dtype="bfloat16", kernel_impl="xla"),
        qc=s,
    )
    ct = dec.tables
    assert isinstance(ct, Q.QCDecodeTables), type(ct)
    t0 = time.perf_counter()
    pool = create_pool_device(dec.cc, dec.tables, channel, 0, B)
    pool.values_sorted.block_until_ready()
    print(f"datagen {B} frames: {time.perf_counter()-t0:.1f}s", flush=True)

    Z = ct.Z
    vals = pool.values_sorted[:, :B]
    llr2 = channel.llr_from_channel(vals)
    llr2 = jnp.where(ct.erased_mask_sorted, 0.0, llr2).astype(jnp.bfloat16)
    syn2 = pool.syn_sorted[:, :B]
    msgs0 = Q.init_messages_qc(llr2, ct, dtype=jnp.bfloat16)

    @jax.jit
    def scan(msgs2d, llr2d, syn2d, gamma):
        msgs = msgs2d.reshape(ct.n_blocks, Z, B)
        llr = llr2d.reshape(-1, Z, B)
        syn = syn2d.reshape(-1, Z, B)

        def body(i, carry):
            m, conv_at = carry
            new, totals = Q.bp_iteration_qc(m, llr, syn, ct)
            new = ((1.0 - gamma) * m.astype(jnp.float32)
                   + gamma * new.astype(jnp.float32)).astype(m.dtype)
            bits = (~jnp.signbit(totals)).astype(jnp.int8)
            viol = Q.parity_violations_qc(bits, syn, ct)
            conv_at = jnp.where((conv_at < 0) & ~viol, i + 1, conv_at)
            return new, conv_at

        conv0 = jnp.full((B,), -1, jnp.int32)
        _, conv = jax.lax.fori_loop(0, MAX_IT, body, (msgs, conv0))
        return conv

    for g in GAMMAS:
        t0 = time.perf_counter()
        conv = np.asarray(scan(msgs0, llr2, syn2, jnp.float32(g)))
        dt = time.perf_counter() - t0
        ok = conv[conv > 0]
        fer = float((conv < 0).mean())
        print(
            f"gamma={g:.2f}: avg={ok.mean() if ok.size else -1:.2f} "
            f"max={ok.max() if ok.size else -1} min={ok.min() if ok.size else -1} "
            f"FER={fer:.3f}  ({dt:.1f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
