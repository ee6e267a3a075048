"""Probe wide lane counts (B=384/512) on the Pallas general path (round 4).

The general path's two row gathers are row-bound (~12-16 ns/row,
scripts/micro_gather.py), so per-frame gather cost shrinks as B widens.
At B=256 the measured iteration is ~96 ms (~77 ms gathers + ~19 ms
streams) = 133.3 Mb/s; if a wider B fits HBM the projection is
~220 Mb/s at 512, ~170 at 384 — vs the reference's 200.3 Mb/s
any-alist baseline.

Measured (round 4): **B=512 OOMs on the real chip**, both before and
after the HBM squeeze (in-place CN/VN kernel aliasing cutting the live
edge arrays from 4 to 3, bf16 pool, init-gather skip —
ops/general_pallas._whole_array); B=384 is the widest that fits and
measures 168.5 Mb/s (scripts/out/bench_general_r4b.log).

Usage: python scripts/try_gp_b512.py [B] [sigma]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    from ldpc_decoder_tpu.channels import BIAWGNChannel
    from ldpc_decoder_tpu.codes.generate import make_regular_code
    from ldpc_decoder_tpu.runtime.datagen import create_data
    from ldpc_decoder_tpu.runtime.decoder import LDPCDecoder
    from ldpc_decoder_tpu.runtime.params import DynamicParams, StaticParams

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 384
    sigma = float(sys.argv[2]) if len(sys.argv) > 2 else 0.84
    n_vars = 1 << 20
    code = make_regular_code(n_vars, 3, 6, seed=9)
    ch = BIAWGNChannel(sigma)
    dec = LDPCDecoder(
        code, ch,
        StaticParams(parallel_factor_user=B,  # past the memory model
                     message_dtype="bfloat16",
                     qc_autodetect=False),
    )
    print(f"B={dec.parallel_factor()} (forced)", flush=True)
    dyn = DynamicParams(num_iter_max=120, num_iter_check_parity=10,
                        loading_factor=1, target_errors=15)
    n = B
    batch = create_data(code, ch, 0, n)

    import jax
    import jax.numpy as jnp

    vn_order = np.asarray(dec.cc.vn_order)
    cn_order = np.asarray(dec.cc.cn_order)
    # bf16 pool: the LLR state is stored bf16 anyway (decoder._llr_dtype
    # for bf16 messages), so a bf16 pool is lossless for the decode and
    # halves the held pool bytes (part of the B=512 HBM squeeze)
    pool_values = jnp.asarray(
        ch.llr_np(batch.values)[vn_order]).astype(jnp.bfloat16)
    pool_syn = jnp.asarray(batch.syndromes[cn_order].astype(np.int8))
    jax.block_until_ready((pool_values, pool_syn))

    t0 = time.perf_counter()
    results, stats = dec.decode_presorted(dyn, n, pool_values, pool_syn,
                                          input_is_llr=True)
    print(f"decode 1 (incl. compile): {time.perf_counter()-t0:.1f}s",
          flush=True)
    results, stats = dec.decode_presorted(dyn, n, pool_values, pool_syn,
                                          input_is_llr=True)
    errors = np.bitwise_count(batch.ref_bits_packed() ^ results).sum(axis=1)
    itpv = stats.iter_time_per_vector
    mbps = n_vars / (stats.avg_iter * itpv * 1048576.0)
    print(f"iters avg/max/min {stats.avg_iter:.1f}/{stats.max_iter}/"
          f"{stats.min_iter}, itpv={itpv:.3e}s, BER="
          f"{errors.sum()/(n_vars*n):.2e} FER(>0)={(errors>0).mean():.4f}",
          flush=True)
    print(f"general-path B={B} decoding throughput: {mbps:.1f} Mb/s "
          f"(B=256: 133.3; reference baseline: 200.3)", flush=True)


if __name__ == "__main__":
    main()
