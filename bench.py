"""Flagship benchmark: decoded throughput on a 2^20-bit rate-0.5 AWGN code.

Mirrors the reference's headline config (README.md:56, 68-107: RTX 3080,
2^20-bit AWGN rate-0.5 code near threshold, 256 frames resident, loading
factor 2, -e 15 -i 120) on one TPU chip. Baseline: 200.276 Mb/s steady-state
decoding throughput (BASELINE.md).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mb/s", "vs_baseline": N/200.276}

Diagnostics go to stderr. The noise level is chosen near the benched code's
own BP threshold so the average iteration count is comparable to the
reference's 90.7 (the generated code and the reference's unpublished one
differ; matched-work comparison is by iterations, and the metric itself is
normalized per iteration via the reference's own formula).
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_MBPS = 200.276  # README.md:106
ALIST = os.path.join(os.path.dirname(__file__), "codes_cache",
                     "bench_qc36x_awgn_r05_1048576_g8.alist")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def get_code():
    """The flagship bench code: a ~2^20-bit rate-0.5 (3,6)-regular QC code
    (Z = 174080, 4-cycle-free), decoded through the fused Pallas kernels."""
    from ldpc_decoder_tpu.codes.qc import (
        load_qc_alist,
        make_qc_code,
        write_qc_alist,
    )

    if os.path.exists(ALIST):
        log(f"loading cached code {ALIST}")
        code, s = load_qc_alist(ALIST)
        if s is not None:
            return code, s
    log("generating 2^20-bit rate-0.5 QC code (16x32 base, Z=2^15, "
        "seam lattice, girth 8)...")
    from ldpc_decoder_tpu.codes.protographs import regular_base

    # sparse scaled (3,6) base: the all-ones 3x6 base caps minimum
    # distance at (d_v+1)! = 24 for any lift (MacKay/Davey), which makes
    # near-threshold BP converge onto wrong codewords; a random 16x32
    # base escapes the bound with the same degree profile/threshold
    base = regular_base(16, 32, 3, 6, seed=2)
    # shifts on the 1024-coarse seam lattice with +-63 fine parts: the
    # Pallas kernels fetch one aligned 1024-row tile + two 64-row halos
    # per rotated window (~12.5% extra reads). The wide fine range is
    # worth its read overhead: narrower lattices (fine_mod=16) measured
    # ~48 avg iterations vs 41.7 here — richer shifts mean fewer
    # 8-cycles and faster BP mixing. Girth 8 by rejection.
    code, s = make_qc_code(base, Z=32768, seed=1, coarse=1024,
                           fine_mod=64, min_girth=8)
    os.makedirs(os.path.dirname(ALIST), exist_ok=True)
    write_qc_alist(code, s, ALIST)
    return code, s


RU_ALIST = os.path.join(os.path.dirname(__file__), "codes_cache",
                        "bench_ru48_awgn_r05_1032192_g8.alist")


def run_ru_secondary():
    """Decode the RU max-dv-8 irregular 2^20 code (sigma* ~ 0.9497) at
    sigma 0.90 — the FER-matched comparison point with the reference."""
    from ldpc_decoder_tpu.codes.protographs import ru_irregular_base
    from ldpc_decoder_tpu.codes.qc import (
        load_qc_alist, make_qc_code, write_qc_alist)
    from ldpc_decoder_tpu.channels import BIAWGNChannel
    from ldpc_decoder_tpu.runtime.datagen_device import (
        count_bit_errors, create_pool_device)
    from ldpc_decoder_tpu.runtime.decoder import LDPCDecoder
    from ldpc_decoder_tpu.runtime.params import DynamicParams, StaticParams

    if os.path.exists(RU_ALIST):
        code, s = load_qc_alist(RU_ALIST)
    else:
        # 24x48 base picked by iteration-constrained P-EXIT score
        # (scripts/optimize_base.py methodology); the finer base
        # granularity also fixes finite-length trapping behaviour
        base, _ = ru_irregular_base(8, seed=20)
        code, s = make_qc_code(base, Z=21504, seed=1, coarse=1024,
                               fine_mod=64, min_girth=8)
        write_qc_alist(code, s, RU_ALIST)
    ch = BIAWGNChannel(0.90)
    dec = LDPCDecoder(code, ch,
                      StaticParams(max_log_parallel_factor_user=8,
                                   message_dtype="bfloat16"), qc=s)
    dyn = DynamicParams(num_iter_max=120, num_iter_check_parity=10,
                        loading_factor=2, target_errors=15)
    n = (dec.parallel_factor() * 2 // 32) * 32
    pool = create_pool_device(dec.cc, dec.tables, ch, 0, n)
    _ = dec.decode_presorted(dyn, n, pool.values_sorted, pool.syn_sorted,
                             fetch_results=False)
    results, stats = dec.decode_presorted(
        dyn, n, pool.values_sorted, pool.syn_sorted, fetch_results=False)
    errors = np.asarray(count_bit_errors(results, pool.ref_packed))
    mbps = code.n_vars / (stats.avg_iter * stats.iter_time_per_vector
                          * 1048576.0)
    return mbps, float((errors > 0).mean())


def main():
    t_all = time.perf_counter()
    from ldpc_decoder_tpu.channels import BIAWGNChannel
    from ldpc_decoder_tpu.runtime.datagen_device import (
        count_bit_errors,
        create_pool_device,
    )
    from ldpc_decoder_tpu.runtime.decoder import LDPCDecoder
    from ldpc_decoder_tpu.runtime.params import DynamicParams, StaticParams

    # near the (3,6) ensemble's BP threshold (sigma* ~ 0.879) so the average
    # iteration count is comparable to the reference's flagship run (90.7
    # iterations at its own code's threshold, README.md:104)
    sigma = float(os.environ.get("BENCH_SIGMA", "0.87"))
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    alg = os.environ.get("BENCH_ALG", "sum-product")
    code, qc = get_code()
    channel = BIAWGNChannel(sigma)
    dec = LDPCDecoder(
        code, channel,
        StaticParams(max_log_parallel_factor_user=8, message_dtype=dtype,
                     algorithm=alg),
        qc=qc,
    )
    dyn = DynamicParams(num_iter_max=120, num_iter_check_parity=10,
                        loading_factor=2, target_errors=15)
    B = dec.parallel_factor()
    n = B * dyn.loading_factor
    n = (n // 32) * 32
    log(f"sigma={sigma} dtype={dtype} alg={alg} B={B} frames={n}")

    t0 = time.perf_counter()
    pool = create_pool_device(dec.cc, dec.tables, channel, 0, n)
    pool.values_sorted.block_until_ready()
    log(f"on-device datagen: {time.perf_counter()-t0:.1f}s")

    # warm-up/compile pass on a tiny pool slice
    t0 = time.perf_counter()
    _ = dec.decode_presorted(dyn, n, pool.values_sorted, pool.syn_sorted,
                             fetch_results=False)
    log(f"decode 1 (incl. compile): {time.perf_counter()-t0:.1f}s")

    t0 = time.perf_counter()
    results, stats = dec.decode_presorted(
        dyn, n, pool.values_sorted, pool.syn_sorted, fetch_results=False
    )
    errors = np.asarray(count_bit_errors(results, pool.ref_packed))
    elapsed = stats.elapsed_seconds

    frame_bits = code.n_vars
    itpv = stats.iter_time_per_vector
    avg_iter = stats.avg_iter
    dec_mbps = frame_bits / (avg_iter * itpv * 1048576.0)
    e2e_mbps = (frame_bits * n / 1048576.0) / elapsed
    fer1 = float((errors > 0).mean())
    fer15 = float((errors > 15).mean())
    ber = float(errors.sum()) / (frame_bits * n)

    log(
        f"decode: {elapsed:.2f}s, iters avg/max/min = {avg_iter:.1f}/"
        f"{stats.max_iter}/{stats.min_iter}, itpv={itpv:.3e}s, "
        f"BER={ber:.3e} FER(>0)={fer1:.4f} FER(>15)={fer15:.4f}"
    )
    log(f"decoding throughput: {dec_mbps:.1f} Mb/s; end-to-end {e2e_mbps:.1f}"
        f" Mb/s; total wall {time.perf_counter()-t_all:.1f}s")

    # secondary, FER-matched datapoint: the RU irregular 2^20 code at
    # sigma 0.90 BEATS the reference's own FER operating point (measured
    # FER(>=1) 0.012 vs its 0.047, equal BER ~2.4e-7, README.md:96-99) at
    # 91.3% of Shannon (reference: 94.9% on its unpublished code) — the
    # closest apples-to-apples configuration
    if os.environ.get("BENCH_SECONDARY", "1") != "0":
        # release the flagship pool/decoder HBM first
        import gc

        del pool, results, dec
        gc.collect()
        try:
            ru_mbps, ru_fer = run_ru_secondary()
            log(f"secondary (RU irregular, sigma 0.90, FER-matched): "
                f"{ru_mbps:.1f} Mb/s, FER(>0) {ru_fer:.4f}, "
                f"{ru_mbps / BASELINE_MBPS:.2f}x baseline")
        except Exception as e:  # never fail the headline metric
            log(f"secondary bench skipped: {type(e).__name__}: {e}")

    print(json.dumps({
        "metric": "decoding_throughput_1Mbit_rate0.5_awgn",
        "value": round(dec_mbps, 2),
        "unit": "Mb/s",
        "vs_baseline": round(dec_mbps / BASELINE_MBPS, 4),
    }))


if __name__ == "__main__":
    main()
