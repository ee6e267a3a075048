"""Measure the headline point at B=384 lanes (forced, non-power-of-two).

The memory model only picks power-of-two lane counts (reference parity,
ldpc_decoder_gpu.cu:72-99), so 256 -> 512 was the only step up and 512
OOMs (~18 GB resident, scripts/try_b512.py dead end). B=384 is a valid
lane count for the kernels (384 % 128 == 0 lane blocks) at ~3/4 of the
512 footprint (~12-13 GB), and amortizes the ~19 ms/superstep fixed
cost (emit/parity + retire/refill conds, scripts/micro_machinery.py)
over 1.5x lanes — expected +1-3% if marginal iteration time scales
linearly with B. Uses n=768 frames = exactly 2 full fills so no idle
lanes inflate itpv.

Usage: python scripts/try_b384.py [B [n_frames]]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench import get_code  # noqa: E402
from ldpc_decoder_tpu.channels import BIAWGNChannel  # noqa: E402
from ldpc_decoder_tpu.runtime.datagen_device import (  # noqa: E402
    count_bit_errors,
    create_pool_device,
)
from ldpc_decoder_tpu.runtime.decoder import LDPCDecoder  # noqa: E402
from ldpc_decoder_tpu.runtime.params import (  # noqa: E402
    DynamicParams,
    StaticParams,
)


def main():
    sigma = 0.94
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 384
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2 * B
    code, qc = get_code()
    channel = BIAWGNChannel(sigma)
    dec = LDPCDecoder(
        code, channel,
        StaticParams(message_dtype="bfloat16", parallel_factor_user=B),
        qc=qc,
    )
    print(f"B={dec.parallel_factor()} n={n}", flush=True)
    dyn = DynamicParams(num_iter_max=120, num_iter_check_parity=14,
                        num_iter_first_check=70,
                        loading_factor=max(2, -(-n // B)), target_errors=15)

    t0 = time.perf_counter()
    pool = create_pool_device(dec.cc, dec.tables, channel, 0, n)
    pool.values_sorted.block_until_ready()
    print(f"datagen: {time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    _ = dec.decode_presorted(dyn, n, pool.values_sorted, pool.syn_sorted,
                             fetch_results=False)
    print(f"decode 1 (incl. compile): {time.perf_counter()-t0:.1f}s",
          flush=True)
    results, stats = dec.decode_presorted(
        dyn, n, pool.values_sorted, pool.syn_sorted, fetch_results=False)
    errors = np.asarray(count_bit_errors(results, pool.ref_packed))
    itpv = stats.iter_time_per_vector
    mbps = code.n_vars / (stats.avg_iter * itpv * 1048576.0)
    print(f"decode: {stats.elapsed_seconds:.2f}s avg_iters={stats.avg_iter:.1f}"
          f" itpv={itpv:.3e} FER={float((errors > 0).mean()):.4f}"
          f" BER={errors.sum() / (code.n_vars * n):.3e}", flush=True)
    print(f"decoding throughput at B={B}: {mbps:.1f} Mb/s "
          f"({mbps / 200.276:.3f}x baseline)", flush=True)


if __name__ == "__main__":
    main()
