"""Measure the headline point at B=512 lanes (forced memory model).

The v5e's 16 GB HBM memory-models to B=256 under the sizing model's
loading-factor-4 assumption; the true resident footprint at B=512 with
a 512-frame pool is ~12 GB, so it may fit. If it does, the doubled lane
count amortizes the ~18 ms/superstep fixed cost (emit/parity + retire/
refill machinery) over 2x the frames — worth ~+3-4% if marginal
iteration time scales linearly.

Usage: python scripts/try_b512.py
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
    code, qc = get_code()
    channel = BIAWGNChannel(sigma)
    dec = LDPCDecoder(
        code, channel,
        StaticParams(max_log_parallel_factor_user=9,
                     message_dtype="bfloat16",
                     device_memory_bytes=64 << 30),
        qc=qc,
    )
    B = dec.parallel_factor()
    print(f"B={B}", flush=True)
    n = 512
    dyn = DynamicParams(num_iter_max=120, num_iter_check_parity=14,
                        num_iter_first_check=56, loading_factor=max(
                            2, -(-n // B)), target_errors=15)

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
