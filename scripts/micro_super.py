"""Profile the real decoder superstep phases on the TPU (p41, B=256)."""

import sys

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

from bench import get_code  # noqa: E402
from ldpc_decoder_tpu.channels import BIAWGNChannel  # noqa: E402
from ldpc_decoder_tpu.runtime.datagen_device import create_pool_device  # noqa: E402
from ldpc_decoder_tpu.runtime.decoder import LDPCDecoder  # noqa: E402
from ldpc_decoder_tpu.runtime.params import DynamicParams, StaticParams  # noqa: E402


def main():
    code, qc = get_code()
    ch = BIAWGNChannel(0.94)
    dec = LDPCDecoder(code, ch, StaticParams(
        max_log_parallel_factor_user=8, message_dtype="bfloat16"), qc=qc)
    B = dec.parallel_factor()
    dyn = DynamicParams(num_iter_max=120, num_iter_check_parity=14,
                        loading_factor=1)
    pool = create_pool_device(dec.cc, dec.tables, ch, 0, B)
    jax.block_until_ready(pool.values_sorted)
    prof = dec.profile_phases(pool.values_sorted, pool.syn_sorted, dyn, B)
    for name, t in prof.items():
        print(f"{name}: {t*1e3:.2f}ms", flush=True)
    k = dyn.num_iter_check_parity
    print(f"implied superstep from parts: "
          f"{(prof['bp_iteration']*k + prof['parity_and_bits'])*1e3:.1f}ms")


if __name__ == "__main__":
    main()
