"""Worker process for the multi-process decode test (spawned by
tests/test_multiprocess.py): 2 processes x 4 virtual CPU devices decode a
shared pool of frames to zero errors via jax.distributed + gloo."""

import sys


def main():
    proc_id = int(sys.argv[1])
    num_procs = int(sys.argv[2])
    port = int(sys.argv[3])
    devices_per_proc = int(sys.argv[4]) if len(sys.argv) > 4 else 4

    from ldpc_decoder_tpu.parallel.multiprocess import (
        decode_multiprocess,
        global_batch_mesh,
        initialize,
    )

    initialize(f"localhost:{port}", num_procs, proc_id,
               cpu_devices_per_process=devices_per_proc)

    import numpy as np

    from ldpc_decoder_tpu.channels import BIAWGNChannel
    from ldpc_decoder_tpu.codes.protographs import regular_base
    from ldpc_decoder_tpu.codes.qc import make_qc_code
    from ldpc_decoder_tpu.runtime.decoder import LDPCDecoder
    from ldpc_decoder_tpu.runtime.params import DynamicParams, StaticParams

    # identical construction in every process (SPMD contract)
    base = regular_base(8, 16, 3, 6, seed=3)
    code, qc = make_qc_code(base, Z=256, seed=1, coarse=128, fine_mod=4)
    ch = BIAWGNChannel(0.6)
    dec = LDPCDecoder(
        code, ch, StaticParams(max_log_parallel_factor_user=1), qc=qc
    )
    dyn = DynamicParams(num_iter_max=40, num_iter_check_parity=5,
                        loading_factor=2, target_errors=15)
    mesh = global_batch_mesh()
    n = dec.parallel_factor() * dyn.loading_factor * len(mesh.devices.ravel())
    res, ids, stats = decode_multiprocess(dec, dyn, n, start_index=0,
                                          mesh=mesh)
    n_local = sum(len(np.asarray(i)) for i in ids)
    print(
        f"MP_OK proc={proc_id} errors={stats.bit_errors} frames={n} "
        f"local_frames={n_local} avg_iter={stats.avg_iter:.2f} "
        f"supersteps={stats.total_supersteps}",
        flush=True,
    )
    assert stats.bit_errors == 0
    assert stats.frames_with_errors == 0
    assert n_local == n // num_procs


if __name__ == "__main__":
    main()
