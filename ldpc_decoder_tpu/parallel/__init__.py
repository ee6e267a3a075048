from ldpc_decoder_tpu.parallel.mesh import (
    batch_sharding,
    make_batch_mesh,
    replicated_sharding,
    shard_batch_arrays,
)

__all__ = [
    "make_batch_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch_arrays",
]
