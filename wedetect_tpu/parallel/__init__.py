"""Device mesh + sharding (the TPU-native distributed layer)."""

from wedetect_tpu.parallel.mesh import (batch_sharding, fsdp_sharding,
                                        make_mesh, replicate_tree,
                                        shard_batch)

__all__ = ["batch_sharding", "fsdp_sharding", "make_mesh",
           "replicate_tree", "shard_batch"]
