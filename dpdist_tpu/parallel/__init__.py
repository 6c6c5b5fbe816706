from dpdist_tpu.parallel.mesh import make_mesh, default_mesh
from dpdist_tpu.parallel.shard import (
    build_sharded_train_step,
    replicate,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "default_mesh",
    "build_sharded_train_step",
    "replicate",
    "shard_batch",
]
