from dpdist_tpu.ops.threedmfv import threedmfv, threedmfv_grid
from dpdist_tpu.ops.voxel import (
    voxel_assign,
    grid_centers,
    extract_patches,
    gather_patches,
)
from dpdist_tpu.ops.chamfer import (
    pairwise_sqdist,
    nn_distance,
    chamfer_distance,
)
from dpdist_tpu.ops.emd import sinkhorn_emd, earth_mover_distance
from dpdist_tpu.ops.knn import pairwise_distance, knn

__all__ = [
    "threedmfv",
    "threedmfv_grid",
    "voxel_assign",
    "grid_centers",
    "extract_patches",
    "gather_patches",
    "pairwise_sqdist",
    "nn_distance",
    "chamfer_distance",
    "sinkhorn_emd",
    "earth_mover_distance",
    "pairwise_distance",
    "knn",
]
