from dpdist_tpu.data.synthetic import synthetic_surface, SHAPE_FAMILIES
from dpdist_tpu.data.gtgen import (
    generate_gt_for_points,
    write_reference_format,
    generate_synthetic_dataset,
    uniform_sampling,
    SAMPLING_SCHEMES,
)
from dpdist_tpu.data.modelnet import SurfacePairDataset
from dpdist_tpu.data.batching import assemble_dpdist_batch
from dpdist_tpu.data import augment

__all__ = [
    "synthetic_surface",
    "SHAPE_FAMILIES",
    "generate_gt_for_points",
    "write_reference_format",
    "generate_synthetic_dataset",
    "uniform_sampling",
    "SAMPLING_SCHEMES",
    "SurfacePairDataset",
    "assemble_dpdist_batch",
    "augment",
]
