from dpdist_tpu.models.dpdist import (
    init_dpdist,
    apply_dpdist,
    dpdist_embed,
    dpdist_distance,
)
from dpdist_tpu.models.aue import init_aue, apply_aue
from dpdist_tpu.models.pcrnet import (
    init_pcrnet,
    apply_pcrnet,
    pcrnet_refine,
)

__all__ = [
    "init_dpdist",
    "apply_dpdist",
    "dpdist_embed",
    "dpdist_distance",
    "init_aue",
    "apply_aue",
    "init_pcrnet",
    "apply_pcrnet",
    "pcrnet_refine",
]
