from dpdist_tpu.configs.config import (
    DPDistConfig,
    AUEConfig,
    PCRNetConfig,
    TrainConfig,
    MeshConfig,
)

__all__ = [
    "DPDistConfig",
    "AUEConfig",
    "PCRNetConfig",
    "TrainConfig",
    "MeshConfig",
]
