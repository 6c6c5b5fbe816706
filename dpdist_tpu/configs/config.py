"""Typed configuration dataclasses.

Replaces the reference's argparse-flag/module-global config system
(train_multi_gpu_pc_compare_dist.py:41-135, iterative_PCRNet_ours.py:25-65)
with frozen dataclasses that are hashable (usable as jit static args) and
serializable to the run directory.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass
from typing import Tuple


def _as_dict(cfg) -> dict:
    return dataclasses.asdict(cfg)


class _JsonMixin:
    def to_json(self) -> str:
        return json.dumps(_as_dict(self), indent=2, sort_keys=True)

    @classmethod
    def from_json(cls, s: str):
        d = json.loads(s)
        # JSON has no tuples; restore them so configs stay hashable
        # (hashability is required for jit static-arg use).
        d = {k: tuple(v) if isinstance(v, list) else v for k, v in d.items()}
        return cls(**d)

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class DPDistConfig(_JsonMixin):
    """DPDist model hyperparameters.

    Defaults mirror the reference's canonical trained config (the shipped
    checkpoint dir name: imp_type 1, enc 3dmfv, EmbS 512, BN 0, sigma .125,
    K 5, np 64; cf. reference train_multi_gpu_pc_compare_dist.py:41-69).
    """

    num_point: int = 64           # query points per cloud (--num_point)
    dims: int = 3                 # point dimensionality
    embedding_size: int = 512     # number of Gaussians / voxels (8**3)
    sigma: float = 0.125          # 3DmFV Gaussian stddev (sigma3dmfv*0.0625)
    full_fv: bool = True          # 20 channels/Gaussian (mean+max+min pools)
    k: int = 5                    # local patch window; 0 = global embedding
    mlp: Tuple[int, ...] = (1024, 1024, 1024)  # implicit decoder widths
    conv_version: int = 1         # 1 = dense MLP (default), 3 = conv3d+resnet path
    encoder: str = "3dmfv"        # "3dmfv" | "pointnet"
    pointnet_embedding: int = 1024
    output_act: str = "relu"      # "relu" -> relu6(x)/3 in [0,2]; "tanh"; other -> relu6(x+3)/3-1
    use_bn: bool = False          # reference default BN=0
    output_channels: int = 3      # decoder output channels; loss uses channel 0
    dtype: str = "float32"        # compute dtype for the decoder matmuls
    fused_gather: str = "auto"    # "auto" | "on" | "table" | "mfv" | "full" | "off"
                                  # 'on' = per-query VMEM gather kernel,
                                  # 'table' = VMEM patch-table kernel,
                                  # 'full' = table + whole decoder in VMEM
                                  #          (eval-only serving path, bf16)
                                  # (skips the k^3 patch table; TPU only)

    @property
    def grid_size(self) -> int:
        if self.dims == 2:
            g = round(self.embedding_size ** 0.5)
            if g * g != self.embedding_size:
                raise ValueError(
                    f"embedding_size must be a square for dims=2, got {self.embedding_size}")
            return g
        g = round(self.embedding_size ** (1.0 / 3.0))
        if g ** 3 != self.embedding_size:
            raise ValueError(f"embedding_size must be a cube, got {self.embedding_size}")
        return g

    @property
    def fv_channels(self) -> int:
        # d_pi: mean(+max); d_mu, d_sigma: mean(+max+min) each, D dims.
        if self.full_fv:
            return 2 + 3 * self.dims + 3 * self.dims
        return 1 + self.dims + self.dims

    @property
    def patch_dim(self) -> int:
        if self.encoder == "pointnet":
            # PointNet encoder produces one global vector (k must be 0).
            return self.pointnet_embedding
        if self.k == 0:
            return self.fv_channels * self.embedding_size
        return self.fv_channels * self.k ** self.dims


@dataclass(frozen=True)
class AUEConfig(_JsonMixin):
    """Point-cloud autoencoder (reference models/dpdist_and_aue.py:88-180)."""

    num_point: int = 64
    encoder: str = "pn"           # "pn" (PointNet AE) | "3dmfv" (inception decoder)
    n_gaussians: int = 512
    use_bn: bool = True           # reference AUE always uses BN


@dataclass(frozen=True)
class PCRNetConfig(_JsonMixin):
    """Iterative PCRNet (reference pcrnet-registration/models/ipcr_model.py)."""

    num_point: int = 1024
    encoder: str = "pointnet"     # "pointnet" | "pointnet_avg" | "3dmfv"
    out_features: int = 1024
    max_loops: int = 8            # iterative refinement loops during training
    eval_iterations: int = 50     # fixed eval refinement iterations
    lim_rot: float = 0.0          # >0: tanh-limited axis-angle head (degrees)
    head_widths: Tuple[int, ...] = (1024, 512, 256)
    # ^ iterative PCRNet head (ipcr_model.get_pose:273-283); the older
    #   single-pass pcr_model uses (1024, 1024, 512, 512, 256)
    #   (models/pcr_model.py:14-93) — set head_widths + max_loops=1.
    dropout_keep: float = 0.7
    sigma3dmfv: float = 0.25      # 3dmfv encoder variant: sigma=0.0625*4
    mfv_grid: int = 8


@dataclass(frozen=True)
class TrainConfig(_JsonMixin):
    """Optimizer + schedule + runtime knobs."""

    batch_size: int = 16
    learning_rate: float = 1e-4   # --learning_rate_dpdist
    decay_step: int = 300 * 512   # staircase decay step
    decay_rate: float = 0.5
    lr_floor: float = 1e-7        # reference clips LR at 1e-7
    optimizer: str = "adam"
    momentum: float = 0.9
    weight_decay: float = 0.0
    grad_clip: float = 0.0        # >0: global-norm gradient clipping
                                  # (stabilizes full-BPTT train_single)
    max_epoch: int = 10001
    bn_init_decay: float = 0.5
    bn_decay_rate: float = 0.5
    bn_decay_clip: float = 0.99
    loss_type: str = "l1_dist"
    augment: bool = True
    add_noise: float = 0.0
    # Encoder-input occlusion (round-3): corrupt the CONDITIONING cloud
    # with kNN-ball removal + duplicate refill while the GT labels stay
    # vs the true surface — trains the learned distance to see past the
    # corruption class the registration evaluator's --add_occlusions
    # applies (helper.add_occlusions semantics, helper.py:963-982).
    encoder_occlusion: float = 0.0        # fraction of points removed
    encoder_occlusion_prob: float = 0.0   # per-item probability
    seed: int = 0
    log_every: int = 10
    checkpoint_every_epochs: int = 10


@dataclass(frozen=True)
class MeshConfig(_JsonMixin):
    """Device mesh layout.

    data:   data-parallel axis (batch sharding + psum grad reduce) — the
            TPU-native replacement for the reference's in-graph GPU towers.
    points: optional query-point axis (the sequence-parallel analog): each
            query point is independent given the embedding, so sharding N
            over this axis scales dense evaluation to 1e5-1e6 points.
    """

    data: int = 1
    points: int = 1

    @property
    def num_devices(self) -> int:
        return self.data * self.points
