from dpdist_tpu.train.checkpoint import save_checkpoint, restore_checkpoint, latest_checkpoint
from dpdist_tpu.train.optim import make_optimizer
from dpdist_tpu.train.trainer import DPDistTrainer
from dpdist_tpu.train.aue_trainer import AUETrainer
from dpdist_tpu.train.pcrnet_trainer import PCRNetTrainer
from dpdist_tpu.train.logging import RunLogger

__all__ = [
    "save_checkpoint",
    "restore_checkpoint",
    "latest_checkpoint",
    "make_optimizer",
    "DPDistTrainer",
    "AUETrainer",
    "PCRNetTrainer",
    "RunLogger",
]
