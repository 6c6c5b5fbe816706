"""dpdist_tpu: a TPU-native framework for learned point-cloud distances.

Re-implements the capabilities of DPDist ("Comparing Point Clouds Using
Deep Point Cloud Distance", ECCV 2020) as an idiomatic JAX/XLA/Pallas
framework: SPMD over device meshes, functional transforms, and
MXU-friendly kernels.

Layer map (mirrors the reference's seven layers, re-designed TPU-first):
  data/      offline GT-distance generation, loaders, augmentation
  nn/        functional layer library (explicit param pytrees)
  ops/       compute ops: 3DmFV, voxel lookup, chamfer, EMD
  kernels/   Pallas TPU kernels for the hot ops
  models/    DPDist, autoencoders, PCRNet
  losses/    L1 sample loss, chamfer, EMD, frozen DPDist loss
  parallel/  mesh construction + shard_map train-step builders
  train/     train state, optimizer schedules, checkpointing, metrics
  eval/      pair-distance eval + registration harness
  cli/       entry points mirroring the reference's scripts
"""

__version__ = "0.1.0"
