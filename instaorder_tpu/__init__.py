"""instaorder_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
instance-wise occlusion & depth order prediction.

Capability parity target: POSTECH-CVLab/InstaOrder (CVPR 2022).
See SURVEY.md for the structural analysis of the reference and the
layer-by-layer mapping.

Top-level layout:
  core/      — functional module system, schedules, checkpointing
  ops/       — on-device kernels (cv2-parity resize, morphology, pair prep)
  models/    — network definitions (ResNet-cls, UNet, MiDaS, InstaDepthNet)
  data/      — host-side readers, RLE codec, datasets, samplers
  train/     — algo wrappers (loss semantics), pjit train steps, Trainer
  eval/      — batched order decode, metrics (F1 / WHDR / dense depth)
  parallel/  — mesh + sharding helpers (DP over ICI, declarative rules)
  compat/    — PyTorch checkpoint -> JAX pytree weight conversion
  cli/       — train/test entry points reading the reference YAML schema
"""

__version__ = "0.1.0"
