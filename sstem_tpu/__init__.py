"""sstem_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for ssTEM image restoration.

Re-designed from scratch with the capabilities of the reference PyTorch codebase
(sydeng99/ssTEM-restoration): SFF (support-film-fold) and SP (stain-precipitate)
artifact restoration via interpolation / correction / fusion model stacks.

Layout (mirrors SURVEY.md §7):
  kernels/   Pallas TPU kernels (adaptive separable convolution) + XLA oracles
  ops/       differentiable image ops (warp, flow synthesis, torch-parity ops)
  models/    Flax models (IFNet, FusionNet, U-Nets, discriminators)
  data/      degradation simulators + sample providers
  parallel/  device-mesh sharding, tiled halo inference
  train/     pjit train loops, schedules, checkpointing
  infer/     inference pipelines and tiling
  compat/    PyTorch checkpoint / YAML-config compatibility
"""

__version__ = "0.1.0"
