"""kd6d_pose_adlp_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
knowledge-distilled 6D pose estimation (WDRNet+ / "Aligning Distributions of
Local Predictions", CVPR 2023).

Capability-equivalent re-design of GUOShuxuan/kd-6d-pose-adlp (the reference
is CUDA/PyTorch; this framework is built TPU-first):

- fixed-shape, fully-batched compiled train/eval steps (no per-image Python
  loops on the hot path),
- Flax backbones (darknet_tiny / darknet_tiny_h / darknet53) + FPN + dense
  pose head,
- masked SSC positive sampling, focal + object-space losses,
- batched weighted unbalanced Sinkhorn-divergence KD loss (geomloss-style
  semantics) in pure JAX with a Pallas TPU kernel for the hot path,
- on-device RANSAC-EPnP postprocess,
- SPMD data parallelism over a `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"
