"""ARCO-TPU: a TPU-native (JAX/XLA/Pallas/pjit) semi-supervised segmentation framework.

A ground-up rebuild of the capabilities of the ARCO reference implementation
(charlesyou999648/ARCO, NeurIPS 2023, arXiv:2302.01735) designed for TPU:

- Functional state: every side effect of the reference (EMA-inside-forward,
  CPU FIFO memory banks, ring-buffer queues) is an explicit pytree carried
  through one jitted train step.
- Static shapes: dynamic boolean-mask gathers become rank-space stratified
  sampling with validity masks; memory banks are fixed-capacity device ring
  buffers.
- Device-side augmentation: color jitter, gaussian blur, cutout/cutmix/
  classmix, thin-plate-spline warps and diffeomorphic adversarial morphing are
  vmapped JAX transforms, not per-sample PIL loops.
- Scale-out via `jax.sharding.Mesh` + NamedSharding: batch-parallel over ICI,
  gradients reduced by XLA collectives; no hand-written communication code.
"""

__version__ = "0.1.0"
