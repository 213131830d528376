"""tecogan_tpu — a TPU-native video super-resolution framework.

A from-scratch JAX / XLA / Pallas re-design of the capabilities of
TecoGAN-PyTorch (frame-recurrent VSR: FRVSR + TecoGAN), built TPU-first:

- NHWC layouts, params as pytrees, pure-functional networks.
- Temporal recurrence via ``lax.scan`` (training BPTT and streaming inference),
  HR state carried on device — no per-frame host round trips.
- Resampling ops (bilinear / bicubic upsampling, Gaussian-blur downsampling,
  Matlab-compatible imresize) formulated as separable 1-D operator matrices
  applied with einsum, so they run on the MXU instead of tiny conv kernels.
- Data parallelism via ``jax.sharding`` over a device mesh (GSPMD): gradient
  reductions, cross-replica BatchNorm statistics and the adaptive-discriminator
  vote are all global means over the sharded batch — XLA inserts the
  collectives over ICI.

Reference behaviour surface: skycrapers/TecoGAN-PyTorch (see SURVEY.md).
"""

__version__ = "0.1.0"
