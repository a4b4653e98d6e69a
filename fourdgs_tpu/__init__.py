"""4DGS-TPU: TPU-native 4D Gaussian Splatting framework (JAX/XLA/Pallas).

A from-scratch reimplementation of the capabilities of hustvl/4DGaussians
(CVPR 2024) designed for TPU hardware: differentiable tile-based Gaussian
rasterization as XLA/Pallas kernels, HexPlane deformation fields, two-stage
training with adaptive densification on fixed-capacity buffers, and
pjit/shard_map scaling over device meshes.

Package layout (see SURVEY.md for the reference component inventory):
  ops/       math substrate + rasterization kernels (projection, SH, losses,
             KNN, tiled rasterizer, Pallas kernels)
  models/    scene representation (Gaussian buffers, HexPlane, deformation MLP)
  data/      dataset readers (Blender/D-NeRF, COLMAP, DyNeRF, HyperNeRF,
             PanopticSports, MultipleView) + PLY I/O
  train/     config system, train state, densification, two-stage driver
  parallel/  mesh + shard_map multi-chip training
  render/    high-level render() API mirroring the reference's renderer
  viewer/    TCP bridge speaking the SIBR remote-viewer protocol
"""

__version__ = "0.1.0"

from fourdgs_tpu.utils.jax_setup import respect_platform_env as _rpe

# Honor FOURDGS_PLATFORM / JAX_PLATFORMS_OVERRIDE before any backend
# initializes (a sitecustomize-preregistered TPU plugin clobbers plain
# JAX_PLATFORMS, so CLI runs need an env knob that survives it).
_rpe()
del _rpe
