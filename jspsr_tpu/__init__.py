"""JSPSR-TPU: a TPU-native (JAX/XLA/Pallas) guided DEM super-resolution framework.

A from-scratch rebuild of the capabilities of the JSPSR reference
(joint spatial propagation super-resolution for bare-earth DEM enhancement)
designed TPU-first:

- NHWC tensors everywhere, ``lax.conv_general_dilated`` on the MXU.
- A small functional module system (``jspsr_tpu.nn``): parameters and
  BatchNorm running statistics are explicit pytrees; every forward is a pure
  function, jittable and shardable.
- The spatial-propagation refinement primitive (modulated deformable
  convolution, the reference's only native-CUDA dependency) is provided both
  as a pure-XLA formulation (CPU-runnable reference) and as a fused Pallas
  TPU kernel (``jspsr_tpu.ops``).
- Scaling via ``jax.sharding.Mesh`` + NamedSharding (``jspsr_tpu.parallel``):
  batch data-parallel training with XLA-compiled gradient all-reduce over
  ICI, and tile-parallel full-scene inference.
"""

__version__ = "0.1.0"
