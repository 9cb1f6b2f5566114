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


def __getattr__(name):
    """Lazy top-level API: jspsr_tpu.Trainer / build_model / create_config."""
    if name == "Trainer":
        from jspsr_tpu.train.trainer import Trainer

        return Trainer
    if name == "build_model":
        from jspsr_tpu.models.factory import build_model

        return build_model
    if name == "create_config":
        from jspsr_tpu.config.loader import create_config

        return create_config
    if name == "import_torch_state_dict":
        from jspsr_tpu.utils.torch_import import import_torch_state_dict

        return import_torch_state_dict
    raise AttributeError(name)
