from jspsr_tpu.nn.module import Module, Sequential, merge_state, param_count
from jspsr_tpu.nn.layers import (
    BatchNorm2d,
    Conv2d,
    ConvTranspose2d,
    Dense,
    LayerNorm,
    LeakyReLU,
    ReLU,
    Sigmoid,
    bicubic_resize,
    bilinear_resize,
    global_avg_pool,
    global_max_pool,
    pixel_shuffle,
)
from jspsr_tpu.nn import initializers

__all__ = [
    "Module",
    "Sequential",
    "merge_state",
    "param_count",
    "Conv2d",
    "ConvTranspose2d",
    "BatchNorm2d",
    "ReLU",
    "Dense",
    "LayerNorm",
    "LeakyReLU",
    "Sigmoid",
    "global_avg_pool",
    "global_max_pool",
    "pixel_shuffle",
    "bilinear_resize",
    "bicubic_resize",
    "initializers",
]
