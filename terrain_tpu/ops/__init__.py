"""Op layer: NHWC conv/pool/norm/resize primitives with XLA reference paths
and Pallas fused kernels behind the same signatures (terrain_tpu.ops.pallas).
"""

from terrain_tpu.ops.activations import get_activation, leaky_relu
from terrain_tpu.ops.conv import (conv2d, conv2d_leaky,
                                  conv2d_transpose, dense)
from terrain_tpu.ops.fused import bilinear2x_conv3x3
from terrain_tpu.ops.norm import batch_norm, bn_init_params, bn_init_state
from terrain_tpu.ops.pool import avg_pool2d, max_pool2d
from terrain_tpu.ops.resize import upsample_bilinear_2x, upsample_nearest_2x

__all__ = [
    "conv2d",
    "conv2d_leaky",
    "conv2d_transpose",
    "bilinear2x_conv3x3",
    "dense",
    "batch_norm",
    "bn_init_params",
    "bn_init_state",
    "max_pool2d",
    "avg_pool2d",
    "upsample_nearest_2x",
    "upsample_bilinear_2x",
    "get_activation",
    "leaky_relu",
]
