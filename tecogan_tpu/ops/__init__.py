from .resize import (
    apply_separable,
    get_upsampling_fn,
    resize_matrix,
    upsample_bilinear,
    upsample_tecogan_bicubic,
)
from .warp import backward_warp
from .warp_vjp import backward_warp_diff
from .spatial import space_to_depth, depth_to_space
from .degrade import bd_border_size, downsample_bd, imresize_matlab
from .color import float32_to_uint8, rgb_to_ycbcr, save_sequence

__all__ = [
    "apply_separable",
    "get_upsampling_fn",
    "resize_matrix",
    "upsample_bilinear",
    "upsample_tecogan_bicubic",
    "backward_warp",
    "backward_warp_diff",
    "space_to_depth",
    "depth_to_space",
    "bd_border_size",
    "downsample_bd",
    "imresize_matlab",
    "float32_to_uint8",
    "rgb_to_ycbcr",
    "save_sequence",
]
