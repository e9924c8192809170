from .upfirdn import (upfirdn2d, make_resample_kernel, upfirdn_upsample,
                      upfirdn_downsample, upfirdn_smooth)
from .fused_act import fused_leaky_relu
from .modulated_conv import modulated_conv2d
from .filter2d import filter2d, usm_sharp
from .pixel_ops import pixel_shuffle, pixel_unshuffle

__all__ = [
    "upfirdn2d", "make_resample_kernel", "upfirdn_upsample",
    "upfirdn_downsample", "upfirdn_smooth", "fused_leaky_relu",
    "modulated_conv2d", "filter2d", "usm_sharp", "pixel_shuffle",
    "pixel_unshuffle",
]
