"""Image layer: decode, pixel formats, and manipulation ops.

TPU-native analog of the reference image layer
(`/root/reference/lib/src/Image.cpp`, `lib/include/cuttlefish/Image.h`):
host-side codecs (PIL + custom HDR) replace FreeImage; pixel storage is
numpy in each format's natural layout; manipulation ops are vectorized and
match the reference's double-precision per-pixel semantics.
"""

from cuttlefish_tpu.image.format import Channel, ImageFormat
from cuttlefish_tpu.image.image import Image, NormalOptions, ResizeFilter, RotateAngle

__all__ = [
    "Channel",
    "Image",
    "ImageFormat",
    "NormalOptions",
    "ResizeFilter",
    "RotateAngle",
]
