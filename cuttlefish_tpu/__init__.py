"""cuttlefish_tpu — a TPU-native texture compression framework.

A from-scratch reimplementation of the capabilities of akb825/Cuttlefish
(reference: /root/reference) designed TPU-first: the image pipeline and
per-block GPU-format encoders (BC1-7, ETC1/2, EAC, ASTC, PVRTC, and all
uncompressed packed formats) run as batched JAX/XLA/Pallas programs over
HBM-resident block tiles, sharded data-parallel over a `jax.sharding.Mesh`.

Public API mirrors the reference's library surface
(`lib/include/cuttlefish/{Texture,Image,Color}.h`):

    from cuttlefish_tpu import Image, Texture, TextureFormat, TextureType
"""

from cuttlefish_tpu.formats import (
    Alpha,
    ColorMask,
    ColorSpace,
    CubeFace,
    Dimension,
    FileType,
    ImageIndex,
    MipReplacement,
    Quality,
    SaveResult,
    TextureFormat,
    TextureType,
    block_height,
    block_size,
    block_width,
    file_type_for_name,
    has_alpha,
    has_native_srgb,
    is_format_valid,
    max_mipmap_levels,
    min_height,
    min_width,
)
from cuttlefish_tpu.image import Image, ImageFormat, NormalOptions, ResizeFilter, RotateAngle
from cuttlefish_tpu.texture import CustomMipImage, Texture
from cuttlefish_tpu.containers.load import LoadError, load_texture

__version__ = "0.1.0"

__all__ = [
    "Alpha",
    "ColorMask",
    "LoadError",
    "load_texture",
    "ColorSpace",
    "CubeFace",
    "CustomMipImage",
    "Dimension",
    "FileType",
    "Image",
    "ImageFormat",
    "ImageIndex",
    "MipReplacement",
    "NormalOptions",
    "Quality",
    "ResizeFilter",
    "RotateAngle",
    "SaveResult",
    "Texture",
    "TextureFormat",
    "TextureType",
    "block_height",
    "block_size",
    "block_width",
    "file_type_for_name",
    "has_alpha",
    "has_native_srgb",
    "is_format_valid",
    "max_mipmap_levels",
    "min_height",
    "min_width",
]
