"""ASTC converters.

Parity target: the reference AstcConverter (`/root/reference/lib/src/
AstcConverter.cpp`), all 14 2D block sizes.  LDR (UNorm) profile is
implemented; the HDR profiles (UFloat, HDR_RGB_LDR_A at `:151-163`) need
the HDR endpoint modes and are a planned extension — converting with
type UFloat raises until then.
"""

from __future__ import annotations

from cuttlefish_tpu.convert import Converter, EncodeParams
from cuttlefish_tpu.convert.device import BlockConverter
from cuttlefish_tpu.formats import (
    TextureFormat,
    TextureType,
    block_height,
    block_width,
)

_T = TextureType


class AstcConverter(BlockConverter):
    def __init__(self, fmt: TextureFormat):
        self.block_w = block_width(fmt)
        self.block_h = block_height(fmt)

    def encode_blocks(self, blocks, params: EncodeParams):
        from cuttlefish_tpu.kernels import astc

        return astc.encode_astc(
            blocks,
            block_w=self.block_w,
            block_h=self.block_h,
            quality=int(params.quality),
        )


def create_astc_converter(fmt: TextureFormat, type_: TextureType) -> Converter | None:
    if not fmt.name.startswith("ASTC_"):
        return None
    if type_ is _T.UFloat:
        raise NotImplementedError(
            "ASTC HDR profile not implemented yet (LDR/UNorm is)"
        )
    return AstcConverter(fmt)
