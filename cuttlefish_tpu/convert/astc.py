"""ASTC converters.

Parity target: the reference AstcConverter (`/root/reference/lib/src/
AstcConverter.cpp`), all 14 2D block sizes.  UNorm maps to the LDR
profile; UFloat maps to the HDR profiles (HDR / HDR_RGB_LDR_A at
`:151-163`) via CEM 11 (direct submode) + CEM 14.
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
    def __init__(self, fmt: TextureFormat, hdr: bool = False):
        self.block_w = block_width(fmt)
        self.block_h = block_height(fmt)
        self.hdr = hdr
        if hdr:
            self.transfer_dtype = "f16"  # HDR profile: half-float domain

    def refine_params(self, host_blocks, params: EncodeParams) -> EncodeParams:
        """Gate the luminance CEM 0/4 fits on actual near-gray content
        (the whole-dispatch analog of astcenc's per-block luminance
        endpoint-format trial): no near-gray block in the batch means
        those fits can never win, so the kernel variant without them is
        compiled/selected instead."""
        import dataclasses

        from cuttlefish_tpu.kernels import astc

        if self.hdr:
            return params  # HDR profiles use CEM 11/14 only
        return dataclasses.replace(
            params,
            content_gray=astc.has_gray_blocks(host_blocks),
            content_alpha=astc.has_alpha_blocks(host_blocks),
        )

    def encode_blocks(self, blocks, params: EncodeParams):
        from cuttlefish_tpu.kernels import astc

        if self.hdr:
            # Reference behavior (`AstcConverter.cpp:151-163`): UFloat with
            # alpha uses HDR_RGB_LDR_A (alpha stays LDR), without alpha the
            # pure HDR profile — either way alpha is encoded LDR here.
            return astc.encode_astc_hdr(
                blocks,
                block_w=self.block_w,
                block_h=self.block_h,
                quality=int(params.quality),
            )
        return astc.encode_astc(
            blocks,
            block_w=self.block_w,
            block_h=self.block_h,
            quality=int(params.quality),
            gray=params.content_gray,
            alpha=params.content_alpha,
        )


def create_astc_converter(fmt: TextureFormat, type_: TextureType) -> Converter | None:
    if not fmt.name.startswith("ASTC_"):
        return None
    return AstcConverter(fmt, hdr=type_ is _T.UFloat)
