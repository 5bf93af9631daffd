"""S3TC (BC1-BC7) converters.

Feature parity with the reference S3tcConverter family
(`/root/reference/lib/src/S3tcConverter.cpp:257-646`): BC1 with optional
3-color+black, BC1A punch-through alpha, BC2 explicit alpha, BC3/BC4/BC5
(signed + unsigned), BC6H (UFloat/Float), BC7.  Encoding runs as batched JAX
kernels (cuttlefish_tpu.kernels.bc / .bc6h / .bc7) instead of the reference's
rgbcx/squish/Compressonator/bc7e thread-pool jobs.

Channel weighting: sRGB sources use Rec.709-ish perceptual weights, matching
the reference's perceptual flags for sRGB (`S3tcConverter.cpp:313-321,633`).
The color mask zeroes ignored channels' error weight (`:283-311`).
"""

from __future__ import annotations

import numpy as np

from cuttlefish_tpu.convert import Converter, EncodeParams
from cuttlefish_tpu.convert.device import BlockConverter
from cuttlefish_tpu.formats import ColorSpace, TextureFormat, TextureType

_F = TextureFormat
_T = TextureType


def _channel_weights(params: EncodeParams) -> np.ndarray:
    if params.color_space is ColorSpace.sRGB:
        w = np.array([0.3, 0.59, 0.11], np.float32) * 3.0
    else:
        w = np.ones(3, np.float32)
    mask = np.array(
        [params.color_mask.r, params.color_mask.g, params.color_mask.b], np.float32
    )
    w = w * mask
    if w.sum() == 0:
        w = np.ones(3, np.float32)
    # Host array, NOT jnp: the kernels hash these as static Pallas params,
    # and np.asarray on a committed device array is a full tunnel round-trip
    # (~50-100 ms) per convert.
    return w


class Bc1Converter(BlockConverter):
    def __init__(self, punch_through: bool):
        self._punch = punch_through

    def encode_blocks(self, blocks, params):
        from cuttlefish_tpu.kernels import bc

        return bc.encode_bc1(
            blocks,
            quality=int(params.quality),
            punch_through=self._punch,
            allow_black=not self._punch,
            ch_weights=_channel_weights(params),
        )


class Bc2Converter(BlockConverter):
    def encode_blocks(self, blocks, params):
        from cuttlefish_tpu.kernels import bc

        return bc.encode_bc2(
            blocks, quality=int(params.quality), ch_weights=_channel_weights(params)
        )


class Bc3Converter(BlockConverter):
    def encode_blocks(self, blocks, params):
        from cuttlefish_tpu.kernels import bc

        return bc.encode_bc3(
            blocks, quality=int(params.quality), ch_weights=_channel_weights(params)
        )


class Bc4Converter(BlockConverter):
    def __init__(self, signed: bool):
        self._signed = signed
        if signed:
            self.transfer_dtype = "f16"

    def encode_blocks(self, blocks, params):
        from cuttlefish_tpu.kernels import bc

        return bc.encode_bc4(
            blocks[..., 0], quality=int(params.quality), signed=self._signed
        )


class Bc5Converter(BlockConverter):
    def __init__(self, signed: bool):
        self._signed = signed
        if signed:
            self.transfer_dtype = "f16"

    def encode_blocks(self, blocks, params):
        from cuttlefish_tpu.kernels import bc

        return bc.encode_bc5(
            blocks, quality=int(params.quality), signed=self._signed
        )


class Bc6hConverter(BlockConverter):
    transfer_dtype = "f16"  # half-float HDR domain (lossless wire format)

    def __init__(self, signed: bool):
        self._signed = signed

    def encode_blocks(self, blocks, params):
        from cuttlefish_tpu.kernels import bc6h

        return bc6h.encode_bc6h(
            blocks[..., :3], quality=int(params.quality),
            signed=self._signed, metric=params.hdr_metric,
        )


class Bc7Converter(BlockConverter):
    def encode_blocks(self, blocks, params):
        from cuttlefish_tpu.kernels import bc7

        return bc7.encode_bc7(
            blocks,
            quality=int(params.quality),
            perceptual=params.color_space is ColorSpace.sRGB,
        )


def create_s3tc_converter(fmt: TextureFormat, type_: TextureType) -> Converter | None:
    """Factory rows for BC formats (Converter.cpp:173-254)."""
    if fmt is _F.BC1_RGB:
        return Bc1Converter(punch_through=False)
    if fmt is _F.BC1_RGBA:
        return Bc1Converter(punch_through=True)
    if fmt is _F.BC2:
        return Bc2Converter()
    if fmt is _F.BC3:
        return Bc3Converter()
    if fmt is _F.BC4:
        return Bc4Converter(signed=type_ is _T.SNorm)
    if fmt is _F.BC5:
        return Bc5Converter(signed=type_ is _T.SNorm)
    if fmt is _F.BC6H:
        return Bc6hConverter(signed=type_ is _T.Float)
    if fmt is _F.BC7:
        return Bc7Converter()
    return None
