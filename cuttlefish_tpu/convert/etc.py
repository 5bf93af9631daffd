"""ETC1/ETC2/EAC converters.

Parity with the reference EtcConverter (`/root/reference/lib/src/
EtcConverter.cpp:56-151`): ETC1, ETC2_R8G8B8(A1/A8), EAC_R11(G11) signed +
unsigned.  The reference rescales signed EAC inputs [-1,1] -> [0,1] to feed
etc2comp (`:133-143`); our kernels encode the signed domain natively.
Error metric: sRGB sources weight RGB by Rec.709 (the REC709 metric at
`:68-99`), linear sources use the numeric metric.
"""

from __future__ import annotations

import numpy as np

from cuttlefish_tpu.convert import Converter, EncodeParams
from cuttlefish_tpu.convert.device import BlockConverter
from cuttlefish_tpu.formats import ColorSpace, TextureFormat, TextureType

_F = TextureFormat
_T = TextureType


def _rgb_weights(params: EncodeParams) -> np.ndarray:
    if params.color_space is ColorSpace.sRGB:
        w = np.array([0.2126, 0.7152, 0.0722], np.float32) * 3.0
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


class EtcRgbConverter(BlockConverter):
    def __init__(self, etc2: bool):
        self._etc2 = etc2

    def encode_blocks(self, blocks, params):
        from cuttlefish_tpu.kernels import etc

        return etc.encode_etc_rgb(
            blocks,
            quality=int(params.quality),
            etc2=self._etc2,
            ch_weights=_rgb_weights(params),
        )


class Etc2RgbaConverter(BlockConverter):
    def encode_blocks(self, blocks, params):
        from cuttlefish_tpu.kernels import etc

        return etc.encode_etc2_rgba(
            blocks, quality=int(params.quality), ch_weights=_rgb_weights(params)
        )


class Etc2PunchThroughConverter(BlockConverter):
    """ETC2_R8G8B8A1: punch-through alpha.

    Until the dedicated punch-through mode lands, blocks encode opaque
    (alpha thresholding is still honored at decode by the A1 flag default).
    """

    def encode_blocks(self, blocks, params):
        from cuttlefish_tpu.kernels import etc

        return etc.encode_etc2_a1(
            blocks, quality=int(params.quality), ch_weights=_rgb_weights(params)
        )


class EacR11Converter(BlockConverter):
    transfer_dtype = "f16"  # 11-bit target domain; u8 wire would quantize

    def __init__(self, signed: bool, channels: int):
        self._signed = signed
        self._channels = channels

    def encode_blocks(self, blocks, params):
        from cuttlefish_tpu.kernels import etc

        if self._channels == 1:
            return etc.encode_eac_r11(
                blocks[..., 0], quality=int(params.quality), signed=self._signed
            )
        return etc.encode_eac_rg11(
            blocks, quality=int(params.quality), signed=self._signed
        )


def create_etc_converter(fmt: TextureFormat, type_: TextureType) -> Converter | None:
    """Factory rows for ETC/EAC formats (Converter.cpp:257-306)."""
    if fmt is _F.ETC1:
        return EtcRgbConverter(etc2=False)
    if fmt is _F.ETC2_R8G8B8:
        return EtcRgbConverter(etc2=True)
    if fmt is _F.ETC2_R8G8B8A1:
        return Etc2PunchThroughConverter()
    if fmt is _F.ETC2_R8G8B8A8:
        return Etc2RgbaConverter()
    if fmt is _F.EAC_R11:
        return EacR11Converter(signed=type_ is _T.SNorm, channels=1)
    if fmt is _F.EAC_R11G11:
        return EacR11Converter(signed=type_ is _T.SNorm, channels=2)
    return None
