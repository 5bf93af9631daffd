"""PVRTC1/2 converters.

Parity target: the reference PvrtcConverter (`/root/reference/lib/src/
PvrtcConverter.cpp`) which delegates to the closed-source PVRTexLib and
treats the surface as a single whole-image job (PVRTC modulation reads
neighboring color words, so blocks are not independent).  PVRTC1 RGB/RGBA
2bpp and 4bpp encode here with wraparound interpolation; PVRTC2 RGBA
2/4bpp encodes the clamped-border interpolated subset (see
kernels/pvrtc.py encode_pvrtc2 for layout provenance).

Surfaces must be power-of-two and at least the format's minimum size
(16x8 for 2bpp, 8x8 for 4bpp), matching PVRTC1 hardware constraints.
"""

from __future__ import annotations

import numpy as np

from cuttlefish_tpu.convert import Converter, EncodeParams
from cuttlefish_tpu.formats import TextureFormat, TextureType

_F = TextureFormat


class Pvrtc1Converter(Converter):
    version = 1

    def __init__(self, bpp2: bool):
        self._bpp2 = bpp2

    def encode(self, surface: np.ndarray, params: EncodeParams) -> np.ndarray:
        import jax

        from cuttlefish_tpu.kernels.pvrtc import encode_pvrtc1, morton_order

        surface = np.asarray(surface, np.float32)
        h, w = surface.shape[:2]
        bw, bh = (8, 4) if self._bpp2 else (4, 4)
        min_w, min_h = (16, 8) if self._bpp2 else (8, 8)
        # Small mip levels of a power-of-two chain are edge-padded up to the
        # format's minimum surface (PVRTC stores at least 2x2 color words).
        if w < min_w or h < min_h:
            pw, ph = max(w, min_w), max(h, min_h)
            surface = np.pad(
                surface, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge"
            )
            h, w = ph, pw
        if w % bw or h % bh or (w & (w - 1)) or (h & (h - 1)):
            raise ValueError(
                f"PVRTC1 requires power-of-two surfaces, multiple of {bw}x{bh}"
            )
        from cuttlefish_tpu.kernels.pvrtc import encode_pvrtc2

        encode = encode_pvrtc1 if self.version == 1 else encode_pvrtc2
        words = np.asarray(
            encode(
                jax.device_put(surface), bpp2=self._bpp2, quality=int(params.quality)
            )
        )
        perm = morton_order(w // bw, h // bh)
        words = words[perm]
        return (
            np.ascontiguousarray(words.astype("<u4")).view(np.uint8).reshape(-1)
        )


class Pvrtc2Converter(Pvrtc1Converter):
    """PVRTC2 2/4bpp (`PvrtcConverter.cpp:90-93`): clamped-border variant."""

    version = 2


def create_pvrtc_converter(fmt: TextureFormat, type_: TextureType) -> Converter | None:
    if fmt in (_F.PVRTC1_RGB_2BPP, _F.PVRTC1_RGBA_2BPP):
        return Pvrtc1Converter(bpp2=True)
    if fmt in (_F.PVRTC1_RGB_4BPP, _F.PVRTC1_RGBA_4BPP):
        return Pvrtc1Converter(bpp2=False)
    if fmt == _F.PVRTC2_RGBA_2BPP:
        return Pvrtc2Converter(bpp2=True)
    if fmt == _F.PVRTC2_RGBA_4BPP:
        return Pvrtc2Converter(bpp2=False)
    return None
