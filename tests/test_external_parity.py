"""External decode parity: PIL's independent DDS/BC decoders vs ours.

PIL ships its own BC1/BC3/BC7 decoders; decoding our emitted DDS files with
it validates our bitstreams (mode layouts, partition/anchor/weight tables)
against an implementation we didn't write.  BC1/BC3 interpolation may
legally differ by 1 LSB between decoders (the S3TC spec tolerates both
floor and round thirds); BC7 is exactly specified and must match exactly.
"""

import io

import numpy as np
import pytest

import cuttlefish_tpu as ct
from cuttlefish_tpu import metrics

PIL = pytest.importorskip("PIL.Image")


def _smooth(size, seed):
    rng = np.random.default_rng(seed)
    arr = rng.random((size, size, 4)).astype(np.float32)
    for _ in range(3):
        arr = (
            arr + np.roll(arr, 1, 0) + np.roll(arr, -1, 0)
            + np.roll(arr, 1, 1) + np.roll(arr, -1, 1)
        ) / 5
    arr = arr.astype(np.float32)
    arr[..., 3] = 1.0
    return arr


def _encode_dds(arr, fmt, quality=ct.Quality.Low):
    tex = ct.Texture(ct.Dimension.Dim2D, arr.shape[1], arr.shape[0])
    tex.set_image(ct.Image.from_array(arr, ct.ImageFormat.RGBAF))
    assert tex.convert(fmt, ct.TextureType.UNorm, quality=quality)
    res, data = tex.save_to_bytes(ct.FileType.DDS)
    assert res is ct.SaveResult.Success
    return tex, data


@pytest.mark.parametrize(
    "fmt,tol",
    [
        (ct.TextureFormat.BC1_RGB, 1.0),
        (ct.TextureFormat.BC3, 1.0),
        (ct.TextureFormat.BC7, 0.0),
    ],
)
def test_pil_decodes_our_dds(fmt, tol):
    arr = _smooth(32, 1)
    tex, data = _encode_dds(arr, fmt)
    pil_dec = np.asarray(PIL.open(io.BytesIO(data)).convert("RGBA"))
    ours = metrics.decode_surface(tex.data(0), fmt, ct.TextureType.UNorm, 32, 32)
    diff = np.abs(ours[..., :3] * 255.0 - pil_dec[..., :3].astype(np.float64))
    assert diff.max() <= tol
    # And the decode must actually resemble the source.
    mse = np.mean((pil_dec[..., :3] / 255.0 - arr[..., :3]) ** 2)
    assert 10 * np.log10(1.0 / mse) > 28


def test_pil_decodes_bc7_all_quality_modes():
    # Higher quality levels exercise 2-subset (and alpha) modes; PIL's BC7
    # decoder must agree exactly on every block.
    arr = _smooth(24, 2)
    arr[..., 3] = np.clip(arr[..., 0] + 0.3, 0, 1)  # alpha variation
    tex, data = _encode_dds(arr, ct.TextureFormat.BC7, quality=ct.Quality.High)
    pil_dec = np.asarray(PIL.open(io.BytesIO(data)).convert("RGBA"))
    ours = metrics.decode_surface(
        tex.data(0), ct.TextureFormat.BC7, ct.TextureType.UNorm, 24, 24
    )
    assert np.array_equal(
        np.round(ours * 255.0).astype(np.uint8), pil_dec
    )


class TestBc7TablesVsPil:
    """Hand-crafted blocks exercise every partition row and anchor entry;
    PIL must decode them identically to our decoder."""

    @staticmethod
    def _dds(blocks, w, h):
        import struct

        tex, data = _encode_dds(_smooth(8, 0), ct.TextureFormat.BC7)
        hdr = bytearray(data[:148])
        struct.pack_into("<I", hdr, 12, h)
        struct.pack_into("<I", hdr, 16, w)
        return bytes(hdr) + blocks

    @staticmethod
    def _pil_blocks(data, w, h):
        img = np.asarray(PIL.open(io.BytesIO(data)).convert("RGBA"))
        return img.reshape(h // 4, 4, w // 4, 4, 4).transpose(
            0, 2, 1, 3, 4
        ).reshape(-1, 16, 4)

    def test_all_partitions_and_anchors(self):
        from cuttlefish_tpu.decode import bc7 as dec7
        from cuttlefish_tpu.kernels import bc7_tables as T

        rng = np.random.default_rng(0)

        def put_bits(fields):
            b = 0
            pos = 0
            for v, n in fields:
                b |= (int(v) & ((1 << n) - 1)) << pos
                pos += n
            assert pos <= 128
            return b.to_bytes(16, "little")

        blocks = []
        for p in range(64):  # mode 1: 2-subset rows + ANCHOR2
            e = rng.integers(0, 64, (4, 3))
            idx = rng.integers(0, 8, 16)
            idx[0] &= 3
            idx[int(T.ANCHOR2[p])] &= 3
            fields = [(0b10, 2), (p, 6)]
            fields += [(e[k][c], 6) for c in range(3) for k in range(4)]
            fields += [(1, 1), (1, 1)]
            anchors = {0, int(T.ANCHOR2[p])}
            fields += [
                (idx[i], 2 if i in anchors else 3) for i in range(16)
            ]
            blocks.append(put_bits(fields))
        for p in range(64):  # mode 2: 3-subset rows + ANCHOR3
            e = rng.integers(0, 32, (6, 3))
            idx = rng.integers(0, 4, 16)
            anchors = {0, int(T.ANCHOR3_2[p]), int(T.ANCHOR3_3[p])}
            for a in anchors:
                idx[a] &= 1
            fields = [(0b100, 3), (p, 6)]
            fields += [(e[k][c], 5) for c in range(3) for k in range(6)]
            fields += [
                (idx[i], 1 if i in anchors else 2) for i in range(16)
            ]
            blocks.append(put_bits(fields))

        data = self._dds(b"".join(blocks), 64, 32)
        pil_dec = self._pil_blocks(data, 64, 32)
        ours = dec7.decode_bc7(np.frombuffer(data[148:], np.uint8))
        assert np.array_equal(ours, pil_dec)
