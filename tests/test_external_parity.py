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
