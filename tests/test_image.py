"""Image layer tests (reference: lib/test/ImageTest.cpp semantics)."""

import io

import numpy as np
import pytest

from cuttlefish_tpu import ColorSpace, Image
from cuttlefish_tpu.color import linear_to_srgb, srgb_to_linear, to_grayscale
from cuttlefish_tpu.image import Channel, ImageFormat, NormalOptions, ResizeFilter, RotateAngle


def gradient_image(w=8, h=8, fmt=ImageFormat.RGBA8, color_space=ColorSpace.Linear):
    x = np.linspace(0, 255, w)
    y = np.linspace(0, 255, h)
    r = np.tile(x, (h, 1))
    g = np.tile(y[:, None], (1, w))
    b = (r + g) / 2
    a = np.full((h, w), 200.0)
    arr = np.stack([r, g, b, a], -1).astype(np.uint8)
    if fmt is ImageFormat.RGBA8:
        return Image.from_array(arr, fmt, color_space)
    img = Image.from_array(arr, ImageFormat.RGBA8, color_space)
    return img.convert(fmt)


def test_initialize_and_pixels():
    img = Image()
    assert not img.valid
    assert img.initialize(ImageFormat.RGBA8, 4, 3)
    assert img.width == 4 and img.height == 3
    assert img.set_pixel(1, 2, (0.5, 0.25, 1.0, 1.0))
    r, g, b, a = img.get_pixel(1, 2)
    assert r == pytest.approx(128 / 255)
    assert g == pytest.approx(64 / 255)
    assert b == 1.0 and a == 1.0


def test_convert_preserves_hdr():
    arr = np.array([[[2.5, -0.5, 1000.0]]], np.float32)
    img = Image.from_array(arr, ImageFormat.RGBF)
    out = img.convert(ImageFormat.RGBAF)
    np.testing.assert_array_equal(out.array[0, 0], [2.5, -0.5, 1000.0, 1.0])


def test_convert_clamps_unorm():
    arr = np.array([[[2.5, -0.5, 0.5]]], np.float32)
    img = Image.from_array(arr, ImageFormat.RGBF)
    out = img.convert(ImageFormat.RGB8)
    np.testing.assert_array_equal(out.array[0, 0], [255, 0, 128])


def test_grayscale_conversion_linear():
    img = gradient_image(fmt=ImageFormat.RGB8)
    gray = img.convert(ImageFormat.Gray8)
    rgba = img.rgbad()
    expected = np.floor(
        np.clip(to_grayscale(rgba[..., 0], rgba[..., 1], rgba[..., 2]), 0, 1) * 255
        + 0.5
    )
    np.testing.assert_array_equal(gray.array, expected.astype(np.uint8))


def test_grayscale_conversion_srgb_in_linear_space():
    img = gradient_image(fmt=ImageFormat.RGB8, color_space=ColorSpace.sRGB)
    gray = img.convert(ImageFormat.Gray8)
    rgba = img.rgbad()
    lin = srgb_to_linear(rgba[..., :3])
    g = linear_to_srgb(to_grayscale(lin[..., 0], lin[..., 1], lin[..., 2]))
    expected = np.floor(np.clip(g, 0, 1) * 255 + 0.5).astype(np.uint8)
    np.testing.assert_array_equal(gray.array, expected)


def test_uint16_is_integer_not_grayscale():
    # The "UInt16 special case" (ImageTest.cpp:466-474): values pass raw.
    arr = np.array([[1234, 65535]], np.uint16)
    img = Image.from_array(arr, ImageFormat.UInt16)
    rgba = img.rgbad()
    assert rgba[0, 0, 0] == 1234.0
    out = img.convert(ImageFormat.Float)
    np.testing.assert_array_equal(out.array, arr.astype(np.float32))


def test_complex_never_grayscales():
    arr = np.zeros((1, 2, 2), np.float64)
    arr[0, 0] = [3.0, 4.0]
    img = Image.from_array(arr, ImageFormat.Complex)
    out = img.convert(ImageFormat.Double)
    # Takes the real channel, not a grayscale mix.
    assert out.array[0, 0] == 3.0


def test_rotate():
    arr = np.arange(6, dtype=np.uint8).reshape(2, 3)
    img = Image.from_array(arr, ImageFormat.Gray8)
    cw = img.rotate(RotateAngle.CW90)
    assert (cw.width, cw.height) == (2, 3)
    # CW90: first row becomes last column.
    np.testing.assert_array_equal(cw.array, np.rot90(arr, k=-1))
    ccw = img.rotate(RotateAngle.CCW90)
    np.testing.assert_array_equal(ccw.array, np.rot90(arr, k=1))
    r180 = img.rotate(RotateAngle.CW180)
    np.testing.assert_array_equal(r180.array, arr[::-1, ::-1])


def test_flips():
    arr = np.arange(6, dtype=np.uint8).reshape(2, 3)
    img = Image.from_array(arr, ImageFormat.Gray8)
    assert img.flip_horizontal()
    np.testing.assert_array_equal(img.array, arr[:, ::-1])
    assert img.flip_vertical()
    np.testing.assert_array_equal(img.array, arr[::-1, ::-1])


def test_swizzle():
    arr = np.zeros((1, 1, 4), np.uint8)
    arr[0, 0] = [10, 20, 30, 40]
    img = Image.from_array(arr, ImageFormat.RGBA8)
    assert img.swizzle(Channel.Blue, Channel.Green, Channel.Red, Channel.Null)
    np.testing.assert_array_equal(img.array[0, 0], [30, 20, 10, 255])


def test_premultiply_linear():
    arr = np.zeros((1, 1, 4), np.uint8)
    arr[0, 0] = [200, 100, 50, 128]
    img = Image.from_array(arr, ImageFormat.RGBA8)
    assert img.pre_multiply_alpha()
    expected = np.floor(np.array([200, 100, 50]) / 255 * (128 / 255) * 255 + 0.5)
    np.testing.assert_array_equal(img.array[0, 0, :3], expected.astype(np.uint8))
    assert img.array[0, 0, 3] == 128


def test_premultiply_srgb_in_linear_space():
    arr = np.zeros((1, 1, 4), np.uint8)
    arr[0, 0] = [200, 100, 50, 128]
    img = Image.from_array(arr, ImageFormat.RGBA8, ColorSpace.sRGB)
    assert img.pre_multiply_alpha()
    lin = srgb_to_linear(np.array([200, 100, 50]) / 255) * (128 / 255)
    expected = np.floor(np.clip(linear_to_srgb(lin), 0, 1) * 255 + 0.5)
    np.testing.assert_array_equal(img.array[0, 0, :3], expected.astype(np.uint8))


def test_change_color_space_roundtrip():
    img = gradient_image(fmt=ImageFormat.RGBAF, color_space=ColorSpace.sRGB)
    orig = img.array.copy()
    assert img.change_color_space(ColorSpace.Linear)
    assert img.change_color_space(ColorSpace.sRGB)
    np.testing.assert_allclose(img.array, orig, atol=1e-6)


def test_resize_box_downscale():
    arr = np.zeros((4, 4), np.float32)
    arr[:2, :2] = 1.0
    img = Image.from_array(arr, ImageFormat.Float)
    out = img.resize(2, 2, ResizeFilter.Box)
    np.testing.assert_allclose(out.array, [[1.0, 0.0], [0.0, 0.0]], atol=1e-6)


def test_resize_linear_preserves_constant():
    arr = np.full((8, 8, 4), 0.5, np.float32)
    img = Image.from_array(arr, ImageFormat.RGBAF)
    for filt in ResizeFilter:
        out = img.resize(3, 5, filt)
        np.testing.assert_allclose(out.array, 0.5, atol=1e-6), filt


def test_resize_srgb_in_linear_space():
    arr = np.zeros((2, 2, 4), np.float32)
    arr[..., 3] = 1.0
    arr[0, :, :3] = 1.0  # top row white, bottom black, in sRGB
    img = Image.from_array(arr, ImageFormat.RGBAF, ColorSpace.sRGB)
    out = img.resize(1, 1, ResizeFilter.Box)
    # Average in linear space then back to sRGB.
    expected = linear_to_srgb(0.5 * srgb_to_linear(1.0))
    assert out.array[0, 0, 0] == pytest.approx(expected, abs=1e-5)


def test_normal_map_flat():
    arr = np.full((4, 4), 0.5, np.float32)
    img = Image.from_array(arr, ImageFormat.Float)
    nm = img.create_normal_map(NormalOptions.Default, 1.0, ImageFormat.RGBF)
    np.testing.assert_allclose(nm.array[..., 0], 0.5, atol=1e-6)
    np.testing.assert_allclose(nm.array[..., 1], 0.5, atol=1e-6)
    np.testing.assert_allclose(nm.array[..., 2], 1.0, atol=1e-6)


def test_normal_map_slope():
    # Height increases left to right: dx = (left - right) < 0 -> r < 0.5.
    w = 8
    arr = np.tile(np.linspace(0, 1, w, dtype=np.float32), (4, 1))
    img = Image.from_array(arr, ImageFormat.Float)
    nm = img.create_normal_map(NormalOptions.Default, 1.0, ImageFormat.RGBF)
    assert np.all(nm.array[:, 1:-1, 0] < 0.5)
    keep = img.create_normal_map(NormalOptions.KeepSign, 1.0, ImageFormat.RGBF)
    assert np.all(keep.array[:, 1:-1, 0] < 0.0)
    # Wrap makes edges see the big jump.
    wrap = img.create_normal_map(NormalOptions.WrapX, 1.0, ImageFormat.RGBF)
    assert wrap.array[0, 0, 0] > 0.5  # wraps to the high end -> positive dx


def test_save_load_roundtrip_png(tmp_path):
    img = gradient_image()
    from cuttlefish_tpu.image import codecs

    path = str(tmp_path / "test.png")
    assert codecs.save(img.array, img.format, path)
    loaded = Image(path)
    assert loaded.valid
    assert loaded.format is ImageFormat.RGBA8
    np.testing.assert_array_equal(loaded.array, img.array)


def test_load_from_bytes():
    import PIL.Image as pil

    buf = io.BytesIO()
    pil.fromarray(np.zeros((4, 4, 3), np.uint8)).save(buf, "PNG")
    img = Image(buf.getvalue())
    assert img.valid and img.format is ImageFormat.RGB8


def test_hdr_roundtrip(tmp_path):
    from cuttlefish_tpu.image import codecs

    rng = np.random.default_rng(3)
    rgb = (rng.uniform(0, 10, (8, 8, 3)) ** 2).astype(np.float32)
    data = codecs.encode_hdr(rgb)
    back = codecs.decode_hdr(data)
    # RGBE shares one exponent across channels: error is bounded relative to
    # the per-pixel max channel (one mantissa step), not per-channel.
    maxc = rgb.max(axis=-1, keepdims=True)
    assert np.all(np.abs(back - rgb) <= maxc / 128 + 1e-6)


def test_pfm_roundtrip():
    from cuttlefish_tpu.image import codecs

    rgb = np.arange(48, dtype=np.float32).reshape(4, 4, 3)
    data = codecs.encode_pfm(rgb)
    arr, fmt = codecs.decode_pfm(data)
    assert fmt is ImageFormat.RGBF
    np.testing.assert_array_equal(arr, rgb)


def test_image_save_roundtrip(tmp_path):
    """Image.save (ref Image.cpp:924-958) round-trips PNG and EXR."""
    rng = np.random.default_rng(0)
    a8 = (rng.random((12, 17, 4)) * 255).astype(np.uint8)
    img = Image.from_array(a8, ImageFormat.RGBA8)
    assert img.save(tmp_path / "t.png")
    back = Image(str(tmp_path / "t.png"))
    assert np.array_equal(back.array, a8)

    hdrv = (rng.random((9, 13, 3)) * 50).astype(np.float32)
    imgf = Image.from_array(hdrv, ImageFormat.RGBF)
    assert imgf.save(tmp_path / "t.exr")
    backf = Image(str(tmp_path / "t.exr"))
    assert backf.format is ImageFormat.RGBF
    # HALF storage: relative error bounded by float16 precision.
    assert np.abs(backf.array - hdrv).max() <= np.abs(hdrv).max() * 1e-3

    assert not Image().save(tmp_path / "invalid.png")


def test_exr_roundtrip_and_zip(tmp_path):
    """EXR: NONE-written files decode exactly; a ZIPS variant built with
    the spec reorder+predictor+deflate decodes to the same pixels."""
    import struct

    from cuttlefish_tpu.image import exr

    rng = np.random.default_rng(1)
    # Quantized gradient: compressible, so the ZIPS variant below really
    # exercises the inflate + predictor + interleave path.
    y, x = np.mgrid[0:21, 0:10].astype(np.float32)
    arr = np.stack([y / 4, x / 2, (x + y) % 3, np.round(y) * 0.5], -1)
    arr = (arr + rng.integers(0, 2, arr.shape)).astype(np.float32)
    none = exr.encode_exr(arr, half=False)
    dec, kind = exr.decode_exr(none)
    assert kind == "rgba"
    assert np.array_equal(dec, arr)

    g = (rng.random((5, 7)) * 4).astype(np.float32)
    decg, kindg = exr.decode_exr(exr.encode_exr(g, half=True))
    assert kindg == "gray"
    assert np.abs(decg - g).max() < 0.01

    # Build the equivalent ZIPS file: flip the compression byte and
    # recompress every scanline chunk with the spec preprocessing.
    key = b"compression\x00compression\x00"
    cpos = none.index(key) + len(key) + 4
    height, width = arr.shape[:2]
    row = width * 4 * 4
    head_end = none.index(struct.pack("<ii", 0, row))
    table_pos = head_end - 8 * height
    header = bytearray(none[:table_pos])
    header[cpos] = 2  # ZIPS
    chunks, offsets = [], []
    off = table_pos + 8 * height
    src = table_pos + 8 * height
    for y in range(height):
        yv, sz = struct.unpack_from("<ii", none, src)
        raw = none[src + 8 : src + 8 + sz]
        src += 8 + sz
        comp = exr._zip_block(raw)
        offsets.append(off)
        chunk = struct.pack("<ii", yv, len(comp)) + comp
        chunks.append(chunk)
        off += len(chunk)
    zfile = bytes(header) + struct.pack(f"<{height}Q", *offsets) + b"".join(chunks)
    dec2, _ = exr.decode_exr(zfile)
    assert np.array_equal(dec2, arr)
    assert len(zfile) < len(none)


class TestLayoutIntrospection:
    """Pixel-layout accessors (Image.h:282-352; FreeImage little-endian
    mask values; the reference's blueMask is assigned the green mask by an
    upstream slip at Image.cpp:746 — intended per-channel values here)."""

    def test_rgba8_masks(self):
        img = Image()
        img.initialize(ImageFormat.RGBA8, 4, 4)
        assert img.bits_per_pixel == 32
        assert (img.red_mask, img.red_shift) == (0x00FF0000, 16)
        assert (img.green_mask, img.green_shift) == (0x0000FF00, 8)
        assert (img.blue_mask, img.blue_shift) == (0x000000FF, 0)
        assert (img.alpha_mask, img.alpha_shift) == (0xFF000000, 24)

    def test_rgb565_masks(self):
        img = Image()
        img.initialize(ImageFormat.RGB565, 4, 4)
        assert img.bits_per_pixel == 16
        assert (img.red_mask, img.red_shift) == (0xF800, 11)
        assert (img.green_mask, img.green_shift) == (0x07E0, 5)
        assert (img.blue_mask, img.blue_shift) == (0x001F, 0)
        assert img.alpha_mask == 0

    def test_float_formats_no_masks(self):
        img = Image()
        img.initialize(ImageFormat.RGBAF, 4, 4)
        assert img.bits_per_pixel == 128
        assert img.red_mask == 0 and img.alpha_mask == 0

    def test_scanline(self):
        img = Image()
        img.initialize(ImageFormat.RGBA8, 3, 2)
        img.set_pixel(1, 1, (1.0, 0.0, 0.0, 1.0))
        row = img.scanline(1)
        assert row.shape[0] == 3
        assert row[1][0] == 255  # red channel of the set pixel
        import pytest as _pytest

        with _pytest.raises(ValueError):
            img.scanline(2)
