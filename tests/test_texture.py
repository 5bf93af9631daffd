"""Texture assembly + container tests (reference: lib/test/TextureTest.cpp,
TextureSaveTest.cpp)."""

import numpy as np
import pytest

from cuttlefish_tpu import (
    ColorSpace,
    CubeFace,
    CustomMipImage,
    Dimension,
    FileType,
    Image,
    ImageIndex,
    MipReplacement,
    SaveResult,
    Texture,
    TextureFormat,
    TextureType,
)
from cuttlefish_tpu.image import ImageFormat, ResizeFilter

F, T = TextureFormat, TextureType


def solid(w, h, rgba=(0.5, 0.25, 0.75, 1.0)):
    arr = np.tile(np.asarray(rgba, np.float32), (h, w, 1))
    return Image.from_array(arr, ImageFormat.RGBAF)


def test_initialize_validation():
    t = Texture()
    assert not t.is_valid
    assert not t.initialize(Dimension.Dim2D, 0, 4)
    assert not t.initialize(Dimension.Dim3D, 4, 4, 0)
    assert t.initialize(Dimension.Dim2D, 4, 4)
    assert t.faces == 1
    assert Texture(Dimension.Cube, 8, 8).faces == 6


def test_set_image_validation():
    t = Texture(Dimension.Dim2D, 8, 8)
    assert not t.set_image(solid(4, 4))  # wrong size
    assert t.set_image(solid(8, 8))
    assert not t.set_image(solid(8, 8), face=CubeFace.NegY)  # not a cube
    cube = Texture(Dimension.Cube, 8, 8)
    assert not cube.set_image(solid(8, 8))  # needs a face
    for f in CubeFace:
        assert cube.set_image(solid(8, 8), face=f)
    assert cube.images_complete()


def test_mip_levels_clamped():
    t = Texture(Dimension.Dim2D, 16, 8, mip_levels=99)
    assert t.mip_levels == 5
    assert t.width(4) == 1 and t.height(3) == 1
    assert t.height(2) == 2


def test_generate_mipmaps_sizes():
    t = Texture(Dimension.Dim2D, 16, 16)
    assert t.set_image(solid(16, 16))
    assert t.generate_mipmaps()
    assert t.mip_levels == 5
    for m in range(5):
        img = t.get_image(mip_level=m)
        assert img.width == max(16 >> m, 1)
    # Solid color stays solid through the chain.
    np.testing.assert_allclose(
        t.get_image(mip_level=4).array[0, 0], [0.5, 0.25, 0.75, 1.0], atol=1e-5
    )


def test_custom_mips_once_vs_continue():
    red = np.tile(np.array([1, 0, 0, 1], np.float32), (4, 4, 1))
    custom = Image.from_array(red, ImageFormat.RGBAF)

    # Once: mip 2 is replaced, mip 3+ resumes from the generated chain.
    t = Texture(Dimension.Dim2D, 16, 16)
    t.set_image(solid(16, 16))
    assert t.generate_mipmaps(
        custom_mip_images={
            ImageIndex(CubeFace.PosX, 2, 0): CustomMipImage(custom, MipReplacement.Once)
        }
    )
    np.testing.assert_allclose(
        t.get_image(mip_level=2).array[0, 0], [1, 0, 0, 1], atol=1e-5
    )
    np.testing.assert_allclose(
        t.get_image(mip_level=3).array[0, 0], [0.5, 0.25, 0.75, 1.0], atol=1e-5
    )

    # Continue: mip 3+ comes from the custom image.
    t2 = Texture(Dimension.Dim2D, 16, 16)
    t2.set_image(solid(16, 16))
    assert t2.generate_mipmaps(
        custom_mip_images={
            ImageIndex(CubeFace.PosX, 2, 0): CustomMipImage(
                custom, MipReplacement.Continue
            )
        }
    )
    np.testing.assert_allclose(
        t2.get_image(mip_level=3).array[0, 0], [1, 0, 0, 1], atol=1e-5
    )


def test_3d_mipmaps():
    t = Texture(Dimension.Dim3D, 8, 8, depth=8)
    for d in range(8):
        v = d / 8.0
        arr = np.tile(np.array([v, v, v, 1], np.float32), (8, 8, 1))
        assert t.set_image(Image.from_array(arr, ImageFormat.RGBAF), depth=d)
    assert t.generate_mipmaps(ResizeFilter.Box)
    assert t.mip_levels == 4
    assert t.depth(1) == 4
    # Box Z-filter at 2:1: mip1 slice 0 averages slices 0 and 1.
    v = t.get_image(mip_level=1, depth=0).array[0, 0, 0]
    assert v == pytest.approx((0 / 8 + 1 / 8) / 2, abs=1e-5)
    # Tent Z-filter (reference generateMips3d drops out-of-range taps).
    t.generate_mipmaps(ResizeFilter.CatmullRom)
    v = t.get_image(mip_level=1, depth=0).array[0, 0, 0]
    expected = (0 * 0.75 + 1 / 8 * 0.75 + 2 / 8 * 0.25) / 1.75
    assert v == pytest.approx(expected, abs=1e-5)


def test_convert_requires_complete():
    t = Texture(Dimension.Dim2D, 8, 8, mip_levels=2)
    t.set_image(solid(8, 8))
    assert not t.convert(F.R8G8B8A8, T.UNorm)  # mip 1 missing
    t.generate_mipmaps()
    assert t.convert(F.R8G8B8A8, T.UNorm)
    assert t.converted


def test_convert_srgb_rejected_without_native():
    t = Texture(Dimension.Dim2D, 8, 8, color_space=ColorSpace.sRGB)
    t.set_image(solid(8, 8))
    assert not t.convert(F.R5G6B5, T.UNorm)
    assert t.convert(F.R8G8B8A8, T.UNorm)


@pytest.mark.parametrize(
    "fmt,type_",
    [
        (F.R4G4, T.UNorm), (F.R4G4B4A4, T.UNorm), (F.B4G4R4A4, T.UNorm),
        (F.A4R4G4B4, T.UNorm), (F.R5G6B5, T.UNorm), (F.B5G6R5, T.UNorm),
        (F.R5G5B5A1, T.UNorm), (F.B5G5R5A1, T.UNorm), (F.A1R5G5B5, T.UNorm),
        (F.R8, T.UNorm), (F.R8, T.SNorm), (F.R8, T.UInt), (F.R8, T.Int),
        (F.R8G8, T.UNorm), (F.R8G8B8, T.UNorm), (F.B8G8R8, T.UNorm),
        (F.R8G8B8A8, T.UNorm), (F.B8G8R8A8, T.UNorm), (F.A8B8G8R8, T.UNorm),
        (F.A2R10G10B10, T.UNorm), (F.A2B10G10R10, T.UInt),
        (F.R16, T.UNorm), (F.R16, T.Float), (F.R16G16, T.SNorm),
        (F.R16G16B16, T.Float), (F.R16G16B16A16, T.Float),
        (F.R32, T.Float), (F.R32G32, T.UInt), (F.R32G32B32, T.Int),
        (F.R32G32B32A32, T.Float),
        (F.B10G11R11_UFloat, T.UFloat), (F.E5B9G9R9_UFloat, T.UFloat),
    ],
)
def test_convert_standard_sizes(fmt, type_):
    """Output size == pixels * blockSize for every standard (format, type)
    (TextureTest.cpp:824-980)."""
    from cuttlefish_tpu.formats import block_size

    t = Texture(Dimension.Dim2D, 6, 5)
    t.set_image(solid(6, 5))
    assert t.convert(fmt, type_), (fmt, type_)
    assert t.data_size() == 6 * 5 * block_size(fmt)


def test_standard_pack_values():
    arr = np.zeros((1, 2, 4), np.float32)
    arr[0, 0] = [1.0, 0.0, 0.5, 1.0]
    arr[0, 1] = [0.25, 0.75, 1.0, 0.0]
    t = Texture(Dimension.Dim2D, 2, 1)
    t.set_image(Image.from_array(arr, ImageFormat.RGBAF))
    assert t.convert(F.R5G6B5, T.UNorm)
    words = np.frombuffer(t.data(), "<u2")
    # r5=31, g6=0, b5=16 -> b | g<<5 | r<<11
    assert words[0] == 16 | (0 << 5) | (31 << 11)
    assert words[1] == 31 | (47 << 5) | (8 << 11)

    t2 = Texture(Dimension.Dim2D, 2, 1)
    t2.set_image(Image.from_array(arr, ImageFormat.RGBAF))
    assert t2.convert(F.R8G8B8A8, T.SNorm)
    vals = np.frombuffer(t2.data(), np.int8).reshape(2, 4)
    np.testing.assert_array_equal(vals[0], [127, 0, 64, 127])


def test_save_dds_header_size(tmp_path):
    t = Texture(Dimension.Dim2D, 4, 4)
    t.set_image(solid(4, 4))
    t.convert(F.R8G8B8A8, T.UNorm)
    res, data = t.save_to_bytes(FileType.DDS)
    assert res is SaveResult.Success
    assert len(data) == 148 + 4 * 4 * 4  # DDS header is 148 bytes


def test_save_ktx_header_size():
    t = Texture(Dimension.Dim2D, 4, 4)
    t.set_image(solid(4, 4))
    t.convert(F.R8G8B8A8, T.UNorm)
    res, data = t.save_to_bytes(FileType.KTX)
    assert res is SaveResult.Success
    assert len(data) == 68 + 4 * 4 * 4  # KTX header is 64 + 4 (imageSize)


def test_save_pvr_header_size():
    t = Texture(Dimension.Dim2D, 4, 4)
    t.set_image(solid(4, 4))
    t.convert(F.R8G8B8A8, T.UNorm)
    res, data = t.save_to_bytes(FileType.PVR)
    assert res is SaveResult.Success
    assert len(data) == 52 + 4 * 4 * 4  # PVR header is 52 bytes


def test_save_unsupported():
    t = Texture(Dimension.Dim2D, 4, 4)
    t.set_image(solid(4, 4))
    t.convert(F.B8G8R8, T.UNorm)
    res, _ = t.save_to_bytes(FileType.DDS)
    assert res is SaveResult.Unsupported
    res, _ = t.save_to_bytes(FileType.KTX)
    assert res is SaveResult.Unsupported
    res, _ = t.save_to_bytes(FileType.PVR)
    assert res is SaveResult.Success


def test_save_file_auto_type(tmp_path):
    t = Texture(Dimension.Dim2D, 4, 4)
    t.set_image(solid(4, 4))
    t.convert(F.R8G8B8A8, T.UNorm)
    path = str(tmp_path / "x.ktx")
    assert t.save(path) is SaveResult.Success
    with open(path, "rb") as f:
        assert f.read(4) == b"\xabKTX"


def test_save_dds_array_element_order():
    """2D-array DDS data is element-major with each element's own bytes
    (regression: the writer must not conflate array element with volume
    slice; SaveDds.cpp:657-680)."""
    t = Texture(Dimension.Dim2D, 4, 4, depth=3)
    shades = [0.1, 0.5, 0.9]
    for d, v in enumerate(shades):
        t.set_image(solid(4, 4, (v, v, v, 1.0)), depth=d)
    assert t.convert(F.R8G8B8A8, T.UNorm)
    res, data = t.save_to_bytes(FileType.DDS)
    assert res is SaveResult.Success
    body = data[148:]
    assert len(body) == 3 * 64
    for d, v in enumerate(shades):
        expect = round(v * 255)
        element = body[d * 64 : (d + 1) * 64]
        assert element == t.data(depth=d)
        assert all(b == expect for b in element[:3])


def test_save_dds_3d_volume_order():
    t = Texture(Dimension.Dim3D, 4, 4, depth=2)
    shades = [0.2, 0.8]
    for z, v in enumerate(shades):
        t.set_image(solid(4, 4, (v, v, v, 1.0)), depth=z)
    assert t.convert(F.R8G8B8A8, T.UNorm)
    res, data = t.save_to_bytes(FileType.DDS)
    assert res is SaveResult.Success
    body = data[148:]
    assert len(body) == 2 * 64
    for z, v in enumerate(shades):
        assert body[z * 64] == round(v * 255)


def test_adjust_image_value_range_snorm():
    arr = np.full((2, 2, 4), 128, np.uint8)
    img = Image.from_array(arr, ImageFormat.RGBA8)
    out = Texture.adjust_image_value_range(
        img.convert(ImageFormat.RGBAF), T.SNorm, ImageFormat.RGBA8
    )
    assert out.array[0, 0, 0] == pytest.approx(128 / 255 * 2 - 1, abs=1e-6)


def test_adjust_image_value_range_int():
    arr = np.full((2, 2, 4), 200, np.uint8)
    img = Image.from_array(arr, ImageFormat.RGBA8).convert(ImageFormat.RGBAF)
    out = Texture.adjust_image_value_range(img, T.UInt, ImageFormat.RGBA8)
    assert out.array[0, 0, 0] == 200.0
    out2 = Texture.adjust_image_value_range(img, T.Int, ImageFormat.RGBA8)
    assert out2.array[0, 0, 0] == 200.0 - 128.0


def test_adjust_image_value_range_float_passthrough():
    arr = np.full((2, 2, 3), 3.5, np.float32)
    img = Image.from_array(arr, ImageFormat.RGBF)
    out = Texture.adjust_image_value_range(img, T.Int, ImageFormat.RGBF)
    assert out.array[0, 0, 0] == 3.5
