"""Format metadata tests (reference: lib/test/TextureTest.cpp + static tables)."""

import pytest

from cuttlefish_tpu import (
    Dimension,
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
from cuttlefish_tpu.formats import FileType, valid_types

F, T = TextureFormat, TextureType


def test_block_sizes():
    assert (block_width(F.BC1_RGB), block_height(F.BC1_RGB), block_size(F.BC1_RGB)) == (4, 4, 8)
    assert block_size(F.BC7) == 16
    assert (block_width(F.ASTC_12x10), block_height(F.ASTC_12x10)) == (12, 10)
    assert block_size(F.ASTC_12x10) == 16
    assert (block_width(F.PVRTC1_RGB_2BPP), block_height(F.PVRTC1_RGB_2BPP)) == (8, 4)
    assert (min_width(F.PVRTC1_RGB_2BPP), min_height(F.PVRTC1_RGB_2BPP)) == (16, 8)
    assert block_size(F.R16G16B16) == 6
    assert block_size(F.E5B9G9R9_UFloat) == 4


def test_validity_matrix():
    assert is_format_valid(F.R8, T.UNorm)
    assert is_format_valid(F.R8, T.Int)
    assert not is_format_valid(F.R8, T.Float)
    assert not is_format_valid(F.R32, T.UNorm)
    assert is_format_valid(F.R32, T.Float)
    assert is_format_valid(F.BC6H, T.UFloat)
    assert is_format_valid(F.BC6H, T.Float)
    assert not is_format_valid(F.BC6H, T.UNorm)
    assert is_format_valid(F.BC4, T.SNorm)
    assert not is_format_valid(F.BC1_RGB, T.SNorm)
    assert is_format_valid(F.ASTC_4x4, T.UFloat)
    assert is_format_valid(F.EAC_R11, T.SNorm)
    assert not is_format_valid(F.Unknown, T.UNorm)
    assert valid_types(F.A2R10G10B10) == frozenset({T.UNorm, T.UInt})


def test_native_srgb():
    assert has_native_srgb(F.R8G8B8A8, T.UNorm)
    assert not has_native_srgb(F.R8G8B8A8, T.UInt)
    assert has_native_srgb(F.BC7, T.UNorm)
    assert has_native_srgb(F.ASTC_6x6, T.UNorm)
    assert not has_native_srgb(F.R5G6B5, T.UNorm)
    assert not has_native_srgb(F.BC4, T.UNorm)


def test_has_alpha():
    assert has_alpha(F.BC1_RGBA)
    assert not has_alpha(F.BC1_RGB)
    assert has_alpha(F.ASTC_4x4)
    assert not has_alpha(F.EAC_R11G11)
    assert has_alpha(F.A2B10G10R10)
    assert not has_alpha(F.R32G32B32)


def test_max_mipmap_levels():
    assert max_mipmap_levels(Dimension.Dim2D, 1, 1) == 1
    assert max_mipmap_levels(Dimension.Dim2D, 16, 16) == 5
    assert max_mipmap_levels(Dimension.Dim2D, 16, 32) == 6
    assert max_mipmap_levels(Dimension.Dim2D, 100, 10) == 7
    assert max_mipmap_levels(Dimension.Dim3D, 4, 4, 64) == 7
    # Non-3D ignores depth.
    assert max_mipmap_levels(Dimension.Dim2D, 4, 4, 64) == 3


def test_file_type_for_name():
    assert file_type_for_name("x.dds") is FileType.DDS
    assert file_type_for_name("x.KTX") is FileType.KTX
    assert file_type_for_name("some.file.pvr") is FileType.PVR
    assert file_type_for_name("x.png") is FileType.Auto


def test_container_validity():
    # DDS doesn't support ETC/ASTC/PVRTC; KTX/PVR do.
    assert is_format_valid(F.BC7, T.UNorm, FileType.DDS)
    assert not is_format_valid(F.ETC2_R8G8B8, T.UNorm, FileType.DDS)
    assert is_format_valid(F.ETC2_R8G8B8, T.UNorm, FileType.KTX)
    assert is_format_valid(F.ASTC_8x8, T.UNorm, FileType.PVR)
    # R4G4 maps to DDS IA44 but not KTX.
    assert is_format_valid(F.R4G4, T.UNorm, FileType.DDS)
    assert not is_format_valid(F.R4G4, T.UNorm, FileType.KTX)
    assert is_format_valid(F.R4G4, T.UNorm, FileType.PVR)
    # B8G8R8 not in DDS/KTX, fine for PVR.
    assert not is_format_valid(F.B8G8R8, T.UNorm, FileType.DDS)
    assert not is_format_valid(F.B8G8R8, T.UNorm, FileType.KTX)
    assert is_format_valid(F.B8G8R8, T.UNorm, FileType.PVR)
