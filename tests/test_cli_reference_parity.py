"""CLI behavior parity with the reference's ctest suite.

Every entry of the reference's CLI integration-test list
(`/root/reference/tool/CMakeLists.txt:26-560`, 97 `add_test` rows run via
`tool/test/run-test.sh`, which checks only the exit code) is replayed here
verbatim against our CLI with equivalent fixtures: the reference's test
images are tiny 4x4 RGBA PNGs (4x2 for the array slices) plus list files
naming them; we procedurally generate same-shaped fixtures under the same
filenames (including the Unicode one) and assert the same exit code.

The deliberately weird capitalization in many rows (e.g. `-r 31 42 lInear`,
`--alpha pre-muLtiplied`, `-f etc2_R8G8B8A8`) is part of the reference
surface: option keywords are case-insensitive while flags are not.
"""

import os
import shlex

import numpy as np
import pytest

from cuttlefish_tpu.cli import run

# (name, expected_exit, argv_string) transcribed from
# /root/reference/tool/CMakeLists.txt (feature gates CUTTLEFISH_BUILD_S3TC/
# ETC/ASTC/PVRTC are all enabled in this build, so every row applies).
# ${nullFile} is the platform null device.
CASES = [
    ("NoArgs", 1, ""),
    ("Help", 1, "-h"),
    ("SaveDds", 0, "-i texture.png -f R8G8B8A8 -o @null@ --file-format dds"),
    ("SaveKtx", 0, "-i texture.png -f r8g8b8a8 -o @null@ --file-format ktx"),
    ("SavePvr", 0, "-i texture.png -f R8G8B8A8 -o @null@ --file-format pvr"),
    ("Unicode", 0, "-i 地.png -f R8G8B8A8 -o @null@ --file-format pvr"),
    ("SaveUnknownFileType", 1,
     "-i texture.png -f R8G8B8A8 -o @null@ --file-format asdf"),
    ("SaveMissingFileTypeParam", 1,
     "-i texture.png -f R8G8B8A8 -o @null@ --file-format"),
    ("MissingOutput", 1, "-i texture.png -f R8G8B8A8 --file-format pvr"),
    ("MultipleOutput", 1,
     "-i texture.png -f R8G8B8A8 -o @null@ -o @null@ --file-format pvr"),
    # -- CUTTLEFISH_BUILD_S3TC --
    ("SaveBC3", 0, "-i texture.png -f BC3 -o @null@ --file-format PVR"),
    ("SaveBC3sRGB", 0,
     "-i texture.png -f BC3 --srgb -o @null@ --file-format pvr"),
    ("SaveBC6H", 0, "-i texture.png -f BC6H -o @null@ --file-format pvr"),
    ("SaveBC6HUNorm", 1,
     "-i texture.png -f BC6H -t UNorm -o @null@ --file-format pvr"),
    ("SaveBC6HUFloat", 0,
     "-i texture.png -f BC6H -t UFloat -o @null@ --file-format pvr"),
    ("SaveBC6HFloat", 0,
     "-i texture.png -f BC6H -t Float -o @null@ --file-format pvr"),
    # -- CUTTLEFISH_BUILD_ETC --
    ("SaveETC2", 0,
     "-i texture.png -f etc2_R8G8B8A8 -o @null@ --file-format pvr"),
    ("SaveETC2sRGB", 0,
     "-i texture.png -f ETC2_r8g8b8a8 --srgb -o @null@ --file-format pvr"),
    # -- CUTTLEFISH_BUILD_ASTC --
    ("SaveASTC", 0, "-i texture.png -f ASTC_5x5 -o @null@ --file-format pvr"),
    ("SaveASTCHDR", 0,
     "-i texture.png -f ASTC_5x5 -t UFLOAT -o @null@ --file-format pvr"),
    ("SaveASTCsRGB", 0,
     "-i texture.png -f ASTC_5x5 --srgb -o @null@ --file-format pvr"),
    ("SaveASTCLowest", 0,
     "-i texture.png -f ASTC_5x5 -o @null@ -Q lowest --file-format pvr"),
    ("SaveASTCLow", 0,
     "-i texture.png -f ASTC_5x5 -o @null@ -Q low --file-format pvr"),
    ("SaveASTCHigh", 0,
     "-i texture.png -f ASTC_5x5 -o @null@ -Q high --file-format pvr"),
    ("SaveASTCHightest", 0,
     "-i texture.png -f ASTC_5x5 -o @null@ -Q highest --file-format pvr"),
    # -- CUTTLEFISH_BUILD_PVRTC --
    ("SavePVRTC", 0,
     "-i texture.png -f PVRTC1_RGB_4BPP -o @null@ --file-format pvr"),
    ("SavePVRTCsRGB", 0,
     "-i texture.png -f PVRTC1_RGB_4BPP --srgb -o @null@ --file-format pvr"),
    # -- always-on formats / types --
    ("SaveB10G11R11_UFloat", 0,
     "-i texture.png -f B10G11R11_UFloat -o @null@ --file-format pvr"),
    ("SaveE5B9G9R9_UFloat", 0,
     "-i texture.png -f E5B9G9R9_UFloat -o @null@ --file-format pvr"),
    ("SavesRGB", 0,
     "-i texture.png -f R8G8B8A8 --srgb -o @null@ --file-format pvr"),
    ("SaveUNorm", 0,
     "-i texture.png -f R16G16B16A16 -t unorm -o @null@ --file-format pvr"),
    ("SaveSNorm", 0,
     "-i texture.png -f R16G16B16A16 -t snorm -o @null@ --file-format pvr"),
    ("SaveUInt", 0,
     "-i texture.png -f R16G16B16A16 -t uint -o @null@ --file-format pvr"),
    ("SaveInt", 0,
     "-i texture.png -f R16G16B16A16 -t int -o @null@ --file-format pvr"),
    ("SaveUFloat", 1,
     "-i texture.png -f R16G16B16A16 -t ufloat -o @null@ --file-format pvr"),
    ("SaveFloat", 0,
     "-i texture.png -f R16G16B16A16 -t float -o @null@ --file-format pvr"),
    ("SaveUnknownType", 1,
     "-i texture.png -f R16G16B16A16 -t asdf -o @null@ --file-format pvr"),
    ("SaveUnknownFormat", 1,
     "-i texture.png -f asdf -o @null@ --file-format pvr"),
    ("SaveMissingFormat", 1, "-i texture.png -o @null@ --file-format pvr"),
    ("SaveMissingInput", 1, "-f R8G8B8A8 -o @null@ --file-format pvr"),
    ("SaveInputNotFound", 2,
     "-i asdf.png -f R8G8B8A8 -o @null@ --file-format pvr"),
    # -- arrays / 3D --
    ("SaveArray", 0,
     '-a "array 0.png" -a 1 "array 1.png" --array "array 2.png" '
     "-f R8G8B8A8 -o @null@ --file-format pvr"),
    ("SaveArrayDuplicateIndex", 1,
     '-a "array 0.png" -a 0 "array 1.png" --array "array 2.png" '
     "-f R8G8B8A8 -o @null@ --file-format pvr"),
    ("SaveArrayMissingIndex", 1,
     '-a "array 0.png" -a "array 1.png" --array 3 "array 2.png" '
     "-f R8G8B8A8 -o @null@ --file-format pvr"),
    ("Save3D", 0,
     '-a "array 0.png" -a "array 1.png" --array "array 2.png" -d 3 '
     "-f R8G8B8A8 -o @null@ --file-format pvr"),
    # -- cube maps --
    ("Cube", 0,
     "-c +X posx.png -c +Y posy.png -c +Z posz.png -c -x negx.png "
     "-c -y negy.png --cube -z negz.png -f R8G8B8A8 -o @null@ "
     "--file-format pvr"),
    ("CubeMissingFace", 1,
     "-c +y posy.png -c +z posz.png -c -x negx.png -c -y negy.png "
     "--cube -z negz.png -f R8G8B8A8 -o @null@ --file-format pvr"),
    ("CubeDuplicateFace", 1,
     "-c +x posx.png -c +x posx.png -c +y posy.png -c +z posz.png "
     "-c -x negx.png -c -y negy.png --cube -z negz.png -f R8G8B8A8 "
     "-o @null@ --file-format pvr"),
    ("CubeArray", 0,
     "-C 0 +x posx.png -C 0 +y posy.png -C 0 +z posz.png -C 0 -X negx.png "
     "-C 0 -Y negy.png --cube-array 0 -Z negz.png -C 1 +x posx.png "
     "-C 1 +y posy.png -C 1 +z posz.png -C 1 -x negx.png -C 1 -y negy.png "
     "--cube-array 1 -z negz.png -f R8G8B8A8 -o @null@ --file-format pvr"),
    ("CubeArrayMissingFace", 1,
     "-C 0 +y posy.png -C 0 +z posz.png -C 0 -x negx.png -C 0 -y negy.png "
     "--cube-array 0 -z negz.png -C 1 +x posx.png -C 1 +y posy.png "
     "-C 1 +z posz.png -C 1 -x negx.png -C 1 -y negy.png "
     "--cube-array 1 -z negz.png -f R8G8B8A8 -o @null@ --file-format pvr"),
    ("CubeArrayDuplicateFace", 1,
     "-C 0 +x posx.png -C 0 +x posx.png -C 0 +y posy.png -C 0 +z posz.png "
     "-C 0 -x negx.png -C 0 -y negy.png --cube-array 0 -z negz.png "
     "-C 1 +x posx.png -C 1 +y posy.png -C 1 +z posz.png -C 1 -x negx.png "
     "-C 1 -y negy.png --cube-array 1 -z negz.png -f R8G8B8A8 -o @null@ "
     "--file-format pvr"),
    # -- input lists --
    ("ImageList", 0,
     "-I image image.txt -f R8G8B8A8 -o @null@ --file-format pvr"),
    ("ImageListNotFound", 1,
     "-I image asdf.txt -f R8G8B8A8 -o @null@ --file-format pvr"),
    ("ImageListMultipleImages", 1,
     "-I image array.txt -f R8G8B8A8 -o @null@ --file-format pvr"),
    ("ArrayList", 0,
     "--input-list array array.txt -f R8G8B8A8 -o @null@ --file-format pvr"),
    ("CubeList", 0,
     "-I cube cube.txt -f R8G8B8A8 -o @null@ --file-format pvr"),
    ("InvalidCubeList", 1,
     "-I cube array.txt -f R8G8B8A8 -o @null@ --file-format pvr"),
    ("CubeArrayList", 0,
     "-I cube-array cube-array.txt -f R8G8B8A8 -o @null@ --file-format pvr"),
    ("InvalidCubeArrayList", 1,
     "-I cube-array array.txt -f R8G8B8A8 -o @null@ --file-format pvr"),
    ("UnknownList", 1,
     "-I asdf array.txt -f R8G8B8A8 -o @null@ --file-format pvr"),
    # -- resize --
    ("Resize", 0,
     "-i texture.png -f R8G8B8A8 --resize 31 42 -o @null@ --file-format pvr"),
    ("ResizeBox", 0,
     "-i texture.png -f R8G8B8A8 -r 31 42 Box -o @null@ --file-format pvr"),
    ("ResizeLinear", 0,
     "-i texture.png -f R8G8B8A8 -r 31 42 lInear -o @null@ "
     "--file-format pvr"),
    ("ResizeCubic", 0,
     "-i texture.png -f R8G8B8A8 -r 31 42 cuBic -o @null@ --file-format pvr"),
    ("ResizeCatmullRom", 0,
     "-i texture.png -f R8G8B8A8 -r 31 42 catmull-Rom -o @null@ "
     "--file-format pvr"),
    ("ResizePO2", 0,
     "-i texture.png -f R8G8B8A8 -r nextPO2 Nearestpo2 -o @null@ "
     "--file-format pvr"),
    ("ResizeInvalidX", 1,
     "-i texture.png -f R8G8B8A8 -r asdf nearestPO2 -o @null@ "
     "--file-format pvr"),
    ("ResizeInvalidY", 1,
     "-i texture.png -f R8G8B8A8 -r nextpo2 asdf -o @null@ "
     "--file-format pvr"),
    # -- mipmaps --
    ("Mipmap", 0, "-i texture.png -f R8G8B8A8 -m -o @null@ --file-format pvr"),
    ("MipmapLevels", 0,
     "-i texture.png -f R8G8B8A8 --mipmap 1 -o @null@ --file-format pvr"),
    ("MipmapFilter", 0,
     "-i texture.png -f R8G8B8A8 -m Box -o @null@ --file-format pvr"),
    ("MipmapLevelsFilter", 0,
     "-i texture.png -f R8G8B8A8 -m 1 box -o @null@ --file-format pvr"),
    # -- normal maps --
    ("Normalimap", 0,
     "-i texture.png -f R8G8B8A8 -n -o @null@ --file-format pvr"),
    ("NormalimapHeight", 0,
     "-i texture.png -f R8G8B8A8 --normalmap 2.3 -o @null@ "
     "--file-format pvr"),
    ("NormalimapWrap", 0,
     "-i texture.png -f R8G8B8A8 --normalmap wrap -o @null@ "
     "--file-format pvr"),
    ("NormalimapWrapX", 0,
     "-i texture.png -f R8G8B8A8 --normalmap wrapx -o @null@ "
     "--file-format pvr"),
    ("NormalimapWrapY", 0,
     "-i texture.png -f R8G8B8A8 --normalmap wrapy -o @null@ "
     "--file-format pvr"),
    ("NormalimapWrapWithHeight", 0,
     "-i texture.png -f R8G8B8A8 --normalmap wrap 2.3 -o @null@ "
     "--file-format pvr"),
    # -- alpha --
    ("AlphaNone", 0,
     "-i texture.png -f R8G8B8A8 --alpha nonE -o @null@ --file-format pvr"),
    ("AlphaStandard", 0,
     "-i texture.png -f R8G8B8A8 --alpha Standard -o @null@ "
     "--file-format pvr"),
    ("AlphaPreMultiplied", 0,
     "-i texture.png -f R8G8B8A8 --alpha pre-muLtiplied -o @null@ "
     "--file-format pvr"),
    ("Encoded", 0,
     "-i texture.png -f R8G8B8A8 --alpha encodeD -o @null@ "
     "--file-format pvr"),
    # -- swizzle --
    ("Swizzle", 0,
     "-i texture.png -f R8G8B8A8 -s abgr -o @null@ --file-format pvr"),
    ("SwizzleAlternate", 0,
     "-i texture.png -f R8G8B8A8 -s RgXb -o @null@ --file-format pvr"),
    ("SwizzleInvalidNumber", 1,
     "-i texture.png -f R8G8B8A8 -s rgb -o @null@ --file-format pvr"),
    ("SwizzleInvalidChannel", 1,
     "-i texture.png -f R8G8B8A8 -s abcd -o @null@ --file-format pvr"),
    # -- custom mips --
    ("CustomMip", 0,
     "-i texture.png -f R8G8B8A8 -m -M 1 posx.png -o @null@ "
     "--file-format pvr"),
    ("CustomMipList", 0,
     "-i texture.png -f R8G8B8A8 -m --custom-mip-list custom-mip.txt "
     "-o @null@ --file-format pvr"),
    ("CustomMipMulti", 0,
     "-i texture.png -f R8G8B8A8 -m -M 1 posx.png "
     "--custom-mip 2 once negx.png -o @null@ --file-format pvr"),
    ("CustomMipCube", 0,
     "-c +X posx.png -c +Y posy.png -c +Z posz.png -c -x negx.png "
     "-c -y negy.png -c -z negz.png -f R8G8B8A8 -m -M 1 +x negx.png "
     "-M 1 -x posx.png -M 1 0 +y continue negy.png -M 1 -y once posy.png "
     "-M 1 +z negz.png -M 1 -z posz.png -o @null@ --file-format pvr"),
    ("CustomMipArray", 0,
     '-a "array 0.png" -a "array 1.png" -a "array 2.png" -f R8G8B8A8 -m '
     "-M 1 2 posx.png -o @null@ --file-format pvr"),
    ("CustomMip3D", 0,
     '-a "array 0.png" -a "array 1.png" -a "array 2.png" -a negx.png '
     "-f R8G8B8A8 -m -M 1 0 posx.png -M 1 1 posy.png -d 3 -o @null@ "
     "--file-format pvr"),
    ("CustomMipWithoutMipmaps", 1,
     "-i texture.png -f R8G8B8A8 -M 1 posx.png -o @null@ --file-format pvr"),
    ("CustomMipInvalidLevel", 2,
     "-i texture.png -f R8G8B8A8 -m -M 3 posx.png -o @null@ "
     "--file-format pvr"),
    ("CustomMipInvalidDepth", 1,
     '-a "array 0.png" -a "array 1.png" -a "array 2.png" -f R8G8B8A8 -m '
     "-M 1 3 posx.png -o @null@ --file-format pvr"),
    ("CustomMipInvalidFace", 2,
     "-i texture.png -f R8G8B8A8 -m -M 1 +y posx.png -o @null@ "
     "--file-format pvr"),
    ("CustomMip3DIncomplete", 1,
     '-a "array 0.png" -a "array 1.png" -a "array 2.png" -a negz.png '
     "-f R8G8B8A8 -m -M 1 0 posx.png -d 3 -o @null@ --file-format pvr"),
]


def _png(path, w, h, seed):
    import PIL.Image

    rng = np.random.default_rng(seed)
    arr = (rng.random((h, w, 4)) * 255).astype(np.uint8)
    PIL.Image.fromarray(arr, "RGBA").save(path)


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    """Recreate the reference fixture set: 4x4 PNGs (4x2 array slices) and
    the five list files (`/root/reference/tool/test/*.txt` semantics)."""
    d = tmp_path_factory.mktemp("clifix")
    _png(d / "texture.png", 4, 4, 0)
    _png(d / "地.png", 4, 4, 1)
    for i in range(3):
        _png(d / f"array {i}.png", 4, 2, 10 + i)
    for i, face in enumerate(["posx", "negx", "posy", "negy", "posz", "negz"]):
        _png(d / f"{face}.png", 4, 4, 20 + i)
    (d / "image.txt").write_text("texture.png\n")
    (d / "array.txt").write_text(
        "array 0.png\narray 1.png\narray 2.png\n")
    cube = "negx.png\nposx.png\nnegy.png\nposy.png\nnegz.png\nposz.png\n"
    (d / "cube.txt").write_text(cube)
    (d / "cube-array.txt").write_text(cube * 2)
    (d / "custom-mip.txt").write_text(
        "1 array 0.png\n2 0 +x once array 1.png\n")
    return d


@pytest.mark.parametrize(
    "name,expected,args", CASES, ids=[c[0] for c in CASES])
def test_reference_ctest(name, expected, args, fixture_dir, monkeypatch):
    monkeypatch.chdir(fixture_dir)
    argv = [a.replace("@null@", os.devnull) for a in shlex.split(args)]
    assert run(argv) == expected
