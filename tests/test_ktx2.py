"""KTX 2.0 writer validation.

No independent KTX2 reader exists in this environment, so these tests
re-parse the emitted bytes strictly per the Khronos KTX 2.0 spec (header,
index, level index, DFD basic block, KVD) and assert structure, alignment,
and data round-trip.
"""

import struct

import numpy as np
import pytest

import cuttlefish_tpu as ct
from cuttlefish_tpu.containers import ktx2
from cuttlefish_tpu.formats import (
    FileType,
    SaveResult,
    TextureFormat,
    TextureType,
    block_size,
    file_type_for_name,
    is_format_valid,
)

IDENT = b"\xabKTX 20\xbb\r\n\x1a\n"


def parse_ktx2(data: bytes) -> dict:
    assert data[:12] == IDENT
    (
        vkformat, type_size, w, h, d, layers, faces, levels, scheme,
    ) = struct.unpack_from("<9I", data, 12)
    dfd_off, dfd_len, kvd_off, kvd_len, sgd_off, sgd_len = struct.unpack_from(
        "<4I2Q", data, 48
    )
    level_index = []
    for i in range(levels):
        level_index.append(struct.unpack_from("<3Q", data, 80 + 24 * i))

    # DFD
    (dfd_total,) = struct.unpack_from("<I", data, dfd_off)
    assert dfd_total == dfd_len
    vendor_type, version_blocksize = struct.unpack_from("<II", data, dfd_off + 4)
    assert vendor_type == 0  # Khronos basic
    version = version_blocksize & 0xFFFF
    block_bytes = version_blocksize >> 16
    assert version == 2
    assert dfd_total == 4 + block_bytes
    (model, primaries, transfer, flags) = struct.unpack_from(
        "<4B", data, dfd_off + 12
    )
    bdims = struct.unpack_from("<4B", data, dfd_off + 16)
    planes = struct.unpack_from("<8B", data, dfd_off + 20)
    nsamples = (block_bytes - 24) // 16
    samples = []
    for i in range(nsamples):
        off = dfd_off + 28 + 16 * i
        bit_off, raw_len, chan = struct.unpack_from("<HBB", data, off)
        lower, upper = struct.unpack_from("<II", data, off + 8)
        samples.append(
            {
                "offset": bit_off,
                "bits": raw_len + 1,
                "channel": chan & 0xF,
                "flags": chan & 0xF0,
                "lower": lower,
                "upper": upper,
            }
        )

    # KVD
    kvd = {}
    p = kvd_off
    while p < kvd_off + kvd_len:
        (n,) = struct.unpack_from("<I", data, p)
        kv = data[p + 4 : p + 4 + n]
        key, _, value = kv.partition(b"\x00")
        kvd[key.decode()] = value
        p += 4 + n + (4 - n % 4) % 4

    return {
        "vkformat": vkformat,
        "type_size": type_size,
        "w": w,
        "h": h,
        "d": d,
        "layers": layers,
        "faces": faces,
        "levels": levels,
        "scheme": scheme,
        "level_index": level_index,
        "model": model,
        "primaries": primaries,
        "transfer": transfer,
        "dfd_flags": flags,
        "block_dims": bdims,
        "bytes_plane0": planes[0],
        "samples": samples,
        "kvd": kvd,
        "sgd": (sgd_off, sgd_len),
    }


def _tex2d(fmt, type_=TextureType.UNorm, size=16, mips=False,
           color_space=ct.ColorSpace.Linear, layers=0):
    rng = np.random.default_rng(7)
    arr = rng.random((size, size, 4), np.float32)
    tex = ct.Texture(ct.Dimension.Dim2D, size, size, depth=layers,
                     color_space=color_space)
    img = ct.Image.from_array(arr, ct.ImageFormat.RGBAF)
    for dd in range(max(layers, 1)):
        tex.set_image(img, depth=dd)
    if mips:
        tex.generate_mipmaps()
    assert tex.convert(fmt, type_, quality=ct.Quality.Lowest)
    return tex


class TestVkFormats:
    def test_known_values(self):
        CS = ct.ColorSpace
        cases = [
            (TextureFormat.R8G8B8A8, TextureType.UNorm, CS.Linear, 37, 1),
            (TextureFormat.R8G8B8A8, TextureType.UNorm, CS.sRGB, 43, 1),
            (TextureFormat.BC1_RGB, TextureType.UNorm, CS.Linear, 131, 1),
            (TextureFormat.BC7, TextureType.UNorm, CS.Linear, 145, 1),
            (TextureFormat.BC7, TextureType.UNorm, CS.sRGB, 146, 1),
            (TextureFormat.BC6H, TextureType.UFloat, CS.Linear, 143, 1),
            (TextureFormat.BC6H, TextureType.Float, CS.Linear, 144, 1),
            (TextureFormat.ASTC_4x4, TextureType.UNorm, CS.Linear, 157, 1),
            (TextureFormat.ASTC_6x6, TextureType.UNorm, CS.sRGB, 166, 1),
            (TextureFormat.ASTC_12x12, TextureType.UNorm, CS.sRGB, 184, 1),
            (TextureFormat.EAC_R11, TextureType.SNorm, CS.Linear, 154, 1),
            (TextureFormat.ETC2_R8G8B8, TextureType.UNorm, CS.sRGB, 148, 1),
            (TextureFormat.R5G6B5, TextureType.UNorm, CS.Linear, 4, 2),
            (TextureFormat.R16G16B16A16, TextureType.Float, CS.Linear, 97, 2),
            (TextureFormat.R32G32B32A32, TextureType.Float, CS.Linear, 109, 4),
            (TextureFormat.B10G11R11_UFloat, TextureType.UFloat, CS.Linear, 122, 4),
            (TextureFormat.E5B9G9R9_UFloat, TextureType.UFloat, CS.Linear, 123, 4),
            (TextureFormat.PVRTC1_RGB_4BPP, TextureType.UNorm, CS.Linear, 1000054001, 1),
            (TextureFormat.PVRTC2_RGBA_4BPP, TextureType.UNorm, CS.sRGB, 1000054007, 1),
        ]
        for fmt, t, cs, want, want_ts in cases:
            got = ktx2.get_vk_format(fmt, t, cs)
            assert got == (want, want_ts), (fmt, t, cs, got)

    def test_etc1_maps_to_etc2(self):
        # ETC2 is a superset decoder; KTX2/Vulkan has no ETC1 enum.
        assert ktx2.get_vk_format(
            TextureFormat.ETC1, TextureType.UNorm, ct.ColorSpace.Linear
        ) == (147, 1)

    def test_invalid_combos(self):
        assert ktx2.get_vk_format(
            TextureFormat.R5G6B5, TextureType.UNorm, ct.ColorSpace.sRGB
        ) is None
        assert ktx2.get_vk_format(
            TextureFormat.BC7, TextureType.SNorm, ct.ColorSpace.Linear
        ) is None
        assert not is_format_valid(
            TextureFormat.R4G4, TextureType.SNorm, FileType.KTX2
        )
        assert is_format_valid(
            TextureFormat.BC7, TextureType.UNorm, FileType.KTX2
        )


class TestStructure:
    def test_bc1_mips(self):
        tex = _tex2d(TextureFormat.BC1_RGB, mips=True)
        res, data = tex.save_to_bytes(FileType.KTX2)
        assert res is SaveResult.Success
        p = parse_ktx2(data)
        assert p["vkformat"] == 131
        assert (p["w"], p["h"], p["d"]) == (16, 16, 0)
        assert p["layers"] == 0 and p["faces"] == 1
        assert p["levels"] == tex.mip_levels == 5
        assert p["scheme"] == 0 and p["sgd"] == (0, 0)
        # Level payloads: blocks * 8 bytes, offsets aligned to 8,
        # smallest mip first in the file.
        bs = block_size(TextureFormat.BC1_RGB)
        lcm = bs if bs % 4 == 0 else bs * (4 // (bs % 4 or 4))
        prev_off = None
        for level, (off, n, un) in enumerate(p["level_index"]):
            w = max(16 >> level, 1)
            blocks = ((w + 3) // 4) ** 2
            assert n == un == blocks * bs
            assert off % 8 == 0
            assert data[off : off + n] == tex.data(mip_level=level)
            if prev_off is not None:
                assert off < prev_off  # larger mips later in file
            prev_off = off
        # DFD: BC1A model 128, linear transfer, 4x4 block, 8 bytes/block.
        assert p["model"] == 128
        assert p["transfer"] == 1
        assert p["block_dims"] == (3, 3, 0, 0)
        assert p["bytes_plane0"] == 8
        assert len(p["samples"]) == 1
        assert p["samples"][0]["bits"] == 64
        assert p["kvd"]["KTXwriter"].startswith(b"cuttlefish_tpu")
        assert p["kvd"]["KTXorientation"] == b"rd\x00"

    def test_srgb_transfer_and_astc(self):
        tex = _tex2d(
            TextureFormat.ASTC_8x8, size=16, color_space=ct.ColorSpace.sRGB
        )
        res, data = tex.save_to_bytes(FileType.KTX2)
        assert res is SaveResult.Success
        p = parse_ktx2(data)
        assert p["vkformat"] == 172  # ASTC_8x8_SRGB_BLOCK
        assert p["transfer"] == 2
        assert p["model"] == 162
        assert p["block_dims"] == (7, 7, 0, 0)
        assert p["bytes_plane0"] == 16
        (off, n, _) = p["level_index"][0]
        assert n == 4 * 16  # 2x2 blocks of 16 B
        assert data[off : off + n] == tex.data()

    def test_uncompressed_rgba8(self):
        tex = _tex2d(TextureFormat.R8G8B8A8, size=6)
        res, data = tex.save_to_bytes(FileType.KTX2)
        assert res is SaveResult.Success
        p = parse_ktx2(data)
        assert p["vkformat"] == 37 and p["type_size"] == 1
        assert p["model"] == 1  # RGBSDA
        # Tightly packed (no KTX1 4-byte row padding): 6*6*4 bytes.
        (off, n, _) = p["level_index"][0]
        assert n == 6 * 6 * 4
        assert data[off : off + n] == tex.data()
        chans = [s["channel"] for s in p["samples"]]
        assert chans == [0, 1, 2, 15]
        assert all(s["bits"] == 8 for s in p["samples"])
        assert p["samples"][0]["upper"] == 255

    def test_array_and_cube(self):
        tex = _tex2d(TextureFormat.BC1_RGB, layers=3)
        res, data = tex.save_to_bytes(FileType.KTX2)
        assert res is SaveResult.Success
        p = parse_ktx2(data)
        assert p["layers"] == 3 and p["faces"] == 1
        (off, n, _) = p["level_index"][0]
        per = 16 * block_size(TextureFormat.BC1_RGB)
        assert n == per * 3
        assert data[off : off + per] == tex.data(depth=0)
        assert data[off + per : off + 2 * per] == tex.data(depth=1)

        rng = np.random.default_rng(3)
        cube = ct.Texture(ct.Dimension.Cube, 16, 16)
        for face in ct.CubeFace:
            cube.set_image(
                ct.Image.from_array(
                    rng.random((16, 16, 4), np.float32), ct.ImageFormat.RGBAF
                ),
                face=face,
            )
        assert cube.convert(
            TextureFormat.BC1_RGB, TextureType.UNorm, quality=ct.Quality.Lowest
        )
        res, data = cube.save_to_bytes(FileType.KTX2)
        assert res is SaveResult.Success
        p = parse_ktx2(data)
        assert p["faces"] == 6 and p["layers"] == 0
        (off, n, _) = p["level_index"][0]
        assert n == per * 6
        for f in range(6):
            assert (
                data[off + f * per : off + (f + 1) * per]
                == cube.data(ct.CubeFace(f))
            )

    def test_3d(self):
        rng = np.random.default_rng(5)
        tex = ct.Texture(ct.Dimension.Dim3D, 8, 8, depth=4)
        for z in range(4):
            tex.set_image(
                ct.Image.from_array(
                    rng.random((8, 8, 4), np.float32), ct.ImageFormat.RGBAF
                ),
                depth=z,
            )
        assert tex.convert(
            TextureFormat.R8G8B8A8, TextureType.UNorm, quality=ct.Quality.Lowest
        )
        res, data = tex.save_to_bytes(FileType.KTX2)
        assert res is SaveResult.Success
        p = parse_ktx2(data)
        assert p["d"] == 4 and p["layers"] == 0
        assert p["kvd"]["KTXorientation"] == b"rdi\x00"
        (off, n, _) = p["level_index"][0]
        assert n == 8 * 8 * 4 * 4
        assert data[off : off + 8 * 8 * 4] == tex.data(depth=0)

    def test_unsupported(self):
        tex = _tex2d(TextureFormat.R4G4)
        # R4G4 valid only in Linear; force sRGB by rebuilding.
        tex2 = _tex2d(TextureFormat.BC4, TextureType.SNorm)
        res, data = tex2.save_to_bytes(FileType.KTX2)
        assert res is SaveResult.Success  # BC4 SNorm is fine
        p = parse_ktx2(data)
        assert p["vkformat"] == 140
        assert p["samples"][0]["flags"] & 0x40  # SIGNED


def _decompressor(scheme: str):
    if scheme == "zlib":
        import zlib

        return zlib.decompress
    import zstandard

    return zstandard.ZstdDecompressor().decompress


class TestSupercompression:
    @pytest.mark.parametrize("scheme,scheme_id", [("zstd", 2), ("zlib", 3)])
    def test_round_trip(self, scheme, scheme_id):
        decompress = _decompressor(scheme)
        tex = _tex2d(TextureFormat.BC1_RGB, mips=True)
        res, plain = tex.save_to_bytes(FileType.KTX2)
        assert res is SaveResult.Success
        res, data = tex.save_to_bytes(FileType.KTX2, supercompression=scheme)
        assert res is SaveResult.Success
        p = parse_ktx2(data)
        q = parse_ktx2(plain)
        assert p["scheme"] == scheme_id and p["sgd"] == (0, 0)
        assert p["levels"] == q["levels"]
        prev_off = None
        for level, (off, n, un) in enumerate(p["level_index"]):
            raw = decompress(data[off : off + n])
            assert len(raw) == un
            poff, pn, pun = q["level_index"][level]
            assert un == pun == pn
            assert raw == plain[poff : poff + pn]
            if prev_off is not None:
                assert off < prev_off  # smallest mip still first in file
            prev_off = off

    def test_zlib_uncompressed_format(self):
        import zlib

        tex = _tex2d(TextureFormat.R8G8B8A8, size=8)
        res, data = tex.save_to_bytes(FileType.KTX2, supercompression="zlib")
        assert res is SaveResult.Success
        p = parse_ktx2(data)
        assert p["scheme"] == 3
        off, n, un = p["level_index"][0]
        assert un == 8 * 8 * 4
        assert zlib.decompress(data[off : off + n]) == tex.data()

    def test_unknown_scheme_rejected(self):
        tex = _tex2d(TextureFormat.R8G8B8A8, size=8)
        res, _ = tex.save_to_bytes(FileType.KTX2, supercompression="lz4")
        assert res is SaveResult.Unsupported

    def test_non_ktx2_rejected(self):
        tex = _tex2d(TextureFormat.R8G8B8A8, size=8)
        for ft in (FileType.DDS, FileType.KTX, FileType.PVR):
            res, _ = tex.save_to_bytes(ft, supercompression="zlib")
            assert res is SaveResult.Unsupported

    def test_cli_flag(self, tmp_path):
        import zlib

        import PIL.Image

        from cuttlefish_tpu.cli import run

        src = tmp_path / "in.png"
        rng = np.random.default_rng(13)
        PIL.Image.fromarray(rng.integers(0, 255, (8, 8, 4), np.uint8)).save(src)
        out = tmp_path / "out.ktx2"
        assert (
            run(["-i", str(src), "-f", "R8G8B8A8", "-o", str(out),
                 "--supercompression", "zlib"])
            == 0
        )
        p = parse_ktx2(out.read_bytes())
        assert p["scheme"] == 3
        off, n, un = p["level_index"][0]
        assert len(zlib.decompress(out.read_bytes()[off : off + n])) == un
        # Bad scheme and non-KTX2 target are both argument errors (exit 1/3).
        assert (
            run(["-i", str(src), "-f", "R8G8B8A8", "-o", str(out),
                 "--supercompression", "lz4"])
            == 1
        )
        assert (
            run(["-i", str(src), "-f", "R8G8B8A8",
                 "-o", str(tmp_path / "o.dds"), "--supercompression", "zlib"])
            == 3
        )


def test_extension_dispatch(tmp_path):
    assert file_type_for_name("x.ktx2") is FileType.KTX2
    assert file_type_for_name("x.KTX2") is FileType.KTX2
    assert file_type_for_name("x.ktx") is FileType.KTX
    tex = _tex2d(TextureFormat.R8G8B8A8, size=8)
    out = tmp_path / "t.ktx2"
    assert tex.save(str(out)) is SaveResult.Success
    assert out.read_bytes()[:12] == IDENT


def test_cli_ktx2(tmp_path):
    import PIL.Image

    from cuttlefish_tpu.cli import run

    src = tmp_path / "in.png"
    rng = np.random.default_rng(11)
    PIL.Image.fromarray(rng.integers(0, 255, (16, 16, 4), np.uint8)).save(src)
    out = tmp_path / "out.ktx2"
    assert run(["-i", str(src), "-f", "BC7", "-Q", "lowest", "-o", str(out)]) == 0
    assert out.read_bytes()[:12] == IDENT
    assert (
        run(
            ["-i", str(src), "-f", "BC7", "-Q", "lowest", "-o",
             str(tmp_path / "o2.bin"), "--file-format", "ktx2"]
        )
        == 0
    )
