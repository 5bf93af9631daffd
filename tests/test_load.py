"""Container loader round-trips (containers/load.py) and surface decode.

Every loader is the enumeration-inverse of its writer, so the contract
tested here is: save -> load preserves metadata and surface bytes, and
load -> save reproduces the original container byte-for-byte.
"""

import io

import numpy as np
import pytest

import cuttlefish_tpu as ct


def _image(w, h, seed=0):
    rng = np.random.default_rng(seed)
    arr = rng.random((h, w, 4), np.float32)
    return ct.Image.from_array(arr, ct.ImageFormat.RGBAF), arr


def _texture(fmt, type_=ct.TextureType.UNorm, w=16, h=16, mips=False,
             layers=0, quality=ct.Quality.Lowest):
    tex = ct.Texture(ct.Dimension.Dim2D, w, h, depth=layers)
    img, _ = _image(w, h)
    for d in range(max(layers, 1)):
        assert tex.set_image(img, depth=d)
    if mips:
        assert tex.generate_mipmaps()
    assert tex.convert(fmt, type_, quality=quality)
    return tex


def _roundtrip(tex, file_type, **save_kw):
    res, blob = tex.save_to_bytes(file_type, **save_kw)
    assert res is ct.SaveResult.Success
    loaded = ct.load_texture(blob)
    # Re-save must reproduce the container byte-for-byte.
    res2, blob2 = loaded.save_to_bytes(file_type, **save_kw)
    assert res2 is ct.SaveResult.Success
    assert blob2 == blob
    return loaded


def test_dds_roundtrip_bc1():
    tex = _texture(ct.TextureFormat.BC1_RGB, mips=True)
    loaded = _roundtrip(tex, ct.FileType.DDS)
    assert loaded.format is ct.TextureFormat.BC1_RGB
    assert loaded.type is ct.TextureType.UNorm
    assert loaded.mip_levels == tex.mip_levels
    for mip in range(tex.mip_levels):
        assert loaded.data(mip_level=mip) == tex.data(mip_level=mip)


def test_dds_roundtrip_cube():
    tex = ct.Texture(ct.Dimension.Cube, 16, 16)
    img, _ = _image(16, 16)
    for face in ct.CubeFace:
        assert tex.set_image(img, face=face)
    assert tex.convert(ct.TextureFormat.BC7, quality=ct.Quality.Lowest)
    loaded = _roundtrip(tex, ct.FileType.DDS)
    assert loaded.dimension is ct.Dimension.Cube
    assert loaded.faces == 6
    for face in ct.CubeFace:
        assert loaded.data(face) == tex.data(face)


def test_dds_roundtrip_array_uncompressed():
    tex = _texture(ct.TextureFormat.R8G8B8A8, layers=3)
    loaded = _roundtrip(tex, ct.FileType.DDS)
    assert loaded.is_array and loaded.depth() == 3
    for d in range(3):
        assert loaded.data(depth=d) == tex.data(depth=d)


def test_ktx_roundtrip_uncompressed_row_padding():
    # 15x7 RGB8 rows are 45 bytes -> padded to 48 in the container; the
    # loader must strip the padding back out.
    tex = _texture(ct.TextureFormat.R8G8B8, w=15, h=7)
    loaded = _roundtrip(tex, ct.FileType.KTX)
    assert loaded.format is ct.TextureFormat.R8G8B8
    assert loaded.data() == tex.data()


def test_ktx_roundtrip_etc2_mips():
    tex = _texture(ct.TextureFormat.ETC2_R8G8B8, mips=True)
    loaded = _roundtrip(tex, ct.FileType.KTX)
    for mip in range(tex.mip_levels):
        assert loaded.data(mip_level=mip) == tex.data(mip_level=mip)


@pytest.mark.parametrize("scheme", ["none", "zlib", "zstd"])
def test_ktx2_roundtrip_supercompression(scheme):
    tex = _texture(ct.TextureFormat.BC4, mips=True)
    try:
        loaded = _roundtrip(tex, ct.FileType.KTX2, supercompression=scheme)
    except ct.LoadError:
        pytest.skip("zstandard missing")
    assert loaded.format is ct.TextureFormat.BC4
    for mip in range(tex.mip_levels):
        assert loaded.data(mip_level=mip) == tex.data(mip_level=mip)


def test_pvr_roundtrip_bc1a_metadata():
    tex = _texture(ct.TextureFormat.BC1_RGBA)
    loaded = _roundtrip(tex, ct.FileType.PVR)
    assert loaded.format is ct.TextureFormat.BC1_RGBA
    tex_rgb = _texture(ct.TextureFormat.BC1_RGB)
    assert ct.load_texture(
        tex_rgb.save_to_bytes(ct.FileType.PVR)[1]
    ).format is ct.TextureFormat.BC1_RGB


def test_pvr_roundtrip_array():
    tex = _texture(ct.TextureFormat.EAC_R11, layers=2)
    loaded = _roundtrip(tex, ct.FileType.PVR)
    assert loaded.is_array and loaded.depth() == 2
    assert loaded.data(depth=1) == tex.data(depth=1)


def test_load_auto_sniffing_and_errors(tmp_path):
    tex = _texture(ct.TextureFormat.R8G8B8A8)
    for ft in (ct.FileType.DDS, ct.FileType.KTX, ct.FileType.PVR,
               ct.FileType.KTX2):
        blob = tex.save_to_bytes(ft)[1]
        assert ct.load_texture(blob).format is ct.TextureFormat.R8G8B8A8
    path = tmp_path / "t.dds"
    assert tex.save(path) is ct.SaveResult.Success
    assert ct.load_texture(path).format is ct.TextureFormat.R8G8B8A8
    with pytest.raises(ct.LoadError):
        ct.load_texture(b"not a container at all")


def test_decode_image_uncompressed_exact():
    tex = ct.Texture(ct.Dimension.Dim2D, 9, 5)
    img, arr = _image(9, 5)
    assert tex.set_image(img)
    assert tex.convert(ct.TextureFormat.R8G8B8A8)
    dec = tex.decode_image()
    expect = np.round(np.clip(arr, 0, 1) * 255.0) / 255.0
    assert np.allclose(dec.array, expect, atol=1e-6)


def test_decode_image_packed565():
    tex = ct.Texture(ct.Dimension.Dim2D, 8, 8)
    img, arr = _image(8, 8)
    assert tex.set_image(img)
    assert tex.convert(ct.TextureFormat.R5G6B5)
    dec = tex.decode_image().array
    assert np.all(np.abs(dec[..., :3] - arr[..., :3]) <= 0.5 / 31.0 + 1e-6)
    assert np.all(dec[..., 3] == 1.0)


def test_decode_image_bc1_quality():
    tex = ct.Texture(ct.Dimension.Dim2D, 16, 16)
    rng = np.random.default_rng(3)
    base = rng.random((1, 1, 4)).astype(np.float32)
    arr = np.clip(
        base + rng.normal(0, 0.03, (16, 16, 4)).astype(np.float32), 0, 1
    )
    arr[..., 3] = 1.0
    assert tex.set_image(ct.Image.from_array(arr, ct.ImageFormat.RGBAF))
    assert tex.convert(ct.TextureFormat.BC1_RGB, quality=ct.Quality.Lowest)
    dec = tex.decode_image().array
    mse = float(np.mean((dec[..., :3] - arr[..., :3]) ** 2))
    assert 10 * np.log10(1.0 / (mse + 1e-12)) > 30.0


def test_decode_image_loaded_from_container():
    tex = _texture(ct.TextureFormat.BC3, quality=ct.Quality.Low)
    blob = tex.save_to_bytes(ct.FileType.KTX)[1]
    loaded = ct.load_texture(blob)
    a = tex.decode_image().array
    b = loaded.decode_image().array
    assert np.array_equal(a, b)


def test_image_load_reads_containers(tmp_path):
    """Containers work as image inputs (FreeImage reads DDS/KTX in the
    reference, Image.cpp:870-880): Image(path) decodes level 0 -> RGBAF,
    so the whole CLI pipeline can transcode from a container."""
    tex = _texture(ct.TextureFormat.BC1_RGB, w=16, h=16)
    path = tmp_path / "t.dds"
    assert tex.save(path) is ct.SaveResult.Success
    img = ct.Image(str(path))
    assert img.valid and img.format is ct.ImageFormat.RGBAF
    assert (img.width, img.height) == (16, 16)
    assert np.array_equal(img.array, tex.decode_image().array)


@pytest.mark.parametrize(
    "ft", [ct.FileType.DDS, ct.FileType.KTX, ct.FileType.PVR]
)
def test_3d_texture_roundtrip(ft):
    """3D textures use per-container surface orders (DDS element->face->
    mip->volume with per-level depth; KTX/PVR mip->depth->face)."""
    tex = ct.Texture(ct.Dimension.Dim3D, 16, 16, depth=4)
    rng = np.random.default_rng(9)
    for d in range(4):
        arr = rng.random((16, 16, 4), np.float32)
        assert tex.set_image(
            ct.Image.from_array(arr, ct.ImageFormat.RGBAF), depth=d
        )
    assert tex.generate_mipmaps()
    assert tex.convert(ct.TextureFormat.R8G8B8A8)
    loaded = _roundtrip(tex, ft)
    assert loaded.dimension is ct.Dimension.Dim3D
    assert loaded.mip_levels == tex.mip_levels
    for mip in range(tex.mip_levels):
        for d in range(tex.depth(mip)):
            assert loaded.data(mip_level=mip, depth=d) == tex.data(
                mip_level=mip, depth=d
            ), (ft, mip, d)


def test_cli_texture_info_and_container_input(tmp_path, capsys):
    """--texture-info prints container metadata; a container path as -i
    input transcodes through the normal CLI pipeline."""
    from cuttlefish_tpu.cli import run

    tex = _texture(ct.TextureFormat.BC1_RGB, w=16, h=16, mips=True)
    src = tmp_path / "in.dds"
    assert tex.save(src) is ct.SaveResult.Success

    assert run(["--texture-info", str(src)]) == 0
    out = capsys.readouterr().out
    assert "BC1_RGB" in out and "mip levels: 5" in out
    assert run(["--texture-info", str(tmp_path / "missing.dds")]) == 2

    dst = tmp_path / "out.ktx"
    assert run(["-i", str(src), "-f", "ETC1", "-o", str(dst)]) == 0
    loaded = ct.load_texture(dst)
    assert loaded.format is ct.TextureFormat.ETC1


def _valid_combos():
    """Every (format, type) the converter accepts, skipping UFloat ASTC
    (HDR compiles are heavy; covered by test_astc) and keeping one type
    per format to bound runtime."""
    out = []
    for fmt in ct.TextureFormat:
        if fmt is ct.TextureFormat.Unknown:
            continue
        for t in (ct.TextureType.UNorm, ct.TextureType.SNorm,
                  ct.TextureType.UInt, ct.TextureType.Int,
                  ct.TextureType.Float, ct.TextureType.UFloat):
            if ct.is_format_valid(fmt, t):
                if fmt.name.startswith("ASTC_") and t is ct.TextureType.UFloat:
                    continue
                out.append((fmt, t))
                break
    return out


@pytest.mark.slow
def test_every_format_roundtrips_through_containers():
    """For every (format, type): convert at Lowest quality, then for every
    container that accepts it, save -> load -> byte-equal data -> re-save
    byte-equal container; decode_image must succeed for every format."""
    from cuttlefish_tpu.containers.dds import is_valid_for_dds
    from cuttlefish_tpu.containers.ktx import is_valid_for_ktx
    from cuttlefish_tpu.containers.ktx2 import is_valid_for_ktx2
    from cuttlefish_tpu.containers.pvr import is_valid_for_pvr

    validity = [
        (ct.FileType.DDS, is_valid_for_dds),
        (ct.FileType.KTX, is_valid_for_ktx),
        (ct.FileType.KTX2, is_valid_for_ktx2),
        (ct.FileType.PVR, is_valid_for_pvr),
    ]
    rng = np.random.default_rng(7)
    for fmt, t in _valid_combos():
        w = h = max(ct.min_width(fmt), ct.min_height(fmt), 16)
        tex = ct.Texture(ct.Dimension.Dim2D, w, h)
        arr = rng.random((h, w, 4), np.float32)
        if t in (ct.TextureType.SNorm, ct.TextureType.Float):
            arr = arr * 2.0 - 1.0
        elif t in (ct.TextureType.UInt, ct.TextureType.Int):
            arr = np.round(arr * 100)
        assert tex.set_image(ct.Image.from_array(arr, ct.ImageFormat.RGBAF))
        assert tex.convert(fmt, t, quality=ct.Quality.Lowest), (fmt, t)
        dec = tex.decode_image()
        assert dec is not None and dec.array.shape == (h, w, 4), (fmt, t)
        for ft, valid in validity:
            if not valid(fmt, t):
                continue
            res, blob = tex.save_to_bytes(ft)
            assert res is ct.SaveResult.Success, (fmt, t, ft)
            loaded = ct.load_texture(blob)
            assert loaded.data() == tex.data(), (fmt, t, ft)
            if loaded.format is fmt and loaded.type is t:
                # Byte-exact re-save, except where the container cannot
                # represent the distinction (e.g. DDS BC1 RGB vs RGBA
                # share a DXGI code and the loader picks one).
                res2, blob2 = loaded.save_to_bytes(ft)
                assert (res2, blob2) == (ct.SaveResult.Success, blob), (
                    fmt, t, ft,
                )


@pytest.mark.parametrize(
    "fmt,quality",
    [
        (ct.TextureFormat.R8G8B8A8, None),
        (ct.TextureFormat.BC1_RGB, ct.Quality.Lowest),
    ],
)
@pytest.mark.parametrize(
    "file_type",
    [ct.FileType.DDS, ct.FileType.KTX, ct.FileType.KTX2, ct.FileType.PVR],
)
def test_1d_texture_roundtrip(fmt, quality, file_type):
    """Dim1D end-to-end through every writer: save -> load -> byte-identical
    re-save, with mips, compressed + uncompressed (VERDICT r3 item 7).
    Height semantics per writer: DDS TEXTURE1D resourceDimension, KTX/KTX2
    height 0 (SaveKtx.cpp:1207-1220), PVR 'DIM1' CTFS metadata."""
    rng = np.random.default_rng(11)
    arr = rng.random((1, 32, 4), np.float32)
    img = ct.Image.from_array(arr, ct.ImageFormat.RGBAF)
    tex = ct.Texture(ct.Dimension.Dim1D, 32, 1)
    assert tex.set_image(img)
    assert tex.generate_mipmaps()
    kw = {} if quality is None else {"quality": quality}
    assert tex.convert(fmt, ct.TextureType.UNorm, **kw)
    assert tex.mip_levels == 6  # 32 -> 1

    loaded = _roundtrip(tex, file_type)
    assert loaded.dimension is ct.Dimension.Dim1D
    assert (loaded.width(), loaded.height()) == (32, 1)
    assert loaded.mip_levels == tex.mip_levels
    for mip in range(tex.mip_levels):
        assert loaded.data(mip_level=mip) == tex.data(mip_level=mip)


class TestIcoPsd:
    """Built-in ICO / PSD ingest vs PIL (codecs.decode_ico/_psd)."""

    def test_ico_png_entry_matches_pil(self):
        import io

        import PIL.Image

        from cuttlefish_tpu.image import codecs

        rng = np.random.default_rng(0)
        arr = rng.integers(0, 255, (32, 32, 4)).astype(np.uint8)
        buf = io.BytesIO()
        PIL.Image.fromarray(arr).save(buf, format="ICO")
        dec, fmt = codecs.load(buf.getvalue())
        ref = np.asarray(
            PIL.Image.open(io.BytesIO(buf.getvalue())).convert("RGBA")
        )
        assert np.array_equal(np.asarray(dec), ref)

    def test_ico_bmp_dib_entry(self):
        import struct

        from cuttlefish_tpu.image import codecs
        from cuttlefish_tpu.image.format import ImageFormat

        # Hand-built 4x2 32-bpp DIB entry (BGRA bottom-up + AND mask).
        w, h = 4, 2
        px = np.arange(w * h * 4, dtype=np.uint8).reshape(h, w, 4)
        # BITMAPINFOHEADER: 20 packed bytes + 20 zero bytes = biSize 40
        dib = struct.pack("<IiihHI", 40, w, h * 2, 1, 32, 0) + b"\x00" * 20
        for y in range(h - 1, -1, -1):  # bottom-up rows
            row = px[y][:, [2, 1, 0, 3]]  # RGBA -> BGRA
            dib += row.tobytes()
        dib += b"\x00" * 4 * h  # AND mask (ignored at 32 bpp)
        entry_off = 6 + 16
        data = (
            b"\x00\x00\x01\x00\x01\x00"
            + struct.pack(
                "<BBBBHHII", w, h, 0, 0, 1, 32, len(dib), entry_off
            )
            + dib
        )
        dec, fmt = codecs.load(data)
        assert fmt is ImageFormat.RGBA8
        assert np.array_equal(np.asarray(dec), px)

    @staticmethod
    def _psd_bytes(a, comp):
        import struct

        h, w = a.shape[:2]
        nch = a.shape[2]
        hdr = (
            b"8BPS"
            + struct.pack(">H", 1)
            + b"\x00" * 6
            + struct.pack(">HIIHH", nch, h, w, 8, 3)
        )
        body = hdr + struct.pack(">I", 0) * 3
        planes = [a[..., c].tobytes() for c in range(nch)]
        if comp == 0:
            return body + struct.pack(">H", 0) + b"".join(planes)
        rows = []
        lens = []
        for c in range(nch):
            for y in range(h):
                row = a[y, :, c].tobytes()
                enc = b""
                i = 0
                while i < len(row):
                    chunk = row[i : i + 128]
                    enc += bytes([len(chunk) - 1]) + chunk
                    i += len(chunk)
                rows.append(enc)
                lens.append(len(enc))
        return (
            body
            + struct.pack(">H", 1)
            + b"".join(struct.pack(">H", ln) for ln in lens)
            + b"".join(rows)
        )

    @pytest.mark.parametrize("comp", [0, 1])
    def test_psd_rgb_matches_pil(self, comp):
        import io

        import PIL.Image

        from cuttlefish_tpu.image import codecs

        rng = np.random.default_rng(comp)
        a = rng.integers(0, 255, (21, 17, 3)).astype(np.uint8)
        data = self._psd_bytes(a, comp)
        dec, fmt = codecs.load(data)
        ref = np.asarray(PIL.Image.open(io.BytesIO(data)))
        assert np.array_equal(np.asarray(dec), ref)

    def test_psd_rgba(self):
        from cuttlefish_tpu.image import codecs
        from cuttlefish_tpu.image.format import ImageFormat

        rng = np.random.default_rng(9)
        a = rng.integers(0, 255, (12, 15, 4)).astype(np.uint8)
        dec, fmt = codecs.load(self._psd_bytes(a, 1))
        assert fmt is ImageFormat.RGBA8
        assert np.array_equal(np.asarray(dec), a)


class TestWebpLossless:
    """Built-in VP8L decoder vs PIL (lossless -> byte equality IS the
    spec); lossy VP8 falls through to PIL."""

    @staticmethod
    def _webp(arr, **save):
        import io

        import PIL.Image

        buf = io.BytesIO()
        PIL.Image.fromarray(arr).save(
            buf, format="WEBP", lossless=True, **save
        )
        return buf.getvalue()

    @pytest.mark.parametrize("method", [0, 4, 6])
    def test_photo_matches_pil(self, method):
        import io

        import PIL.Image

        from cuttlefish_tpu.image import webp

        rng = np.random.default_rng(method)
        arr = np.clip(
            np.cumsum(rng.integers(-4, 5, (48, 56, 3)), axis=0)
            .cumsum(axis=1) // 8 + 128,
            0, 255,
        ).astype(np.uint8)
        data = self._webp(arr, method=method)
        ours = webp.decode_webp_lossless(data)
        ref = np.asarray(PIL.Image.open(io.BytesIO(data)).convert("RGBA"))
        assert np.array_equal(ours, ref)

    def test_rgba_and_palette_match_pil(self):
        import io

        import PIL.Image

        from cuttlefish_tpu.image import webp

        rng = np.random.default_rng(7)
        rgba = rng.integers(0, 255, (16, 16, 4)).astype(np.uint8)
        data = self._webp(rgba)
        ours = webp.decode_webp_lossless(data)
        assert np.array_equal(
            ours,
            np.asarray(PIL.Image.open(io.BytesIO(data)).convert("RGBA")),
        )
        pal = np.zeros((24, 24, 3), np.uint8)
        pal[::2] = (255, 0, 0)
        pal[:, ::3] = (0, 255, 0)
        data = self._webp(pal)
        ours = webp.decode_webp_lossless(data)
        assert np.array_equal(
            ours,
            np.asarray(PIL.Image.open(io.BytesIO(data)).convert("RGBA")),
        )

    def test_webp_through_image_load(self):
        from cuttlefish_tpu.image import codecs
        from cuttlefish_tpu.image.format import ImageFormat

        rng = np.random.default_rng(8)
        arr = rng.integers(0, 255, (20, 24, 3)).astype(np.uint8)
        dec, fmt = codecs.load(self._webp(arr))
        assert fmt is ImageFormat.RGBA8
        assert np.array_equal(np.asarray(dec)[..., :3], arr)
        assert (np.asarray(dec)[..., 3] == 255).all()
