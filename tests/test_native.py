"""Native C++ codec layer tests: parity against PIL and the numpy tiler."""

import io

import numpy as np
import pytest

from cuttlefish_tpu import native
from cuttlefish_tpu.convert.blocks import extract_blocks

pytestmark = pytest.mark.skipif(
    not native.available(), reason=f"native build failed: {native.load_error()}"
)


def _pil_png(arr, mode):
    import PIL.Image

    buf = io.BytesIO()
    PIL.Image.fromarray(arr, mode).save(buf, "PNG")
    return buf.getvalue()


class TestPngDecode:
    def test_rgba8(self):
        rng = np.random.default_rng(0)
        arr = (rng.random((13, 17, 4)) * 255).astype(np.uint8)
        dec, depth = native.png_decode(_pil_png(arr, "RGBA"))
        assert depth == 8
        assert np.array_equal(dec, arr)

    def test_rgb8(self):
        rng = np.random.default_rng(1)
        arr = (rng.random((8, 9, 3)) * 255).astype(np.uint8)
        dec, _ = native.png_decode(_pil_png(arr, "RGB"))
        assert np.array_equal(dec, arr)

    def test_gray8(self):
        rng = np.random.default_rng(2)
        arr = (rng.random((10, 11)) * 255).astype(np.uint8)
        dec, _ = native.png_decode(_pil_png(arr, "L"))
        assert np.array_equal(dec, arr)

    def test_gray16(self):
        rng = np.random.default_rng(3)
        arr = (rng.random((6, 7)) * 65535).astype(np.uint16)
        import PIL.Image

        buf = io.BytesIO()
        PIL.Image.fromarray(arr, "I;16").save(buf, "PNG")
        dec, depth = native.png_decode(buf.getvalue())
        assert depth == 16
        assert np.array_equal(dec, arr)

    def test_palette(self):
        import PIL.Image

        rng = np.random.default_rng(4)
        arr = (rng.random((12, 12, 3)) * 255).astype(np.uint8)
        img = PIL.Image.fromarray(arr, "RGB").quantize(colors=16)
        buf = io.BytesIO()
        img.save(buf, "PNG")
        dec, _ = native.png_decode(buf.getvalue())
        ref = np.asarray(img.convert("RGB"))
        assert np.array_equal(dec, ref)

    def test_garbage_rejected(self):
        with pytest.raises(ValueError):
            native.png_decode(b"not a png at all")


class TestPngEncode:
    @pytest.mark.parametrize("shape,mode", [((9, 9, 3), "RGB"), ((5, 6, 4), "RGBA")])
    def test_roundtrip_via_pil(self, shape, mode):
        import PIL.Image

        rng = np.random.default_rng(5)
        arr = (rng.random(shape) * 255).astype(np.uint8)
        data = native.png_encode(arr)
        back = np.asarray(PIL.Image.open(io.BytesIO(data)))
        assert np.array_equal(back, arr)

    def test_roundtrip_native(self):
        rng = np.random.default_rng(6)
        arr = (rng.random((7, 8, 4)) * 255).astype(np.uint8)
        dec, _ = native.png_decode(native.png_encode(arr))
        assert np.array_equal(dec, arr)

    def test_gray16_roundtrip(self):
        rng = np.random.default_rng(7)
        arr = (rng.random((5, 5)) * 65535).astype(np.uint16)
        dec, depth = native.png_decode(native.png_encode(arr))
        assert depth == 16
        assert np.array_equal(dec, arr)


class TestTga:
    def test_roundtrip(self):
        rng = np.random.default_rng(8)
        arr = (rng.random((9, 11, 4)) * 255).astype(np.uint8)
        dec = native.tga_decode(native.tga_encode(arr))
        assert np.array_equal(dec, arr)

    def test_pil_reads_ours(self):
        import PIL.Image

        rng = np.random.default_rng(9)
        arr = (rng.random((6, 6, 3)) * 255).astype(np.uint8)
        data = native.tga_encode(arr)
        back = np.asarray(PIL.Image.open(io.BytesIO(data)))
        assert np.array_equal(back, arr)


class TestBlocks:
    @pytest.mark.parametrize("h,w,bw,bh", [(20, 24, 4, 4), (17, 9, 6, 5), (8, 8, 8, 4)])
    def test_matches_numpy(self, h, w, bw, bh):
        rng = np.random.default_rng(10)
        surface = rng.random((h, w, 4)).astype(np.float32)
        a, nbx_a, nby_a = extract_blocks(surface, bw, bh)
        b, nbx_b, nby_b = native.extract_blocks(surface, bw, bh)
        assert (nbx_a, nby_a) == (nbx_b, nby_b)
        assert np.array_equal(a, b)


class TestLoaderIntegration:
    def test_image_load_uses_native_png(self, tmp_path):
        import PIL.Image

        from cuttlefish_tpu.image import Image, ImageFormat

        rng = np.random.default_rng(11)
        arr = (rng.random((16, 16, 4)) * 255).astype(np.uint8)
        p = str(tmp_path / "t.png")
        PIL.Image.fromarray(arr, "RGBA").save(p)
        img = Image(p)
        assert img.valid and img.format is ImageFormat.RGBA8
        assert np.array_equal(img.array, arr)


class TestQualityVsCpuReference:
    """North-star quality check (BASELINE.md): the TPU-path encoder must
    score >= the independent reference-class CPU encoder (bc7enc "basic"
    algorithm family: mode 6 + mode 1, full partition screening, LS
    refinement) at the same quality setting on the same content."""

    @pytest.mark.parametrize(
        "quality",
        [2, pytest.param(4, marks=pytest.mark.slow)],
    )
    def test_bc7_psnr_not_below_cpu_reference(self, quality):
        from cuttlefish_tpu.decode import decode_bc7
        from cuttlefish_tpu.kernels.bc7 import encode_bc7

        rng = np.random.default_rng(42)
        n = 256
        # Two-color-lerp blocks + noise: representative texture content.
        c0 = rng.random((n, 1, 4), np.float32)
        c1 = rng.random((n, 1, 4), np.float32)
        t = rng.random((n, 16, 1), np.float32)
        blocks = np.clip(
            c0 + (c1 - c0) * t
            + rng.normal(0, 0.02, (n, 16, 4)).astype(np.float32),
            0, 1,
        ).astype(np.float32)
        ref = np.clip(np.round(blocks * 255), 0, 255)

        def psnr(words):
            raw = np.frombuffer(
                np.ascontiguousarray(
                    np.asarray(words).astype("<u4")
                ).tobytes(),
                np.uint8,
            )
            dec = decode_bc7(raw).astype(np.float64)
            mse = ((dec - ref) ** 2).mean()
            return 10 * np.log10(255.0**2 / mse)

        p_tpu = psnr(encode_bc7(blocks, quality=quality))
        p_cpu = psnr(native.bc7_encode_cpu(blocks, quality))
        assert p_tpu >= p_cpu - 1e-6, (p_tpu, p_cpu)


class TestJpegDecode:
    """Native baseline JPEG decoder vs PIL/libjpeg (external oracle).

    JPEG permits small per-sample IDCT variance, so parity is asserted
    within +/-3 LSB; the fancy (triangular) chroma upsampling matches
    libjpeg's jdsample.c exactly, so subsampled images carry no extra
    error beyond the IDCT class.
    """

    def _roundtrip(self, arr, maxdiff, **save_kw):
        import PIL.Image

        buf = io.BytesIO()
        PIL.Image.fromarray(arr).save(buf, "JPEG", **save_kw)
        data = buf.getvalue()
        ours = native.jpeg_decode(data)
        img = PIL.Image.open(io.BytesIO(data))
        if ours.ndim == 3:
            img = img.convert("RGB")
        ref = np.asarray(img).astype(int)
        d = np.abs(ours.astype(int) - ref)
        assert ours.shape == ref.shape
        assert d.max() <= maxdiff, d.max()

    @pytest.mark.parametrize("subsampling", [0, 1, 2])
    def test_rgb_vs_pil(self, subsampling):
        x, y = np.meshgrid(np.linspace(0, 1, 97), np.linspace(0, 1, 64))
        img = np.stack(
            [0.5 + 0.5 * np.sin(6 * x), 0.5 + 0.5 * np.cos(5 * y + x), x * y],
            -1,
        )
        arr = (img * 255).astype(np.uint8)
        self._roundtrip(arr, 3, quality=92, subsampling=subsampling)

    def test_odd_size_420(self):
        rng = np.random.default_rng(1)
        arr = (rng.random((63, 95, 3)) * 255).astype(np.uint8)
        self._roundtrip(arr, 4, quality=85, subsampling=2)

    def test_grayscale(self):
        # No chroma path: differences are pure IDCT rounding (<= 1 LSB).
        import PIL.Image

        rng = np.random.default_rng(2)
        arr = (rng.random((40, 52)) * 255).astype(np.uint8)
        buf = io.BytesIO()
        PIL.Image.fromarray(arr, "L").save(buf, "JPEG", quality=90)
        ours = native.jpeg_decode(buf.getvalue())
        ref = np.asarray(PIL.Image.open(buf)).astype(int)
        assert np.abs(ours.astype(int) - ref).max() <= 1

    def test_progressive_raises(self):
        import PIL.Image

        arr = np.zeros((16, 16, 3), np.uint8)
        buf = io.BytesIO()
        PIL.Image.fromarray(arr).save(buf, "JPEG", progressive=True)
        with pytest.raises(ValueError):
            native.jpeg_decode(buf.getvalue())

    def test_loader_uses_native_and_pil_fallback(self):
        import PIL.Image

        from cuttlefish_tpu.image import codecs

        arr = np.full((24, 24, 3), 128, np.uint8)
        for progressive in (False, True):
            buf = io.BytesIO()
            PIL.Image.fromarray(arr).save(
                buf, "JPEG", quality=95, progressive=progressive
            )
            decoded, fmt = codecs.load(buf.getvalue())
            assert decoded.shape == (24, 24, 3)
            assert np.abs(decoded.astype(int) - 128).max() <= 2


class TestGifDecode:
    """Native GIF decoder vs PIL (the independent oracle): palettes,
    interlace, transparency — the FreeImage long-tail analog
    (native/src/extracodecs.cpp)."""

    @staticmethod
    def _gif_bytes(img, **save):
        buf = io.BytesIO()
        img.save(buf, format="GIF", **save)
        return buf.getvalue()

    def test_palette_gif_matches_pil(self):
        import PIL.Image

        rng = np.random.default_rng(0)
        arr = rng.integers(0, 255, (37, 53, 3)).astype(np.uint8)
        data = self._gif_bytes(
            PIL.Image.fromarray(arr).convert(
                "P", palette=PIL.Image.Palette.ADAPTIVE
            )
        )
        ours = native.gif_decode(data)
        ref = np.asarray(PIL.Image.open(io.BytesIO(data)).convert("RGB"))
        assert np.array_equal(ours, ref)

    def test_interlaced_gif_matches_pil(self):
        import PIL.Image

        rng = np.random.default_rng(1)
        arr = rng.integers(0, 255, (29, 31, 3)).astype(np.uint8)
        data = self._gif_bytes(PIL.Image.fromarray(arr), interlace=True)
        ours = native.gif_decode(data)
        ref = np.asarray(PIL.Image.open(io.BytesIO(data)).convert("RGB"))
        assert np.array_equal(ours, ref)

    def test_transparent_gif_matches_pil(self):
        import PIL.Image

        arr = np.zeros((16, 16, 3), np.uint8)
        arr[::2] = (255, 0, 0)
        arr[:, ::3] = (0, 255, 0)
        pimg = PIL.Image.fromarray(arr).convert(
            "P", palette=PIL.Image.Palette.ADAPTIVE
        )
        data = self._gif_bytes(pimg, transparency=0)
        ours = native.gif_decode(data)
        assert ours.shape[-1] == 4
        ref = np.asarray(PIL.Image.open(io.BytesIO(data)).convert("RGBA"))
        assert np.array_equal(ours[..., 3], ref[..., 3])
        m = ours[..., 3] > 0
        assert np.array_equal(ours[m], ref[m])

    def test_gif_through_image_load(self):
        import PIL.Image

        from cuttlefish_tpu.image import codecs

        rng = np.random.default_rng(2)
        arr = rng.integers(0, 255, (20, 24, 3)).astype(np.uint8)
        data = self._gif_bytes(
            PIL.Image.fromarray(arr).convert(
                "P", palette=PIL.Image.Palette.ADAPTIVE
            )
        )
        decoded, fmt = codecs.load(data)
        ref = np.asarray(PIL.Image.open(io.BytesIO(data)).convert("RGB"))
        assert np.array_equal(decoded, ref)


class TestTiffDecode:
    """Native baseline-TIFF decoder vs PIL: strips, none/PackBits/LZW
    (+ horizontal predictor), 8/16-bit, gray/RGB/RGBA."""

    @staticmethod
    def _tiff_bytes(arr, **save):
        import PIL.Image

        buf = io.BytesIO()
        PIL.Image.fromarray(arr).save(buf, format="TIFF", **save)
        return buf.getvalue()

    @pytest.mark.parametrize(
        "comp", [None, "packbits", "tiff_lzw"]
    )
    def test_rgb_compressions_match_pil(self, comp):
        import PIL.Image

        rng = np.random.default_rng(3)
        # smooth content exercises the LZW horizontal predictor
        arr = np.clip(
            np.cumsum(rng.integers(-3, 4, (48, 52, 3)), axis=1) + 128,
            0, 255,
        ).astype(np.uint8)
        kw = {"compression": comp} if comp else {}
        data = self._tiff_bytes(arr, **kw)
        ours, depth = native.tiff_decode(data)
        ref = np.asarray(PIL.Image.open(io.BytesIO(data)))
        assert depth == 8
        assert np.array_equal(ours, ref)

    def test_rgba_and_gray_match_pil(self):
        import PIL.Image

        rng = np.random.default_rng(4)
        rgba = rng.integers(0, 255, (33, 47, 4)).astype(np.uint8)
        data = self._tiff_bytes(rgba, compression="tiff_lzw")
        ours, _ = native.tiff_decode(data)
        assert np.array_equal(
            ours, np.asarray(PIL.Image.open(io.BytesIO(data)))
        )
        gray = rng.integers(0, 255, (40, 40)).astype(np.uint8)
        data = self._tiff_bytes(gray, compression="packbits")
        ours, _ = native.tiff_decode(data)
        assert np.array_equal(
            ours, np.asarray(PIL.Image.open(io.BytesIO(data)))
        )

    def test_gray16_matches_pil(self):
        import PIL.Image

        rng = np.random.default_rng(5)
        arr = rng.integers(0, 65535, (21, 19)).astype(np.uint16)
        buf = io.BytesIO()
        PIL.Image.fromarray(arr).save(buf, format="TIFF")
        data = buf.getvalue()
        ours, depth = native.tiff_decode(data)
        assert depth == 16
        assert np.array_equal(
            ours, np.asarray(PIL.Image.open(io.BytesIO(data)))
        )

    def test_tiff_through_image_load(self):
        import PIL.Image

        from cuttlefish_tpu.image import codecs

        rng = np.random.default_rng(6)
        arr = rng.integers(0, 255, (20, 24, 3)).astype(np.uint8)
        data = self._tiff_bytes(arr, compression="tiff_lzw")
        decoded, fmt = codecs.load(data)
        assert np.array_equal(decoded, arr)
