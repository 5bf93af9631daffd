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
