"""BC6H and BC7 encoder tests: decode parity, quality floors, pipeline."""

import numpy as np
import pytest

from cuttlefish_tpu.convert import EncodeParams, create_converter
from cuttlefish_tpu.decode.bc6h import decode_bc6h_f32
from cuttlefish_tpu.decode.bc7 import decode_bc7
from cuttlefish_tpu.formats import ColorSpace, Quality, TextureFormat, TextureType
from cuttlefish_tpu.kernels import bc6h, bc7

pytestmark = pytest.mark.slow  # heavy jit compiles; core loop runs -m 'not slow'

_F = TextureFormat
_T = TextureType


def _bytes(words):
    w = np.ascontiguousarray(np.asarray(words).astype("<u4"))
    return w.view(np.uint8).reshape(w.shape[0], -1)


def _psnr(a, b):
    mse = np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2)
    return np.inf if mse == 0 else 10 * np.log10(1.0 / mse)


def _smooth_blocks(n, rng, alpha=None):
    c0 = rng.random((n, 1, 4), np.float32)
    c1 = rng.random((n, 1, 4), np.float32)
    t = rng.random((n, 16, 1), np.float32)
    blocks = c0 * t + c1 * (1 - t)
    blocks[..., 3] = 1.0 if alpha is None else alpha
    return blocks


class TestBc7:
    def test_solid_near_exact(self):
        solid = np.tile(np.array([[0.2, 0.6, 0.9, 0.7]], np.float32), (4, 16, 1))
        dec = decode_bc7(_bytes(bc7.encode_bc7(solid, quality=2)))
        assert np.abs(dec / 255.0 - solid).max() < 3.0 / 255.0

    def test_opaque_quality(self):
        rng = np.random.default_rng(1)
        blocks = _smooth_blocks(64, rng)
        dec = decode_bc7(_bytes(bc7.encode_bc7(blocks, quality=2)))
        # BC7 mode 6 (4-bit indices, 8-bit endpoints) should land well above
        # BC1 on the same content (~31 dB).
        assert _psnr(dec / 255.0, blocks) > 40

    def test_partition_two_color_exact(self):
        # A block split per 2-subset partition 0 recovers both colors.
        pat = np.array([0, 0, 1, 1] * 4)
        block = np.zeros((1, 16, 4), np.float32)
        block[0, pat == 0] = [1, 0, 0, 1]
        block[0, pat == 1] = [0, 0, 1, 1]
        dec = decode_bc7(_bytes(bc7.encode_bc7(block, quality=2)))
        assert _psnr(dec / 255.0, block) > 55

    def test_alpha_blocks_use_alpha_modes(self):
        rng = np.random.default_rng(2)
        blocks = _smooth_blocks(
            32, rng, alpha=np.linspace(0.2, 0.9, 16, dtype=np.float32)[None, :]
        )
        dec = decode_bc7(_bytes(bc7.encode_bc7(blocks, quality=2)))
        # Mode 4's 3-bit alpha indices reach ~29.5 dB on a 0.2-0.9 ramp.
        assert _psnr(dec[..., 3] / 255.0, blocks[..., 3]) > 28

    def test_quality_monotone(self):
        # q0 vs q3 (q4's all-modes+rotations graph is a >10 min CPU compile;
        # it is exercised on real TPU in the verify sweep).
        rng = np.random.default_rng(3)
        blocks = rng.random((64, 16, 4), np.float32)
        errs = []
        for q in (0, 3):
            dec = decode_bc7(_bytes(bc7.encode_bc7(blocks, quality=q)))
            errs.append(np.mean((dec / 255.0 - blocks) ** 2))
        assert errs[1] <= errs[0] + 1e-9

    def test_rotations_roundtrip(self):
        # Modes 4/5 with rotations 0-3 decode exactly (channel swap undone).
        import jax.numpy as jnp
        from cuttlefish_tpu.kernels.bc7 import _encode_mode4, _encode_mode5

        rng = np.random.default_rng(14)
        n = 32
        rb = rng.random((n, 1, 1)).astype(np.float32) * np.ones(
            (n, 16, 1), np.float32
        )
        g = rng.random((n, 16, 1)).astype(np.float32)
        blocks = np.concatenate(
            [rb, g, rb * 0.5, np.ones((n, 16, 1), np.float32)], -1
        ).astype(np.float32)
        chw = jnp.ones(4, jnp.float32)
        colors = jnp.asarray(blocks) * 255.0
        w4, _ = _encode_mode4(colors, 2, chw, (0, 1, 2, 3))
        d4 = decode_bc7(_bytes(w4))
        assert _psnr(d4 / 255.0, blocks) > 33
        w5, _ = _encode_mode5(colors, 2, chw, (0, 1, 2, 3))
        d5 = decode_bc7(_bytes(w5))
        assert _psnr(d5 / 255.0, blocks) > 28

    def test_perceptual_flag_compiles(self):
        rng = np.random.default_rng(4)
        blocks = _smooth_blocks(8, rng)
        dec = decode_bc7(_bytes(bc7.encode_bc7(blocks, quality=1, perceptual=True)))
        assert _psnr(dec / 255.0, blocks) > 35


class TestBc6h:
    @pytest.mark.parametrize("signed", [False, True])
    def test_hdr_quality(self, signed):
        rng = np.random.default_rng(5)
        c0 = np.exp(rng.normal(0, 2, (64, 1, 3))).astype(np.float32)
        c1 = np.exp(rng.normal(0, 2, (64, 1, 3))).astype(np.float32)
        t = rng.random((64, 16, 1), np.float32)
        blocks = (c0 * t + c1 * (1 - t)).astype(np.float32)
        if signed:
            blocks = -blocks
        dec = decode_bc6h_f32(
            _bytes(bc6h.encode_bc6h(blocks, quality=2, signed=signed)), signed=signed
        )
        lr = np.log2(np.maximum(np.abs(dec), 1e-6)) - np.log2(
            np.maximum(np.abs(blocks), 1e-6)
        )
        assert np.sqrt((lr**2).mean()) < 0.25
        assert (np.sign(dec) == np.sign(blocks)).all()

    def test_solid_hdr(self):
        solid = np.tile(np.array([[1.5, 0.25, 1000.0]], np.float32), (2, 16, 1))
        dec = decode_bc6h_f32(_bytes(bc6h.encode_bc6h(solid, quality=2)))
        assert np.abs(dec / solid - 1).max() < 0.01

    def test_mode12_helps_smooth(self):
        # Smooth low-contrast block: 11-bit base precision beats 10-bit.
        rng = np.random.default_rng(6)
        base = np.full((32, 16, 3), 100.0, np.float32)
        blocks = base * (1.0 + 0.01 * rng.random((32, 16, 3), np.float32))
        d_lo = decode_bc6h_f32(_bytes(bc6h.encode_bc6h(blocks, quality=0)))
        d_hi = decode_bc6h_f32(_bytes(bc6h.encode_bc6h(blocks, quality=2)))
        e_lo = ((d_lo - blocks) ** 2).mean()
        e_hi = ((d_hi - blocks) ** 2).mean()
        assert e_hi <= e_lo + 1e-12


class TestPipeline:
    def test_bc7_converter(self):
        conv = create_converter(_F.BC7, _T.UNorm)
        surface = np.random.default_rng(7).random((20, 24, 4)).astype(np.float32)
        data = conv.encode(surface, EncodeParams(quality=Quality.Low))
        assert len(data) == 6 * 5 * 16
        dec = decode_bc7(np.frombuffer(data, np.uint8))
        assert dec.shape == (30, 16, 4)

    def test_bc7_srgb_perceptual(self):
        conv = create_converter(_F.BC7, _T.UNorm)
        surface = np.random.default_rng(8).random((8, 8, 4)).astype(np.float32)
        data = conv.encode(
            surface, EncodeParams(quality=Quality.Low, color_space=ColorSpace.sRGB)
        )
        assert len(data) == 4 * 16

    @pytest.mark.parametrize("type_", [_T.UFloat, _T.Float])
    def test_bc6h_converter(self, type_):
        conv = create_converter(_F.BC6H, type_)
        surface = (
            np.random.default_rng(9).random((16, 16, 4)).astype(np.float32) * 10
        )
        if type_ is _T.Float:
            surface = surface - 5
        data = conv.encode(surface, EncodeParams(quality=Quality.Lowest))
        assert len(data) == 4 * 4 * 16
        dec = decode_bc6h_f32(
            np.frombuffer(data, np.uint8), signed=type_ is _T.Float
        )
        assert np.isfinite(dec).all()
