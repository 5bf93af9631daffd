"""BC1-BC5 encoder tests: decode parity, PSNR floors, mesh invariance.

Mirrors the reference's convert-coverage strategy (TextureTest.cpp:824-980)
plus the TPU-specific shard-equivalence tests from SURVEY.md §4.
"""

import numpy as np
import pytest

from cuttlefish_tpu.convert import EncodeParams, create_converter
from cuttlefish_tpu.decode import (
    decode_bc1,
    decode_bc2,
    decode_bc3,
    decode_bc4,
    decode_bc5,
)
from cuttlefish_tpu.formats import Quality, TextureFormat, TextureType
from cuttlefish_tpu.kernels import bc
from cuttlefish_tpu.parallel import default_mesh, use_mesh

_F = TextureFormat
_T = TextureType


def _bytes(words, block_bytes):
    """[N, k] uint32 words -> [N, block_bytes] little-endian uint8."""
    w = np.ascontiguousarray(np.asarray(words).astype("<u4"))
    return w.view(np.uint8).reshape(-1, block_bytes)


def _psnr(a, b, peak=1.0):
    mse = np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2)
    if mse == 0:
        return np.inf
    return 10 * np.log10(peak * peak / mse)


def _rand_blocks(n, rng, smooth=True):
    """Realistic block batch: two random colors lerped by random weights."""
    c0 = rng.random((n, 1, 4), np.float32)
    c1 = rng.random((n, 1, 4), np.float32)
    t = rng.random((n, 16, 1), np.float32)
    blocks = c0 * t + c1 * (1 - t)
    if not smooth:
        blocks = rng.random((n, 16, 4), np.float32)
    blocks[..., 3] = 1.0
    return blocks


class TestBc1:
    def test_solid_color_exact(self):
        blocks = np.tile(
            np.array([[0.5, 0.25, 0.75, 1.0]], np.float32), (4, 16, 1)
        )
        words = np.asarray(bc.encode_bc1(blocks, quality=2))
        dec = decode_bc1(_bytes(words, 8))
        # All texels identical and within 565 quantization of the source.
        assert (dec == dec[:, :1]).all()
        err = np.abs(dec[..., :3] / 255.0 - blocks[..., :3])
        assert err.max() <= 4.51 / 255.0

    def test_two_color_block(self):
        blocks = np.zeros((1, 16, 4), np.float32)
        blocks[0, :8] = [1.0, 0.0, 0.0, 1.0]
        blocks[0, 8:] = [0.0, 0.0, 1.0, 1.0]
        words = np.asarray(bc.encode_bc1(blocks, quality=2))
        dec = decode_bc1(_bytes(words, 8))
        assert _psnr(dec[..., :3] / 255.0, blocks[..., :3]) > 40

    @pytest.mark.parametrize("quality", [0, 2, 4])
    def test_psnr_floor(self, quality):
        rng = np.random.default_rng(7)
        blocks = _rand_blocks(64, rng)
        words = np.asarray(bc.encode_bc1(blocks, quality=quality))
        dec = decode_bc1(_bytes(words, 8))
        # ~31 dB is near-optimal for random two-color lerp blocks: the
        # index quantizer alone bounds MSE at E[(t-q)^2]*E[dc^2].
        psnr = _psnr(dec[..., :3] / 255.0, blocks[..., :3])
        assert psnr > 29.5

    def test_quality_monotone(self):
        rng = np.random.default_rng(3)
        blocks = _rand_blocks(128, rng, smooth=False)
        errs = []
        for q in (0, 4):
            words = np.asarray(bc.encode_bc1(blocks, quality=q, allow_black=False))
            dec = decode_bc1(_bytes(words, 8))
            errs.append(
                np.mean((dec[..., :3] / 255.0 - blocks[..., :3]) ** 2)
            )
        assert errs[1] <= errs[0] + 1e-9

    def test_punch_through_alpha(self):
        rng = np.random.default_rng(11)
        blocks = _rand_blocks(16, rng)
        blocks[:, ::3, 3] = 0.0  # every third texel transparent
        words = np.asarray(bc.encode_bc1(blocks, quality=2, punch_through=True))
        dec = decode_bc1(_bytes(words, 8))
        assert (dec[:, ::3, 3] == 0).all()
        opaque = np.ones(16, bool)
        opaque[::3] = False
        assert (dec[:, opaque, 3] == 255).all()


class TestBc4:
    @pytest.mark.parametrize("signed", [False, True])
    def test_ramp(self, signed):
        vals = np.linspace(-1.0 if signed else 0.0, 1.0, 16, dtype=np.float32)
        vals = np.tile(vals[None, :], (8, 1))
        words = np.asarray(bc.encode_bc4(vals, quality=2, signed=signed))
        dec = decode_bc4(_bytes(words, 8), signed=signed)
        assert np.abs(dec - vals).max() < (0.08 if signed else 0.06)

    def test_extremes_mode(self):
        # Blocks containing exact 0/1 plus a tight midrange cluster reward
        # the 6-value + extremes mode.
        vals = np.full((4, 16), 0.5, np.float32)
        vals[:, 0] = 0.0
        vals[:, 1] = 1.0
        vals[:, 2:6] = [0.45, 0.48, 0.52, 0.55]
        words = np.asarray(bc.encode_bc4(vals, quality=4))
        dec = decode_bc4(_bytes(words, 8))
        assert np.abs(dec - vals).max() < 0.03

    def test_psnr_floor(self):
        rng = np.random.default_rng(5)
        vals = rng.random((64, 16), np.float32)
        words = np.asarray(bc.encode_bc4(vals, quality=2))
        dec = decode_bc4(_bytes(words, 8))
        assert _psnr(dec, vals) > 30


class TestComposites:
    def test_bc2_alpha_exact_quant(self):
        rng = np.random.default_rng(2)
        blocks = _rand_blocks(8, rng)
        blocks[..., 3] = rng.random((8, 16), np.float32)
        words = np.asarray(bc.encode_bc2(blocks, quality=2))
        dec = decode_bc2(_bytes(words, 16))
        expect = np.round(np.clip(blocks[..., 3], 0, 1) * 15) * 17
        assert (dec[..., 3] == expect.astype(np.uint8)).all()

    def test_bc3_roundtrip(self):
        rng = np.random.default_rng(4)
        blocks = _rand_blocks(32, rng)
        blocks[..., 3] = np.linspace(0, 1, 16, dtype=np.float32)[None, :]
        words = np.asarray(bc.encode_bc3(blocks, quality=2))
        dec = decode_bc3(_bytes(words, 16))
        assert _psnr(dec[..., :3] / 255.0, blocks[..., :3]) > 29.5
        # 16 ramp values onto an 8-entry palette: ~29.5 dB is optimal.
        assert _psnr(dec[..., 3] / 255.0, blocks[..., 3]) > 28

    @pytest.mark.parametrize("signed", [False, True])
    def test_bc5_roundtrip(self, signed):
        rng = np.random.default_rng(6)
        blocks = rng.random((32, 16, 4), np.float32)
        if signed:
            blocks = blocks * 2 - 1
        words = np.asarray(bc.encode_bc5(blocks, quality=2, signed=signed))
        dec = decode_bc5(_bytes(words, 16), signed=signed)
        assert _psnr(dec, blocks[..., :2], peak=2.0 if signed else 1.0) > 30


class TestMeshInvariance:
    def test_bc1_same_bytes_any_mesh(self):
        rng = np.random.default_rng(9)
        surface = rng.random((64, 64, 4), np.float32)
        conv = create_converter(_F.BC1_RGB, _T.UNorm)
        params = EncodeParams(quality=Quality.Normal)
        single = conv.encode(surface, params)
        with use_mesh(default_mesh()):
            sharded = conv.encode(surface, params)
        assert np.array_equal(single, sharded)


class TestConverterPipeline:
    @pytest.mark.parametrize(
        "fmt,type_,block_bytes",
        [
            (_F.BC1_RGB, _T.UNorm, 8),
            (_F.BC1_RGBA, _T.UNorm, 8),
            (_F.BC2, _T.UNorm, 16),
            (_F.BC3, _T.UNorm, 16),
            (_F.BC4, _T.UNorm, 8),
            (_F.BC4, _T.SNorm, 8),
            (_F.BC5, _T.UNorm, 16),
        ],
    )
    def test_output_size(self, fmt, type_, block_bytes):
        conv = create_converter(fmt, type_)
        assert conv is not None
        surface = np.zeros((20, 24, 4), np.float32)  # non-multiple of 4
        data = conv.encode(surface, EncodeParams())
        assert len(data) == 6 * 5 * block_bytes
