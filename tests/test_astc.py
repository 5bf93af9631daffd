"""ASTC encoder tests: decode parity, quality floors, all block sizes."""

import jax.numpy as jnp
import numpy as np
import pytest

from cuttlefish_tpu.convert import EncodeParams, create_converter
from cuttlefish_tpu.decode.astc import decode_astc
from cuttlefish_tpu.formats import Quality, TextureFormat, TextureType
from cuttlefish_tpu.kernels import astc

_F = TextureFormat
_T = TextureType


def _bytes(words):
    w = np.ascontiguousarray(np.asarray(words).astype("<u4"))
    return w.view(np.uint8).reshape(w.shape[0], -1)


def _psnr(a, b):
    mse = np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2)
    return np.inf if mse == 0 else 10 * np.log10(1.0 / mse)


def _smooth(n, texels, rng):
    c0 = rng.random((n, 1, 4), np.float32)
    c1 = rng.random((n, 1, 4), np.float32)
    t = rng.random((n, texels, 1), np.float32)
    b = c0 * t + c1 * (1 - t)
    b[..., 3] = 1.0
    return b.astype(np.float32)


class TestAstc4x4:
    def test_solid_void_extent(self):
        solid = np.tile(np.array([[0.2, 0.6, 0.9, 0.7]], np.float32), (2, 16, 1))
        words = np.asarray(astc.encode_astc(solid, 4, 4, quality=2))
        # Void-extent magic in the low bits.
        assert ((words[:, 0] & 0x1FF) == 0x1FC).all()
        dec = decode_astc(_bytes(words), 4, 4)
        assert np.abs(dec / 255.0 - solid).max() < 2.5 / 255.0

    def test_opaque_quality(self):
        rng = np.random.default_rng(1)
        blocks = _smooth(64, 16, rng)
        dec = decode_astc(_bytes(astc.encode_astc(blocks, 4, 4, quality=2)), 4, 4)
        assert _psnr(dec / 255.0, blocks) > 35

    def test_gradient_near_exact(self):
        # A luma ramp is exactly representable by 3-bit weights + 8-bit eps.
        ramp = np.linspace(0.1, 0.8, 16, dtype=np.float32)
        blocks = np.stack([ramp, ramp, ramp, np.ones(16, np.float32)], -1)[None]
        dec = decode_astc(_bytes(astc.encode_astc(blocks, 4, 4, quality=2)), 4, 4)
        # A 16-step ramp through 8 weight levels floors near 34 dB.
        assert _psnr(dec / 255.0, blocks) > 32

    def test_alpha_uses_cem12(self):
        rng = np.random.default_rng(2)
        blocks = _smooth(32, 16, rng)
        blocks[..., 3] = 0.5
        dec = decode_astc(_bytes(astc.encode_astc(blocks, 4, 4, quality=2)), 4, 4)
        # Constant alpha must be represented well (CEM12 endpoints).
        assert np.abs(dec[..., 3] / 255.0 - 0.5).max() < 0.02

    @pytest.mark.slow
    def test_dual_plane_alpha(self):
        """Quality >= 2 tries dual-plane CCS=3 (round 4: q2 gained it for
        +1.55 dB on RGBA noise): on content whose alpha varies
        independently of RGB it must clearly beat the q1 single-plane
        encode, and the emitted D-bit blocks must decode correctly
        (PSNR here is computed through the spec decoder)."""
        rng = np.random.default_rng(3)
        n = 64
        rgbdir = rng.normal(size=(n, 1, 3)).astype(np.float32)
        t0 = rng.random((n, 16, 1), np.float32)
        t1 = rng.random((n, 16, 1), np.float32)
        base = rng.random((n, 1, 3), np.float32)
        blocks = np.zeros((n, 16, 4), np.float32)
        blocks[..., :3] = np.clip(base + 0.3 * rgbdir * t0, 0, 1)
        blocks[..., 3] = np.clip(0.2 + 0.8 * t1[..., 0], 0, 1)
        p = []
        for q in (1, 2, 3):
            dec = decode_astc(
                _bytes(astc.encode_astc(blocks, 4, 4, quality=q)), 4, 4
            )
            p.append(_psnr(dec / 255.0, blocks))
        assert p[1] > p[0] + 2.0, p  # dual-plane gain (measured ~6 dB)
        assert p[2] >= p[1] - 1e-9, p  # ladder stays monotone

    def test_gray_content_uses_cem0(self):
        """Grayscale blocks pick the luminance CEM (0): 2 color values
        free the budget for a fine weight grid (+3.7 dB vs CEM 8 on this
        content, measured)."""
        rng = np.random.default_rng(0)
        g0 = rng.random((48, 1, 1), np.float32)
        g1 = rng.random((48, 1, 1), np.float32)
        t = rng.random((48, 16, 1), np.float32)
        g = g0 * t + g1 * (1 - t)
        blocks = np.concatenate(
            [g, g, g, np.ones_like(g)], -1
        ).astype(np.float32)
        w = np.asarray(astc.encode_astc(blocks, 4, 4, quality=2))
        npart = (w[:, 0] >> 11) & 3
        cem = (w[:, 0] >> 13) & 0xF
        assert ((npart == 0) & (cem == 0)).sum() > 24  # majority luminance
        dec = decode_astc(_bytes(w), 4, 4)
        # decoded RGB identical per texel (L replication) on CEM0 blocks
        sel = (npart == 0) & (cem == 0)
        d = dec[np.asarray(sel)]
        assert (d[..., 0] == d[..., 1]).all() and (d[..., 1] == d[..., 2]).all()
        assert (d[..., 3] == 255).all()
        assert _psnr(dec[..., :3] / 255.0, blocks[..., :3]) > 45.5

    def test_gray_alpha_uses_cem4(self):
        rng = np.random.default_rng(1)
        g0 = rng.random((48, 1, 1), np.float32)
        g1 = rng.random((48, 1, 1), np.float32)
        t = rng.random((48, 16, 1), np.float32)
        g = g0 * t + g1 * (1 - t)
        # alpha follows the same ramp (weight-compatible) scaled/offset
        a = np.clip(0.2 + 0.6 * t, 0, 1)
        blocks = np.concatenate([g, g, g, a], -1).astype(np.float32)
        w = np.asarray(astc.encode_astc(blocks, 4, 4, quality=2))
        npart = (w[:, 0] >> 11) & 3
        cem = (w[:, 0] >> 13) & 0xF
        assert ((npart == 0) & (cem == 4)).sum() > 24
        dec = decode_astc(_bytes(w), 4, 4)
        assert _psnr(dec / 255.0, blocks) > 42

    def test_gray_gate_detection(self):
        rng = np.random.default_rng(5)
        col = rng.random((64, 16, 4)).astype(np.float32)
        col[..., 0] = 0.9
        col[..., 1] = 0.1  # strong chroma on every texel
        assert not astc.has_gray_blocks(col)
        one_gray = col.copy()
        one_gray[7, :, :3] = 0.5
        assert astc.has_gray_blocks(one_gray)
        # a block with SOME gray texels but not all is not near-gray
        mixed = col.copy()
        mixed[3, :8, :3] = 0.5
        assert not astc.has_gray_blocks(mixed)

    def test_gray_gate_parity_on_colored_content(self):
        """With no near-gray block, skipping CEM 0/4 must be a pure
        speedup: identical bytes to the full sweep."""
        rng = np.random.default_rng(6)
        col = _smooth(64, 16, rng)
        col[..., 0] = np.clip(col[..., 0] + 0.5, 0, 1)  # push chroma apart
        col[..., 1] *= 0.3
        assert not astc.has_gray_blocks(col)
        for q in (2, 4):
            w_full = np.asarray(astc.encode_astc(col, 4, 4, q, gray=True))
            w_gate = np.asarray(astc.encode_astc(col, 4, 4, q, gray=False))
            assert (w_full == w_gate).all(), q

    def test_gray_gate_per_block_eligibility(self):
        """Luminance CEMs are gated per block: gray blocks in a mixed
        batch still get CEM 0 (with its quality win), colored blocks
        never take CEM 0/4 even with gray neighbors in the batch."""
        rng = np.random.default_rng(8)
        n = 48
        blocks = _smooth(n, 16, rng)
        blocks[..., 0] = np.clip(blocks[..., 0] + 0.5, 0, 1)
        blocks[..., 1] *= 0.2
        gray_idx = [3, 11, 30]
        for i in gray_idx:
            g0, g1 = rng.random(), rng.random()
            t = rng.random((16,), np.float32)
            blocks[i, :, :3] = (g0 * t + g1 * (1 - t))[:, None]
        assert astc.has_gray_blocks(blocks)
        w = np.asarray(astc.encode_astc(blocks, 4, 4, quality=2))
        npart = (w[:, 0] >> 11) & 3
        cem = (w[:, 0] >> 13) & 0xF
        is_cem_gray = (npart == 0) & ((cem == 0) | (cem == 4))
        void = (w[:, 0] & 0x1FF) == 0x1FC
        for i in gray_idx:
            assert is_cem_gray[i] or void[i], i
        colored = np.setdiff1d(np.arange(n), gray_idx)
        assert not is_cem_gray[colored].any()

    def test_gray_gate_refine_params(self):
        from cuttlefish_tpu.convert.astc import AstcConverter

        conv = AstcConverter(_F.ASTC_4x4)
        rng = np.random.default_rng(7)
        col = rng.random((8, 16, 4)).astype(np.float32)
        col[..., 0] = 0.9
        col[..., 1] = 0.1
        p = conv.refine_params(col, EncodeParams())
        assert p.content_gray is False
        col[0, :, :3] = 0.25
        p = conv.refine_params(col, EncodeParams())
        assert p.content_gray is True
        # HDR converter never gates (CEM 11/14 only)
        hdr = AstcConverter(_F.ASTC_4x4, hdr=True)
        p = hdr.refine_params(col * 0 + 0.9, EncodeParams())
        assert p.content_gray is True

    @pytest.mark.slow
    def test_astc_not_below_bc7(self):
        """North-star quality parity (VERDICT round-1 item 1): ASTC 4x4 at
        High quality must not lose to BC7 at Normal quality — both are
        8 bpp and astcenc beats bc7e on LDR content.  Measured on the
        TPU Pallas path: BC7 q2 44.1 dB, ASTC q3 45.3 dB (BASELINE.md)."""
        from cuttlefish_tpu.decode.bc7 import decode_bc7
        from cuttlefish_tpu.kernels import bc7 as kbc7

        rng = np.random.default_rng(0)
        blocks = _smooth(96, 16, rng)
        bc7_dec = decode_bc7(_bytes(kbc7.encode_bc7(blocks, quality=2)))
        bc7_db = _psnr(bc7_dec[..., :3] / 255.0, blocks[..., :3])
        astc_dec = decode_astc(
            _bytes(astc.encode_astc(blocks, 4, 4, quality=3)), 4, 4
        )
        astc_db = _psnr(astc_dec[..., :3] / 255.0, blocks[..., :3])
        assert astc_db >= bc7_db - 0.2, (astc_db, bc7_db)

    @pytest.mark.slow
    def test_three_partition_blocks(self):
        """3-cluster content encodes 3-partition blocks at q3+ and gains
        over the 2-partition-only search (astcenc parity: its higher
        presets search up to 4 partitions)."""
        rng = np.random.default_rng(2)
        n = 64
        cols = rng.random((n, 3, 1, 4), np.float32)
        assign = rng.integers(0, 3, (n, 16))
        blocks = np.take_along_axis(cols, assign[:, None, :, None], 1)[:, 0]
        blocks = (
            (blocks + rng.normal(0, 0.01, blocks.shape))
            .astype(np.float32)
            .clip(0, 1)
        )
        blocks[..., 3] = 1.0
        w = np.asarray(astc.encode_astc(blocks, 4, 4, quality=3))
        nparts = ((w[:, 0] >> 11) & 3) + 1
        assert (nparts == 3).sum() > 5  # some blocks pick 3 partitions
        dec = decode_astc(_bytes(w), 4, 4)
        assert _psnr(dec[..., :3] / 255.0, blocks[..., :3]) > 20

    def test_four_partition_blocks(self):
        """4-region grayscale(+alpha) content encodes 4-partition CEM 0/4
        blocks at q3+ (CEM 8 x 4 partitions would exceed the 18-value ISE
        cap, so only the luminance CEMs exist at 4 partitions) and gains
        over the q2 search."""
        from cuttlefish_tpu.kernels.astc_partition import partition_table

        rng = np.random.default_rng(4)
        n = 48
        tab = partition_table(4, 4, 4)
        seeds = rng.choice(1024, n)
        lv = np.array([[0.05, 0.35, 0.65, 0.95]] * n) + rng.normal(
            0, 0.02, (n, 4)
        )
        blocks = np.zeros((n, 16, 4), np.float32)
        for i, s in enumerate(seeds):
            g = np.clip(lv[i][tab[s]], 0, 1)
            blocks[i, :, 0] = blocks[i, :, 1] = blocks[i, :, 2] = g
            blocks[i, :, 3] = np.clip(0.3 + 0.6 * (tab[s] % 2), 0, 1)
        w3 = np.asarray(astc.encode_astc(blocks, 4, 4, quality=3))
        nparts = ((w3[:, 0] >> 11) & 3) + 1
        cemf = (w3[:, 0] >> 23) & 0x3F
        four = (nparts == 4) & ((cemf & 0x3) == 0)  # exclude void extents
        assert four.sum() > n // 4, four.sum()
        # same-CEM field must decode as CEM 0 or 4 on those blocks
        assert set(np.unique(cemf[four] >> 2).tolist()) <= {0, 4}
        dec3 = decode_astc(_bytes(w3), 4, 4).astype(np.float64) / 255.0
        w2 = np.asarray(astc.encode_astc(blocks, 4, 4, quality=2))
        dec2 = decode_astc(_bytes(w2), 4, 4).astype(np.float64) / 255.0
        mse3 = ((dec3 - blocks) ** 2).mean()
        mse2 = ((dec2 - blocks) ** 2).mean()
        assert mse3 < mse2 * 0.5, (mse3, mse2)  # big gain on this content

    @pytest.mark.slow
    def test_quality_monotone(self):
        rng = np.random.default_rng(3)
        blocks = rng.random((32, 16, 4), np.float32)
        errs = []
        for q in (0, 4):
            dec = decode_astc(_bytes(astc.encode_astc(blocks, 4, 4, quality=q)), 4, 4)
            errs.append(np.mean((dec / 255.0 - blocks) ** 2))
        assert errs[1] <= errs[0] + 1e-9


class TestAllBlockSizes:
    @pytest.mark.parametrize(
        "bw,bh",
        [(4, 4), (5, 4), (5, 5), (6, 5), (6, 6), (8, 5), (8, 6), (8, 8),
         (10, 5), (10, 6), (10, 8), (10, 10), (12, 10), (12, 12)],
    )
    def test_roundtrip(self, bw, bh):
        rng = np.random.default_rng(bw * 100 + bh)
        blocks = _smooth(8, bw * bh, rng)
        words = np.asarray(astc.encode_astc(blocks, bw, bh, quality=1))
        assert words.shape == (8, 4)
        dec = decode_astc(_bytes(words), bw, bh)
        # Larger blocks decimate harder; floor scales with texel count.
        floor = 30 if bw * bh <= 25 else 18
        assert _psnr(dec / 255.0, blocks) > floor


class TestPipeline:
    @pytest.mark.parametrize("fmt", [_F.ASTC_4x4, _F.ASTC_6x6, _F.ASTC_8x8])
    def test_converter(self, fmt):
        conv = create_converter(fmt, _T.UNorm)
        assert conv is not None
        surface = np.random.default_rng(5).random((20, 24, 4)).astype(np.float32)
        data = conv.encode(surface, EncodeParams(quality=Quality.Low))
        from cuttlefish_tpu.formats import block_height, block_width

        nbx = -(-24 // block_width(fmt))
        nby = -(-20 // block_height(fmt))
        assert len(data) == nbx * nby * 16

    def test_hdr_converter_exists(self):
        assert create_converter(_F.ASTC_4x4, _T.UFloat) is not None


class TestHdr:
    def test_lns_half_roundtrip(self):
        from cuttlefish_tpu.decode.astc import lns_to_sf16, sf16_to_lns

        for h in range(0, 0x7C00):
            assert abs(lns_to_sf16(sf16_to_lns(h)) - h) <= 1
        # monotone
        prev = -1
        for p in range(0, 1 << 16, 7):
            v = lns_to_sf16(p)
            assert v >= prev
            prev = v

    def test_hdr_roundtrip_and_quality(self):
        from cuttlefish_tpu.decode.astc import decode_astc_hdr

        rng = np.random.default_rng(11)
        n = 32
        rgb = (rng.random((n, 16, 3)).astype(np.float32) + 0.1) * (
            2.0 ** rng.integers(-3, 6, (n, 1, 1))
        )
        blocks = np.concatenate([rgb, np.ones((n, 16, 1), np.float32)], -1)
        blocks = (blocks + np.roll(blocks, 1, 1)) / 2  # smooth a bit
        words = np.asarray(astc.encode_astc_hdr(jnp.asarray(blocks), 4, 4, quality=2))
        dec = decode_astc_hdr(_bytes(words), 4, 4)
        vals = dec.astype(np.uint16).view(np.float16).astype(np.float64)
        assert np.all(vals[..., 3] == 1.0)
        logerr = np.abs(
            np.log2(np.maximum(vals[..., :3], 1e-6))
            - np.log2(np.maximum(blocks[..., :3], 1e-6))
        )
        assert np.median(logerr) < 0.3

    def test_hdr_solid_block_void_extent(self):
        from cuttlefish_tpu.decode.astc import decode_astc_hdr

        blocks = np.full((4, 16, 4), 5.25, np.float32)
        blocks[..., 3] = 1.0
        words = np.asarray(astc.encode_astc_hdr(jnp.asarray(blocks), 4, 4, quality=2))
        dec = decode_astc_hdr(_bytes(words), 4, 4)
        vals = dec.astype(np.uint16).view(np.float16).astype(np.float64)
        assert np.all(vals[..., :3] == 5.25)  # exactly representable half

    def test_hdr_alpha_cem14(self):
        from cuttlefish_tpu.decode.astc import decode_astc_hdr

        rng = np.random.default_rng(12)
        n = 32
        blocks = np.concatenate(
            [
                rng.random((n, 16, 3)).astype(np.float32) * 4.0,
                rng.random((n, 16, 1)).astype(np.float32),
            ],
            -1,
        ).astype(np.float32)
        words = np.asarray(astc.encode_astc_hdr(jnp.asarray(blocks), 4, 4, quality=2))
        dec = decode_astc_hdr(_bytes(words), 4, 4)
        vals = dec.astype(np.uint16).view(np.float16).astype(np.float64)
        amse = ((vals[..., 3] - blocks[..., 3]) ** 2).mean()
        assert 10 * np.log10(1.0 / amse) > 20.0

    def test_ufloat_converter_pipeline(self):
        import cuttlefish_tpu as ct
        from cuttlefish_tpu import metrics

        rng = np.random.default_rng(13)
        arr = (rng.random((16, 16, 4)).astype(np.float32) + 0.05) * 3.0
        arr[..., 3] = 1.0
        tex = ct.Texture(ct.Dimension.Dim2D, 16, 16)
        tex.set_image(ct.Image.from_array(arr, ct.ImageFormat.RGBAF))
        assert tex.convert(ct.TextureFormat.ASTC_4x4, ct.TextureType.UFloat)
        dec = metrics.decode_surface(
            tex.data(0), ct.TextureFormat.ASTC_4x4, ct.TextureType.UFloat, 16, 16
        )
        logerr = np.abs(
            np.log2(np.maximum(dec[..., :3], 1e-6))
            - np.log2(np.maximum(arr[..., :3].astype(np.float64), 1e-6))
        )
        assert np.median(logerr) < 0.6
