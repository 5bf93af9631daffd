"""North-star quality checks vs independent reference-class CPU encoders.

BASELINE.md's quality target is "per-image PSNR >= Cuttlefish at matching
quality".  The reference's encoder brains are vendored submodules
(astcenc via /root/reference/lib/src/AstcConverter.cpp, etc2comp via
EtcConverter.cpp, bc7enc via S3tcConverter.cpp) that cannot be built in
this environment, so the bar is independent from-scratch CPU encoders of
the same algorithm class (native/src/astc_cpu.cpp, etc2_cpu.cpp; BC7 is
covered by tests/test_native.py::TestQualityVsCpuReference).  The TPU
path must score >= the CPU encoder at the same quality level on every
content class the quality harness tracks.
"""

from __future__ import annotations

import numpy as np
import pytest

from cuttlefish_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def content_blocks(name: str, n: int = 256, seed: int = 7) -> np.ndarray:
    """Named [N,16,4] float32 block batches (tools/quality_check.py classes)."""
    rng = np.random.default_rng(seed)
    if name == "two_lerp":
        c0 = rng.random((n, 1, 4), np.float32)
        c1 = rng.random((n, 1, 4), np.float32)
        t = rng.random((n, 16, 1), np.float32)
        out = c0 + (c1 - c0) * t
        out[..., 3] = 1.0
    elif name == "two_pop":
        pick = rng.random((n, 16, 1)) < 0.5
        ca = rng.random((n, 1, 4)).astype(np.float32)
        cb = rng.random((n, 1, 4)).astype(np.float32)
        out = np.where(pick, ca, cb).astype(np.float32)
        out += rng.normal(0, 0.02, out.shape).astype(np.float32)
        out[..., 3] = 1.0
    elif name == "gradient":
        y, x = np.mgrid[0:4, 0:4].astype(np.float32) / 4.0
        phase = rng.random((n, 1, 1, 3)).astype(np.float32)
        g = 0.5 + 0.5 * np.sin(
            3.0 * (x + y)[None, :, :, None] + phase * 6.28
        )
        out = np.concatenate(
            [g, np.ones((n, 4, 4, 1), np.float32)], axis=-1
        ).reshape(n, 16, 4)
    elif name == "alpha_ramp":
        c0 = rng.random((n, 1, 4), np.float32)
        c1 = rng.random((n, 1, 4), np.float32)
        t = rng.random((n, 16, 1), np.float32)
        out = c0 + (c1 - c0) * t
        out[..., 3] = (0.2 + 0.7 * rng.random((n, 16), np.float32))
    elif name == "noise":
        out = rng.random((n, 16, 4)).astype(np.float32)
        out[..., 3] = 1.0
    else:  # pragma: no cover
        raise ValueError(name)
    return np.clip(out, 0.0, 1.0).astype(np.float32)


CLASSES = ["two_lerp", "two_pop", "gradient", "alpha_ramp", "noise"]

# Per-class tie tolerance: the TPU and CPU encoders are the same algorithm
# class, so on classes where both saturate the format they land within a
# few hundredths of a dB of each other and which one "wins" is seed-ranking
# noise (the TPU's estimate-then-refine pass deep-fits the top-k ranked
# partition seeds instead of all of them, trading <=0.05 dB for ~k-fold
# throughput).  Real regressions are an order of magnitude larger (the
# pre-round-4 gaps this suite was built to catch were 0.3-0.8 dB).  The
# mean margin across classes must still be >= 0: the TPU path wins on
# average at every quality level.
TIE_DB = 0.05


def _psnr(dec: np.ndarray, ref: np.ndarray) -> float:
    mse = ((dec.astype(np.float64) - ref.astype(np.float64)) ** 2).mean()
    return 10 * np.log10(255.0**2 / max(mse, 1e-12))


def _astc_margin(content: str, quality: int) -> tuple[float, float]:
    from cuttlefish_tpu.decode.astc import decode_astc
    from cuttlefish_tpu.kernels.astc import encode_astc

    blocks = content_blocks(content)
    ref = blocks * 255.0
    wt = np.asarray(encode_astc(blocks, 4, 4, quality=quality))
    p_tpu = _psnr(
        decode_astc(
            np.ascontiguousarray(wt.astype("<u4")).view(np.uint8), 4, 4
        ),
        ref,
    )
    wc = native.astc4x4_encode_cpu(blocks, quality=quality)
    p_cpu = _psnr(decode_astc(wc.reshape(-1), 4, 4), ref)
    return p_tpu, p_cpu


def _etc2_margin(content: str, quality: int) -> tuple[float, float]:
    from cuttlefish_tpu.decode.etc import decode_etc_rgb
    from cuttlefish_tpu.kernels.etc import encode_etc_rgb

    blocks = content_blocks(content)
    ref = blocks[..., :3] * 255.0
    wt = np.asarray(encode_etc_rgb(blocks, quality=quality, etc2=True))
    p_tpu = _psnr(
        decode_etc_rgb(
            np.ascontiguousarray(wt.astype("<u4")).view(np.uint8), etc2=True
        ),
        ref,
    )
    wc = native.etc2_rgb_encode_cpu(blocks, quality=quality)
    p_cpu = _psnr(decode_etc_rgb(wc.reshape(-1), etc2=True), ref)
    return p_tpu, p_cpu


class TestAstcVsCpuReference:
    """TPU-path ASTC 4x4 >= the astcenc-fast-class CPU encoder."""

    @pytest.mark.parametrize("content", CLASSES)
    @pytest.mark.parametrize(
        "quality",
        [2, pytest.param(4, marks=pytest.mark.slow)],
    )
    def test_astc_psnr_not_below_cpu_reference(self, content, quality):
        p_tpu, p_cpu = _astc_margin(content, quality)
        assert p_tpu >= p_cpu - TIE_DB, (content, quality, p_tpu, p_cpu)

    @pytest.mark.slow
    @pytest.mark.parametrize("quality", [2, 4])
    def test_astc_mean_margin_nonnegative(self, quality):
        margins = [
            (lambda t: t[0] - t[1])(_astc_margin(c, quality)) for c in CLASSES
        ]
        assert float(np.mean(margins)) >= 0.0, (quality, margins)


class TestEtc2VsCpuReference:
    """TPU-path ETC2 RGB >= the etc2comp-basic-class CPU encoder."""

    @pytest.mark.parametrize("content", CLASSES)
    @pytest.mark.parametrize(
        "quality",
        [2, pytest.param(4, marks=pytest.mark.slow)],
    )
    def test_etc2_psnr_not_below_cpu_reference(self, content, quality):
        p_tpu, p_cpu = _etc2_margin(content, quality)
        assert p_tpu >= p_cpu - TIE_DB, (content, quality, p_tpu, p_cpu)

    @pytest.mark.slow
    @pytest.mark.parametrize("quality", [2, 4])
    def test_etc2_mean_margin_nonnegative(self, quality):
        margins = [
            (lambda t: t[0] - t[1])(_etc2_margin(c, quality)) for c in CLASSES
        ]
        assert float(np.mean(margins)) >= 0.0, (quality, margins)


class TestEacVsCpuReference:
    """TPU-path EAC A8 >= the CPU base/multiplier/table sweep."""

    @pytest.mark.parametrize("quality", [2, 4])
    def test_eac_a8_psnr_not_below_cpu_reference(self, quality):
        from cuttlefish_tpu.decode.etc import decode_eac_alpha
        from cuttlefish_tpu.kernels.etc import encode_eac_alpha

        blocks = content_blocks("alpha_ramp")
        refa = blocks[..., 3] * 255.0

        wt = np.asarray(encode_eac_alpha(blocks[..., 3], quality=quality))
        dect = decode_eac_alpha(
            np.ascontiguousarray(wt.astype("<u4")).view(np.uint8)
        )
        p_tpu = _psnr(dect, refa)

        wc = native.eac_a8_encode_cpu(blocks, quality=quality)
        decc = decode_eac_alpha(wc.reshape(-1))
        p_cpu = _psnr(decc, refa)
        assert p_tpu >= p_cpu - 1e-6, (quality, p_tpu, p_cpu)


class TestBc1VsCpuReference:
    """TPU-path BC1 >= the rgbcx-class CPU encoder (PCA + iterative
    cluster fit + quant-neighborhood; native/src/bc1_cpu.cpp)."""

    @pytest.mark.parametrize("content", CLASSES)
    @pytest.mark.parametrize(
        "quality",
        [2, pytest.param(4, marks=pytest.mark.slow)],
    )
    def test_bc1_psnr_not_below_cpu_reference(self, content, quality):
        from cuttlefish_tpu.decode.s3tc import decode_bc1
        from cuttlefish_tpu.kernels.bc import encode_bc1

        blocks = content_blocks(content)
        ref = blocks[..., :3] * 255.0
        wt = np.asarray(encode_bc1(blocks, quality=quality))
        dt = decode_bc1(
            np.ascontiguousarray(wt.astype("<u4")).view(np.uint8)
        )
        p_tpu = _psnr(dt[..., :3], ref)
        wc = native.bc1_encode_cpu(blocks, quality=quality)
        dc = decode_bc1(wc.reshape(-1))
        p_cpu = _psnr(dc[..., :3], ref)
        assert p_tpu >= p_cpu - TIE_DB, (content, quality, p_tpu, p_cpu)


class TestBc4VsCpuReference:
    """TPU-path BC4 >= the CPU min/max + neighborhood sweep."""

    @pytest.mark.parametrize("quality", [2, 4])
    def test_bc4_psnr_not_below_cpu_reference(self, quality):
        from cuttlefish_tpu.decode.s3tc import decode_bc4
        from cuttlefish_tpu.kernels.bc import encode_bc4

        blocks = content_blocks("alpha_ramp")
        refa = blocks[..., 3] * 255.0
        wt = np.asarray(encode_bc4(blocks[..., 3], quality=quality))
        dt = decode_bc4(
            np.ascontiguousarray(wt.astype("<u4")).view(np.uint8)
        ) * 255.0
        p_tpu = _psnr(dt, refa)
        wc = native.bc4_encode_cpu(blocks, quality=quality, channel=3)
        dc = decode_bc4(wc.reshape(-1)) * 255.0
        p_cpu = _psnr(dc, refa)
        assert p_tpu >= p_cpu - TIE_DB, (quality, p_tpu, p_cpu)


class TestBc6hVsCpuReference:
    """TPU-path BC6H >= the ispc-veryfast-class CPU encoder
    (native/src/bc6h_cpu.cpp: mode-11 LS + quant neighborhood), compared
    in the error domain each path targets: metric="code" against the
    CPU's half-bit objective (log-domain PSNR), metric="value" (the
    default) against a linear-domain measurement.  The metric knob is
    the reference-style error-metric parameter (etc2comp precedent,
    EtcConverter.cpp:56-115)."""

    @staticmethod
    def _content(name):
        rng = np.random.default_rng(13)
        if name == "lerp":
            c0 = rng.random((256, 1, 3), np.float32) * 8
            c1 = rng.random((256, 1, 3), np.float32) * 8
            t = rng.random((256, 16, 1), np.float32)
            return (c0 + (c1 - c0) * t).astype(np.float32)
        return (rng.random((256, 16, 3)) * 8).astype(np.float32)

    @staticmethod
    def _log_psnr(dec, b):
        a = np.log2(np.maximum(dec[..., :3], 1e-6))
        r = np.log2(np.maximum(b, 1e-6))
        mse = ((a - r) ** 2).mean()
        span = r.max() - r.min()
        return 10 * np.log10(span * span / max(mse, 1e-12))

    @staticmethod
    def _lin_psnr(dec, b):
        mse = ((dec[..., :3] - b) ** 2).mean()
        peak = float(b.max())
        return 10 * np.log10(peak * peak / max(mse, 1e-12))

    @pytest.mark.parametrize("content", ["lerp", "noise"])
    @pytest.mark.parametrize("quality", [2, 4])
    def test_bc6h_code_metric_not_below_cpu(self, content, quality):
        from cuttlefish_tpu.decode.bc6h import decode_bc6h_f32
        from cuttlefish_tpu.kernels.bc6h import encode_bc6h

        b = self._content(content)
        wt = np.asarray(encode_bc6h(b, quality=quality, metric="code"))
        dt = decode_bc6h_f32(
            np.ascontiguousarray(wt.astype("<u4")).view(np.uint8)
        )
        wc = native.bc6h_encode_cpu(b, quality=quality)
        dc = decode_bc6h_f32(wc.reshape(-1))
        p_tpu = self._log_psnr(dt, b)
        p_cpu = self._log_psnr(dc, b)
        assert p_tpu >= p_cpu - TIE_DB, (content, quality, p_tpu, p_cpu)

    @pytest.mark.parametrize("quality", [2, 4])
    def test_bc6h_value_metric_not_below_cpu_linear(self, quality):
        from cuttlefish_tpu.decode.bc6h import decode_bc6h_f32
        from cuttlefish_tpu.kernels.bc6h import encode_bc6h

        b = self._content("lerp")
        wt = np.asarray(encode_bc6h(b, quality=quality))
        dt = decode_bc6h_f32(
            np.ascontiguousarray(wt.astype("<u4")).view(np.uint8)
        )
        wc = native.bc6h_encode_cpu(b, quality=quality)
        dc = decode_bc6h_f32(wc.reshape(-1))
        p_tpu = self._lin_psnr(dt, b)
        p_cpu = self._lin_psnr(dc, b)
        assert p_tpu >= p_cpu - TIE_DB, (quality, p_tpu, p_cpu)

    def test_bc6h_code_metric_ladder_monotone_log(self):
        from cuttlefish_tpu.decode.bc6h import decode_bc6h_f32
        from cuttlefish_tpu.kernels.bc6h import encode_bc6h

        b = self._content("lerp")
        ps = []
        for q in (0, 2, 4):
            w = np.asarray(encode_bc6h(b, quality=q, metric="code"))
            dec = decode_bc6h_f32(
                np.ascontiguousarray(w.astype("<u4")).view(np.uint8)
            )
            ps.append(self._log_psnr(dec, b))
        assert ps[0] <= ps[1] + 1e-9 and ps[1] <= ps[2] + 1e-9, ps


class TestEacR11VsCpuReference:
    """TPU-path EAC R11 (unsigned) >= the CPU base/mult/table sweep."""

    @pytest.mark.parametrize("quality", [2, 4])
    @pytest.mark.parametrize("content", ["ramp", "noise"])
    def test_eac_r11_psnr_not_below_cpu_reference(self, quality, content):
        from cuttlefish_tpu.decode.etc import decode_eac_r11
        from cuttlefish_tpu.kernels.etc import encode_eac_r11

        rng = np.random.default_rng(17)
        if content == "ramp":
            v0 = rng.random((256, 1), np.float32)
            v1 = rng.random((256, 1), np.float32)
            t = rng.random((256, 16), np.float32)
            vals = (v0 + (v1 - v0) * t).astype(np.float32)
        else:
            vals = rng.random((256, 16)).astype(np.float32)

        wt = np.asarray(encode_eac_r11(vals, quality=quality))
        dt = decode_eac_r11(
            np.ascontiguousarray(wt.astype("<u4")).view(np.uint8)
        )
        p_tpu = 10 * np.log10(1.0 / max(((dt - vals) ** 2).mean(), 1e-12))
        wc = native.eac_r11_encode_cpu(vals, quality=quality)
        dc = decode_eac_r11(wc.reshape(-1))
        p_cpu = 10 * np.log10(1.0 / max(((dc - vals) ** 2).mean(), 1e-12))
        assert p_tpu >= p_cpu - TIE_DB, (content, quality, p_tpu, p_cpu)


class TestAstcHdrVsCpuReference:
    """TPU-path ASTC 4x4 HDR (CEM 11 direct / CEM 14) >= the
    astcenc-fast-class HDR CPU encoder (native/src/astc_cpu.cpp
    encode_block_hdr) — both fit in the spec's LNS16 code space, the
    reference's HDR / HDR_RGB_LDR_A profiles
    (AstcConverter.cpp:151-163)."""

    @staticmethod
    def _content(name, n=256):
        rng = np.random.default_rng(13)
        if name == "lerp":
            c0 = rng.random((n, 1, 3), np.float32) * 8
            c1 = rng.random((n, 1, 3), np.float32) * 8
            t = rng.random((n, 16, 1), np.float32)
            rgb = (c0 + (c1 - c0) * t).astype(np.float32)
        else:
            rgb = (rng.random((n, 16, 3)) * 8).astype(np.float32)
        a = np.ones((n, 16, 1), np.float32)
        if name == "alpha":
            a = (0.2 + 0.7 * rng.random((n, 16, 1))).astype(np.float32)
        return np.concatenate([rgb, a], -1)

    @staticmethod
    def _log_psnr(dec16, rgb):
        dec = (
            np.frombuffer(
                np.ascontiguousarray(dec16[..., :3]).astype("<u2").tobytes(),
                np.float16,
            )
            .reshape(rgb.shape)
            .astype(np.float64)
        )
        a = np.log2(np.maximum(dec, 1e-6))
        r = np.log2(np.maximum(rgb, 1e-6))
        mse = ((a - r) ** 2).mean()
        span = r.max() - r.min()
        return 10 * np.log10(span * span / max(mse, 1e-12))

    @pytest.mark.parametrize("content", ["lerp", "noise", "alpha"])
    @pytest.mark.parametrize("quality", [2, 4])
    def test_astc_hdr_psnr_not_below_cpu_reference(self, content, quality):
        from cuttlefish_tpu.decode.astc import decode_astc_hdr
        from cuttlefish_tpu.kernels.astc import encode_astc_hdr

        b = self._content(content)
        rgb = b[..., :3]
        wt = np.asarray(
            encode_astc_hdr(b, 4, 4, quality=quality)
        ).astype("<u4")
        p_tpu = self._log_psnr(
            decode_astc_hdr(
                np.ascontiguousarray(wt).view(np.uint8), 4, 4
            ),
            rgb,
        )
        wc = native.astc_hdr_encode_cpu(b, quality=quality)
        p_cpu = self._log_psnr(decode_astc_hdr(wc.reshape(-1), 4, 4), rgb)
        assert p_tpu >= p_cpu - TIE_DB, (content, quality, p_tpu, p_cpu)


def _sized_content(name: str, bw: int, bh: int, n: int = 128) -> np.ndarray:
    rng = np.random.default_rng(23)
    T = bw * bh
    if name == "lerp":
        c0 = rng.random((n, 1, 4), np.float32)
        c1 = rng.random((n, 1, 4), np.float32)
        t = rng.random((n, T, 1), np.float32)
        out = np.clip(c0 + (c1 - c0) * t, 0, 1).astype(np.float32)
    else:  # two populations
        pick = rng.random((n, T, 1)) < 0.5
        out = np.where(
            pick, rng.random((n, 1, 4)), rng.random((n, 1, 4))
        ).astype(np.float32)
        out = np.clip(
            out + rng.normal(0, 0.02, out.shape), 0, 1
        ).astype(np.float32)
    out[..., 3] = 1.0
    return out


class TestAstcSizedVsCpuReference:
    """TPU-path ASTC 6x6/8x8 >= the generalized CPU encoder (decimated
    weight grids via spec bilinear infill, LS grid fit + coordinate
    refine, 2-partition screening without the small-block coordinate
    doubling) — the north-star bar beyond 4x4."""

    # Round 5: the Pallas fitters run the same Gauss-Seidel grid refine
    # on decimated grids (checkerboard-class steps, kernels/astc_pallas
    # _gs_refine), closing the 12x12 gap — all four sizes asserted.
    @pytest.mark.parametrize("bw,bh", [(6, 6), (8, 8), (10, 10), (12, 12)])
    @pytest.mark.parametrize("content", ["lerp", "pop"])
    @pytest.mark.parametrize(
        "quality",
        [2, pytest.param(4, marks=pytest.mark.slow)],
    )
    def test_sized_psnr_not_below_cpu_reference(self, bw, bh, content,
                                                quality):
        from cuttlefish_tpu.decode.astc import decode_astc
        from cuttlefish_tpu.kernels.astc import encode_astc

        blocks = _sized_content(content, bw, bh)
        ref = blocks * 255.0
        wt = np.asarray(encode_astc(blocks, bw, bh, quality=quality))
        p_tpu = _psnr(
            decode_astc(
                np.ascontiguousarray(wt.astype("<u4")).view(np.uint8), bw, bh
            ),
            ref,
        )
        wc = native.astc_sized_encode_cpu(blocks, bw, bh, quality=quality)
        p_cpu = _psnr(decode_astc(wc.reshape(-1), bw, bh), ref)
        assert p_tpu >= p_cpu - TIE_DB, (bw, content, quality, p_tpu, p_cpu)
