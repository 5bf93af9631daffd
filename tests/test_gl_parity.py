"""Independent bitstream validation: Mesa llvmpipe GL decoders vs ours.

Every compressed family we emit is decoded by Mesa's software GL (a
Khronos-conformant implementation we did not write) via
glCompressedTexImage2D + glGetTexImage and compared against our own spec
decoders.  This is the SURVEY.md §4 tier-(a) external parity requirement
for the families PIL cannot decode (ETC2/EAC, ASTC, BC6H, RGTC); the
reference gets the same guarantee implicitly by shipping third-party
encoders that real GPU drivers consume (`/root/reference/README.md:21-36`).

Exactness notes: BC7, ETC2/EAC and ASTC decoding is exactly specified —
zero tolerance.  S3TC (BC1-3) and RGTC (BC4/5) interpolation is allowed
to differ by 1 LSB between decoders (ideal vs bit-shift thirds/sevenths).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from cuttlefish_tpu import decode
from cuttlefish_tpu.kernels import astc as kastc
from cuttlefish_tpu.kernels import bc as kbc
from cuttlefish_tpu.kernels import bc6h as kbc6h
from cuttlefish_tpu.kernels import bc7 as kbc7
from cuttlefish_tpu.kernels import etc as ketc

from gl_oracle import gl_available, gl_decode, gl_has_extension

pytestmark = pytest.mark.skipif(
    not gl_available(), reason="no Mesa/EGL software GL available"
)

N = 64


def _rand_blocks(seed, texels=16, channels=4, smooth=False):
    rng = np.random.default_rng(seed)
    arr = rng.random((N, texels, channels)).astype(np.float32)
    if smooth:
        arr = (arr + np.roll(arr, 1, 1) + np.roll(arr, -1, 1)) / 3.0
    return arr.astype(np.float32)


def _gl_blocks(data: bytes, fmt: str, bw=4, bh=4, float_out=False):
    """Decode N horizontally-tiled blocks; return [N, bw*bh, 4]."""
    img = gl_decode(data, bw * N, bh, fmt, float_out=float_out)
    return (
        img.reshape(bh, N, bw, 4).transpose(1, 0, 2, 3).reshape(N, bh * bw, 4)
    )


def _bytes(words) -> bytes:
    return np.asarray(words).astype("<u4").tobytes()


# ---------------------------------------------------------------------------
# S3TC / RGTC
# ---------------------------------------------------------------------------


def test_bc1_vs_gl():
    blocks = _rand_blocks(10)
    blocks[..., 3] = 1.0
    data = _bytes(kbc.encode_bc1(jnp.asarray(blocks), quality=2))
    ours = decode.decode_bc1(np.frombuffer(data, np.uint8))
    gl = _gl_blocks(data, "COMPRESSED_RGBA_S3TC_DXT1")
    assert np.abs(gl.astype(int) - ours.astype(int)).max() <= 1


def test_bc1_punchthrough_vs_gl():
    blocks = _rand_blocks(11)
    blocks[:, ::3, 3] = 0.0  # transparent texels
    data = _bytes(kbc.encode_bc1(jnp.asarray(blocks), quality=2, punch_through=True))
    ours = decode.decode_bc1(np.frombuffer(data, np.uint8))
    gl = _gl_blocks(data, "COMPRESSED_RGBA_S3TC_DXT1")
    assert np.array_equal(gl[..., 3], ours[..., 3])  # alpha is exact
    assert np.abs(gl.astype(int) - ours.astype(int)).max() <= 1


def test_bc2_vs_gl():
    blocks = _rand_blocks(12)
    data = _bytes(kbc.encode_bc2(jnp.asarray(blocks), quality=2))
    ours = decode.decode_bc2(np.frombuffer(data, np.uint8))
    gl = _gl_blocks(data, "COMPRESSED_RGBA_S3TC_DXT3")
    assert np.array_equal(gl[..., 3], ours[..., 3])  # explicit 4-bit alpha
    assert np.abs(gl.astype(int) - ours.astype(int)).max() <= 1


def test_bc3_vs_gl():
    blocks = _rand_blocks(13)
    data = _bytes(kbc.encode_bc3(jnp.asarray(blocks), quality=2))
    ours = decode.decode_bc3(np.frombuffer(data, np.uint8))
    gl = _gl_blocks(data, "COMPRESSED_RGBA_S3TC_DXT5")
    assert np.abs(gl.astype(int) - ours.astype(int)).max() <= 1


@pytest.mark.parametrize("signed", [False, True])
def test_bc4_vs_gl(signed):
    vals = _rand_blocks(14, channels=1)[..., 0]
    if signed:
        vals = vals * 2.0 - 1.0
    data = _bytes(kbc.encode_bc4(jnp.asarray(vals), quality=2, signed=signed))
    ours = decode.decode_bc4(np.frombuffer(data, np.uint8), signed=signed)
    fmt = "COMPRESSED_SIGNED_RED_RGTC1" if signed else "COMPRESSED_RED_RGTC1"
    gl = _gl_blocks(data, fmt, float_out=True)[..., 0]
    tol = 2.0 / 127.0 if signed else 2.0 / 255.0
    assert np.abs(gl - ours).max() <= tol


@pytest.mark.parametrize("signed", [False, True])
def test_bc5_vs_gl(signed):
    vals = _rand_blocks(15, channels=2)
    if signed:
        vals = vals * 2.0 - 1.0
    data = _bytes(kbc.encode_bc5(jnp.asarray(vals), quality=2, signed=signed))
    ours = decode.decode_bc5(np.frombuffer(data, np.uint8), signed=signed)
    fmt = "COMPRESSED_SIGNED_RG_RGTC2" if signed else "COMPRESSED_RG_RGTC2"
    gl = _gl_blocks(data, fmt, float_out=True)[..., :2]
    tol = 2.0 / 127.0 if signed else 2.0 / 255.0
    assert np.abs(gl - ours).max() <= tol


# ---------------------------------------------------------------------------
# BPTC (BC6H / BC7) — exactly specified, zero tolerance
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("signed", [False, True])
def test_bc6h_vs_gl(signed):
    rng = np.random.default_rng(16)
    blocks = rng.random((N, 16, 3)).astype(np.float32) * 8.0
    if signed:
        blocks = blocks - 4.0
    data = _bytes(kbc6h.encode_bc6h(jnp.asarray(blocks), quality=2, signed=signed))
    ours = decode.decode_bc6h_f32(np.frombuffer(data, np.uint8), signed=signed)
    fmt = (
        "COMPRESSED_RGB_BPTC_SIGNED_FLOAT"
        if signed
        else "COMPRESSED_RGB_BPTC_UNSIGNED_FLOAT"
    )
    gl = _gl_blocks(data, fmt, float_out=True)[..., :3]
    assert np.array_equal(gl, ours.astype(np.float32))


@pytest.mark.parametrize("quality", [1, 3])
def test_bc7_vs_gl(quality):
    blocks = _rand_blocks(17)
    blocks[: N // 2, :, 3] = 1.0  # half opaque, half alpha-carrying
    data = _bytes(kbc7.encode_bc7(jnp.asarray(blocks), quality=quality))
    ours = decode.decode_bc7(np.frombuffer(data, np.uint8))
    gl = _gl_blocks(data, "COMPRESSED_RGBA_BPTC_UNORM")
    assert np.array_equal(gl, ours)


# ---------------------------------------------------------------------------
# ETC1 / ETC2 / EAC — exactly specified, zero tolerance
# ---------------------------------------------------------------------------


def test_etc1_vs_gl():
    blocks = _rand_blocks(18, channels=3)
    data = _bytes(ketc.encode_etc_rgb(jnp.asarray(blocks), quality=2, etc2=False))
    ours = decode.decode_etc_rgb(np.frombuffer(data, np.uint8), etc2=False)
    gl = _gl_blocks(data, "COMPRESSED_RGB8_ETC2")[..., :3]  # superset decode
    assert np.array_equal(gl, ours)


def test_etc2_rgb_vs_gl():
    # Random content exercises individual/differential; smooth biases planar;
    # two-cluster content biases T/H.
    rng = np.random.default_rng(19)
    rand = rng.random((N // 2, 16, 3)).astype(np.float32)
    c1 = rng.random((N // 2, 1, 3)).astype(np.float32)
    c2 = rng.random((N // 2, 1, 3)).astype(np.float32)
    pick = rng.random((N // 2, 16, 1)) > 0.5
    clustered = np.where(pick, c1, c2).astype(np.float32)
    blocks = np.concatenate([rand, clustered], axis=0)
    data = _bytes(ketc.encode_etc_rgb(jnp.asarray(blocks), quality=2, etc2=True))
    ours = decode.decode_etc_rgb(np.frombuffer(data, np.uint8), etc2=True)
    gl = _gl_blocks(data, "COMPRESSED_RGB8_ETC2")[..., :3]
    assert np.array_equal(gl, ours)


def test_etc2_a1_vs_gl():
    blocks = _rand_blocks(20)
    blocks[: N // 2, :, 3] = 1.0  # opaque half exercises T/H/planar
    data = _bytes(ketc.encode_etc2_a1(jnp.asarray(blocks), quality=2))
    ours = decode.decode_etc2_a1(np.frombuffer(data, np.uint8))
    gl = _gl_blocks(data, "COMPRESSED_RGB8_PUNCHTHROUGH_ALPHA1_ETC2")
    assert np.array_equal(gl, ours)


def test_etc2_a1_punch_th_vs_gl():
    """Two-cluster chroma-split content with punched texels biases the
    punch-through T/H candidates; verify the emitted bitstreams (opaque
    bit 0, palette entry 2 transparent) against Mesa."""
    rng = np.random.default_rng(23)
    c1 = rng.random((N, 1, 3)).astype(np.float32)
    c2 = rng.random((N, 1, 3)).astype(np.float32)
    pick = rng.random((N, 16, 1)) > 0.5
    rgb = np.where(pick, c1, c2).astype(np.float32)
    alpha = (rng.random((N, 16, 1)) > 0.25).astype(np.float32)
    blocks = np.concatenate([rgb, alpha], axis=-1)
    data = _bytes(ketc.encode_etc2_a1(jnp.asarray(blocks), quality=2))
    # The encoder must actually have chosen T or H for some block
    # (opaque bit 0 + R or G differential overflow).
    raw = np.frombuffer(data, np.uint8).reshape(N, 8)
    chose_th = 0
    for row in raw:
        block = int.from_bytes(row.tobytes(), "big")
        if (block >> 33) & 1:
            continue
        b1 = [(block >> 59) & 0x1F, (block >> 51) & 0x1F, (block >> 43) & 0x1F]
        d2 = [
            (v - 8 if v & 4 else v)
            for v in ((block >> 56) & 7, (block >> 48) & 7, (block >> 40) & 7)
        ]
        if not (0 <= b1[0] + d2[0] <= 31) or not (0 <= b1[1] + d2[1] <= 31):
            chose_th += 1
    assert chose_th > 0
    ours = decode.decode_etc2_a1(raw)
    gl = _gl_blocks(data, "COMPRESSED_RGB8_PUNCHTHROUGH_ALPHA1_ETC2")
    assert np.array_equal(gl, ours)


def test_etc2_rgba_vs_gl():
    blocks = _rand_blocks(21)
    data = _bytes(ketc.encode_etc2_rgba(jnp.asarray(blocks), quality=2))
    raw = np.frombuffer(data, np.uint8).reshape(N, 16)
    ours_rgb = decode.decode_etc_rgb(raw[:, 8:].reshape(-1), etc2=True)
    ours_a = decode.decode_eac_alpha(raw[:, :8].reshape(-1))
    gl = _gl_blocks(data, "COMPRESSED_RGBA8_ETC2_EAC")
    assert np.array_equal(gl[..., :3], ours_rgb)
    assert np.array_equal(gl[..., 3], ours_a)


@pytest.mark.parametrize("signed", [False, True])
def test_eac_r11_vs_gl(signed):
    vals = _rand_blocks(22, channels=1)[..., 0]
    if signed:
        vals = vals * 2.0 - 1.0
    data = _bytes(ketc.encode_eac_r11(jnp.asarray(vals), quality=2, signed=signed))
    ours = decode.decode_eac_r11(np.frombuffer(data, np.uint8), signed=signed)
    fmt = "COMPRESSED_SIGNED_R11_EAC" if signed else "COMPRESSED_R11_EAC"
    gl = _gl_blocks(data, fmt, float_out=True)[..., 0]
    assert np.abs(gl - ours).max() <= 1e-4


@pytest.mark.parametrize("signed", [False, True])
def test_eac_rg11_vs_gl(signed):
    vals = _rand_blocks(23, channels=2)
    if signed:
        vals = vals * 2.0 - 1.0
    data = _bytes(ketc.encode_eac_rg11(jnp.asarray(vals), quality=2, signed=signed))
    raw = np.frombuffer(data, np.uint8).reshape(N, 16)
    ours_r = decode.decode_eac_r11(raw[:, :8].reshape(-1), signed=signed)
    ours_g = decode.decode_eac_r11(raw[:, 8:].reshape(-1), signed=signed)
    fmt = "COMPRESSED_SIGNED_RG11_EAC" if signed else "COMPRESSED_RG11_EAC"
    gl = _gl_blocks(data, fmt, float_out=True)
    assert np.abs(gl[..., 0] - ours_r).max() <= 1e-4
    assert np.abs(gl[..., 1] - ours_g).max() <= 1e-4


# ---------------------------------------------------------------------------
# ASTC LDR — exactly specified, zero tolerance
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "bw,bh", [(4, 4), (6, 6), (8, 8), (10, 10), (12, 12)]
)
def test_astc_vs_gl(bw, bh):
    if not gl_has_extension("GL_KHR_texture_compression_astc_ldr"):
        pytest.skip("no ASTC LDR in GL")
    blocks = _rand_blocks(24, texels=bw * bh, smooth=True)
    blocks[: N // 2, :, 3] = 1.0
    data = _bytes(
        kastc.encode_astc(jnp.asarray(blocks), block_w=bw, block_h=bh, quality=2)
    )
    ours = decode.decode_astc(np.frombuffer(data, np.uint8), bw, bh)
    gl = _gl_blocks(data, f"COMPRESSED_RGBA_ASTC_{bw}x{bh}", bw=bw, bh=bh)
    assert np.array_equal(gl, ours)


def test_astc_3partition_vs_gl():
    """3-partition bitstreams decode identically on Mesa's ASTC decoder."""
    if not gl_has_extension("GL_KHR_texture_compression_astc_ldr"):
        pytest.skip("no ASTC LDR in GL")
    rng = np.random.default_rng(9)
    cols = rng.random((N, 3, 1, 4)).astype(np.float32)
    assign = rng.integers(0, 3, (N, 16))
    blocks = np.take_along_axis(cols, assign[:, None, :, None], 1)[:, 0]
    blocks = (
        (blocks + rng.normal(0, 0.01, blocks.shape)).astype(np.float32).clip(0, 1)
    )
    blocks[..., 3] = 1.0
    data = _bytes(kastc.encode_astc(jnp.asarray(blocks), 4, 4, quality=3))
    w0 = np.frombuffer(data, np.uint8).reshape(-1, 16)[:, :4].copy().view(np.uint32)[:, 0]
    assert (((w0 >> 11) & 3) + 1 == 3).any()  # 3-partition blocks emitted
    ours = decode.decode_astc(np.frombuffer(data, np.uint8), 4, 4)
    gl = _gl_blocks(data, "COMPRESSED_RGBA_ASTC_4x4", bw=4, bh=4)
    assert np.array_equal(gl, ours)


def test_astc_cem0_cem4_vs_gl():
    """Luminance (CEM 0) and luminance+alpha (CEM 4) bitstreams decode
    identically on Mesa's independent ASTC decoder."""
    if not gl_has_extension("GL_KHR_texture_compression_astc_ldr"):
        pytest.skip("no ASTC LDR in GL")
    rng = np.random.default_rng(7)
    g0 = rng.random((N // 2, 1, 1), np.float32)
    g1 = rng.random((N // 2, 1, 1), np.float32)
    t = rng.random((N // 2, 16, 1), np.float32)
    g = g0 * t + g1 * (1 - t)
    gray = np.concatenate([g, g, g, np.ones_like(g)], -1)
    la = np.concatenate([g, g, g, np.clip(0.2 + 0.6 * t, 0, 1)], -1)
    blocks = np.concatenate([gray, la]).astype(np.float32)
    data = _bytes(kastc.encode_astc(jnp.asarray(blocks), 4, 4, quality=2))
    words0 = np.frombuffer(data, np.uint8).reshape(-1, 16)
    w0 = words0[:, :4].copy().view(np.uint32)[:, 0]
    cems = ((w0 >> 13) & 0xF)[((w0 >> 11) & 3) == 0]
    assert (cems == 0).any() and (cems == 4).any()  # both modes emitted
    ours = decode.decode_astc(np.frombuffer(data, np.uint8), 4, 4)
    gl = _gl_blocks(data, "COMPRESSED_RGBA_ASTC_4x4", bw=4, bh=4)
    assert np.array_equal(gl, ours)


# ---------------------------------------------------------------------------
# ASTC table re-derivation probes (the ground truth behind astc_ise tables)
# ---------------------------------------------------------------------------


def _astc_probe_mode(gw, gh, wlevels):
    from cuttlefish_tpu.kernels.astc import block_mode_field

    return block_mode_field(gw, gh, wlevels)


def test_astc_trit_quint_tables_vs_gl():
    """Weight-range-3/5 probe blocks expose raw trit/quint digits."""
    if not gl_has_extension("GL_KHR_texture_compression_astc_ldr"):
        pytest.skip("no ASTC LDR in GL")
    from cuttlefish_tpu.kernels import astc_ise as ise

    w2byte = {(((0xFFFF * w + 32) >> 6) >> 8): w for w in range(65)}

    def build(weight_bits_int, nbits, mode):
        blk = mode | (8 << 13)
        pos = 17
        for v in (0, 255, 0, 255, 0, 255):
            blk |= v << pos
            pos += 8
        for i in range(nbits):
            if (weight_bits_int >> i) & 1:
                blk |= 1 << (127 - i)
        return blk.to_bytes(16, "little")

    blocks = b"".join(build(t8, 26, _astc_probe_mode(4, 4, 3)) for t8 in range(256))
    img = gl_decode(blocks, 4 * 256, 4, "COMPRESSED_RGBA_ASTC_4x4")
    px = img.reshape(4, 256, 4, 4)
    unq3 = {0: 0, 32: 1, 64: 2}
    for t8 in range(256):
        ws = [int(px[0, t8, c, 0]) for c in range(4)] + [int(px[1, t8, 0, 0])]
        got = tuple(unq3[w2byte[w]] for w in ws)
        assert got == ise.decode_trit_block(t8), t8

    blocks = b"".join(build(q7, 38, _astc_probe_mode(4, 4, 5)) for q7 in range(128))
    img = gl_decode(blocks, 4 * 128, 4, "COMPRESSED_RGBA_ASTC_4x4")
    px = img.reshape(4, 128, 4, 4)
    unq5 = {0: 0, 16: 1, 32: 2, 48: 3, 64: 4}
    for q7 in range(128):
        ws = [int(px[0, q7, c, 0]) for c in range(3)]
        got = tuple(unq5[w2byte[w]] for w in ws)
        assert got == ise.decode_quint_block(q7), q7


@pytest.mark.parametrize("nparts", [2, 3])
def test_astc_partition_table_vs_gl(nparts):
    """Solid per-partition colors expose the seed-hash texel assignment."""
    if not gl_has_extension("GL_KHR_texture_compression_astc_ldr"):
        pytest.skip("no ASTC LDR in GL")
    from cuttlefish_tpu.kernels import astc_ise as ise
    from cuttlefish_tpu.kernels.astc_partition import partition_table

    clevels = 40 if nparts == 2 else 12
    vals = []
    for k in range(nparts):
        chan = [0, 0] * 3
        chan[2 * k] = chan[2 * k + 1] = 1
        vals += chan
    cbits, ncb = ise.ise_encode(np.asarray([vals], np.int64), clevels, False)
    blocks = []
    mode = _astc_probe_mode(4, 4, 4)
    for seed in range(1024):
        blk = mode | ((nparts - 1) << 11) | (seed << 13) | ((8 << 2) << 23)
        for i in range(ncb):
            if cbits[0, i]:
                blk |= 1 << (29 + i)
        blocks.append(blk.to_bytes(16, "little"))
    img = gl_decode(b"".join(blocks), 4 * 1024, 4, "COMPRESSED_RGBA_ASTC_4x4")
    px = img.reshape(4, 1024, 4, 4).transpose(1, 0, 2, 3)
    gl_part = np.argmax(px[..., :3], axis=-1).reshape(1024, 16)
    assert np.array_equal(gl_part, partition_table(4, 4, nparts))
