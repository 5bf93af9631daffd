"""Foreign ASTC bitstream decode vs the Mesa GL oracle.

The in-repo encoders emit a subset of the ASTC bitstream space; foreign
files (astcenc/toktx output) exercise the rest: per-partition CEM
variation, base+offset CEMs (1/5/9/13), and the extended block-mode rows
(12xN / Nx12 / (A+6)x(B+6) / 6x10 / 10x6 weight grids).  VERDICT round-3
item 2: these must decode (Image()/`--texture-info` ingest), and anything
still out of scope must fail gracefully, never traceback.

These tests hand-assemble targeted bitstreams (the same probe-block
technique as tests/test_gl_parity.py) and require byte-equality between
`decode.astc.decode_astc` and Mesa's independent spec decoder.  Reference
behavior being matched: FreeImage ingest never crashes on valid input it
claims to read (/root/reference/lib/src/Image.cpp:870-922).
"""

from __future__ import annotations

import io

import numpy as np
import pytest

from cuttlefish_tpu.decode import astc as decode
from cuttlefish_tpu.kernels import astc_ise as ise
from cuttlefish_tpu.kernels.astc import block_mode_field

from gl_oracle import gl_available, gl_decode, gl_has_extension

pytestmark = pytest.mark.skipif(not gl_available(), reason="no GL oracle")


def _need_astc():
    if not gl_has_extension("GL_KHR_texture_compression_astc_ldr"):
        pytest.skip("no ASTC LDR in GL")


def _build_block(
    mode: int,
    cems: list[int],
    color_vals: list[int],
    weight_vals: list[int],
    wlevels: int,
    seed: int = 0,
) -> bytes:
    """Assemble one 128-bit ASTC block from parsed-out fields.

    Layout per spec C.2: block mode bits [10:0], partition count [12:11],
    CEM (single-partition: [16:13]; multi: 6-bit field at [28:23] with
    the per-partition variation overflow directly below the weights),
    color ISE upward from 17/29, weight ISE downward from 127.
    """
    nparts = len(cems)
    blk = mode | ((nparts - 1) << 11)

    wkind, wb = ise.range_info(wlevels, True)
    wbits = ise.ise_bits(len(weight_vals), wkind, wb)

    extra_cem = 0
    if nparts == 1:
        blk |= cems[0] << 13
        color_start = 17
    else:
        blk |= seed << 13
        color_start = 29
        classes = [c >> 2 for c in cems]
        if len(set(cems)) == 1:
            blk |= (cems[0] << 2) << 23
        else:
            base_class = min(classes)
            assert max(classes) - base_class <= 1, "CEM classes must span <=1"
            extra_cem = max(0, 3 * nparts - 4)
            stream = 0
            for i, c in enumerate(cems):
                stream |= ((c >> 2) - base_class) << i
                stream |= (c & 0x3) << (nparts + 2 * i)
            blk |= (base_class + 1) << 23
            for i in range(4):
                blk |= ((stream >> i) & 1) << (25 + i)
            hi = stream >> 4
            blk |= hi << (128 - wbits - extra_cem)

    nvals = sum(2 * ((c >> 2) + 1) for c in cems)
    assert len(color_vals) == nvals
    budget = 128 - color_start - wbits - extra_cem
    clevels = decode.implied_color_range(nvals, budget)
    cbits, ncb = ise.ise_encode(
        np.asarray([color_vals], np.int64) % clevels, clevels, False
    )
    assert color_start + ncb <= 128 - wbits - extra_cem
    for i in range(ncb):
        if cbits[0, i]:
            blk |= 1 << (color_start + i)

    wbits_arr, nwb = ise.ise_encode(
        np.asarray([weight_vals], np.int64) % wlevels, wlevels, True
    )
    assert nwb == wbits
    for i in range(nwb):
        if wbits_arr[0, i]:
            blk |= 1 << (127 - i)
    return blk.to_bytes(16, "little")


def _check_blocks(data: bytes, bw: int, bh: int):
    n = len(data) // 16
    ours = decode.decode_astc(np.frombuffer(data, np.uint8), bw, bh)
    gl = gl_decode(data, bw * n, bh, f"COMPRESSED_RGBA_ASTC_{bw}x{bh}")
    gl = (
        gl.reshape(bh, n, bw, 4)
        .transpose(1, 0, 2, 3)
        .reshape(n, bw * bh, 4)
    )
    assert np.array_equal(gl, ours), (
        np.argwhere(gl != ours)[:4],
        gl[0, :4],
        ours[0, :4],
    )


# ---------------------------------------------------------------------------
# Base+offset CEMs (1 / 5 / 9 / 13), single partition
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("cem", [1, 5, 9, 13])
def test_astc_offset_cems_vs_gl(cem):
    _need_astc()
    rng = np.random.default_rng(cem)
    nvals = 2 * ((cem >> 2) + 1)
    mode = block_mode_field(4, 4, 4)
    data = b"".join(
        _build_block(
            mode,
            [cem],
            list(rng.integers(0, 255, nvals)),
            list(rng.integers(0, 4, 16)),
            4,
        )
        for _ in range(64)
    )
    _check_blocks(data, 4, 4)


def test_astc_cem10_rgb_scale_alpha_vs_gl():
    _need_astc()
    rng = np.random.default_rng(10)
    mode = block_mode_field(4, 4, 4)
    data = b"".join(
        _build_block(
            mode, [10], list(rng.integers(0, 255, 6)),
            list(rng.integers(0, 4, 16)), 4,
        )
        for _ in range(64)
    )
    _check_blocks(data, 4, 4)


# ---------------------------------------------------------------------------
# Per-partition CEM variation (spec C.2.11 extra-bits packing)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "cems",
    [
        [4, 8],     # class 1 + class 2 (C_i differs)
        [8, 12],    # class 2 + class 3
        [5, 6],     # same class, different low bits
        [8, 9],     # direct + offset in one block
        [4, 4, 8],  # 3 partitions, 5 extra bits
        [6, 8, 8],
    ],
)
def test_astc_per_partition_cem_vs_gl(cems):
    _need_astc()
    rng = np.random.default_rng(sum(cems))
    nvals = sum(2 * ((c >> 2) + 1) for c in cems)
    # 2-bit weights: 32 weight bits (the spec demands 24..96).
    mode = block_mode_field(4, 4, 4)
    data = b"".join(
        _build_block(
            mode,
            cems,
            list(rng.integers(0, 255, nvals)),
            list(rng.integers(0, 4, 16)),
            4,
            seed=int(rng.integers(0, 1024)),
        )
        for _ in range(64)
    )
    _check_blocks(data, 4, 4)


# ---------------------------------------------------------------------------
# Extended block-mode rows (bits[1:0] == 00) on 12x12 blocks
# ---------------------------------------------------------------------------


def _ext_mode(sel: int, a: int, b: int, r: int, h: int = 0, d: int = 0) -> int:
    """Extended-row block mode: R0=bit4, R[2:1]=bits[3:2], A=bits[6:5],
    sel=bits[8:7], B=bits[10:9] (sel 10) else H=bit9, D=bit10."""
    m = ((r >> 1) << 2) | ((r & 1) << 4) | (a << 5) | (sel << 7)
    if sel == 0b10:
        m |= b << 9
    else:
        m |= (h << 9) | (d << 10)
    return m


@pytest.mark.parametrize(
    "sel,a,b,gw,gh",
    [
        (0b00, 1, 0, 12, 3),   # 12 x (A+2)
        (0b01, 2, 0, 4, 12),   # (A+2) x 12
        (0b10, 2, 2, 8, 8),    # (A+6) x (B+6)
        (0b11, 0, 0, 6, 10),
        (0b11, 1, 0, 10, 6),
    ],
)
def test_astc_extended_block_modes_vs_gl(sel, a, b, gw, gh):
    _need_astc()
    rng = np.random.default_rng(gw * 16 + gh)
    # r=2 -> 2 weight levels: extended grids are large, keep weights 1-bit.
    mode = _ext_mode(sel, a, b, r=0b010)
    data = b"".join(
        _build_block(
            mode, [8], list(rng.integers(0, 255, 6)),
            list(rng.integers(0, 2, gw * gh)), 2,
        )
        for _ in range(16)
    )
    _check_blocks(data, 12, 12)


# ---------------------------------------------------------------------------
# Graceful ingest of out-of-scope foreign content
# ---------------------------------------------------------------------------


def _ktx2_with_block(block: bytes) -> bytes:
    """A real 4x4 ASTC_4x4 KTX2 file with its single block replaced —
    i.e. exactly what a foreign tool could hand us."""
    from cuttlefish_tpu.formats import TextureFormat, TextureType
    from cuttlefish_tpu.image.image import Image, ImageFormat
    from cuttlefish_tpu.texture import Dimension, FileType, Texture

    img = Image()
    assert img.initialize(ImageFormat.RGBAF, 4, 4)
    tex = Texture(Dimension.Dim2D, 4, 4)
    tex.set_image(img)
    tex.convert(TextureFormat.ASTC_4x4, TextureType.UNorm)
    result, raw = tex.save_to_bytes(FileType.KTX2)
    data = bytearray(raw)
    assert len(data) > 16
    data[-16:] = block  # level-0 payload is the trailing block
    return bytes(data)


def test_astc_illegal_encodings_error_color_vs_gl():
    """Illegal encodings (spec C.2.24) decode to opaque magenta on both
    decoders: reserved weight ranges, <24 weight bits, >18 color values."""
    _need_astc()
    rng = np.random.default_rng(3)
    blocks = []
    # Reserved weight range (R=0/1): mode with bits[4,3,2]=0, bits[1:0]=01.
    blocks.append((0x1 | (8 << 13)).to_bytes(16, "little"))
    # 16 one-bit weights = 16 weight bits < 24.
    blocks.append(
        _build_block(
            block_mode_field(4, 4, 2), [8],
            list(rng.integers(0, 255, 6)), list(rng.integers(0, 2, 16)), 2,
        )
    )
    # All-zero block: extended row with reserved range.
    blocks.append((0).to_bytes(16, "little"))
    data = b"".join(blocks)
    ours = decode.decode_astc(np.frombuffer(data, np.uint8), 4, 4)
    assert (ours == np.asarray([255, 0, 255, 255], np.uint8)).all()
    _check_blocks(data, 4, 4)


def test_foreign_hdr_void_extent_decodes_to_error_color():
    """An HDR void-extent block in an LDR-profile decode yields the error
    color (LDR-profile rules, like Mesa's UNORM8 path) — the file still
    loads instead of failing (ADVICE r4 item 1)."""
    from cuttlefish_tpu.image.image import Image

    blk = (0x1FC | (1 << 9)) | (0x3C00 << 64) | (0x3C00 << 80) | (0x3C00 << 96)
    raw = blk.to_bytes(16, "little")
    ours = decode.decode_astc(np.frombuffer(raw, np.uint8), 4, 4)
    assert (ours == np.asarray([255, 0, 255, 255], np.uint8)).all()
    _check_blocks(raw, 4, 4)  # Mesa also error-colors it (byte-equal)

    data = _ktx2_with_block(raw)
    img = Image(data)
    assert img.valid
    arr = np.asarray(img.array)
    assert np.allclose(arr[..., 0], 1.0) and np.allclose(arr[..., 1], 0.0)


def test_foreign_hdr_endpoint_cem_decodes_to_error_color():
    """A foreign LDR file containing a stray HDR-endpoint block (CEM 2)
    decodes that block to magenta instead of refusing the load
    (ADVICE r4 item 1)."""
    from cuttlefish_tpu.image.image import Image
    from cuttlefish_tpu.kernels.astc import block_mode_field

    # 1-partition CEM 2 (HDR luminance, large range), 4x4 grid, 2-level
    # weights: header fits, endpoint decode would need HDR machinery.
    blk = _build_block(block_mode_field(4, 4, 2), [2], [10, 200],
                       [0, 1] * 8, 2)
    ours = decode.decode_astc(np.frombuffer(blk, np.uint8), 4, 4)
    assert (ours == np.asarray([255, 0, 255, 255], np.uint8)).all()
    _check_blocks(blk, 4, 4)  # Mesa also error-colors it (byte-equal)

    img = Image(_ktx2_with_block(blk))
    assert img.valid


def test_foreign_illegal_block_loads_as_error_color():
    """A foreign KTX2 whose payload is an illegal block still loads (the
    spec decode yields the error color), exactly like GL ingest would."""
    from cuttlefish_tpu.image.image import Image

    data = _ktx2_with_block((0).to_bytes(16, "little"))
    img = Image(data)
    assert img.valid
    arr = np.asarray(img.array)
    assert np.allclose(arr[..., 0], 1.0) and np.allclose(arr[..., 1], 0.0)


@pytest.mark.parametrize("bw,bh", [(5, 5), (6, 6), (8, 8), (10, 10), (12, 12)])
def test_sized_cpu_encoder_bitstreams_vs_gl(bw, bh):
    """The generalized CPU encoder's bitstreams (decimated weight grids,
    2-partition seeds WITHOUT small-block coordinate doubling) decode
    identically on Mesa — validating the sized partition tables and the
    infill against an independent decoder."""
    _need_astc()
    from cuttlefish_tpu import native

    if not native.available():
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(31)
    T = bw * bh
    pick = rng.random((48, T, 1)) < 0.5
    blocks = np.where(
        pick, rng.random((48, 1, 4)), rng.random((48, 1, 4))
    ).astype(np.float32)
    blocks[..., 3] = 1.0
    data = native.astc_sized_encode_cpu(blocks, bw, bh, quality=2)
    _check_blocks(data.tobytes(), bw, bh)
