"""PSNR harness for kernel-change validation (runs on the attached TPU).

Encodes several content classes with the Pallas BC7/ASTC kernels at each
quality, decodes with the spec decoders, and prints per-(format, quality,
content) PSNR.  Run before and after a kernel change to verify quality is
preserved while speed improves.

Usage: python tools/quality_check.py [bc7|astc|all]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.makedirs("/tmp/jaxcache", exist_ok=True)
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def content_sets(nblocks=4096, seed=0):
    """Named [N,16,4] float RGBA block batches covering the code paths."""
    rng = np.random.default_rng(seed)
    out = {}

    # Two-color lerp per block + noise (the test suite's staple).
    c0 = rng.random((nblocks, 1, 4)).astype(np.float32)
    c1 = rng.random((nblocks, 1, 4)).astype(np.float32)
    t = rng.random((nblocks, 16, 1)).astype(np.float32)
    two = c0 + (c1 - c0) * t
    two[..., 3] = 1.0
    out["two_lerp"] = np.clip(two, 0, 1)

    # Two-population blocks (distinct color clusters -> partitions win).
    pick = rng.random((nblocks, 16, 1)) < 0.5
    ca = rng.random((nblocks, 1, 4)).astype(np.float32)
    cb = rng.random((nblocks, 1, 4)).astype(np.float32)
    twopop = np.where(pick, ca, cb).astype(np.float32)
    twopop += rng.normal(0, 0.02, twopop.shape).astype(np.float32)
    twopop[..., 3] = 1.0
    out["two_pop"] = np.clip(twopop, 0, 1)

    # Smooth gradient surface (bench content).
    size = int(np.sqrt(nblocks)) * 4
    y, x = np.mgrid[0:size, 0:size].astype(np.float32) / size
    surf = np.stack(
        [
            0.5 + 0.5 * np.sin(6.0 * x + 2.0 * y),
            0.5 + 0.5 * np.cos(4.0 * y + x),
            0.5 + 0.5 * np.sin(3.0 * (x + y)),
            np.ones_like(x),
        ],
        axis=-1,
    ).astype(np.float32)
    surf += rng.normal(0, 0.02, surf.shape).astype(np.float32)
    surf = np.clip(surf, 0, 1)
    nby, nbx = size // 4, size // 4
    out["gradient"] = (
        surf.reshape(nby, 4, nbx, 4, 4).transpose(0, 2, 1, 3, 4)
        .reshape(nby * nbx, 16, 4)
    )

    # Alpha ramp blocks (modes 4/5/7 paths).
    al = two.copy()
    al[..., 3] = (0.2 + 0.7 * t[..., 0]).astype(np.float32)
    out["alpha_ramp"] = np.clip(al, 0, 1)

    # Pure noise (worst case).
    out["noise"] = rng.random((nblocks, 16, 4)).astype(np.float32)
    return out


def psnr(a, b):
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return 99.0 if mse <= 0 else 10.0 * np.log10(1.0 / mse)


def check_bc7(qualities=(2, 3, 4)):
    from cuttlefish_tpu.decode.bc7 import decode_bc7
    from cuttlefish_tpu.kernels.bc7_pallas import encode_bc7_pallas

    for name, blocks in content_sets().items():
        row = []
        for q in qualities:
            words = np.asarray(encode_bc7_pallas(blocks, quality=q))
            sub = np.ascontiguousarray(words[::16].astype("<u4")).view(
                np.uint8
            )
            dec = decode_bc7(sub)  # [N/16,16,4] u8
            row.append(f"q{q}={psnr(dec / 255.0, blocks[::16]):.3f}")
        print(f"bc7 {name}: " + " ".join(row), flush=True)


def check_astc(qualities=(2, 3, 4)):
    from cuttlefish_tpu.decode.astc import decode_astc
    from cuttlefish_tpu.kernels.astc_pallas import encode_astc_pallas

    for name, blocks in content_sets(nblocks=1024).items():
        row = []
        for q in qualities:
            words = np.asarray(
                encode_astc_pallas(blocks, 4, 4, q, gray=False)
            )
            sub = np.ascontiguousarray(words[::8].astype("<u4")).view(
                np.uint8
            )
            dec = decode_astc(sub, 4, 4)  # [N/8,16,4] u8
            row.append(f"q{q}={psnr(dec / 255.0, blocks[::8]):.3f}")
        print(f"astc {name}: " + " ".join(row), flush=True)


def check_bc6h(qualities=(2, 4)):
    from cuttlefish_tpu.decode.bc6h import decode_bc6h_f32
    from cuttlefish_tpu.kernels.bc6h_pallas import encode_bc6h_pallas

    for name, blocks in content_sets(nblocks=2048).items():
        hdr = blocks[..., :3] * 8.0  # HDR range
        row = []
        for q in qualities:
            words = np.asarray(encode_bc6h_pallas(hdr, quality=q))
            sub = np.ascontiguousarray(words[::8].astype("<u4")).view(
                np.uint8
            )
            dec = decode_bc6h_f32(sub)
            ref = hdr[::8]
            mse = float(np.mean((dec - ref) ** 2))
            peak = float(ref.max()) ** 2
            row.append(f"q{q}={10*np.log10(peak/mse):.3f}")
        print(f"bc6h {name}: " + " ".join(row), flush=True)


def check_etc(qualities=(2, 4)):
    from cuttlefish_tpu.decode.etc import decode_eac_alpha, decode_etc_rgb
    from cuttlefish_tpu.kernels.etc_pallas import (
        encode_eac_alpha_pallas,
        encode_etc_rgb_pallas,
    )

    for name, blocks in content_sets(nblocks=2048).items():
        row = []
        for q in qualities:
            words = np.asarray(encode_etc_rgb_pallas(blocks, q, True))
            sub = np.ascontiguousarray(words[::8].astype("<u4")).view(
                np.uint8
            )
            dec = decode_etc_rgb(sub, etc2=True)
            row.append(f"q{q}={psnr(dec / 255.0, blocks[::8, :, :3]):.3f}")
        print(f"etc2 {name}: " + " ".join(row), flush=True)

    al = content_sets(nblocks=2048)["alpha_ramp"][..., 3]
    row = []
    for q in qualities:
        words = np.asarray(encode_eac_alpha_pallas(al, q))
        sub = np.ascontiguousarray(words[::8].astype("<u4")).view(np.uint8)
        dec = decode_eac_alpha(sub)
        row.append(f"q{q}={psnr(dec / 255.0, al[::8]):.3f}")
    print("eac_a8 alpha_ramp: " + " ".join(row), flush=True)

    # ETC2 A1 punch-through: hard-alpha content; mask exactness + RGB dB.
    from cuttlefish_tpu.decode.etc import decode_etc2_a1
    from cuttlefish_tpu.kernels.etc import encode_etc2_a1

    a1 = content_sets(nblocks=1024)["two_lerp"].copy()
    rngl = np.random.default_rng(5)
    a1[..., 3] = (rngl.random(a1.shape[:2]) > 0.3).astype(np.float32)
    row = []
    for q in qualities:
        words = np.asarray(encode_etc2_a1(a1, q))
        sub = np.ascontiguousarray(words[::8].astype("<u4")).view(np.uint8)
        dec = decode_etc2_a1(sub)
        m = a1[::8, :, 3] >= 0.5
        ok = np.array_equal(dec[..., 3] > 127, m)
        mse = (
            ((dec[..., :3] / 255.0 - a1[::8, :, :3]) ** 2) * m[..., None]
        ).sum() / max(m.sum() * 3, 1)
        row.append(f"q{q}={10*np.log10(1.0/max(mse,1e-12)):.3f}(mask={'ok' if ok else 'BAD'})")
    print("etc2_a1 two_lerp+punch: " + " ".join(row), flush=True)


def check_corpus(qualities=(2,)):
    """Real-image corpus rows (tests/fixtures/corpus, tools/make_corpus.py)."""
    from cuttlefish_tpu.decode.astc import decode_astc
    from cuttlefish_tpu.decode.bc7 import decode_bc7
    from cuttlefish_tpu.decode.etc import decode_etc_rgb
    from cuttlefish_tpu.image.image import Image
    from cuttlefish_tpu.kernels.astc import encode_astc
    from cuttlefish_tpu.kernels.bc7 import encode_bc7
    from cuttlefish_tpu.kernels.etc import encode_etc_rgb

    fix = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures", "corpus",
    )

    def blocks_of(name):
        img = Image(os.path.join(fix, name))
        s = np.asarray(img.rgbaf(), np.float32)
        h, w, c = s.shape
        return (
            s.reshape(h // 4, 4, w // 4, 4, c)
            .transpose(0, 2, 1, 3, 4)
            .reshape(-1, 16, c)
        )

    for img_name in ("photo.png", "ui_atlas.png", "normal.png"):
        blocks = blocks_of(img_name)
        for q in qualities:
            wb = np.asarray(encode_bc7(blocks, quality=q))
            db = decode_bc7(
                np.ascontiguousarray(wb.astype("<u4")).view(np.uint8)
            )
            wa = np.asarray(encode_astc(blocks, 4, 4, quality=q))
            da = decode_astc(
                np.ascontiguousarray(wa.astype("<u4")).view(np.uint8), 4, 4
            )
            we = np.asarray(encode_etc_rgb(blocks, quality=q, etc2=True))
            de = decode_etc_rgb(
                np.ascontiguousarray(we.astype("<u4")).view(np.uint8),
                etc2=True,
            )
            print(
                f"corpus {img_name[:-4]} q{q}: "
                f"bc7={psnr(db / 255.0, blocks):.3f} "
                f"astc={psnr(da / 255.0, blocks):.3f} "
                f"etc2={psnr(de / 255.0, blocks[..., :3]):.3f}",
                flush=True,
            )


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(f"devices: {jax.devices()}", flush=True)
    if which in ("bc7", "all"):
        check_bc7()
    if which in ("astc", "all"):
        check_astc()
    if which in ("bc6h", "all"):
        check_bc6h()
    if which in ("etc", "all"):
        check_etc()
    if which in ("corpus", "all"):
        check_corpus()
