"""Benchmark harness: BC7 encode throughput (Mtexels/sec/chip).

Run by the driver on real TPU hardware after each round.  Prints exactly one
JSON line on stdout:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

vs_baseline is MEASURED on this machine: the native C++ BC7 encoder
(cuttlefish_tpu/native/src/bc7_cpu.cpp — same algorithm class, mode 6 +
mode 1 with full partition screening, reference-style std::thread pool over
block chunks) run on all host cores at the same quality.  The reference
itself publishes no numbers and cannot be built here (BASELINE.md).

Timing protocol: the jitted step XOR-folds all output words to one scalar
(keeps every packing bit alive — no DCE).  K dispatches are queued and the
device executes them in order; timing T(K) - T(1) removes the fixed
dispatch+fetch tunnel overhead (~25 ms) instead of paying it per
measurement.

`python bench.py --all` additionally measures the BASELINE.json config
matrix (BC1/DDS, BC3+mips/KTX, ETC2-array, BC6H+BC7-highest, ASTC ladder)
and writes BENCH_FULL.json; progress goes to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

os.makedirs("/tmp/jaxcache", exist_ok=True)
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

IMAGE = 2048
CHAIN = 10
QUALITY = 2


def _test_surface(size: int) -> np.ndarray:
    rng = np.random.default_rng(0)
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
    surf = np.clip(surf, 0.0, 1.0)
    surf[..., 3] = 1.0  # opaque fixture: the noise must not leak into alpha
    return surf


_TUNNEL_NOTE = (
    "tunnel-bound e2e config: the axon tunnel's ~25-45 ms fixed "
    "round-trip latency per dispatch dominates wall time; on a directly "
    "attached TPU this config collapses to the kernel-row throughput"
)


def _time_chained(encode_fn, blocks, nwords: int, chain: int = CHAIN) -> float:
    """Seconds per encode call, tunnel-latency amortized: queue K async
    dispatches (device executes in order), fetch once; report
    (T(K) - T(1)) / (K - 1)."""
    import jax.numpy as jnp

    @jax.jit
    def step(b):
        w = encode_fn(b)
        folded = w[:, 0]
        for c in range(1, nwords):
            folded = folded ^ w[:, c]
        return folded.astype(jnp.uint32).sum()

    placed = jax.device_put(blocks)
    float(np.asarray(step(placed)))  # warm + compile

    def run(k):
        t0 = time.perf_counter()
        outs = [step(placed) for _ in range(k)]
        float(np.asarray(outs[-1]))
        return time.perf_counter() - t0

    t1 = min(run(1) for _ in range(3))
    # Adaptive: grow the chain until the added device time clears tunnel
    # jitter (a few ms), else ultrafast kernels read as noise.
    while True:
        tk = min(run(chain) for _ in range(3))
        if tk - t1 > 8e-3 or chain >= 256:
            break
        chain *= 4
    return max(tk - t1, 1e-9) / (chain - 1)


def measure_bc7_tpu() -> float:
    """Mtexels/sec for BC7 at Normal quality on the attached device."""
    from cuttlefish_tpu.convert.blocks import extract_blocks
    from cuttlefish_tpu.kernels.bc7 import encode_bc7

    surf = _test_surface(IMAGE)
    blocks, _, _ = extract_blocks(surf, 4, 4)
    dt = _time_chained(lambda b: encode_bc7(b, quality=QUALITY), blocks, 4)
    return IMAGE * IMAGE / dt / 1e6


def measure_bc7_cpu() -> float | None:
    """Mtexels/sec for the native CPU encoder (all cores), or None."""
    from cuttlefish_tpu import native
    from cuttlefish_tpu.convert.blocks import extract_blocks

    if not native.available():
        return None
    surf = _test_surface(IMAGE)
    blocks, _, _ = extract_blocks(surf, 4, 4)
    native.bc7_encode_cpu(blocks[:4096], QUALITY)  # warm/JIT-ish
    t0 = time.perf_counter()
    native.bc7_encode_cpu(blocks, QUALITY)
    dt = time.perf_counter() - t0
    return IMAGE * IMAGE / dt / 1e6


def measure_full_matrix() -> dict:
    """The five BASELINE.json configs, end-to-end (load->mips->encode->
    container) where specified.  Returns {name: {...}} and logs progress."""
    import cuttlefish_tpu as ct
    from cuttlefish_tpu.convert.blocks import extract_blocks
    from cuttlefish_tpu.kernels import astc as kastc
    from cuttlefish_tpu.kernels import bc as kbc
    from cuttlefish_tpu.kernels import bc6h as kbc6h
    from cuttlefish_tpu.kernels import bc7 as kbc7
    from cuttlefish_tpu.kernels import etc as ketc

    out = {}

    def log(msg):
        print(msg, file=sys.stderr, flush=True)

    def e2e(name, size, fmt, type_, quality, filetype, mips, layers=0):
        surf = _test_surface(size)

        def once():
            t0 = time.perf_counter()
            tex = ct.Texture(ct.Dimension.Dim2D, size, size, depth=layers)
            img = ct.Image.from_array(surf, ct.ImageFormat.RGBAF)
            for d in range(max(layers, 1)):
                tex.set_image(img, depth=d)
            if mips:
                tex.generate_mipmaps()
            assert tex.convert(fmt, type_, quality=quality)
            res, data = tex.save_to_bytes(filetype)
            assert res is ct.SaveResult.Success
            return time.perf_counter() - t0, data

        cold, _ = once()  # compile + cache warm
        dt, data = min(once() for _ in range(3))
        texels = size * size * max(layers, 1) * (4 // 3 if mips else 1)
        out[name] = {
            "mtexels_per_s": round(texels / dt / 1e6, 2),
            "seconds": round(dt, 3),
            "cold_seconds": round(cold, 3),
            "bytes": len(data),
            "note": _TUNNEL_NOTE,
        }
        log(f"{name}: {out[name]}")

    # Config 1: BC1 512^2 -> DDS, default (Normal) quality, no mips.
    e2e("bc1_512_dds", 512, ct.TextureFormat.BC1_RGB, ct.TextureType.UNorm,
        ct.Quality.Normal, ct.FileType.DDS, mips=False)
    # Config 2: BC3 with mips -> KTX (BC4/BC5 similar cost class).
    e2e("bc3_mips_ktx", 512, ct.TextureFormat.BC3, ct.TextureType.UNorm,
        ct.Quality.Normal, ct.FileType.KTX, mips=True)

    # Config 2, fused: device-resident mip chain + encode in ONE dispatch
    # (Texture.convert_with_mips) — the TPU-first pipeline.
    def fused_bc3():
        size = 512
        s = _test_surface(size)

        def once():
            t0 = time.perf_counter()
            tex = ct.Texture(ct.Dimension.Dim2D, size, size)
            tex.set_image(ct.Image.from_array(s, ct.ImageFormat.RGBAF))
            assert tex.convert_with_mips(
                ct.TextureFormat.BC3, ct.TextureType.UNorm,
                quality=ct.Quality.Normal,
            )
            res, data = tex.save_to_bytes(ct.FileType.KTX)
            assert res is ct.SaveResult.Success
            return time.perf_counter() - t0, data

        cold, _ = once()
        dt, data = min(once() for _ in range(3))
        texels = size * size * 4 // 3
        out["bc3_mips_fused_ktx"] = {
            "mtexels_per_s": round(texels / dt / 1e6, 2),
            "seconds": round(dt, 3),
            "cold_seconds": round(cold, 3),
            "bytes": len(data),
            "note": _TUNNEL_NOTE,
        }
        log(f"bc3_mips_fused_ktx: {out['bc3_mips_fused_ktx']}")

    fused_bc3()
    # Config 3: ETC2 RGB8, 4-layer 2D texture array -> KTX.
    e2e("etc2_array_ktx", 512, ct.TextureFormat.ETC2_R8G8B8,
        ct.TextureType.UNorm, ct.Quality.Normal, ct.FileType.KTX,
        mips=False, layers=4)

    # Config 5 (e2e half): ASTC 4x4 cube map, sRGB, normal-map generation,
    # full mip chain -> KTX (BASELINE.json config 5; kernel rows below
    # isolate device throughput at 4x4 q2-4).
    def astc_cube():
        size = 256
        surf = _test_surface(size)

        def once():
            t0 = time.perf_counter()
            tex = ct.Texture(
                ct.Dimension.Cube, size, size,
                color_space=ct.ColorSpace.sRGB,
            )
            for face in ct.CubeFace:
                img = ct.Image.from_array(surf, ct.ImageFormat.RGBAF)
                nm = img.create_normal_map(height=2.0)
                tex.set_image(nm, face=face)
            tex.generate_mipmaps()
            assert tex.convert(
                ct.TextureFormat.ASTC_4x4, ct.TextureType.UNorm,
                quality=ct.Quality.Normal,
            )
            res, data = tex.save_to_bytes(ct.FileType.KTX)
            assert res is ct.SaveResult.Success
            return time.perf_counter() - t0, data

        cold, _ = once()
        dt, data = min(once() for _ in range(3))
        texels = size * size * 6 * 4 // 3
        out["astc_cube_srgb_nm_ktx"] = {
            "mtexels_per_s": round(texels / dt / 1e6, 2),
            "seconds": round(dt, 3),
            "cold_seconds": round(cold, 3),
            "bytes": len(data),
            "note": _TUNNEL_NOTE,
        }
        log(f"astc_cube_srgb_nm_ktx: {out['astc_cube_srgb_nm_ktx']}")

    astc_cube()

    # Config 5, fused: same cube/sRGB/normal-map content, but normal map
    # + mip chain + tiling + encode all run as ONE device dispatch
    # (Texture.convert_with_mips(normal_map=...)).
    def astc_cube_fused():
        from cuttlefish_tpu.image.image import NormalOptions

        size = 256
        surf = _test_surface(size)

        def once():
            t0 = time.perf_counter()
            tex = ct.Texture(
                ct.Dimension.Cube, size, size,
                color_space=ct.ColorSpace.sRGB,
            )
            for face in ct.CubeFace:
                tex.set_image(
                    ct.Image.from_array(surf, ct.ImageFormat.RGBAF),
                    face=face,
                )
            assert tex.convert_with_mips(
                ct.TextureFormat.ASTC_4x4, ct.TextureType.UNorm,
                quality=ct.Quality.Normal,
                normal_map=NormalOptions.Default, normal_height=2.0,
            )
            res, data = tex.save_to_bytes(ct.FileType.KTX)
            assert res is ct.SaveResult.Success
            return time.perf_counter() - t0, data

        cold, _ = once()
        dt, data = min(once() for _ in range(3))
        texels = size * size * 6 * 4 // 3
        out["astc_cube_srgb_nm_fused_ktx"] = {
            "mtexels_per_s": round(texels / dt / 1e6, 2),
            "seconds": round(dt, 3),
            "cold_seconds": round(cold, 3),
            "bytes": len(data),
            "note": _TUNNEL_NOTE,
        }
        log(f"astc_cube_srgb_nm_fused_ktx: {out['astc_cube_srgb_nm_fused_ktx']}")

    astc_cube_fused()
    # Config 4: BC6H + BC7 at Highest -> raw kernel throughput.
    surf = _test_surface(1024)
    blocks, _, _ = extract_blocks(surf, 4, 4)
    dt = _time_chained(
        lambda b: kbc7.encode_bc7(b, quality=4), blocks, 4, chain=4
    )
    out["bc7_q4_kernel"] = {"mtexels_per_s": round(1024 * 1024 / dt / 1e6, 2)}
    log(f"bc7_q4_kernel: {out['bc7_q4_kernel']}")
    dt = _time_chained(
        lambda b: kbc6h.encode_bc6h(b[..., :3] * 4.0, quality=4), blocks, 4,
        chain=4,
    )
    out["bc6h_q4_kernel"] = {"mtexels_per_s": round(1024 * 1024 / dt / 1e6, 2)}
    log(f"bc6h_q4_kernel: {out['bc6h_q4_kernel']}")
    dt = _time_chained(
        lambda b: kbc6h.encode_bc6h(b[..., :3] * 4.0, quality=2), blocks, 4,
        chain=4,
    )
    out["bc6h_q2_kernel"] = {"mtexels_per_s": round(1024 * 1024 / dt / 1e6, 2)}
    log(f"bc6h_q2_kernel: {out['bc6h_q2_kernel']}")
    # Config 5: ASTC 4x4 + 8x8 kernels (sRGB/cube orchestration is host-side).
    # Same content gates the converter applies: colored content skips the
    # CEM 0/4 fits, opaque content the CEM 12 / dual-plane fits.
    gray = kastc.has_gray_blocks(blocks)
    has_alpha = kastc.has_alpha_blocks(blocks)
    log(f"astc gates: gray={gray} alpha={has_alpha}")
    for q in (2, 3, 4):
        dt = _time_chained(
            lambda b, q=q: kastc.encode_astc(
                b, 4, 4, quality=q, gray=gray, alpha=has_alpha
            ),
            blocks, 4, chain=4,
        )
        key = f"astc4x4_q{q}_kernel"
        out[key] = {"mtexels_per_s": round(1024 * 1024 / dt / 1e6, 2)}
        log(f"{key}: {out[key]}")
    for bw, bh in ((6, 6), (8, 8), (12, 12)):
        blocks_b, _, _ = extract_blocks(surf, bw, bh)
        dt = _time_chained(
            lambda b, bw=bw, bh=bh: kastc.encode_astc(
                b, bw, bh, quality=2, gray=gray, alpha=has_alpha
            ),
            blocks_b, 4, chain=4,
        )
        key = f"astc{bw}x{bh}_q2_kernel"
        out[key] = {"mtexels_per_s": round(1024 * 1024 / dt / 1e6, 2)}
        log(f"{key}: {out[key]}")

    # ETC2 RGB + EAC R11 kernel rows (quality Normal, 1024^2 batch).
    dt = _time_chained(
        lambda b: ketc.encode_etc_rgb(b, quality=2, etc2=True), blocks, 2,
        chain=4,
    )
    out["etc2_rgb_q2_kernel"] = {
        "mtexels_per_s": round(1024 * 1024 / dt / 1e6, 2)
    }
    log(f"etc2_rgb_q2_kernel: {out['etc2_rgb_q2_kernel']}")
    # q4 = the effort-100-class search (T/H coordinate descent, exact
    # planar neighborhood, base-cube estimate-then-refine).
    dt = _time_chained(
        lambda b: ketc.encode_etc_rgb(b, quality=4, etc2=True), blocks, 2,
        chain=4,
    )
    out["etc2_rgb_q4_kernel"] = {
        "mtexels_per_s": round(1024 * 1024 / dt / 1e6, 2)
    }
    log(f"etc2_rgb_q4_kernel: {out['etc2_rgb_q4_kernel']}")
    # Raw BC1 kernel row (config 1's format without the tunnel-bound
    # container round-trip that dominates bc1_512_dds).
    dt = _time_chained(
        lambda b: kbc.encode_bc1(b, quality=2), blocks, 2, chain=4,
    )
    out["bc1_q2_kernel"] = {
        "mtexels_per_s": round(1024 * 1024 / dt / 1e6, 2)
    }
    log(f"bc1_q2_kernel: {out['bc1_q2_kernel']}")
    dt = _time_chained(
        lambda b: ketc.encode_eac_r11(b[..., 0], quality=2), blocks, 2,
        chain=4,
    )
    out["eac_r11_q2_kernel"] = {
        "mtexels_per_s": round(1024 * 1024 / dt / 1e6, 2)
    }
    log(f"eac_r11_q2_kernel: {out['eac_r11_q2_kernel']}")

    # PVRTC1/2 4bpp (whole-surface XLA program; not block-local, so no
    # Pallas path — but the bilinear upscale and refinement adjoints are
    # dense MXU matmuls, see kernels/pvrtc.py).  Throughput at 1024^2
    # plus PSNR at 256^2 via the spec decoder.
    from cuttlefish_tpu.decode.pvrtc import decode_pvrtc1, decode_pvrtc2
    from cuttlefish_tpu.kernels import pvrtc as kpvrtc

    surf1k = _test_surface(1024)
    s256 = _test_surface(256)
    for name, enc, dec_fn in (
        ("pvrtc1_q2", kpvrtc.encode_pvrtc1, decode_pvrtc1),
        ("pvrtc2_q2", kpvrtc.encode_pvrtc2, decode_pvrtc2),
    ):
        dt = _time_chained(
            lambda s, enc=enc: enc(s, quality=QUALITY), surf1k, 2, chain=4,
        )
        words = np.asarray(enc(s256, quality=QUALITY))
        dec = dec_fn(
            np.ascontiguousarray(words.astype("<u4")).view(np.uint8),
            256, 256,
        )
        mse = float(np.mean((dec[..., :3] - s256[..., :3]) ** 2))
        out[name] = {
            "mtexels_per_s": round(1024 * 1024 / dt / 1e6, 2),
            "psnr_256_db": round(10.0 * np.log10(1.0 / mse), 2),
        }
        log(f"{name}: {out[name]}")
    return out


def measure_scaling() -> dict:
    """1 -> N device scaling efficiency (BASELINE.json: >= 90% target).

    Shards the BC7 block batch over an N-device mesh and compares
    per-device throughput against the 1-device run.  On a single-chip
    machine (this round's hardware) it reports the device count and skips;
    the harness is exercised on the virtual CPU mesh by the test suite and
    runs for real once a multi-chip slice is attached.
    """
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from cuttlefish_tpu.convert.blocks import extract_blocks
    from cuttlefish_tpu.kernels.bc7 import encode_bc7

    devs = jax.devices()
    n = len(devs)
    if n < 2:
        return {"devices": n, "note": "single device; scaling run skipped"}
    surf = _test_surface(IMAGE)
    blocks, _, _ = extract_blocks(surf, 4, 4)
    nblk = blocks.shape[0] - blocks.shape[0] % n

    def throughput(ndev):
        mesh = Mesh(np.asarray(devs[:ndev]), ("blocks",))
        sh = NamedSharding(mesh, P("blocks"))
        placed = jax.device_put(np.asarray(blocks[:nblk]), sh)
        step = jax.jit(
            lambda b: encode_bc7(b, quality=QUALITY),
            in_shardings=sh, out_shardings=sh,
        )
        jax.block_until_ready(step(placed))
        t0 = time.perf_counter()
        outs = [step(placed) for _ in range(8)]
        jax.block_until_ready(outs[-1])
        return nblk * 16 * 8 / (time.perf_counter() - t0) / 1e6

    one = throughput(1)
    full = throughput(n)
    return {
        "devices": n,
        "mtexels_1dev": round(one, 2),
        "mtexels_ndev": round(full, 2),
        "efficiency": round(full / (one * n), 4),
    }


def main() -> None:
    if "--scaling" in sys.argv:
        print(json.dumps(measure_scaling()))
        return
    tpu = measure_bc7_tpu()
    try:
        cpu = measure_bc7_cpu()
    except Exception:
        cpu = None
    result = {
        "metric": "bc7_encode_throughput_q2_2048",
        "value": round(tpu, 3),
        "unit": "Mtexels/sec/chip",
        "vs_baseline": round(tpu / cpu, 3) if cpu else None,
    }
    if "--all" in sys.argv:
        full = measure_full_matrix()
        full["bc7_q2_kernel"] = {"mtexels_per_s": round(tpu, 2)}
        full["bc7_cpu_baseline"] = {"mtexels_per_s": round(cpu, 2) if cpu else None}
        with open("BENCH_FULL.json", "w") as f:
            json.dump(full, f, indent=1)
        print(json.dumps(full, indent=1), file=sys.stderr)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
