"""Generate the real-image quality corpus fixtures (tests/fixtures/corpus).

Real content classes backing the quality harness and the CPU-reference
comparisons (VERDICT r3 item 6) — synthetic block batches systematically
flatter index-quantizer encoders, so the dB tables need real images:

- photo.png        256x256 RGB:  crop of matplotlib's grace_hopper.jpg
                   (public-domain US Navy portrait, shipped in mpl-data).
- ui_atlas.png     256x256 RGBA: matplotlib's logo2.png + present-pack
                   vector art composited on a flat-color panel grid —
                   hard edges, flat fills, alpha, text-like detail.
- normal.png       256x256 RGB:  normal map derived from the Jacksboro
                   Fault DEM (real terrain heightfield in mpl-data) via
                   central differences, the same operator as
                   Image.create_normal_map.
- hdr_probe.npy    128x128x3 float32: topobathy elevation data mapped to
                   an HDR radiance range (exponential tone curve, ~1e-2
                   to ~40), the BC6H/ASTC-HDR input class.

Deterministic: re-running reproduces the checked-in fixtures bit-exactly
(fixed seeds, pure numpy resampling).
"""

from __future__ import annotations

import os

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures", "corpus")


def _mpl_data(name: str) -> str:
    import matplotlib

    return os.path.join(matplotlib.get_data_path(), "sample_data", name)


def _box_resize(arr: np.ndarray, h: int, w: int) -> np.ndarray:
    """Integer-factor box filter (exact, dependency-free)."""
    sh, sw = arr.shape[:2]
    fy, fx = sh // h, sw // w
    arr = arr[: h * fy, : w * fx]
    return arr.reshape(h, fy, w, fx, -1).mean((1, 3))


def make_photo() -> np.ndarray:
    import PIL.Image

    im = PIL.Image.open(_mpl_data("grace_hopper.jpg")).convert("RGB")
    a = np.asarray(im, np.float32) / 255.0  # 600x512
    a = a[44 : 44 + 512, :512]  # square crop centered on the face
    return _box_resize(a, 256, 256)


def make_ui_atlas() -> np.ndarray:
    import PIL.Image

    canvas = np.zeros((256, 256, 4), np.float32)
    # Flat-color panel grid (the UI-atlas staple: exact-color regions).
    panels = [
        (0, 0, 256, 256, (0.13, 0.14, 0.17, 1.0)),
        (8, 8, 120, 120, (0.20, 0.45, 0.85, 1.0)),
        (136, 8, 248, 120, (0.92, 0.30, 0.25, 1.0)),
        (8, 136, 120, 248, (0.18, 0.70, 0.40, 1.0)),
    ]
    for x0, y0, x1, y1, c in panels:
        canvas[y0:y1, x0:x1] = c
    logo = PIL.Image.open(_mpl_data("logo2.png")).convert("RGBA")
    la = np.asarray(logo, np.float32) / 255.0
    lh, lw = la.shape[:2]
    sc = max(1, int(np.ceil(max(lh / 110, lw / 110))))
    la = _box_resize(la, lh // sc, lw // sc)
    ph, pw = la.shape[:2]
    y0, x0 = 140, 136
    region = canvas[y0 : y0 + ph, x0 : x0 + pw]
    a = la[..., 3:4]
    region[...] = np.concatenate(
        [la[..., :3] * a + region[..., :3] * (1 - a),
         np.maximum(la[..., 3:4], region[..., 3:4])], -1)
    present = PIL.Image.open(_mpl_data("Minduka_Present_Blue_Pack.png"))
    pa = np.asarray(present.convert("RGBA"), np.float32) / 255.0
    ph2, pw2 = pa.shape[:2]
    sc = max(1, int(np.ceil(max(ph2 / 100, pw2 / 100))))
    pa = _box_resize(pa, ph2 // sc, pw2 // sc)
    ph2, pw2 = pa.shape[:2]
    region = canvas[16 : 16 + ph2, 16 : 16 + pw2]
    a = pa[..., 3:4]
    region[...] = np.concatenate(
        [pa[..., :3] * a + region[..., :3] * (1 - a),
         np.maximum(pa[..., 3:4], region[..., 3:4])], -1)
    # Text-like detail: 1-2px strokes.
    rng = np.random.default_rng(5)
    for row in range(150, 246, 12):
        x = 12
        while x < 118:
            wseg = int(rng.integers(4, 14))
            canvas[row : row + 2, x : x + wseg] = (0.95, 0.95, 0.95, 1.0)
            x += wseg + int(rng.integers(3, 8))
    return np.clip(canvas, 0.0, 1.0)


def _dem() -> np.ndarray:
    z = np.load(_mpl_data("jacksboro_fault_dem.npz"))["elevation"]
    return np.asarray(z, np.float32)


def make_normal_map() -> np.ndarray:
    """Heightfield -> tangent-space normal map, the create_normal_map
    operator (central differences, +Y up) on real terrain."""
    z = _dem()
    h = (z - z.min()) / (z.max() - z.min())
    if h.shape[0] >= 256 and h.shape[1] >= 256:
        h = _box_resize(h[..., None], 256, 256)[..., 0]
    else:
        h = _upsample_to(h, 256)
    dx = (np.roll(h, -1, 1) - np.roll(h, 1, 1)) * 0.5 * 24.0
    dy = (np.roll(h, -1, 0) - np.roll(h, 1, 0)) * 0.5 * 24.0
    n = np.stack([-dx, -dy, np.ones_like(h)], -1)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    return (n * 0.5 + 0.5).astype(np.float32)


def _upsample_to(h: np.ndarray, size: int) -> np.ndarray:
    """Bilinear upsample a 2-D array to size x size (pure numpy)."""
    sh, sw = h.shape
    ys = np.linspace(0, sh - 1, size)
    xs = np.linspace(0, sw - 1, size)
    y0 = np.clip(ys.astype(np.int64), 0, sh - 2)
    x0 = np.clip(xs.astype(np.int64), 0, sw - 2)
    fy = (ys - y0)[:, None]
    fx = (xs - x0)[None, :]
    a = h[y0][:, x0]
    b = h[y0][:, x0 + 1]
    c = h[y0 + 1][:, x0]
    d = h[y0 + 1][:, x0 + 1]
    return (a * (1 - fy) * (1 - fx) + b * (1 - fy) * fx
            + c * fy * (1 - fx) + d * fy * fx).astype(np.float32)


def make_hdr_probe() -> np.ndarray:
    """Topobathy elevations -> HDR RGB radiance (sun-lit terrain model:
    exponential exposure over ~3.5 decades plus a warm/cool color ramp)."""
    z = np.load(_mpl_data("topobathy.npz"))["topo"].astype(np.float32)
    zn = (z - z.min()) / (z.max() - z.min())
    zn = _upsample_to(zn, 128)
    lum = np.exp(zn * 8.0 - 4.5)  # ~1.1e-2 .. ~33
    warm = np.stack([lum * 1.15, lum * 0.95, lum * 0.55], -1)
    cool = np.stack([lum * 0.45, lum * 0.75, lum * 1.25], -1)
    w = zn[..., None]
    return (warm * w + cool * (1 - w)).astype(np.float32)


def main():
    import PIL.Image

    os.makedirs(OUT, exist_ok=True)

    def save_png(name, arr):
        mode = "RGBA" if arr.shape[-1] == 4 else "RGB"
        img = PIL.Image.fromarray(
            np.clip(np.round(arr * 255.0), 0, 255).astype(np.uint8), mode
        )
        img.save(os.path.join(OUT, name), optimize=True)
        print(name, arr.shape)

    save_png("photo.png", make_photo())
    save_png("ui_atlas.png", make_ui_atlas())
    save_png("normal.png", make_normal_map())
    hdr = make_hdr_probe()
    np.save(os.path.join(OUT, "hdr_probe.npy"), hdr)
    print("hdr_probe.npy", hdr.shape, float(hdr.min()), float(hdr.max()))


if __name__ == "__main__":
    main()
