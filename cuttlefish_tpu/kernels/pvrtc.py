"""PVRTC1 encoder (whole-surface JAX).

TPU-native replacement for PVRTexLib's PVRTC1 compressor
(`/root/reference/lib/src/PvrtcConverter.cpp`).  PVRTC1 stores two
low-frequency color signals (A and B) at one color pair per block plus a
per-texel 2-bit (4bpp) / 1-bit (2bpp) modulation; decoding bilinearly
upscales the block-color grids with wraparound, so blocks are NOT
independent — the reference encodes whole-image for the same reason
(jobsX=jobsY=1).  Encoding here:

  1. per-block principal-axis extremes -> candidate A (low) / B (high)
  2. quantize to 554/555 (A keeps 5 blue bits, B gives one up for the
     modulation-mode flag)
  3. build the upscaled A/B images with the spec's 4x bilinear + wrap
  4. per texel, project onto [A(x,y), B(x,y)] and quantize the modulation
     to {0, 3/8, 5/8, 1} (4bpp) or {0, 1} (2bpp)
  5. optional refinement passes re-fit block colors against the chosen
     modulations (quality >= Normal).

Blocks are emitted in Morton order as the PVR container requires.
Word layout (64-bit LE): bits 0..31 modulation; bits 32..47 color B
(bit 32 = modulation mode flag, 33..47 = B color 554+opaque);
bits 48..63 color A (48..62 color 555, 63 = opaque flag).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Modulation blend weights (of 8): result = (A*(8-w) + B*w) / 8.
_MOD_W_4BPP = np.array([0, 3, 5, 8], np.float32)


def morton_order(nbx: int, nby: int) -> np.ndarray:
    """Block index permutation: output[i] = raster index of i-th stored
    block (PVR container Morton layout; extra bits of the larger dimension
    are appended linearly above the interleaved bits)."""
    n = nbx * nby
    out = np.zeros(n, np.int64)
    minb = min(nbx, nby)
    logm = int(minb).bit_length() - 1
    for i in range(n):
        # De-interleave the low 2*logm bits, rest goes to the larger dim.
        low = i & ((1 << (2 * logm)) - 1)
        x = y = 0
        for b in range(logm):
            y |= ((low >> (2 * b)) & 1) << b
            x |= ((low >> (2 * b + 1)) & 1) << b
        rest = i >> (2 * logm)
        if nbx >= nby:
            x |= rest << logm
        else:
            y |= rest << logm
        out[i] = y * nbx + x
    return out


def _quant555(c):
    """[...,3] float 0..1 -> (packed 15-bit int, decoded float)."""
    q = jnp.clip(jnp.round(c * 31.0), 0, 31).astype(jnp.int32)
    dec = jnp.stack(
        [((q[..., i] << 3) | (q[..., i] >> 2)).astype(jnp.float32) / 255.0 for i in range(3)],
        axis=-1,
    )
    packed = (q[..., 0] << 10) | (q[..., 1] << 5) | q[..., 2]
    return packed, dec


def _quant554(c):
    """B color: 5.5.4 (blue loses a bit to the mode flag)."""
    r = jnp.clip(jnp.round(c[..., 0] * 31.0), 0, 31).astype(jnp.int32)
    g = jnp.clip(jnp.round(c[..., 1] * 31.0), 0, 31).astype(jnp.int32)
    b = jnp.clip(jnp.round(c[..., 2] * 15.0), 0, 15).astype(jnp.int32)
    b5 = (b << 1) | (b >> 3)
    dec = jnp.stack(
        [
            ((r << 3) | (r >> 2)).astype(jnp.float32) / 255.0,
            ((g << 3) | (g >> 2)).astype(jnp.float32) / 255.0,
            ((b5 << 3) | (b5 >> 2)).astype(jnp.float32) / 255.0,
        ],
        axis=-1,
    )
    packed = (r << 10) | (g << 5) | (b << 1)
    return packed, dec


def upscale_bilinear(grid: jnp.ndarray, bw: int, bh: int) -> jnp.ndarray:
    """[nby, nbx, C] block colors -> [nby*bh, nbx*bw, C] with the PVRTC
    4x/2x bilinear + wraparound rule (block centers at half-block)."""
    nby, nbx = grid.shape[:2]
    h, w = nby * bh, nbx * bw
    ys = jnp.arange(h)
    xs = jnp.arange(w)
    fy = ys % bh
    fx = xs % bw
    j = ys // bh
    i = xs // bw
    py = jnp.where(fy < bh // 2, j - 1, j) % nby
    px = jnp.where(fx < bw // 2, i - 1, i) % nbx
    qy = (py + 1) % nby
    qx = (px + 1) % nbx
    wy = jnp.where(fy < bh // 2, fy + bh // 2, fy - bh // 2).astype(jnp.float32) / bh
    wx = jnp.where(fx < bw // 2, fx + bw // 2, fx - bw // 2).astype(jnp.float32) / bw
    p00 = grid[py][:, px]
    p01 = grid[py][:, qx]
    p10 = grid[qy][:, px]
    p11 = grid[qy][:, qx]
    wxe = wx[None, :, None]
    wye = wy[:, None, None]
    return (
        p00 * (1 - wxe) * (1 - wye)
        + p01 * wxe * (1 - wye)
        + p10 * (1 - wxe) * wye
        + p11 * wxe * wye
    )


def _block_endpoints(surface: jnp.ndarray, bw: int, bh: int):
    """Per-block principal-axis extreme colors -> (lo, hi) [nby,nbx,3]."""
    h, w, _ = surface.shape
    nby, nbx = h // bh, w // bw
    blocks = surface.reshape(nby, bh, nbx, bw, 3).transpose(0, 2, 1, 3, 4)
    blocks = blocks.reshape(nby * nbx, bh * bw, 3)
    mean = blocks.mean(1, keepdims=True)
    centered = blocks - mean
    cov = jnp.einsum("nic,nid->ncd", centered, centered)
    norms = (centered * centered).sum(-1)
    start = jnp.take_along_axis(centered, norms.argmax(1)[:, None, None], 1)[:, 0]
    n0 = jnp.linalg.norm(start, axis=-1, keepdims=True)
    v = jnp.where(n0 > 1e-10, start / (n0 + 1e-20), jnp.ones_like(start))
    for _ in range(4):
        nv = jnp.einsum("ncd,nd->nc", cov, v)
        nn = jnp.linalg.norm(nv, axis=-1, keepdims=True)
        v = jnp.where(nn > 1e-10, nv / (nn + 1e-20), v)
    t = jnp.einsum("nic,nc->ni", centered, v)
    hi = jnp.take_along_axis(blocks, t.argmax(1)[:, None, None], 1)[:, 0]
    lo = jnp.take_along_axis(blocks, t.argmin(1)[:, None, None], 1)[:, 0]
    return lo.reshape(nby, nbx, 3), hi.reshape(nby, nbx, 3)


@functools.partial(jax.jit, static_argnames=("bpp2", "quality"))
def encode_pvrtc1(
    surface: jnp.ndarray, bpp2: bool = False, quality: int = 2
) -> jnp.ndarray:
    """Encode an RGB(A) surface (H, W, 4) float 0..1 -> [nblocks, 2] uint32
    words in raster order (caller applies the Morton permutation).

    Alpha handling is opaque-only for now (opaque flags set); punch-through
    and translucent endpoint modes are planned extensions.
    """
    bw, bh = (8, 4) if bpp2 else (4, 4)
    rgb = surface[..., :3].astype(jnp.float32)
    h, w, _ = rgb.shape
    nby, nbx = h // bh, w // bw

    lo, hi = _block_endpoints(rgb, bw, bh)
    refines = {0: 0, 1: 0, 2: 1, 3: 2, 4: 3}[max(0, min(4, int(quality)))]

    mod_w = jnp.asarray(_MOD_W_4BPP if not bpp2 else np.array([0, 8], np.float32))

    def modulate(lo_g, hi_g):
        _, dec_a = _quant555(lo_g)
        _, dec_b = _quant554(hi_g)
        a_img = upscale_bilinear(dec_a, bw, bh)
        b_img = upscale_bilinear(dec_b, bw, bh)
        d = b_img - a_img
        denom = (d * d).sum(-1) + 1e-8
        t = ((rgb - a_img) * d).sum(-1) / denom  # ideal in [0,1]
        # Pick nearest modulation weight.
        cand = mod_w[None, None, :] / 8.0
        mi = jnp.argmin(jnp.abs(t[..., None] - cand), axis=-1).astype(jnp.int32)
        return mi, a_img, b_img

    mi, a_img, b_img = modulate(lo, hi)

    for _ in range(refines):
        # Re-fit block colors: local least squares per block over its own
        # texels (ignoring neighbor support — a cheap but effective pass).
        wmod = mod_w[mi] / 8.0  # [H,W]
        wb = wmod.reshape(nby, bh, nbx, bw).transpose(0, 2, 1, 3).reshape(
            nby * nbx, bh * bw
        )
        cb = rgb.reshape(nby, bh, nbx, bw, 3).transpose(0, 2, 1, 3, 4).reshape(
            nby * nbx, bh * bw, 3
        )
        a11 = ((1 - wb) ** 2).sum(1)
        a12 = (wb * (1 - wb)).sum(1)
        a22 = (wb * wb).sum(1)
        b0 = jnp.einsum("ni,nic->nc", 1 - wb, cb)
        b1 = jnp.einsum("ni,nic->nc", wb, cb)
        det = a11 * a22 - a12 * a12
        ok = jnp.abs(det) > 1e-8
        safe = jnp.where(ok, det, 1.0)[:, None]
        new_lo = (a22[:, None] * b0 - a12[:, None] * b1) / safe
        new_hi = (a11[:, None] * b1 - a12[:, None] * b0) / safe
        mean = cb.mean(1)
        new_lo = jnp.where(ok[:, None], new_lo, mean).reshape(nby, nbx, 3)
        new_hi = jnp.where(ok[:, None], new_hi, mean).reshape(nby, nbx, 3)
        new_lo = jnp.clip(new_lo, 0.0, 1.0)
        new_hi = jnp.clip(new_hi, 0.0, 1.0)
        mi, a_img, b_img = modulate(new_lo, new_hi)
        lo, hi = new_lo, new_hi

    pa, _ = _quant555(lo)
    pb, _ = _quant554(hi)

    # Modulation word per block: 2 bits per texel raster order (1 bit for
    # 2bpp), texel (fx, fy) at bit (fy*bw+fx)*bits.
    bits = 1 if bpp2 else 2
    mb = mi.reshape(nby, bh, nbx, bw).transpose(0, 2, 1, 3).reshape(
        nby * nbx, bh * bw
    )
    shifts = (bits * jnp.arange(bh * bw, dtype=jnp.uint32))[None, :]
    modword = (mb.astype(jnp.uint32) << shifts).sum(axis=1, dtype=jnp.uint32)

    # Color word (upper 32 bits of the block): bit 0 = modulation mode (0 =
    # standard), bits 1..14 = B (554, already positioned by _quant554),
    # bit 15 = B opaque flag, bits 16..30 = A (555), bit 31 = A opaque flag.
    colorword = (
        (pa.reshape(-1).astype(jnp.uint32) << jnp.uint32(16))
        | jnp.uint32(0x80000000)  # A opaque flag
        | pb.reshape(-1).astype(jnp.uint32)
        | jnp.uint32(0x8000)  # B opaque flag
    )
    return jnp.stack([modword, colorword], axis=-1)
