"""BC1-BC5 block encoders (batched JAX).

TPU-native replacements for the rgbcx / libsquish / Compressonator encode
paths used by the reference (`/root/reference/lib/src/S3tcConverter.cpp`).
Each function maps a batch of 4x4 blocks to packed little-endian words:

  encode_bc1   [N,16,4] -> [N,2] uint32   (BC1 RGB / BC1 punch-through alpha)
  encode_bc4   [N,16]   -> [N,2] uint32   (unsigned or signed single channel)
  encode_bc2 / encode_bc3 / encode_bc5 compose the above.

Algorithm (quality-laddered, mirroring the reference's 5-level quality knob
`S3tcConverter.cpp:66-95` in spirit, not in implementation):
  1. principal-axis endpoint seed (power iteration on the 3x3 block covariance)
  2. alternating least-squares cluster fit: assign indices against the decoded
     palette, solve the 2x2 normal equations for optimal float endpoints,
     re-quantize; keep the best quantized candidate by weighted SSE
  3. mode trials (4-color vs 3-color+black for BC1; 8-value vs 6-value+0/1 for
     BC4) at Normal quality and above.

Everything is fixed-shape and branch-free: quality selects static iteration
counts so XLA compiles one fused program per (N, quality, flags) — the
data-dependent early-outs of the CPU encoders become masked reductions
(SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Index -> interpolation weight w, palette entry = w*e0 + (1-w)*e1.
_BC1_4C_W = jnp.array([1.0, 0.0, 2.0 / 3.0, 1.0 / 3.0], jnp.float32)
_BC1_3C_W = jnp.array([1.0, 0.0, 0.5], jnp.float32)
_BC4_8V_W = jnp.array([1, 0, 6 / 7, 5 / 7, 4 / 7, 3 / 7, 2 / 7, 1 / 7], jnp.float32)
_BC4_6V_W = jnp.array([1, 0, 4 / 5, 3 / 5, 2 / 5, 1 / 5], jnp.float32)

# Encode-quality ladder: least-squares refinement rounds.
_LS_ITERS = (1, 2, 3, 6, 10)


def _ls_iters(quality: int) -> int:
    return _LS_ITERS[max(0, min(4, int(quality)))]


# ---------------------------------------------------------------------------
# Shared machinery
# ---------------------------------------------------------------------------


def select_at_max(values: jnp.ndarray, data: jnp.ndarray) -> jnp.ndarray:
    """data row at the FIRST maximal value, gather-free.

    values [N,T], data [N,T,C] -> [N,C].  Per-block dynamic gathers
    (take_along_axis) are pathologically slow on TPU; a one-hot select +
    reduction compiles to pure vector ops.  Ties pick the first occurrence
    (averaging ties can cancel to zero on symmetric blocks, e.g. a
    half-red/half-blue block where every residual has equal norm).
    """
    is_max = values == values.max(1, keepdims=True)
    first = is_max & (jnp.cumsum(is_max.astype(jnp.int32), axis=1) == 1)
    onehot = first.astype(data.dtype)
    return jnp.einsum("nt,ntc->nc", onehot, data)


def _principal_axis(centered: jnp.ndarray) -> jnp.ndarray:
    """Dominant eigenvector of per-block covariance. centered: [N,16,C].

    Seeded from the largest residual pixel (an all-ones seed can be exactly
    orthogonal to the principal axis, e.g. a half-red/half-blue block) and
    degenerate iterations keep the previous direction.
    """
    cov = jnp.einsum("nic,nid->ncd", centered, centered)
    norms = (centered * centered).sum(-1)
    start = select_at_max(norms, centered)
    fallback = jnp.ones_like(start)
    n0 = jnp.linalg.norm(start, axis=-1, keepdims=True)
    v = jnp.where(n0 > 1e-10, start / (n0 + 1e-20), fallback)
    for _ in range(6):
        nv = jnp.einsum("ncd,nd->nc", cov, v)
        n = jnp.linalg.norm(nv, axis=-1, keepdims=True)
        v = jnp.where(n > 1e-10, nv / (n + 1e-20), v)
    return v


def _project_endpoints(colors: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Seed endpoints: extreme points along the principal axis.

    colors: [N,16,C] -> (hi, lo) each [N,C], gather-free (the extremes sit
    on the axis line through the mean).
    """
    mean = colors.mean(axis=1, keepdims=True)
    centered = colors - mean
    axis = _principal_axis(centered)
    t = jnp.einsum("nic,nc->ni", centered, axis)
    hi = mean[:, 0] + axis * t.max(1)[:, None]
    lo = mean[:, 0] + axis * t.min(1)[:, None]
    return hi, lo


def _assign(colors, palette, ch_weights, px_valid=None):
    """Nearest palette entry per texel.

    colors [N,16,C], palette [N,K,C] -> (idx [N,16] int32, err [N] f32).
    """
    d = colors[:, :, None, :] - palette[:, None, :, :]
    e = jnp.einsum("nikc,c->nik", d * d, ch_weights)
    idx = e.argmin(axis=-1).astype(jnp.int32)
    per_px = jnp.min(e, axis=-1)
    if px_valid is not None:
        per_px = per_px * px_valid
    return idx, per_px.sum(axis=1)

def _ls_solve(colors, w, px_valid=None):
    """Least-squares endpoints for fixed weights.

    colors [N,16,C], w [N,16] in [0,1]; minimizes sum||c - (w e0 + (1-w) e1)||^2.
    Returns (e0, e1) [N,C]; falls back to mean on singular systems.
    """
    pv = jnp.ones_like(w) if px_valid is None else px_valid
    wv = w * pv
    uv = (1.0 - w) * pv
    a11 = (wv * w).sum(1)
    a12 = (wv * (1.0 - w)).sum(1)
    a22 = (uv * (1.0 - w)).sum(1)
    b0 = jnp.einsum("ni,nic->nc", wv, colors)
    b1 = jnp.einsum("ni,nic->nc", uv, colors)
    det = a11 * a22 - a12 * a12
    ok = jnp.abs(det) > 1e-8
    safe = jnp.where(ok, det, 1.0)[:, None]
    e0 = (a22[:, None] * b0 - a12[:, None] * b1) / safe
    e1 = (a11[:, None] * b1 - a12[:, None] * b0) / safe
    denom = pv.sum(1)[:, None] + 1e-12
    mean = jnp.einsum("ni,nic->nc", pv, colors) / denom
    e0 = jnp.where(ok[:, None], e0, mean)
    e1 = jnp.where(ok[:, None], e1, mean)
    return e0, e1


# ---------------------------------------------------------------------------
# BC1
# ---------------------------------------------------------------------------


def _quant565(c):
    """[N,3] float -> (c16 [N] int32, decoded [N,3] float)."""
    c = jnp.clip(c, 0.0, 1.0)
    r = jnp.round(c[:, 0] * 31.0).astype(jnp.int32)
    g = jnp.round(c[:, 1] * 63.0).astype(jnp.int32)
    b = jnp.round(c[:, 2] * 31.0).astype(jnp.int32)
    c16 = (r << 11) | (g << 5) | b
    dec = jnp.stack(
        [
            ((r << 3) | (r >> 2)).astype(jnp.float32) / 255.0,
            ((g << 2) | (g >> 4)).astype(jnp.float32) / 255.0,
            ((b << 3) | (b >> 2)).astype(jnp.float32) / 255.0,
        ],
        axis=-1,
    )
    return c16, dec


def _bc1_palette(d0, d1, weights):
    """Palette from decoded endpoints. weights [K] -> [N,K,3]."""
    return (
        weights[None, :, None] * d0[:, None, :]
        + (1.0 - weights)[None, :, None] * d1[:, None, :]
    )


def _bc1_candidate_4c(colors, e0, e1, ch_weights):
    """Quantize + assign for the 4-color palette. Returns packed pieces."""
    c0, d0 = _quant565(e0)
    c1, d1 = _quant565(e1)
    pal = _bc1_palette(d0, d1, _BC1_4C_W)
    idx, err = _assign(colors, pal, ch_weights)
    return c0, c1, idx, err


def _bc1_refine_4c(colors, e0, e1, ch_weights, iters):
    best = _bc1_candidate_4c(colors, e0, e1, ch_weights)
    for _ in range(iters):
        w = _BC1_4C_W[best[2]]
        e0, e1 = _ls_solve(colors, w)
        cand = _bc1_candidate_4c(colors, e0, e1, ch_weights)
        better = cand[3] < best[3]
        best = tuple(
            jnp.where(better[(...,) + (None,) * (b.ndim - 1)], c, b)
            for c, b in zip(cand, best)
        )
    return best


def _dequant565(c16):
    """[N] int 565 -> [N,3] decoded float 0..1."""
    r = (c16 >> 11) & 31
    g = (c16 >> 5) & 63
    b = c16 & 31
    return jnp.stack(
        [
            ((r << 3) | (r >> 2)).astype(jnp.float32) / 255.0,
            ((g << 2) | (g >> 4)).astype(jnp.float32) / 255.0,
            ((b << 3) | (b >> 2)).astype(jnp.float32) / 255.0,
        ],
        axis=-1,
    )


def _bc1_neighborhood_4c(colors, best, ch_weights, passes):
    """Per-channel +-1 quant-lattice sweep on both 565 endpoints (the
    rgbcx hq search-radius role, matching native/src/bc1_cpu.cpp): the LS
    fit converges in the continuous domain, but the channel roundings
    interact with the index assignment — one lattice step per channel
    recovers ~0.2 dB on lerp content."""
    for _ in range(passes):
        base0, base1 = best[0], best[1]
        for shift, maxv in ((11, 31), (5, 63), (0, 31)):
            for d0 in (-1, 0, 1):
                for d1 in (-1, 0, 1):
                    if d0 == 0 and d1 == 0:
                        continue
                    f0 = jnp.clip(((base0 >> shift) & maxv) + d0, 0, maxv)
                    f1 = jnp.clip(((base1 >> shift) & maxv) + d1, 0, maxv)
                    c0n = (base0 & ~(maxv << shift)) | (f0 << shift)
                    c1n = (base1 & ~(maxv << shift)) | (f1 << shift)
                    pal = _bc1_palette(
                        _dequant565(c0n), _dequant565(c1n), _BC1_4C_W
                    )
                    idx, err = _assign(colors, pal, ch_weights)
                    better = err < best[3]
                    best = tuple(
                        jnp.where(
                            better[(...,) + (None,) * (b.ndim - 1)], c, b
                        )
                        for c, b in zip((c0n, c1n, idx, err), best)
                    )
    return best


def _pack_idx2(idx):
    """[N,16] 2-bit indices -> uint32 word, texel 0 at bits 0-1."""
    shifts = (2 * jnp.arange(16, dtype=jnp.uint32))[None, :]
    return (idx.astype(jnp.uint32) << shifts).sum(
        axis=1, dtype=jnp.uint32
    )


def _use_pallas() -> bool:
    """Pallas path on TPU (CUTTLEFISH_PALLAS=0 disables, =1 forces the
    interpreted kernel on CPU for tests)."""
    import os

    use = os.environ.get("CUTTLEFISH_PALLAS", "auto")
    if use == "0":
        return False
    return use == "1" or jax.default_backend() == "tpu"


def _static_chw(ch_weights):
    """Concrete channel weights as a hashable static tuple, or None if the
    value is traced (in which case the caller falls back to the jnp path)."""
    if ch_weights is None:
        return (1.0, 1.0, 1.0)
    try:
        import numpy as _np

        return tuple(float(x) for x in _np.asarray(ch_weights))
    except Exception:
        return None


def encode_bc1(
    blocks, quality=2, punch_through=False, allow_black=True, ch_weights=None
):
    """Dispatch: Pallas kernel on TPU, jnp path otherwise (see module doc)."""
    if _use_pallas():
        chw = _static_chw(ch_weights)
        if chw is not None:
            from cuttlefish_tpu.kernels.bc_pallas import encode_bc1_pallas

            return encode_bc1_pallas(
                blocks, int(quality), punch_through, allow_black, chw
            )
    return _encode_bc1_jnp(
        blocks, quality, punch_through, allow_black, ch_weights
    )


@functools.partial(jax.jit, static_argnames=("quality", "punch_through", "allow_black"))
def _encode_bc1_jnp(
    blocks: jnp.ndarray,
    quality: int = 2,
    punch_through: bool = False,
    allow_black: bool = True,
    ch_weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Encode [N,16,4] float RGBA blocks to BC1 [N,2] uint32 words.

    punch_through: BC1A semantics (`S3tcConverter.cpp:272-338`): texels with
    a < 0.5 become transparent black (3-color mode index 3).
    allow_black: permit the 3-color+black mode for opaque BC1
    (rgbcx cEncodeBC1Use3ColorBlocksForBlackPixels at `:257-270`).
    """
    colors = blocks[..., :3].astype(jnp.float32)
    if ch_weights is None:
        ch_weights = jnp.ones((3,), jnp.float32)
    iters = _ls_iters(quality)

    if punch_through:
        alpha_mask = (blocks[..., 3] >= 0.5).astype(jnp.float32)  # 1 = opaque
    else:
        alpha_mask = jnp.ones(blocks.shape[:2], jnp.float32)

    # --- 4-color candidate (only when no transparent texels are required) ---
    hi, lo = _project_endpoints(colors)
    best4 = _bc1_refine_4c(colors, hi, lo, ch_weights, iters)
    if quality >= 2:
        best4 = _bc1_neighborhood_4c(colors, best4, ch_weights, passes=2)
    c0_4, c1_4, idx_4, err_4 = best4

    # Order c0 > c1 for 4-color mode; idx remap on swap is idx ^ 1.
    swap = c0_4 < c1_4
    c0o = jnp.where(swap, c1_4, c0_4)
    c1o = jnp.where(swap, c0_4, c1_4)
    idx_4o = jnp.where(swap[:, None], idx_4 ^ 1, idx_4)
    # Equal endpoints decode as 3-color; index 0 still yields c0 exactly.
    idx_4o = jnp.where((c0o == c1o)[:, None], 0, idx_4o)
    mode4 = (c0o, c1o, idx_4o, err_4)

    # --- 3-color (+black / +transparent) candidate ---
    use3 = punch_through or (allow_black and quality >= 2)
    if use3:
        # Fit endpoints on opaque texels only; black/transparent go to idx 3.
        def cand3(e0, e1):
            c0, d0 = _quant565(e0)
            c1, d1 = _quant565(e1)
            pal = _bc1_palette(d0, d1, _BC1_3C_W)
            if not punch_through:
                # Black is a real palette entry competing on RGB error.
                pal = jnp.concatenate([pal, jnp.zeros_like(pal[:, :1])], axis=1)
                idx, err = _assign(colors, pal, ch_weights)
            else:
                idx, err = _assign(colors, pal, ch_weights, px_valid=alpha_mask)
                idx = jnp.where(alpha_mask < 0.5, 3, idx)
            return c0, c1, idx, err

        best3 = cand3(hi, lo)
        w3 = jnp.array([1.0, 0.0, 0.5, 0.0], jnp.float32)
        for _ in range(iters):
            w = w3[best3[2]]
            pv = alpha_mask * (best3[2] != 3)
            e0, e1 = _ls_solve(colors, w, px_valid=pv)
            cand = cand3(e0, e1)
            better = cand[3] < best3[3]
            best3 = tuple(
                jnp.where(better[(...,) + (None,) * (b.ndim - 1)], c, b)
                for c, b in zip(cand, best3)
            )
        c0_3, c1_3, idx_3, err_3 = best3
        # Order c0 <= c1 for 3-color mode; remap swaps entries 0/1 only.
        swap3 = c0_3 > c1_3
        c0_3o = jnp.where(swap3, c1_3, c0_3)
        c1_3o = jnp.where(swap3, c0_3, c1_3)
        idx_3o = jnp.where(swap3[:, None] & (idx_3 < 2), idx_3 ^ 1, idx_3)
        mode3 = (c0_3o, c1_3o, idx_3o, err_3)

        if punch_through:
            has_alpha = (alpha_mask < 0.5).any(axis=1)
            pick3 = has_alpha | (err_3 < err_4)
        else:
            pick3 = err_3 < err_4
        c0 = jnp.where(pick3, mode3[0], mode4[0])
        c1 = jnp.where(pick3, mode3[1], mode4[1])
        idx = jnp.where(pick3[:, None], mode3[2], mode4[2])
    else:
        c0, c1, idx = mode4[:3]

    word0 = (c0.astype(jnp.uint32) | (c1.astype(jnp.uint32) << 16)).astype(jnp.uint32)
    word1 = _pack_idx2(idx)
    return jnp.stack([word0, word1], axis=-1)


# ---------------------------------------------------------------------------
# BC4 (single channel; building block for BC3 alpha and BC5)
# ---------------------------------------------------------------------------


def _quant_bc4(e, signed: bool):
    """float -> (stored byte [N] int32, decoded float [N])."""
    if signed:
        q = jnp.round(jnp.clip(e, -1.0, 1.0) * 127.0).astype(jnp.int32)
        return q & 0xFF, q.astype(jnp.float32) / 127.0
    q = jnp.round(jnp.clip(e, 0.0, 1.0) * 255.0).astype(jnp.int32)
    return q, q.astype(jnp.float32) / 255.0


def _bc4_assign(vals, d0, d1, weights, extremes=None):
    """vals [N,16], palette from weights [K] (+ optional fixed extreme pair)."""
    pal = weights[None, :] * d0[:, None] + (1.0 - weights)[None, :] * d1[:, None]
    if extremes is not None:
        ext = jnp.broadcast_to(
            jnp.asarray(extremes, jnp.float32)[None, :], (pal.shape[0], 2)
        )
        pal = jnp.concatenate([pal, ext], axis=1)
    e = (vals[:, :, None] - pal[:, None, :]) ** 2
    if extremes is not None:
        # Tie-break exact matches toward the fixed extreme entries so they
        # drop out of the least-squares fit and stop pinning the endpoints.
        e = e.at[:, :, -2:].add(-1e-12)
    idx = e.argmin(axis=-1).astype(jnp.int32)
    return idx, jnp.clip(e, 0.0, None).min(axis=-1).sum(axis=1)


def encode_bc4(vals, quality=2, signed=False):
    """Dispatch: Pallas kernel on TPU, jnp path otherwise."""
    if _use_pallas():
        from cuttlefish_tpu.kernels.bc_pallas import encode_bc4_pallas

        return encode_bc4_pallas(vals, int(quality), signed)
    return _encode_bc4_jnp(vals, quality, signed)


@functools.partial(jax.jit, static_argnames=("quality", "signed"))
def _encode_bc4_jnp(
    vals: jnp.ndarray, quality: int = 2, signed: bool = False
) -> jnp.ndarray:
    """Encode [N,16] floats (unsigned [0,1] / signed [-1,1]) to [N,2] uint32.

    Replaces rgbcx::encode_bc4 and Compressonator CompressBlockBC4S
    (`S3tcConverter.cpp:378-435`).
    """
    vals = vals.astype(jnp.float32)
    iters = _ls_iters(quality)
    lo_ext, hi_ext = (-1.0, 1.0) if signed else (0.0, 1.0)

    hi = vals.max(axis=1)
    lo = vals.min(axis=1)

    # --- 8-value mode (stored e0 > e1) ---
    def cand8(e0f, e1f):
        q0, d0 = _quant_bc4(e0f, signed)
        q1, d1 = _quant_bc4(e1f, signed)
        idx, err = _bc4_assign(vals, d0, d1, _BC4_8V_W)
        return q0, q1, d0, d1, idx, err

    best8 = cand8(hi, lo)
    for _ in range(iters):
        w = _BC4_8V_W[best8[4]]
        e0, e1 = _ls_solve(vals[..., None], w)
        cand = cand8(e0[:, 0], e1[:, 0])
        better = cand[5] < best8[5]
        best8 = tuple(
            jnp.where(better[(...,) + (None,) * (b.ndim - 1)], c, b)
            for c, b in zip(cand, best8)
        )
    q0_8, q1_8, d0_8, d1_8, idx_8, err_8 = best8
    # Mode requires decoded e0 > e1; swap mapping for the lerp entries is
    # idx ^ 1 on {0,1} and reversal 2..7 -> 7..2 (9 - idx) on the rest.
    swap = d0_8 < d1_8
    q0o = jnp.where(swap, q1_8, q0_8)
    q1o = jnp.where(swap, q0_8, q1_8)
    idx_8o = jnp.where(
        swap[:, None], jnp.where(idx_8 < 2, idx_8 ^ 1, 9 - idx_8), idx_8
    )
    # Equal endpoints: mode becomes 6-value; indices 0 decode to e0 either way.
    idx_8o = jnp.where((q0o == q1o)[:, None], 0, idx_8o)

    if quality >= 2:
        # --- 6-value + extremes mode (stored e0 <= e1) ---
        def cand6(e0f, e1f):
            q0, d0 = _quant_bc4(e0f, signed)
            q1, d1 = _quant_bc4(e1f, signed)
            idx, err = _bc4_assign(
                vals, d0, d1, _BC4_6V_W, extremes=(lo_ext, hi_ext)
            )
            return q0, q1, d0, d1, idx, err

        # Seed from the interior range: values matching the fixed extremes
        # are served by the 0/1 palette entries, so exclude them.
        tol = 1.0 / 255.0
        interior = (vals > lo_ext + tol) & (vals < hi_ext - tol)
        hi_i = jnp.where(interior, vals, -jnp.inf).max(axis=1)
        lo_i = jnp.where(interior, vals, jnp.inf).min(axis=1)
        hi_s = jnp.where(jnp.isfinite(hi_i), hi_i, hi)
        lo_s = jnp.where(jnp.isfinite(lo_i), lo_i, lo)
        best6 = cand6(hi_s, lo_s)
        w6 = jnp.concatenate([_BC4_6V_W, jnp.zeros((2,), jnp.float32)])
        for _ in range(iters):
            w = w6[best6[4]]
            pv = (best6[4] < 6).astype(jnp.float32)
            e0, e1 = _ls_solve(vals[..., None], w, px_valid=pv)
            cand = cand6(e0[:, 0], e1[:, 0])
            better = cand[5] < best6[5]
            best6 = tuple(
                jnp.where(better[(...,) + (None,) * (b.ndim - 1)], c, b)
                for c, b in zip(cand, best6)
            )
        q0_6, q1_6, d0_6, d1_6, idx_6, err_6 = best6
        swap6 = d0_6 > d1_6
        q0_6o = jnp.where(swap6, q1_6, q0_6)
        q1_6o = jnp.where(swap6, q0_6, q1_6)
        idx_6o = jnp.where(
            swap6[:, None] & (idx_6 < 6),
            jnp.where(idx_6 < 2, idx_6 ^ 1, 7 - idx_6),
            idx_6,
        )
        pick6 = err_6 < err_8
        q0f = jnp.where(pick6, q0_6o, q0o)
        q1f = jnp.where(pick6, q1_6o, q1o)
        idx = jnp.where(pick6[:, None], idx_6o, idx_8o)
    else:
        q0f, q1f, idx = q0o, q1o, idx_8o

    # Pack as a little-endian 64-bit block: bits 0-7 e0, 8-15 e1, then texel i's
    # 3-bit index at bit 16+3i.  Texel 5 (bits 31-33) straddles the word split.
    idx = idx.astype(jnp.uint32)
    low = (q0f.astype(jnp.uint32) & 0xFF) | ((q1f.astype(jnp.uint32) & 0xFF) << 8)
    for i in range(5):  # texels 0-4: bits 16..30
        low = low | (idx[:, i] << jnp.uint32(16 + 3 * i))
    low = low | ((idx[:, 5] & 0x1) << jnp.uint32(31))
    high = idx[:, 5] >> jnp.uint32(1)
    for i in range(6, 16):  # texels 6-15: bits (3i-16)..(3i-14) of the high word
        high = high | (idx[:, i] << jnp.uint32(3 * i - 16))
    return jnp.stack([low, high], axis=-1)


# ---------------------------------------------------------------------------
# BC2 / BC3 / BC5 composites
# ---------------------------------------------------------------------------


def encode_bc2(blocks, quality=2, ch_weights=None):
    """[N,16,4] -> [N,4] uint32: explicit 4-bit alpha + BC1 colors
    (`S3tcConverter.cpp:340-356`, packBc2Alpha `:131-143`)."""
    if _use_pallas():
        chw = _static_chw(ch_weights)
        if chw is not None:
            from cuttlefish_tpu.kernels.bc_pallas import encode_bc2_pallas

            return encode_bc2_pallas(blocks, int(quality), chw)
    return _encode_bc2_jnp(blocks, quality, ch_weights)


@functools.partial(jax.jit, static_argnames=("quality",))
def _encode_bc2_jnp(blocks: jnp.ndarray, quality: int = 2, ch_weights=None) -> jnp.ndarray:
    a = jnp.round(jnp.clip(blocks[..., 3], 0.0, 1.0) * 15.0).astype(jnp.uint32)
    shifts = (4 * jnp.arange(8, dtype=jnp.uint32))
    a0 = (a[:, :8] << shifts[None, :]).sum(axis=1, dtype=jnp.uint32)
    a1 = (a[:, 8:] << shifts[None, :]).sum(axis=1, dtype=jnp.uint32)
    color = _encode_bc1_jnp(
        blocks, quality=quality, punch_through=False, allow_black=False,
        ch_weights=ch_weights,
    )
    return jnp.concatenate([jnp.stack([a0, a1], -1), color], axis=-1)


def encode_bc3(blocks, quality=2, ch_weights=None):
    """[N,16,4] -> [N,4] uint32: BC4 alpha + BC1 colors (no 3-color mode)."""
    if _use_pallas():
        chw = _static_chw(ch_weights)
        if chw is not None:
            from cuttlefish_tpu.kernels.bc_pallas import encode_bc3_pallas

            return encode_bc3_pallas(blocks, int(quality), chw)
    return _encode_bc3_jnp(blocks, quality, ch_weights)


@functools.partial(jax.jit, static_argnames=("quality",))
def _encode_bc3_jnp(blocks: jnp.ndarray, quality: int = 2, ch_weights=None) -> jnp.ndarray:
    alpha = _encode_bc4_jnp(blocks[..., 3], quality=quality, signed=False)
    color = _encode_bc1_jnp(
        blocks, quality=quality, punch_through=False, allow_black=False,
        ch_weights=ch_weights,
    )
    return jnp.concatenate([alpha, color], axis=-1)


def encode_bc5(blocks, quality=2, signed=False):
    """[N,16,>=2] -> [N,4] uint32: two BC4 channels (red, green)."""
    if _use_pallas():
        from cuttlefish_tpu.kernels.bc_pallas import encode_bc5_pallas

        return encode_bc5_pallas(blocks, int(quality), signed)
    return _encode_bc5_jnp(blocks, quality, signed)


@functools.partial(jax.jit, static_argnames=("quality", "signed"))
def _encode_bc5_jnp(blocks: jnp.ndarray, quality: int = 2, signed: bool = False) -> jnp.ndarray:
    r = _encode_bc4_jnp(blocks[..., 0], quality=quality, signed=signed)
    g = _encode_bc4_jnp(blocks[..., 1], quality=quality, signed=signed)
    return jnp.concatenate([r, g], axis=-1)
