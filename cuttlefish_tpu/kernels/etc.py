"""ETC1 / ETC2 / EAC block encoders (batched JAX).

TPU-native replacement for etc2comp (`/root/reference/lib/src/EtcConverter.cpp`).
Implemented modes:
  - ETC1: individual (4.4.4) and differential (5.5.5 + 3.3.3) base colors,
    2x4 / 4x2 subblocks (flip), 8 intensity modifier tables, enumerated
    exhaustively as fixed-shape candidates.
  - ETC2 adds the planar mode (RGB 6.7.6 corner colors, least-squares plane
    fit + B-overflow signaling), the T mode (two 4-bit colors, paint
    palette [C1, C2+d, C2, C2-d], R-overflow signaling), and the H mode
    (palette [C1+d, C1-d, C2+d, C2-d], G-overflow signaling with a blue
    low-bit perturbation fallback, low distance bit encoded by color
    ordering).
  - EAC: 8-bit alpha and 11-bit R/RG (signed + unsigned), base/multiplier/
    table search seeded from the block range.

ETC blocks are big-endian 64-bit words with column-major pixel order; the
kernels emit byte-swapped uint32 pairs so the little-endian serializer in
convert.blocks writes spec-order bytes.

Quality ladder: base-color luma perturbation radius and EAC multiplier
search width scale with quality (EtcConverter.cpp:34-54 maps quality to
etc2comp "effort" — here effort = candidate count).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Intensity modifiers, indexed [table, pixel_index]: [a, b, -a, -b].
_ETC1_MODS_NP = np.array(
    [
        [2, 8, -2, -8],
        [5, 17, -5, -17],
        [9, 29, -9, -29],
        [13, 42, -13, -42],
        [18, 60, -18, -60],
        [24, 80, -24, -80],
        [33, 106, -33, -106],
        [47, 183, -47, -183],
    ],
    np.int32,
)
_ETC1_MODS = jnp.asarray(_ETC1_MODS_NP)

# EAC modifier table [16, 8] (indices 0-3 negative, 4-7 positive).
_EAC_MODS_NP = np.array(
    [
        [-3, -6, -9, -15, 2, 5, 8, 14],
        [-3, -7, -10, -13, 2, 6, 9, 12],
        [-2, -5, -8, -13, 1, 4, 7, 12],
        [-2, -4, -6, -13, 1, 3, 5, 12],
        [-3, -6, -8, -12, 2, 5, 7, 11],
        [-3, -7, -9, -11, 2, 6, 8, 10],
        [-4, -7, -8, -11, 3, 6, 7, 10],
        [-3, -5, -8, -11, 2, 4, 7, 10],
        [-2, -6, -8, -10, 1, 5, 7, 9],
        [-2, -5, -8, -10, 1, 4, 7, 9],
        [-2, -4, -8, -10, 1, 3, 7, 9],
        [-2, -5, -7, -10, 1, 4, 6, 9],
        [-3, -4, -7, -10, 2, 3, 6, 9],
        [-1, -2, -3, -10, 0, 1, 2, 9],
        [-4, -6, -8, -9, 3, 5, 7, 8],
        [-3, -5, -7, -9, 2, 4, 6, 8],
    ],
    np.int32,
)
_EAC_MODS = jnp.asarray(_EAC_MODS_NP)

# Raster (4*y+x) -> ETC column-major pixel number (4*x+y).
_COLMAJOR_NP = np.array([4 * (i % 4) + i // 4 for i in range(16)], np.int32)
# Inverse: ETC pixel number p -> raster index.
_RASTER_OF_P_NP = np.argsort(_COLMAJOR_NP).astype(np.int32)

# Subblock membership per flip: flip=0 -> columns 0-1 vs 2-3;
# flip=1 -> rows 0-1 vs 2-3.  1.0 = pixel in subblock 2.
_SUB2_NP = np.zeros((2, 16), np.float32)
for _i in range(16):
    _x, _y = _i % 4, _i // 4
    _SUB2_NP[0, _i] = 1.0 if _x >= 2 else 0.0
    _SUB2_NP[1, _i] = 1.0 if _y >= 2 else 0.0
_SUB2 = jnp.asarray(_SUB2_NP)


def _expand4(v):
    return (v << 4) | v


def _expand5(v):
    return (v << 3) | (v >> 2)


def _swap_words(hi, lo):
    """(bits 63..32, bits 31..0) -> two byte-swapped LE uint32s."""

    def bswap(w):
        w = w.astype(jnp.uint32)
        return (
            ((w & 0xFF) << 24)
            | ((w & 0xFF00) << 8)
            | ((w >> 8) & 0xFF00)
            | (w >> 24)
        )

    return jnp.stack([bswap(hi), bswap(lo)], axis=-1)


# Punch-through modifier set (opaque bit 0): index 0 -> +0, index 1 -> +b,
# index 2 -> transparent (handled by the caller), index 3 -> -b.
_ETC_A1_MODS_NP = _ETC1_MODS_NP.copy()
_ETC_A1_MODS_NP[:, 0] = 0
_ETC_A1_MODS_NP[:, 2] = 0
_ETC_A1_MODS = jnp.asarray(_ETC_A1_MODS_NP)


def _best_table_fit(colors, base_dec, sub_mask, ch_w, mods=None, mod_allowed=None):
    """Exhaustive table/modifier fit for one subblock assignment.

    colors [M,16,3] 0..255, base_dec [M,3] decoded base, sub_mask [M,16]
    (1 = pixel counts toward this subblock's error) -> (table [M],
    idx [M,16], err [M]).  `mods` [8,4] overrides the modifier table;
    `mod_allowed` [4] masks out forbidden indices (punch-through idx 2).
    """
    if mods is None:
        mods = _ETC1_MODS
    # [M,16,8,4]: candidate value per pixel/table/mod.
    cand = base_dec[:, None, None, None, :] + mods[None, None, :, :, None]
    cand = jnp.clip(cand, 0, 255).astype(jnp.float32)
    d = colors[:, :, None, None, :] - cand
    e = jnp.einsum("nptmc,c->nptm", d * d, ch_w)
    if mod_allowed is not None:
        e = e + jnp.where(mod_allowed, 0.0, jnp.inf)[None, None, None, :]
    idx_pm = e.argmin(-1).astype(jnp.int32)  # [M,16,8]
    e_pm = e.min(-1)  # [M,16,8]
    e_t = (e_pm * sub_mask[:, :, None]).sum(1)  # [M,8]
    table = e_t.argmin(-1).astype(jnp.int32)  # [M]
    err = e_t.min(-1)
    idx = jnp.take_along_axis(idx_pm, table[:, None, None], axis=2)[:, :, 0]
    return table, idx, err


def _quant_bases(mean1, mean2, diff: bool):
    """Quantize two subblock means. Returns (stored fields, decoded bases)."""
    if diff:
        b1 = jnp.clip(jnp.round(mean1 * 31.0 / 255.0), 0, 31).astype(jnp.int32)
        b2 = jnp.clip(jnp.round(mean2 * 31.0 / 255.0), 0, 31).astype(jnp.int32)
        d = jnp.clip(b2 - b1, -4, 3)
        b2 = b1 + d
        return (b1, d), (_expand5(b1).astype(jnp.float32), _expand5(b2).astype(jnp.float32))
    b1 = jnp.clip(jnp.round(mean1 * 15.0 / 255.0), 0, 15).astype(jnp.int32)
    b2 = jnp.clip(jnp.round(mean2 * 15.0 / 255.0), 0, 15).astype(jnp.int32)
    return (b1, b2), (_expand4(b1).astype(jnp.float32), _expand4(b2).astype(jnp.float32))


def _pack_etc1(fields, diff, flip, t1, t2, idx_raster):
    """Assemble the 64-bit ETC1 word. idx_raster [M,16] 2-bit indices in
    raster order; pixel p (column-major) takes its bits from the raster map."""
    (f1, f2) = fields  # each [M,3] int32 (r,g,b): base1 and base2-or-delta
    m = t1.shape[0]
    hi = jnp.zeros((m,), jnp.uint32)
    if diff:
        for c in range(3):
            hi = hi | (f1[:, c].astype(jnp.uint32) << jnp.uint32(59 - 8 * c - 32))
            hi = hi | ((f2[:, c] & 0x7).astype(jnp.uint32) << jnp.uint32(56 - 8 * c - 32))
    else:
        for c in range(3):
            hi = hi | (f1[:, c].astype(jnp.uint32) << jnp.uint32(60 - 8 * c - 32))
            hi = hi | (f2[:, c].astype(jnp.uint32) << jnp.uint32(56 - 8 * c - 32))
    hi = hi | (t1.astype(jnp.uint32) << jnp.uint32(5))
    hi = hi | (t2.astype(jnp.uint32) << jnp.uint32(2))
    if diff:
        hi = hi | jnp.uint32(2)  # diff bit (bit 33)
    if flip:
        hi = hi | jnp.uint32(1)  # flip bit (bit 32)

    # Index planes: bit p = pixel p (column-major); pixel p reads raster
    # index _RASTER_OF_P[p].
    idx_p = idx_raster[:, _RASTER_OF_P_NP]  # [M,16] by pixel number
    msb = (idx_p >> 1).astype(jnp.uint32)
    lsb = (idx_p & 1).astype(jnp.uint32)
    shifts = jnp.arange(16, dtype=jnp.uint32)[None, :]
    lo = (lsb << shifts).sum(1, dtype=jnp.uint32) | (
        (msb << shifts).sum(1, dtype=jnp.uint32) << jnp.uint32(16)
    )
    return hi, lo


def _etc1_candidate(colors, ch_w, diff: bool, flip: int, luma_shift: float):
    """One fixed-shape ETC1 candidate; returns (err [M], (hi, lo))."""
    sub2 = _SUB2[flip][None, :]  # [1,16]
    sub1 = 1.0 - sub2
    n1 = sub1.sum()
    n2 = sub2.sum()
    mean1 = jnp.einsum("npc,np->nc", colors, jnp.broadcast_to(sub1, colors.shape[:2])) / n1
    mean2 = jnp.einsum("npc,np->nc", colors, jnp.broadcast_to(sub2, colors.shape[:2])) / n2
    mean1 = mean1 + luma_shift
    mean2 = mean2 + luma_shift
    fields, (dec1, dec2) = _quant_bases(mean1, mean2, diff)
    sub1b = jnp.broadcast_to(sub1, colors.shape[:2])
    sub2b = jnp.broadcast_to(sub2, colors.shape[:2])
    t1, idx1, err1 = _best_table_fit(colors, dec1, sub1b, ch_w)
    t2, idx2, err2 = _best_table_fit(colors, dec2, sub2b, ch_w)
    idx = jnp.where(sub2b > 0, idx2, idx1)
    hi, lo = _pack_etc1(fields, diff, flip, t1, t2, idx)
    return err1 + err2, (hi, lo)


# ---------------------------------------------------------------------------
# ETC2 planar mode
# ---------------------------------------------------------------------------

_PLANAR_XW = jnp.asarray(
    np.array([[(i % 4) for i in range(16)]], np.float32)
)
_PLANAR_YW = jnp.asarray(
    np.array([[(i // 4) for i in range(16)]], np.float32)
)


def _quant_planar(c, bits):
    maxv = (1 << bits) - 1
    v = jnp.clip(jnp.round(c * maxv / 255.0), 0, maxv).astype(jnp.int32)
    if bits == 6:
        dec = (v << 2) | (v >> 4)
    else:
        dec = (v << 1) | (v >> 6)
    return v, dec.astype(jnp.float32)


def _planar_candidate(colors, refine: int = 0):
    """Least-squares plane fit -> (err [M], (O,H,V) quantized fields, decs).

    ``refine`` (Highest quality): the rounded (O,H,V) triple is not the
    exact-error argmin (the decode clamps and truncates), and per channel
    the error is independent — sweep the 27-combo +-1 neighborhood
    exactly per channel, matching the effort-100 etc2_cpu.cpp tier."""
    # Model: p(x,y) = O + x/4*(H-O) + y/4*(V-O).  LS over (1, x/4, y/4).
    x = _PLANAR_XW / 4.0
    y = _PLANAR_YW / 4.0
    # Normal equations for basis [1-x-y, x, y] with coefficients [O,H,V].
    b0 = 1.0 - x - y
    basis = jnp.stack([b0[0], x[0], y[0]], axis=0)  # [3,16]
    g = basis @ basis.T  # [3,3]
    ginv = jnp.linalg.inv(g)
    proj = ginv @ basis  # [3,16]
    coef = jnp.einsum("kp,npc->nkc", proj, colors)  # [N,3,3] = O,H,V
    bits_of = (6, 7, 6)
    xi = _PLANAR_XW[0].astype(jnp.float32)  # [16]
    yi = _PLANAR_YW[0].astype(jnp.float32)

    def chan_dec(do_, dh_, dv_):
        val = (
            xi[None, :] * (dh_ - do_)[:, None]
            + yi[None, :] * (dv_ - do_)[:, None]
            + 4.0 * do_[:, None]
            + 2.0
        )
        return jnp.clip(jnp.floor(val / 4.0), 0, 255)  # [M,16]

    qs = []
    err_chs = []
    for c in range(3):
        bits = bits_of[c]
        maxv = (1 << bits) - 1
        qo, do_ = _quant_planar(coef[:, 0, c], bits)
        qh, dh_ = _quant_planar(coef[:, 1, c], bits)
        qv, dv_ = _quant_planar(coef[:, 2, c], bits)
        err_c = ((colors[:, :, c] - chan_dec(do_, dh_, dv_)) ** 2)
        if refine:
            best_e = err_c.sum(1)
            for d0 in (-1, 0, 1):
                for d1 in (-1, 0, 1):
                    for d2 in (-1, 0, 1):
                        if d0 == 0 and d1 == 0 and d2 == 0:
                            continue
                        o = jnp.clip(qo + d0, 0, maxv)
                        h = jnp.clip(qh + d1, 0, maxv)
                        v = jnp.clip(qv + d2, 0, maxv)
                        if bits == 6:
                            eo = ((o << 2) | (o >> 4)).astype(jnp.float32)
                            eh = ((h << 2) | (h >> 4)).astype(jnp.float32)
                            ev = ((v << 2) | (v >> 4)).astype(jnp.float32)
                        else:
                            eo = ((o << 1) | (o >> 6)).astype(jnp.float32)
                            eh = ((h << 1) | (h >> 6)).astype(jnp.float32)
                            ev = ((v << 1) | (v >> 6)).astype(jnp.float32)
                        e_px = (colors[:, :, c] - chan_dec(eo, eh, ev)) ** 2
                        e = e_px.sum(1)
                        take = e < best_e
                        qo = jnp.where(take, o, qo)
                        qh = jnp.where(take, h, qh)
                        qv = jnp.where(take, v, qv)
                        err_c = jnp.where(take[:, None], e_px, err_c)
                        best_e = jnp.minimum(e, best_e)
        qs.append((qo, qh, qv))
        err_chs.append(err_c)
    err_px = jnp.stack(err_chs, -1)
    fields = (
        qs[0][0], qs[1][0], qs[2][0],
        qs[0][1], qs[1][1], qs[2][1],
        qs[0][2], qs[1][2], qs[2][2],
    )
    return err_px, fields


def _pack_planar(fields, m):
    """Planar bit layout with B-overflow mode signaling.

    Scattered field positions per the Khronos Data Format spec; the free
    bits (63, 47..45, 42) are chosen per block so the differential-mode B
    check overflows: BO[4:3] + free bits form B1, BO[2:1]-area forms dB.
    """
    (ro, go, bo, rh, gh, bh, rv, gv, bv) = [f.astype(jnp.uint32) for f in fields]
    hi = jnp.zeros((m,), jnp.uint32)
    lo = jnp.zeros((m,), jnp.uint32)

    # R_O[5:0] -> 62..57
    hi = hi | (ro << jnp.uint32(57 - 32))
    # G_O[6] -> 56, G_O[5:0] -> 54..49
    hi = hi | ((go >> 6) << jnp.uint32(56 - 32))
    hi = hi | ((go & 0x3F) << jnp.uint32(49 - 32))
    # B_O[5] -> 48, B_O[4:3] -> 44..43, B_O[2:0] -> 41..39
    hi = hi | ((bo >> 5) << jnp.uint32(48 - 32))
    hi = hi | (((bo >> 3) & 0x3) << jnp.uint32(43 - 32))
    hi = hi | ((bo & 0x7) << jnp.uint32(39 - 32))
    # R_H[5:1] -> 38..34, R_H[0] -> 32; diff bit 33 = 1
    hi = hi | ((rh >> 1) << jnp.uint32(34 - 32))
    hi = hi | (rh & 0x1)
    hi = hi | jnp.uint32(2)
    # G_H[6:0] -> 31..25, B_H[5:0] -> 24..19
    lo = lo | (gh << jnp.uint32(25))
    lo = lo | (bh << jnp.uint32(19))
    # R_V[5:0] -> 18..13, G_V[6:0] -> 12..6, B_V[5:0] -> 5..0
    lo = lo | (rv << jnp.uint32(13))
    lo = lo | (gv << jnp.uint32(6))
    lo = lo | bv

    # Mode signaling: the differential decoder reads B1 = bits 47..43 and
    # dB = bits 42..40; free bits 47..45 and 42 must force
    # B1 + sext(dB) outside [0,31].  bits 44..43 = BO[4:3], 41..40 = BO[2:1].
    bo43 = (bo >> 3) & 0x3
    bo21 = (bo >> 1) & 0x3
    need_a = (bo43 + bo21) >= 4  # set 47..45=111, 42=0 -> sum overflows high
    hi = hi | jnp.where(need_a, jnp.uint32(0x7) << jnp.uint32(45 - 32), 0)
    hi = hi | jnp.where(need_a, 0, jnp.uint32(1) << jnp.uint32(42 - 32))
    # Also the R and G differential checks must NOT overflow, or the block
    # would decode as T/H.  R1 = bits 63..59 = [63, RO[5:2]]; dR = bits
    # 58..56 = [RO[1:0], GO[6]]; choosing bit 63=0 keeps R1 <= 15 and
    # R1 + sext(dR) within range unless dR is negative with tiny R1 --
    # handled by setting bit 63 when RO[5:2] is small and dR negative.
    r1 = (ro >> 2) & 0xF
    dr = ((ro & 0x3) << 1) | (go >> 6)
    dr_s = jnp.where(dr >= 4, dr.astype(jnp.int32) - 8, dr.astype(jnp.int32))
    r_under = (r1.astype(jnp.int32) + dr_s) < 0
    hi = hi | jnp.where(r_under, jnp.uint32(1) << jnp.uint32(63 - 32), 0)
    # G check: G1 = bits 55..51 = [55, GO[5:2]]; dG = bits 50..48 =
    # [GO[1:0], BO[5]]; same guard with free bit 55.
    g1 = (go >> 2) & 0xF
    dg = ((go & 0x3) << 1) | (bo >> 5)
    dg_s = jnp.where(dg >= 4, dg.astype(jnp.int32) - 8, dg.astype(jnp.int32))
    g_under = (g1.astype(jnp.int32) + dg_s) < 0
    hi = hi | jnp.where(g_under, jnp.uint32(1) << jnp.uint32(55 - 32), 0)
    return hi, lo


# ---------------------------------------------------------------------------
# ETC2 T mode: two 4-bit colors, palette [C1, C2+d, C2, C2-d]
# ---------------------------------------------------------------------------

_ETC2_DIST_NP = np.array([3, 6, 11, 16, 23, 32, 41, 64], np.int32)
_ETC2_DIST = jnp.asarray(_ETC2_DIST_NP)

# one-hot rows for the +-1 coordinate-descent steps (refine passes)
_COORD_OH = [
    jnp.asarray(np.eye(3, dtype=np.int32)[c][None, :]) for c in range(3)
]


def _quant444(c):
    """[M,3] float 0..255 -> (q [M,3] int 0..15, dec [M,3] float)."""
    q = jnp.clip(jnp.round(c * 15.0 / 255.0), 0, 15).astype(jnp.int32)
    return q, _expand4(q).astype(jnp.float32)


def _pack_t(q1, q2, didx, idx_raster):
    """T-mode word: colors [M,3] 4-bit, distance index [M], 2-bit indices.

    Fields: R1[3:2]@60, R1[1:0]@56, G1@52, B1@48, R2@44, G2@40, B2@36,
    d[2:1]@34, d[0]@32, diff bit 33 = 1.  Free bits 63..61 and 58 force the
    differential R check out of range (mode signaling).
    """
    r1, g1, b1 = q1[:, 0], q1[:, 1], q1[:, 2]
    r32 = r1 >> 2
    r10 = r1 & 0x3
    hi = jnp.zeros((r1.shape[0],), jnp.uint32)
    hi = hi | (r32.astype(jnp.uint32) << jnp.uint32(59 - 32))
    hi = hi | (r10.astype(jnp.uint32) << jnp.uint32(56 - 32))
    hi = hi | (g1.astype(jnp.uint32) << jnp.uint32(52 - 32))
    hi = hi | (b1.astype(jnp.uint32) << jnp.uint32(48 - 32))
    hi = hi | (q2[:, 0].astype(jnp.uint32) << jnp.uint32(44 - 32))
    hi = hi | (q2[:, 1].astype(jnp.uint32) << jnp.uint32(40 - 32))
    hi = hi | (q2[:, 2].astype(jnp.uint32) << jnp.uint32(36 - 32))
    hi = hi | ((didx >> 1).astype(jnp.uint32) << jnp.uint32(34 - 32))
    hi = hi | ((didx & 1).astype(jnp.uint32))
    hi = hi | jnp.uint32(2)  # diff bit
    # Signal R overflow: A (b63..61=111, b58=0) iff r32+r10 >= 4, else B.
    use_a = (r32 + r10) >= 4
    hi = hi | jnp.where(use_a, jnp.uint32(0x7) << jnp.uint32(61 - 32), 0)
    hi = hi | jnp.where(use_a, 0, jnp.uint32(1) << jnp.uint32(58 - 32))

    idx_p = idx_raster[:, _RASTER_OF_P_NP]
    msb = (idx_p >> 1).astype(jnp.uint32)
    lsb = (idx_p & 1).astype(jnp.uint32)
    shifts = jnp.arange(16, dtype=jnp.uint32)[None, :]
    lo = (lsb << shifts).sum(1, dtype=jnp.uint32) | (
        (msb << shifts).sum(1, dtype=jnp.uint32) << jnp.uint32(16)
    )
    return hi, lo


def _pca_split(colors, weight=None):
    """Principal-axis cluster split -> (mean_pos, mean_neg) [M,3].

    `weight` [M,16] optionally excludes texels (punch-through transparents)
    from both the axis fit and the cluster means."""
    w = jnp.ones(colors.shape[:2]) if weight is None else weight
    cnt = w.sum(1, keepdims=True) + 1e-6
    mean = (jnp.einsum("npc,np->nc", colors, w) / cnt)[:, None, :]
    centered = (colors - mean) * w[..., None]
    cov = jnp.einsum("nic,nid->ncd", centered, centered)
    norms = (centered * centered).sum(-1)
    from cuttlefish_tpu.kernels.bc import select_at_max
    start = select_at_max(norms, centered)
    n0 = jnp.linalg.norm(start, axis=-1, keepdims=True)
    v = jnp.where(n0 > 1e-10, start / (n0 + 1e-20), jnp.ones_like(start))
    for _ in range(3):
        nv = jnp.einsum("ncd,nd->nc", cov, v)
        nn = jnp.linalg.norm(nv, axis=-1, keepdims=True)
        v = jnp.where(nn > 1e-10, nv / (nn + 1e-20), v)
    t = jnp.einsum("nic,nc->ni", centered, v)
    split = (t > 0).astype(jnp.float32) * w

    def cmean(mask):
        cnt = mask.sum(1, keepdims=True) + 1e-6
        return (colors * mask[..., None]).sum(1) / cnt

    return cmean(split), cmean((1.0 - split) * w)


def _etc2_t_candidate(colors, ch_w, alpha_mask=None, refine: int = 0):
    """Best T-mode encoding: cluster split + distance search.

    colors [M,16,3] 0..255 -> (err [M], (hi, lo)).  With `alpha_mask`
    (punch-through, opaque bit 0) palette entry 2 becomes transparent
    black: opaque texels may not use it, transparent texels must
    (Khronos DFS §C.2.3 punch-through tables), and the opaque bit is
    cleared in the packed word.

    ``refine`` passes of +-1 coordinate descent over the six 4-bit color
    coordinates (at the per-block best distance, then a final distance
    re-sweep) — the effort-100 T refinement of etc2_cpu.cpp."""
    m = colors.shape[0]
    punch = alpha_mask is not None
    mean_pos, mean_neg = _pca_split(colors, alpha_mask)
    texel_w = jnp.ones(colors.shape[:2]) if not punch else alpha_mask

    def t_eval(q1, q2, dist_f):
        """Palette eval for per-block distance dist_f [M] -> (idx, err)."""
        d1 = _expand4(q1).astype(jnp.float32)
        d2 = _expand4(q2).astype(jnp.float32)
        df = dist_f[:, None]
        pal = jnp.stack(
            [d1, jnp.clip(d2 + df, 0, 255), d2, jnp.clip(d2 - df, 0, 255)],
            axis=1,
        )  # [M,4,3]
        diff = colors[:, :, None, :] - pal[:, None, :, :]
        e = jnp.einsum("npkc,c->npk", diff * diff, ch_w)
        if punch:
            e = e.at[:, :, 2].set(jnp.inf)
        idx = e.argmin(-1).astype(jnp.int32)
        err = (e.min(-1) * texel_w).sum(1)
        if punch:
            idx = jnp.where(alpha_mask < 0.5, 2, idx)
        return idx, err

    best = None
    for c1f, c2f in ((mean_pos, mean_neg), (mean_neg, mean_pos)):
        q1, d1 = _quant444(c1f)
        q2, d2 = _quant444(c2f)
        for di in range(8):
            dist = float(_ETC2_DIST_NP[di])
            idx, err = t_eval(q1, q2, jnp.full((m,), dist, jnp.float32))
            cand = (q1, q2, jnp.full((m,), di, jnp.int32), idx, err)
            if best is None:
                best = cand
            else:
                take = cand[4] < best[4]
                best = tuple(
                    jnp.where(take[(...,) + (None,) * (b.ndim - 1)], c, b)
                    for c, b in zip(cand, best)
                )
    q1, q2, didx, idx, err = best
    if refine:
        for _ in range(refine):
            for which in (0, 1):
                for c in range(3):
                    for dd in (-1, 1):
                        step = dd * _COORD_OH[c]
                        if which == 0:
                            q1n = jnp.clip(q1 + step, 0, 15)
                            q2n = q2
                        else:
                            q1n = q1
                            q2n = jnp.clip(q2 + step, 0, 15)
                        # distance and color interact (the C2 +- d arms
                        # span the cluster), so each step also tries the
                        # adjacent distance rungs
                        for dstep in (-1, 0, 1):
                            didxn = jnp.clip(didx + dstep, 0, 7)
                            dist_f = jnp.take(
                                _ETC2_DIST.astype(jnp.float32), didxn
                            )
                            idxn, errn = t_eval(q1n, q2n, dist_f)
                            take = errn < err
                            q1 = jnp.where(take[:, None], q1n, q1)
                            q2 = jnp.where(take[:, None], q2n, q2)
                            didx = jnp.where(take, didxn, didx)
                            idx = jnp.where(take[:, None], idxn, idx)
                            err = jnp.minimum(errn, err)
            # distance re-sweep with the refined colors, feeding the
            # next pass's working distance
            for di in range(8):
                dist = float(_ETC2_DIST_NP[di])
                idxn, errn = t_eval(
                    q1, q2, jnp.full((m,), dist, jnp.float32)
                )
                take = errn < err
                didx = jnp.where(take, di, didx)
                idx = jnp.where(take[:, None], idxn, idx)
                err = jnp.minimum(errn, err)
    hi, lo = _pack_t(q1, q2, didx, idx)
    if punch:
        hi = hi & ~jnp.uint32(2)  # opaque bit 33 = 0
    return err, (hi, lo)


# ---------------------------------------------------------------------------
# ETC2 H mode: two 4-bit colors, palette [C1+d, C1-d, C2+d, C2-d]
# ---------------------------------------------------------------------------


def _pack_h(q1, q2, didx, idx_raster):
    """H-mode word.  Fields: R1@62..59, G1[3:1]@58..56, G1[0]@52, B1[3]@51,
    B1[2:1]@49..48, B1[0]@47, R2@46..43, G2@42..39, B2@38..35, d[2]@34, d[1]@32,
    d[0] = (packed(C1) >= packed(C2)); diff bit 33 = 1.  Mode signaling via
    the differential G check (G1read = bits 55..51, dG = bits 50..48): free
    bits 55..53 plus free bit 50 always suffice to force it out of range —
    with q = 2*G1[0] + B1[3] and b21 = B1[2:1], either 28+q+b21 >= 32
    (free3=7, bit50=0) or q + (b21-4) < 0 (free3=0, bit50=1).  Bit 63 keeps
    the R check in range.  Layout validated bit-exactly against Mesa
    llvmpipe (tests/gl_oracle.py).
    """
    r1, g1, b1 = q1[:, 0], q1[:, 1], q1[:, 2]
    m = r1.shape[0]
    q = 2 * (g1 & 1) + (b1 >> 3)
    b21 = (b1 >> 1) & 0x3
    over = (q + b21) >= 4
    free3 = jnp.where(over, 7, 0)
    bit50 = jnp.where(over, 0, 1)
    hi = jnp.zeros((m,), jnp.uint32)
    hi = hi | (r1.astype(jnp.uint32) << jnp.uint32(59 - 32))
    hi = hi | ((g1 >> 1).astype(jnp.uint32) << jnp.uint32(56 - 32))
    hi = hi | ((g1 & 1).astype(jnp.uint32) << jnp.uint32(52 - 32))
    hi = hi | ((b1 >> 3).astype(jnp.uint32) << jnp.uint32(51 - 32))
    hi = hi | (((b1 >> 1) & 0x3).astype(jnp.uint32) << jnp.uint32(48 - 32))
    hi = hi | ((b1 & 0x1).astype(jnp.uint32) << jnp.uint32(47 - 32))
    hi = hi | (q2[:, 0].astype(jnp.uint32) << jnp.uint32(43 - 32))
    hi = hi | (q2[:, 1].astype(jnp.uint32) << jnp.uint32(39 - 32))
    hi = hi | (q2[:, 2].astype(jnp.uint32) << jnp.uint32(35 - 32))
    hi = hi | ((didx >> 2).astype(jnp.uint32) << jnp.uint32(34 - 32))
    hi = hi | (((didx >> 1) & 1).astype(jnp.uint32))  # d[1] at bit 32
    hi = hi | jnp.uint32(2)  # diff bit 33
    hi = hi | (free3.astype(jnp.uint32) << jnp.uint32(53 - 32))
    hi = hi | (bit50.astype(jnp.uint32) << jnp.uint32(50 - 32))
    # Keep the R check in range: R1read = [b63, R1], dR = G1[3:1].
    dr = g1 >> 1
    dr_s = jnp.where(dr >= 4, dr - 8, dr)
    r_under = (r1 + dr_s) < 0
    hi = hi | jnp.where(r_under, jnp.uint32(1) << jnp.uint32(63 - 32), 0)

    idx_p = idx_raster[:, _RASTER_OF_P_NP]
    msb = (idx_p >> 1).astype(jnp.uint32)
    lsb = (idx_p & 1).astype(jnp.uint32)
    shifts = jnp.arange(16, dtype=jnp.uint32)[None, :]
    lo = (lsb << shifts).sum(1, dtype=jnp.uint32) | (
        (msb << shifts).sum(1, dtype=jnp.uint32) << jnp.uint32(16)
    )
    return hi, lo


def _etc2_h_candidate(colors, ch_w, alpha_mask=None, refine: int = 0):
    """Best H-mode encoding: cluster split + distance search with the
    ordering-encoded low distance bit.  colors [M,16,3] 0..255.  With
    `alpha_mask` (punch-through) palette entry 2 (= C2+d) becomes
    transparent black, same rules as the T variant.

    ``refine``: +-1 coordinate-descent passes on the colors (effort-100
    tier).  Perturbed candidates are canonicalized — the color pair is
    swapped when the packed ordering no longer matches the distance LSB
    (the palette is symmetric under the swap), so every step stays
    encodable."""
    m = colors.shape[0]
    punch = alpha_mask is not None
    mean_pos, mean_neg = _pca_split(colors, alpha_mask)
    texel_w = jnp.ones(colors.shape[:2]) if not punch else alpha_mask

    def h_eval(q1, q2, dist_f):
        """Palette eval at per-block distance [M] -> (idx, err_raw)."""
        d1 = _expand4(q1).astype(jnp.float32)
        d2 = _expand4(q2).astype(jnp.float32)
        df = dist_f[:, None]
        pal = jnp.stack(
            [
                jnp.clip(d1 + df, 0, 255),
                jnp.clip(d1 - df, 0, 255),
                jnp.clip(d2 + df, 0, 255),
                jnp.clip(d2 - df, 0, 255),
            ],
            axis=1,
        )
        diff = colors[:, :, None, :] - pal[:, None, :, :]
        e = jnp.einsum("npkc,c->npk", diff * diff, ch_w)
        if punch:
            e = e.at[:, :, 2].set(jnp.inf)
        idx = e.argmin(-1).astype(jnp.int32)
        err = (e.min(-1) * texel_w).sum(1)
        if punch:
            idx = jnp.where(alpha_mask < 0.5, 2, idx)
        return idx, err

    def packed(q):
        return (q[:, 0] << 8) | (q[:, 1] << 4) | q[:, 2]

    best = None
    for c1f, c2f in ((mean_pos, mean_neg), (mean_neg, mean_pos)):
        q1, _ = _quant444(c1f)
        q2, _ = _quant444(c2f)
        ord_bit = (packed(q1) >= packed(q2)).astype(jnp.int32)
        for di in range(8):
            dist = float(_ETC2_DIST_NP[di])
            valid = (di & 1) == ord_bit
            idx, err = h_eval(q1, q2, jnp.full((m,), dist, jnp.float32))
            err = err + jnp.where(valid, 0.0, jnp.inf)
            cand = (q1, q2, jnp.full((m,), di, jnp.int32), idx, err)
            if best is None:
                best = cand
            else:
                take = cand[4] < best[4]
                best = tuple(
                    jnp.where(take[(...,) + (None,) * (b.ndim - 1)], c, b)
                    for c, b in zip(cand, best)
                )
    q1, q2, didx, idx, err = best
    if refine:

        def canon(q1n, q2n, want):
            p1 = packed(q1n)
            p2 = packed(q2n)
            swap = ((p1 >= p2).astype(jnp.int32) != want)
            q1c = jnp.where(swap[:, None], q2n, q1n)
            q2c = jnp.where(swap[:, None], q1n, q2n)
            p1c = jnp.where(swap, p2, p1)
            p2c = jnp.where(swap, p1, p2)
            ok = (p1c >= p2c).astype(jnp.int32) == want
            return q1c, q2c, ok

        for _ in range(refine):
            for which in (0, 1):
                for c in range(3):
                    for dd in (-1, 1):
                        step = dd * _COORD_OH[c]
                        if which == 0:
                            q1n = jnp.clip(q1 + step, 0, 15)
                            q2n = q2
                        else:
                            q1n = q1
                            q2n = jnp.clip(q2 + step, 0, 15)
                        for dstep in (-1, 0, 1):
                            didxn = jnp.clip(didx + dstep, 0, 7)
                            dist_f = jnp.take(
                                _ETC2_DIST.astype(jnp.float32), didxn
                            )
                            q1c, q2c, ok = canon(q1n, q2n, didxn & 1)
                            idxn, errn = h_eval(q1c, q2c, dist_f)
                            errn = errn + jnp.where(ok, 0.0, jnp.inf)
                            take = errn < err
                            q1 = jnp.where(take[:, None], q1c, q1)
                            q2 = jnp.where(take[:, None], q2c, q2)
                            didx = jnp.where(take, didxn, didx)
                            idx = jnp.where(take[:, None], idxn, idx)
                            err = jnp.minimum(errn, err)
            # distance re-sweep: canonicalize the refined colors to each
            # distance's LSB and keep the best, feeding the next pass.
            q1f, q2f, didxf, idxf, errf = q1, q2, didx, idx, err
            for di in range(8):
                want_d = jnp.full((m,), di & 1, jnp.int32)
                q1c, q2c, ok = canon(q1, q2, want_d)
                idxn, errn = h_eval(
                    q1c, q2c,
                    jnp.full((m,), float(_ETC2_DIST_NP[di]), jnp.float32),
                )
                errn = errn + jnp.where(ok, 0.0, jnp.inf)
                take = errn < errf
                q1f = jnp.where(take[:, None], q1c, q1f)
                q2f = jnp.where(take[:, None], q2c, q2f)
                didxf = jnp.where(take, di, didxf)
                idxf = jnp.where(take[:, None], idxn, idxf)
                errf = jnp.minimum(errn, errf)
            q1, q2, didx, idx, err = q1f, q2f, didxf, idxf, errf
    hi, lo = _pack_h(q1, q2, didx, idx)
    if punch:
        hi = hi & ~jnp.uint32(2)  # opaque bit 33 = 0
    return err, (hi, lo)


# Base-color neighborhood search per quality level: luma perturbations of
# the quantized sub-block means (+-8 = one 5-bit quant step).  The effort
# ladder is the analog of etc2comp's effort 0..100 mapping
# (`EtcConverter.cpp:34-54`): Lowest additionally skips the individual-mode
# candidates, and candidate count grows 2/4/12/20/28 from Lowest to Highest.
# (Still used by the punch-through A1 path.)
_ETC_SHIFTS = {
    0: (0.0,),
    1: (0.0,),
    2: (-8.0, 0.0, 8.0),
    3: (-12.0, -6.0, 0.0, 6.0, 12.0),
    4: (-16.0, -10.0, -5.0, 0.0, 5.0, 10.0, 16.0),
}

# Per-channel quant-index neighborhood for the RGB path (round-4): the
# etc2comp/etc2_cpu.cpp-class breadth.  Per-channel rounding interacts
# with the modifier-table fit, so scalar luma shifts systematically lose
# ~0.2-0.3 dB on real content (tests/test_corpus.py) — sweep the quant
# lattice instead.  ("floor", {0,1}^3) = per-channel floor/ceil of the
# unrounded mean; ("round", {-1,0,1}^3) = the CPU reference's nbh=1 cube.
def _offset_cube(lo, hi):
    return tuple(
        (a, b, c)
        for a in range(lo, hi + 1)
        for b in range(lo, hi + 1)
        for c in range(lo, hi + 1)
    )


_ETC_OFFSETS = {
    0: ("round", ((0, 0, 0),)),
    1: ("round", ((0, 0, 0),)),
    2: ("round", _offset_cube(-1, 1)),
    3: ("round", _offset_cube(-1, 1)),
    # q4 (effort 100): radius-1 cube + luma diagonals, ranked by the
    # restricted-table proxy and deep-fit top-8 (est_keep below).  A
    # measured radius-2 cube moved no harness row (the CPU bar's q4 edge
    # is its T/H/planar refinement, not base breadth) while exploding
    # the unrolled-trace compile time, so Highest keeps this set.
    4: ("round", _offset_cube(-1, 1) + ((-2, -2, -2), (2, 2, 2),
                                        (-3, -3, -3), (3, 3, 3))),
}


def _best_table_fit2(colors, base_dec, sub_mask, ch_w):
    """_best_table_fit + the runner-up table (for the estimate proxy)."""
    cand = base_dec[:, None, None, None, :] + _ETC1_MODS[None, None, :, :, None]
    cand = jnp.clip(cand, 0, 255).astype(jnp.float32)
    d = colors[:, :, None, None, :] - cand
    e = jnp.einsum("nptmc,c->nptm", d * d, ch_w)
    idx_pm = e.argmin(-1).astype(jnp.int32)
    e_pm = e.min(-1)
    e_t = (e_pm * sub_mask[:, :, None]).sum(1)  # [M,8]
    table = e_t.argmin(-1).astype(jnp.int32)
    err = e_t.min(-1)
    idx = jnp.take_along_axis(idx_pm, table[:, None, None], axis=2)[:, :, 0]
    e_t2 = jnp.where(
        jax.nn.one_hot(table, 8, dtype=jnp.bool_), jnp.inf, e_t
    )
    table2 = e_t2.argmin(-1).astype(jnp.int32)
    return table, table2, idx, err


def _table_modvals(table):
    """The 4 modifier values of a per-block dynamic table: [M] table ->
    list of 4 [M] floats.  One-hot selects (gather-free, identical op
    order in the Pallas mirror for tie parity)."""
    out = []
    for mm in range(4):
        v = jnp.zeros(table.shape, jnp.float32)
        for tt in range(8):
            v = jnp.where(table == tt, float(_ETC1_MODS_NP[tt][mm]), v)
        out.append(v)
    return out


def _restricted_err(colors, ch_w, subm, dec, mvals):
    """Block error with the table fixed to `mvals` (4 [M] modifier values)
    but the per-pixel index free: the estimate-then-refine ranking proxy
    (1/8 of a full 8-table fit)."""
    e_best = None
    for mv in mvals:
        val = jnp.clip(dec[:, None, :] + mv[:, None, None], 0.0, 255.0)
        e = jnp.einsum("npc,c->np", (colors - val) ** 2, ch_w)
        e_best = e if e_best is None else jnp.minimum(e_best, e)
    return (e_best * subm).sum(1)


def _ind_subfit(colors, ch_w, subm, mean, offsets, floor_mode, est_keep=0):
    """Individual-mode per-subblock search: best (b4 [M,3], table, idx,
    err) over the quant-offset cube.  Sub-blocks are independent in
    individual mode, so the caller combines two independent winners
    (covering |offsets|^2 pairings with |offsets| evals each).

    est_keep > 0 runs the estimate-then-refine pass (bc7e's "estimate
    mode error" in role): the center offset is fit in full (8 tables x 4
    mods); the other offsets are RANKED by their error with the table
    restricted to the center's winner (index free) — 1/8 of a full fit —
    and only the per-block top `est_keep` are deep-fit."""
    qf = jnp.floor if floor_mode else jnp.round
    base_q = qf(mean * (15.0 / 255.0))

    def base_of(o):
        return jnp.clip(
            base_q + jnp.asarray(o, base_q.dtype), 0, 15
        ).astype(jnp.int32)

    def full_fit(b):
        dec = _expand4(b).astype(jnp.float32)
        t, idx, err = _best_table_fit(colors, dec, subm, ch_w)
        return (b, t, idx, err)

    def merge(best, cand):
        take = cand[3] < best[3]
        return (
            jnp.where(take[:, None], cand[0], best[0]),
            jnp.where(take, cand[1], best[1]),
            jnp.where(take[:, None], cand[2], best[2]),
            jnp.minimum(cand[3], best[3]),
        )

    if not est_keep or len(offsets) <= est_keep + 1:
        best = None
        for o in offsets:
            cand = full_fit(base_of(o))
            best = cand if best is None else merge(best, cand)
        return best

    bc = base_of((0, 0, 0))
    t_c, t2_c, idx_c, err_c = _best_table_fit2(
        colors, _expand4(bc).astype(jnp.float32), subm, ch_w
    )
    center = (bc, t_c, idx_c, err_c)
    mvals = _table_modvals(t_c) + _table_modvals(t2_c)
    others = [o for o in offsets if o != (0, 0, 0)]
    bases = [base_of(o) for o in others]
    ests = [
        _restricted_err(
            colors, ch_w, subm, _expand4(b).astype(jnp.float32), mvals
        )
        for b in bases
    ]
    best = center
    chosen = [jnp.zeros_like(ests[0], jnp.bool_) for _ in ests]
    for _ in range(est_keep):
        bi = None
        be = None
        for i, e in enumerate(ests):
            ee = jnp.where(chosen[i], jnp.inf, e)
            if bi is None:
                bi = jnp.zeros_like(e, jnp.int32)
                be = ee
            else:
                take = ee < be
                bi = jnp.where(take, i, bi)
                be = jnp.minimum(ee, be)
        bsel = None
        for i, b in enumerate(bases):
            bsel = b if bsel is None else jnp.where(
                (bi == i)[:, None], b, bsel
            )
        for i in range(len(ests)):
            chosen[i] = chosen[i] | (bi == i)
        best = merge(best, full_fit(bsel))
    return best


def _diff_fit(colors, ch_w, sub1b, sub2b, mean1, mean2, offsets, floor_mode,
              est_keep=0):
    """Differential-mode joint search: sweep base-1's quant cube, re-derive
    the clamped base-2 delta per candidate (etc2_cpu.cpp's joint sweep —
    the delta clamp must see each base-1 candidate).  est_keep as in
    _ind_subfit (frozen-assignment ranking over both sub-blocks)."""
    qf = jnp.floor if floor_mode else jnp.round
    base1_q = qf(mean1 * (31.0 / 255.0))
    b2n = jnp.clip(jnp.round(mean2 * (31.0 / 255.0)), 0, 31).astype(jnp.int32)

    def bases_of(o):
        b1 = jnp.clip(
            base1_q + jnp.asarray(o, base1_q.dtype), 0, 31
        ).astype(jnp.int32)
        d = jnp.clip(b2n - b1, -4, 3)
        return b1, d, b1 + d

    def full_fit(b1, d, b2):
        t1, idx1, e1 = _best_table_fit(
            colors, _expand5(b1).astype(jnp.float32), sub1b, ch_w
        )
        t2, idx2, e2 = _best_table_fit(
            colors, _expand5(b2).astype(jnp.float32), sub2b, ch_w
        )
        return (b1, d, t1, t2, idx1, idx2, e1 + e2)

    def merge(best, cand):
        take = cand[6] < best[6]
        return tuple(
            jnp.where(take[(...,) + (None,) * (c.ndim - 1)], c, b)
            for c, b in zip(cand, best)
        )

    if not est_keep or len(offsets) <= est_keep + 1:
        best = None
        for o in offsets:
            cand = full_fit(*bases_of(o))
            best = cand if best is None else merge(best, cand)
        return best

    b1c, dc, b2c = bases_of((0, 0, 0))
    t1c, t1c2, idx1c, e1c = _best_table_fit2(
        colors, _expand5(b1c).astype(jnp.float32), sub1b, ch_w
    )
    t2c, t2c2, idx2c, e2c = _best_table_fit2(
        colors, _expand5(b2c).astype(jnp.float32), sub2b, ch_w
    )
    center = (b1c, dc, t1c, t2c, idx1c, idx2c, e1c + e2c)
    mv1 = _table_modvals(t1c) + _table_modvals(t1c2)
    mv2 = _table_modvals(t2c) + _table_modvals(t2c2)
    others = [o for o in offsets if o != (0, 0, 0)]
    b1s = [bases_of(o)[0] for o in others]
    ests = []
    for b1 in b1s:
        d = jnp.clip(b2n - b1, -4, 3)
        e1 = _restricted_err(
            colors, ch_w, sub1b, _expand5(b1).astype(jnp.float32), mv1
        )
        e2 = _restricted_err(
            colors, ch_w, sub2b,
            _expand5(b1 + d).astype(jnp.float32), mv2,
        )
        ests.append(e1 + e2)
    best = center
    chosen = [jnp.zeros_like(ests[0], jnp.bool_) for _ in ests]
    for _ in range(est_keep):
        bi = None
        be = None
        for i, e in enumerate(ests):
            ee = jnp.where(chosen[i], jnp.inf, e)
            if bi is None:
                bi = jnp.zeros_like(e, jnp.int32)
                be = ee
            else:
                take = ee < be
                bi = jnp.where(take, i, bi)
                be = jnp.minimum(ee, be)
        b1sel = None
        for i, b1 in enumerate(b1s):
            b1sel = b1 if b1sel is None else jnp.where(
                (bi == i)[:, None], b1, b1sel
            )
        for i in range(len(ests)):
            chosen[i] = chosen[i] | (bi == i)
        dsel = jnp.clip(b2n - b1sel, -4, 3)
        best = merge(best, full_fit(b1sel, dsel, b1sel + dsel))
    return best



def _use_pallas() -> bool:
    """Pallas path on TPU (CUTTLEFISH_PALLAS=0 disables, =1 forces the
    interpreted kernel on CPU for tests)."""
    import os

    use = os.environ.get("CUTTLEFISH_PALLAS", "auto")
    if use == "0":
        return False
    return use == "1" or jax.default_backend() == "tpu"


def _interp() -> bool:
    import os

    return jax.default_backend() != "tpu"


def _static_chw(ch_weights):
    if ch_weights is None:
        return (1.0, 1.0, 1.0)
    try:
        return tuple(float(x) for x in np.asarray(ch_weights))
    except Exception:
        return None


def encode_etc_rgb(blocks, quality=2, etc2=False, ch_weights=None):
    """Dispatch: Pallas kernel on TPU, jnp path otherwise."""
    if _use_pallas():
        chw = _static_chw(ch_weights)
        if chw is not None:
            from cuttlefish_tpu.kernels.etc_pallas import encode_etc_rgb_pallas

            return encode_etc_rgb_pallas(
                blocks, int(quality), bool(etc2), chw, interpret=_interp()
            )
    return _encode_etc_rgb_jnp(blocks, quality, etc2, ch_weights)


@functools.partial(jax.jit, static_argnames=("quality", "etc2"))
def _encode_etc_rgb_jnp(
    blocks: jnp.ndarray,
    quality: int = 2,
    etc2: bool = False,
    ch_weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Encode [N,16,>=3] float RGB(A) blocks (0..1) to ETC1/ETC2 RGB words."""
    colors = jnp.clip(blocks[..., :3].astype(jnp.float32), 0, 1) * 255.0
    ch_w = jnp.ones((3,), jnp.float32) if ch_weights is None else ch_weights
    quality = max(0, min(4, int(quality)))

    best_err = None
    best = None
    floor_mode = _ETC_OFFSETS[quality][0] == "floor"
    offsets = _ETC_OFFSETS[quality][1]
    # Estimate-then-refine over the offset cube (ranking with the
    # table restricted to the center fit's top-2, index free; deep-fit
    # the per-block top-k) — ~2x the exhaustive q2 throughput, still >=
    # the CPU reference on the corpus.  q4 ranks the full radius-2 cube
    # (125 offsets) and deep-fits 8.
    est_keep = 4 if quality in (2, 3) else (8 if quality >= 4 else 0)
    for flip in (0, 1):
        sub2 = _SUB2[flip][None, :]
        sub1 = 1.0 - sub2
        sub1b = jnp.broadcast_to(sub1, colors.shape[:2])
        sub2b = jnp.broadcast_to(sub2, colors.shape[:2])
        mean1 = jnp.einsum("npc,np->nc", colors, sub1b) / sub1.sum()
        mean2 = jnp.einsum("npc,np->nc", colors, sub2b) / sub2.sum()

        b1, d, t1, t2, idx1, idx2, derr = _diff_fit(
            colors, ch_w, sub1b, sub2b, mean1, mean2, offsets, floor_mode,
            est_keep,
        )
        idx = jnp.where(sub2b > 0, idx2, idx1)
        words = _pack_etc1((b1, d), True, flip, t1, t2, idx)
        if best_err is None:
            best_err, best = derr, words
        else:
            take = derr < best_err
            best = tuple(jnp.where(take, w, b) for w, b in zip(words, best))
            best_err = jnp.where(take, derr, best_err)

        if quality >= 1:
            i1 = _ind_subfit(
                colors, ch_w, sub1b, mean1, offsets, floor_mode, est_keep
            )
            i2 = _ind_subfit(
                colors, ch_w, sub2b, mean2, offsets, floor_mode, est_keep
            )
            ierr = i1[3] + i2[3]
            idx = jnp.where(sub2b > 0, i2[2], i1[2])
            words = _pack_etc1((i1[0], i2[0]), False, flip, i1[1], i2[1], idx)
            take = ierr < best_err
            best = tuple(jnp.where(take, w, b) for w, b in zip(words, best))
            best_err = jnp.where(take, ierr, best_err)

    if etc2:
        # Highest quality: effort-100-class refinement (planar exact
        # 27-combo neighborhoods, 2 coordinate-descent passes on the T/H
        # palette colors), mirroring the strengthened etc2_cpu.cpp bar.
        refine = 2 if quality >= 4 else 0
        err_px, fields = _planar_candidate(colors, refine=refine)
        perr = jnp.einsum("npc,c->n", err_px, ch_w)
        hi, lo = _pack_planar(fields, colors.shape[0])
        take = perr < best_err
        best = tuple(jnp.where(take, w, b) for w, b in zip((hi, lo), best))
        best_err = jnp.where(take, perr, best_err)

        terr, twords = _etc2_t_candidate(colors, ch_w, refine=refine)
        take = terr < best_err
        best = tuple(jnp.where(take, w, b) for w, b in zip(twords, best))
        best_err = jnp.where(take, terr, best_err)

        herr, hwords = _etc2_h_candidate(colors, ch_w, refine=refine)
        take = herr < best_err
        best = tuple(jnp.where(take, w, b) for w, b in zip(hwords, best))
        best_err = jnp.where(take, herr, best_err)

    return _swap_words(*best)


# ---------------------------------------------------------------------------
# EAC (8-bit alpha and 11-bit single channel)
# ---------------------------------------------------------------------------


def _eac_pack(base, mult, table, idx_raster):
    """base/mult/table [M], idx [M,16] 3-bit -> byte-swapped uint32 pair.

    Layout (64-bit BE): base 63..56, mult 55..52, table 51..48, then pixel
    p's index at bits 45-3p..47-3p (MSB-first, column-major pixels).
    """
    idx_p = idx_raster[:, _RASTER_OF_P_NP].astype(jnp.uint32)
    hi = (
        ((base.astype(jnp.uint32) & 0xFF) << jnp.uint32(24))
        | (mult.astype(jnp.uint32) << jnp.uint32(20))
        | (table.astype(jnp.uint32) << jnp.uint32(16))
    )
    lo = jnp.zeros_like(hi)
    for p in range(16):
        off = 45 - 3 * p  # absolute bit of this index's LSB
        if off >= 32:
            hi = hi | (idx_p[:, p] << jnp.uint32(off - 32))
        elif off >= 30:  # straddles the word boundary
            hi = hi | (idx_p[:, p] >> jnp.uint32(32 - off))
            lo = lo | (idx_p[:, p] << jnp.uint32(off))
        else:
            lo = lo | (idx_p[:, p] << jnp.uint32(off))
    return _swap_words(hi, lo)


_EAC_MULT_CANDS = {0: 1, 1: 2, 2: 3, 3: 5, 4: 7}


def _encode_eac_generic(vals, quality, decode_fn, base_range, mult_of_range):
    """Shared EAC search: vals [M,16] in storage domain.

    decode_fn(base [M], mult [M], mods [16,8-broadcast]) -> palette values
    [M,T,8]; searches tables x multiplier candidates around the range fit.
    """
    m = vals.shape[0]
    lo = vals.min(1)
    hi = vals.max(1)
    center = (lo + hi) * 0.5
    base = jnp.clip(jnp.round(center), base_range[0], base_range[1]).astype(jnp.int32)
    span = (hi - lo) * 0.5

    ncand = _EAC_MULT_CANDS[max(0, min(4, int(quality)))]
    max_pos = _EAC_MODS_NP[:, 4:].max(1)  # [16]
    best = None
    for t in range(16):
        mods = _EAC_MODS[t]  # [8]
        m0 = jnp.clip(
            jnp.round(span * mult_of_range / float(max_pos[t])), 1, 15
        ).astype(jnp.int32)
        for dm in range(-(ncand // 2), ncand - ncand // 2):
            mult = jnp.clip(m0 + dm, 1, 15)
            pal = decode_fn(base, mult, mods)  # [M,8]
            e = (vals[:, :, None] - pal[:, None, :]) ** 2
            idx = e.argmin(-1).astype(jnp.int32)
            err = e.min(-1).sum(1)
            cand = (
                base,
                mult,
                jnp.full((m,), t, jnp.int32),
                idx,
                err,
            )
            if best is None:
                best = cand
            else:
                take = cand[4] < best[4]
                best = tuple(
                    jnp.where(take[(...,) + (None,) * (b.ndim - 1)], c, b)
                    for c, b in zip(cand, best)
                )
    return best


def encode_eac_alpha(vals, quality=2):
    """Dispatch: Pallas kernel on TPU, jnp path otherwise."""
    if _use_pallas():
        from cuttlefish_tpu.kernels.etc_pallas import encode_eac_alpha_pallas

        return encode_eac_alpha_pallas(vals, int(quality), interpret=_interp())
    return _encode_eac_alpha_jnp(vals, quality)


@functools.partial(jax.jit, static_argnames=("quality",))
def _encode_eac_alpha_jnp(vals: jnp.ndarray, quality: int = 2) -> jnp.ndarray:
    """[N,16] floats 0..1 -> EAC 8-bit alpha words [N,2] (byte-swapped)."""
    v = jnp.clip(vals.astype(jnp.float32), 0, 1) * 255.0

    def decode(base, mult, mods):
        pal = base[:, None].astype(jnp.float32) + mods[None, :].astype(
            jnp.float32
        ) * mult[:, None].astype(jnp.float32)
        return jnp.clip(pal, 0, 255)

    base, mult, table, idx, _ = _encode_eac_generic(
        v, quality, decode, (0, 255), 1.0
    )
    return _eac_pack(base, mult, table, idx)


def encode_eac_r11(
    vals: jnp.ndarray, quality: int = 2, signed: bool = False
) -> jnp.ndarray:
    """Dispatch: Pallas kernel on TPU, jnp path otherwise."""
    if _use_pallas():
        from cuttlefish_tpu.kernels.etc_pallas import encode_eac_r11_pallas

        return encode_eac_r11_pallas(
            vals, int(quality), bool(signed), interpret=_interp()
        )
    return _encode_eac_r11_jnp(vals, quality, signed)


@functools.partial(jax.jit, static_argnames=("quality", "signed"))
def _encode_eac_r11_jnp(
    vals: jnp.ndarray, quality: int = 2, signed: bool = False
) -> jnp.ndarray:
    """[N,16] floats ([0,1] unsigned / [-1,1] signed) -> EAC R11 words.

    11-bit decode model: value = base*8+4 + mod*mult*8 (mult>0), or
    base*8+4 + mod (mult==0; we always emit mult>=1).  Signed: base is
    int8, value = base*8 + mod*mult*8 in [-1023,1023].
    """
    if signed:
        v = jnp.clip(vals.astype(jnp.float32), -1, 1) * 1023.0

        def decode(base, mult, mods):
            pal = base[:, None].astype(jnp.float32) * 8.0 + mods[
                None, :
            ].astype(jnp.float32) * mult[:, None].astype(jnp.float32) * 8.0
            return jnp.clip(pal, -1023, 1023)

        base, mult, table, idx, _ = _encode_eac_generic(
            v / 8.0, quality, lambda b, m, md: decode(b, m, md) / 8.0, (-127, 127), 1.0
        )
        # Re-run selection in the true domain for exactness of indices.
        pal = jnp.clip(
            base[:, None].astype(jnp.float32) * 8.0
            + _EAC_MODS[table].astype(jnp.float32)
            * mult[:, None].astype(jnp.float32)
            * 8.0,
            -1023,
            1023,
        )
        e = (v[:, :, None] - pal[:, None, :]) ** 2
        idx = e.argmin(-1).astype(jnp.int32)
        base_bits = base & 0xFF
        return _eac_pack(base_bits, mult, table, idx)

    v = jnp.clip(vals.astype(jnp.float32), 0, 1) * 2047.0

    def decode(base, mult, mods):
        pal = (
            base[:, None].astype(jnp.float32) * 8.0
            + 4.0
            + mods[None, :].astype(jnp.float32)
            * mult[:, None].astype(jnp.float32)
            * 8.0
        )
        return jnp.clip(pal, 0, 2047)

    base, mult, table, idx, _ = _encode_eac_generic(
        v / 8.0, quality, lambda b, m, md: decode(b, m, md) / 8.0, (0, 255), 1.0
    )
    pal = jnp.clip(
        base[:, None].astype(jnp.float32) * 8.0
        + 4.0
        + _EAC_MODS[table].astype(jnp.float32)
        * mult[:, None].astype(jnp.float32)
        * 8.0,
        0,
        2047,
    )
    e = (v[:, :, None] - pal[:, None, :]) ** 2
    idx = e.argmin(-1).astype(jnp.int32)
    return _eac_pack(base, mult, table, idx)


def _etc_a1_candidate(colors, alpha_mask, ch_w, flip: int, luma_shift: float):
    """Punch-through (opaque=0) candidate: diff bases, [0,+b,T,-b] mods.

    alpha_mask [M,16]: 1 = opaque.  Transparent pixels get index 2 and are
    excluded from the fit error.
    """
    sub2 = _SUB2[flip][None, :]
    sub1 = 1.0 - sub2
    w1 = sub1 * alpha_mask
    w2 = sub2 * alpha_mask
    n1 = w1.sum(1, keepdims=True) + 1e-6
    n2 = w2.sum(1, keepdims=True) + 1e-6
    mean1 = jnp.einsum("npc,np->nc", colors, w1) / n1
    mean2 = jnp.einsum("npc,np->nc", colors, w2) / n2
    fields, (dec1, dec2) = _quant_bases(
        mean1 + luma_shift, mean2 + luma_shift, diff=True
    )
    allowed = jnp.asarray(np.array([1, 1, 0, 1], bool))
    t1, idx1, err1 = _best_table_fit(colors, dec1, w1, ch_w, _ETC_A1_MODS, allowed)
    t2, idx2, err2 = _best_table_fit(colors, dec2, w2, ch_w, _ETC_A1_MODS, allowed)
    sub2b = jnp.broadcast_to(sub2, colors.shape[:2])
    idx = jnp.where(sub2b > 0, idx2, idx1)
    idx = jnp.where(alpha_mask < 0.5, 2, idx)
    # opaque flag (bit 33) = 0: pack as diff layout then clear the bit.
    hi, lo = _pack_etc1(fields, True, flip, t1, t2, idx)
    hi = hi & ~jnp.uint32(2)
    return err1 + err2, (hi, lo)


def _a1_table_modvals(table):
    """The A1 modifier values ([0, +b, -, -b]) of a per-block table."""
    out = []
    for mm in (0, 1, 3):  # index 2 is transparent
        v = jnp.zeros(table.shape, jnp.float32)
        for tt in range(8):
            v = jnp.where(table == tt, float(_ETC_A1_MODS_NP[tt][mm]), v)
        out.append(v)
    return out


def _a1_diff_sweep(colors, alpha_mask, ch_w, flip, offsets, floor_mode,
                   est_keep=0):
    """Punch-through differential sweep over the base-1 quant cube (the
    A1 analog of _diff_fit; [0,+b,T,-b] mods, transparent texels excluded
    from the fit and forced to index 2).  est_keep ranks the non-center
    offsets by the center-table-restricted error and deep-fits the
    per-block top k."""
    sub2 = _SUB2[flip][None, :]
    sub1 = 1.0 - sub2
    w1 = sub1 * alpha_mask
    w2 = sub2 * alpha_mask
    n1 = w1.sum(1, keepdims=True) + 1e-6
    n2 = w2.sum(1, keepdims=True) + 1e-6
    mean1 = jnp.einsum("npc,np->nc", colors, w1) / n1
    mean2 = jnp.einsum("npc,np->nc", colors, w2) / n2
    qf = jnp.floor if floor_mode else jnp.round
    base1_q = qf(mean1 * (31.0 / 255.0))
    b2n = jnp.clip(jnp.round(mean2 * (31.0 / 255.0)), 0, 31).astype(jnp.int32)
    allowed = jnp.asarray(np.array([1, 1, 0, 1], bool))
    sub2b = jnp.broadcast_to(sub2, colors.shape[:2])

    def b1_of(o):
        return jnp.clip(
            base1_q + jnp.asarray(o, base1_q.dtype), 0, 31
        ).astype(jnp.int32)

    def full_fit(b1):
        d = jnp.clip(b2n - b1, -4, 3)
        b2 = b1 + d
        dec1 = _expand5(b1).astype(jnp.float32)
        dec2 = _expand5(b2).astype(jnp.float32)
        t1, idx1, e1 = _best_table_fit(
            colors, dec1, w1, ch_w, _ETC_A1_MODS, allowed
        )
        t2, idx2, e2 = _best_table_fit(
            colors, dec2, w2, ch_w, _ETC_A1_MODS, allowed
        )
        idx = jnp.where(sub2b > 0, idx2, idx1)
        idx = jnp.where(alpha_mask < 0.5, 2, idx)
        hi, lo = _pack_etc1((b1, d), True, flip, t1, t2, idx)
        hi = hi & ~jnp.uint32(2)  # opaque flag (bit 33) = 0
        return (e1 + e2, (hi, lo), t1, t2)

    def merge(best, cand):
        take = cand[0] < best[0]
        return (
            jnp.minimum(cand[0], best[0]),
            tuple(jnp.where(take, w, b) for w, b in zip(cand[1], best[1])),
        )

    if not est_keep or len(offsets) <= est_keep + 1:
        best = None
        for o in offsets:
            c = full_fit(b1_of(o))
            c2 = (c[0], c[1])
            best = c2 if best is None else merge(best, c2)
        return best

    err_c, words_c, t1c, t2c = full_fit(b1_of((0, 0, 0)))
    mv1 = _a1_table_modvals(t1c)
    mv2 = _a1_table_modvals(t2c)

    def rest_err(b1):
        d = jnp.clip(b2n - b1, -4, 3)
        dec1 = _expand5(b1).astype(jnp.float32)
        dec2 = _expand5(b1 + d).astype(jnp.float32)
        e = jnp.zeros(colors.shape[0])
        for dec, mvs, wm in ((dec1, mv1, w1), (dec2, mv2, w2)):
            eb = None
            for mv in mvs:
                val = jnp.clip(dec[:, None, :] + mv[:, None, None], 0.0, 255.0)
                ee = jnp.einsum("npc,c->np", (colors - val) ** 2, ch_w)
                eb = ee if eb is None else jnp.minimum(eb, ee)
            e = e + (eb * wm).sum(1)
        return e

    others = [o for o in offsets if o != (0, 0, 0)]
    b1s = [b1_of(o) for o in others]
    ests = [rest_err(b1) for b1 in b1s]
    best = (err_c, words_c)
    chosen = [jnp.zeros_like(ests[0], jnp.bool_) for _ in ests]
    for _ in range(est_keep):
        bi = None
        be = None
        for i, e in enumerate(ests):
            ee = jnp.where(chosen[i], jnp.inf, e)
            if bi is None:
                bi = jnp.zeros_like(e, jnp.int32)
                be = ee
            else:
                take = ee < be
                bi = jnp.where(take, i, bi)
                be = jnp.minimum(ee, be)
        b1sel = None
        for i, b1 in enumerate(b1s):
            b1sel = b1 if b1sel is None else jnp.where(
                (bi == i)[:, None], b1, b1sel
            )
        for i in range(len(ests)):
            chosen[i] = chosen[i] | (bi == i)
        c = full_fit(b1sel)
        best = merge(best, (c[0], c[1]))
    return best


@functools.partial(jax.jit, static_argnames=("quality",))
def encode_etc2_a1(
    blocks: jnp.ndarray, quality: int = 2, ch_weights=None
) -> jnp.ndarray:
    """ETC2 punch-through alpha (R8G8B8A1): [N,16,4] -> [N,2] words.

    Opaque blocks use the diff/planar ETC2 path (opaque bit = 1, which is
    the diff bit position); blocks with any texel a < 0.5 use the
    punch-through modifier set with index 2 transparent.
    """
    colors = jnp.clip(blocks[..., :3].astype(jnp.float32), 0, 1) * 255.0
    alpha_mask = (blocks[..., 3] >= 0.5).astype(jnp.float32)
    ch_w = jnp.ones((3,), jnp.float32) if ch_weights is None else ch_weights
    quality = max(0, min(4, int(quality)))

    # Opaque path: differential-only (individual mode doesn't exist in A1)
    # + planar.  Round 4: the same per-channel quant-cube search as the
    # RGB path (the luma-shift ladder lost 0.2-0.4 dB on real content).
    floor_mode = _ETC_OFFSETS[quality][0] == "floor"
    offsets = _ETC_OFFSETS[quality][1]
    est_keep = 6 if quality in (2, 3) else 0
    best_err = None
    best_o = None
    for flip in (0, 1):
        sub2 = _SUB2[flip][None, :]
        sub1 = 1.0 - sub2
        sub1b = jnp.broadcast_to(sub1, colors.shape[:2])
        sub2b = jnp.broadcast_to(sub2, colors.shape[:2])
        mean1 = jnp.einsum("npc,np->nc", colors, sub1b) / sub1.sum()
        mean2 = jnp.einsum("npc,np->nc", colors, sub2b) / sub2.sum()
        b1, d, t1, t2, idx1, idx2, derr = _diff_fit(
            colors, ch_w, sub1b, sub2b, mean1, mean2, offsets, floor_mode,
            est_keep,
        )
        idx = jnp.where(sub2b > 0, idx2, idx1)
        words = _pack_etc1((b1, d), True, flip, t1, t2, idx)
        if best_err is None:
            best_err, best_o = derr, words
        else:
            take = derr < best_err
            best_o = tuple(
                jnp.where(take, w, b) for w, b in zip(words, best_o)
            )
            best_err = jnp.where(take, derr, best_err)
    refine = 2 if quality >= 4 else 0
    err_px, fields = _planar_candidate(colors, refine=refine)
    perr = jnp.einsum("npc,c->n", err_px, ch_w)
    hi_p, lo_p = _pack_planar(fields, colors.shape[0])
    take = perr < best_err
    best_o = tuple(jnp.where(take, w, b) for w, b in zip((hi_p, lo_p), best_o))
    best_err = jnp.where(take, perr, best_err)

    terr, twords = _etc2_t_candidate(colors, ch_w, refine=refine)
    take = terr < best_err
    best_o = tuple(jnp.where(take, w, b) for w, b in zip(twords, best_o))
    best_err = jnp.where(take, terr, best_err)

    herr, hwords = _etc2_h_candidate(colors, ch_w, refine=refine)
    take = herr < best_err
    best_o = tuple(jnp.where(take, w, b) for w, b in zip(hwords, best_o))

    # Punch-through path: differential + T + H, each with index 2
    # transparent (the reference's etc2comp searches the same three,
    # EtcConverter.cpp:56-115 via full-effort Encode).
    best_t = None
    terr = None
    for flip in (0, 1):
        err, words = _a1_diff_sweep(
            colors, alpha_mask, ch_w, flip, offsets, floor_mode, est_keep
        )
        if terr is None:
            terr, best_t = err, words
        else:
            take = err < terr
            best_t = tuple(
                jnp.where(take, w, b) for w, b in zip(words, best_t)
            )
            terr = jnp.where(take, err, terr)
    for cand_fn in (_etc2_t_candidate, _etc2_h_candidate):
        err, words = cand_fn(
            colors, ch_w, alpha_mask=alpha_mask, refine=refine
        )
        take = err < terr
        best_t = tuple(jnp.where(take, w, b) for w, b in zip(words, best_t))
        terr = jnp.where(take, err, terr)

    has_alpha = (alpha_mask < 0.5).any(axis=1)
    out = tuple(jnp.where(has_alpha, t, o) for t, o in zip(best_t, best_o))
    return _swap_words(*out)


def encode_etc2_rgba(blocks, quality=2, ch_weights=None):
    """[N,16,4] -> [N,4] words: EAC alpha block then ETC2 RGB block."""
    if _use_pallas():
        chw = _static_chw(ch_weights)
        if chw is not None:
            from cuttlefish_tpu.kernels.etc_pallas import encode_etc2_rgba_pallas

            return encode_etc2_rgba_pallas(
                blocks, int(quality), chw, interpret=_interp()
            )
    return _encode_etc2_rgba_jnp(blocks, quality, ch_weights)


@functools.partial(jax.jit, static_argnames=("quality",))
def _encode_etc2_rgba_jnp(blocks: jnp.ndarray, quality: int = 2, ch_weights=None) -> jnp.ndarray:
    alpha = _encode_eac_alpha_jnp(blocks[..., 3], quality=quality)
    rgb = _encode_etc_rgb_jnp(blocks, quality=quality, etc2=True, ch_weights=ch_weights)
    return jnp.concatenate([alpha, rgb], axis=-1)


@functools.partial(jax.jit, static_argnames=("quality", "signed"))
def encode_eac_rg11(blocks: jnp.ndarray, quality: int = 2, signed: bool = False) -> jnp.ndarray:
    """[N,16,>=2] -> [N,4] words: R11 then G11."""
    if _use_pallas():
        from cuttlefish_tpu.kernels.etc_pallas import encode_eac_rg11_pallas

        return encode_eac_rg11_pallas(
            blocks, int(quality), bool(signed), interpret=_interp()
        )
    r = encode_eac_r11(blocks[..., 0], quality=quality, signed=signed)
    g = encode_eac_r11(blocks[..., 1], quality=quality, signed=signed)
    return jnp.concatenate([r, g], axis=-1)
