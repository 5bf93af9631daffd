"""ETC1/ETC2/EAC block encoders as Pallas TPU kernels (every quality).

Blocks-on-lanes layout (texels on sublanes, [16,TN] tiles, channels
unrolled) like bc7_pallas.py / astc_pallas.py.  Mirrors kernels/etc.py's
candidate sweeps exactly — same base quantization, modifier-table fits,
planar LS fit, T/H cluster splits, and mode-signaling bit layouts (all
Mesa-validated through the jnp path) — so the emitted words are
bit-identical to the jnp encoders in the common case.  Replaces the
etc2comp role of the reference (`/root/reference/lib/src/EtcConverter.cpp`)
on the TPU hot path.

The ETC modifier tables, planar projection matrix, subblock masks, and
pixel-order permutations are all static Python constants unrolled into
the kernel (no gathers, no table inputs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cuttlefish_tpu.kernels.etc import (
    _EAC_MODS_NP,
    _EAC_MULT_CANDS,
    _ETC1_MODS_NP,
    _ETC2_DIST_NP,
    _ETC_SHIFTS,
    _RASTER_OF_P_NP,
)

TN = 512

_U32 = jnp.uint32
_BIG = 1e30


def _rt(x):
    return jnp.sum(x, axis=0, keepdims=True)


def _sel(take, a, b):
    if isinstance(a, (list, tuple)):
        return [jnp.where(take, x, y) for x, y in zip(a, b)]
    return jnp.where(take, a, b)


def _iota16(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 0)


def _expand4(v):
    return (v << 4) | v


def _expand5(v):
    return (v << 3) | (v >> 2)


def _bswap(w):
    w = w.astype(_U32)
    return (
        ((w & _U32(0xFF)) << _U32(24))
        | ((w & _U32(0xFF00)) << _U32(8))
        | ((w >> _U32(8)) & _U32(0xFF00))
        | (w >> _U32(24))
    )


def _index_words(idx):
    """idx [16,TN] (raster order) -> lo word [1,TN]: bit p = lsb of pixel
    p (column-major), bit 16+p = msb."""
    lo = jnp.zeros_like(idx[0:1, :]).astype(_U32)
    for p in range(16):
        ri = int(_RASTER_OF_P_NP[p])
        v = idx[ri : ri + 1, :].astype(_U32)
        lo = lo | ((v & _U32(1)) << _U32(p))
        lo = lo | (((v >> _U32(1)) & _U32(1)) << _U32(16 + p))
    return lo


def _sub_masks(shape, flip: int):
    """(sub1, sub2) [16,TN] membership (raster order)."""
    it = _iota16(shape)
    if flip == 0:
        s2 = ((it % 4) >= 2).astype(jnp.float32)
    else:
        s2 = ((it // 4) >= 2).astype(jnp.float32)
    return 1.0 - s2, s2


def _best_table_fit(px, dec, sub_mask, chw, mods_np, allowed=None):
    """Exhaustive modifier-table fit.  px list of [16,TN]; dec list of
    [1,TN] decoded base ints.  Returns (table [1,TN], idx [16,TN],
    err [1,TN])."""
    best_t = None
    best_idx = None
    best_err = None
    for t in range(8):
        e_t = None
        idx_t = None
        for m in range(4):
            if allowed is not None and not allowed[m]:
                continue
            mod = float(mods_np[t][m])
            e = sum(
                chw[c]
                * (
                    px[c]
                    - jnp.clip(dec[c].astype(jnp.float32) + mod, 0.0, 255.0)
                )
                ** 2
                for c in range(3)
            )
            if e_t is None:
                e_t = e
                idx_t = jnp.full_like(px[0], m, dtype=jnp.int32)
            else:
                take = e < e_t
                idx_t = jnp.where(take, m, idx_t)
                e_t = jnp.minimum(e, e_t)
        err = _rt(e_t * sub_mask)
        tv = jnp.full_like(err, t, dtype=jnp.int32)
        if best_err is None:
            best_t, best_idx, best_err = tv, idx_t, err
        else:
            take = err < best_err
            best_t = jnp.where(take, tv, best_t)
            best_idx = jnp.where(take, idx_t, best_idx)
            best_err = jnp.minimum(err, best_err)
    return best_t, best_idx, best_err


def _quant_bases(mean1, mean2, diff: bool):
    """mean*: channel lists [1,TN].  Returns ((f1,f2), (dec1,dec2))."""
    if diff:
        b1 = [
            jnp.clip(jnp.round(m * (31.0 / 255.0)), 0, 31).astype(jnp.int32)
            for m in mean1
        ]
        b2 = [
            jnp.clip(jnp.round(m * (31.0 / 255.0)), 0, 31).astype(jnp.int32)
            for m in mean2
        ]
        d = [jnp.clip(b2[c] - b1[c], -4, 3) for c in range(3)]
        b2 = [b1[c] + d[c] for c in range(3)]
        dec1 = [_expand5(b) for b in b1]
        dec2 = [_expand5(b) for b in b2]
        return (b1, d), (dec1, dec2)
    b1 = [
        jnp.clip(jnp.round(m * (15.0 / 255.0)), 0, 15).astype(jnp.int32)
        for m in mean1
    ]
    b2 = [
        jnp.clip(jnp.round(m * (15.0 / 255.0)), 0, 15).astype(jnp.int32)
        for m in mean2
    ]
    return (b1, b2), ([_expand4(b) for b in b1], [_expand4(b) for b in b2])


def _pack_etc1(fields, diff, flip, t1, t2, idx):
    f1, f2 = fields
    hi = jnp.zeros_like(t1).astype(_U32)
    if diff:
        for c in range(3):
            hi = hi | (f1[c].astype(_U32) << _U32(59 - 8 * c - 32))
            hi = hi | ((f2[c] & 0x7).astype(_U32) << _U32(56 - 8 * c - 32))
    else:
        for c in range(3):
            hi = hi | (f1[c].astype(_U32) << _U32(60 - 8 * c - 32))
            hi = hi | (f2[c].astype(_U32) << _U32(56 - 8 * c - 32))
    hi = hi | (t1.astype(_U32) << _U32(5))
    hi = hi | (t2.astype(_U32) << _U32(2))
    if diff:
        hi = hi | _U32(2)
    if flip:
        hi = hi | _U32(1)
    return hi, _index_words(idx)


def _etc1_candidate(px, chw, diff: bool, flip: int, shift: float):
    sub1, sub2 = _sub_masks(px[0].shape, flip)
    n1 = _rt(sub1)
    n2 = _rt(sub2)
    mean1 = [_rt(px[c] * sub1) / n1 + shift for c in range(3)]
    mean2 = [_rt(px[c] * sub2) / n2 + shift for c in range(3)]
    fields, (dec1, dec2) = _quant_bases(mean1, mean2, diff)
    t1, idx1, err1 = _best_table_fit(px, dec1, sub1, chw, _ETC1_MODS_NP)
    t2, idx2, err2 = _best_table_fit(px, dec2, sub2, chw, _ETC1_MODS_NP)
    idx = jnp.where(sub2 > 0, idx2, idx1)
    hi, lo = _pack_etc1(fields, diff, flip, t1, t2, idx)
    return err1 + err2, (hi, lo)


def _best_table_fit2(px, dec, sub_mask, chw):
    """_best_table_fit + the runner-up table (for the estimate proxy).
    Mirror of kernels/etc.py:_best_table_fit2."""
    best_t = None
    best_idx = None
    best_err = None
    errs = []
    for t in range(8):
        e_t = None
        idx_t = None
        for m in range(4):
            mod = float(_ETC1_MODS_NP[t][m])
            e = sum(
                chw[c]
                * (
                    px[c]
                    - jnp.clip(dec[c].astype(jnp.float32) + mod, 0.0, 255.0)
                )
                ** 2
                for c in range(3)
            )
            if e_t is None:
                e_t = e
                idx_t = jnp.full_like(px[0], m, dtype=jnp.int32)
            else:
                take = e < e_t
                idx_t = jnp.where(take, m, idx_t)
                e_t = jnp.minimum(e, e_t)
        err = _rt(e_t * sub_mask)
        errs.append(err)
        tv = jnp.full_like(err, t, dtype=jnp.int32)
        if best_err is None:
            best_t, best_idx, best_err = tv, idx_t, err
        else:
            take = err < best_err
            best_t = jnp.where(take, tv, best_t)
            best_idx = jnp.where(take, idx_t, best_idx)
            best_err = jnp.minimum(err, best_err)
    t2 = None
    e2 = None
    for t in range(8):
        ee = jnp.where(best_t == t, _BIG, errs[t])
        tv = jnp.full_like(ee, t, dtype=jnp.int32)
        if t2 is None:
            t2, e2 = tv, ee
        else:
            take = ee < e2
            t2 = jnp.where(take, tv, t2)
            e2 = jnp.minimum(ee, e2)
    return best_t, t2, best_idx, best_err


def _table_modvals(table):
    """The 4 modifier values of a per-block dynamic table: [1,TN] ->
    list of 4 [1,TN] floats (mirror of kernels/etc.py)."""
    out = []
    for mm in range(4):
        v = jnp.zeros(table.shape, jnp.float32)
        for tt in range(8):
            v = jnp.where(table == tt, float(_ETC1_MODS_NP[tt][mm]), v)
        out.append(v)
    return out


def _restricted_err(px, chw, subm, dec, mvals):
    """Block error with the table restricted to `mvals`, index free
    (mirror of kernels/etc.py:_restricted_err)."""
    e_best = None
    for mv in mvals:
        e = sum(
            chw[c]
            * (
                px[c]
                - jnp.clip(dec[c].astype(jnp.float32) + mv, 0.0, 255.0)
            )
            ** 2
            for c in range(3)
        )
        e_best = e if e_best is None else jnp.minimum(e_best, e)
    return _rt(e_best * subm)


def _ind_subfit(px, chw, subm, mean, offsets, floor_mode, est_keep=0):
    """Individual-mode per-subblock quant-cube search (mirror of
    kernels/etc.py:_ind_subfit incl. the estimate-then-refine pass,
    channel-list layout)."""
    qf = jnp.floor if floor_mode else jnp.round
    base_q = [qf(m * (15.0 / 255.0)) for m in mean]

    def base_of(o):
        return [
            jnp.clip(base_q[c] + float(o[c]), 0, 15).astype(jnp.int32)
            for c in range(3)
        ]

    def full_fit(b):
        dec = [_expand4(bc) for bc in b]
        t, idx, err = _best_table_fit(px, dec, subm, chw, _ETC1_MODS_NP)
        return (b, t, idx, err)

    def merge(best, cand):
        take = cand[3] < best[3]
        return (
            [jnp.where(take, cand[0][c], best[0][c]) for c in range(3)],
            jnp.where(take, cand[1], best[1]),
            jnp.where(take, cand[2], best[2]),
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
        px, [_expand4(b) for b in bc], subm, chw
    )
    center = (bc, t_c, idx_c, err_c)
    mvals = _table_modvals(t_c) + _table_modvals(t2_c)
    others = [o for o in offsets if o != (0, 0, 0)]
    bases = [base_of(o) for o in others]
    ests = [
        _restricted_err(px, chw, subm, [_expand4(b) for b in bb], mvals)
        for bb in bases
    ]
    best = center
    chosen = [jnp.zeros_like(ests[0], jnp.bool_) for _ in ests]
    for _ in range(est_keep):
        bi = None
        be = None
        for i, e in enumerate(ests):
            ee = jnp.where(chosen[i], _BIG, e)
            if bi is None:
                bi = jnp.zeros_like(e, jnp.int32)
                be = ee
            else:
                take = ee < be
                bi = jnp.where(take, i, bi)
                be = jnp.minimum(ee, be)
        bsel = None
        for i, b in enumerate(bases):
            if bsel is None:
                bsel = b
            else:
                bsel = [
                    jnp.where(bi == i, b[c], bsel[c]) for c in range(3)
                ]
        for i in range(len(ests)):
            chosen[i] = chosen[i] | (bi == i)
        best = merge(best, full_fit(bsel))
    return best


def _diff_fit(px, chw, sub1, sub2, mean1, mean2, offsets, floor_mode,
              est_keep=0):
    """Differential-mode joint quant-cube search (mirror of
    kernels/etc.py:_diff_fit incl. the estimate-then-refine pass)."""
    qf = jnp.floor if floor_mode else jnp.round
    base1_q = [qf(m * (31.0 / 255.0)) for m in mean1]
    b2n = [
        jnp.clip(jnp.round(m * (31.0 / 255.0)), 0, 31).astype(jnp.int32)
        for m in mean2
    ]

    def bases_of(o):
        b1 = [
            jnp.clip(base1_q[c] + float(o[c]), 0, 31).astype(jnp.int32)
            for c in range(3)
        ]
        d = [jnp.clip(b2n[c] - b1[c], -4, 3) for c in range(3)]
        return b1, d, [b1[c] + d[c] for c in range(3)]

    def full_fit(b1, d, b2):
        t1, idx1, e1 = _best_table_fit(
            px, [_expand5(b) for b in b1], sub1, chw, _ETC1_MODS_NP
        )
        t2, idx2, e2 = _best_table_fit(
            px, [_expand5(b) for b in b2], sub2, chw, _ETC1_MODS_NP
        )
        return (b1, d, t1, t2, idx1, idx2, e1 + e2)

    def merge(best, cand):
        take = cand[6] < best[6]
        return (
            [jnp.where(take, cand[0][c], best[0][c]) for c in range(3)],
            [jnp.where(take, cand[1][c], best[1][c]) for c in range(3)],
            jnp.where(take, cand[2], best[2]),
            jnp.where(take, cand[3], best[3]),
            jnp.where(take, cand[4], best[4]),
            jnp.where(take, cand[5], best[5]),
            jnp.minimum(cand[6], best[6]),
        )

    if not est_keep or len(offsets) <= est_keep + 1:
        best = None
        for o in offsets:
            cand = full_fit(*bases_of(o))
            best = cand if best is None else merge(best, cand)
        return best

    b1c, dc, b2c = bases_of((0, 0, 0))
    t1c, t1c2, idx1c, e1c = _best_table_fit2(
        px, [_expand5(b) for b in b1c], sub1, chw
    )
    t2c, t2c2, idx2c, e2c = _best_table_fit2(
        px, [_expand5(b) for b in b2c], sub2, chw
    )
    center = (b1c, dc, t1c, t2c, idx1c, idx2c, e1c + e2c)
    mv1 = _table_modvals(t1c) + _table_modvals(t1c2)
    mv2 = _table_modvals(t2c) + _table_modvals(t2c2)
    others = [o for o in offsets if o != (0, 0, 0)]
    b1s = [bases_of(o)[0] for o in others]
    ests = []
    for b1 in b1s:
        d = [jnp.clip(b2n[c] - b1[c], -4, 3) for c in range(3)]
        e1 = _restricted_err(
            px, chw, sub1, [_expand5(b) for b in b1], mv1
        )
        e2 = _restricted_err(
            px, chw, sub2,
            [_expand5(b1[c] + d[c]) for c in range(3)], mv2,
        )
        ests.append(e1 + e2)
    best = center
    chosen = [jnp.zeros_like(ests[0], jnp.bool_) for _ in ests]
    for _ in range(est_keep):
        bi = None
        be = None
        for i, e in enumerate(ests):
            ee = jnp.where(chosen[i], _BIG, e)
            if bi is None:
                bi = jnp.zeros_like(e, jnp.int32)
                be = ee
            else:
                take = ee < be
                bi = jnp.where(take, i, bi)
                be = jnp.minimum(ee, be)
        b1sel = None
        for i, b1 in enumerate(b1s):
            if b1sel is None:
                b1sel = b1
            else:
                b1sel = [
                    jnp.where(bi == i, b1[c], b1sel[c]) for c in range(3)
                ]
        for i in range(len(ests)):
            chosen[i] = chosen[i] | (bi == i)
        dsel = [jnp.clip(b2n[c] - b1sel[c], -4, 3) for c in range(3)]
        best = merge(
            best,
            full_fit(b1sel, dsel, [b1sel[c] + dsel[c] for c in range(3)]),
        )
    return best


# ---------------------------------------------------------------------------
# ETC2 planar
# ---------------------------------------------------------------------------

_PLANAR_PROJ = None


def _planar_proj():
    global _PLANAR_PROJ
    if _PLANAR_PROJ is None:
        x = np.array([(i % 4) / 4.0 for i in range(16)])
        y = np.array([(i // 4) / 4.0 for i in range(16)])
        basis = np.stack([1.0 - x - y, x, y], axis=0)  # [3,16]
        g = basis @ basis.T
        _PLANAR_PROJ = (np.linalg.inv(g) @ basis).astype(np.float64)
    return _PLANAR_PROJ


def _quant_planar(c, bits):
    maxv = (1 << bits) - 1
    v = jnp.clip(jnp.round(c * (maxv / 255.0)), 0, maxv).astype(jnp.int32)
    if bits == 6:
        dec = (v << 2) | (v >> 4)
    else:
        dec = (v << 1) | (v >> 6)
    return v, dec.astype(jnp.float32)


def _planar_candidate(px, chw, refine: int = 0):
    proj = _planar_proj()
    coef = [[None] * 3 for _ in range(3)]  # [O/H/V][channel]
    for k in range(3):
        for c in range(3):
            acc = None
            for i in range(16):
                term = float(proj[k][i]) * px[c][i : i + 1, :]
                acc = term if acc is None else acc + term
            coef[k][c] = acc
    bits = (6, 7, 6)
    q = [[None] * 3 for _ in range(3)]
    dec = [[None] * 3 for _ in range(3)]
    for k in range(3):
        for c in range(3):
            q[k][c], dec[k][c] = _quant_planar(coef[k][c], bits[c])
    it = _iota16(px[0].shape)
    xi = (it % 4).astype(jnp.float32)
    yi = (it // 4).astype(jnp.float32)

    def chan_err(c, do_, dh_, dv_):
        val = xi * (dh_ - do_) + yi * (dv_ - do_) + 4.0 * do_ + 2.0
        d = jnp.clip(jnp.floor(val * 0.25), 0.0, 255.0)
        return chw[c] * (px[c] - d) ** 2

    err = None
    for c in range(3):
        e_px = chan_err(c, dec[0][c], dec[1][c], dec[2][c])
        if refine:
            # exact 27-combo +-1 neighborhood per channel (effort-100;
            # mirrors kernels/etc.py:_planar_candidate)
            maxv = (1 << bits[c]) - 1
            best_e = _rt(e_px)
            for d0 in (-1, 0, 1):
                for d1 in (-1, 0, 1):
                    for d2 in (-1, 0, 1):
                        if d0 == 0 and d1 == 0 and d2 == 0:
                            continue
                        o = jnp.clip(q[0][c] + d0, 0, maxv)
                        h = jnp.clip(q[1][c] + d1, 0, maxv)
                        v = jnp.clip(q[2][c] + d2, 0, maxv)
                        if bits[c] == 6:
                            eo = ((o << 2) | (o >> 4)).astype(jnp.float32)
                            eh = ((h << 2) | (h >> 4)).astype(jnp.float32)
                            ev = ((v << 2) | (v >> 4)).astype(jnp.float32)
                        else:
                            eo = ((o << 1) | (o >> 6)).astype(jnp.float32)
                            eh = ((h << 1) | (h >> 6)).astype(jnp.float32)
                            ev = ((v << 1) | (v >> 6)).astype(jnp.float32)
                        en_px = chan_err(c, eo, eh, ev)
                        en = _rt(en_px)
                        take = en < best_e
                        q[0][c] = jnp.where(take, o, q[0][c])
                        q[1][c] = jnp.where(take, h, q[1][c])
                        q[2][c] = jnp.where(take, v, q[2][c])
                        e_px = jnp.where(take, en_px, e_px)
                        best_e = jnp.minimum(en, best_e)
        err = e_px if err is None else err + e_px
    fields = (
        q[0][0], q[0][1], q[0][2],
        q[1][0], q[1][1], q[1][2],
        q[2][0], q[2][1], q[2][2],
    )
    return _rt(err), fields


def _pack_planar(fields):
    (ro, go, bo, rh, gh, bh, rv, gv, bv) = [f.astype(_U32) for f in fields]
    hi = jnp.zeros_like(ro)
    lo = jnp.zeros_like(ro)
    hi = hi | (ro << _U32(57 - 32))
    hi = hi | ((go >> _U32(6)) << _U32(56 - 32))
    hi = hi | ((go & _U32(0x3F)) << _U32(49 - 32))
    hi = hi | ((bo >> _U32(5)) << _U32(48 - 32))
    hi = hi | (((bo >> _U32(3)) & _U32(0x3)) << _U32(43 - 32))
    hi = hi | ((bo & _U32(0x7)) << _U32(39 - 32))
    hi = hi | ((rh >> _U32(1)) << _U32(34 - 32))
    hi = hi | (rh & _U32(0x1))
    hi = hi | _U32(2)
    lo = lo | (gh << _U32(25))
    lo = lo | (bh << _U32(19))
    lo = lo | (rv << _U32(13))
    lo = lo | (gv << _U32(6))
    lo = lo | bv
    bo43 = (bo >> _U32(3)) & _U32(0x3)
    bo21 = (bo >> _U32(1)) & _U32(0x3)
    need_a = (bo43 + bo21) >= 4
    hi = hi | jnp.where(need_a, _U32(0x7) << _U32(45 - 32), _U32(0))
    hi = hi | jnp.where(need_a, _U32(0), _U32(1) << _U32(42 - 32))
    r1 = ((ro >> _U32(2)) & _U32(0xF)).astype(jnp.int32)
    dr = (((ro & _U32(0x3)) << _U32(1)) | (go >> _U32(6))).astype(jnp.int32)
    dr_s = jnp.where(dr >= 4, dr - 8, dr)
    hi = hi | jnp.where(
        (r1 + dr_s) < 0, _U32(1) << _U32(63 - 32), _U32(0)
    )
    g1 = ((go >> _U32(2)) & _U32(0xF)).astype(jnp.int32)
    dg = (((go & _U32(0x3)) << _U32(1)) | (bo >> _U32(5))).astype(jnp.int32)
    dg_s = jnp.where(dg >= 4, dg - 8, dg)
    hi = hi | jnp.where(
        (g1 + dg_s) < 0, _U32(1) << _U32(55 - 32), _U32(0)
    )
    return hi, lo


# ---------------------------------------------------------------------------
# ETC2 T / H
# ---------------------------------------------------------------------------


def _pca_split_means(px, chw):
    """Principal-axis split -> (mean_pos, mean_neg) channel lists [1,TN]."""
    mean = [_rt(px[c]) / 16.0 for c in range(3)]
    cent = [px[c] - mean[c] for c in range(3)]
    cov = [[_rt(cent[c] * cent[d]) for d in range(3)] for c in range(3)]
    norms = sum(cent[c] * cent[c] for c in range(3))
    mx = jnp.max(norms, axis=0, keepdims=True)
    iota = _iota16(norms.shape)
    fidx = jnp.min(jnp.where(norms == mx, iota, 16), axis=0, keepdims=True)
    first = (iota == fidx).astype(jnp.float32)
    start = [_rt(cent[c] * first) for c in range(3)]
    n0 = jnp.sqrt(sum(s * s for s in start))
    v = [
        jnp.where(n0 > 1e-10, s / (n0 + 1e-20), jnp.ones_like(s))
        for s in start
    ]
    for _ in range(3):
        nv = [sum(cov[c][d] * v[d] for d in range(3)) for c in range(3)]
        nn = jnp.sqrt(sum(x * x for x in nv))
        v = [jnp.where(nn > 1e-10, nv[c] / (nn + 1e-20), v[c]) for c in range(3)]
    t = sum(cent[c] * v[c] for c in range(3))
    split = (t > 0).astype(jnp.float32)
    cp = _rt(split) + 1e-6
    cn = _rt(1.0 - split) + 1e-6
    mp = [_rt(px[c] * split) / cp for c in range(3)]
    mn = [_rt(px[c] * (1.0 - split)) / cn for c in range(3)]
    return mp, mn


def _quant444(c):
    q = [
        jnp.clip(jnp.round(x * (15.0 / 255.0)), 0, 15).astype(jnp.int32)
        for x in c
    ]
    return q, [_expand4(v).astype(jnp.float32) for v in q]


def _pal_err_idx(px, pal, chw):
    """pal: list of 4 channel-lists -> (idx [16,TN], per-texel min err)."""
    e_best = None
    idx = None
    for k in range(4):
        e = sum(
            chw[c] * (px[c] - pal[k][c]) ** 2 for c in range(3)
        )
        if e_best is None:
            e_best = e
            idx = jnp.zeros_like(px[0], dtype=jnp.int32)
        else:
            take = e < e_best
            idx = jnp.where(take, k, idx)
            e_best = jnp.minimum(e, e_best)
    return idx, e_best


def _pack_t(q1, q2, didx, idx):
    r1, g1, b1 = q1
    r32 = r1 >> 2
    r10 = r1 & 0x3
    hi = jnp.zeros_like(r1).astype(_U32)
    hi = hi | (r32.astype(_U32) << _U32(59 - 32))
    hi = hi | (r10.astype(_U32) << _U32(56 - 32))
    hi = hi | (g1.astype(_U32) << _U32(52 - 32))
    hi = hi | (b1.astype(_U32) << _U32(48 - 32))
    hi = hi | (q2[0].astype(_U32) << _U32(44 - 32))
    hi = hi | (q2[1].astype(_U32) << _U32(40 - 32))
    hi = hi | (q2[2].astype(_U32) << _U32(36 - 32))
    hi = hi | ((didx >> 1).astype(_U32) << _U32(34 - 32))
    hi = hi | (didx & 1).astype(_U32)
    hi = hi | _U32(2)
    use_a = (r32 + r10) >= 4
    hi = hi | jnp.where(use_a, _U32(0x7) << _U32(61 - 32), _U32(0))
    hi = hi | jnp.where(use_a, _U32(0), _U32(1) << _U32(58 - 32))
    return hi, _index_words(idx)


def _pack_h(q1, q2, didx, idx):
    r1, g1, b1 = q1
    q = 2 * (g1 & 1) + (b1 >> 3)
    b21 = (b1 >> 1) & 0x3
    over = (q + b21) >= 4
    free3 = jnp.where(over, 7, 0)
    bit50 = jnp.where(over, 0, 1)
    hi = jnp.zeros_like(r1).astype(_U32)
    hi = hi | (r1.astype(_U32) << _U32(59 - 32))
    hi = hi | ((g1 >> 1).astype(_U32) << _U32(56 - 32))
    hi = hi | ((g1 & 1).astype(_U32) << _U32(52 - 32))
    hi = hi | ((b1 >> 3).astype(_U32) << _U32(51 - 32))
    hi = hi | (((b1 >> 1) & 0x3).astype(_U32) << _U32(48 - 32))
    hi = hi | ((b1 & 0x1).astype(_U32) << _U32(47 - 32))
    hi = hi | (q2[0].astype(_U32) << _U32(43 - 32))
    hi = hi | (q2[1].astype(_U32) << _U32(39 - 32))
    hi = hi | (q2[2].astype(_U32) << _U32(35 - 32))
    hi = hi | ((didx >> 2).astype(_U32) << _U32(34 - 32))
    hi = hi | (((didx >> 1) & 1).astype(_U32))
    hi = hi | _U32(2)
    hi = hi | (free3.astype(_U32) << _U32(53 - 32))
    hi = hi | (bit50.astype(_U32) << _U32(50 - 32))
    dr = g1 >> 1
    dr_s = jnp.where(dr >= 4, dr - 8, dr)
    r_under = (r1 + dr_s) < 0
    hi = hi | jnp.where(r_under, _U32(1) << _U32(63 - 32), _U32(0))
    return hi, _index_words(idx)


def _dist_of(didx):
    v = jnp.zeros(didx.shape, jnp.float32)
    for di in range(8):
        v = jnp.where(didx == di, float(_ETC2_DIST_NP[di]), v)
    return v


def _etc2_t_candidate(px, chw, refine: int = 0):
    mp, mn = _pca_split_means(px, chw)

    def t_eval(q1, q2, dist_f):
        d1 = [_expand4(v).astype(jnp.float32) for v in q1]
        d2 = [_expand4(v).astype(jnp.float32) for v in q2]
        pal = [
            d1,
            [jnp.clip(d + dist_f, 0.0, 255.0) for d in d2],
            d2,
            [jnp.clip(d - dist_f, 0.0, 255.0) for d in d2],
        ]
        idx, e = _pal_err_idx(px, pal, chw)
        return idx, _rt(e)

    best = None
    for c1f, c2f in ((mp, mn), (mn, mp)):
        q1, d1 = _quant444(c1f)
        q2, d2 = _quant444(c2f)
        for di in range(8):
            dist = float(_ETC2_DIST_NP[di])
            pal = [
                d1,
                [jnp.clip(d + dist, 0.0, 255.0) for d in d2],
                d2,
                [jnp.clip(d - dist, 0.0, 255.0) for d in d2],
            ]
            idx, e = _pal_err_idx(px, pal, chw)
            err = _rt(e)
            div = jnp.full_like(idx[0:1, :], di)
            cand = (q1, q2, div, idx, err)
            if best is None:
                best = cand
            else:
                take = err < best[4]
                best = (
                    _sel(take, cand[0], best[0]),
                    _sel(take, cand[1], best[1]),
                    jnp.where(take, cand[2], best[2]),
                    jnp.where(take, cand[3], best[3]),
                    jnp.minimum(err, best[4]),
                )
    q1, q2, didx, idx, err = best
    if refine:
        # +-1 coordinate descent over the six color coordinates with the
        # adjacent distance rungs tried per step, then a distance
        # re-sweep per pass (mirrors kernels/etc.py).
        for _ in range(refine):
            for which in (0, 1):
                for c in range(3):
                    for dd in (-1, 1):
                        if which == 0:
                            q1n = [
                                jnp.clip(q1[i] + dd, 0, 15) if i == c
                                else q1[i]
                                for i in range(3)
                            ]
                            q2n = q2
                        else:
                            q1n = q1
                            q2n = [
                                jnp.clip(q2[i] + dd, 0, 15) if i == c
                                else q2[i]
                                for i in range(3)
                            ]
                        for dstep in (-1, 0, 1):
                            didxn = jnp.clip(didx + dstep, 0, 7)
                            idxn, errn = t_eval(q1n, q2n, _dist_of(didxn))
                            take = errn < err
                            q1 = _sel(take, q1n, q1)
                            q2 = _sel(take, q2n, q2)
                            didx = jnp.where(take, didxn, didx)
                            idx = jnp.where(take, idxn, idx)
                            err = jnp.minimum(errn, err)
            for di in range(8):
                dist_f = jnp.full_like(err, float(_ETC2_DIST_NP[di]))
                idxn, errn = t_eval(q1, q2, dist_f)
                take = errn < err
                didx = jnp.where(take, di, didx)
                idx = jnp.where(take, idxn, idx)
                err = jnp.minimum(errn, err)
    return err, _pack_t(q1, q2, didx, idx)


def _etc2_h_candidate(px, chw, refine: int = 0):
    mp, mn = _pca_split_means(px, chw)

    def packed(q):
        return (q[0] << 8) | (q[1] << 4) | q[2]

    def h_eval(q1, q2, dist_f):
        d1 = [_expand4(v).astype(jnp.float32) for v in q1]
        d2 = [_expand4(v).astype(jnp.float32) for v in q2]
        pal = [
            [jnp.clip(d + dist_f, 0.0, 255.0) for d in d1],
            [jnp.clip(d - dist_f, 0.0, 255.0) for d in d1],
            [jnp.clip(d + dist_f, 0.0, 255.0) for d in d2],
            [jnp.clip(d - dist_f, 0.0, 255.0) for d in d2],
        ]
        idx, e = _pal_err_idx(px, pal, chw)
        return idx, _rt(e)

    def canon(q1n, q2n, want):
        p1 = packed(q1n)
        p2 = packed(q2n)
        swap = (p1 >= p2).astype(jnp.int32) != want
        q1c = _sel(swap, q2n, q1n)
        q2c = _sel(swap, q1n, q2n)
        p1c = jnp.where(swap, p2, p1)
        p2c = jnp.where(swap, p1, p2)
        ok = ((p1c >= p2c).astype(jnp.int32) == want).astype(jnp.float32)
        return q1c, q2c, ok

    best = None
    for c1f, c2f in ((mp, mn), (mn, mp)):
        q1, _ = _quant444(c1f)
        q2, _ = _quant444(c2f)
        d1 = [_expand4(v).astype(jnp.float32) for v in q1]
        d2 = [_expand4(v).astype(jnp.float32) for v in q2]
        packed1 = packed(q1)
        packed2 = packed(q2)
        ord_bit = (packed1 >= packed2).astype(jnp.int32)
        for di in range(8):
            dist = float(_ETC2_DIST_NP[di])
            valid = ((di & 1) == ord_bit).astype(jnp.float32)
            pal = [
                [jnp.clip(d + dist, 0.0, 255.0) for d in d1],
                [jnp.clip(d - dist, 0.0, 255.0) for d in d1],
                [jnp.clip(d + dist, 0.0, 255.0) for d in d2],
                [jnp.clip(d - dist, 0.0, 255.0) for d in d2],
            ]
            idx, e = _pal_err_idx(px, pal, chw)
            err = _rt(e) + (1.0 - valid) * _BIG
            div = jnp.full_like(idx[0:1, :], di)
            cand = (q1, q2, div, idx, err)
            if best is None:
                best = cand
            else:
                take = err < best[4]
                best = (
                    _sel(take, cand[0], best[0]),
                    _sel(take, cand[1], best[1]),
                    jnp.where(take, cand[2], best[2]),
                    jnp.where(take, cand[3], best[3]),
                    jnp.minimum(err, best[4]),
                )
    q1, q2, didx, idx, err = best
    if refine:
        for _ in range(refine):
            for which in (0, 1):
                for c in range(3):
                    for dd in (-1, 1):
                        if which == 0:
                            q1n = [
                                jnp.clip(q1[i] + dd, 0, 15) if i == c
                                else q1[i]
                                for i in range(3)
                            ]
                            q2n = q2
                        else:
                            q1n = q1
                            q2n = [
                                jnp.clip(q2[i] + dd, 0, 15) if i == c
                                else q2[i]
                                for i in range(3)
                            ]
                        for dstep in (-1, 0, 1):
                            didxn = jnp.clip(didx + dstep, 0, 7)
                            q1c, q2c, ok = canon(q1n, q2n, didxn & 1)
                            idxn, errn = h_eval(
                                q1c, q2c, _dist_of(didxn)
                            )
                            errn = errn + (1.0 - ok) * _BIG
                            take = errn < err
                            q1 = _sel(take, q1c, q1)
                            q2 = _sel(take, q2c, q2)
                            didx = jnp.where(take, didxn, didx)
                            idx = jnp.where(take, idxn, idx)
                            err = jnp.minimum(errn, err)
            q1f, q2f, didxf, idxf, errf = q1, q2, didx, idx, err
            for di in range(8):
                want_d = jnp.full_like(didx, di & 1)
                q1c, q2c, ok = canon(q1, q2, want_d)
                dist_f = jnp.full_like(err, float(_ETC2_DIST_NP[di]))
                idxn, errn = h_eval(q1c, q2c, dist_f)
                errn = errn + (1.0 - ok) * _BIG
                take = errn < errf
                q1f = _sel(take, q1c, q1f)
                q2f = _sel(take, q2c, q2f)
                didxf = jnp.where(take, di, didxf)
                idxf = jnp.where(take, idxn, idxf)
                errf = jnp.minimum(errn, errf)
            q1, q2, didx, idx, err = q1f, q2f, didxf, idxf, errf
    return err, _pack_h(q1, q2, didx, idx)


# ---------------------------------------------------------------------------
# EAC alpha
# ---------------------------------------------------------------------------


def _eac_alpha(a, quality: int):
    """a [16,TN] 0..255 -> (hi, lo) byte-swap-ready words."""
    lo_v = jnp.min(a, axis=0, keepdims=True)
    hi_v = jnp.max(a, axis=0, keepdims=True)
    base = jnp.clip(jnp.round((lo_v + hi_v) * 0.5), 0, 255).astype(jnp.int32)
    span = (hi_v - lo_v) * 0.5
    ncand = _EAC_MULT_CANDS[max(0, min(4, int(quality)))]
    max_pos = _EAC_MODS_NP[:, 4:].max(1)
    best = None
    for t in range(16):
        m0 = jnp.clip(
            jnp.round(span / float(max_pos[t])), 1, 15
        ).astype(jnp.int32)
        for dm in range(-(ncand // 2), ncand - ncand // 2):
            mult = jnp.clip(m0 + dm, 1, 15)
            e_best = None
            idx = None
            for k in range(8):
                mod = float(_EAC_MODS_NP[t][k])
                pal = jnp.clip(
                    base.astype(jnp.float32)
                    + mod * mult.astype(jnp.float32),
                    0.0,
                    255.0,
                )
                e = (a - pal) ** 2
                if e_best is None:
                    e_best = e
                    idx = jnp.zeros_like(a, dtype=jnp.int32)
                else:
                    take = e < e_best
                    idx = jnp.where(take, k, idx)
                    e_best = jnp.minimum(e, e_best)
            err = _rt(e_best)
            tv = jnp.full_like(err, t, dtype=jnp.int32)
            cand = (base, mult, tv, idx, err)
            if best is None:
                best = cand
            else:
                take = err < best[4]
                best = (
                    jnp.where(take, cand[0], best[0]),
                    jnp.where(take, cand[1], best[1]),
                    jnp.where(take, cand[2], best[2]),
                    jnp.where(take, cand[3], best[3]),
                    jnp.minimum(err, best[4]),
                )
    base, mult, table, idx, _ = best
    # Pack (mirror _eac_pack): 64-bit BE word, base@63..56, mult@55..52,
    # table@51..48, pixel p's 3-bit index at bits 45-3p..47-3p.
    hi = (
        (base.astype(_U32) << _U32(24))
        | (mult.astype(_U32) << _U32(20))
        | (table.astype(_U32) << _U32(16))
    )
    lo = jnp.zeros_like(hi)
    for p in range(16):
        ri = int(_RASTER_OF_P_NP[p])
        v = idx[ri : ri + 1, :].astype(_U32)
        bitpos = 45 - 3 * p
        if bitpos >= 32:
            hi = hi | (v << _U32(bitpos - 32))
        elif bitpos >= 0:
            lo = lo | (v << _U32(bitpos))
            if bitpos > 29:
                hi = hi | (v >> _U32(32 - bitpos))
        else:
            lo = lo | (v >> _U32(-bitpos))
    return hi, lo


def _eac_r11(v, quality: int, signed: bool):
    """v [16,TN] in the true 11-bit domain (0..2047 unsigned /
    -1023..1023 signed) -> (hi, lo) byte-swap-ready words.

    Mirrors kernels/etc.py:encode_eac_r11: candidates are searched in the
    /8 domain (identical float ops, so identical selections); the final
    index argmin is scale-invariant, so the /8-domain running min IS the
    true-domain selection."""
    v8 = v / 8.0
    lo_v = jnp.min(v8, axis=0, keepdims=True)
    hi_v = jnp.max(v8, axis=0, keepdims=True)
    brange = (-127, 127) if signed else (0, 255)
    clip_lo, clip_hi = (-1023.0, 1023.0) if signed else (0.0, 2047.0)
    base = jnp.clip(
        jnp.round((lo_v + hi_v) * 0.5), brange[0], brange[1]
    ).astype(jnp.int32)
    span = (hi_v - lo_v) * 0.5
    ncand = _EAC_MULT_CANDS[max(0, min(4, int(quality)))]
    max_pos = _EAC_MODS_NP[:, 4:].max(1)
    offset = 0.0 if signed else 4.0
    best = None
    for t in range(16):
        m0 = jnp.clip(
            jnp.round(span / float(max_pos[t])), 1, 15
        ).astype(jnp.int32)
        for dm in range(-(ncand // 2), ncand - ncand // 2):
            mult = jnp.clip(m0 + dm, 1, 15)
            e_best = None
            idx = None
            for k in range(8):
                mod = float(_EAC_MODS_NP[t][k])
                pal8 = (
                    jnp.clip(
                        base.astype(jnp.float32) * 8.0
                        + offset
                        + mod * mult.astype(jnp.float32) * 8.0,
                        clip_lo,
                        clip_hi,
                    )
                    / 8.0
                )
                e = (v8 - pal8) ** 2
                if e_best is None:
                    e_best = e
                    idx = jnp.zeros_like(v8, dtype=jnp.int32)
                else:
                    take = e < e_best
                    idx = jnp.where(take, k, idx)
                    e_best = jnp.minimum(e, e_best)
            err = _rt(e_best)
            tv = jnp.full_like(err, t, dtype=jnp.int32)
            cand = (base, mult, tv, idx, err)
            if best is None:
                best = cand
            else:
                take = err < best[4]
                best = (
                    jnp.where(take, cand[0], best[0]),
                    jnp.where(take, cand[1], best[1]),
                    jnp.where(take, cand[2], best[2]),
                    jnp.where(take, cand[3], best[3]),
                    jnp.minimum(err, best[4]),
                )
    base, mult, table, idx, _ = best
    base = base & 0xFF  # two's-complement int8 field when signed
    hi = (
        (base.astype(_U32) << _U32(24))
        | (mult.astype(_U32) << _U32(20))
        | (table.astype(_U32) << _U32(16))
    )
    lo = jnp.zeros_like(hi)
    for p in range(16):
        ri = int(_RASTER_OF_P_NP[p])
        val = idx[ri : ri + 1, :].astype(_U32)
        bitpos = 45 - 3 * p
        if bitpos >= 32:
            hi = hi | (val << _U32(bitpos - 32))
        elif bitpos >= 30:
            hi = hi | (val >> _U32(32 - bitpos))
            lo = lo | (val << _U32(bitpos))
        else:
            lo = lo | (val << _U32(bitpos))
    return hi, lo


@functools.partial(
    jax.jit, static_argnames=("quality", "signed", "interpret")
)
def encode_eac_r11_pallas(vals, quality=2, signed=False, interpret=False):
    """[N,16] float ([0,1] unsigned / [-1,1] signed) -> R11 words [N,2]."""
    quality = max(0, min(4, int(quality)))
    n = vals.shape[0]
    tn = TN if n >= TN else -(-n // 128) * 128
    npad = -(-n // tn) * tn
    scale = 1023.0 if signed else 2047.0
    lo_in = -1.0 if signed else 0.0
    v = jnp.clip(vals.astype(jnp.float32), lo_in, 1.0) * scale
    v = jnp.pad(v, ((0, npad - n), (0, 0)))
    x = jnp.transpose(v)[None]  # [1,16,Np]

    def kernel(x_ref, out_ref):
        hi, lo = _eac_r11(x_ref[0], quality, signed)
        out_ref[0:1, :] = _bswap(hi)
        out_ref[1:2, :] = _bswap(lo)

    words = pl.pallas_call(
        kernel,
        grid=(npad // tn,),
        in_specs=[
            pl.BlockSpec(
                (1, 16, tn), lambda i: (0, 0, i), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (2, tn), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((2, npad), jnp.uint32),
        interpret=interpret,
    )(x)
    return jnp.transpose(words)[:n]


@functools.partial(
    jax.jit, static_argnames=("quality", "signed", "interpret")
)
def encode_eac_rg11_pallas(blocks, quality=2, signed=False, interpret=False):
    """[N,16,>=2] -> [N,4] words: R11 then G11, one kernel."""
    quality = max(0, min(4, int(quality)))
    n = blocks.shape[0]
    tn = TN if n >= TN else -(-n // 128) * 128
    npad = -(-n // tn) * tn
    scale = 1023.0 if signed else 2047.0
    lo_in = -1.0 if signed else 0.0
    v = jnp.clip(blocks[..., :2].astype(jnp.float32), lo_in, 1.0) * scale
    v = jnp.pad(v, ((0, npad - n), (0, 0), (0, 0)))
    x = jnp.transpose(v, (2, 1, 0))  # [2,16,Np]

    def kernel(x_ref, out_ref):
        rhi, rlo = _eac_r11(x_ref[0], quality, signed)
        ghi, glo = _eac_r11(x_ref[1], quality, signed)
        out_ref[0:1, :] = _bswap(rhi)
        out_ref[1:2, :] = _bswap(rlo)
        out_ref[2:3, :] = _bswap(ghi)
        out_ref[3:4, :] = _bswap(glo)

    words = pl.pallas_call(
        kernel,
        grid=(npad // tn,),
        in_specs=[
            pl.BlockSpec(
                (2, 16, tn), lambda i: (0, 0, i), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (4, tn), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((4, npad), jnp.uint32),
        interpret=interpret,
    )(x)
    return jnp.transpose(words)[:n]


# ---------------------------------------------------------------------------
# Kernels + wrappers
# ---------------------------------------------------------------------------


def _rgb_words(px, quality, etc2, chw):
    """Full ETC1/ETC2 RGB candidate sweep -> (hi, lo) un-swapped words."""
    from cuttlefish_tpu.kernels.etc import _ETC_OFFSETS

    best_err = None
    best = None
    floor_mode = _ETC_OFFSETS[quality][0] == "floor"
    offsets = _ETC_OFFSETS[quality][1]
    est_keep = 4 if quality in (2, 3) else (8 if quality >= 4 else 0)
    for flip in (0, 1):
        sub1, sub2 = _sub_masks(px[0].shape, flip)
        n1 = _rt(sub1)
        n2 = _rt(sub2)
        mean1 = [_rt(px[c] * sub1) / n1 for c in range(3)]
        mean2 = [_rt(px[c] * sub2) / n2 for c in range(3)]

        b1, d, t1, t2, idx1, idx2, derr = _diff_fit(
            px, chw, sub1, sub2, mean1, mean2, offsets, floor_mode,
            est_keep,
        )
        idx = jnp.where(sub2 > 0, idx2, idx1)
        words = _pack_etc1((b1, d), True, flip, t1, t2, idx)
        if best_err is None:
            best_err, best = derr, words
        else:
            take = derr < best_err
            best = tuple(jnp.where(take, w, b) for w, b in zip(words, best))
            best_err = jnp.minimum(derr, best_err)

        if quality >= 1:
            i1 = _ind_subfit(
                px, chw, sub1, mean1, offsets, floor_mode, est_keep
            )
            i2 = _ind_subfit(
                px, chw, sub2, mean2, offsets, floor_mode, est_keep
            )
            ierr = i1[3] + i2[3]
            idx = jnp.where(sub2 > 0, i2[2], i1[2])
            words = _pack_etc1(
                (i1[0], i2[0]), False, flip, i1[1], i2[1], idx
            )
            take = ierr < best_err
            best = tuple(jnp.where(take, w, b) for w, b in zip(words, best))
            best_err = jnp.minimum(ierr, best_err)
    if etc2:
        refine = 2 if quality >= 4 else 0
        perr, fields = _planar_candidate(px, chw, refine=refine)
        hi, lo = _pack_planar(fields)
        take = perr < best_err
        best = tuple(jnp.where(take, w, b) for w, b in zip((hi, lo), best))
        best_err = jnp.minimum(perr, best_err)
        for cand_fn in (_etc2_t_candidate, _etc2_h_candidate):
            err, words = cand_fn(px, chw, refine=refine)
            take = err < best_err
            best = tuple(jnp.where(take, w, b) for w, b in zip(words, best))
            best_err = jnp.minimum(err, best_err)
    return best


def _kernel_rgb(x_ref, out_ref, *, quality, etc2, chw):
    px = [x_ref[c] for c in range(3)]
    hi, lo = _rgb_words(px, quality, etc2, chw)
    out_ref[0:1, :] = _bswap(hi)
    out_ref[1:2, :] = _bswap(lo)


def _kernel_rgba(x_ref, out_ref, *, quality, chw):
    px = [x_ref[c] for c in range(4)]
    ahi, alo = _eac_alpha(px[3], quality)
    hi, lo = _rgb_words(px[:3], quality, True, chw)
    out_ref[0:1, :] = _bswap(ahi)
    out_ref[1:2, :] = _bswap(alo)
    out_ref[2:3, :] = _bswap(hi)
    out_ref[3:4, :] = _bswap(lo)


def _run(kernel, blocks, nwords, nch, interpret, tn=None):
    n = blocks.shape[0]
    tn = tn or TN
    # The quality>=2 offset-cube sweep (27 candidates) keeps more live
    # temporaries; halve the tile so the scoped-VMEM stack fits.
    tn = tn if n >= tn else -(-n // 128) * 128
    npad = -(-n // tn) * tn
    x = jnp.clip(blocks[..., :nch].astype(jnp.float32), 0.0, 1.0) * 255.0
    x = jnp.pad(x, ((0, npad - n), (0, 0), (0, 0)))
    x = jnp.transpose(x, (2, 1, 0))  # [nch,16,Np]
    words = pl.pallas_call(
        kernel,
        grid=(npad // tn,),
        in_specs=[
            pl.BlockSpec(
                (nch, 16, tn), lambda i: (0, 0, i), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (nwords, tn), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nwords, npad), jnp.uint32),
        interpret=interpret,
    )(x)
    return jnp.transpose(words)[:n]


def _chw_static(ch_weights):
    if ch_weights is None:
        return (1.0, 1.0, 1.0)
    try:
        return tuple(float(x) for x in np.asarray(ch_weights))
    except Exception:
        return None


@functools.partial(
    jax.jit, static_argnames=("quality", "etc2", "chw", "interpret")
)
def encode_etc_rgb_pallas(
    blocks, quality=2, etc2=False, chw=(1.0, 1.0, 1.0), interpret=False
):
    """[N,16,>=3] float RGB(A) 0..1 -> ETC1/ETC2 RGB words [N,2]."""
    quality = max(0, min(4, int(quality)))
    return _run(
        functools.partial(_kernel_rgb, quality=quality, etc2=etc2, chw=chw),
        blocks,
        2,
        3,
        interpret,
        tn=256 if quality >= 2 else None,
    )


@functools.partial(jax.jit, static_argnames=("quality", "chw", "interpret"))
def encode_etc2_rgba_pallas(
    blocks, quality=2, chw=(1.0, 1.0, 1.0), interpret=False
):
    """[N,16,4] float 0..1 -> EAC alpha + ETC2 RGB words [N,4]."""
    quality = max(0, min(4, int(quality)))
    return _run(
        functools.partial(_kernel_rgba, quality=quality, chw=chw),
        blocks,
        4,
        4,
        interpret,
        tn=256 if quality >= 2 else None,
    )


@functools.partial(jax.jit, static_argnames=("quality", "interpret"))
def encode_eac_alpha_pallas(vals, quality=2, interpret=False):
    """[N,16] float 0..1 -> EAC alpha words [N,2]."""
    quality = max(0, min(4, int(quality)))

    def kernel(x_ref, out_ref):
        a = x_ref[0]
        hi, lo = _eac_alpha(a, quality)
        out_ref[0:1, :] = _bswap(hi)
        out_ref[1:2, :] = _bswap(lo)

    return _run(kernel, vals[..., None], 2, 1, interpret)
