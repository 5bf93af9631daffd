"""ASTC LDR block encoder as a Pallas TPU kernel (all 14 2D block sizes,
all 5 quality levels: q3/q4 add dual-plane fits, a second 2-partition
layout, and top-k partition seeds, mirroring kernels/astc.py's _PLAN).

Same blocks-on-lanes layout as bc7_pallas.py: texels on sublanes
([T,TN] tiles, T = bw*bh), channels unrolled, the whole layout sweep
VMEM-resident.  The algorithm mirrors kernels/astc.py's `encode_astc`:
void extent + the 1-partition CEM8/CEM12 layout menu in kernel A, and
the 1024-seed partition screening + 2-partition CEM8 fit in kernel B
(smaller lane tile — the [1024,TN] screening moments must stay in VMEM).
Decimated weight grids run the spec C.2.18 bilinear infill and its
pseudo-inverse as in-kernel MXU matmuls ([T,G]x[G,TN]; the 16ths-valued
operands are integer-exact in f32).  Replaces the astcenc role of the
reference (`/root/reference/lib/src/AstcConverter.cpp`) on the TPU hot
path.

Table lookups (trit/quint quantization ladders, trit/quint pack blocks)
never gather: per-value lookups ride the MXU as one-hot matmuls against
the Mesa-validated tables from astc_ise.py, and per-grid-point weight
quantization unrolls over the <= 16 ladder levels as vector selects.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cuttlefish_tpu.kernels.astc import (
    plan_for,
    Layout,
    _color_qlut,
    _weight_qlut,
    block_mode_field,
    layout_menu,
)
from cuttlefish_tpu.kernels.astc_ise import (
    ise_sequence_layout,
    range_info,
    trit_pack_table,
    quint_pack_table,
    weight_unquant,
)
from cuttlefish_tpu.kernels.astc_partition import (
    partition_table,
    unique_partition_seeds,
)

TN_A = 512
TN_B = 128

_U32 = jnp.uint32


def _rt(x):
    return jnp.sum(x, axis=0, keepdims=True)


def _sel(take, a, b):
    if isinstance(a, (list, tuple)):
        return [jnp.where(take, x, y) for x, y in zip(a, b)]
    return jnp.where(take, a, b)


def _mm(m, x):
    return jax.lax.dot_general(
        m, x, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _lut_rows(idx, table):
    """MXU gather: idx [1,TN] int 0..D-1, table [R,D] f32 array (a kernel
    input ref value) -> list of R [1,TN] int32 rows (table[r][idx])."""
    d = table.shape[1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (d, idx.shape[1]), 0)
    oh = (iota == idx).astype(jnp.float32)  # [D,TN]
    out = _mm(table, oh)  # [R,TN]
    return [
        out[r : r + 1, :].astype(jnp.int32) for r in range(table.shape[0])
    ]


def _wquant_levels(w64, levels: int):
    """Per-texel nearest-level weight quantization by unrolled level sweep.

    w64 [16,TN] int 0..64 -> (q [16,TN] ISE value, unq [16,TN] 0..64).
    Ties keep the lowest ISE index (matches _weight_qlut's argmin)."""
    unq_tab = weight_unquant(levels)
    best_q = jnp.zeros_like(w64)
    best_u = jnp.full_like(w64, int(unq_tab[0]))
    best_d = jnp.abs(w64 - int(unq_tab[0]))
    for q in range(1, levels):
        d = jnp.abs(w64 - int(unq_tab[q]))
        take = d < best_d
        best_q = jnp.where(take, q, best_q)
        best_u = jnp.where(take, int(unq_tab[q]), best_u)
        best_d = jnp.where(take, d, best_d)
    return best_q, best_u


# ---------------------------------------------------------------------------
# ISE packing (static stream positions, [1,TN] registers)
# ---------------------------------------------------------------------------


def _trit_block_idx(digits):
    """5 trit digits (list of [1,TN] int32, padded with zeros) -> flat
    C-order index into the [3,3,3,3,3] pack table."""
    acc = jnp.zeros_like(digits[0])
    for k, dk in enumerate(digits):
        acc = acc + dk * (3 ** (len(digits) - 1 - k))
    return acc


def _pack_ise_pallas(words, values, levels, for_weights, start, reverse,
                     pack_tbls):
    """values: list of n [1,TN] int32 quantized values.  Mirrors
    kernels/astc.py:_pack_ise_jax, with the trit/quint pack-block gather
    as a one-hot matmul against the matching table of `pack_tbls`
    (trit [1,243], quint [1,125] — kernel inputs).

    The bit scatter is vectorized: a per-bit loop of [1,TN] ops (3+ narrow
    vector ops per stream bit, hundreds per layout) becomes, per output
    word, ONE static one-hot matmul gathering each bit's source row plus
    row-constant shift/mask/shift ops on a [K,TN] tile and a disjoint-bit
    sum (== OR) — the same mapping, bit-identical."""
    kind, b = range_info(levels, for_weights)
    n = len(values)
    packed = []
    if kind != "b":
        per = 5 if kind == "t" else 3
        ngroups = (n + per - 1) // per
        for g in range(ngroups):
            digits = []
            for k in range(per):
                i = g * per + k
                digits.append(
                    values[i] >> b if i < n else jnp.zeros_like(values[0])
                )
            if kind == "t":
                idx = _trit_block_idx(digits)
            else:
                acc = jnp.zeros_like(digits[0])
                for k, dk in enumerate(digits):
                    acc = acc + dk * (5 ** (per - 1 - k))
                idx = acc
            (pk,) = _lut_rows(
                idx, pack_tbls[0] if kind == "t" else pack_tbls[1]
            )
            packed.append(pk)

    layout = ise_sequence_layout(n, kind, b)
    # (stream bit, source row, source bit) per emitted bit.  Extracting
    # bit j < b from the raw value equals extracting it from the masked
    # low bits, so no mask pass is needed.  The stream is built at
    # ascending positions; the reversed weight stream is bit-reversed as
    # a whole 128-bit block afterwards (tmp bit p -> block bit 127-p).
    entries = []
    srcs = values + packed
    for pos, (src, i, j) in enumerate(layout):
        if src == "m":
            if i < 0:
                continue
            row = i
        else:
            row = n + i
        entries.append((pos if reverse else start + pos, row, j))

    # Coalesce maximal runs: consecutive stream bits from consecutive bits
    # of the same source (ISE stores each value's bits contiguously) pack
    # as ONE shifted field instead of per-bit ops; runs never straddle a
    # word boundary.
    per_word: list[list] = [[], [], [], []]
    run = None  # (bb0, row, j0, length)
    for bb, row, j in entries + [(-99, -1, -1)]:
        if (
            run is not None
            and row == run[1]
            and j == run[2] + run[3]
            and bb == run[0] + run[3]
            and bb % 32 != 0
        ):
            run = (run[0], run[1], run[2], run[3] + 1)
            continue
        if run is not None:
            bb0, r0, j0, ln = run
            field = (srcs[r0].astype(_U32) >> _U32(j0)) & _U32(
                (1 << ln) - 1
            )
            per_word[bb0 // 32].append(field << _U32(bb0 % 32))
        run = (bb, row, j, 1) if row >= 0 else None

    def _bitrev32(x):
        x = ((x & _U32(0x55555555)) << _U32(1)) | (
            (x >> _U32(1)) & _U32(0x55555555)
        )
        x = ((x & _U32(0x33333333)) << _U32(2)) | (
            (x >> _U32(2)) & _U32(0x33333333)
        )
        x = ((x & _U32(0x0F0F0F0F)) << _U32(4)) | (
            (x >> _U32(4)) & _U32(0x0F0F0F0F)
        )
        x = ((x & _U32(0x00FF00FF)) << _U32(8)) | (
            (x >> _U32(8)) & _U32(0x00FF00FF)
        )
        return (x << _U32(16)) | (x >> _U32(16))

    for w in range(4):
        parts = per_word[w]
        if not parts:
            continue
        # Disjoint bit fields: an unordered sum reduction equals OR (done
        # in int32 — Mosaic has no unsigned reductions; two's-complement
        # wraparound preserves the bits).
        if len(parts) > 1:
            stacked = jax.lax.bitcast_convert_type(
                jnp.concatenate(parts, axis=0), jnp.int32
            )
            acc = jax.lax.bitcast_convert_type(
                jnp.sum(stacked, axis=0, keepdims=True), _U32
            )
        else:
            acc = parts[0]
        if reverse:
            words[3 - w] = words[3 - w] | _bitrev32(acc)
        else:
            words[w] = words[w] | acc


# ---------------------------------------------------------------------------
# Shared fit machinery
# ---------------------------------------------------------------------------


def _pca_seed(px, mask, chn):
    """Masked principal-axis extremes; px list of [16,TN]."""
    cnt = _rt(mask) + 1e-6
    mean = [_rt(px[c] * mask) / cnt for c in range(chn)]
    cent = [(px[c] - mean[c]) * mask for c in range(chn)]
    cov = [[_rt(cent[c] * cent[d]) for d in range(chn)] for c in range(chn)]
    v = [jnp.ones_like(mean[0]) for _ in range(chn)]
    for _ in range(3):
        nv = [sum(cov[c][d] * v[d] for d in range(chn)) for c in range(chn)]
        nn = jnp.sqrt(sum(x * x for x in nv))
        v = [jnp.where(nn > 1e-10, nv[c] / (nn + 1e-20), v[c]) for c in range(chn)]
    t = sum(cent[c] * v[c] for c in range(chn))
    tmax = jnp.max(jnp.where(mask > 0, t, -1e30), axis=0, keepdims=True)
    tmin = jnp.min(jnp.where(mask > 0, t, 1e30), axis=0, keepdims=True)
    e1 = [mean[c] + v[c] * tmax for c in range(chn)]
    e0 = [mean[c] + v[c] * tmin for c in range(chn)]
    return e0, e1


def _orient(e0, e1):
    """Endpoint order: sum(rgb) of e0 must not exceed e1's (avoids the
    CEM8 blue-contraction decode branch, like the jnp path)."""
    s0 = sum(e0[:3])
    s1 = sum(e1[:3])
    swap = s0 > s1
    return _sel(swap, e1, e0), _sel(swap, e0, e1)


def _quant_colors(e, clevels, clut):
    """e: channel list of [1,TN] floats 0..255 -> (q, dec) int lists.
    clut: [2,256] (rows: ISE index, decoded byte) kernel input, unused
    for the identity 256-level range."""
    qs, ds = [], []
    if clevels == 256:
        for ec in e:
            v = jnp.clip(jnp.round(ec), 0, 255).astype(jnp.int32)
            qs.append(v)
            ds.append(v)
        return qs, ds
    for ec in e:
        v = jnp.clip(jnp.round(ec), 0, 255).astype(jnp.int32)
        q, d = _lut_rows(v, clut)
        qs.append(q)
        ds.append(d)
    return qs, ds


def _ls(px, w, mask, chn):
    """LS endpoints for fixed weights w [16,TN] in [0,1]."""
    wv = w * mask
    uv = (1.0 - w) * mask
    a11 = _rt(wv * w)
    a12 = _rt(wv * (1.0 - w))
    a22 = _rt(uv * (1.0 - w))
    b1 = [_rt(wv * px[c]) for c in range(chn)]
    b0 = [_rt(uv * px[c]) for c in range(chn)]
    det = a11 * a22 - a12 * a12
    ok = jnp.abs(det) > 1e-6
    safe = jnp.where(ok, det, 1.0)
    cnt = _rt(mask) + 1e-6
    mean = [_rt(px[c] * mask) / cnt for c in range(chn)]
    e1 = [
        jnp.where(ok, (a22 * b1[c] - a12 * b0[c]) / safe, mean[c])
        for c in range(chn)
    ]
    e0 = [
        jnp.where(ok, (a11 * b0[c] - a12 * b1[c]) / safe, mean[c])
        for c in range(chn)
    ]
    clip = lambda e: [jnp.clip(x, 0.0, 255.0) for x in e]
    return clip(e0), clip(e1)


def _eval_exact(px, d0t, d1t, w64, nch):
    """Exact decoder model: per-channel d0t/d1t [*,TN] int (alpha=255 row
    appended by the caller for CEM8), weights w64 [T,TN] int 0..64.
    Returns per-block error [1,TN] over 4 channels."""
    err = jnp.zeros_like(px[0][0:1, :])
    for c in range(4):
        d0 = d0t[c] if c < nch else jnp.full_like(w64, 255)
        d1 = d1t[c] if c < nch else jnp.full_like(w64, 255)
        e0 = d0 * 257
        e1 = d1 * 257
        c16 = (e0 * (64 - w64) + e1 * w64 + 32) >> 6
        dec = (c16 >> 8).astype(jnp.float32)
        err = err + _rt((dec - px[c]) ** 2)
    return err


def _texel_werr(pxl, d0l, d1l, w64: int):
    """Per-texel exact-model error for one ladder rung (static w64)."""
    e = jnp.zeros_like(pxl[0])
    for c in range(len(pxl)):
        c16 = (d0l[c] * (257 * (64 - w64)) + d1l[c] * (257 * w64) + 32) >> 6
        dec = (c16 >> 8).astype(jnp.float32)
        e = e + (dec - pxl[c]) ** 2
    return e


def _wquant_exact(pxl, d0l, d1l, levels: int):
    """Per-texel weight choice by EXACT decode error (identity weight
    grids only).  This is the astc_cpu.cpp reference encoder's weight
    assignment — two-stage w64 rounding (round to 0..64, then nearest
    rung) loses ~0.1-0.4 dB to it on fine-weight layouts.

    Coarse ladders (<= 8 rungs) run the full sweep; finer ladders seed
    with the nearest rung to the continuous projection and take one
    exact-error step to the adjacent rungs (the rounding is off by more
    than one rung only in degenerate cases).  pxl/d0l/d1l are aligned
    channel lists ([T,TN] float / [*,TN] int); channels whose decode is
    weight-independent (CEM8's implicit alpha) are omitted.
    Returns (gq, unq) [T,TN] int32."""
    unq_tab = weight_unquant(levels)
    if levels <= 8:
        best_q = None
        best_u = None
        best_e = None
        for q in range(levels):
            w64 = int(unq_tab[q])
            e = _texel_werr(pxl, d0l, d1l, w64)
            if best_q is None:
                best_q = jnp.full_like(pxl[0], q).astype(jnp.int32)
                best_u = jnp.full_like(best_q, w64)
                best_e = e
            else:
                take = e < best_e
                best_q = jnp.where(take, q, best_q)
                best_u = jnp.where(take, w64, best_u)
                best_e = jnp.minimum(e, best_e)
        return best_q, best_u

    # Fine ladder: nearest-rung seed from the continuous projection ...
    df = [(d1l[c] - d0l[c]).astype(jnp.float32) for c in range(len(pxl))]
    denom = sum(f * f for f in df) + 1e-6
    proj = sum(
        (pxl[c] - d0l[c].astype(jnp.float32)) * df[c]
        for c in range(len(pxl))
    )
    t = jnp.clip(proj / denom, 0.0, 1.0)
    w64i = jnp.clip(jnp.round(t * 64.0), 0, 64).astype(jnp.int32)
    gq, unq = _wquant_levels(w64i, levels)
    # ... then one exact-error step to the adjacent unquant-ladder rungs.
    order = np.argsort(np.asarray(unq_tab), kind="stable")
    rank_of = np.empty(levels, np.int64)
    rank_of[order] = np.arange(levels)
    up_tab = order[np.minimum(rank_of + 1, levels - 1)]
    dn_tab = order[np.maximum(rank_of - 1, 0)]
    def dyn_err(cu):
        e = jnp.zeros_like(pxl[0])
        for c in range(len(pxl)):
            c16 = (d0l[c] * 257 * (64 - cu) + d1l[c] * 257 * cu + 32) >> 6
            dec = (c16 >> 8).astype(jnp.float32)
            e = e + (dec - pxl[c]) ** 2
        return e

    best_q, best_u = gq, unq
    best_e = dyn_err(unq)
    for tab in (up_tab, dn_tab):
        cq = jnp.zeros_like(gq)
        cu = jnp.zeros_like(gq)
        for v in range(levels):
            cq = jnp.where(gq == v, int(tab[v]), cq)
            cu = jnp.where(gq == v, int(unq_tab[tab[v]]), cu)
        e = dyn_err(cu)
        take = e < best_e
        best_q = jnp.where(take, cq, best_q)
        best_u = jnp.where(take, cu, best_u)
        best_e = jnp.minimum(e, best_e)
    return best_q, best_u


def _grid_quant(t, lay, grid):
    """Per-texel ideal weights t [T,TN] in [0,1] -> (gq [G,TN] quantized
    grid values, w64t [T,TN] decoded texel weights).  grid is None for an
    identity (full) weight grid, else (a_ref_val [T,G] f32 of C.2.18
    16ths, pinv_ref_val [G,T] f32, foot_t [G,T] footprint mask)."""
    if grid is None:
        w64i = jnp.clip(jnp.round(t * 64.0), 0, 64).astype(jnp.int32)
        gq, unq = _wquant_levels(w64i, lay.wlevels)
        return gq, unq
    a_mat, pinv = grid[0], grid[1]
    g = _mm(pinv, t)  # [G,TN]
    w64g = jnp.clip(
        jnp.round(jnp.clip(g, 0.0, 1.0) * 64.0), 0, 64
    ).astype(jnp.int32)
    gq, unqg = _wquant_levels(w64g, lay.wlevels)
    # C.2.18 infill: integer-valued f32 matmul is exact (< 2^24).
    s = _mm(a_mat, unqg.astype(jnp.float32))
    w64t = jnp.floor((s + 8.0) / 16.0).astype(jnp.int32)
    return gq, w64t



def _infill_w64(gq, lay, grid):
    """Decoded per-texel weights for quantized grid values (C.2.18)."""
    a_mat = grid[0]
    unq_tab = weight_unquant(lay.wlevels)
    unqg = jnp.zeros_like(gq)
    for v in range(lay.wlevels):
        unqg = jnp.where(gq == v, int(unq_tab[v]), unqg)
    sgrid = _mm(a_mat, unqg.astype(jnp.float32))
    return jnp.floor((sgrid + 8.0) / 16.0).astype(jnp.int32)


def _gs_refine(px, d0x, d1x, nche, gq, lay, grid, passes=1):
    """Gauss-Seidel refinement for DECIMATED weight grids.

    The C.2.18 bilinear footprint couples a texel to at most the 2x2
    neighboring grid points, so the four (gx%2, gy%2) checkerboard
    classes have pairwise-disjoint footprints within a class — stepping
    one class simultaneously IS the sequential sweep the sized CPU bar
    runs (its 12x12 edge over simultaneous stepping; VERDICT r4 item 4).
    Each step scores the exact decode-model error over the point's
    footprint, so acceptance is exact given the other points."""
    from cuttlefish_tpu.kernels.astc import _weight_neighbors

    a_mat, foot_t = grid[0], grid[2]
    levels = lay.wlevels
    unq_tab = weight_unquant(levels)
    up_tab, dn_tab = _weight_neighbors(levels)
    g_count = lay.gw * lay.gh
    gi = jax.lax.broadcasted_iota(jnp.int32, (g_count, 1), 0)
    cls = ((gi // lay.gw) % 2) * 2 + (gi % lay.gw) % 2  # [G,1]

    def chain(g, tab):
        out = jnp.zeros_like(g)
        for v in range(levels):
            out = jnp.where(g == v, int(tab[v]), out)
        return out

    def texel_err(g):
        unqg = chain(g, unq_tab).astype(jnp.float32)
        sgrid = _mm(a_mat, unqg)
        w64 = jnp.floor((sgrid + 8.0) / 16.0).astype(jnp.int32)
        err = None
        for c in range(4):
            d0 = d0x[c] if c < nche else jnp.full_like(w64, 255)
            d1 = d1x[c] if c < nche else jnp.full_like(w64, 255)
            c16 = (d0 * 257 * (64 - w64) + d1 * 257 * w64 + 32) >> 6
            dec = (c16 >> 8).astype(jnp.float32)
            e = (dec - px[c]) ** 2
            err = e if err is None else err + e
        return err  # [T,TN]

    def scores(g):
        return _mm(foot_t, texel_err(g))  # [G,TN]

    cur = scores(gq)
    for _ in range(max(1, passes)):
        for cc in range(4):
            cmask = cls == cc
            for tab in (up_tab, dn_tab):
                cand = jnp.where(cmask, chain(gq, tab), gq)
                sc = scores(cand)
                take = cmask & (sc < cur)
                gq = jnp.where(take, cand, gq)
                cur = scores(gq)
    return gq


def _fit_1part(px, lay: Layout, iters: int, clut, grid=None):
    """1-partition fit.  Returns (q0, q1, gq, err): q* channel lists
    [1,TN], gq [G,TN] quantized grid weight values.

    Fit-space channels by CEM (mirrors kernels/astc.py:_fit_layout):
    8 = RGB, 12 = RGBA, 0 = luminance, 4 = luminance+alpha — CEM 0/4
    decode replicates L to RGB (spec C.2.14) and has no endpoint-order
    rule, so the orient/fix_order swaps are skipped."""
    luma = lay.cem in (0, 4)
    if luma:
        gray = (px[0] + px[1] + px[2]) / 3.0
        pxf = [gray, px[3]] if lay.cem == 4 else [gray]
    else:
        pxf = px[: (4 if lay.cem == 12 else 3)]
    nch = len(pxf)

    def expand4(d):
        """Fit-space decoded endpoint list -> (4-ch list, eval nch)."""
        if lay.cem == 0:
            return [d[0], d[0], d[0]], 3  # _eval_exact appends alpha=255
        if lay.cem == 4:
            return [d[0], d[0], d[0], d[1]], 4
        return d, nch

    ones = jnp.ones_like(px[0])
    e0, e1 = _pca_seed(pxf, ones, nch)
    if not luma:
        e0, e1 = _orient(e0, e1)

    best = None
    for it in range(max(1, iters)):
        q0, d0 = _quant_colors(e0, lay.clevels, clut)
        q1, d1 = _quant_colors(e1, lay.clevels, clut)
        if not luma:
            # fix_order on decoded sums.
            swap = sum(d0[:3]) > sum(d1[:3])
            q0, q1 = _sel(swap, q1, q0), _sel(swap, q0, q1)
            d0, d1 = _sel(swap, d1, d0), _sel(swap, d0, d1)
        d0x, nche = expand4(d0)
        d1x, _ = expand4(d1)
        if grid is None:
            gq, unq = _wquant_exact(
                px[:nche], d0x[:nche], d1x[:nche], lay.wlevels
            )
        else:
            # ideal per-texel weight, projected onto the decimated grid.
            df = [(d1[c] - d0[c]).astype(jnp.float32) for c in range(nch)]
            denom = sum(f * f for f in df) + 1e-6
            proj = sum(
                (pxf[c] - d0[c].astype(jnp.float32)) * df[c]
                for c in range(nch)
            )
            t = jnp.clip(proj / denom, 0.0, 1.0)
            gq, unq = _grid_quant(t, lay, grid)
            if lay.bw * lay.bh > 64:
                # Gauss-Seidel pays off where decimation is forced
                # (10x10/12x12, >64 texels); the smaller sizes' decimated
                # ALTERNATIVE layouts pass the sized bar without it and
                # the sweep costs ~3x their kernel time.
                gq = _gs_refine(px, d0x, d1x, nche, gq, lay, grid)
                unq = _infill_w64(gq, lay, grid)
        err = _eval_exact(px, d0x, d1x, unq, nche)
        cand = (q0, q1, gq, unq, err)
        if best is None:
            best = cand
        else:
            take = err < best[4]
            best = (
                _sel(take, cand[0], best[0]),
                _sel(take, cand[1], best[1]),
                jnp.where(take, cand[2], best[2]),
                jnp.where(take, cand[3], best[3]),
                jnp.where(take, err, best[4]),
            )
        if it + 1 < max(1, iters):
            u = best[3]  # decoded texel weights of the best candidate
            e0, e1 = _ls(pxf, u.astype(jnp.float32) / 64.0, ones, nch)
            if not luma:
                e0, e1 = _orient(e0, e1)
    return best[0], best[1], best[2], best[4]


def _pack_1part(lay: Layout, q0, q1, gq, shape, pack_tbls, ccs: int = 0):
    """Mirror of kernels/astc.py:_pack_block for nparts=1 (gq is [2G,TN]
    plane-interleaved when lay.dual, with `ccs` the component selector)."""
    words = [jnp.zeros(shape, _U32) for _ in range(4)]
    mode = block_mode_field(lay.gw, lay.gh, lay.wlevels, lay.dual)
    hdr = mode | ((lay.nparts - 1) << 11) | (lay.cem << 13)
    words[0] = words[0] | _U32(hdr)
    nch = len(q0)
    cols = []
    for c in range(nch):
        cols.append(q0[c])
        cols.append(q1[c])
    _pack_ise_pallas(words, cols, lay.clevels, False, lay.header, False,
                     pack_tbls)
    nw = lay.gw * lay.gh * (2 if lay.dual else 1)
    gq_vals = [gq[i : i + 1, :] for i in range(nw)]
    _pack_ise_pallas(words, gq_vals, lay.wlevels, True, 0, True, pack_tbls)
    if lay.dual:
        pos = 128 - lay.wbits - 2
        for k in range(2):
            if (ccs >> k) & 1:
                w, bo = divmod(pos + k, 32)
                words[w] = words[w] | (_U32(1) << _U32(bo))
    return words


def _fit_dual(px, lay: Layout, ccs: int, iters: int, clut, grid=None):
    """Single-partition dual-plane fit (spec C.2.10): plane 0 weights
    drive channels != ccs, plane 1 drives ccs.  Mirrors
    kernels/astc.py:_fit_dual_layout in [T,TN] layout.  Returns
    (q0, q1, gq [2G,TN] plane-interleaved, err)."""
    nch = 4 if lay.cem == 12 else 3
    rest = [c for c in range(nch) if c != ccs]
    ones = jnp.ones_like(px[0])

    # seeds: PCA over the rest channels, min/max for the ccs channel
    e0r, e1r = _pca_seed([px[c] for c in rest], ones, len(rest))
    lo_a = jnp.min(px[ccs], axis=0, keepdims=True)
    hi_a = jnp.max(px[ccs], axis=0, keepdims=True)

    def assemble(r, a):
        out = []
        ri = 0
        for c in range(nch):
            if c == ccs:
                out.append(a)
            else:
                out.append(r[ri])
                ri += 1
        return out

    e0 = assemble(e0r, lo_a)
    e1 = assemble(e1r, hi_a)
    e0, e1 = _orient(e0, e1)

    best = None
    for it in range(max(1, iters)):
        q0, d0 = _quant_colors(e0, lay.clevels, clut)
        q1, d1 = _quant_colors(e1, lay.clevels, clut)
        swap = sum(d0[:3]) > sum(d1[:3])
        q0, q1 = _sel(swap, q1, q0), _sel(swap, q0, q1)
        d0, d1 = _sel(swap, d1, d0), _sel(swap, d0, d1)
        # ideal weights per plane
        dfr = [(d1[c] - d0[c]).astype(jnp.float32) for c in rest]
        denom = sum(f * f for f in dfr) + 1e-6
        proj = sum(
            (px[c] - d0[c].astype(jnp.float32)) * f
            for c, f in zip(rest, dfr)
        )
        t0 = jnp.clip(proj / denom, 0.0, 1.0)
        da = (d1[ccs] - d0[ccs]).astype(jnp.float32)
        dasafe = jnp.where(jnp.abs(da) > 1e-6, da, 1.0)
        t1 = jnp.clip(
            (px[ccs] - d0[ccs].astype(jnp.float32)) / dasafe, 0.0, 1.0
        )
        if grid is None:
            gq0, unq0 = _wquant_exact(
                [px[c] for c in rest],
                [d0[c] for c in rest],
                [d1[c] for c in rest],
                lay.wlevels,
            )
            gq1, unq1 = _wquant_exact(
                [px[ccs]], [d0[ccs]], [d1[ccs]], lay.wlevels
            )
        else:
            gq0, unq0 = _grid_quant(t0, lay, grid)
            gq1, unq1 = _grid_quant(t1, lay, grid)
        # eval: per-channel plane select
        err = jnp.zeros_like(px[0][0:1, :])
        for c in range(4):
            dd0 = d0[c] if c < nch else jnp.full_like(unq0, 255)
            dd1 = d1[c] if c < nch else jnp.full_like(unq0, 255)
            w64 = unq1 if c == ccs else unq0
            c16 = (dd0 * 257 * (64 - w64) + dd1 * 257 * w64 + 32) >> 6
            dec = (c16 >> 8).astype(jnp.float32)
            err = err + _rt((dec - px[c]) ** 2)
        g = lay.gw * lay.gh
        gq = jnp.concatenate(
            [
                x
                for i in range(g)
                for x in (gq0[i : i + 1, :], gq1[i : i + 1, :])
            ],
            axis=0,
        )  # [2G,TN] plane-interleaved (grid-point-major)
        cand = (q0, q1, gq, unq0, unq1, err)
        if best is None:
            best = cand
        else:
            take = err < best[5]
            best = (
                _sel(take, cand[0], best[0]),
                _sel(take, cand[1], best[1]),
                jnp.where(take, cand[2], best[2]),
                jnp.where(take, cand[3], best[3]),
                jnp.where(take, cand[4], best[4]),
                jnp.where(take, err, best[5]),
            )
        if it + 1 < max(1, iters):
            w0 = best[3].astype(jnp.float32) / 64.0
            w1 = best[4].astype(jnp.float32) / 64.0
            e0r2, e1r2 = _ls([px[c] for c in rest], w0, ones, len(rest))
            e0a2, e1a2 = _ls([px[ccs]], w1, ones, 1)
            e0 = assemble(e0r2, e0a2[0])
            e1 = assemble(e1r2, e1a2[0])
            e0, e1 = _orient(e0, e1)
    return best[0], best[1], best[2], best[5]


def _void_extent(px, t_count):
    shape = px[0][0:1, :].shape
    mean = [_rt(px[c]) / float(t_count) for c in range(4)]
    v16 = [
        jnp.clip(jnp.round(m * 257.0), 0, 65535).astype(jnp.int32)
        for m in mean
    ]
    err = jnp.zeros(shape)
    for c in range(4):
        dec8 = (v16[c] >> 8).astype(jnp.float32)
        err = err + _rt((dec8 - px[c]) ** 2)
    err = err - 1e-3  # tie-break toward the VE (see astc.py:_void_extent)
    w0 = jnp.full(shape, (0x1FC | (0b11 << 10)) | 0xFFFFF000, _U32)
    w1 = jnp.full(shape, 0xFFFFFFFF, _U32)
    w2 = (v16[0] | (v16[1] << 16)).astype(_U32)
    w3 = (v16[2] | (v16[3] << 16)).astype(_U32)
    return [w0, w1, w2, w3], err


# ---------------------------------------------------------------------------
# Kernel A: void extent + 1-partition layouts
# ---------------------------------------------------------------------------


def _tasks_a(bw, bh, quality, gray=True, alpha=True):
    """Kernel-A work lists ``(base, gray_tasks)``: base = 1-partition CEM
    8/12 layouts (ccs None) plus one dual-plane fit per plan dp_ccs
    candidate; gray_tasks = the luminance CEM 0/4 layouts, run only for
    near-gray blocks (per-block mask, per-tile `pl.when` skip).  Mirrors
    the jnp sweep order in kernels/astc.py:_encode_astc_jnp.
    ``gray=False`` drops the gray tasks entirely (the caller detected no
    near-gray blocks in the batch)."""
    plan = plan_for(quality, bw, bh)
    menu = layout_menu(bw, bh)
    base = [
        (lay, None)
        for lay in menu[(8, 1)][: plan["cem8_layouts"]]
        + menu[(12, 1)][: plan["cem12_layouts"] if alpha else 0]
    ]
    if plan["dp_ccs"] and menu[(12, "dp")] and alpha:
        lay = menu[(12, "dp")][0]
        for ccs in plan["dp_ccs"]:
            base.append((lay, ccs))
    gray_tasks = (
        [
            (lay, None)
            for lay in menu[(0, 1)][: plan["cem0_layouts"]]
            + menu[(4, 1)][: plan["cem4_layouts"]]
        ]
        if gray
        else []
    )
    return base, gray_tasks


def _gray_mask(px):
    """[1,TN] bool: every texel of the block is near-gray (RGB spread
    below kernels/astc.py:GRAY_SPREAD; px values are 0..255)."""
    from cuttlefish_tpu.kernels.astc import GRAY_SPREAD

    hi = jnp.maximum(jnp.maximum(px[0], px[1]), px[2])
    lo = jnp.minimum(jnp.minimum(px[0], px[1]), px[2])
    return jnp.max(hi - lo, axis=0, keepdims=True) < GRAY_SPREAD * 255.0


@functools.lru_cache(maxsize=256)
def _prepared_grid(bw, bh, gw, gh):
    """(a [T,G] f32 of C.2.18 16ths, pinv [G,T] f32), or None if the grid
    is the full texel grid (infill is the identity)."""
    if gw == bw and gh == bh:
        return None
    from cuttlefish_tpu.kernels.astc import infill_weights

    a = infill_weights(bw, bh, gw, gh).astype(np.float64)
    pinv = np.linalg.pinv(a / 16.0).astype(np.float32)
    # transposed footprint mask [G,T] for the Gauss-Seidel score matmul
    # (transposing the VMEM value in-kernel trips a Mosaic MXU pass)
    foot_t = (a > 0).astype(np.float32).T
    return a.astype(np.float32), pinv, np.ascontiguousarray(foot_t)


def _kernel_a(x_ref, *refs, quality, clut_levels, bw, bh, grid_keys,
              gray=True, alpha=True):
    """grid_keys: tuple of (gw, gh) grid shapes that carry decimated
    grids; for each, two refs (a, pinv) follow the cluts in `rest`.
    When ``gray`` a per-tile flag array (SMEM, one int per grid step)
    precedes the table refs: tiles whose flag is 0 contain no near-gray
    block and skip the CEM 0/4 fits on the scalar core (`pl.when`);
    flagged tiles run them but only near-gray blocks may take the result
    (per-block mask), keeping output independent of tiling."""
    if gray:
        flags_ref, rest = refs[0], refs[1:]
    else:
        flags_ref, rest = None, refs
    trit_ref, quint_ref, rest = rest[0], rest[1], rest[2:]
    clut_refs = rest[: len(clut_levels)]
    grid_refs = rest[len(clut_levels) : len(clut_levels) + 3 * len(grid_keys)]
    out_ref, err_ref = rest[-2], rest[-1]
    cluts = {lv: r[:] for lv, r in zip(clut_levels, clut_refs)}
    grids = {
        gk: (
            grid_refs[3 * k][:],
            grid_refs[3 * k + 1][:],
            grid_refs[3 * k + 2][:],
        )
        for k, gk in enumerate(grid_keys)
    }
    pack_tbls = (trit_ref[:], quint_ref[:])
    t_count = bw * bh
    px = [x_ref[c] for c in range(4)]
    plan = plan_for(quality, bw, bh)
    iters = plan["iters"]
    iters12 = plan.get("iters12", iters)

    def run(tasks, words, err, mask=None):
        for lay, ccs in tasks:
            clut = cluts.get(lay.clevels)
            grid = grids.get((lay.gw, lay.gh))
            it_n = iters12 if lay.cem == 12 else iters
            if ccs is None:
                q0, q1, gq, lerr = _fit_1part(px, lay, it_n, clut, grid)
                lwords = _pack_1part(lay, q0, q1, gq, lerr.shape, pack_tbls)
            else:
                q0, q1, gq, lerr = _fit_dual(px, lay, ccs, it_n, clut, grid)
                lwords = _pack_1part(
                    lay, q0, q1, gq, lerr.shape, pack_tbls, ccs
                )
            if mask is not None:
                lerr = jnp.where(mask, lerr, jnp.float32(np.inf))
            take = lerr < err
            words = [jnp.where(take, a, b) for a, b in zip(lwords, words)]
            err = jnp.where(take, lerr, err)
        return words, err

    base, gray_tasks = _tasks_a(bw, bh, quality, gray, alpha)
    words, err = _void_extent(px, t_count)
    words, err = run(base, words, err)

    def write(ws, e):
        for w in range(4):
            out_ref[w : w + 1, :] = ws[w]
        err_ref[0:1, :] = e

    if gray_tasks:
        tile_flag = flags_ref[pl.program_id(0)]

        @pl.when(tile_flag != 0)
        def _():
            gw, ge = run(gray_tasks, words, err, _gray_mask(px))
            write(gw, ge)

        @pl.when(tile_flag == 0)
        def _():
            write(words, err)
    else:
        write(words, err)


# ---------------------------------------------------------------------------
# Kernel B: 2-partition screening + fit (CEM 8)
# ---------------------------------------------------------------------------


def _layouts_b(bw, bh, quality, alpha=True):
    plan = plan_for(quality, bw, bh)
    menu = layout_menu(bw, bh)
    lays = list(menu[(8, 2)][: plan.get("p2_layouts", 1)])
    if quality >= 3 and menu[(12, 2)] and alpha:
        lays.append(menu[(12, 2)][0])
    return lays


def _fit_2part(px, masks, lay, iters, clut, grid):
    """Multi-partition fit with membership masks (one [T,TN] mask per
    partition, summing to 1).  Returns (qs [(q0,q1)] per partition,
    gq [G,TN], err).

    Fit-space channels by CEM, as in _fit_1part: 8 = RGB, 12 = RGBA,
    0 = luminance, 4 = luminance+alpha (decode replicates L to RGB,
    spec C.2.14; no endpoint-order rule, so the orient/swap is skipped).
    """
    luma = lay.cem in (0, 4)
    if luma:
        gray = (px[0] + px[1] + px[2]) / 3.0
        pxf = [gray, px[3]] if lay.cem == 4 else [gray]
    else:
        pxf = px[: (4 if lay.cem == 12 else 3)]
    nch = len(pxf)

    def expand4(d):
        """Fit-space per-texel endpoint list -> (4-ch list, eval nch)."""
        if lay.cem == 0:
            return [d[0], d[0], d[0]], 3  # _eval_exact appends alpha=255
        if lay.cem == 4:
            return [d[0], d[0], d[0], d[1]], 4
        return d, nch

    nparts = len(masks)
    if luma:
        seeds = [_pca_seed(pxf, m, nch) for m in masks]
    else:
        seeds = [_orient(*_pca_seed(pxf, m, nch)) for m in masks]

    best = None
    for it in range(max(1, iters)):
        qs, ds = [], []
        for p in range(nparts):
            q0, d0 = _quant_colors(seeds[p][0], lay.clevels, clut)
            q1, d1 = _quant_colors(seeds[p][1], lay.clevels, clut)
            if not luma:
                swap = sum(d0[:3]) > sum(d1[:3])
                q0, q1 = _sel(swap, q1, q0), _sel(swap, q0, q1)
                d0, d1 = _sel(swap, d1, d0), _sel(swap, d0, d1)
            qs.append((q0, q1))
            ds.append((d0, d1))
        # per-texel endpoints via the membership masks
        d0t = [
            sum(ds[p][0][c].astype(jnp.float32) * masks[p]
                for p in range(nparts))
            for c in range(nch)
        ]
        d1t = [
            sum(ds[p][1][c].astype(jnp.float32) * masks[p]
                for p in range(nparts))
            for c in range(nch)
        ]
        d0x, nche = expand4(d0t)
        d1x, _ = expand4(d1t)
        d0i = [d.astype(jnp.int32) for d in d0x]
        d1i = [d.astype(jnp.int32) for d in d1x]
        if grid is None:
            gq, unq = _wquant_exact(
                px[:nche], d0i[:nche], d1i[:nche], lay.wlevels
            )
        else:
            df = [d1t[c] - d0t[c] for c in range(nch)]
            denom = sum(f * f for f in df) + 1e-6
            proj = sum((pxf[c] - d0t[c]) * df[c] for c in range(nch))
            t = jnp.clip(proj / denom, 0.0, 1.0)
            gq, unq = _grid_quant(t, lay, grid)
            if lay.bw * lay.bh > 64:
                gq = _gs_refine(px, d0i, d1i, nche, gq, lay, grid)
                unq = _infill_w64(gq, lay, grid)
        err = _eval_exact(px, d0i, d1i, unq, nche)
        cand = (qs, gq, unq, err)
        if best is None:
            best = cand
        else:
            take = err < best[3]
            newqs = [
                (
                    _sel(take, cand[0][p][0], best[0][p][0]),
                    _sel(take, cand[0][p][1], best[0][p][1]),
                )
                for p in range(nparts)
            ]
            best = (
                newqs,
                jnp.where(take, cand[1], best[1]),
                jnp.where(take, cand[2], best[2]),
                jnp.where(take, err, best[3]),
            )
        if it + 1 < max(1, iters):
            w = best[2].astype(jnp.float32) / 64.0
            if luma:
                seeds = [_ls(pxf, w, m, nch) for m in masks]
            else:
                seeds = [_orient(*_ls(pxf, w, m, nch)) for m in masks]

    qs, gq, _, err = best
    return qs, gq, err


def _pack_2part(lay, qs, gq, seed, shape, pack_tbls):
    """Mirror of kernels/astc.py:_pack_block for nparts >= 2 (same-CEM)."""
    nch = (lay.cem >> 2) + 1  # values per endpoint: 0->1, 4->2, 8->3, 12->4
    words = [jnp.zeros(shape, _U32) for _ in range(4)]
    mode = block_mode_field(lay.gw, lay.gh, lay.wlevels)
    hdr = mode | ((lay.nparts - 1) << 11)
    words[0] = words[0] | _U32(hdr)
    words[0] = words[0] | (seed.astype(_U32) << _U32(13))
    words[0] = words[0] | _U32(lay.cem << 2) << _U32(23)
    cols = []
    for p in range(lay.nparts):
        for c in range(nch):
            cols.append(qs[p][0][c])
            cols.append(qs[p][1][c])
    _pack_ise_pallas(words, cols, lay.clevels, False, lay.header, False,
                     pack_tbls)
    gq_vals = [gq[i : i + 1, :] for i in range(lay.gw * lay.gh)]
    _pack_ise_pallas(words, gq_vals, lay.wlevels, True, 0, True, pack_tbls)
    return words


def _kernel_b(x_ref, pt_ref, ptt_ref, smap_ref, trit_ref, quint_ref, *rest,
              quality, bw, bh, clut_levels, grid_layidx, alpha=True):
    clut_refs = rest[: len(clut_levels)]
    grid_refs = rest[len(clut_levels) : len(clut_levels) + 3 * len(grid_layidx)]
    out_ref, err_ref = rest[-2], rest[-1]
    cluts = {lv: r[:] for lv, r in zip(clut_levels, clut_refs)}
    grids = {
        li: (
            grid_refs[3 * k][:],
            grid_refs[3 * k + 1][:],
            grid_refs[3 * k + 2][:],
        )
        for k, li in enumerate(grid_layidx)
    }
    pack_tbls = (trit_ref[:], quint_ref[:])
    px = [x_ref[c] for c in range(4)]
    plan = plan_for(quality, bw, bh)
    iters = plan["iters"]
    topk = max(1, plan["seeds2"])
    lays = _layouts_b(bw, bh, quality, alpha)
    t_count = float(bw * bh)

    # --- screening: within-cluster SSE proxy over the DISTINCT
    # partition patterns (unique_partition_seeds; rows are padded with
    # zero masks, screened out as degenerate).  smap_ref maps the row
    # back to a real 10-bit seed for packing.
    pt = pt_ref[:]  # [U,T] membership of subset 1
    ns = jnp.sum(pt, axis=1, keepdims=True)  # [U,1]
    s1 = [_mm(pt, px[c]) for c in range(4)]  # [U,TN]
    sq_all = _rt(sum(px[c] * px[c] for c in range(4)))  # [1,TN]
    s_all = [_rt(px[c]) for c in range(4)]
    n1 = ns + 1e-6
    n0 = (t_count - ns) + 1e-6
    explained = sum(s1[c] * s1[c] for c in range(4)) / n1 + sum(
        (s_all[c] - s1[c]) * (s_all[c] - s1[c]) for c in range(4)
    ) / n0
    sse = sq_all - explained
    degenerate = (ns < 1.0) | (ns > t_count - 1.0)
    sse = jnp.where(degenerate, jnp.inf, sse)
    iota = jax.lax.broadcasted_iota(jnp.int32, sse.shape, 0)

    nrows = pt.shape[0]
    seeds_l = []  # pattern-row indices
    for k in range(topk):
        smin = jnp.min(sse, axis=0, keepdims=True)
        seed = jnp.min(
            jnp.where(sse == smin, iota, nrows), axis=0, keepdims=True
        )
        sse = jnp.where(iota == seed, jnp.inf, sse)
        seeds_l.append(seed)
    keep = min(max(1, plan.get("keep2", 1)), topk)
    if topk > keep:
        # Estimate-then-refine via the continuous-SSE rank (mirrors
        # kernels/astc.py:_rank_seeds_cont): per-subset masked-PCA line
        # residual — a few elementwise reductions per seed instead of an
        # unrefined quantized fit, same ranking quality on the harness.
        def cont_sse(m1):
            tot = None
            for m in (1.0 - m1, m1):
                cnt = _rt(m) + 1e-6
                mean = [_rt(px[c] * m) / cnt for c in range(4)]
                cent = [(px[c] - mean[c]) * m for c in range(4)]
                cov = [
                    [_rt(cent[a] * cent[d]) for d in range(4)]
                    for a in range(4)
                ]
                v = [jnp.ones_like(cnt) for _ in range(4)]
                for _ in range(3):
                    nv = [
                        sum(cov[a][d] * v[d] for d in range(4))
                        for a in range(4)
                    ]
                    nn = jnp.sqrt(sum(x * x for x in nv))
                    v = [
                        jnp.where(nn > 1e-10, nv[a] / (nn + 1e-20), v[a])
                        for a in range(4)
                    ]
                proj = sum(cent[c] * v[c] for c in range(4))
                e = _rt(sum(cent[c] * cent[c] for c in range(4))) - _rt(
                    proj * proj
                )
                tot = e if tot is None else tot + e
            return tot

        ests = []
        for seed in seeds_l:
            onehot = (iota == seed).astype(jnp.float32)
            m1 = _mm(ptt_ref[:], onehot)
            ests.append(cont_sse(m1))
        chosen = [jnp.zeros_like(e, jnp.bool_) for e in ests]
        winners = []
        for _ in range(keep):
            bi = None
            be = None
            bseed = None
            for i, (seed, e) in enumerate(zip(seeds_l, ests)):
                ee = jnp.where(chosen[i], jnp.inf, e)
                if bi is None:
                    bi = jnp.zeros_like(e, jnp.int32)
                    be = ee
                    bseed = seed
                else:
                    take = ee < be
                    bi = jnp.where(take, i, bi)
                    be = jnp.minimum(ee, be)
                    bseed = jnp.where(take, seed, bseed)
            winners.append(bseed)
            for i in range(len(ests)):
                chosen[i] = chosen[i] | (bi == i)
        seeds_l = winners

    words = None
    err = None
    p2_iters = plan.get("p2_iters", iters)
    smap = smap_ref[:]  # [U,1] float seed ids
    for seed in seeds_l:
        onehot = (iota == seed).astype(jnp.float32)  # [U,TN]
        m1 = _mm(ptt_ref[:], onehot)  # [T,TN]
        seed_id = jnp.sum(
            smap * onehot, axis=0, keepdims=True
        ).astype(jnp.int32)  # [1,TN] real 10-bit seed
        for li, lay in enumerate(lays):
            qs, gq, lerr = _fit_2part(
                px, (1.0 - m1, m1), lay, p2_iters,
                cluts.get(lay.clevels), grids.get(li),
            )
            lwords = _pack_2part(lay, qs, gq, seed_id, lerr.shape, pack_tbls)
            if words is None:
                words, err = lwords, lerr
            else:
                take = lerr < err
                words = [
                    jnp.where(take, a, b) for a, b in zip(lwords, words)
                ]
                err = jnp.minimum(lerr, err)

    for w in range(4):
        out_ref[w : w + 1, :] = words[w]
    err_ref[0:1, :] = err


# ---------------------------------------------------------------------------
# Kernel C: 3-partition screening + fit (CEM 8), mirrors the jnp seeds3 sweep
# ---------------------------------------------------------------------------


def _kernel_c(x_ref, p1_ref, p2_ref, p1t_ref, p2t_ref, smap_ref, trit_ref,
              quint_ref, *rest, quality, bw, bh, clut_levels, has_grid):
    clut_refs = rest[: len(clut_levels)]
    grid_refs = rest[len(clut_levels) : len(clut_levels) + (3 if has_grid else 0)]
    out_ref, err_ref = rest[-2], rest[-1]
    cluts = {lv: r[:] for lv, r in zip(clut_levels, clut_refs)}
    grid = (
        (grid_refs[0][:], grid_refs[1][:], grid_refs[2][:])
        if has_grid
        else None
    )
    pack_tbls = (trit_ref[:], quint_ref[:])
    px = [x_ref[c] for c in range(4)]
    plan = plan_for(quality, bw, bh)
    iters = plan["iters"]
    topk = max(1, plan["seeds3"])
    lay = layout_menu(bw, bh)[(8, 3)][0]
    t_count = float(bw * bh)

    # 3-cluster within-SSE proxy over the DISTINCT patterns (two
    # membership tables on the MXU; unique_partition_seeds rows, padded
    # with zero masks -> screened out as degenerate).
    p1 = p1_ref[:]  # [U,T]
    p2 = p2_ref[:]
    n1 = jnp.sum(p1, axis=1, keepdims=True)
    n2 = jnp.sum(p2, axis=1, keepdims=True)
    s1 = [_mm(p1, px[c]) for c in range(4)]
    s2 = [_mm(p2, px[c]) for c in range(4)]
    sq_all = _rt(sum(px[c] * px[c] for c in range(4)))
    s_all = [_rt(px[c]) for c in range(4)]
    n0 = t_count - n1 - n2
    explained = (
        sum((s_all[c] - s1[c] - s2[c]) ** 2 for c in range(4))
        / jnp.maximum(n0, 1.0)
        + sum(s1[c] * s1[c] for c in range(4)) / jnp.maximum(n1, 1.0)
        + sum(s2[c] * s2[c] for c in range(4)) / jnp.maximum(n2, 1.0)
    )
    sse = sq_all - explained
    degenerate = (n0 < 1.0) | (n1 < 1.0) | (n2 < 1.0)
    sse = jnp.where(degenerate, jnp.inf, sse)
    iota = jax.lax.broadcasted_iota(jnp.int32, sse.shape, 0)

    nrows = p1.shape[0]
    seeds_l = []  # pattern-row indices
    for k in range(topk):
        smin = jnp.min(sse, axis=0, keepdims=True)
        seed = jnp.min(
            jnp.where(sse == smin, iota, nrows), axis=0, keepdims=True
        )
        sse = jnp.where(iota == seed, jnp.inf, sse)
        seeds_l.append(seed)
    keep3 = min(max(1, plan.get("keep3", 1)), topk)
    if topk > keep3:
        # Estimate-then-refine (see _kernel_b / kernels/astc.py:_rank_seeds):
        # one unrefined fit per seed, deep-fit the per-block top-keep3.
        ests = []
        for seed in seeds_l:
            onehot = (iota == seed).astype(jnp.float32)
            m1 = _mm(p1t_ref[:], onehot)
            m2 = _mm(p2t_ref[:], onehot)
            _, _, e = _fit_2part(
                px, (1.0 - m1 - m2, m1, m2), lay, 1,
                cluts.get(lay.clevels), grid,
            )
            ests.append(e)
        chosen = [jnp.zeros_like(e, jnp.bool_) for e in ests]
        winners = []
        for _ in range(keep3):
            bi = be = bseed = None
            for i, (seed, e) in enumerate(zip(seeds_l, ests)):
                ee = jnp.where(chosen[i], jnp.inf, e)
                if bi is None:
                    bi = jnp.zeros_like(e, jnp.int32)
                    be = ee
                    bseed = seed
                else:
                    take = ee < be
                    bi = jnp.where(take, i, bi)
                    be = jnp.minimum(ee, be)
                    bseed = jnp.where(take, seed, bseed)
            winners.append(bseed)
            for i in range(len(ests)):
                chosen[i] = chosen[i] | (bi == i)
        seeds_l = winners

    words = None
    err = None
    smap = smap_ref[:]  # [U,1] float seed ids
    for seed in seeds_l:
        onehot = (iota == seed).astype(jnp.float32)
        m1 = _mm(p1t_ref[:], onehot)  # [T,TN]
        m2 = _mm(p2t_ref[:], onehot)
        seed_id = jnp.sum(
            smap * onehot, axis=0, keepdims=True
        ).astype(jnp.int32)
        qs, gq, lerr = _fit_2part(
            px, (1.0 - m1 - m2, m1, m2), lay, iters,
            cluts.get(lay.clevels), grid,
        )
        lwords = _pack_2part(lay, qs, gq, seed_id, lerr.shape, pack_tbls)
        if words is None:
            words, err = lwords, lerr
        else:
            take = lerr < err
            words = [jnp.where(take, a, b) for a, b in zip(lwords, words)]
            err = jnp.minimum(lerr, err)

    for w in range(4):
        out_ref[w : w + 1, :] = words[w]
    err_ref[0:1, :] = err


# ---------------------------------------------------------------------------
# Kernel D: 4-partition screening + fit (luminance CEMs 0/4 — CEM 8 x 4
# partitions would exceed the 18-value ISE cap), mirrors the jnp seeds4 sweep
# ---------------------------------------------------------------------------


def _kernel_d(x_ref, flags_ref, p1_ref, p2_ref, p3_ref, p1t_ref, p2t_ref,
              p3t_ref, trit_ref, quint_ref, *rest, quality, bw, bh,
              clut_levels, grid_layidx):
    lays = _layouts_d(bw, bh)
    clut_refs = rest[: len(clut_levels)]
    grid_refs = rest[len(clut_levels) : len(clut_levels) + 3 * len(grid_layidx)]
    out_ref, err_ref = rest[-2], rest[-1]
    tile_flag = flags_ref[pl.program_id(0)]

    @pl.when(tile_flag == 0)
    def _():
        # No near-gray block in this tile: the luminance 4-partition fits
        # cannot win anywhere, so skip the whole sweep on the scalar core.
        out_ref[:, :] = jnp.zeros(out_ref.shape, out_ref.dtype)
        err_ref[0:1, :] = jnp.full(err_ref.shape, np.inf, jnp.float32)

    @pl.when(tile_flag != 0)
    def _():
        cluts = {lv: r[:] for lv, r in zip(clut_levels, clut_refs)}
        grids = {
            li: (
                grid_refs[3 * k][:],
                grid_refs[3 * k + 1][:],
                grid_refs[3 * k + 2][:],
            )
            for k, li in enumerate(grid_layidx)
        }
        pack_tbls = (trit_ref[:], quint_ref[:])
        px = [x_ref[c] for c in range(4)]
        plan = plan_for(quality, bw, bh)
        iters = plan["iters"]
        topk = max(1, plan["seeds4"])
        t_count = float(bw * bh)

        # 4-cluster within-SSE proxy over all 1024 seeds (three membership
        # tables on the MXU; mirrors astc.py:_screen_partitions nparts=4).
        ps = [p1_ref[:], p2_ref[:], p3_ref[:]]  # [1024,T] each
        ns = [jnp.sum(p, axis=1, keepdims=True) for p in ps]
        s_p = [[_mm(p, px[c]) for c in range(4)] for p in ps]
        sq_all = _rt(sum(px[c] * px[c] for c in range(4)))
        s_all = [_rt(px[c]) for c in range(4)]
        n0 = t_count - ns[0] - ns[1] - ns[2]
        explained = sum(
            (s_all[c] - s_p[0][c] - s_p[1][c] - s_p[2][c]) ** 2
            for c in range(4)
        ) / jnp.maximum(n0, 1.0)
        for j in range(3):
            explained = explained + sum(
                s_p[j][c] * s_p[j][c] for c in range(4)
            ) / jnp.maximum(ns[j], 1.0)
        sse = sq_all - explained
        degenerate = n0 < 1.0
        for nj in ns:
            degenerate = degenerate | (nj < 1.0)
        sse = jnp.where(degenerate, jnp.inf, sse)
        iota = jax.lax.broadcasted_iota(jnp.int32, sse.shape, 0)

        seeds_l = []
        for k in range(topk):
            smin = jnp.min(sse, axis=0, keepdims=True)
            seed = jnp.min(
                jnp.where(sse == smin, iota, 1024), axis=0, keepdims=True
            )
            sse = jnp.where(iota == seed, jnp.inf, sse)
            seeds_l.append(seed)
        if topk > 1:
            # Estimate-then-refine (see kernels/astc.py:_rank_seeds).
            bs, be = None, None
            for seed in seeds_l:
                onehot = (iota == seed).astype(jnp.float32)
                m1 = _mm(p1t_ref[:], onehot)
                m2 = _mm(p2t_ref[:], onehot)
                m3 = _mm(p3t_ref[:], onehot)
                _, _, e = _fit_2part(
                    px, (1.0 - m1 - m2 - m3, m1, m2, m3), lays[0], 1,
                    cluts.get(lays[0].clevels), grids.get(0),
                )
                if bs is None:
                    bs, be = seed, e
                else:
                    take = e < be
                    bs = jnp.where(take, seed, bs)
                    be = jnp.minimum(e, be)
            seeds_l = [bs]

        words = None
        err = None
        for seed in seeds_l:
            onehot = (iota == seed).astype(jnp.float32)
            m1 = _mm(p1t_ref[:], onehot)  # [T,TN]
            m2 = _mm(p2t_ref[:], onehot)
            m3 = _mm(p3t_ref[:], onehot)
            for li, lay in enumerate(lays):
                qs, gq, lerr = _fit_2part(
                    px, (1.0 - m1 - m2 - m3, m1, m2, m3), lay, iters,
                    cluts.get(lay.clevels), grids.get(li),
                )
                lwords = _pack_2part(lay, qs, gq, seed, lerr.shape, pack_tbls)
                if words is None:
                    words, err = lwords, lerr
                else:
                    take = lerr < err
                    words = [
                        jnp.where(take, a, b) for a, b in zip(lwords, words)
                    ]
                    err = jnp.minimum(lerr, err)

        # Only near-gray blocks may take a luminance 4-partition result.
        err = jnp.where(_gray_mask(px), err, jnp.float32(np.inf))
        for w in range(4):
            out_ref[w : w + 1, :] = words[w]
        err_ref[0:1, :] = err


def _layouts_d(bw, bh):
    menu = layout_menu(bw, bh)
    return [menu[key][0] for key in ((0, 4), (4, 4)) if menu[key]]


# ---------------------------------------------------------------------------
# Wrapper
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=(
        "block_w", "block_h", "quality", "interpret", "gray", "alpha"
    ),
)
def encode_astc_pallas(
    blocks: jnp.ndarray,
    block_w: int = 4,
    block_h: int = 4,
    quality: int = 2,
    interpret: bool = False,
    gray: bool = True,
    alpha: bool = True,
) -> jnp.ndarray:
    """Encode [N,bw*bh,4] float RGBA (0..1) -> ASTC [N,4] uint32 words.

    All 14 2D block sizes: non-full weight grids run the spec C.2.18
    infill and its pseudo-inverse as in-kernel MXU matmuls.

    ``gray=False`` statically skips the luminance CEM 0/4 single-partition
    fits and the 4-partition CEM 0/4 kernel — callers pass False when a
    host-side scan found no near-gray block in the batch
    (kernels/astc.py:has_gray_blocks).  With ``gray=True`` the fits are
    gated dynamically: a per-tile flag (any near-gray block in the tile)
    skips them on the scalar core via `pl.when`, and a per-block mask
    limits who may take the result, so the output is independent of the
    tile layout and matches the jnp path's per-block gating."""
    bw, bh = int(block_w), int(block_h)
    t_count = bw * bh
    quality = max(0, min(4, int(quality)))
    plan = plan_for(quality, bw, bh)
    n = blocks.shape[0]

    def pad_to(tn):
        npad = -(-n // tn) * tn
        x = jnp.clip(blocks.astype(jnp.float32), 0.0, 1.0) * 255.0
        x = jnp.pad(x, ((0, npad - n), (0, 0), (0, 0)))
        return jnp.transpose(x, (2, 1, 0)), npad  # [4,T,Np]

    gray = bool(gray)
    if gray:
        from cuttlefish_tpu.kernels.astc import GRAY_SPREAD

        rgb = jnp.clip(blocks[..., :3].astype(jnp.float32), 0.0, 1.0)
        spread = jnp.max(rgb, axis=2) - jnp.min(rgb, axis=2)  # [N,T]
        isgray_n = jnp.max(spread, axis=1) < GRAY_SPREAD  # [N]

        def tile_flags(npad, tn):
            f = jnp.pad(isgray_n, (0, npad - n))
            return jnp.any(f.reshape(npad // tn, tn), axis=1).astype(
                jnp.int32
            )

        smem_flags_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    trit_tbl = jnp.asarray(
        trit_pack_table().reshape(1, -1).astype(np.float32)
    )  # [1,243]
    quint_tbl = jnp.asarray(
        quint_pack_table().reshape(1, -1).astype(np.float32)
    )  # [1,125]
    alpha = bool(alpha)
    base_a, gray_a = _tasks_a(bw, bh, quality, gray, alpha)
    tasks_a = base_a + gray_a
    clut_levels = tuple(
        sorted({lay.clevels for lay, _ in tasks_a if lay.clevels != 256})
    )
    cluts = [
        jnp.asarray(np.stack(_color_qlut(lv)).astype(np.float32))
        for lv in clut_levels
    ]  # each [2,256]
    grid_keys = tuple(
        sorted(
            {
                (lay.gw, lay.gh)
                for lay, _ in tasks_a
                if _prepared_grid(bw, bh, lay.gw, lay.gh) is not None
            }
        )
    )
    grid_arrs = []
    grid_specs = []
    const = lambda i: (0, 0)
    for gw, gh in grid_keys:
        a, pinv, foot = _prepared_grid(bw, bh, gw, gh)
        grid_arrs += [jnp.asarray(a), jnp.asarray(pinv), jnp.asarray(foot)]
        grid_specs += [
            pl.BlockSpec(a.shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec(pinv.shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec(foot.shape, const, memory_space=pltpu.VMEM),
        ]

    full_tn = TN_A if t_count <= 16 else (256 if t_count <= 64 else 128)
    if quality >= 3:
        full_tn = min(full_tn, 256)
    tn_a = full_tn if n >= full_tn else -(-n // 128) * 128
    xa, npad_a = pad_to(tn_a)
    flag_args_a = [tile_flags(npad_a, tn_a)] if gray and gray_a else []
    flag_specs_a = [smem_flags_spec] if flag_args_a else []
    words_a, err_a = pl.pallas_call(
        functools.partial(
            _kernel_a, quality=quality, clut_levels=clut_levels,
            bw=bw, bh=bh, grid_keys=grid_keys, gray=bool(flag_args_a),
            alpha=alpha,
        ),
        grid=(npad_a // tn_a,),
        in_specs=[
            pl.BlockSpec(
                (4, t_count, tn_a), lambda i: (0, 0, i),
                memory_space=pltpu.VMEM,
            ),
        ]
        + flag_specs_a
        + [
            pl.BlockSpec((1, 243), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 125), const, memory_space=pltpu.VMEM),
        ]
        + [
            pl.BlockSpec((2, 256), const, memory_space=pltpu.VMEM)
            for _ in clut_levels
        ]
        + grid_specs,
        out_specs=[
            pl.BlockSpec((4, tn_a), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn_a), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((4, npad_a), jnp.uint32),
            jax.ShapeDtypeStruct((1, npad_a), jnp.float32),
        ],
        interpret=interpret,
    )(xa, *flag_args_a, trit_tbl, quint_tbl, *cluts, *grid_arrs)
    words = jnp.transpose(words_a)[:n]
    err = err_a[0, :n]

    lays_b = _layouts_b(bw, bh, quality, alpha)
    if plan["seeds2"] and lays_b:
        full_tn_b = TN_B if t_count <= 64 else 128
        tn_b = full_tn_b if n >= full_tn_b else -(-n // 128) * 128
        xb, npad_b = pad_to(tn_b)
        us2 = unique_partition_seeds(bw, bh, 2)
        upad = -(-len(us2) // 8) * 8
        pt_np = (partition_table(bw, bh, 2)[us2] == 1).astype(np.float32)
        pt_np = np.pad(pt_np, ((0, upad - len(us2)), (0, 0)))
        smap_np = np.pad(
            us2.astype(np.float32), (0, upad - len(us2))
        )[:, None]
        pt = jnp.asarray(pt_np)  # [Upad,T]
        smap = jnp.asarray(smap_np)  # [Upad,1]
        clut_levels_b = tuple(
            sorted({l.clevels for l in lays_b if l.clevels != 256})
        )
        cluts_b = [
            jnp.asarray(np.stack(_color_qlut(lv)).astype(np.float32))
            for lv in clut_levels_b
        ]
        grid_layidx_b = tuple(
            li for li, l in enumerate(lays_b)
            if _prepared_grid(bw, bh, l.gw, l.gh) is not None
        )
        gridb_arrs = []
        gridb_specs = []
        for li in grid_layidx_b:
            a, pinv, foot = _prepared_grid(
                bw, bh, lays_b[li].gw, lays_b[li].gh
            )
            gridb_arrs += [
                jnp.asarray(a), jnp.asarray(pinv), jnp.asarray(foot)
            ]
            gridb_specs += [
                pl.BlockSpec(a.shape, const, memory_space=pltpu.VMEM),
                pl.BlockSpec(pinv.shape, const, memory_space=pltpu.VMEM),
                pl.BlockSpec(foot.shape, const, memory_space=pltpu.VMEM),
            ]
        words_b, err_b = pl.pallas_call(
            functools.partial(
                _kernel_b, quality=quality, bw=bw, bh=bh,
                clut_levels=clut_levels_b, grid_layidx=grid_layidx_b,
                alpha=alpha,
            ),
            grid=(npad_b // tn_b,),
            in_specs=[
                pl.BlockSpec(
                    (4, t_count, tn_b), lambda i: (0, 0, i),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (upad, t_count), const, memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (t_count, upad), const, memory_space=pltpu.VMEM
                ),
                pl.BlockSpec((upad, 1), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 243), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 125), const, memory_space=pltpu.VMEM),
            ]
            + [
                pl.BlockSpec((2, 256), const, memory_space=pltpu.VMEM)
                for _ in clut_levels_b
            ]
            + gridb_specs,
            out_specs=[
                pl.BlockSpec(
                    (4, tn_b), lambda i: (0, i), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (1, tn_b), lambda i: (0, i), memory_space=pltpu.VMEM
                ),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((4, npad_b), jnp.uint32),
                jax.ShapeDtypeStruct((1, npad_b), jnp.float32),
            ],
            interpret=interpret,
        )(
            xb, pt, jnp.transpose(pt), smap, trit_tbl, quint_tbl,
            *cluts_b, *gridb_arrs,
        )
        wb = jnp.transpose(words_b)[:n]
        eb = err_b[0, :n]
        take = eb < err
        words = jnp.where(take[:, None], wb, words)
        err = jnp.where(take, eb, err)

    menu = layout_menu(bw, bh)
    if plan["seeds3"] and menu[(8, 3)]:
        lay3 = menu[(8, 3)][0]
        full_tn_c = TN_B if t_count <= 64 else 128
        tn_c = full_tn_c if n >= full_tn_c else -(-n // 128) * 128
        xc, npad_c = pad_to(tn_c)
        us3 = unique_partition_seeds(bw, bh, 3)
        upad3 = -(-len(us3) // 8) * 8
        tab3 = partition_table(bw, bh, 3)[us3]
        p1_np = np.pad(
            (tab3 == 1).astype(np.float32), ((0, upad3 - len(us3)), (0, 0))
        )
        p2_np = np.pad(
            (tab3 == 2).astype(np.float32), ((0, upad3 - len(us3)), (0, 0))
        )
        smap3 = jnp.asarray(
            np.pad(us3.astype(np.float32), (0, upad3 - len(us3)))[:, None]
        )
        p1 = jnp.asarray(p1_np)
        p2 = jnp.asarray(p2_np)
        clut_levels_c = (
            (lay3.clevels,) if lay3.clevels != 256 else ()
        )
        cluts_c = [
            jnp.asarray(np.stack(_color_qlut(lv)).astype(np.float32))
            for lv in clut_levels_c
        ]
        gridc = _prepared_grid(bw, bh, lay3.gw, lay3.gh)
        gridc_arrs = []
        gridc_specs = []
        if gridc is not None:
            a, pinv, foot = gridc
            gridc_arrs = [
                jnp.asarray(a), jnp.asarray(pinv), jnp.asarray(foot)
            ]
            gridc_specs = [
                pl.BlockSpec(a.shape, const, memory_space=pltpu.VMEM),
                pl.BlockSpec(pinv.shape, const, memory_space=pltpu.VMEM),
                pl.BlockSpec(foot.shape, const, memory_space=pltpu.VMEM),
            ]
        words_c, err_c = pl.pallas_call(
            functools.partial(
                _kernel_c, quality=quality, bw=bw, bh=bh,
                clut_levels=clut_levels_c, has_grid=gridc is not None,
            ),
            grid=(npad_c // tn_c,),
            in_specs=[
                pl.BlockSpec(
                    (4, t_count, tn_c), lambda i: (0, 0, i),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec((upad3, t_count), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((upad3, t_count), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((t_count, upad3), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((t_count, upad3), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((upad3, 1), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 243), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 125), const, memory_space=pltpu.VMEM),
            ]
            + [
                pl.BlockSpec((2, 256), const, memory_space=pltpu.VMEM)
                for _ in clut_levels_c
            ]
            + gridc_specs,
            out_specs=[
                pl.BlockSpec(
                    (4, tn_c), lambda i: (0, i), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (1, tn_c), lambda i: (0, i), memory_space=pltpu.VMEM
                ),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((4, npad_c), jnp.uint32),
                jax.ShapeDtypeStruct((1, npad_c), jnp.float32),
            ],
            interpret=interpret,
        )(
            xc, p1, p2, jnp.transpose(p1), jnp.transpose(p2), smap3,
            trit_tbl, quint_tbl, *cluts_c, *gridc_arrs,
        )
        wc = jnp.transpose(words_c)[:n]
        ec = err_c[0, :n]
        take = ec < err
        words = jnp.where(take[:, None], wc, words)
        err = jnp.where(take, ec, err)

    lays_d = _layouts_d(bw, bh)
    if plan["seeds4"] and lays_d and gray:
        full_tn_d = TN_B if t_count <= 64 else 128
        tn_d = full_tn_d if n >= full_tn_d else -(-n // 128) * 128
        xd, npad_d = pad_to(tn_d)
        tab4 = partition_table(bw, bh, 4)
        pd = [jnp.asarray((tab4 == j).astype(np.float32)) for j in (1, 2, 3)]
        clut_levels_d = tuple(
            sorted({l.clevels for l in lays_d if l.clevels != 256})
        )
        cluts_d = [
            jnp.asarray(np.stack(_color_qlut(lv)).astype(np.float32))
            for lv in clut_levels_d
        ]
        grid_layidx_d = tuple(
            li for li, l in enumerate(lays_d)
            if _prepared_grid(bw, bh, l.gw, l.gh) is not None
        )
        gridd_arrs = []
        gridd_specs = []
        for li in grid_layidx_d:
            a, pinv, foot = _prepared_grid(
                bw, bh, lays_d[li].gw, lays_d[li].gh
            )
            gridd_arrs += [
                jnp.asarray(a), jnp.asarray(pinv), jnp.asarray(foot)
            ]
            gridd_specs += [
                pl.BlockSpec(a.shape, const, memory_space=pltpu.VMEM),
                pl.BlockSpec(pinv.shape, const, memory_space=pltpu.VMEM),
                pl.BlockSpec(foot.shape, const, memory_space=pltpu.VMEM),
            ]
        words_d, err_d = pl.pallas_call(
            functools.partial(
                _kernel_d, quality=quality, bw=bw, bh=bh,
                clut_levels=clut_levels_d, grid_layidx=grid_layidx_d,
            ),
            grid=(npad_d // tn_d,),
            in_specs=[
                pl.BlockSpec(
                    (4, t_count, tn_d), lambda i: (0, 0, i),
                    memory_space=pltpu.VMEM,
                ),
                smem_flags_spec,
            ]
            + [
                pl.BlockSpec((1024, t_count), const, memory_space=pltpu.VMEM)
                for _ in range(3)
            ]
            + [
                pl.BlockSpec((t_count, 1024), const, memory_space=pltpu.VMEM)
                for _ in range(3)
            ]
            + [
                pl.BlockSpec((1, 243), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 125), const, memory_space=pltpu.VMEM),
            ]
            + [
                pl.BlockSpec((2, 256), const, memory_space=pltpu.VMEM)
                for _ in clut_levels_d
            ]
            + gridd_specs,
            out_specs=[
                pl.BlockSpec(
                    (4, tn_d), lambda i: (0, i), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (1, tn_d), lambda i: (0, i), memory_space=pltpu.VMEM
                ),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((4, npad_d), jnp.uint32),
                jax.ShapeDtypeStruct((1, npad_d), jnp.float32),
            ],
            interpret=interpret,
        )(
            xd, tile_flags(npad_d, tn_d), *pd,
            *(jnp.transpose(p) for p in pd),
            trit_tbl, quint_tbl, *cluts_d, *gridd_arrs,
        )
        wd = jnp.transpose(words_d)[:n]
        ed = err_d[0, :n]
        take = ed < err
        words = jnp.where(take[:, None], wd, words)
    return words


def encode_astc4x4_pallas(
    blocks: jnp.ndarray, quality: int = 2, interpret: bool = False,
    gray: bool = True,
) -> jnp.ndarray:
    """Encode [N,16,4] float RGBA (0..1) -> ASTC 4x4 [N,4] uint32 words."""
    return encode_astc_pallas(blocks, 4, 4, quality, interpret, gray)
