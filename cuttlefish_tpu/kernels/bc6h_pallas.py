"""BC6H block encoder as a Pallas TPU kernel (all 14 modes, q0-4).

Blocks-on-lanes layout like bc7_pallas.py ([16,TN] texel tiles, channels
unrolled).  Mirrors kernels/bc6h.py exactly: the half-float bit-domain
proxy is computed outside the kernel (plain jnp elementwise), the kernel
runs the one-region mode 11/12 fits, the 32-partition screening (MXU
matmuls against the BPTC partition table), the shared two-region float
fit, and per-mode quantize+index+pack with the Mesa-extracted scrambled
layouts.  Replaces ispc_texcomp / Compressonator BC6H
(`/root/reference/lib/src/S3tcConverter.cpp:492-591`) on the TPU hot path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cuttlefish_tpu.kernels.bc6h import (
    _BC6H_ITERS,
    _PART_SEEDS,
    _TWO_REGION_PLAN,
    _to_proxy,
)
from cuttlefish_tpu.kernels.bc6h_tables import (
    TWO_REGION_LAYOUT,
    TWO_REGION_MODES,
)
from cuttlefish_tpu.kernels.bc7_tables import (
    ANCHOR2,
    PARTITION2,
    WEIGHTS3,
    WEIGHTS4,
)

TN = 512

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


def _iota16(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 0)


class _Packer:
    """Bit packer into 4 uint32 [1,TN] words."""

    def __init__(self, shape):
        self.words = [jnp.zeros(shape, _U32) for _ in range(4)]
        self.pos = 0

    def put(self, value, nbits: int):
        v = value.astype(_U32) & _U32((1 << nbits) - 1)
        w, b = divmod(self.pos, 32)
        self.words[w] = self.words[w] | (v << _U32(b))
        if b + nbits > 32:
            self.words[w + 1] = self.words[w + 1] | (v >> _U32(32 - b))
        self.pos += nbits

    def put_dynamic(self, value, pos, maxbits: int):
        v = value.astype(_U32) & _U32((1 << maxbits) - 1)
        for w in range(4):
            rel = pos - 32 * w
            lsh = jnp.clip(rel, 0, 31).astype(_U32)
            rsh = jnp.clip(-rel, 0, 31).astype(_U32)
            part = jnp.where(rel >= 0, v << lsh, v >> rsh)
            valid = (rel > -maxbits) & (rel < 32)
            self.words[w] = self.words[w] | jnp.where(valid, part, _U32(0))


# ---------------------------------------------------------------------------
# Decode model (proxy half-bit domain)
# ---------------------------------------------------------------------------


def _unquant_unsigned(q, bits: int):
    maxq = (1 << bits) - 1
    u = ((q << 16) + 0x8000) >> bits
    return jnp.where(q == 0, 0, jnp.where(q == maxq, 0xFFFF, u))


def _unquant_signed(q, bits: int):
    s = q < 0
    aq = jnp.abs(q)
    maxa = (1 << (bits - 1)) - 1
    u = ((aq << 15) + 0x4000) >> (bits - 1)
    u = jnp.where(aq == 0, 0, jnp.where(aq >= maxa, 0x7FFF, u))
    return jnp.where(s, -u, u)


def _finalize(v, signed: bool):
    if signed:
        sgn = jnp.where(v < 0, -1, jnp.where(v > 0, 1, 0))
        return sgn * ((jnp.abs(v) * 31) >> 5)
    return (v * 31) >> 6


def _proxy_to_value(b):
    """Half-bit proxy (float, possibly fractional/negative) -> f32 value.

    Exact piecewise-exponential inverse of `_to_proxy`; 2^(e-25) via the
    f32 exponent field (ldexp) rather than transcendental exp2.  Used once
    per texel and once per *selected* palette entry — the per-candidate
    loops use the cheaper `_proxy_scale` linearization."""
    a = jnp.abs(b)
    e = jnp.minimum(jnp.floor(a * (1.0 / 1024.0)), 120.0)
    p2 = jax.lax.bitcast_convert_type(
        (e.astype(jnp.int32) + 102) << 23, jnp.float32
    )  # 2^(e-25); e clamped so the exponent field cannot overflow
    m = a - e * 1024.0
    val = jnp.where(a < 1024.0, a * (2.0**-24), p2 * (1024.0 + m))
    return jnp.where(b < 0, -val, val)


def _proxy_scale(b):
    """Per-texel d(value)/d(proxy bit): 2^(e-25) (2^-24 in the denormal
    segment).  The proxy->value map is piecewise LINEAR in the mantissa, so
    value-domain error is exactly (scale * proxy_diff)^2 while the candidate
    stays inside the texel's exponent segment — this linearization keeps the
    hot assign loops at one extra multiply instead of a full conversion."""
    a = jnp.abs(b)
    e = jnp.minimum(jnp.floor(a * (1.0 / 1024.0)), 120.0)
    p2 = jax.lax.bitcast_convert_type(
        (e.astype(jnp.int32) + 102) << 23, jnp.float32
    )
    return jnp.where(a < 1024.0, 2.0**-24, p2)


def _quant_candidates(e, bits: int, signed: bool):
    """Channel list [1,TN] float proxy targets -> quantized ints."""
    if signed:
        maxq = (1 << (bits - 1)) - 1
        scale = 31.0 * (1 << 11) / (1 << bits)
        lo, hi = -maxq, maxq
    else:
        maxq = (1 << bits) - 1
        scale = 31.0 * (1 << 10) / (1 << bits)
        lo, hi = 0, maxq
    out = []
    for ec in e:
        base = jnp.round(ec * (1.0 / scale)).astype(jnp.int32)
        best_q = None
        best_e = None
        for d in (-1, 0, 1):
            q = jnp.clip(base + d, lo, hi)
            u = _unquant_signed(q, bits) if signed else _unquant_unsigned(q, bits)
            dec = _finalize(u, signed).astype(jnp.float32)
            err = (dec - ec) ** 2
            if best_q is None:
                best_q, best_e = q, err
            else:
                take = err < best_e
                best_q = jnp.where(take, q, best_q)
                best_e = jnp.minimum(err, best_e)
        out.append(best_q)
    return out


def _palette_entry(q0, q1, w: int, bits: int, signed: bool):
    """Channel lists -> decoded palette entry (channel list, float)."""
    unq = _unquant_signed if signed else _unquant_unsigned
    out = []
    for c in range(3):
        u0 = unq(q0[c], bits)
        u1 = unq(q1[c], bits)
        interp = (u0 * (64 - w) + u1 * w + 32) >> 6
        out.append(_finalize(interp, signed).astype(jnp.float32))
    return out


def _w64_dyn(kk, levels: int):
    """Per-texel interpolation weight round(k*64/(L-1)) (the BC6H 3/4-bit
    weight tables equal the BC7 formula); same float-floor trick as
    bc7_pallas._w64 — the numerator is odd so the f32 floor is exact."""
    num = (kk * 128 + (levels - 1)).astype(jnp.float32)
    return jnp.floor(num * (1.0 / (2 * (levels - 1)))).astype(jnp.int32)


def _assign_full(px, pxv, pxs, q0, q1, bits: int, signed: bool, weights,
                 code=False,
                 mask=None):
    """Nearest-palette index by line projection + 3-candidate check (the BC7
    kernels' O(1) assign instead of the full L-entry sweep).  Per-texel
    candidate choice uses the `pxs` linearization (cheap); the RETURNED err
    — what every keep-best / cross-mode comparison consumes — is the exact
    value-domain error of the selected entries (one conversion per texel).
    Returns (idx [16,TN], err [1,TN])."""
    levels = len(weights)
    unq = _unquant_signed if signed else _unquant_unsigned
    u0 = [unq(q0[c], bits) for c in range(3)]
    u1 = [unq(q1[c], bits) for c in range(3)]
    # w=0 / w=64 palette entries are just finalize(u): (u*64+32)>>6 == u.
    lof = [_finalize(u0[c], signed).astype(jnp.float32) for c in range(3)]
    hif = [_finalize(u1[c], signed).astype(jnp.float32) for c in range(3)]
    dd = [hif[c] - lof[c] for c in range(3)]
    denom = sum(d * d for d in dd) + 1e-6
    t = jnp.clip(
        sum((px[c] - lof[c]) * dd[c] for c in range(3)) / denom, 0.0, 1.0
    )
    k = jnp.clip(jnp.round(t * (levels - 1)), 0, levels - 1).astype(jnp.int32)
    best_i = None
    best_e = None
    for dk in (-1, 0, 1):
        kk = jnp.clip(k + dk, 0, levels - 1)
        w = _w64_dyn(kk, levels)
        e = jnp.zeros_like(px[0])
        for c in range(3):
            interp = (u0[c] * (64 - w) + u1[c] * w + 32) >> 6
            dec = _finalize(interp, signed).astype(jnp.float32)
            e = e + ((px[c] - dec) * pxs[c]) ** 2
        if best_i is None:
            best_i, best_e = kk, e
        else:
            take = e < best_e
            best_i = jnp.where(take, kk, best_i)
            best_e = jnp.minimum(e, best_e)
    # exact selection-domain error of the chosen entries (value domain,
    # or raw code domain under metric="code")
    w = _w64_dyn(best_i, levels)
    ev = jnp.zeros_like(px[0])
    for c in range(3):
        interp = (u0[c] * (64 - w) + u1[c] * w + 32) >> 6
        dec = _finalize(interp, signed).astype(jnp.float32)
        if not code:
            dec = _proxy_to_value(dec)
        ev = ev + (pxv[c] - dec) ** 2
    if mask is not None:
        ev = ev * mask
    return best_i, _rt(ev)


def _pca_seed(px, mask):
    cnt = _rt(mask) + 1e-6
    mean = [_rt(px[c] * mask) / cnt for c in range(3)]
    cent = [(px[c] - mean[c]) * mask for c in range(3)]
    cov = [[_rt(cent[c] * cent[d]) for d in range(3)] for c in range(3)]
    v = [jnp.ones_like(mean[0]) for _ in range(3)]
    for _ in range(3):
        nv = [sum(cov[c][d] * v[d] for d in range(3)) for c in range(3)]
        nn = jnp.sqrt(sum(x * x for x in nv))
        v = [jnp.where(nn > 1e-10, nv[c] / (nn + 1e-20), v[c]) for c in range(3)]
    t = sum(cent[c] * v[c] for c in range(3))
    tmax = jnp.max(jnp.where(mask > 0, t, -1e30), axis=0, keepdims=True)
    tmin = jnp.min(jnp.where(mask > 0, t, 1e30), axis=0, keepdims=True)
    hi = [mean[c] + v[c] * tmax for c in range(3)]
    lo = [mean[c] + v[c] * tmin for c in range(3)]
    return hi, lo


def _ls(px, w, mask):
    wv = w * mask
    uv = (1.0 - w) * mask
    a11 = _rt(wv * w)
    a12 = _rt(wv * (1.0 - w))
    a22 = _rt(uv * (1.0 - w))
    b1 = [_rt(wv * px[c]) for c in range(3)]
    b0 = [_rt(uv * px[c]) for c in range(3)]
    det = a11 * a22 - a12 * a12
    ok = jnp.abs(det) > 1e-6
    safe = jnp.where(ok, det, 1.0)
    cnt = _rt(mask) + 1e-6
    mean = [_rt(px[c] * mask) / cnt for c in range(3)]
    e1 = [
        jnp.where(ok, (a22 * b1[c] - a12 * b0[c]) / safe, mean[c])
        for c in range(3)
    ]
    e0 = [
        jnp.where(ok, (a11 * b0[c] - a12 * b1[c]) / safe, mean[c])
        for c in range(3)
    ]
    return e1, e0


# ---------------------------------------------------------------------------
# One-region modes 11 / 12
# ---------------------------------------------------------------------------


def _fit_mode(px, pxv, pxs, bits: int, signed: bool, iters: int,
              delta_bits: int = 0, code=False):
    ones = jnp.ones_like(px[0])
    w4f = [float(w) / 64.0 for w in WEIGHTS4]

    def candidate(e0, e1):
        q0 = _quant_candidates(e0, bits, signed)
        q1 = _quant_candidates(e1, bits, signed)
        if delta_bits:
            half = 1 << (delta_bits - 1)
            q1 = [
                q0[c] + jnp.clip(q1[c] - q0[c], -half, half - 1)
                for c in range(3)
            ]
        idx, err = _assign_full(
            px, pxv, pxs, q0, q1, bits, signed, WEIGHTS4, code=code
        )
        return q0, q1, idx, err

    hi, lo = _pca_seed(px, ones)
    best = candidate(hi, lo)
    for _ in range(iters):
        idx = best[2]
        w = jnp.zeros_like(px[0])
        for k in range(16):
            w = jnp.where(idx == k, w4f[k], w)
        e1f, e0f = _ls(px, w, ones)
        cand = candidate(e0f, e1f)
        take = cand[3] < best[3]
        best = (
            _sel(take, cand[0], best[0]),
            _sel(take, cand[1], best[1]),
            jnp.where(take, cand[2], best[2]),
            jnp.where(take, cand[3], best[3]),
        )
    return best


def _anchor_swap(q0, q1, idx):
    a = idx[0:1, :]
    swap = a >= 8
    q0n = _sel(swap, q1, q0)
    q1n = _sel(swap, q0, q1)
    idx = jnp.where(swap, 15 - idx, idx)
    return q0n, q1n, idx


def _pack_indices4(pk, idx):
    """16 4-bit indices, anchor (texel 0) stores 3 bits."""
    pk.put(idx[0:1, :], 3)
    for i in range(1, 16):
        pk.put(idx[i : i + 1, :], 4)


def _pack_mode11(q0, q1, idx, signed):
    q0, q1, idx = _anchor_swap(q0, q1, idx)
    pk = _Packer(q0[0].shape)
    pk.put(jnp.full_like(q0[0], 0x03), 5)
    for c in range(3):
        pk.put(q0[c], 10)
    for c in range(3):
        pk.put(q1[c], 10)
    _pack_indices4(pk, idx)
    return pk.words


def _pack_mode12(q0, q1, idx, signed):
    q0, q1, idx = _anchor_swap(q0, q1, idx)
    d = [jnp.clip(q1[c] - q0[c], -256, 255) for c in range(3)]
    pk = _Packer(q0[0].shape)
    pk.put(jnp.full_like(q0[0], 0x07), 5)
    for c in range(3):
        pk.put(q0[c], 10)
    for c in range(3):
        pk.put(d[c], 9)
        pk.put((q0[c] >> 10) & 1, 1)
    _pack_indices4(pk, idx)
    return pk.words


# ---------------------------------------------------------------------------
# Two-region modes
# ---------------------------------------------------------------------------


def _screen2(px, part32, k: int = 1):
    """Top-k of the 32 BPTC partitions by within-cluster SSE (MXU);
    returns a list of k id-maps [1,TN], best first."""
    ns = jnp.sum(part32, axis=1, keepdims=True)  # [32,1]
    s1 = [_mm(part32, px[c]) for c in range(3)]  # [32,TN]
    sq_all = _rt(sum(px[c] * px[c] for c in range(3)))
    s_all = [_rt(px[c]) for c in range(3)]
    n1 = ns + 1e-6
    n0 = (16.0 - ns) + 1e-6
    explained = sum(s1[c] * s1[c] for c in range(3)) / n1 + sum(
        (s_all[c] - s1[c]) * (s_all[c] - s1[c]) for c in range(3)
    ) / n0
    sse = sq_all - explained
    iota = jax.lax.broadcasted_iota(jnp.int32, sse.shape, 0)
    ds = []
    work = sse
    for _ in range(max(1, k)):
        smin = jnp.min(work, axis=0, keepdims=True)
        d = jnp.min(jnp.where(work == smin, iota, 32), axis=0, keepdims=True)
        ds.append(d)
        work = jnp.where(iota == d, jnp.float32(3.0e38), work)
    return ds


def _fit_regions_float(px, pxs, masks, anchor_oh, iters: int):
    """Shared float endpoint fit per region (mirrors bc6h.py).

    Keep-best guarded by continuous assign-SSE: the clipped-weight
    alternating LS can oscillate on noise content, so deeper refinement
    (higher quality) must never return worse endpoints."""
    e0s, e1s = [], []
    for m in masks:
        hi, lo = _pca_seed(px, m)
        e0s.append(lo)
        e1s.append(hi)

    def _texel_w(e0s, e1s):
        e0t = [e0s[0][c] * masks[0] + e0s[1][c] * masks[1] for c in range(3)]
        e1t = [e1s[0][c] * masks[0] + e1s[1][c] * masks[1] for c in range(3)]
        dd = [e1t[c] - e0t[c] for c in range(3)]
        denom = sum(d * d for d in dd) + 1e-6
        w = jnp.clip(
            sum((px[c] - e0t[c]) * dd[c] for c in range(3)) / denom, 0.0, 1.0
        )
        return w, e0t, dd

    def _cont_sse(w, e0t, dd):
        return _rt(
            sum(
                ((e0t[c] + w * dd[c] - px[c]) * pxs[c]) ** 2 for c in range(3)
            )
        )  # [1,B]

    w, e0t, dd = _texel_w(e0s, e1s)
    best_e0 = [[e0s[p][c] for c in range(3)] for p in range(2)]
    best_e1 = [[e1s[p][c] for c in range(3)] for p in range(2)]
    best_sse = _cont_sse(w, e0t, dd)

    for _ in range(max(0, iters - 1)):
        for p in range(2):
            e1n, e0n = _ls(px, w, masks[p])
            e0s[p], e1s[p] = e0n, e1n
        w, e0t, dd = _texel_w(e0s, e1s)
        sse = _cont_sse(w, e0t, dd)
        take = sse < best_sse
        for p in range(2):
            for c in range(3):
                best_e0[p][c] = jnp.where(take, e0s[p][c], best_e0[p][c])
                best_e1[p][c] = jnp.where(take, e1s[p][c], best_e1[p][c])
        best_sse = jnp.minimum(sse, best_sse)
    e0s, e1s = best_e0, best_e1
    # orient: anchor texel nearer e0
    out0, out1 = [], []
    for p in range(2):
        if p == 0:
            a_t = [px[c][0:1, :] for c in range(3)]
        else:
            a_t = [_rt(px[c] * anchor_oh) for c in range(3)]
        d0 = sum((a_t[c] - e0s[p][c]) ** 2 for c in range(3))
        d1 = sum((a_t[c] - e1s[p][c]) ** 2 for c in range(3))
        flip = d1 < d0
        out0.append(_sel(flip, e1s[p], e0s[p]))
        out1.append(_sel(flip, e0s[p], e1s[p]))
    return out0, out1, best_sse


def _fit_two_region(px, pxv, pxs, masks, anchor_oh, e0, e1, mode_id, signed,
                    code=False):
    _, _, epbits, dbits, direct = TWO_REGION_MODES[mode_id]
    q0 = [_quant_candidates(e0[p], epbits, signed) for p in range(2)]
    q1 = [_quant_candidates(e1[p], epbits, signed) for p in range(2)]
    rw = q0[0]
    fields = {"rw": rw}
    effs = []
    for name, val in (("rx", q1[0]), ("ry", q0[1]), ("rz", q1[1])):
        if direct:
            fields[name] = val
            effs.append(val)
        else:
            dlt = [
                jnp.clip(
                    val[c] - rw[c],
                    -(1 << (dbits[c] - 1)),
                    (1 << (dbits[c] - 1)) - 1,
                )
                for c in range(3)
            ]
            fields[name] = dlt
            effs.append([rw[c] + dlt[c] for c in range(3)])
    v01, v10, v11 = effs

    # Per-texel endpoint line via the region masks, then the projection
    # + 3-candidate assign (replaces two full 8-weight palette sweeps).
    unq = _unquant_signed if signed else _unquant_unsigned
    sel1 = masks[1] > 0.5
    u0t = [
        jnp.where(sel1, unq(v10[c], epbits), unq(rw[c], epbits))
        for c in range(3)
    ]
    u1t = [
        jnp.where(sel1, unq(v11[c], epbits), unq(v01[c], epbits))
        for c in range(3)
    ]
    lof = [_finalize(u0t[c], signed).astype(jnp.float32) for c in range(3)]
    hif = [_finalize(u1t[c], signed).astype(jnp.float32) for c in range(3)]
    dd = [hif[c] - lof[c] for c in range(3)]
    denom = sum(d * d for d in dd) + 1e-6
    t = jnp.clip(
        sum((px[c] - lof[c]) * dd[c] for c in range(3)) / denom, 0.0, 1.0
    )
    k0 = jnp.clip(jnp.round(t * 7.0), 0, 7).astype(jnp.int32)

    def eval_at(kk):
        w = _w64_dyn(kk, 8)
        e = jnp.zeros_like(px[0])
        for c in range(3):
            interp = (u0t[c] * (64 - w) + u1t[c] * w + 32) >> 6
            dec = _finalize(interp, signed).astype(jnp.float32)
            e = e + ((px[c] - dec) * pxs[c]) ** 2
        return e

    best_i = None
    best_e = None
    for dk in (-1, 0, 1):
        kk = jnp.clip(k0 + dk, 0, 7)
        e = eval_at(kk)
        if best_i is None:
            best_i, best_e = kk, e
        else:
            take = e < best_e
            best_i = jnp.where(take, kk, best_i)
            best_e = jnp.minimum(e, best_e)
    # Anchor texels clamp their 3-bit index to the 2-bit range; the final
    # error is the exact value-domain error of the POST-clamp indices.
    is_anchor = (_iota16(px[0].shape) == 0) | (anchor_oh > 0.5)
    idx = jnp.where(is_anchor, jnp.minimum(best_i, 3), best_i)
    w = _w64_dyn(idx, 8)
    ev = jnp.zeros_like(px[0])
    for c in range(3):
        interp = (u0t[c] * (64 - w) + u1t[c] * w + 32) >> 6
        dec = _finalize(interp, signed).astype(jnp.float32)
        if not code:
            dec = _proxy_to_value(dec)
        ev = ev + (pxv[c] - dec) ** 2
    return fields, idx, _rt(ev)


def _pack_two_region(mode_id, fields, d, idx, anchor1):
    mv, _, _, _, _ = TWO_REGION_MODES[mode_id]
    words = [jnp.zeros_like(d).astype(_U32) for _ in range(4)]
    words[0] = words[0] | _U32(mv)
    for block_bit, field, field_bit, ch in TWO_REGION_LAYOUT[mode_id]:
        bit = (fields[field][ch].astype(_U32) >> _U32(field_bit)) & _U32(1)
        w, bo = divmod(block_bit, 32)
        words[w] = words[w] | (bit << _U32(bo))
    dv = d.astype(_U32)
    for i in range(5):
        w, bo = divmod(77 + i, 32)
        words[w] = words[w] | (((dv >> _U32(i)) & _U32(1)) << _U32(bo))
    # indices: 3-bit, anchors (texel 0 and anchor1) 2-bit
    pk = _Packer(d.shape)
    pk.words = words
    iota = _iota16(idx.shape)
    bits = (
        3
        - (iota == 0).astype(jnp.int32)
        - (iota == anchor1).astype(jnp.int32)
    )
    pos = jnp.full_like(d, 82, dtype=jnp.int32)
    for i in range(16):
        pk.put_dynamic(idx[i : i + 1, :], pos, 3)
        pos = pos + bits[i : i + 1, :]
    return pk.words


# ---------------------------------------------------------------------------
# Kernel + wrapper
# ---------------------------------------------------------------------------


def _kernel(x_ref, part32_ref, part32t_ref, anchors_ref, out_ref, *, quality,
            signed, metric="value"):
    px = [x_ref[c] for c in range(3)]
    if metric == "code":
        pxv = px
        pxs = [jnp.ones_like(px[c]) for c in range(3)]
    else:
        pxv = [_proxy_to_value(px[c]) for c in range(3)]
        pxs = [_proxy_scale(px[c]) for c in range(3)]
    iters = _BC6H_ITERS[quality]

    code = metric == "code"
    q0, q1, idx, best_err = _fit_mode(
        px, pxv, pxs, 10, signed, iters, code=code
    )
    words = _pack_mode11(q0, q1, idx, signed)

    if quality >= 2:
        q0b, q1b, idxb, err12 = _fit_mode(
            px, pxv, pxs, 11, signed, iters, delta_bits=9, code=code
        )
        w12 = _pack_mode12(q0b, q1b, idxb, signed)
        take = err12 < best_err
        words = [jnp.where(take, a, b) for a, b in zip(w12, words)]
        best_err = jnp.minimum(best_err, err12)

    mode_ids = _TWO_REGION_PLAN[quality]
    if mode_ids:
        part32 = part32_ref[:]
        k2 = _PART_SEEDS[quality]

        def _geometry(dk):
            ohk = (
                jax.lax.broadcasted_iota(
                    jnp.int32, (32, dk.shape[1]), 0
                ) == dk
            ).astype(jnp.float32)
            m1k = _mm(part32t_ref[:], ohk)  # [16,TN]
            anchor1k = jnp.sum(
                anchors_ref[:] * ohk, axis=0, keepdims=True
            ).astype(jnp.int32)
            anchor_ohk = (
                _iota16(m1k.shape) == anchor1k
            ).astype(jnp.float32)
            return m1k, anchor1k, anchor_ohk

        # Estimate-then-refine over the top-k cluster-SSE partitions:
        # rank candidates by a SHALLOW (2-iter) continuous line-fit SSE,
        # deep-fit only the per-block winner (mirrors kernels/bc6h.py;
        # the thorough-class CPU bar showed argmin-1 misranks noise
        # content by ~0.6 dB).
        cands = _screen2(px, part32, k2)
        d = cands[0]
        cand_ds = [d]
        if k2 > 1:
            # rank winner PLUS the cluster-SSE argmin (lower qualities'
            # only candidate) so the quality ladder stays monotone when
            # the continuous rank mis-chooses (see kernels/bc6h.py).
            dwin = d
            fit_sse = None
            for dk in cands:
                m1k, _, anchor_ohk = _geometry(dk)
                _, _, ssek = _fit_regions_float(
                    px, pxs, (1.0 - m1k, m1k), anchor_ohk, 2
                )
                if fit_sse is None:
                    fit_sse = ssek
                else:
                    take = ssek < fit_sse
                    dwin = jnp.where(take, dk, dwin)
                    fit_sse = jnp.minimum(fit_sse, ssek)
            cand_ds = [dwin, d]
        for gi, dk in enumerate(cand_ds):
            # argmin geometry covers only the lower qualities' mode set
            # (ladder monotonicity); see kernels/bc6h.py.
            gmodes = mode_ids if gi == 0 else _TWO_REGION_PLAN[2]
            m1, anchor1, anchor_oh = _geometry(dk)
            masks = (1.0 - m1, m1)
            e0, e1, _ = _fit_regions_float(
                px, pxs, masks, anchor_oh, iters
            )
            for mode_id in gmodes:
                fields, idx2, err2 = _fit_two_region(
                    px, pxv, pxs, masks, anchor_oh, e0, e1, mode_id,
                    signed, code=code,
                )
                w2 = _pack_two_region(mode_id, fields, dk, idx2, anchor1)
                take = err2 < best_err
                words = [jnp.where(take, a, b) for a, b in zip(w2, words)]
                best_err = jnp.minimum(best_err, err2)

    for w in range(4):
        out_ref[w : w + 1, :] = words[w]


@functools.partial(
    jax.jit, static_argnames=("quality", "signed", "interpret", "metric")
)
def encode_bc6h_pallas(
    blocks: jnp.ndarray,
    quality: int = 2,
    signed: bool = False,
    interpret: bool = False,
    metric: str = "value",
) -> jnp.ndarray:
    """Encode [N,16,3] float RGB (HDR) -> BC6H [N,4] uint32 words.

    metric: see kernels/bc6h.py:encode_bc6h ("value" linear-domain
    selection, "code" half-bit/log-domain selection)."""
    quality = max(0, min(4, int(quality)))
    proxy = _to_proxy(blocks[..., :3].astype(jnp.float32), signed)
    n = proxy.shape[0]
    tn = TN if n >= TN else -(-n // 128) * 128
    npad = -(-n // tn) * tn
    x = jnp.pad(proxy, ((0, npad - n), (0, 0), (0, 0)))
    x = jnp.transpose(x, (2, 1, 0))  # [3,16,Np]

    part32 = jnp.asarray(PARTITION2[:32].astype(np.float32))
    anchors = jnp.asarray(ANCHOR2[:32, None].astype(np.float32))

    words = pl.pallas_call(
        functools.partial(
            _kernel, quality=quality, signed=signed, metric=str(metric)
        ),
        grid=(npad // tn,),
        in_specs=[
            pl.BlockSpec(
                (3, 16, tn), lambda i: (0, 0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((32, 16), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, 32), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((32, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (4, tn), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((4, npad), jnp.uint32),
        interpret=interpret,
    )(x, part32, jnp.transpose(part32), anchors)
    return jnp.transpose(words)[:n]
