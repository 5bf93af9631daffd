"""BC1-BC5 block encoders as Pallas TPU kernels.

Same blocks-on-lanes layout as kernels/bc7_pallas.py: texels on sublanes
([16,TN] tiles), channels unrolled, the whole candidate sweep VMEM-resident
per grid step.  The algorithms mirror kernels/bc.py exactly (same seeds,
least-squares refinement, mode trials and fixups, same float decode model),
so outputs are bit-identical to the jnp path in the common case; tests
assert decode parity.

Replaces the rgbcx/libsquish/Compressonator roles of the reference
(`/root/reference/lib/src/S3tcConverter.cpp:257-490`) on the TPU hot path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TN = 1024

_U32 = jnp.uint32

_BC1_4C_W = (1.0, 0.0, 2.0 / 3.0, 1.0 / 3.0)
_BC1_3C_W = (1.0, 0.0, 0.5, 0.0)
_BC4_8V_W = (1.0, 0.0, 6 / 7, 5 / 7, 4 / 7, 3 / 7, 2 / 7, 1 / 7)
_BC4_6V_W = (1.0, 0.0, 4 / 5, 3 / 5, 2 / 5, 1 / 5)

_LS_ITERS = (1, 2, 3, 6, 10)


def _rt(x):
    return jnp.sum(x, axis=0, keepdims=True)


def _sel(take, a, b):
    if isinstance(a, (list, tuple)):
        return [jnp.where(take, x, y) for x, y in zip(a, b)]
    return jnp.where(take, a, b)


def _wtable(idx, table):
    """Arithmetic table lookup: idx [16,TN] int -> float weights."""
    out = jnp.full_like(idx, table[-1], dtype=jnp.float32)
    for k in range(len(table) - 2, -1, -1):
        out = jnp.where(idx == k, table[k], out)
    return out


def _pca_seed3(px, mask):
    """(hi, lo) channel lists [1,TN] via principal-axis extremes.

    Mirrors _project_endpoints/_principal_axis in kernels/bc.py
    (6 power iterations, first-max residual seed)."""
    cnt = _rt(mask) + 1e-12
    mean = [_rt(px[c] * mask) / cnt for c in range(3)]
    cent = [(px[c] - mean[c]) * mask for c in range(3)]
    cov = [[_rt(cent[c] * cent[d]) for d in range(3)] for c in range(3)]
    norms = sum(cent[c] * cent[c] for c in range(3))
    mx = jnp.max(norms, axis=0, keepdims=True)
    iota = jax.lax.broadcasted_iota(jnp.int32, norms.shape, 0)
    fidx = jnp.min(jnp.where(norms == mx, iota, 16), axis=0, keepdims=True)
    first = (iota == fidx).astype(jnp.float32)
    start = [_rt(cent[c] * first) for c in range(3)]
    n0 = jnp.sqrt(sum(s * s for s in start))
    v = [
        jnp.where(n0 > 1e-10, s / (n0 + 1e-20), jnp.ones_like(s))
        for s in start
    ]
    for _ in range(6):
        nv = [sum(cov[c][d] * v[d] for d in range(3)) for c in range(3)]
        nn = jnp.sqrt(sum(x * x for x in nv))
        v = [
            jnp.where(nn > 1e-10, nv[c] / (nn + 1e-20), v[c]) for c in range(3)
        ]
    t = sum(cent[c] * v[c] for c in range(3))
    tmax = jnp.max(t, axis=0, keepdims=True)
    tmin = jnp.min(t, axis=0, keepdims=True)
    hi = [mean[c] + v[c] * tmax for c in range(3)]
    lo = [mean[c] + v[c] * tmin for c in range(3)]
    return hi, lo


def _ls1(vals, w, pv):
    """LS endpoints for weights w (w=1 -> e0).  vals [16,TN] -> [1,TN] pair."""
    wv = w * pv
    uv = (1.0 - w) * pv
    a11 = _rt(wv * w)
    a12 = _rt(wv * (1.0 - w))
    a22 = _rt(uv * (1.0 - w))
    b0 = _rt(wv * vals)
    b1 = _rt(uv * vals)
    det = a11 * a22 - a12 * a12
    ok = jnp.abs(det) > 1e-8
    safe = jnp.where(ok, det, 1.0)
    mean = _rt(vals * pv) / (_rt(pv) + 1e-12)
    e0 = jnp.where(ok, (a22 * b0 - a12 * b1) / safe, mean)
    e1 = jnp.where(ok, (a11 * b1 - a12 * b0) / safe, mean)
    return e0, e1


def _ls3(px, w, pv):
    wv = w * pv
    uv = (1.0 - w) * pv
    a11 = _rt(wv * w)
    a12 = _rt(wv * (1.0 - w))
    a22 = _rt(uv * (1.0 - w))
    det = a11 * a22 - a12 * a12
    ok = jnp.abs(det) > 1e-8
    safe = jnp.where(ok, det, 1.0)
    cnt = _rt(pv) + 1e-12
    e0, e1 = [], []
    for c in range(3):
        b0 = _rt(wv * px[c])
        b1 = _rt(uv * px[c])
        mean = _rt(px[c] * pv) / cnt
        e0.append(jnp.where(ok, (a22 * b0 - a12 * b1) / safe, mean))
        e1.append(jnp.where(ok, (a11 * b1 - a12 * b0) / safe, mean))
    return e0, e1


# ---------------------------------------------------------------------------
# BC1 tile
# ---------------------------------------------------------------------------


def _quant565(e):
    r = jnp.round(jnp.clip(e[0], 0.0, 1.0) * 31.0).astype(jnp.int32)
    g = jnp.round(jnp.clip(e[1], 0.0, 1.0) * 63.0).astype(jnp.int32)
    b = jnp.round(jnp.clip(e[2], 0.0, 1.0) * 31.0).astype(jnp.int32)
    c16 = (r << 11) | (g << 5) | b
    dec = [
        ((r << 3) | (r >> 2)).astype(jnp.float32) * (1.0 / 255.0),
        ((g << 2) | (g >> 4)).astype(jnp.float32) * (1.0 / 255.0),
        ((b << 3) | (b >> 2)).astype(jnp.float32) * (1.0 / 255.0),
    ]
    return c16, dec


def _bc1_assign(px, d0, d1, weights, chw, black=False, pv=None):
    """Unrolled nearest-palette assignment.  Returns (idx, block err)."""
    best_i = None
    best_e = None
    entries = list(weights) + ([None] if black else [])
    for k, w in enumerate(entries):
        if w is None:
            e = sum(chw[c] * px[c] * px[c] for c in range(3))
        else:
            e = sum(
                chw[c] * (px[c] - (w * d0[c] + (1.0 - w) * d1[c])) ** 2
                for c in range(3)
            )
        ki = jnp.full_like(px[0], k, dtype=jnp.int32)
        if best_e is None:
            best_i, best_e = ki, e
        else:
            take = e < best_e
            best_i = jnp.where(take, ki, best_i)
            best_e = jnp.minimum(e, best_e)
    if pv is not None:
        best_e = best_e * pv
    return best_i, _rt(best_e)


def _bc1_tile(px, amask, iters, chw, punch_through, allow_black, quality):
    """px: [r,g,b] [16,TN] 0..1; amask [16,TN] (1 = opaque).

    Returns (c0, c1, idx) — [1,TN] int32 x2 and [16,TN] int32."""
    ones = jnp.ones_like(px[0])
    hi, lo = _pca_seed3(px, ones)

    def cand4(e0, e1):
        c0, d0 = _quant565(e0)
        c1, d1 = _quant565(e1)
        idx, err = _bc1_assign(px, d0, d1, _BC1_4C_W, chw)
        return c0, c1, idx, err

    best4 = cand4(hi, lo)
    for _ in range(iters):
        w = _wtable(best4[2], _BC1_4C_W)
        e0, e1 = _ls3(px, w, ones)
        cand = cand4(e0, e1)
        take = cand[3] < best4[3]
        best4 = tuple(_sel(take, c, b) for c, b in zip(cand, best4))
    if quality >= 2:
        # Per-channel +-1 quant-lattice sweep on both 565 endpoints
        # (mirror of kernels/bc.py:_bc1_neighborhood_4c, bit-identical).
        def dq565(c16):
            r = (c16 >> 11) & 31
            g = (c16 >> 5) & 63
            b = c16 & 31
            return [
                ((r << 3) | (r >> 2)).astype(jnp.float32) * (1.0 / 255.0),
                ((g << 2) | (g >> 4)).astype(jnp.float32) * (1.0 / 255.0),
                ((b << 3) | (b >> 2)).astype(jnp.float32) * (1.0 / 255.0),
            ]

        for _ in range(2):
            base0, base1 = best4[0], best4[1]
            for shift, maxv in ((11, 31), (5, 63), (0, 31)):
                for d0 in (-1, 0, 1):
                    for d1 in (-1, 0, 1):
                        if d0 == 0 and d1 == 0:
                            continue
                        f0 = jnp.clip(
                            ((base0 >> shift) & maxv) + d0, 0, maxv
                        )
                        f1 = jnp.clip(
                            ((base1 >> shift) & maxv) + d1, 0, maxv
                        )
                        c0n = (base0 & ~(maxv << shift)) | (f0 << shift)
                        c1n = (base1 & ~(maxv << shift)) | (f1 << shift)
                        idx, err = _bc1_assign(
                            px, dq565(c0n), dq565(c1n), _BC1_4C_W, chw
                        )
                        take = err < best4[3]
                        best4 = tuple(
                            _sel(take, c, b)
                            for c, b in zip((c0n, c1n, idx, err), best4)
                        )
    c0_4, c1_4, idx_4, err_4 = best4

    swap = c0_4 < c1_4
    c0o = jnp.where(swap, c1_4, c0_4)
    c1o = jnp.where(swap, c0_4, c1_4)
    idx_4o = jnp.where(swap, idx_4 ^ 1, idx_4)
    idx_4o = jnp.where(c0o == c1o, 0, idx_4o)

    use3 = punch_through or (allow_black and quality >= 2)
    if not use3:
        return c0o, c1o, idx_4o

    def cand3(e0, e1):
        c0, d0 = _quant565(e0)
        c1, d1 = _quant565(e1)
        if not punch_through:
            idx, err = _bc1_assign(
                px, d0, d1, _BC1_3C_W[:3], chw, black=True
            )
        else:
            idx, err = _bc1_assign(px, d0, d1, _BC1_3C_W[:3], chw, pv=amask)
            idx = jnp.where(amask < 0.5, 3, idx)
        return c0, c1, idx, err

    best3 = cand3(hi, lo)
    for _ in range(iters):
        w = _wtable(best3[2], _BC1_3C_W)
        pv = amask * (best3[2] != 3).astype(jnp.float32)
        e0, e1 = _ls3(px, w, pv)
        cand = cand3(e0, e1)
        take = cand[3] < best3[3]
        best3 = tuple(_sel(take, c, b) for c, b in zip(cand, best3))
    c0_3, c1_3, idx_3, err_3 = best3

    swap3 = c0_3 > c1_3
    c0_3o = jnp.where(swap3, c1_3, c0_3)
    c1_3o = jnp.where(swap3, c0_3, c1_3)
    idx_3o = jnp.where(swap3 & (idx_3 < 2), idx_3 ^ 1, idx_3)

    if punch_through:
        has_alpha = jnp.max((amask < 0.5).astype(jnp.int32), 0, keepdims=True)
        pick3 = (has_alpha > 0) | (err_3 < err_4)
    else:
        pick3 = err_3 < err_4
    c0 = jnp.where(pick3, c0_3o, c0o)
    c1 = jnp.where(pick3, c1_3o, c1o)
    idx = jnp.where(pick3, idx_3o, idx_4o)
    return c0, c1, idx


def _bc1_words(c0, c1, idx):
    w0 = c0.astype(_U32) | (c1.astype(_U32) << _U32(16))
    w1 = jnp.zeros_like(w0)
    for i in range(16):
        w1 = w1 | (idx[i : i + 1, :].astype(_U32) << _U32(2 * i))
    return w0, w1


# ---------------------------------------------------------------------------
# BC4 tile
# ---------------------------------------------------------------------------


def _quant_bc4(e, signed):
    if signed:
        q = jnp.round(jnp.clip(e, -1.0, 1.0) * 127.0).astype(jnp.int32)
        return q & 0xFF, q.astype(jnp.float32) * (1.0 / 127.0)
    q = jnp.round(jnp.clip(e, 0.0, 1.0) * 255.0).astype(jnp.int32)
    return q, q.astype(jnp.float32) * (1.0 / 255.0)


def _bc4_assign(vals, d0, d1, weights, extremes=None):
    best_i = None
    best_e = None
    for k, w in enumerate(weights):
        pal = w * d0 + (1.0 - w) * d1
        e = (vals - pal) ** 2
        ki = jnp.full_like(vals, k, dtype=jnp.int32)
        if best_e is None:
            best_i, best_e = ki, e
        else:
            take = e < best_e
            best_i = jnp.where(take, ki, best_i)
            best_e = jnp.minimum(e, best_e)
    if extremes is not None:
        for j, ext in enumerate(extremes):
            e = (vals - ext) ** 2 - 1e-12
            ki = jnp.full_like(vals, len(weights) + j, dtype=jnp.int32)
            take = e < best_e
            best_i = jnp.where(take, ki, best_i)
            best_e = jnp.minimum(e, best_e)
    return best_i, _rt(jnp.clip(best_e, 0.0, None))


def _bc4_tile(vals, iters, signed, quality):
    """vals [16,TN] -> (q0, q1 [1,TN] int32, idx [16,TN] int32)."""
    ones = jnp.ones_like(vals)
    lo_ext, hi_ext = (-1.0, 1.0) if signed else (0.0, 1.0)
    hi = jnp.max(vals, axis=0, keepdims=True)
    lo = jnp.min(vals, axis=0, keepdims=True)

    def cand8(e0, e1):
        q0, d0 = _quant_bc4(e0, signed)
        q1, d1 = _quant_bc4(e1, signed)
        idx, err = _bc4_assign(vals, d0, d1, _BC4_8V_W)
        return q0, q1, d0, d1, idx, err

    best8 = cand8(hi, lo)
    for _ in range(iters):
        w = _wtable(best8[4], _BC4_8V_W)
        e0, e1 = _ls1(vals, w, ones)
        cand = cand8(e0, e1)
        take = cand[5] < best8[5]
        best8 = tuple(_sel(take, c, b) for c, b in zip(cand, best8))
    q0_8, q1_8, d0_8, d1_8, idx_8, err_8 = best8

    swap = d0_8 < d1_8
    q0o = jnp.where(swap, q1_8, q0_8)
    q1o = jnp.where(swap, q0_8, q1_8)
    idx_8o = jnp.where(
        swap, jnp.where(idx_8 < 2, idx_8 ^ 1, 9 - idx_8), idx_8
    )
    idx_8o = jnp.where(q0o == q1o, 0, idx_8o)
    if quality < 2:
        return q0o, q1o, idx_8o

    def cand6(e0, e1):
        q0, d0 = _quant_bc4(e0, signed)
        q1, d1 = _quant_bc4(e1, signed)
        idx, err = _bc4_assign(
            vals, d0, d1, _BC4_6V_W, extremes=(lo_ext, hi_ext)
        )
        return q0, q1, d0, d1, idx, err

    tol = 1.0 / 255.0
    interior = (vals > lo_ext + tol) & (vals < hi_ext - tol)
    hi_i = jnp.max(jnp.where(interior, vals, -1e30), axis=0, keepdims=True)
    lo_i = jnp.min(jnp.where(interior, vals, 1e30), axis=0, keepdims=True)
    hi_s = jnp.where(hi_i > -1e29, hi_i, hi)
    lo_s = jnp.where(lo_i < 1e29, lo_i, lo)
    best6 = cand6(hi_s, lo_s)
    w6 = _BC4_6V_W + (0.0, 0.0)
    for _ in range(iters):
        w = _wtable(best6[4], w6)
        pv = (best6[4] < 6).astype(jnp.float32)
        e0, e1 = _ls1(vals, w, pv)
        cand = cand6(e0, e1)
        take = cand[5] < best6[5]
        best6 = tuple(_sel(take, c, b) for c, b in zip(cand, best6))
    q0_6, q1_6, d0_6, d1_6, idx_6, err_6 = best6
    swap6 = d0_6 > d1_6
    q0_6o = jnp.where(swap6, q1_6, q0_6)
    q1_6o = jnp.where(swap6, q0_6, q1_6)
    idx_6o = jnp.where(
        swap6 & (idx_6 < 6),
        jnp.where(idx_6 < 2, idx_6 ^ 1, 7 - idx_6),
        idx_6,
    )
    pick6 = err_6 < err_8
    q0f = jnp.where(pick6, q0_6o, q0o)
    q1f = jnp.where(pick6, q1_6o, q1o)
    idx = jnp.where(pick6, idx_6o, idx_8o)
    return q0f, q1f, idx


def _bc4_words(q0, q1, idx):
    idx = idx.astype(_U32)
    low = (q0.astype(_U32) & _U32(0xFF)) | (
        (q1.astype(_U32) & _U32(0xFF)) << _U32(8)
    )
    for i in range(5):
        low = low | (idx[i : i + 1, :] << _U32(16 + 3 * i))
    low = low | ((idx[5:6, :] & _U32(1)) << _U32(31))
    high = idx[5:6, :] >> _U32(1)
    for i in range(6, 16):
        high = high | (idx[i : i + 1, :] << _U32(3 * i - 16))
    return low, high


# ---------------------------------------------------------------------------
# Kernels + wrappers
# ---------------------------------------------------------------------------


def _pad_transpose(blocks, tn_hint=None):
    n = blocks.shape[0]
    tn = TN if n >= TN else -(-n // 128) * 128
    npad = -(-n // tn) * tn
    x = blocks.astype(jnp.float32)
    x = jnp.pad(x, ((0, npad - n),) + ((0, 0),) * (x.ndim - 1))
    if x.ndim == 3:
        x = jnp.transpose(x, (2, 1, 0))  # [C,16,Np]
    else:
        x = jnp.transpose(x)  # [16,Np]
    return x, n, tn, npad


def _run(kernel, x, n, tn, npad, nwords, nch):
    grid = npad // tn
    if nch:
        in_spec = pl.BlockSpec(
            (nch, 16, tn), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        )
    else:
        in_spec = pl.BlockSpec(
            (16, tn), lambda i: (0, i), memory_space=pltpu.VMEM
        )
    words = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[in_spec],
        out_specs=pl.BlockSpec(
            (nwords, tn), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nwords, npad), jnp.uint32),
        interpret=_interpret(),
    )(x)
    return jnp.transpose(words)[:n]


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(
    jax.jit,
    static_argnames=("quality", "punch_through", "allow_black", "chw"),
)
def encode_bc1_pallas(
    blocks, quality=2, punch_through=False, allow_black=True,
    chw=(1.0, 1.0, 1.0),
):
    iters = _LS_ITERS[max(0, min(4, int(quality)))]

    def kernel(x_ref, out_ref):
        px = [x_ref[c] for c in range(3)]
        amask = (
            (x_ref[3] >= 0.5).astype(jnp.float32)
            if punch_through
            else jnp.ones_like(px[0])
        )
        c0, c1, idx = _bc1_tile(
            px, amask, iters, chw, punch_through, allow_black, int(quality)
        )
        w0, w1 = _bc1_words(c0, c1, idx)
        out_ref[0:1, :] = w0
        out_ref[1:2, :] = w1

    x, n, tn, npad = _pad_transpose(blocks)
    return _run(kernel, x, n, tn, npad, 2, 4)


@functools.partial(jax.jit, static_argnames=("quality", "signed"))
def encode_bc4_pallas(vals, quality=2, signed=False):
    iters = _LS_ITERS[max(0, min(4, int(quality)))]

    def kernel(x_ref, out_ref):
        q0, q1, idx = _bc4_tile(x_ref[:], iters, signed, int(quality))
        w0, w1 = _bc4_words(q0, q1, idx)
        out_ref[0:1, :] = w0
        out_ref[1:2, :] = w1

    x, n, tn, npad = _pad_transpose(vals)
    return _run(kernel, x, n, tn, npad, 2, 0)


@functools.partial(jax.jit, static_argnames=("quality", "chw"))
def encode_bc2_pallas(blocks, quality=2, chw=(1.0, 1.0, 1.0)):
    iters = _LS_ITERS[max(0, min(4, int(quality)))]

    def kernel(x_ref, out_ref):
        px = [x_ref[c] for c in range(3)]
        a = jnp.round(jnp.clip(x_ref[3], 0.0, 1.0) * 15.0).astype(_U32)
        a0 = jnp.zeros_like(a[0:1, :])
        a1 = jnp.zeros_like(a[0:1, :])
        for i in range(8):
            a0 = a0 | (a[i : i + 1, :] << _U32(4 * i))
            a1 = a1 | (a[i + 8 : i + 9, :] << _U32(4 * i))
        ones = jnp.ones_like(px[0])
        c0, c1, idx = _bc1_tile(
            px, ones, iters, chw, False, False, int(quality)
        )
        w0, w1 = _bc1_words(c0, c1, idx)
        out_ref[0:1, :] = a0
        out_ref[1:2, :] = a1
        out_ref[2:3, :] = w0
        out_ref[3:4, :] = w1

    x, n, tn, npad = _pad_transpose(blocks)
    return _run(kernel, x, n, tn, npad, 4, 4)


@functools.partial(jax.jit, static_argnames=("quality", "chw"))
def encode_bc3_pallas(blocks, quality=2, chw=(1.0, 1.0, 1.0)):
    iters = _LS_ITERS[max(0, min(4, int(quality)))]

    def kernel(x_ref, out_ref):
        px = [x_ref[c] for c in range(3)]
        q0, q1, aidx = _bc4_tile(x_ref[3], iters, False, int(quality))
        aw0, aw1 = _bc4_words(q0, q1, aidx)
        ones = jnp.ones_like(px[0])
        c0, c1, idx = _bc1_tile(
            px, ones, iters, chw, False, False, int(quality)
        )
        w0, w1 = _bc1_words(c0, c1, idx)
        out_ref[0:1, :] = aw0
        out_ref[1:2, :] = aw1
        out_ref[2:3, :] = w0
        out_ref[3:4, :] = w1

    x, n, tn, npad = _pad_transpose(blocks)
    return _run(kernel, x, n, tn, npad, 4, 4)


@functools.partial(jax.jit, static_argnames=("quality", "signed"))
def encode_bc5_pallas(blocks, quality=2, signed=False):
    iters = _LS_ITERS[max(0, min(4, int(quality)))]

    def kernel(x_ref, out_ref):
        r0, r1, ridx = _bc4_tile(x_ref[0], iters, signed, int(quality))
        g0, g1, gidx = _bc4_tile(x_ref[1], iters, signed, int(quality))
        rw0, rw1 = _bc4_words(r0, r1, ridx)
        gw0, gw1 = _bc4_words(g0, g1, gidx)
        out_ref[0:1, :] = rw0
        out_ref[1:2, :] = rw1
        out_ref[2:3, :] = gw0
        out_ref[3:4, :] = gw1

    x, n, tn, npad = _pad_transpose(blocks[..., :2])
    return _run(kernel, x, n, tn, npad, 4, 2)
