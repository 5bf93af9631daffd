"""BC7 block encoder (batched JAX).

TPU-native replacement for bc7e.ispc / bc7enc
(`/root/reference/lib/src/S3tcConverter.cpp:593-646`).  Strategy: fixed-shape
candidate enumeration over all 8 modes with least-squares endpoint
refinement, masked best-candidate reductions instead of the CPU encoders'
data-dependent early-outs (SURVEY.md §7).

Quality ladder (mirrors the reference's ultrafast..slowest table at
`S3tcConverter.cpp:170-227` in role):
  0: mode 6 only
  1: modes 6 + 1 (4 partitions)
  2: modes 6 + 1 (8 partitions) + 5 + 4
  3: modes 6 + 1 (16) + 3 (8) + 0 (8) + 5 + 4
  4: all 8 modes (partition screening depths 32/16/16/16)

All arithmetic matching the decoder runs in the integer 0..255 endpoint
domain; interpolation uses the spec weight tables with (x*(64-w)+y*w+32)>>6.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from cuttlefish_tpu.kernels import bc7_tables as T
from cuttlefish_tpu.kernels.bc import _ls_solve, select_at_max

_PART2 = jnp.asarray(T.PARTITION2)  # [64,16]
_ANCHOR2 = jnp.asarray(T.ANCHOR2)  # [64]
_PART3 = jnp.asarray(T.PARTITION3)  # [64,16] values 0..2
_ANCHOR3_2 = jnp.asarray(T.ANCHOR3_2)
_ANCHOR3_3 = jnp.asarray(T.ANCHOR3_3)
_W2 = jnp.asarray(T.WEIGHTS2)
_W3 = jnp.asarray(T.WEIGHTS3)
_W4 = jnp.asarray(T.WEIGHTS4)


# ---------------------------------------------------------------------------
# Endpoint quantization (targets in the 0..255 float domain)
# ---------------------------------------------------------------------------


def _replicate(v, bits):
    """Bit-replicate a `bits`-wide int to 8 bits."""
    if bits == 8:
        return v
    return (v << (8 - bits)) | (v >> (2 * bits - 8))


def _quant_pbit_each(t, bits, ch_w):
    """Per-endpoint pbit: t [M,C] float -> (v [M,C], p [M], dec [M,C])."""
    maxv = (1 << bits) - 1
    full = (1 << (bits + 1)) - 1
    best = None
    for p in (0, 1):
        v = jnp.clip(jnp.round((t / 255.0 * full - p) / 2.0), 0, maxv).astype(
            jnp.int32
        )
        dec = _replicate((v << 1) | p, bits + 1)
        err = (((t - dec) ** 2) * ch_w).sum(-1)
        cand = (v, jnp.full(err.shape, p, jnp.int32), dec, err)
        if best is None:
            best = cand
        else:
            take = cand[3] < best[3]
            best = tuple(
                jnp.where(take[(...,) + (None,) * (b.ndim - 1)], c, b)
                for c, b in zip(cand, best)
            )
    return best[0], best[1], best[2]


def _quant_pbit_shared(t0, t1, bits, ch_w):
    """Shared pbit across both endpoints: returns (v0, v1, p, d0, d1)."""
    maxv = (1 << bits) - 1
    full = (1 << (bits + 1)) - 1
    best = None
    for p in (0, 1):
        v0 = jnp.clip(jnp.round((t0 / 255.0 * full - p) / 2.0), 0, maxv).astype(
            jnp.int32
        )
        v1 = jnp.clip(jnp.round((t1 / 255.0 * full - p) / 2.0), 0, maxv).astype(
            jnp.int32
        )
        d0 = _replicate((v0 << 1) | p, bits + 1)
        d1 = _replicate((v1 << 1) | p, bits + 1)
        err = (((t0 - d0) ** 2 + (t1 - d1) ** 2) * ch_w).sum(-1)
        cand = (v0, v1, jnp.full(err.shape, p, jnp.int32), d0, d1, err)
        if best is None:
            best = cand
        else:
            take = cand[5] < best[5]
            best = tuple(
                jnp.where(take[(...,) + (None,) * (b.ndim - 1)], c, b)
                for c, b in zip(cand, best)
            )
    return best[:5]


def _quant_plain(t, bits):
    """No pbit: t [M,C] -> (v, dec)."""
    maxv = (1 << bits) - 1
    v = jnp.clip(jnp.round(t / 255.0 * maxv), 0, maxv).astype(jnp.int32)
    return v, _replicate(v, bits)


# ---------------------------------------------------------------------------
# Subset fitting
# ---------------------------------------------------------------------------


def _w64_of(idx, levels: int):
    """BC7 interpolation weight from index, arithmetic (no table gather):
    every spec weight table equals round(i * 64 / (L-1))."""
    return (idx * 128 + (levels - 1)) // (2 * (levels - 1))


def _masked_seed(colors, mask):
    """Principal-axis extreme points of the masked pixel set.

    colors [M,16,C] (0..255), mask [M,16] -> (hi, lo) [M,C].
    """
    cnt = mask.sum(1, keepdims=True) + 1e-6
    mean = (colors * mask[..., None]).sum(1) / cnt
    centered = (colors - mean[:, None, :]) * mask[..., None]
    cov = jnp.einsum("nic,nid->ncd", centered, centered)
    norms = (centered * centered).sum(-1)
    start = select_at_max(norms, centered)
    n0 = jnp.linalg.norm(start, axis=-1, keepdims=True)
    v = jnp.where(n0 > 1e-10, start / (n0 + 1e-20), jnp.ones_like(start))
    for _ in range(4):
        nv = jnp.einsum("ncd,nd->nc", cov, v)
        n = jnp.linalg.norm(nv, axis=-1, keepdims=True)
        v = jnp.where(n > 1e-10, nv / (n + 1e-20), v)
    t = jnp.einsum("nic,nc->ni", centered, v)
    # Extremes ON the principal axis (reductions only — per-block gathers
    # are pathologically slow on TPU).
    tmax = jnp.where(mask > 0, t, -jnp.inf).max(1)
    tmin = jnp.where(mask > 0, t, jnp.inf).min(1)
    hi = mean + v * tmax[:, None]
    lo = mean + v * tmin[:, None]
    return hi, lo


def _palette(d0, d1, weights):
    """Integer palette: d0,d1 [M,C] int, weights [L] -> [M,L,C] int."""
    w = weights[None, :, None]
    return (d0[:, None, :] * (64 - w) + d1[:, None, :] * w + 32) >> 6


def _exact_texel_error(colors, d0, d1, w_t, ch_w):
    """Exact decode-model error for per-texel weights w_t [M,T] (0..64)."""
    p = (
        d0[:, None, :] * (64 - w_t[:, :, None]) + d1[:, None, :] * w_t[:, :, None] + 32
    ) >> 6
    d = colors - p.astype(colors.dtype)
    return jnp.einsum("ntc,c->nt", d * d, ch_w)


def _assign(colors, d0, d1, weights, mask, ch_w):
    """Nearest-palette index per texel via line projection.

    Instead of sweeping all L palette entries (O(L) distance tensors), each
    texel's continuous interpolation weight w* = B/C is derived from the
    quadratic err(w) = A - 2wB + w^2 C along the endpoint line, then only
    the two weight levels bracketing w* are compared on the exact integer
    decode model.  colors [M,T,C] float, d0/d1 [M,C] int decoded endpoints,
    weights [L] int (0..64).  Returns (idx [M,T], exact masked err [M]).
    """
    L = weights.shape[0]
    df = (d1 - d0).astype(jnp.float32)  # [M,C]
    cw = (df * df * ch_w[None, :]).sum(-1)  # [M]
    diff = colors - d0[:, None, :].astype(colors.dtype)
    b = jnp.einsum("ntc,nc->nt", diff * ch_w[None, None, :], df)
    t = b / (cw[:, None] + 1e-10)  # continuous weight in lerp space (0..1)
    # Map to the (nearly uniform) weight ladder and test k-1, k, k+1.
    k = jnp.clip(jnp.round(t * (L - 1)), 0, L - 1).astype(jnp.int32)
    best_idx = None
    best_err = None
    for dk in (-1, 0, 1):
        kk = jnp.clip(k + dk, 0, L - 1)
        w_t = _w64_of(kk, L)
        e = _exact_texel_error(colors, d0, d1, w_t, ch_w)
        if best_err is None:
            best_idx, best_err = kk, e
        else:
            take = e < best_err
            best_idx = jnp.where(take, kk, best_idx)
            best_err = jnp.where(take, e, best_err)
    return best_idx, (best_err * mask).sum(axis=1)


def _fit_subset(colors, mask, weights, quant, iters, ch_w, seed=None):
    """Fit one subset: returns (state, idx [M,16], err [M]).

    colors [M,16,4] in 0..255; mask selects the subset's pixels.  `quant`
    maps float endpoint pairs to (state..., d0, d1) with d* the decoded
    integer endpoints; state is passed through for packing.  `seed` may
    supply precomputed (hi, lo) endpoints (e.g. a shared per-block
    projection) to skip the per-candidate PCA.
    """
    L = weights.shape[0]

    def candidate(e0, e1):
        st = quant(e0, e1)
        d0, d1 = st[-2], st[-1]
        idx, err = _assign(colors, d0, d1, weights, mask, ch_w)
        return st, idx, err

    hi, lo = _masked_seed(colors, mask) if seed is None else seed
    best = candidate(hi, lo)
    for _ in range(iters):
        w = _w64_of(best[1], L).astype(jnp.float32) / 64.0
        e1f, e0f = _ls_solve(colors, w, px_valid=mask)  # w=1 -> d1
        st, idx, err = candidate(e0f, e1f)
        take = err < best[2]
        best = (
            tuple(
                jnp.where(take[(...,) + (None,) * (a.ndim - 1)], a, b)
                for a, b in zip(st, best[0])
            ),
            jnp.where(take[:, None], idx, best[1]),
            jnp.where(take, err, best[2]),
        )
    return best


# ---------------------------------------------------------------------------
# Bit packing
# ---------------------------------------------------------------------------


class _Packer:
    """Static-position bit packer into 4 little-endian uint32 words."""

    def __init__(self, n):
        self.words = [jnp.zeros((n,), jnp.uint32) for _ in range(4)]
        self.pos = 0

    def put(self, value, nbits):
        v = value.astype(jnp.uint32) & jnp.uint32((1 << nbits) - 1)
        w, b = divmod(self.pos, 32)
        self.words[w] = self.words[w] | (v << jnp.uint32(b))
        if b + nbits > 32:
            self.words[w + 1] = self.words[w + 1] | (v >> jnp.uint32(32 - b))
        self.pos += nbits

    def put_dynamic(self, value, pos, maxbits):
        """Scatter `value` ([M]) at dynamic bit position `pos` ([M])."""
        v = value.astype(jnp.uint32)
        for w in range(4):
            rel = pos - 32 * w
            lo = v << jnp.uint32(jnp.clip(rel, 0, 31))
            hi = v >> jnp.uint32(jnp.clip(-rel, 0, 31))
            part = jnp.where(rel >= 0, lo, hi)
            valid = (rel > -maxbits) & (rel < 32)
            self.words[w] = self.words[w] | jnp.where(valid, part, 0)

    def stack(self):
        return jnp.stack(self.words, axis=-1)


def _pack_indices(packer, idx, nbits, anchors, start):
    """Pack per-pixel indices with anchor bit elision.

    anchors: list of [M] int arrays (pixel positions whose index loses its
    MSB — guaranteed clear by the caller's endpoint-swap fixup).
    """
    m = idx.shape[0]
    is_anchor = jnp.zeros((m, 16), bool)
    for a in anchors:
        is_anchor = is_anchor | (
            jnp.arange(16)[None, :] == a[:, None]
        )
    bits = jnp.full((m, 16), nbits, jnp.int32) - is_anchor.astype(jnp.int32)
    pos = start + jnp.cumsum(bits, axis=1) - bits
    for i in range(16):
        packer.put_dynamic(idx[:, i], pos[:, i], nbits)


# ---------------------------------------------------------------------------
# Mode encoders
# ---------------------------------------------------------------------------


def _anchor_fixup(idx, sel_mask, anchor_pos, nlevels):
    """If the anchor pixel's index has its MSB set, flag a swap and invert
    the subset's indices.  Returns (swap [M] bool, idx')."""
    a = jnp.take_along_axis(idx, anchor_pos[:, None], axis=1)[:, 0]
    swap = a >= (nlevels // 2)
    inv = (nlevels - 1) - idx
    idx = jnp.where(swap[:, None] & sel_mask, inv, idx)
    return swap, idx


def _encode_mode6(colors, iters, ch_w):
    """Mode 6: 1 subset, RGBA 7.7.7.7 + per-endpoint pbit, 4-bit indices."""
    m = colors.shape[0]
    ones = jnp.ones((m, 16), jnp.float32)

    def quant(e0, e1):
        v0, p0, d0 = _quant_pbit_each(e0, 7, ch_w)
        v1, p1, d1 = _quant_pbit_each(e1, 7, ch_w)
        return (v0, v1, p0, p1, d0, d1)

    (v0, v1, p0, p1, d0, d1), idx, err = _fit_subset(
        colors, ones, _W4, quant, iters, ch_w
    )
    swap, idx = _anchor_fixup(idx, ones > 0, jnp.zeros((m,), jnp.int32), 16)
    v0, v1 = jnp.where(swap[:, None], v1, v0), jnp.where(swap[:, None], v0, v1)
    p0, p1 = jnp.where(swap, p1, p0), jnp.where(swap, p0, p1)

    pk = _Packer(m)
    pk.put(jnp.full((m,), 1 << 6, jnp.int32), 7)  # mode
    for c in range(4):  # R0 R1 G0 G1 B0 B1 A0 A1
        pk.put(v0[:, c], 7)
        pk.put(v1[:, c], 7)
    pk.put(p0, 1)
    pk.put(p1, 1)
    _pack_indices(pk, idx, 4, [jnp.zeros((m,), jnp.int32)], pk.pos)
    return pk.stack(), err


def _best_over_candidates(fit_and_pack, top_parts, n, est_err=None):
    """Run the phase-B fit over the [N,R] candidate partitions and keep the
    lowest-error result per block.  vmap over the candidate axis compiles
    the fit body ONCE regardless of R (a Python loop would unroll it R
    times and blow up XLA compile time at high quality).

    With `est_err` (partition [N] -> unrefined candidate error [N]), the
    R candidates are ranked by ONE cheap quantize+assign pass and only the
    per-block winner gets the full iterated fit — the estimate-then-refine
    strategy of the CPU encoders (bc7e's "estimate mode error" pass), worth
    ~2x at quality 3-4 for <0.05 dB."""
    r = top_parts.shape[1]
    if r == 1:
        return fit_and_pack(top_parts[:, 0])
    if est_err is not None:
        e_all = jax.vmap(est_err)(top_parts.T)  # [R,N]
        best = e_all.argmin(axis=0)  # [N]
        part = jnp.take_along_axis(top_parts, best[:, None], axis=1)[:, 0]
        return fit_and_pack(part)
    words_all, err_all = jax.vmap(fit_and_pack)(top_parts.T)  # [R,N,4],[R,N]
    best = err_all.argmin(axis=0)  # [N]
    words = words_all[best, jnp.arange(n)]
    return words, err_all.min(axis=0)


def _encode_two_subset(colors, iters, ch_w, num_refine, mode):
    """Modes 1/3/7: 2 subsets over the 64-pattern table.

    mode 1: RGB 6.6 + shared pbit/subset, 3-bit idx
    mode 3: RGB 7.7 + per-endpoint pbit,  2-bit idx
    mode 7: RGBA 5.5 + per-endpoint pbit, 2-bit idx

    All 64 partitions are screened with a cheap matmul proxy; the top
    `num_refine` candidates each get the full phase-B endpoint fit and the
    lowest-error one wins (the quality ladder's per-mode budget).
    """
    n = colors.shape[0]

    # Shared per-block principal axis.
    mean = colors.mean(axis=1, keepdims=True)
    centered = colors - mean
    cov = jnp.einsum("nic,nid->ncd", centered, centered)
    norms = (centered * centered).sum(-1)
    start = select_at_max(norms, centered)
    n0 = jnp.linalg.norm(start, axis=-1, keepdims=True)
    axis = jnp.where(n0 > 1e-10, start / (n0 + 1e-20), jnp.ones_like(start))
    for _ in range(4):
        nv = jnp.einsum("ncd,nd->nc", cov, axis)
        nn = jnp.linalg.norm(nv, axis=-1, keepdims=True)
        axis = jnp.where(nn > 1e-10, nv / (nn + 1e-20), axis)
    proj = jnp.einsum("nic,nc->ni", centered, axis)  # [N,16]

    # Partition selection over ALL `k`-limited candidates in one shot: the
    # screening error for a subset is its residual perpendicular to the
    # shared axis, Sum|c-mean_s|^2 - Sum((proj-projmean_s))^2, and every
    # term is a [N,16] x [16,P] matmul over the mask matrix — no per
    # -candidate block replication (which made screening HBM-bound).
    masks_p = _PART2.astype(jnp.float32)  # [64,16]
    cw4 = ch_w if mode == 7 else ch_w * jnp.array([1, 1, 1, 0], jnp.float32)
    w2 = jnp.einsum("nic,c->ni", colors * colors, cw4)  # [N,16]
    cwc = colors * cw4[None, None, :]

    def subset_err(m):  # m [64,16] membership (1 = in subset)
        ns = m.sum(1) + 1e-6  # [64]
        s1 = jnp.einsum("nic,pi->npc", colors, m)  # [N,P,C]
        sw = jnp.einsum("nic,pi->npc", cwc, m)
        tot = w2 @ m.T  # [N,P]
        mean_term = (s1 * sw).sum(-1) / ns[None, :]
        pssum = proj @ m.T
        ps2 = (proj * proj) @ m.T
        along = ps2 - pssum * pssum / ns[None, :]
        return tot - mean_term - jnp.maximum(along, 0.0)

    score = subset_err(masks_p) + subset_err(1.0 - masks_p)  # [N,64]
    _, top_parts = jax.lax.top_k(-score, max(1, int(num_refine)))  # [N,R]
    cw = cw4

    if mode == 1:
        weights, nlev, bits = _W3, 8, 6

        def quant(e0, e1):
            v0, v1, p, d0, d1 = _quant_pbit_shared(
                e0[:, :3], e1[:, :3], bits, cw[:3]
            )
            d0 = jnp.concatenate([d0, jnp.full_like(d0[:, :1], 255)], -1)
            d1 = jnp.concatenate([d1, jnp.full_like(d1[:, :1], 255)], -1)
            return (v0, v1, p, p, d0, d1)

    elif mode == 3:
        weights, nlev, bits = _W2, 4, 7

        def quant(e0, e1):
            v0, p0, d0 = _quant_pbit_each(e0[:, :3], bits, cw[:3])
            v1, p1, d1 = _quant_pbit_each(e1[:, :3], bits, cw[:3])
            d0 = jnp.concatenate([d0, jnp.full_like(d0[:, :1], 255)], -1)
            d1 = jnp.concatenate([d1, jnp.full_like(d1[:, :1], 255)], -1)
            return (v0, v1, p0, p1, d0, d1)

    else:  # mode 7
        weights, nlev, bits = _W2, 4, 5

        def quant(e0, e1):
            v0, p0, d0 = _quant_pbit_each(e0, bits, cw)
            v1, p1, d1 = _quant_pbit_each(e1, bits, cw)
            return (v0, v1, p0, p1, d0, d1)

    def seed_of(m):
        cnt = m.sum(1, keepdims=True) + 1e-6
        mean_s = (colors * m[..., None]).sum(1) / cnt
        ts = jnp.einsum("ntc,nc->nt", colors - mean_s[:, None, :], axis)
        tmax = jnp.where(m > 0, ts, -jnp.inf).max(1)
        tmin = jnp.where(m > 0, ts, jnp.inf).min(1)
        return mean_s + axis * tmax[:, None], mean_s + axis * tmin[:, None]

    def fit_and_pack(part):
        """Full phase-B fit + bit packing for one partition choice [N]."""
        masks_b = _PART2[part].astype(jnp.float32)  # [N,16]
        st0, idx0, err0 = _fit_subset(
            colors, 1.0 - masks_b, weights, quant, iters, cw,
            seed=seed_of(1.0 - masks_b),
        )
        st1, idx1, err1 = _fit_subset(
            colors, masks_b, weights, quant, iters, cw, seed=seed_of(masks_b)
        )
        # Alpha error for alpha-less modes: palette alpha is fixed 255.
        alpha_pen = 0.0
        if mode in (1, 3):
            alpha_pen = (ch_w[3] * (colors[..., 3] - 255.0) ** 2).sum(1)
        best_err = err0 + err1 + alpha_pen  # [N]

        idx = jnp.where(masks_b > 0, idx1, idx0)
        (v00, v01, p00, p01, _, _) = st0
        (v10, v11, p10, p11, _, _) = st1

        sel1 = _PART2[part] > 0  # [N,16] bool
        anchor0 = jnp.zeros((n,), jnp.int32)
        anchor1 = _ANCHOR2[part]

        swap0, idx = _anchor_fixup(idx, ~sel1, anchor0, nlev)
        swap1, idx = _anchor_fixup(idx, sel1, anchor1, nlev)

        def sw(a, b, flag):
            f = flag[(...,) + (None,) * (a.ndim - 1)]
            return jnp.where(f, b, a), jnp.where(f, a, b)

        v00, v01 = sw(v00, v01, swap0)
        p00, p01 = sw(p00, p01, swap0)
        v10, v11 = sw(v10, v11, swap1)
        p10, p11 = sw(p10, p11, swap1)

        pk = _Packer(n)
        nch = 4 if mode == 7 else 3
        if mode == 1:
            pk.put(jnp.full((n,), 2, jnp.int32), 2)
        elif mode == 3:
            pk.put(jnp.full((n,), 8, jnp.int32), 4)
        else:
            pk.put(jnp.full((n,), 128, jnp.int32), 8)
        pk.put(part, 6)
        for c in range(nch):
            pk.put(v00[:, c], bits)
            pk.put(v01[:, c], bits)
            pk.put(v10[:, c], bits)
            pk.put(v11[:, c], bits)
        if mode == 1:
            pk.put(p00, 1)  # shared pbit subset 0
            pk.put(p10, 1)  # shared pbit subset 1
        else:
            pk.put(p00, 1)
            pk.put(p01, 1)
            pk.put(p10, 1)
            pk.put(p11, 1)
        nbits = 3 if mode == 1 else 2
        _pack_indices(pk, idx, nbits, [anchor0, anchor1], pk.pos)
        return pk.stack(), best_err

    def est_err(part):
        """Unrefined candidate error (seed -> quantize -> assign, no LS)."""
        masks_b = _PART2[part].astype(jnp.float32)
        _, _, e0 = _fit_subset(
            colors, 1.0 - masks_b, weights, quant, 0, cw,
            seed=seed_of(1.0 - masks_b),
        )
        _, _, e1 = _fit_subset(
            colors, masks_b, weights, quant, 0, cw, seed=seed_of(masks_b)
        )
        return e0 + e1

    return _best_over_candidates(fit_and_pack, top_parts, n, est_err)


def _fit_scalar(vals, weights, quant_bits, iters):
    """Scalar channel fit (mode 4/5 alpha): returns (q0, q1, idx, err).

    vals [M,16] 0..255; endpoints quantized to `quant_bits` with bit
    replication; `weights` is the 0..64 interpolation ladder.
    """
    lvl = weights.shape[0]
    maxq = (1 << quant_bits) - 1

    def dequant(q):
        return _replicate(q, quant_bits)

    def cand(e0, e1):
        q0 = jnp.clip(jnp.round(e0 * maxq / 255.0), 0, maxq).astype(jnp.int32)
        q1 = jnp.clip(jnp.round(e1 * maxq / 255.0), 0, maxq).astype(jnp.int32)
        d0 = dequant(q0)
        d1 = dequant(q1)
        pal = (
            d0[:, None] * (64 - weights[None, :]) + d1[:, None] * weights[None, :] + 32
        ) >> 6
        e = (vals[:, :, None] - pal[:, None, :].astype(vals.dtype)) ** 2
        idx = e.argmin(-1).astype(jnp.int32)
        return q0, q1, idx, e.min(-1).sum(1)

    best = cand(vals.max(1), vals.min(1))
    for _ in range(iters):
        w = _w64_of(best[2], lvl).astype(jnp.float32) / 64.0
        e1f, e0f = _ls_solve(vals[..., None], w)
        c = cand(e0f[:, 0], e1f[:, 0])
        take = c[3] < best[3]
        best = tuple(
            jnp.where(take[(...,) + (None,) * (b.ndim - 1)], x, b)
            for x, b in zip(c, best)
        )
    return best


def _scalar_anchor_fix(q0, q1, idx, lvl):
    a = idx[:, 0]
    swap = a >= lvl // 2
    q0n = jnp.where(swap, q1, q0)
    q1n = jnp.where(swap, q0, q1)
    idx = jnp.where(swap[:, None], (lvl - 1) - idx, idx)
    return q0n, q1n, idx


def _encode_three_subset(colors, iters, ch_w, num_refine, mode):
    """Modes 0/2: 3 subsets.

    mode 0: 16 partitions, RGB 4.4 + per-endpoint pbit, 3-bit idx
    mode 2: 64 partitions, RGB 5.5 (no pbits), 2-bit idx

    All partitions are screened with the matmul proxy; the top `num_refine`
    each get the full phase-B fit and the lowest-error one wins.
    """
    n = colors.shape[0]
    limit = 16 if mode == 0 else 64
    cw = ch_w * jnp.array([1, 1, 1, 0], jnp.float32)

    # Shared block axis for screening seeds.
    mean = colors.mean(axis=1, keepdims=True)
    centered = colors - mean
    cov = jnp.einsum("nic,nid->ncd", centered, centered)
    norms = (centered * centered).sum(-1)
    start = select_at_max(norms, centered)
    n0 = jnp.linalg.norm(start, axis=-1, keepdims=True)
    axis = jnp.where(n0 > 1e-10, start / (n0 + 1e-20), jnp.ones_like(start))
    for _ in range(4):
        nv = jnp.einsum("ncd,nd->nc", cov, axis)
        nn = jnp.linalg.norm(nv, axis=-1, keepdims=True)
        axis = jnp.where(nn > 1e-10, nv / (nn + 1e-20), axis)

    # Partition selection over all rows in one shot (same matmul screening
    # as the 2-subset path: per-subset residual perpendicular to the shared
    # axis via [N,16] x [16,P] matmuls; no block replication).
    part_rows = _PART3[:limit].astype(jnp.int32)  # [P,16]
    proj = jnp.einsum("nic,nc->ni", centered, axis)  # [N,16]
    w2 = jnp.einsum("nic,c->ni", colors * colors, cw)
    cwc = colors * cw[None, None, :]

    def subset_err3(m):  # m [P,16]
        ns = m.sum(1) + 1e-6
        s1 = jnp.einsum("nic,pi->npc", colors, m)
        sw = jnp.einsum("nic,pi->npc", cwc, m)
        tot = w2 @ m.T
        mean_term = (s1 * sw).sum(-1) / ns[None, :]
        pssum = proj @ m.T
        ps2 = (proj * proj) @ m.T
        along = ps2 - pssum * pssum / ns[None, :]
        return tot - mean_term - jnp.maximum(along, 0.0)

    score = sum(
        subset_err3((part_rows == s).astype(jnp.float32)) for s in range(3)
    )
    _, top_parts = jax.lax.top_k(-score, max(1, int(num_refine)))  # [N,R]

    if mode == 0:
        weights, nlev, bits = _W3, 8, 4

        def quant(e0, e1):
            v0, p0, d0 = _quant_pbit_each(e0[:, :3], bits, cw[:3])
            v1, p1, d1 = _quant_pbit_each(e1[:, :3], bits, cw[:3])
            d0 = jnp.concatenate([d0, jnp.full_like(d0[:, :1], 255)], -1)
            d1 = jnp.concatenate([d1, jnp.full_like(d1[:, :1], 255)], -1)
            return (v0, v1, p0, p1, d0, d1)

    else:
        weights, nlev, bits = _W2, 4, 5

        def quant(e0, e1):
            v0, d0 = _quant_plain(e0[:, :3], bits)
            v1, d1 = _quant_plain(e1[:, :3], bits)
            d0 = jnp.concatenate([d0, jnp.full_like(d0[:, :1], 255)], -1)
            d1 = jnp.concatenate([d1, jnp.full_like(d1[:, :1], 255)], -1)
            return (v0, v1, jnp.zeros(e0.shape[0], jnp.int32),
                    jnp.zeros(e0.shape[0], jnp.int32), d0, d1)

    def seed_of(m):
        cnt = m.sum(1, keepdims=True) + 1e-6
        mean_s = (colors * m[..., None]).sum(1) / cnt
        ts = jnp.einsum("ntc,nc->nt", colors - mean_s[:, None, :], axis)
        tmax = jnp.where(m > 0, ts, -jnp.inf).max(1)
        tmin = jnp.where(m > 0, ts, jnp.inf).min(1)
        return mean_s + axis * tmax[:, None], mean_s + axis * tmin[:, None]

    def fit_and_pack(part):
        prow = part_rows[part]  # [N,16]
        states = []
        idxs = []
        err = (ch_w[3] * (colors[..., 3] - 255.0) ** 2).sum(1)
        for s in range(3):
            ms = (prow == s).astype(jnp.float32)
            st, sidx, serr_s = _fit_subset(
                colors, ms, weights, quant, iters, cw, seed=seed_of(ms)
            )
            states.append(st)
            idxs.append(sidx)
            err = err + serr_s

        idx = jnp.where(prow == 1, idxs[1], idxs[0])
        idx = jnp.where(prow == 2, idxs[2], idx)

        anchors = [
            jnp.zeros((n,), jnp.int32),
            _ANCHOR3_2[part],
            _ANCHOR3_3[part],
        ]
        vs = []
        ps = []
        for s in range(3):
            v0, v1, p0, p1, _, _ = states[s]
            swap, idx = _anchor_fixup(idx, prow == s, anchors[s], nlev)
            v0n = jnp.where(swap[:, None], v1, v0)
            v1n = jnp.where(swap[:, None], v0, v1)
            p0n = jnp.where(swap, p1, p0)
            p1n = jnp.where(swap, p0, p1)
            vs.append((v0n, v1n))
            ps.append((p0n, p1n))

        pk = _Packer(n)
        if mode == 0:
            pk.put(jnp.full((n,), 1, jnp.int32), 1)
            pk.put(part, 4)
        else:
            pk.put(jnp.full((n,), 4, jnp.int32), 3)
            pk.put(part, 6)
        for c in range(3):
            for s in range(3):
                pk.put(vs[s][0][:, c], bits)
                pk.put(vs[s][1][:, c], bits)
        if mode == 0:
            for s in range(3):
                pk.put(ps[s][0], 1)
                pk.put(ps[s][1], 1)
        nbits = 3 if mode == 0 else 2
        _pack_indices(pk, idx, nbits, anchors, pk.pos)
        return pk.stack(), err

    def est_err(part):
        """Unrefined candidate error (seed -> quantize -> assign, no LS)."""
        prow = part_rows[part]  # [N,16]
        e = jnp.zeros((n,), jnp.float32)
        for s in range(3):
            ms = (prow == s).astype(jnp.float32)
            _, _, se = _fit_subset(
                colors, ms, weights, quant, 0, cw, seed=seed_of(ms)
            )
            e = e + se
        return e

    return _best_over_candidates(fit_and_pack, top_parts, n, est_err)


def _rotate_channels(colors, ch_w, rot):
    """BC7 rotation: swap channel rot-1 with alpha (rot=0: identity)."""
    if rot == 0:
        return colors, ch_w
    c = rot - 1
    perm = [0, 1, 2, 3]
    perm[c], perm[3] = 3, c
    return colors[..., perm], ch_w[jnp.asarray(perm)]


def _encode_mode4(colors, iters, ch_w, rotations=(0,), idx_modes=(0, 1)):
    """Mode 4: 1 subset, RGB 5.5 + A 6.6, 2-bit + 3-bit indices.

    idx_mode selects which index set (2-bit vs 3-bit) drives color vs alpha;
    `idx_modes` picks which settings to evaluate (quality Normal runs only
    idx_mode 0 — the alternate wins <0.02 dB for ~10% of kernel time; q3+
    evaluate both), each over the requested rotations.  Layout:
    mode(5) rot(2) idxMode(1) R0 R1 G0 G1 B0 B1 (5 each) A0 A1 (6 each),
    then the 2-bit stream (31 bits) and the 3-bit stream (47 bits).
    """
    best = None
    for rot in rotations:
        rc, rw = _rotate_channels(colors, ch_w, rot)
        w, e = _encode_mode4_rot(rc, iters, rw, rot, idx_modes)
        if best is None:
            best = (w, e)
        else:
            take = e < best[1]
            best = (jnp.where(take[:, None], w, best[0]), jnp.minimum(e, best[1]))
    return best


def _encode_mode4_rot(colors, iters, ch_w, rot, idx_modes=(0, 1)):
    m = colors.shape[0]
    ones = jnp.ones((m, 16), jnp.float32)
    cw = ch_w * jnp.array([1, 1, 1, 0], jnp.float32)
    a = colors[..., 3]

    def quant_rgb(e0, e1):
        v0, d0 = _quant_plain(e0[:, :3], 5)
        v1, d1 = _quant_plain(e1[:, :3], 5)
        d0 = jnp.concatenate([d0, jnp.zeros_like(d0[:, :1])], -1)
        d1 = jnp.concatenate([d1, jnp.zeros_like(d1[:, :1])], -1)
        return (v0, v1, d0, d1)

    best_words = None
    best_err = None
    for idx_mode in idx_modes:
        cweights = _W2 if idx_mode == 0 else _W3
        aweights = _W3 if idx_mode == 0 else _W2
        (v0, v1, _, _), cidx, cerr = _fit_subset(
            colors, ones, cweights, quant_rgb, iters, cw
        )
        clvl = cweights.shape[0]
        ca = cidx[:, 0]
        cswap = ca >= clvl // 2
        v0n = jnp.where(cswap[:, None], v1, v0)
        v1n = jnp.where(cswap[:, None], v0, v1)
        cidx = jnp.where(cswap[:, None], (clvl - 1) - cidx, cidx)

        q0, q1, aidx, aerr = _fit_scalar(a, aweights, 6, iters)
        q0, q1, aidx = _scalar_anchor_fix(q0, q1, aidx, aweights.shape[0])

        err = cerr + ch_w[3] * aerr
        pk = _Packer(m)
        pk.put(jnp.full((m,), 1 << 4, jnp.int32), 5)  # mode 4
        pk.put(jnp.full((m,), rot, jnp.int32), 2)
        pk.put(jnp.full((m,), idx_mode, jnp.int32), 1)
        for c in range(3):
            pk.put(v0n[:, c], 5)
            pk.put(v1n[:, c], 5)
        pk.put(q0, 6)
        pk.put(q1, 6)
        zero = [jnp.zeros((m,), jnp.int32)]
        idx2 = cidx if idx_mode == 0 else aidx
        idx3 = aidx if idx_mode == 0 else cidx
        _pack_indices(pk, idx2, 2, zero, 50)
        _pack_indices(pk, idx3, 3, zero, 81)
        words = pk.stack()
        if best_words is None:
            best_words, best_err = words, err
        else:
            take = err < best_err
            best_words = jnp.where(take[:, None], words, best_words)
            best_err = jnp.where(take, err, best_err)
    return best_words, best_err


def _encode_mode5(colors, iters, ch_w, rotations=(0,)):
    """Mode 5: 1 subset, RGB 7.7 + A 8.8, 2+2 bit indices."""
    best = None
    for rot in rotations:
        rc, rw = _rotate_channels(colors, ch_w, rot)
        w, e = _encode_mode5_rot(rc, iters, rw, rot)
        if best is None:
            best = (w, e)
        else:
            take = e < best[1]
            best = (jnp.where(take[:, None], w, best[0]), jnp.minimum(e, best[1]))
    return best


def _encode_mode5_rot(colors, iters, ch_w, rot):
    m = colors.shape[0]
    ones = jnp.ones((m, 16), jnp.float32)
    cw = ch_w * jnp.array([1, 1, 1, 0], jnp.float32)

    def quant_rgb(e0, e1):
        v0, d0 = _quant_plain(e0[:, :3], 7)
        v1, d1 = _quant_plain(e1[:, :3], 7)
        d0 = jnp.concatenate([d0, jnp.zeros_like(d0[:, :1])], -1)
        d1 = jnp.concatenate([d1, jnp.zeros_like(d1[:, :1])], -1)
        return (v0, v1, d0, d1)

    (v0, v1, _, _), cidx, cerr = _fit_subset(colors, ones, _W2, quant_rgb, iters, cw)
    swapc, cidx = _anchor_fixup(cidx, ones > 0, jnp.zeros((m,), jnp.int32), 4)
    v0, v1 = jnp.where(swapc[:, None], v1, v0), jnp.where(swapc[:, None], v0, v1)

    # Alpha: scalar 8-bit endpoints, 2-bit indices.
    a = colors[..., 3]
    a_hi = a.max(1)
    a_lo = a.min(1)

    def acand(e0, e1):
        q0 = jnp.clip(jnp.round(e0), 0, 255).astype(jnp.int32)
        q1 = jnp.clip(jnp.round(e1), 0, 255).astype(jnp.int32)
        pal = (
            q0[:, None] * (64 - _W2[None, :]) + q1[:, None] * _W2[None, :] + 32
        ) >> 6
        e = (a[:, :, None] - pal[:, None, :]) ** 2
        idx = e.argmin(-1).astype(jnp.int32)
        return q0, q1, idx, e.min(-1).sum(1)

    abest = acand(a_hi, a_lo)
    for _ in range(iters):
        w = _w64_of(abest[2], 4).astype(jnp.float32) / 64.0
        e1f, e0f = _ls_solve(a[..., None], w)
        cand = acand(e0f[:, 0], e1f[:, 0])
        take = cand[3] < abest[3]
        abest = tuple(
            jnp.where(take[(...,) + (None,) * (b.ndim - 1)], c, b)
            for c, b in zip(cand, abest)
        )
    a0, a1, aidx, aerr = abest
    swapa = jnp.take_along_axis(aidx, jnp.zeros((m, 1), jnp.int32), 1)[:, 0] >= 2
    a0, a1 = jnp.where(swapa, a1, a0), jnp.where(swapa, a0, a1)
    aidx = jnp.where(swapa[:, None], 3 - aidx, aidx)

    err = cerr + ch_w[3] * aerr

    pk = _Packer(m)
    pk.put(jnp.full((m,), 1 << 5, jnp.int32), 6)  # mode
    pk.put(jnp.full((m,), rot, jnp.int32), 2)
    for c in range(3):
        pk.put(v0[:, c], 7)
        pk.put(v1[:, c], 7)
    pk.put(a0, 8)
    pk.put(a1, 8)
    zero = [jnp.zeros((m,), jnp.int32)]
    _pack_indices(pk, cidx, 2, zero, pk.pos)
    _pack_indices(pk, aidx, 2, zero, 97)  # alpha indices start at bit 97
    return pk.stack(), err


# Per quality level: LS-refine iterations and the mode set; the per-mode
# value is how many top-screened partitions get the full phase-B fit
# (all partitions are always screened by the matmul proxy).
_QUALITY_PLAN = {
    0: {"iters": 1, "modes": {6: None}},
    1: {"iters": 2, "modes": {6: None, 1: 1}},
    2: {"iters": 2, "modes": {6: None, 1: 1, 5: None, 4: "idx0"}},
    3: {"iters": 3, "modes": {6: None, 1: 2, 3: 2, 0: 1, 5: None, 4: None}},
    4: {"iters": 4, "modes": {6: None, 1: 4, 3: 4, 7: 2, 0: 2, 2: 2,
                              5: None, 4: None}},
}


def encode_bc7(
    blocks: jnp.ndarray, quality: int = 2, perceptual: bool = False
) -> jnp.ndarray:
    """Encode [N,16,4] float RGBA blocks (0..1) to BC7 [N,4] uint32 words.

    Dispatch: on TPU the Pallas kernels (kernels/bc7_pallas.py) run the
    whole mode sweep VMEM-resident at every quality level (0-2: modes
    6/1/5/4; 3-4: + modes 0/2/3/7, top-k partition refinement,
    rotations); CPU uses the jnp path.  ``CUTTLEFISH_PALLAS=0`` disables
    the Pallas path, ``=1`` forces it (interpreted on CPU — for tests).
    """
    import os

    use = os.environ.get("CUTTLEFISH_PALLAS", "auto")
    if use != "0":
        from cuttlefish_tpu.kernels.bc7_pallas import encode_bc7_pallas

        if jax.default_backend() == "tpu":
            return encode_bc7_pallas(blocks, int(quality), perceptual)
        if use == "1":
            return encode_bc7_pallas(
                blocks, int(quality), perceptual, interpret=True
            )
    return _encode_bc7_jnp(blocks, quality, perceptual)


@functools.partial(
    jax.jit, static_argnames=("mode", "parts", "iters", "rotations",
                              "perceptual")
)
def _bc7_mode_jnp(blocks, mode, parts, iters, rotations, perceptual):
    """One mode family as its own jit unit.

    Per-mode compilation keeps each XLA CPU module tractable: the single
    monolithic q3/q4 program (8 modes x vmapped partition fits x 4
    rotations) pathologically slows/breaks the CPU backend's compile,
    while the TPU path never traces this (it runs the Pallas kernels).
    Returns (words [N,4] uint32, err [N]).
    """
    colors = jnp.clip(blocks.astype(jnp.float32), 0.0, 1.0) * 255.0
    if perceptual:
        ch_w = jnp.array([0.55, 1.1, 0.35, 1.0], jnp.float32)
    else:
        ch_w = jnp.ones((4,), jnp.float32)
    if mode == 6:
        return _encode_mode6(colors, iters, ch_w)
    if mode == 5:
        return _encode_mode5(colors, iters, ch_w, rotations)
    if mode == 4:
        return _encode_mode4(
            colors, iters, ch_w, rotations,
            idx_modes=(0,) if parts == "idx0" else (0, 1),
        )
    if mode in (0, 2):
        return _encode_three_subset(colors, iters, ch_w, parts, mode)
    return _encode_two_subset(colors, iters, ch_w, parts, mode)


def _encode_bc7_jnp(
    blocks: jnp.ndarray, quality: int = 2, perceptual: bool = False
) -> jnp.ndarray:
    """jnp reference path (all 5 quality levels, all 8 modes).

    Modes compile as separate jit units (_bc7_mode_jnp) and combine
    eagerly; under an outer trace (e.g. the fused pipeline on CPU) the
    units inline as before.
    """
    plan = _QUALITY_PLAN[max(0, min(4, int(quality)))]
    iters = plan["iters"]

    words = None
    err = None
    for mode, parts in plan["modes"].items():
        rotations = (0, 1, 2, 3) if int(quality) >= 4 and mode in (4, 5) else (0,)
        w, e = _bc7_mode_jnp(
            blocks, mode, parts, iters, rotations, bool(perceptual)
        )
        if words is None:
            words, err = w, e
        else:
            take = e < err
            words = jnp.where(take[:, None], w, words)
            err = jnp.where(take, e, err)
    return words
