"""BC6H block encoder (batched JAX) — HDR RGB, unsigned/signed half floats.

TPU-native replacement for ispc_texcomp / Compressonator BC6H
(`/root/reference/lib/src/S3tcConverter.cpp:492-591`).  All 14 modes:
one-region 11 (10.10) and 12 (11.9 delta), plus the ten two-region modes
(bit layouts in bc6h_tables.py, extracted from and validated against Mesa
llvmpipe).  Two-region encoding screens the 32 BPTC partitions with a
within-cluster-SSE matmul, fits shared float endpoints per region, then
quantizes per mode; the quality ladder controls how many modes compete.

All fitting runs in the half-float *bit* domain (a monotonic, roughly
logarithmic proxy for the value domain, matching how CPU BC6H encoders
measure error); the palette model reproduces the spec decoder exactly:
unquantize -> 64-weight interpolation -> *31>>6 (unsigned) / *31>>5 (signed).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from cuttlefish_tpu.kernels.bc import _ls_solve, _principal_axis
from cuttlefish_tpu.kernels.bc7 import _Packer, _pack_indices
from cuttlefish_tpu.kernels.bc7_tables import WEIGHTS4
from cuttlefish_tpu.packfloat import f32_to_half_bits

_W4 = jnp.asarray(WEIGHTS4)

_HALF_MAX = 0x7BFF  # largest finite half


def _to_proxy(rgb: jnp.ndarray, signed: bool) -> jnp.ndarray:
    """float32 [N,16,3] -> half-bit proxy ints (float32 values)."""
    h = f32_to_half_bits(rgb, jnp)  # uint16 bits
    mag = (h & 0x7FFF).astype(jnp.int32)
    mag = jnp.minimum(mag, _HALF_MAX)
    if signed:
        sign = (h & 0x8000) != 0
        return jnp.where(sign, -mag, mag).astype(jnp.float32)
    # Unsigned: negatives clamp to zero.
    sign = (h & 0x8000) != 0
    return jnp.where(sign, 0, mag).astype(jnp.float32)


def _unquant_unsigned(q: jnp.ndarray, bits: int) -> jnp.ndarray:
    maxq = (1 << bits) - 1
    u = ((q << 16) + 0x8000) >> bits
    u = jnp.where(q == 0, 0, jnp.where(q == maxq, 0xFFFF, u))
    return u


def _unquant_signed(q: jnp.ndarray, bits: int) -> jnp.ndarray:
    s = q < 0
    aq = jnp.abs(q)
    maxa = (1 << (bits - 1)) - 1
    u = ((aq << 15) + 0x4000) >> (bits - 1)
    u = jnp.where(aq == 0, 0, jnp.where(aq >= maxa, 0x7FFF, u))
    return jnp.where(s, -u, u)


def _finalize(v: jnp.ndarray, signed: bool) -> jnp.ndarray:
    if signed:
        return jnp.sign(v) * ((jnp.abs(v) * 31) >> 5)
    return (v * 31) >> 6


def _proxy_to_value(b: jnp.ndarray) -> jnp.ndarray:
    """Half-bit proxy (float, possibly fractional/negative) -> f32 value.

    Piecewise-exponential inverse of `_to_proxy`: exact for integer bit
    patterns, monotone interpolation for fractional inputs.  Candidate
    SELECTION runs in this (linear value) domain so the quality ladder is
    monotone in the metric the harness measures (linear PSNR) — fitting
    math stays in the well-conditioned proxy domain.  2^(e-25) via the f32
    exponent field (ldexp) rather than transcendental exp2."""
    a = jnp.abs(b)
    e = jnp.minimum(jnp.floor(a * (1.0 / 1024.0)), 120.0)
    p2 = jax.lax.bitcast_convert_type(
        (e.astype(jnp.int32) + 102) << 23, jnp.float32
    )  # 2^(e-25); e clamped so the exponent field cannot overflow
    m = a - e * 1024.0
    val = jnp.where(a < 1024.0, a * (2.0**-24), p2 * (1024.0 + m))
    return jnp.where(b < 0, -val, val)


def _proxy_scale(b: jnp.ndarray) -> jnp.ndarray:
    """Per-texel d(value)/d(proxy bit): 2^(e-25) (2^-24 denormal segment).

    The proxy->value map is piecewise linear in the mantissa, so
    value-domain error is exactly (scale * proxy_diff)^2 within the texel's
    exponent segment — candidate selection uses this linearization instead
    of converting every palette candidate (mirrors bc6h_pallas)."""
    a = jnp.abs(b)
    e = jnp.minimum(jnp.floor(a * (1.0 / 1024.0)), 120.0)
    p2 = jax.lax.bitcast_convert_type(
        (e.astype(jnp.int32) + 102) << 23, jnp.float32
    )
    return jnp.where(a < 1024.0, 2.0**-24, p2)


def _quant_candidates(target: jnp.ndarray, bits: int, signed: bool):
    """Best b-bit quantized endpoint for a proxy-domain target [.,3].

    Tries round +/-1 against the exact decode model.
    """
    if signed:
        # final(q) = q * 31*2^(11-bits) + sign(q) * (offset), exactly.
        maxq = (1 << (bits - 1)) - 1
        scale = 31.0 * (1 << 11) / (1 << bits)
        base = jnp.round(target / scale).astype(jnp.int32)
        lo, hi = -maxq, maxq
    else:
        # final(q) = q * 31*2^(10-bits) + offset for interior q, exactly.
        maxq = (1 << bits) - 1
        scale = 31.0 * (1 << 10) / (1 << bits)
        base = jnp.round(target / scale).astype(jnp.int32)
        lo, hi = 0, maxq
    best_q = None
    best_e = None
    for d in (-1, 0, 1):
        q = jnp.clip(base + d, lo, hi)
        u = _unquant_signed(q, bits) if signed else _unquant_unsigned(q, bits)
        dec = _finalize(u, signed).astype(jnp.float32)
        e = (dec - target) ** 2
        if best_q is None:
            best_q, best_e = q, e
        else:
            take = e < best_e
            best_q = jnp.where(take, q, best_q)
            best_e = jnp.where(take, e, best_e)
    return best_q


def _palette(q0, q1, bits: int, signed: bool) -> jnp.ndarray:
    """Decoded 16-entry palette from quantized endpoints [M,3] -> [M,16,3]."""
    u0 = (_unquant_signed(q0, bits) if signed else _unquant_unsigned(q0, bits))
    u1 = (_unquant_signed(q1, bits) if signed else _unquant_unsigned(q1, bits))
    w = _W4[None, :, None]
    interp = (u0[:, None, :] * (64 - w) + u1[:, None, :] * w + 32) >> 6
    return _finalize(interp, signed).astype(jnp.float32)


def _fit_mode(proxy, pxv, pxs, bits: int, signed: bool, iters: int,
              delta_bits: int = 0, code: bool = False):
    """One-region fit at `bits` precision; optional delta clamp for e1.

    Returns (q0, q1, idx, err); q1 is absolute (delta applied by packer).
    Per-texel index choice uses the `pxs` linearization; the returned err
    (all keep-best / cross-mode comparisons) is exact value-domain.
    """

    def candidate(e0, e1):
        q0 = _quant_candidates(e0, bits, signed)
        q1 = _quant_candidates(e1, bits, signed)
        if delta_bits:
            half = 1 << (delta_bits - 1)
            d = jnp.clip(q1 - q0, -half, half - 1)
            q1 = q0 + d
        pal = _palette(q0, q1, bits, signed)
        d2 = (proxy[:, :, None, :] - pal[:, None, :, :]) * pxs[:, :, None, :]
        e = (d2 * d2).sum(-1)
        idx = e.argmin(-1).astype(jnp.int32)
        oh = jax.nn.one_hot(idx, pal.shape[1], dtype=jnp.float32)
        chosen = jnp.einsum("ntk,nkc->ntc", oh, pal)
        if not code:
            chosen = _proxy_to_value(chosen)
        err = ((chosen - pxv) ** 2).sum((1, 2))
        return q0, q1, idx, err

    mean = proxy.mean(1, keepdims=True)
    axis = _principal_axis(proxy - mean)
    t = jnp.einsum("nic,nc->ni", proxy - mean, axis)
    hi = mean[:, 0] + axis * t.max(1)[:, None]
    lo = mean[:, 0] + axis * t.min(1)[:, None]

    best = candidate(hi, lo)
    wf = _W4.astype(jnp.float32) / 64.0
    for _ in range(iters):
        w = wf[best[2]]
        e1f, e0f = _ls_solve(proxy, w)
        cand = candidate(e0f, e1f)
        take = cand[3] < best[3]
        best = tuple(
            jnp.where(take[(...,) + (None,) * (b.ndim - 1)], c, b)
            for c, b in zip(cand, best)
        )
    return best


def _anchor_swap(q0, q1, idx):
    """Clear the anchor (pixel 0) index MSB by endpoint swap + inversion."""
    a = idx[:, 0]
    swap = a >= 8
    q0n = jnp.where(swap[:, None], q1, q0)
    q1n = jnp.where(swap[:, None], q0, q1)
    idx = jnp.where(swap[:, None], 15 - idx, idx)
    return q0n, q1n, idx


def _pack_mode11(q0, q1, idx, signed: bool):
    m = q0.shape[0]
    q0, q1, idx = _anchor_swap(q0, q1, idx)
    pk = _Packer(m)
    pk.put(jnp.full((m,), 0x03, jnp.int32), 5)
    mask = jnp.int32(0x3FF)
    for c in range(3):
        pk.put(q0[:, c] & mask, 10)
    for c in range(3):
        pk.put(q1[:, c] & mask, 10)
    _pack_indices(pk, idx, 4, [jnp.zeros((m,), jnp.int32)], pk.pos)
    return pk.stack()


def _pack_mode12(q0, q1, idx, signed: bool):
    m = q0.shape[0]
    q0, q1, idx = _anchor_swap(q0, q1, idx)
    # The swap can push the delta out of range; re-clamp (and re-derive q1)
    # exactly as the candidate step did pre-swap.  Post-swap delta is the
    # negation, which always fits except for d == -256 -> clamp to -256..255.
    d = jnp.clip(q1 - q0, -256, 255)
    q1 = q0 + d
    pk = _Packer(m)
    pk.put(jnp.full((m,), 0x07, jnp.int32), 5)
    mask10 = jnp.int32(0x3FF)
    for c in range(3):
        pk.put(q0[:, c] & mask10, 10)
    for c in range(3):
        pk.put(d[:, c] & jnp.int32(0x1FF), 9)
        pk.put((q0[:, c] >> 10) & 1, 1)
    _pack_indices(pk, idx, 4, [jnp.zeros((m,), jnp.int32)], pk.pos)
    return pk.stack()


# ---------------------------------------------------------------------------
# Two-region modes (layouts in bc6h_tables.py, Mesa-extracted)
# ---------------------------------------------------------------------------

import numpy as np

from cuttlefish_tpu.kernels.bc6h_tables import TWO_REGION_LAYOUT, TWO_REGION_MODES
from cuttlefish_tpu.kernels.bc7_tables import ANCHOR2, PARTITION2, WEIGHTS3

_W3 = jnp.asarray(WEIGHTS3)


def _screen_partitions2(proxy, k: int = 1):
    """Within-cluster SSE over the 32 BC6H partitions -> top-k d [N,k]."""
    masks = jnp.asarray(PARTITION2[:32].astype(np.float32))  # [32,16]
    sum_all = proxy.sum(1)                                   # [N,3]
    sq_all = (proxy * proxy).sum((1, 2))
    s1 = jnp.einsum("st,ntc->nsc", masks, proxy)
    n1 = masks.sum(-1)
    s0 = sum_all[:, None, :] - s1
    n0 = 16.0 - n1
    explained = (s1 * s1).sum(-1) / n1 + (s0 * s0).sum(-1) / n0
    sse = sq_all[:, None] - explained
    if k <= 1:
        return jnp.argmin(sse, axis=-1).astype(jnp.int32)[:, None]
    _, ids = jax.lax.top_k(-sse, k)
    return ids.astype(jnp.int32)


def _region_geometry(proxy, d):
    """Partition d [N] -> (mask [N,2,16], anchor_oh [N,16])."""
    masks = jnp.asarray(PARTITION2[:32].astype(np.float32))
    anchors = jnp.asarray(ANCHOR2[:32].astype(np.float32))
    oh_d = jax.nn.one_hot(d, 32, dtype=jnp.float32)
    r1 = jnp.einsum("ns,st->nt", oh_d, masks)
    mask = jnp.stack([1.0 - r1, r1], axis=1)
    anchor1 = jnp.einsum("ns,s->n", oh_d, anchors).astype(jnp.int32)
    return mask, jax.nn.one_hot(anchor1, 16, dtype=jnp.float32)


def _fit_regions_float(proxy, pxs, mask, anchor_oh, iters: int):
    """Mode-independent float endpoint fit per region (shared across the
    two-region modes; each mode then only quantizes + indexes once).

    The refine loop keeps the BEST iterate by continuous assign-SSE (the
    clipped-weight alternating LS can oscillate on noise content), so deeper
    refinement never returns worse endpoints — the quality ladder is monotone
    in the continuous metric by construction (same guard PVRTC got in r3)."""
    n = proxy.shape[0]
    cnt = mask.sum(-1)[..., None] + 1e-6
    mean = jnp.einsum("npt,ntc->npc", mask, proxy) / cnt
    centered = (proxy[:, None, :, :] - mean[:, :, None, :]) * mask[..., None]
    cov = jnp.einsum("nptc,nptd->npcd", centered, centered)
    v = jnp.ones((n, 2, 3), jnp.float32)
    for _ in range(3):
        nv = jnp.einsum("npcd,npd->npc", cov, v)
        nn_ = jnp.linalg.norm(nv, axis=-1, keepdims=True)
        v = jnp.where(nn_ > 1e-10, nv / (nn_ + 1e-20), v)
    proj = jnp.einsum("nptc,npc->npt", centered, v)
    e0 = mean + v * proj.min(-1)[..., None]
    e1 = mean + v * proj.max(-1)[..., None]

    def _texel_w(e0, e1):
        """Per-texel clipped continuous weight for endpoints (e0,e1)."""
        e0t = jnp.einsum("npt,npc->ntc", mask, e0)
        e1t = jnp.einsum("npt,npc->ntc", mask, e1)
        dd = e1t - e0t
        denom = (dd * dd).sum(-1) + 1e-6
        w = jnp.clip(((proxy - e0t) * dd).sum(-1) / denom, 0.0, 1.0)
        return w, e0t, dd

    def _cont_sse(w, e0t, dd):
        rec = e0t + w[..., None] * dd
        return (((rec - proxy) * pxs) ** 2).sum((1, 2))

    w, e0t, dd = _texel_w(e0, e1)
    best_e0, best_e1 = e0, e1
    best_sse = _cont_sse(w, e0t, dd)

    # refine with continuous weights (mode-independent), keep-best guarded
    for _ in range(max(0, iters - 1)):
        mw = mask * w[:, None, :]
        m1w = mask * (1.0 - w[:, None, :])
        a = (mw * w[:, None, :]).sum(-1)
        bq = (mw * (1.0 - w[:, None, :])).sum(-1)
        cc = (m1w * (1.0 - w[:, None, :])).sum(-1)
        r1v = jnp.einsum("npt,ntc->npc", mw, proxy)
        r0v = jnp.einsum("npt,ntc->npc", m1w, proxy)
        det = a * cc - bq * bq
        safe = jnp.abs(det) > 1e-6
        det = jnp.where(safe, det, 1.0)
        e1n = (cc[..., None] * r1v - bq[..., None] * r0v) / det[..., None]
        e0n = (a[..., None] * r0v - bq[..., None] * r1v) / det[..., None]
        e0 = jnp.where(safe[..., None], e0n, e0)
        e1 = jnp.where(safe[..., None], e1n, e1)
        w, e0t, dd = _texel_w(e0, e1)
        sse = _cont_sse(w, e0t, dd)
        take = (sse < best_sse)[:, None, None]
        best_e0 = jnp.where(take, e0, best_e0)
        best_e1 = jnp.where(take, e1, best_e1)
        best_sse = jnp.minimum(sse, best_sse)
    e0, e1 = best_e0, best_e1

    # orient each region so its anchor texel is nearer e0 (keeps the
    # anchor's index MSB clear without endpoint swaps at pack time)
    a_t0 = proxy[:, 0, :]
    a_t1 = jnp.einsum("nt,ntc->nc", anchor_oh, proxy)
    a_t = jnp.stack([a_t0, a_t1], axis=1)
    d0 = ((a_t - e0) ** 2).sum(-1)
    d1 = ((a_t - e1) ** 2).sum(-1)
    flip = (d1 < d0)[..., None]
    return jnp.where(flip, e1, e0), jnp.where(flip, e0, e1), best_sse


def _fit_two_region(proxy, pxv, pxs, mask, anchor_oh, e0, e1, mode_id: int,
                    signed: bool, code: bool = False):
    """Quantize + index the shared float fit for one two-region mode.

    Returns (fields dict rw/rx/ry/rz [N,3] raw ints, idx [N,16], err [N]);
    index choice and err are value-domain.
    """
    _, _, epbits, dbits, direct = TWO_REGION_MODES[mode_id]
    n = proxy.shape[0]
    unq = _unquant_signed if signed else _unquant_unsigned

    q0 = jnp.stack([_quant_candidates(e0[:, p], epbits, signed) for p in range(2)], 1)
    q1 = jnp.stack([_quant_candidates(e1[:, p], epbits, signed) for p in range(2)], 1)

    rw = q0[:, 0, :]
    fields = {"rw": rw}
    effs = []
    for name, val in (("rx", q1[:, 0, :]), ("ry", q0[:, 1, :]), ("rz", q1[:, 1, :])):
        if direct:
            fields[name] = val
            effs.append(val)
        else:
            dd = []
            for c in range(3):
                h = 1 << (dbits[c] - 1)
                dd.append(jnp.clip(val[:, c] - rw[:, c], -h, h - 1))
            dlt = jnp.stack(dd, -1)
            fields[name] = dlt
            effs.append(rw + dlt)
    v01, v10, v11 = effs

    def palette(lo, hi):
        u0 = unq(lo, epbits)
        u1 = unq(hi, epbits)
        w = _W3[None, :, None]
        interp = (u0[:, None, :] * (64 - w) + u1[:, None, :] * w + 32) >> 6
        return _finalize(interp, signed).astype(jnp.float32)

    pal = jnp.stack([palette(rw, v01), palette(v10, v11)], 1)  # [N,2,8,3]
    pal_t = jnp.einsum("npt,npkc->ntkc", mask, pal)            # [N,16,8,3]
    d2 = (
        ((proxy[:, :, None, :] - pal_t) * pxs[:, :, None, :]) ** 2
    ).sum(-1)
    idx = d2.argmin(-1).astype(jnp.int32)
    is_anchor = jnp.zeros((n, 16), bool).at[:, 0].set(True) | (anchor_oh > 0.5)
    idx = jnp.where(is_anchor, jnp.minimum(idx, 3), idx)
    oh = jax.nn.one_hot(idx, 8, dtype=jnp.float32)
    chosen = jnp.einsum("ntk,ntkc->ntc", oh, pal_t)
    if not code:
        chosen = _proxy_to_value(chosen)
    err = ((chosen - pxv) ** 2).sum((1, 2))
    return fields, idx, err


def _pack_two_region(mode_id: int, fields, d, idx):
    """Pack via the Mesa-extracted layout."""
    mv, ml, epbits, dbits, direct = TWO_REGION_MODES[mode_id]
    m = idx.shape[0]
    words = [jnp.zeros((m,), jnp.uint32) for _ in range(4)]
    words[0] = words[0] | jnp.uint32(mv)
    for block_bit, field, field_bit, ch in TWO_REGION_LAYOUT[mode_id]:
        bit = (fields[field][:, ch].astype(jnp.uint32) >> jnp.uint32(field_bit)) & 1
        w, bo = divmod(block_bit, 32)
        words[w] = words[w] | (bit << jnp.uint32(bo))
    # partition
    dv = d.astype(jnp.uint32)
    for i in range(5):
        w, bo = divmod(77 + i, 32)
        words[w] = words[w] | (((dv >> jnp.uint32(i)) & 1) << jnp.uint32(bo))
    # indices: 3-bit, anchors (pixel 0, ANCHOR2[d]) 2-bit
    anchors = jnp.asarray(ANCHOR2[:32].astype(np.int32))
    anchor1 = jnp.take(anchors, d)
    pos0 = jnp.full((m,), 82, jnp.int32)
    # static unroll over texels; per-texel width depends on runtime anchor ->
    # compute positions arithmetically: width_i = 3 - (i==0) - (i==anchor1)
    widths = 3 - jnp.where(jnp.arange(16)[None, :] == 0, 1, 0) - jnp.where(
        jnp.arange(16)[None, :] == anchor1[:, None], 1, 0
    )  # [N,16]
    starts = jnp.concatenate(
        [pos0[:, None], pos0[:, None] + jnp.cumsum(widths, axis=1)[:, :-1]], axis=1
    )  # [N,16]
    for i in range(16):
        v = idx[:, i].astype(jnp.uint32)
        start = starts[:, i]
        for bit in range(3):
            bb = start + bit
            val = (v >> jnp.uint32(bit)) & 1
            for w in range(2, 4):
                in_word = (bb >= w * 32) & (bb < (w + 1) * 32)
                sh = jnp.clip(bb - w * 32, 0, 31).astype(jnp.uint32)
                words[w] = words[w] | jnp.where(in_word, val << sh, 0)
    return jnp.stack(words, axis=-1)


_BC6H_ITERS = (1, 2, 3, 5, 8)

# quality -> two-region mode ids evaluated (mode 2's 6-bit deltas carry
# far-apart clusters; mode 1's 10-bit base carries gentle splits; mode 10
# is the direct fallback)
_TWO_REGION_PLAN = {
    0: (),
    1: (),
    2: (1, 2, 10),
    3: (1, 2, 6, 10),
    4: tuple(range(1, 11)),
}

# quality -> partition candidates deep-screened by the continuous float
# fit (estimate-then-refine: rank the top-k cluster-SSE seeds by their
# line-fit SSE, mode-fit only the per-block winner).  The thorough-class
# CPU bar (native/src/bc6h_cpu.cpp q4: top-8 partitions + quant sweep)
# showed cluster-SSE argmin alone misranks noise content by ~0.6 dB.
_PART_SEEDS = {0: 1, 1: 1, 2: 1, 3: 2, 4: 6}


def encode_bc6h(blocks, quality=2, signed=False, metric="value"):
    """Encode [N,16,3] float RGB (HDR) blocks to BC6H [N,4] uint32 words.

    metric selects the candidate-selection error domain (the same kind of
    knob the reference exposes for ETC via etc2comp's error metrics,
    EtcConverter.cpp:56-115):
      - "value": linear value-domain SSE (peak-relative PSNR — flat
        fields and bright regions dominate).  The default and the domain
        the quality harness reports.
      - "code":  half-bit code-domain SSE, approximately log/relative
        error — what ispc_texcomp-class HDR encoders minimize; use for
        perceptual/log-domain targets.

    Dispatch: Pallas kernel on TPU (kernels/bc6h_pallas.py), jnp path
    otherwise; CUTTLEFISH_PALLAS=0 disables, =1 forces interpret mode."""
    import os

    use = os.environ.get("CUTTLEFISH_PALLAS", "auto")
    if use != "0":
        if jax.default_backend() == "tpu":
            from cuttlefish_tpu.kernels.bc6h_pallas import encode_bc6h_pallas

            return encode_bc6h_pallas(
                blocks, int(quality), bool(signed), metric=str(metric)
            )
        if use == "1":
            from cuttlefish_tpu.kernels.bc6h_pallas import encode_bc6h_pallas

            return encode_bc6h_pallas(
                blocks, int(quality), bool(signed), interpret=True,
                metric=str(metric),
            )
    return _encode_bc6h_jnp(blocks, quality, signed, str(metric))


@functools.partial(jax.jit, static_argnames=("quality", "signed", "metric"))
def _encode_bc6h_jnp(
    blocks: jnp.ndarray, quality: int = 2, signed: bool = False,
    metric: str = "value",
) -> jnp.ndarray:
    """jnp reference path (all quality levels)."""
    proxy = _to_proxy(blocks.astype(jnp.float32), signed)
    if metric == "code":
        pxv = proxy
        pxs = jnp.ones_like(proxy)
    else:
        pxv = _proxy_to_value(proxy)
        pxs = _proxy_scale(proxy)
    iters = _BC6H_ITERS[max(0, min(4, int(quality)))]

    code = metric == "code"
    q0, q1, idx, best_err = _fit_mode(
        proxy, pxv, pxs, 10, signed, iters, code=code
    )
    words = _pack_mode11(q0, q1, idx, signed)

    if quality >= 2:
        q0b, q1b, idxb, err12 = _fit_mode(
            proxy, pxv, pxs, 11, signed, iters, delta_bits=9, code=code
        )
        w12 = _pack_mode12(q0b, q1b, idxb, signed)
        take = err12 < best_err
        words = jnp.where(take[:, None], w12, words)
        best_err = jnp.minimum(best_err, err12)

    mode_ids = _TWO_REGION_PLAN[max(0, min(4, int(quality)))]
    if mode_ids:
        k2 = _PART_SEEDS[max(0, min(4, int(quality)))]
        seeds = _screen_partitions2(proxy, k2)  # [N,k2]
        d = seeds[:, 0]
        cand_ds = [d]
        if k2 > 1:
            # Estimate-then-refine: rank the cluster-SSE seeds by a
            # SHALLOW (2-iter) continuous line-fit SSE, then deep-fit the
            # per-block winner PLUS the cluster-SSE argmin (the lower
            # qualities' only candidate, so the ladder stays monotone
            # when the continuous rank mis-chooses).  The thorough-class
            # CPU bar (native/src/bc6h_cpu.cpp q4) showed argmin-1
            # misranks noise content by ~0.6 dB.
            mask, anchor_oh = _region_geometry(proxy, d)
            _, _, fit_sse = _fit_regions_float(
                proxy, pxs, mask, anchor_oh, 2
            )
            dwin = d
            for kk in range(1, k2):
                dk = seeds[:, kk]
                mk, ak = _region_geometry(proxy, dk)
                _, _, sk = _fit_regions_float(proxy, pxs, mk, ak, 2)
                take = sk < fit_sse
                dwin = jnp.where(take, dk, dwin)
                fit_sse = jnp.minimum(fit_sse, sk)
            cand_ds = [dwin, d]
        for gi, dk in enumerate(cand_ds):
            # The argmin geometry (gi == 1) exists to keep the ladder
            # monotone: lower qualities search exactly modes (1, 2, 10)
            # on it, so covering that subset suffices — the rank winner
            # carries the full q4 mode breadth.
            gmodes = mode_ids if gi == 0 else _TWO_REGION_PLAN[2]
            mask, anchor_oh = _region_geometry(proxy, dk)
            e0, e1, _ = _fit_regions_float(
                proxy, pxs, mask, anchor_oh, iters
            )
            for mode_id in gmodes:
                fields, idx2, err2 = _fit_two_region(
                    proxy, pxv, pxs, mask, anchor_oh, e0, e1, mode_id,
                    signed, code=code,
                )
                w2 = _pack_two_region(mode_id, fields, dk, idx2)
                take = err2 < best_err
                words = jnp.where(take[:, None], w2, words)
                best_err = jnp.minimum(best_err, err2)
    return words
