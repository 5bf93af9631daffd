"""ASTC LDR block encoder (batched JAX).

TPU-native replacement for astc-encoder
(`/root/reference/lib/src/AstcConverter.cpp`).  Round-1 scope: all 14 2D
block sizes, single-partition blocks with

  - color endpoint modes 8 (LDR RGB direct) and 12 (LDR RGBA direct),
  - bits-only ISE ranges (2^k quantization for weights and endpoints, so the
    ISE stream is plain bit packing -- a strict, fully conformant subset),
  - weight-grid decimation via the spec's fixed-point bilinear infill
    (C.2.18), with grid-weight fitting through a precomputed pseudo-inverse,
  - void-extent blocks for uniform content.

Multi-partition, dual-plane, trit/quint ISE, and HDR endpoint modes are
future extensions; this subset already covers the main rate/quality knobs
(weight count x weight precision x endpoint precision per block size).

The error model reproduces the spec decoder exactly (16-bit endpoint
expansion, 64-weight interpolation, top-byte output).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from cuttlefish_tpu.kernels.bc import _ls_solve, _principal_axis

# ---------------------------------------------------------------------------
# Static tables
# ---------------------------------------------------------------------------


def _weight_unquant(levels_bits: int) -> np.ndarray:
    """Bits-only weight unquantization: replicate to 6 bits, bump >32."""
    n = 1 << levels_bits
    out = np.zeros(n, np.int32)
    for v in range(n):
        x, shift = 0, 6
        while shift > 0:
            shift -= levels_bits
            x |= (v << shift) if shift >= 0 else (v >> -shift)
        x &= 0x3F
        if x > 32:
            x += 1
        out[v] = x
    return out


def _color_unquant(bits: int) -> np.ndarray:
    """Bits-only color unquantization: bit replication to 8 bits."""
    n = 1 << bits
    out = np.zeros(n, np.int32)
    for v in range(n):
        x, shift = 0, 8
        while shift > 0:
            shift -= bits
            x |= (v << shift) if shift >= 0 else (v >> -shift)
        out[v] = x & 0xFF
    return out


def infill_weights(bw: int, bh: int, gw: int, gh: int) -> np.ndarray:
    """Spec C.2.18 bilinear infill as a [bw*bh, gw*gh] int matrix (/16)."""
    a = np.zeros((bw * bh, gw * gh), np.int32)
    ds = (1024 + bw // 2) // (bw - 1)
    dt = (1024 + bh // 2) // (bh - 1)
    for ty in range(bh):
        for tx in range(bw):
            cs = ds * tx
            ct = dt * ty
            gs = (cs * (gw - 1) + 32) >> 6
            gt = (ct * (gh - 1) + 32) >> 6
            js, fs = gs >> 4, gs & 0xF
            jt, ft = gt >> 4, gt & 0xF
            w11 = (fs * ft + 8) >> 4
            w01 = fs - w11
            w10 = ft - w11
            w00 = 16 - fs - ft + w11
            t = ty * bw + tx

            def put(jx, jy, w):
                if w and jx < gw and jy < gh:
                    a[t, jy * gw + jx] += w

            put(js, jt, w00)
            put(js + 1, jt, w01)
            put(js, jt + 1, w10)
            put(js + 1, jt + 1, w11)
    return a


# Block-mode field for grid (gw, gh) and weight bits, bits-only ranges.
# R (3 bits): placed as R0 = bit4, R[2:1] = bits[1:0]; H = bit9; D = bit10.
_WBITS_TO_RH = {1: (0b010, 0), 2: (0b100, 0), 3: (0b111, 0), 4: (0b100, 1), 5: (0b111, 1)}


def block_mode_field(gw: int, gh: int, wbits: int) -> int:
    r, h = _WBITS_TO_RH[wbits]
    r0 = r & 1
    r21 = r >> 1
    if 4 <= gw <= 7 and 2 <= gh <= 5:  # bits[3:2] = 00: W=B+4, H=A+2
        b, a, cfg = gw - 4, gh - 2, 0b00
    elif 8 <= gw <= 11 and 2 <= gh <= 5:  # 01: W=B+8, H=A+2
        b, a, cfg = gw - 8, gh - 2, 0b01
    elif 2 <= gw <= 5 and 8 <= gh <= 11:  # 10: W=A+2, H=B+8
        b, a, cfg = gh - 8, gw - 2, 0b10
    else:
        raise ValueError(f"unsupported weight grid {gw}x{gh}")
    return (
        (0 << 10)  # dual plane
        | (h << 9)
        | (b << 7)
        | (a << 5)
        | (r0 << 4)
        | (cfg << 2)
        | r21
    )


# The color-endpoint quantization range is IMPLIED by the bits remaining
# after the weight region (spec C.2.22): the largest range in the full ISE
# ladder (incl. trit/quint ranges) whose encoded size fits.  To stay within
# the bits-only subset, every config keeps remaining >= ise_cost(n, 256) so
# the implied range is 256 (8-bit plain values):
#   CEM 8  (6 values): weight bits <= 111 - 48 = 63
#   CEM 12 (8 values): weight bits <= 111 - 64 = 47
# Per-block-size configuration: ((gw, gh, wbits) for CEM8, same for CEM12).
_EP_BITS = 8

_CONFIGS: dict[tuple[int, int], tuple[tuple[int, int, int], tuple[int, int, int]]] = {
    (4, 4): ((4, 4, 3), (4, 4, 2)),
    (5, 4): ((5, 4, 3), (5, 4, 2)),
    (5, 5): ((5, 5, 2), (4, 4, 2)),
    (6, 5): ((6, 5, 2), (5, 4, 2)),
    (6, 6): ((6, 5, 2), (5, 4, 2)),
    (8, 5): ((6, 5, 2), (5, 4, 2)),
    (8, 6): ((6, 5, 2), (5, 4, 2)),
    (8, 8): ((6, 5, 2), (5, 4, 2)),
    (10, 5): ((6, 5, 2), (5, 4, 2)),
    (10, 6): ((6, 5, 2), (5, 4, 2)),
    (10, 8): ((6, 5, 2), (5, 4, 2)),
    (10, 10): ((6, 5, 2), (5, 4, 2)),
    (12, 10): ((6, 5, 2), (5, 4, 2)),
    (12, 12): ((6, 5, 2), (5, 4, 2)),
}

# Alternate CEM8 weight grid per size (fewer weights, 3-bit precision) —
# evaluated as a second candidate at quality >= Normal; wins on smooth
# content where decimation hurts less than weight quantization.
_ALT8_CONFIGS: dict[tuple[int, int], tuple[int, int, int]] = {
    (5, 5): (4, 4, 3),
    (6, 5): (5, 4, 3),
    (6, 6): (5, 4, 3),
    (8, 5): (5, 4, 3),
    (8, 6): (5, 4, 3),
    (8, 8): (5, 4, 3),
    (10, 5): (5, 4, 3),
    (10, 6): (5, 4, 3),
    (10, 8): (5, 4, 3),
    (10, 10): (5, 4, 3),
    (12, 10): (5, 4, 3),
    (12, 12): (5, 4, 3),
}


def astc_config(bw: int, bh: int):
    return _CONFIGS[(bw, bh)]


# ISE cost in bits for n values at a given range (levels).  Used by the
# decoder to reproduce the spec's implied-range selection.
_ISE_LADDER = [
    (256, "b", 8), (192, "t", 6), (160, "q", 5), (128, "b", 7), (96, "t", 5),
    (80, "q", 4), (64, "b", 6), (48, "t", 4), (40, "q", 3), (32, "b", 5),
    (24, "t", 3), (20, "q", 2), (16, "b", 4), (12, "t", 2), (10, "q", 1),
    (8, "b", 3), (6, "t", 1), (5, "q", 0), (4, "b", 2), (3, "t", 0),
    (2, "b", 1),
]


def ise_cost(n: int, kind: str, b: int) -> int:
    if kind == "b":
        return n * b
    if kind == "t":
        return (8 * n + 4) // 5 + n * b
    return (7 * n + 2) // 3 + n * b


def implied_color_range(n_vals: int, remaining_bits: int):
    """Largest ISE range fitting in `remaining_bits` (spec implied range)."""
    for levels, kind, b in _ISE_LADDER:
        if ise_cost(n_vals, kind, b) <= remaining_bits:
            return levels, kind, b
    raise ValueError("no color range fits")


# ---------------------------------------------------------------------------
# Encoding
# ---------------------------------------------------------------------------


def _quantize_colors(e, bits, unq_table):
    """e [M,C] float 0..255 -> (q [M,C] int, dec [M,C] int)."""
    maxq = (1 << bits) - 1
    q = jnp.clip(jnp.round(e * maxq / 255.0), 0, maxq).astype(jnp.int32)
    return q, unq_table[q]


def _decode_model(d0, d1, w64):
    """Exact spec interpolation: d* [M,C] int 8-bit, w64 [M,T] 0..64.

    Returns [M,T,C] float decoded 8-bit values.
    """
    e0 = (d0 << 8) | d0  # 16-bit expansion
    e1 = (d1 << 8) | d1
    c16 = (
        e0[:, None, :] * (64 - w64[:, :, None]) + e1[:, None, :] * w64[:, :, None] + 32
    ) >> 6
    return (c16 >> 8).astype(jnp.float32)


def _pack_bits_le(values, nbits, start, words):
    """Pack [M,K] ints, `nbits` each, sequentially from absolute bit
    `start` (LSB-first) into 4 uint32 words."""
    pos = start
    for k in range(values.shape[1]):
        v = values[:, k].astype(jnp.uint32) & jnp.uint32((1 << nbits) - 1)
        w, b = divmod(pos, 32)
        words[w] = words[w] | (v << jnp.uint32(b))
        if b + nbits > 32:
            words[w + 1] = words[w + 1] | (v >> jnp.uint32(32 - b))
        pos += nbits
    return pos


def _pack_weights_reversed(gq, wbits, words):
    """Weight stream: w0 first, LSB-first, then bit-reversed into the top of
    the block (stream bit i -> block bit 127-i)."""
    g = gq.shape[1]
    for k in range(g):
        v = gq[:, k].astype(jnp.uint32)
        for bit in range(wbits):
            stream_i = k * wbits + bit
            block_bit = 127 - stream_i
            w, b = divmod(block_bit, 32)
            words[w] = words[w] | (((v >> jnp.uint32(bit)) & 1) << jnp.uint32(b))


@functools.lru_cache(maxsize=64)
def _prepared_np(bw, bh, gw, gh, wbits):
    """Precomputed numpy constants for a (block, grid, wbits) combination.

    Cached as numpy (jnp constants must not leak across jit traces).
    """
    a = infill_weights(bw, bh, gw, gh)  # [T,G] /16
    af = a.astype(np.float64) / 16.0
    pinv = np.linalg.pinv(af).astype(np.float32)  # [G,T]
    wu = _weight_unquant(wbits)
    return a, pinv, wu


def _prepared(bw, bh, gw, gh, wbits):
    a, pinv, wu = _prepared_np(bw, bh, gw, gh, wbits)
    return jnp.asarray(a), jnp.asarray(pinv), jnp.asarray(wu)


def _fit_single_partition(colors, bw, bh, gw, gh, wbits, ep_bits, use_alpha, iters):
    """Core fit. colors [N,T,4] float 0..255.

    Returns (q0, q1, gq, err): quantized endpoint ints [N,C], grid weights
    [N,G], and exact-model error.  C = 3 (CEM8) or 4 (CEM12); for CEM8 the
    alpha error vs 255 is included.
    """
    a_mat, pinv, wu = _prepared(bw, bh, gw, gh, wbits)
    unq_c = jnp.asarray(_color_unquant(ep_bits))
    nch = 4 if use_alpha else 3
    target = colors[..., :nch]
    wlevels = 1 << wbits

    # Seed endpoints along the principal axis.
    mean = target.mean(1, keepdims=True)
    axis = _principal_axis(target - mean)
    t = jnp.einsum("nic,nc->ni", target - mean, axis)
    e1s = mean[:, 0] + axis * t.max(1)[:, None]
    e0s = mean[:, 0] + axis * t.min(1)[:, None]

    def unquant_w(gq):
        """Bits-only weight unquantization, arithmetic (no table gather):
        replicate to 6 bits (exact multiply for wbits in {1,2,3,6}), then
        bump values above 32 (spec C.2.19).  The closed form diverges from
        spec bit replication for wbits 4/5, so those are rejected here."""
        assert wbits in (1, 2, 3, 6), f"closed form invalid for wbits={wbits}"
        rep = gq * ((1 << 6) - 1) // ((1 << wbits) - 1)
        return rep + (rep > 32).astype(rep.dtype)

    def texel_w64(gq):
        """Grid quantized weights -> per-texel 0..64 (exact fixed point)."""
        u = unquant_w(gq)  # [N,G] 0..64
        return (jnp.einsum("tg,ng->nt", a_mat.astype(jnp.int32), u) + 8) >> 4

    def eval_exact(q0, q1, gq):
        d0 = q0 if ep_bits == 8 else unq_c[q0]
        d1 = q1 if ep_bits == 8 else unq_c[q1]
        if not use_alpha:
            d0 = jnp.concatenate([d0, jnp.full_like(d0[:, :1], 255)], -1)
            d1 = jnp.concatenate([d1, jnp.full_like(d1[:, :1], 255)], -1)
        dec = _decode_model(d0, d1, texel_w64(gq))
        err = ((dec - colors[..., : dec.shape[-1]]) ** 2).sum((1, 2))
        return err

    def ideal_t(e0, e1):
        """Per-texel ideal interpolation parameter in [0,1]."""
        d = e1 - e0
        denom = (d * d).sum(-1, keepdims=True) + 1e-6  # [N,1]
        proj = jnp.einsum("ntc,nc->nt", target - e0[:, None, :], d)
        return jnp.clip(proj / denom, 0.0, 1.0)

    def quant_grid(tw):
        g = jnp.einsum("gt,nt->ng", pinv, tw)
        return jnp.clip(
            jnp.round(jnp.clip(g, 0.0, 1.0) * (wlevels - 1)), 0, wlevels - 1
        ).astype(jnp.int32)

    e0, e1 = e0s, e1s
    best = None
    for _ in range(max(1, iters)):
        gq = quant_grid(ideal_t(e0, e1))
        q0, _ = _quantize_colors(e0, ep_bits, unq_c)
        q1, _ = _quantize_colors(e1, ep_bits, unq_c)
        err = eval_exact(q0, q1, gq)
        cand = (q0, q1, gq, err)
        if best is None:
            best = cand
        else:
            take = err < best[3]
            best = tuple(
                jnp.where(take[(...,) + (None,) * (b.ndim - 1)], c, b)
                for c, b in zip(cand, best)
            )
        # Refine endpoints by least squares against effective weights.
        w64 = texel_w64(gq).astype(jnp.float32) / 64.0
        e1, e0 = _ls_solve(target, w64)
        e0 = jnp.clip(e0, 0.0, 255.0)
        e1 = jnp.clip(e1, 0.0, 255.0)
    return best


def _enforce_s_order(q0, q1, gq, wbits, unq_c=None):
    """CEM 8/12 decode blue-contracts when s(v0)>s(v1); keep the direct path
    by swapping endpoints (and inverting weights) so s0 <= s1.

    Endpoints are 8-bit (unquantization is the identity), so the sums work
    on the stored values directly.
    """
    s0 = q0[:, :3].sum(-1)
    s1 = q1[:, :3].sum(-1)
    swap = s0 > s1
    q0n = jnp.where(swap[:, None], q1, q0)
    q1n = jnp.where(swap[:, None], q0, q1)
    gqn = jnp.where(swap[:, None], (1 << wbits) - 1 - gq, gq)
    return q0n, q1n, gqn


def _interleave(q0, q1):
    """(v0,v1) pairs per channel -> ISE order [M, 2*C]."""
    m, c = q0.shape
    out = jnp.zeros((m, 2 * c), jnp.int32)
    for i in range(c):
        out = out.at[:, 2 * i].set(q0[:, i])
        out = out.at[:, 2 * i + 1].set(q1[:, i])
    return out


def _pack_astc(mode_field, cem, colors_ise, ep_bits, gq, wbits, m):
    words = [jnp.zeros((m,), jnp.uint32) for _ in range(4)]
    hdr = jnp.full((m,), mode_field | (0 << 11) | (cem << 13), jnp.uint32)
    words[0] = words[0] | hdr
    _pack_bits_le(colors_ise, ep_bits, 17, words)
    _pack_weights_reversed(gq, wbits, words)
    return jnp.stack(words, axis=-1)


def _void_extent(colors):
    """Solid-color candidate: (words [N,4], err [N])."""
    m = colors.shape[0]
    mean = colors.mean(1)  # [N,4] 0..255
    v16 = jnp.clip(jnp.round(mean * 257.0), 0, 65535).astype(jnp.uint32)
    dec8 = (v16 >> 8).astype(jnp.float32)
    err = ((dec8[:, None, :] - colors) ** 2).sum((1, 2))
    w0 = jnp.full((m,), 0x1FC | (0b11 << 10), jnp.uint32)  # mode + reserved
    # All-ones void extent coordinates: bits 12..63.
    w0 = w0 | jnp.uint32(0xFFFFF000)
    w1 = jnp.full((m,), 0xFFFFFFFF, jnp.uint32)
    w2 = (v16[:, 0] | (v16[:, 1] << 16)).astype(jnp.uint32)
    w3 = (v16[:, 2] | (v16[:, 3] << 16)).astype(jnp.uint32)
    return jnp.stack([w0, w1, w2, w3], axis=-1), err


_ASTC_ITERS = (1, 1, 2, 3, 5)


@functools.partial(jax.jit, static_argnames=("block_w", "block_h", "quality"))
def encode_astc(
    blocks: jnp.ndarray, block_w: int = 4, block_h: int = 4, quality: int = 2
) -> jnp.ndarray:
    """Encode [N, bw*bh, 4] float RGBA (0..1) to ASTC [N,4] uint32 words."""
    colors = jnp.clip(blocks.astype(jnp.float32), 0, 1) * 255.0
    (g8, h8, w8), (g12, h12, w12) = astc_config(block_w, block_h)
    iters = _ASTC_ITERS[max(0, min(4, int(quality)))]
    m = colors.shape[0]

    unq = jnp.asarray(_color_unquant(_EP_BITS))

    # CEM 8 (RGB): alpha decodes to 255; eval_exact already includes the
    # (a-255)^2 term, so the CEM12 candidate wins automatically when the
    # block carries alpha.  At quality >= Normal an alternate grid config
    # (fewer weights, 3-bit precision) competes per block.
    cem8_configs = [(g8, h8, w8)]
    if quality >= 2 and (block_w, block_h) in _ALT8_CONFIGS:
        cem8_configs.append(_ALT8_CONFIGS[(block_w, block_h)])
    words8 = None
    err8 = None
    for cg, ch, cw_bits in cem8_configs:
        q0, q1, gq, e = _fit_single_partition(
            colors, block_w, block_h, cg, ch, cw_bits, _EP_BITS, False, iters
        )
        q0, q1, gq = _enforce_s_order(q0, q1, gq, cw_bits, unq)
        wds = _pack_astc(
            block_mode_field(cg, ch, cw_bits), 8, _interleave(q0, q1), _EP_BITS,
            gq, cw_bits, m,
        )
        if words8 is None:
            words8, err8 = wds, e
        else:
            take = e < err8
            words8 = jnp.where(take[:, None], wds, words8)
            err8 = jnp.where(take, e, err8)

    # CEM 12 (RGBA).
    q0a, q1a, gqa, err12 = _fit_single_partition(
        colors, block_w, block_h, g12, h12, w12, _EP_BITS, True, iters
    )
    q0a, q1a, gqa = _enforce_s_order(q0a, q1a, gqa, w12, unq)
    words12 = _pack_astc(
        block_mode_field(g12, h12, w12), 12, _interleave(q0a, q1a), _EP_BITS, gqa,
        w12, m,
    )

    wordsv, errv = _void_extent(colors)

    words = jnp.where((err12 < err8)[:, None], words12, words8)
    err = jnp.minimum(err12, err8)
    # Prefer void extent on (near-)ties: solid blocks score ~equal on both
    # paths, and XLA's fused arithmetic perturbs the two error sums by
    # ~1e-4, so an exact tie test is not reliable under jit.
    words = jnp.where((errv <= err + 0.01)[:, None], wordsv, words)
    return words
