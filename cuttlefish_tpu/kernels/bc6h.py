"""BC6H block encoder (batched JAX) — HDR RGB, unsigned/signed half floats.

TPU-native replacement for ispc_texcomp / Compressonator BC6H
(`/root/reference/lib/src/S3tcConverter.cpp:492-591`).  One-region modes 11
(10.10 absolute) and 12 (11.9 delta), chosen per block by exact decode-model
error; two-region modes are a later extension (the one-region modes carry
the bulk of quality on photographic HDR content).

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


def _fit_mode(proxy, bits: int, signed: bool, iters: int, delta_bits: int = 0):
    """One-region fit at `bits` precision; optional delta clamp for e1.

    Returns (q0, q1, idx, err); q1 is absolute (delta applied by packer).
    """

    def candidate(e0, e1):
        q0 = _quant_candidates(e0, bits, signed)
        q1 = _quant_candidates(e1, bits, signed)
        if delta_bits:
            half = 1 << (delta_bits - 1)
            d = jnp.clip(q1 - q0, -half, half - 1)
            q1 = q0 + d
        pal = _palette(q0, q1, bits, signed)
        d2 = proxy[:, :, None, :] - pal[:, None, :, :]
        e = (d2 * d2).sum(-1)
        idx = e.argmin(-1).astype(jnp.int32)
        return q0, q1, idx, e.min(-1).sum(-1)

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


_BC6H_ITERS = (1, 2, 3, 5, 8)


@functools.partial(jax.jit, static_argnames=("quality", "signed"))
def encode_bc6h(
    blocks: jnp.ndarray, quality: int = 2, signed: bool = False
) -> jnp.ndarray:
    """Encode [N,16,3] float RGB (HDR) blocks to BC6H [N,4] uint32 words."""
    proxy = _to_proxy(blocks.astype(jnp.float32), signed)
    iters = _BC6H_ITERS[max(0, min(4, int(quality)))]

    q0, q1, idx, err11 = _fit_mode(proxy, 10, signed, iters)
    words = _pack_mode11(q0, q1, idx, signed)

    if quality >= 2:
        q0b, q1b, idxb, err12 = _fit_mode(proxy, 11, signed, iters, delta_bits=9)
        w12 = _pack_mode12(q0b, q1b, idxb, signed)
        take = err12 < err11
        words = jnp.where(take[:, None], w12, words)
    return words
