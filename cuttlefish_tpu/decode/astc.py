"""ASTC LDR block decoder (numpy/python, per the Khronos ASTC spec).

Covers the subset the encoder emits -- single-partition CEM 8/12 blocks
with bits-only ISE ranges, weight-grid decimation, and void-extent blocks --
including the blue-contract path of CEM 8/12 for completeness.  Trit/quint
ISE, multi-partition, and dual-plane blocks raise NotImplementedError.
"""

from __future__ import annotations

import numpy as np

from cuttlefish_tpu.kernels.astc import (
    _color_unquant,
    _weight_unquant,
    implied_color_range,
    infill_weights,
)

_WBITS_FROM_RH = {
    (0b010, 0): 1,
    (0b100, 0): 2,
    (0b111, 0): 3,
    (0b100, 1): 4,
    (0b111, 1): 5,
}


def _parse_block_mode(mode: int):
    """11-bit field -> (gw, gh, wbits, dual) for the configs we support."""
    if (mode & 0x1FC) == 0x1FC:
        return None  # void extent (caller checks 9 bits, this is bits 2..8)
    d = (mode >> 10) & 1
    h = (mode >> 9) & 1
    b = (mode >> 7) & 0x3
    a = (mode >> 5) & 0x3
    r = (((mode & 0x3) << 1) | ((mode >> 4) & 1))
    cfg = (mode >> 2) & 0x3
    if cfg == 0b00:
        gw, gh = b + 4, a + 2
    elif cfg == 0b01:
        gw, gh = b + 8, a + 2
    elif cfg == 0b10:
        gw, gh = a + 2, b + 8
    else:
        raise NotImplementedError("ASTC block-mode config 11 not supported")
    if (r, h) not in _WBITS_FROM_RH:
        raise NotImplementedError(f"ASTC trit/quint weight range R={r:#b} H={h}")
    return gw, gh, _WBITS_FROM_RH[(r, h)], d


def _blue_contract(r, g, b, a):
    return ((r + b) >> 1, (g + b) >> 1, b, a)


def _decode_block(block: int, bw: int, bh: int) -> np.ndarray:
    out = np.zeros((bw * bh, 4), np.uint8)
    mode = block & 0x7FF
    if (mode & 0x1FF) == 0x1FC:  # void extent
        if (mode >> 9) & 1:
            raise NotImplementedError("HDR void extent")
        for c in range(4):
            v16 = (block >> (64 + 16 * c)) & 0xFFFF
            out[:, c] = v16 >> 8
        return out

    gw, gh, wbits, dual = _parse_block_mode(mode)
    if dual:
        raise NotImplementedError("dual-plane not supported")
    part_count = ((block >> 11) & 0x3) + 1
    if part_count != 1:
        raise NotImplementedError("multi-partition not supported")
    cem = (block >> 13) & 0xF
    if cem not in (8, 12):
        raise NotImplementedError(f"CEM {cem} not supported")
    nvals = 6 if cem == 8 else 8

    # Color endpoint range is implied by the remaining bits (spec C.2.22):
    # largest ISE range that fits between the header and the weight region.
    wtotal = gw * gh * wbits
    budget = 128 - wtotal - 17
    levels, kind, ep_bits = implied_color_range(nvals, budget)
    if kind != "b":
        raise NotImplementedError(
            f"implied color range {levels} uses {kind}-ISE (not emitted)"
        )
    unq_c = _color_unquant(ep_bits)
    vals = []
    pos = 17
    for _ in range(nvals):
        vals.append(unq_c[(block >> pos) & ((1 << ep_bits) - 1)])
        pos += ep_bits

    s0 = vals[0] + vals[2] + vals[4]
    s1 = vals[1] + vals[3] + vals[5]
    if cem == 8:
        e0 = (vals[0], vals[2], vals[4], 255)
        e1 = (vals[1], vals[3], vals[5], 255)
    else:
        e0 = (vals[0], vals[2], vals[4], vals[6])
        e1 = (vals[1], vals[3], vals[5], vals[7])
    if s0 > s1:
        e0, e1 = _blue_contract(*e1), _blue_contract(*e0)
        swapped = True
    else:
        swapped = False

    # Weights: stream bit i lives at block bit 127-i.
    unq_w = _weight_unquant(wbits)
    grid = np.zeros(gw * gh, np.int32)
    for k in range(gw * gh):
        v = 0
        for bit in range(wbits):
            i = k * wbits + bit
            v |= ((block >> (127 - i)) & 1) << bit
        grid[k] = unq_w[v]

    a_mat = infill_weights(bw, bh, gw, gh)
    w64 = (a_mat @ grid + 8) >> 4  # [T]
    if swapped:
        pass  # endpoint swap already applied; weights stay as stored

    for t in range(bw * bh):
        w = int(w64[t])
        for c in range(4):
            v0 = (e0[c] << 8) | e0[c]
            v1 = (e1[c] << 8) | e1[c]
            out[t, c] = ((v0 * (64 - w) + v1 * w + 32) >> 6) >> 8
    return out


def decode_astc(data: np.ndarray, block_w: int, block_h: int) -> np.ndarray:
    """[N*16] or [N,16] uint8 -> [N, bw*bh, 4] uint8 RGBA."""
    data = np.asarray(data, np.uint8).reshape(-1, 16)
    out = np.zeros((data.shape[0], block_w * block_h, 4), np.uint8)
    for n in range(data.shape[0]):
        out[n] = _decode_block(
            int.from_bytes(data[n].tobytes(), "little"), block_w, block_h
        )
    return out
