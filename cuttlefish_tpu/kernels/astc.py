"""ASTC LDR block encoder (batched JAX).

TPU-native replacement for astc-encoder
(`/root/reference/lib/src/AstcConverter.cpp`).  Round-2 scope: all 14 2D
block sizes with

  - the full ISE ladder (bits / trits / quints) for weights and color
    endpoints (tables Mesa-validated in kernels/astc_ise.py),
  - color endpoint modes 8 (RGB direct) and 12 (RGBA direct),
  - 1- and 2-partition blocks: all 1024 partition seeds screened with a
    mask-matrix matmul (within-cluster SSE), top-k refined exactly,
  - weight-grid decimation via the spec's fixed-point bilinear infill
    (C.2.18) with a pseudo-inverse grid fit,
  - void-extent blocks for uniform content.

Dual-plane and the HDR endpoint modes are the remaining extensions.

The quality ladder mirrors the reference's five presets
(`AstcConverter.cpp:174-195`): higher quality evaluates more
(grid, weight-range) layouts and refines more partition seeds.

The error model reproduces the spec decoder exactly (16-bit endpoint
expansion, 64-weight interpolation, top-byte output).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from cuttlefish_tpu.kernels.astc_ise import (
    color_unquant,
    ise_bits,
    ise_sequence_layout,
    quint_pack_table,
    range_info,
    trit_pack_table,
    weight_unquant,
)
from cuttlefish_tpu.kernels.astc_partition import (
    partition_table,
    unique_partition_seeds,
)
from cuttlefish_tpu.kernels.bc import _principal_axis

# ---------------------------------------------------------------------------
# Static tables
# ---------------------------------------------------------------------------

# Weight range -> (R, H) block-mode fields.
_RH_FROM_WRANGE = {
    2: (0b010, 0), 3: (0b011, 0), 4: (0b100, 0), 5: (0b101, 0),
    6: (0b110, 0), 8: (0b111, 0),
    10: (0b010, 1), 12: (0b011, 1), 16: (0b100, 1), 20: (0b101, 1),
    24: (0b110, 1), 32: (0b111, 1),
}

_COLOR_LADDER = [
    256, 192, 160, 128, 96, 80, 64, 48, 40, 32, 24, 20, 16, 12, 10, 8, 6, 5,
    4, 3, 2,
]


def implied_color_range(n_vals: int, budget: int) -> int:
    for levels in _COLOR_LADDER:
        kind, b = range_info(levels, False)
        if ise_bits(n_vals, kind, b) <= budget:
            return levels
    raise ValueError("no color range fits")


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
            for jx, jy, w in ((js, jt, w00), (js + 1, jt, w01),
                              (js, jt + 1, w10), (js + 1, jt + 1, w11)):
                if w and jx < gw and jy < gh:
                    a[t, jy * gw + jx] += w
    return a


def block_mode_field(gw: int, gh: int, wlevels: int, dual: bool = False) -> int:
    """11-bit block mode for a weight grid (spec C.2.10, both halves).

    Primary rows cover (4-7)x(2-5) / (8-11)x(2-5) / (2-5)x(8-11);
    the extended rows (bits[1:0] == 00) add 12x(2-5) / (2-5)x12 /
    (6-9)x(6-9) / 6x10 / 10x6 — the grids large blocks need (their
    per-texel decode is identical; the field layout differs).  Extended
    (A+6)x(B+6) rows carry no D/H bits: no dual plane and only the h=0
    weight ranges (2..8 levels)."""
    r, h = _RH_FROM_WRANGE[wlevels]
    r0 = r & 1
    r21 = r >> 1
    if 4 <= gw <= 7 and 2 <= gh <= 5:
        b, a, cfg = gw - 4, gh - 2, 0b00
    elif 8 <= gw <= 11 and 2 <= gh <= 5:
        b, a, cfg = gw - 8, gh - 2, 0b01
    elif 2 <= gw <= 5 and 8 <= gh <= 11:
        b, a, cfg = gh - 8, gw - 2, 0b10
    else:
        # Extended rows: R0 = bit 4, R[2:1] = bits[3:2], bits[1:0] = 00.
        base = (r21 << 2) | (r0 << 4)
        if gw == 12 and 2 <= gh <= 5:
            return (int(dual) << 10) | (h << 9) | (0b00 << 7) | ((gh - 2) << 5) | base
        if gh == 12 and 2 <= gw <= 5:
            return (int(dual) << 10) | (h << 9) | (0b01 << 7) | ((gw - 2) << 5) | base
        if (gw, gh) == (6, 10):
            return (int(dual) << 10) | (h << 9) | (0b11 << 7) | (0b00 << 5) | base
        if (gw, gh) == (10, 6):
            return (int(dual) << 10) | (h << 9) | (0b11 << 7) | (0b01 << 5) | base
        if 6 <= gw <= 9 and 6 <= gh <= 9:
            if dual or h:
                raise ValueError("extended (A+6)x(B+6) rows have no D/H bits")
            return ((gh - 6) << 9) | (0b10 << 7) | ((gw - 6) << 5) | base
        raise ValueError(f"unsupported weight grid {gw}x{gh}")
    return (
        (int(dual) << 10) | (h << 9) | (b << 7) | (a << 5)
        | (r0 << 4) | (cfg << 2) | r21
    )


# ---------------------------------------------------------------------------
# Layouts
# ---------------------------------------------------------------------------


class Layout:
    """A fully-determined block configuration (everything static)."""

    def __init__(self, bw, bh, nparts, cem, gw, gh, wlevels, dual=False):
        self.bw, self.bh = bw, bh
        self.nparts, self.cem = nparts, cem
        self.gw, self.gh, self.wlevels = gw, gh, wlevels
        self.dual = dual
        wkind, wb = range_info(wlevels, True)
        self.nweights = gw * gh * (2 if dual else 1)
        self.wbits = ise_bits(self.nweights, wkind, wb)
        self.header = 17 if nparts == 1 else 29
        self.nvals = nparts * 2 * ((cem >> 2) + 1)
        self.clevels = implied_color_range(
            self.nvals, 128 - self.header - self.wbits - (2 if dual else 0)
        )
        block_mode_field(gw, gh, wlevels, dual)  # raises if grid unsupported

    def valid(self):
        return (
            24 <= self.wbits <= 96
            and self.nweights <= 64
            and self.gw <= self.bw
            and self.gh <= self.bh
            and self.nvals <= 18
            and self.clevels >= 8
            and not (self.dual and self.nparts > 3)
        )

    def __repr__(self):
        return (
            f"Layout({self.nparts}p cem{self.cem} grid{self.gw}x{self.gh} "
            f"w{self.wlevels} c{self.clevels}{' dp' if self.dual else ''})"
        )


def _try_layout(bw, bh, nparts, cem, gw, gh, wlevels, dual=False):
    try:
        lay = Layout(bw, bh, nparts, cem, gw, gh, wlevels, dual)
    except ValueError:
        return None
    return lay if lay.valid() else None


@functools.lru_cache(maxsize=64)
def layout_menu(bw: int, bh: int):
    """Candidate layouts per (cem, nparts), quality-ordered lists."""

    def grids():
        out = []
        for gw in range(2, 13):
            for gh in range(2, 13):
                if gw <= bw and gh <= bh and gw * gh <= 64:
                    try:
                        block_mode_field(gw, gh, 2)
                    except ValueError:
                        continue
                    out.append((gw, gh))
        return out

    gs = grids()
    full = max(gs, key=lambda g: (g[0] * g[1], min(g)))

    def best_for(nparts, cem, min_clevels, prefer_wlevels, dual=False):
        """Pick the layout with the largest weight budget whose implied
        color range stays >= min_clevels, preferring finer weight ranges."""
        cands = []
        for gw, gh in gs:
            for wl in (32, 24, 20, 16, 12, 10, 8, 6, 5, 4, 3, 2):
                lay = _try_layout(bw, bh, nparts, cem, gw, gh, wl, dual)
                if lay and lay.clevels >= min_clevels:
                    cands.append(lay)
        if not cands:
            return None
        # score: texel coverage of the grid, then weight precision
        def score(l):
            cover = min(1.0, (l.gw * l.gh) / (bw * bh))
            return (cover, l.wlevels if l.wlevels <= prefer_wlevels else 0, l.clevels)
        return max(cands, key=score)

    menu = {}
    # CEM 8 single partition: a ladder of weight-precision tradeoffs.
    menu[(8, 1)] = [
        lay for lay in (
            best_for(1, 8, 64, 12),    # full grid, fine-ish weights
            best_for(1, 8, 192, 16),   # near-8-bit colors
            best_for(1, 8, 40, 24),    # finest weights
        ) if lay
    ]
    if bw * bh >= 64:
        # Large blocks: the cover-dominated score collapses all three
        # picks onto the max-coverage extended grid (8x8 w2); keep the
        # finer-weight decimated alternatives in the menu explicitly —
        # smooth content prefers weight precision over grid coverage.
        extra = [
            _try_layout(bw, bh, 1, 8, 6, 5, 4),
            _try_layout(bw, bh, 1, 8, 5, 5, 6),
        ]
        seen = {(l.gw, l.gh, l.wlevels) for l in menu[(8, 1)]}
        for lay in extra:
            if lay and (lay.gw, lay.gh, lay.wlevels) not in seen:
                menu[(8, 1)].append(lay)
                seen.add((lay.gw, lay.gh, lay.wlevels))
        # dedup the best_for collapses
        uniq = []
        seen2 = set()
        for lay in menu[(8, 1)]:
            k = (lay.gw, lay.gh, lay.wlevels)
            if k not in seen2:
                uniq.append(lay)
                seen2.add(k)
        menu[(8, 1)] = uniq
    menu[(12, 1)] = [
        lay for lay in (
            best_for(1, 12, 64, 8),
            best_for(1, 12, 96, 12),
            best_for(1, 12, 256, 4),   # full-precision colors, coarse grid
        ) if lay
    ]
    # CEM 0 (luminance direct): 2 color values leave nearly the whole
    # budget for the weight grid — the win case is grayscale content,
    # where RGB-replicated decode makes 8-bit luma + a fine grid beat
    # every CEM 8 layout.  CEM 4 adds direct alpha (L0,L1,A0,A1).
    menu[(0, 1)] = [lay for lay in (best_for(1, 0, 256, 32),) if lay]
    menu[(4, 1)] = [lay for lay in (best_for(1, 4, 64, 16),) if lay]
    menu[(8, 2)] = [
        lay for lay in (
            best_for(2, 8, 20, 6),    # fine-ish weights
            best_for(2, 8, 40, 4),    # finer colors (astc_cpu.cpp layout E)
        ) if lay
    ]
    menu[(12, 2)] = [lay for lay in (best_for(2, 12, 12, 4),) if lay]
    # 3-partition CEM 8 (18 endpoint values — the ISE ceiling): astcenc
    # searches up to 4 partitions at its higher presets.
    menu[(8, 3)] = [lay for lay in (best_for(3, 8, 8, 4),) if lay]
    # 4-partition blocks: CEM 8 x 4 would need 24 endpoint values (> the
    # 18-value ISE cap, spec C.2.24), so only the luminance CEMs fit —
    # CEM 0 (8 values) and CEM 4 (16).  The win case is multi-region
    # grayscale(+alpha) content; astcenc searches 4 partitions at
    # THOROUGH+ (AstcConverter.cpp:174-195).
    menu[(0, 4)] = [lay for lay in (best_for(4, 0, 64, 12),) if lay]
    menu[(4, 4)] = [lay for lay in (best_for(4, 4, 8, 4),) if lay]
    # Dual-plane single partition: one plane for the CCS channel, one for
    # the rest (spec C.2.10; the astcenc analog is 1-plane-of-2 trials).
    menu[(12, "dp")] = [lay for lay in (best_for(1, 12, 16, 6, dual=True),) if lay]
    menu[(8, "dp")] = [lay for lay in (best_for(1, 8, 24, 8, dual=True),) if lay]
    # Deduplicate identical layouts.
    for k, lays in menu.items():
        seen, out = set(), []
        for l in lays:
            key = (l.gw, l.gh, l.wlevels)
            if key not in seen:
                seen.add(key)
                out.append(l)
        menu[k] = out
    return menu


# ---------------------------------------------------------------------------
# Quantization helpers
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _color_qlut(levels: int):
    """256-entry byte -> (quantized value, dequantized byte) numpy LUTs."""
    unq = color_unquant(levels)
    bytes_ = np.arange(256)
    dist = np.abs(bytes_[:, None] - unq[None, :])
    q = np.argmin(dist, axis=1)
    return q.astype(np.int32), unq[q].astype(np.int32)


@functools.lru_cache(maxsize=None)
def _weight_qlut(levels: int):
    """65-entry w64 -> (quantized value, dequantized w64) numpy LUTs."""
    unq = weight_unquant(levels)
    w = np.arange(65)
    dist = np.abs(w[:, None] - unq[None, :])
    q = np.argmin(dist, axis=1)
    return q.astype(np.int32), unq[q].astype(np.int32)


@functools.lru_cache(maxsize=None)
def _weight_neighbors(levels: int):
    """Per quantized weight value: the neighbors one step up/down the
    UNQUANTIZED (w64) ladder.  ASTC quantized values are not stored in
    increasing unquant order, so +-1 on the raw value is meaningless —
    these tables give the true adjacent rungs for exact-error refinement."""
    unq = weight_unquant(levels)
    order = np.argsort(unq, kind="stable")  # ranks -> value
    rank_of = np.empty(levels, np.int64)
    rank_of[order] = np.arange(levels)
    up = order[np.minimum(rank_of + 1, levels - 1)]
    dn = order[np.maximum(rank_of - 1, 0)]
    return up.astype(np.int32), dn.astype(np.int32)


@functools.lru_cache(maxsize=None)
def _invert_map(levels: int, for_weights: bool):
    """v -> v' with unq[v'] == (64|255) - unq[v] (ladders are symmetric)."""
    unq = weight_unquant(levels) if for_weights else color_unquant(levels)
    top = 64 if for_weights else 255
    inv = np.zeros(levels, np.int32)
    for v in range(levels):
        matches = np.argwhere(unq == top - unq[v]).ravel()
        assert matches.size, (levels, v)
        inv[v] = matches[0]
    return inv


# ---------------------------------------------------------------------------
# ISE packing (JAX)
# ---------------------------------------------------------------------------


def _pack_ise_jax(values, levels, for_weights, start, words, reverse=False):
    """Pack [M,n] quantized values into the word list.

    start: absolute bit position of stream bit 0 (LSB-first) when not
    reversed; when reversed, stream bit i goes to block bit 127-i.
    """
    kind, b = range_info(levels, True if for_weights else False)
    n = values.shape[1]
    m = values & ((1 << b) - 1) if b else jnp.zeros_like(values)
    if kind == "b":
        packed = None
    else:
        d = values >> b
        per = 5 if kind == "t" else 3
        radix = 3 if kind == "t" else 5
        table = (trit_pack_table() if kind == "t" else quint_pack_table()).reshape(-1)
        ngroups = (n + per - 1) // per
        idxs = []
        for g in range(ngroups):
            # C-order flat index of the [radix]*per pack table: digit k has
            # stride radix^(per-1-k).
            acc = jnp.zeros(values.shape[:1], jnp.int32)
            for k_ in range(per):
                i = g * per + k_
                mult = radix ** (per - 1 - k_)
                if i < n:
                    acc = acc + d[:, i] * mult
            idxs.append(acc)
        idx = jnp.stack(idxs, axis=1)  # [M, ngroups]
        # one-hot matmul gather (MXU-friendly, avoids scatter/gather)
        oh = jax.nn.one_hot(idx, table.shape[0], dtype=jnp.float32)
        packed = jnp.einsum("mgk,k->mg", oh, jnp.asarray(table, jnp.float32))
        packed = packed.astype(jnp.uint32)

    layout = ise_sequence_layout(n, kind, b)
    for pos, (src, i, j) in enumerate(layout):
        if src == "m":
            if i < 0:
                continue
            bit = (m[:, i].astype(jnp.uint32) >> jnp.uint32(j)) & 1
        else:
            bit = (packed[:, i] >> jnp.uint32(j)) & 1
        block_bit = (127 - pos) if reverse else (start + pos)
        w, bo = divmod(block_bit, 32)
        words[w] = words[w] | (bit << jnp.uint32(bo))


# ---------------------------------------------------------------------------
# Core fit (1 or 2 partitions, CEM 8/12)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=256)
def _prepared_np(bw, bh, gw, gh):
    a = infill_weights(bw, bh, gw, gh)
    af = a.astype(np.float64) / 16.0
    pinv = np.linalg.pinv(af).astype(np.float32)
    return a, pinv


def _masked_ls(target, w, mask):
    """Per-partition LS endpoints.  target [N,T,C], w [N,T] in [0,1],
    mask [N,P,T] -> (e0, e1) [N,P,C]."""
    mw = mask * w[:, None, :]          # [N,P,T]
    m1w = mask * (1.0 - w[:, None, :])
    a = (mw * w[:, None, :]).sum(-1)           # [N,P] sum w^2
    bq = (mw * (1.0 - w[:, None, :])).sum(-1)  # sum w(1-w)
    c = (m1w * (1.0 - w[:, None, :])).sum(-1)  # sum (1-w)^2
    r1 = jnp.einsum("npt,ntc->npc", mw, target)   # sum w*x
    r0 = jnp.einsum("npt,ntc->npc", m1w, target)  # sum (1-w)*x
    det = a * c - bq * bq
    safe = jnp.abs(det) > 1e-6
    det = jnp.where(safe, det, 1.0)
    e1 = (c[..., None] * r1 - bq[..., None] * r0) / det[..., None]
    e0 = (a[..., None] * r0 - bq[..., None] * r1) / det[..., None]
    # fallback: masked mean when the system is singular
    cnt = mask.sum(-1)[..., None] + 1e-6
    mean = jnp.einsum("npt,ntc->npc", mask, target) / cnt
    e0 = jnp.where(safe[..., None], e0, mean)
    e1 = jnp.where(safe[..., None], e1, mean)
    return e0, e1


def _fit_layout(colors, lay: Layout, mask, iters):
    """Fit one layout.  colors [N,T,4] 0..255; mask [N,P,T] partition
    one-hot (P = lay.nparts).

    Returns (q0, q1, gq, err): quantized endpoints [N,P,C], grid weight
    values [N,G], exact-model error [N].  C = 3 (CEM8, alpha-vs-255 error
    included) or 4 (CEM12).
    """
    a_mat_np, pinv_np = _prepared_np(lay.bw, lay.bh, lay.gw, lay.gh)
    a_mat = jnp.asarray(a_mat_np)
    pinv = jnp.asarray(pinv_np)
    # Fit-space channels: CEM 8 = RGB, CEM 12 = RGBA, CEM 0 = luminance,
    # CEM 4 = luminance+alpha (decode replicates L to RGB, spec C.2.14).
    luma = lay.cem in (0, 4)
    if luma:
        gray = (colors[..., 0] + colors[..., 1] + colors[..., 2]) / 3.0
        if lay.cem == 4:
            target = jnp.stack([gray, colors[..., 3]], -1)
        else:
            target = gray[..., None]
    else:
        target = colors[..., : (4 if lay.cem == 12 else 3)]
    nch = target.shape[-1]
    n, t, _ = target.shape
    p = lay.nparts

    cq_lut, cd_lut = _color_qlut(lay.clevels)
    wq_lut, wd_lut = _weight_qlut(lay.wlevels)
    cq_lut = jnp.asarray(cq_lut)
    cd_lut = jnp.asarray(cd_lut, jnp.int32)
    wq_lut = jnp.asarray(wq_lut)
    wd_lut = jnp.asarray(wd_lut, jnp.int32)

    # --- seed endpoints: masked PCA per partition
    cnt = mask.sum(-1)[..., None] + 1e-6          # [N,P,1]
    mean = jnp.einsum("npt,ntc->npc", mask, target) / cnt
    centered = target[:, None, :, :] - mean[:, :, None, :]  # [N,P,T,C]
    centered = centered * mask[..., None]
    cov = jnp.einsum("nptc,nptd->npcd", centered, centered)
    v = jnp.ones((n, p, nch), jnp.float32)
    for _ in range(3):
        nv = jnp.einsum("npcd,npd->npc", cov, v)
        nn = jnp.linalg.norm(nv, axis=-1, keepdims=True)
        v = jnp.where(nn > 1e-10, nv / (nn + 1e-20), v)
    proj = jnp.einsum("nptc,npc->npt", centered, v)
    e0 = mean + v * proj.min(-1)[..., None]
    e1 = mean + v * proj.max(-1)[..., None]

    def orient(e0, e1):
        # CEM 0/4 decode has no endpoint-order rule (no blue contract).
        if luma:
            return e0, e1
        s0 = e0[..., :3].sum(-1)
        s1 = e1[..., :3].sum(-1)
        swap = (s0 > s1)[..., None]
        return jnp.where(swap, e1, e0), jnp.where(swap, e0, e1)

    def quant_colors(e):
        b = jnp.clip(jnp.round(e), 0, 255).astype(jnp.int32)
        q = jnp.take(cq_lut, b)
        dec = jnp.take(cd_lut, b)
        return q, dec

    def fix_order(q0, q1, d0, d1):
        """Quantization can flip the sums; swap quantized pairs back."""
        if luma:
            return q0, q1, d0, d1
        s0 = d0[..., :3].sum(-1)
        s1 = d1[..., :3].sum(-1)
        swap = (s0 > s1)[..., None]
        return (
            jnp.where(swap, q1, q0), jnp.where(swap, q0, q1),
            jnp.where(swap, d1, d0), jnp.where(swap, d0, d1),
        )

    unq_w_tab = jnp.asarray(weight_unquant(lay.wlevels), jnp.int32)

    def texel_w64_vals(gq_vals):
        u = jnp.take(unq_w_tab, gq_vals)
        return (jnp.einsum("tg,ng->nt", a_mat.astype(jnp.int32), u) + 8) >> 4

    def expand4(dt):
        """Fit-space decoded endpoints [N,T,nch] -> 4-channel RGBA."""
        if lay.cem == 12:
            return dt
        if lay.cem == 8:
            return jnp.concatenate(
                [dt, jnp.full_like(dt[..., :1], 255.0)], -1
            )
        lum = dt[..., 0:1]
        alpha = dt[..., 1:2] if lay.cem == 4 else jnp.full_like(lum, 255.0)
        return jnp.concatenate([lum, lum, lum, alpha], -1)

    def texel_err(d0t, d1t, gq_vals):
        # per-texel exact-model error [N,T] from expanded endpoints
        w64 = texel_w64_vals(gq_vals).astype(jnp.float32)[..., None]
        e0_16 = d0t * 257.0  # (x<<8)|x == x*257
        e1_16 = d1t * 257.0
        c16 = jnp.floor((e0_16 * (64.0 - w64) + e1_16 * w64 + 32.0) / 64.0)
        dec = jnp.floor(c16 / 256.0)
        return ((dec - colors) ** 2).sum(-1)

    def eval_exact(d0, d1, gq_vals):
        # d* [N,P,C] ints; per-texel endpoint select via mask
        d0t = expand4(jnp.einsum("npt,npc->ntc", mask, d0.astype(jnp.float32)))
        d1t = expand4(jnp.einsum("npt,npc->ntc", mask, d1.astype(jnp.float32)))
        return texel_err(d0t, d1t, gq_vals).sum(-1)

    up_np, dn_np = _weight_neighbors(lay.wlevels)
    up_tab = jnp.asarray(up_np)
    dn_tab = jnp.asarray(dn_np)
    foot = jnp.asarray((a_mat_np > 0).astype(np.float32))  # [T,G]

    def refine_weights(d0, d1, gq):
        """Exact-error coordinate steps on the weight grid: for each grid
        point try the adjacent unquant-ladder rungs (the nearest-w64
        rounding in quant_grid is not the exact-error argmin because the
        decode interpolates 16-bit-expanded endpoints with floors).  For
        full-resolution grids the footprint is the identity so this IS the
        per-texel exact sweep step the CPU reference encoder does; coarse
        ladders (<= 8 rungs) get a second step so the reachable window
        covers rounding misses of two rungs."""
        d0t = expand4(jnp.einsum("npt,npc->ntc", mask, d0.astype(jnp.float32)))
        d1t = expand4(jnp.einsum("npt,npc->ntc", mask, d1.astype(jnp.float32)))
        steps = 3 if lay.wlevels <= 12 else (2 if lay.wlevels <= 24 else 1)
        for _ in range(steps):
            cands = [gq, jnp.take(up_tab, gq), jnp.take(dn_tab, gq)]
            scores = [
                jnp.einsum("tg,nt->ng", foot, texel_err(d0t, d1t, c))
                for c in cands
            ]
            choice = jnp.argmin(jnp.stack(scores), axis=0)  # [N,G]
            gq = jnp.where(
                choice == 0, cands[0],
                jnp.where(choice == 1, cands[1], cands[2]),
            )
        return gq

    def ideal_t(d0, d1):
        d0t = jnp.einsum("npt,npc->ntc", mask, d0.astype(jnp.float32))
        d1t = jnp.einsum("npt,npc->ntc", mask, d1.astype(jnp.float32))
        d = d1t - d0t
        denom = (d * d).sum(-1) + 1e-6
        proj = ((target - d0t) * d).sum(-1)
        return jnp.clip(proj / denom, 0.0, 1.0)

    def quant_grid(tw):
        g = jnp.einsum("gt,nt->ng", pinv, tw)
        w64 = jnp.clip(jnp.round(jnp.clip(g, 0.0, 1.0) * 64.0), 0, 64).astype(jnp.int32)
        return jnp.take(wq_lut, w64)

    e0, e1 = orient(e0, e1)
    best = None
    for it in range(max(1, iters)):
        q0, d0 = quant_colors(e0)
        q1, d1 = quant_colors(e1)
        q0, q1, d0, d1 = fix_order(q0, q1, d0, d1)
        gq0 = quant_grid(ideal_t(d0, d1))
        gq = refine_weights(d0, d1, gq0)
        err = eval_exact(d0, d1, gq)
        if lay.gw != lay.bw or lay.gh != lay.bh:
            # Decimated grids: refine_weights scores each grid point from a
            # candidate where ALL points moved at once (overlapping
            # footprints make that an approximation), so guard with the
            # unrefined seed per block — deeper refinement never returns
            # worse (ADVICE r4 item 2; same keep-best pattern as BC6H).
            err0 = eval_exact(d0, d1, gq0)
            keep_seed = err0 < err
            gq = jnp.where(keep_seed[:, None], gq0, gq)
            err = jnp.minimum(err, err0)
        cand = (q0, q1, gq, err)
        if best is None:
            best = cand
        else:
            take = err < best[3]
            best = tuple(
                jnp.where(take[(...,) + (None,) * (b.ndim - 1)], c, b)
                for c, b in zip(cand, best)
            )
        if it + 1 < iters:
            w = texel_w64_vals(gq).astype(jnp.float32) / 64.0
            e0, e1 = _masked_ls(target, w, mask)
            e0 = jnp.clip(e0, 0.0, 255.0)
            e1 = jnp.clip(e1, 0.0, 255.0)
            e0, e1 = orient(e0, e1)
    return best


def _fit_dual_layout(colors, lay: Layout, ccs: int, iters):
    """Fit a single-partition dual-plane layout (spec C.2.10): plane 0
    weights drive every channel except ``ccs``, plane 1 drives ``ccs``.

    colors [N,T,4] 0..255.  Returns (q0, q1, gq, err) with gq [N, 2G]
    plane-interleaved (texel-major) as the decoder consumes it.
    """
    a_mat_np, pinv_np = _prepared_np(lay.bw, lay.bh, lay.gw, lay.gh)
    a_mat = jnp.asarray(a_mat_np)
    pinv = jnp.asarray(pinv_np)
    use_alpha = lay.cem == 12
    nch = 4 if use_alpha else 3
    target = colors[..., :nch]
    rest = [c for c in range(nch) if c != ccs]

    cq_lut, cd_lut = _color_qlut(lay.clevels)
    wq_lut, wd_lut = _weight_qlut(lay.wlevels)
    cq_lut = jnp.asarray(cq_lut)
    cd_lut = jnp.asarray(cd_lut, jnp.int32)
    wq_lut = jnp.asarray(wq_lut)
    unq_w_tab = jnp.asarray(weight_unquant(lay.wlevels), jnp.int32)

    # --- seeds: PCA over the rest-channels for plane 0; min/max for ccs
    restc = target[..., rest]                      # [N,T,len(rest)]
    mean = restc.mean(1, keepdims=True)
    cent = restc - mean
    cov = jnp.einsum("ntc,ntd->ncd", cent, cent)
    v = jnp.ones((cov.shape[0], len(rest)), jnp.float32)
    for _ in range(3):
        nv = jnp.einsum("ncd,nd->nc", cov, v)
        nn = jnp.linalg.norm(nv, axis=-1, keepdims=True)
        v = jnp.where(nn > 1e-10, nv / (nn + 1e-20), v)
    proj = jnp.einsum("ntc,nc->nt", cent, v)
    lo_r = mean[:, 0, :] + v * proj.min(-1, keepdims=True)
    hi_r = mean[:, 0, :] + v * proj.max(-1, keepdims=True)
    av = target[..., ccs]
    lo_a = av.min(-1, keepdims=True)
    hi_a = av.max(-1, keepdims=True)

    def assemble(r, a):
        cols = []
        ri = 0
        for c in range(nch):
            if c == ccs:
                cols.append(a[:, 0])
            else:
                cols.append(r[:, ri])
                ri += 1
        return jnp.stack(cols, axis=-1)

    e0 = assemble(lo_r, lo_a)
    e1 = assemble(hi_r, hi_a)

    def orient(e0, e1):
        s0 = e0[..., :3].sum(-1)
        s1 = e1[..., :3].sum(-1)
        swap = (s0 > s1)[..., None]
        return jnp.where(swap, e1, e0), jnp.where(swap, e0, e1)

    def quant_colors(e):
        b = jnp.clip(jnp.round(e), 0, 255).astype(jnp.int32)
        return jnp.take(cq_lut, b), jnp.take(cd_lut, b)

    def fix_order(q0, q1, d0, d1):
        s0 = d0[..., :3].sum(-1)
        s1 = d1[..., :3].sum(-1)
        swap = (s0 > s1)[..., None]
        return (
            jnp.where(swap, q1, q0), jnp.where(swap, q0, q1),
            jnp.where(swap, d1, d0), jnp.where(swap, d0, d1),
        )

    def texel_w64(gq_plane):
        u = jnp.take(unq_w_tab, gq_plane)
        return (jnp.einsum("tg,ng->nt", a_mat.astype(jnp.int32), u) + 8) >> 4

    def ideal_ts(d0, d1):
        d0f = d0.astype(jnp.float32)
        d1f = d1.astype(jnp.float32)
        dr = d1f[:, None, rest] - d0f[:, None, rest]
        denom = (dr * dr).sum(-1) + 1e-6
        t0 = ((target[..., rest] - d0f[:, None, rest]) * dr).sum(-1) / denom
        da = d1f[:, ccs] - d0f[:, ccs]
        t1 = (av - d0f[:, None, ccs]) / jnp.where(
            jnp.abs(da) > 1e-6, da, 1.0
        )[:, None]
        return jnp.clip(t0, 0.0, 1.0), jnp.clip(t1, 0.0, 1.0)

    def quant_grid(tw):
        g = jnp.einsum("gt,nt->ng", pinv, tw)
        w64 = jnp.clip(
            jnp.round(jnp.clip(g, 0.0, 1.0) * 64.0), 0, 64
        ).astype(jnp.int32)
        return jnp.take(wq_lut, w64)

    full_res = lay.gw == lay.bw and lay.gh == lay.bh

    def sweep_exact(d0, d1):
        """Full-resolution grids: per-texel exhaustive rung sweep per
        plane against the exact decode model (the rounding in quant_grid
        is not the exact-error argmin; the thorough-class CPU bar's
        exact sweep exposed a ~0.4 dB gap on uncorrelated-channel
        content).  Valid because a full-res grid has an identity
        footprint, so texels choose independently."""
        d0f = d0.astype(jnp.float32)[:, None, :]
        d1f = d1.astype(jnp.float32)[:, None, :]
        best0 = best1 = None
        gq0 = gq1 = None
        for lvl in range(lay.wlevels):
            w64 = float(int(weight_unquant(lay.wlevels)[lvl]))
            c16 = jnp.floor(
                (d0f * 257.0 * (64.0 - w64) + d1f * 257.0 * w64 + 32.0)
                / 64.0
            )
            dec = jnp.floor(c16 / 256.0)
            er = ((dec[..., rest] - target[..., rest]) ** 2).sum(-1)
            ea = (dec[..., ccs] - target[..., ccs]) ** 2
            if best0 is None:
                best0, best1 = er, ea
                gq0 = jnp.full(er.shape, lvl, jnp.int32)
                gq1 = jnp.full(ea.shape, lvl, jnp.int32)
            else:
                t0 = er < best0
                t1 = ea < best1
                gq0 = jnp.where(t0, lvl, gq0)
                gq1 = jnp.where(t1, lvl, gq1)
                best0 = jnp.minimum(er, best0)
                best1 = jnp.minimum(ea, best1)
        return gq0, gq1

    def eval_exact(d0, d1, gq0, gq1):
        w0 = texel_w64(gq0).astype(jnp.float32)
        w1 = texel_w64(gq1).astype(jnp.float32)
        d0f = d0.astype(jnp.float32)[:, None, :]
        d1f = d1.astype(jnp.float32)[:, None, :]
        if not use_alpha:
            d0f = jnp.concatenate(
                [d0f, jnp.full_like(d0f[..., :1], 255.0)], -1
            )
            d1f = jnp.concatenate(
                [d1f, jnp.full_like(d1f[..., :1], 255.0)], -1
            )
        nout = d0f.shape[-1]
        w = jnp.stack(
            [w1 if c == ccs else w0 for c in range(nout)], axis=-1
        )
        c16 = jnp.floor(
            (d0f * 257.0 * (64.0 - w) + d1f * 257.0 * w + 32.0) / 64.0
        )
        dec = jnp.floor(c16 / 256.0)
        return ((dec - colors[..., :nout]) ** 2).sum((1, 2))

    e0, e1 = orient(e0, e1)
    best = None
    for it in range(max(1, iters)):
        q0, d0 = quant_colors(e0)
        q1, d1 = quant_colors(e1)
        q0, q1, d0, d1 = fix_order(q0, q1, d0, d1)
        if full_res:
            gq0, gq1 = sweep_exact(d0, d1)
        else:
            t0, t1 = ideal_ts(d0, d1)
            gq0 = quant_grid(t0)
            gq1 = quant_grid(t1)
        err = eval_exact(d0, d1, gq0, gq1)
        gq = jnp.stack([gq0, gq1], axis=-1).reshape(gq0.shape[0], -1)
        cand = (q0, q1, gq, err)
        if best is None:
            best = cand
        else:
            take = err < best[3]
            best = tuple(
                jnp.where(take[(...,) + (None,) * (b.ndim - 1)], c, b)
                for c, b in zip(cand, best)
            )
        if it + 1 < iters:
            # LS refine per plane: weights w0 for rest channels, w1 for ccs
            w0 = texel_w64(gq0).astype(jnp.float32) / 64.0
            w1 = texel_w64(gq1).astype(jnp.float32) / 64.0
            onesm = jnp.ones((colors.shape[0], 1, colors.shape[1]), jnp.float32)
            e0r, e1r = _masked_ls(target[..., rest], w0, onesm)
            e0a, e1a = _masked_ls(target[..., ccs : ccs + 1], w1, onesm)
            e0 = assemble(
                jnp.clip(e0r[:, 0], 0.0, 255.0), jnp.clip(e0a[:, 0], 0.0, 255.0)
            )
            e1 = assemble(
                jnp.clip(e1r[:, 0], 0.0, 255.0), jnp.clip(e1a[:, 0], 0.0, 255.0)
            )
            e0, e1 = orient(e0, e1)
    return best


# ---------------------------------------------------------------------------
# Packing
# ---------------------------------------------------------------------------


def _pack_block(lay: Layout, q0, q1, gq, seed=None, ccs: int = 0):
    """q0/q1 [N,P,C] quantized color values, gq [N,G] quantized weight
    values ([N,2G] plane-interleaved when lay.dual), seed [N] partition
    seed (when nparts == 2), ccs the dual-plane color component selector."""
    m = gq.shape[0]
    words = [jnp.zeros((m,), jnp.uint32) for _ in range(4)]
    mode = block_mode_field(lay.gw, lay.gh, lay.wlevels, lay.dual)
    hdr = mode | ((lay.nparts - 1) << 11)
    if lay.nparts == 1:
        hdr_arr = jnp.full((m,), hdr | (lay.cem << 13), jnp.uint32)
    else:
        hdr_arr = jnp.full((m,), hdr, jnp.uint32)
        hdr_arr = hdr_arr | (seed.astype(jnp.uint32) << jnp.uint32(13))
        words[0] = words[0] | (jnp.uint32(lay.cem << 2) << jnp.uint32(23 - 32 + 32))
        # CEM field (low2=00 -> same CEM for all partitions) at bits 23..28
    words[0] = words[0] | hdr_arr
    if lay.nparts > 1:
        pass  # CEM bits already OR'd above
    # color ISE: interleave (v0,v1) per channel per partition
    nch = q0.shape[-1]
    cols = []
    for pidx in range(lay.nparts):
        for c in range(nch):
            cols.append(q0[:, pidx, c])
            cols.append(q1[:, pidx, c])
    colors_ise = jnp.stack(cols, axis=1)
    _pack_ise_jax(colors_ise, lay.clevels, False, lay.header, words)
    _pack_ise_jax(gq, lay.wlevels, True, 0, words, reverse=True)
    if lay.dual:
        # CCS: 2 bits directly below the (reversed) weight data; placed
        # bit-by-bit in case the pair straddles a 32-bit word boundary.
        pos = 128 - lay.wbits - 2
        for k in range(2):
            if (ccs >> k) & 1:
                w, bo = divmod(pos + k, 32)
                words[w] = words[w] | (jnp.uint32(1) << jnp.uint32(bo))
    return jnp.stack(words, axis=-1)


def _void_extent(colors):
    m = colors.shape[0]
    mean = colors.mean(1)
    v16 = jnp.clip(jnp.round(mean * 257.0), 0, 65535).astype(jnp.uint32)
    dec8 = (v16 >> 8).astype(jnp.float32)
    # Epsilon bias: ties between a regular layout and the void extent must
    # deterministically pick the VE (jit fusion float noise otherwise
    # breaks them either way); 1e-3 is far below half a quantization step.
    err = ((dec8[:, None, :] - colors) ** 2).sum((1, 2)) - 1e-3
    w0 = jnp.full((m,), 0x1FC | (0b11 << 10), jnp.uint32)
    w0 = w0 | jnp.uint32(0xFFFFF000)
    w1 = jnp.full((m,), 0xFFFFFFFF, jnp.uint32)
    w2 = (v16[:, 0] | (v16[:, 1] << 16)).astype(jnp.uint32)
    w3 = (v16[:, 2] | (v16[:, 3] << 16)).astype(jnp.uint32)
    return jnp.stack([w0, w1, w2, w3], axis=-1), err


# ---------------------------------------------------------------------------
# Partition screening
# ---------------------------------------------------------------------------


def _screen_partitions(colors, bw, bh, topk, nparts: int = 2):
    """Within-cluster-SSE proxy over the DISTINCT partition patterns ->
    top-k seed ids (the seed hash maps 1024 seeds onto ~40-80% as many
    patterns; see unique_partition_seeds).

    colors [N,T,4] -> seeds [N,K] int32.
    """
    useeds = unique_partition_seeds(bw, bh, nparts)
    table = partition_table(bw, bh, nparts)[useeds]  # [U, T]
    ms = [
        jnp.asarray((table == j).astype(np.float32))
        for j in range(1, nparts)
    ]  # membership of partitions 1..nparts-1, [S,T] each
    t = colors.shape[1]
    sum_all = colors.sum(1)                      # [N,C]
    sq_all = (colors * colors).sum((1, 2))       # [N]
    ss = [jnp.einsum("st,ntc->nsc", m, colors) for m in ms]  # [N,S,C]
    ns = [m.sum(-1) for m in ms]                 # [S]
    s0 = sum_all[:, None, :] - sum(ss)
    n0 = t - sum(ns)
    # avoid division by zero for degenerate seeds (an empty partition)
    explained = (s0 * s0).sum(-1) / jnp.maximum(n0, 1.0)
    for sj, nj in zip(ss, ns):
        explained = explained + (sj * sj).sum(-1) / jnp.maximum(nj, 1.0)
    sse = sq_all[:, None] - explained
    degenerate = n0 < 1
    for nj in ns:
        degenerate = degenerate | (nj < 1)
    sse = jnp.where(degenerate, jnp.inf, sse)
    _, idx = jax.lax.top_k(-sse, topk)
    return jnp.take(jnp.asarray(useeds), idx).astype(jnp.int32)


def _mask_for_seeds(seeds, bw, bh, nparts: int = 2):
    """seeds [N] -> mask [N,nparts,T] via one-hot matmul row select."""
    table = partition_table(bw, bh, nparts)  # [S,T]
    oh = jax.nn.one_hot(seeds, table.shape[0], dtype=jnp.float32)  # [N,S]
    ps = [
        jnp.einsum(
            "ns,st->nt", oh, jnp.asarray((table == j).astype(np.float32))
        )
        for j in range(1, nparts)
    ]
    return jnp.stack([1.0 - sum(ps)] + ps, axis=1)


# ---------------------------------------------------------------------------
# Top-level encode
# ---------------------------------------------------------------------------

# quality -> (iters, 2-part seeds refined, single-partition ladder depth,
# dual-plane CCS candidates; astcenc's "1 plane of 2" trials appear at the
# THOROUGH/EXHAUSTIVE presets, AstcConverter.cpp:174-195)
_PLAN = {
    0: dict(iters=1, seeds2=0, seeds3=0, seeds4=0, cem8_layouts=1,
            cem12_layouts=1, cem0_layouts=1, cem4_layouts=1, dp_ccs=()),
    1: dict(iters=1, seeds2=1, seeds3=0, seeds4=0, cem8_layouts=1,
            cem12_layouts=1, cem0_layouts=1, cem4_layouts=1, dp_ccs=()),
    # q2's layout menu depth was retuned in round 3: the 3rd CEM8 layout
    # is +1.7 dB on two-color content and the 2nd CEM12 layout +3.2 dB on
    # alpha ramps, for ~20% kernel time (480 -> ~385 MT/s) — ASTC 4x4 q2
    # then beats BC7 q2 on two-color content instead of trailing it.
    # Round 4: seeds2 deepened (estimate-then-refine makes extra seeds
    # cheap) and a 2nd 2-partition layout added so the TPU path stays >=
    # the astc_cpu.cpp reference encoder on two-population content
    # (tests/test_cpu_reference.py).
    # iters12: CEM 12 (alpha) layouts refine one level deeper — alpha
    # ramps are the content class that needs it.  p2_iters: deep-fit
    # depth for the ranked 2-partition seeds (the estimate pass already
    # filtered them, so full depth buys little).
    # Depths tuned on-TPU (chained-dispatch protocol; final 133/89/34
    # MT/s at q2/q3/q4): q2 two_pop 37.33 ties BC7 q2 (seeds2=6+keep2=2
    # is the knee — seeds2=3 drops to 37.24; iters=2 is 11% faster but
    # falls below the astc_cpu.cpp bar on two_lerp/alpha_ramp, so q2
    # keeps full refine depth).  q4 needs seeds2=16/keep2=5/p2_iters=4 to
    # stay >= the CPU reference's K=16 deep-fit on two_pop; lighter plans
    # (keep2=3/4) fall 0.06-0.07 dB short.  q2's dp_ccs=(3,) buys +1.55 dB
    # on RGBA noise (13.34 -> 14.89, closing the one class BC7 led) for 8%.
    # Round 5: seeds ranked by the continuous-SSE estimate over DISTINCT
    # partition patterns (screening dedupe) — top-6 patterns with keep2=1
    # measured within 0.02 dB of the old keep2=2-of-duplicated ranking on
    # every harness class, for ~2x kernel-B cost.
    2: dict(iters=3, iters12=4, seeds2=6, seeds3=0, seeds4=0,
            cem8_layouts=3, cem12_layouts=3, cem0_layouts=1,
            cem4_layouts=1, dp_ccs=(3,), p2_layouts=2, keep2=1,
            p2_iters=2),
    # q3 keep2 follows q2 (distinct-pattern top-6, deep-fit 1): q3's
    # 2-partition search then equals q2's exactly, and the extra
    # 3/4-partition + (12,2) sweeps keep the ladder monotone for free.
    3: dict(iters=3, iters12=4, seeds2=6, seeds3=1, seeds4=1,
            cem8_layouts=3, cem12_layouts=3, cem0_layouts=1,
            cem4_layouts=1, dp_ccs=(3,), p2_layouts=2, keep2=1,
            p2_iters=2),
    4: dict(iters=4, iters12=5, seeds2=16, seeds3=6, keep3=3, seeds4=2,
            cem8_layouts=3, cem12_layouts=3, cem0_layouts=1,
            cem4_layouts=1, dp_ccs=(0, 1, 2, 3), p2_layouts=2, keep2=5,
            p2_iters=4),
}


GRAY_SPREAD = 16.0 / 255.0  # max RGB channel spread for a "near-gray" texel


def has_gray_blocks(blocks) -> bool:
    """Host-side scan: does any block consist entirely of near-gray texels?

    The luminance CEMs 0/4 can only win on such blocks (encoding a colored
    texel as replicated luminance has large error by construction), so a
    batch with none lets the encoder skip those fits.  ``blocks`` is host
    [N, T, 4] float RGBA in 0..1."""
    import numpy as np_

    rgb = np_.asarray(blocks, np_.float32)[..., :3]
    spread = rgb.max(axis=2) - rgb.min(axis=2)  # [N,T]
    return bool((spread.max(axis=1) < GRAY_SPREAD).any())


def has_alpha_blocks(blocks) -> bool:
    """Host-side scan: does any texel carry non-opaque alpha?

    A fully-opaque batch lets the encoder skip every CEM 12 fit (incl.
    dual-plane): CEM 8's implicit alpha decodes to exactly 255, and the
    extra endpoint pair only costs color precision, so CEM 12 cannot win
    (measured <=0.0002 dB across the opaque harness classes).  The same
    role as astcenc's Alpha::None swizzle path
    (/root/reference/lib/src/AstcConverter.cpp:140-149)."""
    import numpy as np_

    a = np_.asarray(blocks, np_.float32)[..., 3]
    return bool((a < 254.5 / 255.0).any())


def encode_astc(
    blocks, block_w: int = 4, block_h: int = 4, quality: int = 2,
    gray: bool = True, alpha: bool = True,
):
    """Encode [N, bw*bh, 4] float RGBA (0..1) to ASTC [N,4] uint32 words.

    Dispatch: on TPU the Pallas kernel runs every block size and quality
    (kernels/astc_pallas.py, VMEM-resident layout sweep; decimated
    weight grids as in-kernel MXU matmuls; q3/q4 add dual-plane fits and
    top-k partition seeds); CPU uses the jnp path.  CUTTLEFISH_PALLAS=0
    disables, =1 forces the interpreted kernel.

    ``gray=False`` (set by callers when `has_gray_blocks` found none)
    skips the luminance CEM 0/4 fits on both paths; ``alpha=False``
    (callers: `has_alpha_blocks`) skips the CEM 12 / dual-plane fits."""
    import os

    gray = bool(gray)
    alpha = bool(alpha)
    use = os.environ.get("CUTTLEFISH_PALLAS", "auto")
    if use != "0":
        if jax.default_backend() == "tpu":
            from cuttlefish_tpu.kernels.astc_pallas import encode_astc_pallas

            return encode_astc_pallas(
                blocks, block_w, block_h, int(quality), gray=gray,
                alpha=alpha,
            )
        if use == "1":
            from cuttlefish_tpu.kernels.astc_pallas import encode_astc_pallas

            return encode_astc_pallas(
                blocks, block_w, block_h, int(quality), interpret=True,
                gray=gray, alpha=alpha,
            )
    return _encode_astc_jnp(blocks, block_w, block_h, quality, gray, alpha)


def _rank_seeds(colors, seeds, k, lay, bw, bh, nparts, keep: int = 1):
    """Estimate-then-refine seed selection (the astcenc "find best
    partitioning" pass in role): rank the k screened partition seeds by
    ONE unrefined fit of `lay` (quantize + grid-quantize + exact eval, no
    LS iterations) and return the per-block top-`keep` for the full
    iterated fit.  ~k/keep-fold cheaper at quality 3-4 than deep-fitting
    every seed, <0.05 dB on the quality harness."""
    if k <= keep:
        return [seeds[:, kk] for kk in range(min(k, seeds.shape[1]))]
    est = []
    for kk in range(k):
        mask = _mask_for_seeds(seeds[:, kk], bw, bh, nparts=nparts)
        _, _, _, e = _fit_layout(colors, lay, mask, 1)
        est.append(e)
    order = jnp.argsort(jnp.stack(est, axis=1), axis=1)  # [N,k]
    return [
        jnp.take_along_axis(seeds, order[:, kk : kk + 1], 1)[:, 0]
        for kk in range(keep)
    ]


def _rank_seeds_cont(colors, seeds, k, bw, bh, nparts, keep: int = 1):
    """Continuous-SSE seed ranking: per-subset masked-PCA line residual
    (no quantization / weight sweep / exact eval — a few matmuls per
    seed, ~3x cheaper than the unrefined-fit estimate).  Measured on the
    q2 harness it ranks as well as the quantized estimate (two_pop
    +0.02 dB) — the BC6H _screen_partitions2 precedent."""
    if k <= keep:
        return [seeds[:, kk] for kk in range(min(k, seeds.shape[1]))]
    ests = []
    for kk in range(k):
        mask = _mask_for_seeds(seeds[:, kk], bw, bh, nparts=nparts)
        cnt = mask.sum(-1)[..., None] + 1e-6
        mean = jnp.einsum("npt,ntc->npc", mask, colors) / cnt
        centered = (colors[:, None] - mean[:, :, None]) * mask[..., None]
        cov = jnp.einsum("nptc,nptd->npcd", centered, centered)
        v = jnp.ones(cov.shape[:3], jnp.float32)
        for _ in range(3):
            nv = jnp.einsum("npcd,npd->npc", cov, v)
            nn = jnp.linalg.norm(nv, axis=-1, keepdims=True)
            v = jnp.where(nn > 1e-10, nv / (nn + 1e-20), v)
        proj = jnp.einsum("nptc,npc->npt", centered, v)
        ests.append(
            (centered**2).sum((1, 2, 3)) - (proj**2).sum((1, 2))
        )
    order = jnp.argsort(jnp.stack(ests, axis=1), axis=1)
    return [
        jnp.take_along_axis(seeds, order[:, kk : kk + 1], 1)[:, 0]
        for kk in range(keep)
    ]


def plan_for(quality: int, bw: int, bh: int) -> dict:
    """Per-block-size effective plan.  The partition-seed depths were
    tuned on 4x4 (where the CPU-reference quality bar exists,
    tests/test_cpu_reference.py); on larger blocks the deep 2-partition
    sweep bought <=0.08 dB lerp / <=0.31 dB two-pop for 2.7-4x kernel
    cost (measured 6x6/8x8 q2, round 4), so 6x6+ runs a shallower seed
    search with the same layout menu and refine depths."""
    plan = _PLAN[max(0, min(4, int(quality)))]
    if bw * bh > 16:
        plan = dict(
            plan,
            seeds2=min(plan["seeds2"], 2),
            keep2=1,
            p2_iters=min(plan.get("p2_iters", plan["iters"]), 2),
            seeds3=min(plan["seeds3"], 1),
            seeds4=min(plan["seeds4"], 1),
        )
    return plan


@functools.partial(
    jax.jit,
    static_argnames=("block_w", "block_h", "quality", "gray", "alpha"),
)
def _encode_astc_jnp(
    blocks: jnp.ndarray, block_w: int = 4, block_h: int = 4, quality: int = 2,
    gray: bool = True, alpha: bool = True,
) -> jnp.ndarray:
    """jnp reference path (all 14 block sizes, all 5 quality levels)."""
    colors = jnp.clip(blocks.astype(jnp.float32), 0, 1) * 255.0
    plan = plan_for(quality, block_w, block_h)
    iters = plan["iters"]
    m = colors.shape[0]
    t = block_w * block_h
    menu = layout_menu(block_w, block_h)

    ones_mask = jnp.ones((m, 1, t), jnp.float32)
    best_words, best_err = _void_extent(colors)

    def consider(words, err):
        nonlocal best_words, best_err
        take = err < best_err
        best_words = jnp.where(take[:, None], words, best_words)
        best_err = jnp.where(take, err, best_err)

    for lay in menu[(8, 1)][: plan["cem8_layouts"]]:
        q0, q1, gq, err = _fit_layout(colors, lay, ones_mask, iters)
        consider(_pack_block(lay, q0, q1, gq), err)

    # CEM 12 (explicit alpha) fits are skipped for fully-opaque batches
    # (has_alpha_blocks): CEM 8's implicit alpha is exact there and the
    # extra endpoint pair only costs color precision.
    for lay in menu[(12, 1)][: plan["cem12_layouts"] if alpha else 0]:
        q0, q1, gq, err = _fit_layout(
            colors, lay, ones_mask, plan.get("iters12", iters)
        )
        consider(_pack_block(lay, q0, q1, gq), err)

    for ccs in plan["dp_ccs"] if alpha else ():
        lay = menu[(12, "dp")][0] if menu[(12, "dp")] else None
        if lay is not None:
            q0, q1, gq, err = _fit_dual_layout(
                colors, lay, ccs, plan.get("iters12", iters)
            )
            consider(_pack_block(lay, q0[:, None], q1[:, None], gq, ccs=ccs), err)

    # Luminance CEMs: eligible only for near-gray blocks (same per-block
    # rule as the Pallas kernel's tile gate, so both paths agree).
    if gray:
        spread = jnp.max(colors[..., :3], axis=2) - jnp.min(
            colors[..., :3], axis=2
        )  # [N,T]
        isgray = jnp.max(spread, axis=1) < GRAY_SPREAD * 255.0  # [N]
        gray_inf = jnp.where(isgray, 0.0, jnp.inf)

    for key, cnt in (((0, 1), plan["cem0_layouts"] if gray else 0),
                     ((4, 1), plan["cem4_layouts"] if gray else 0)):
        for lay in menu[key][:cnt]:
            q0, q1, gq, err = _fit_layout(colors, lay, ones_mask, iters)
            consider(_pack_block(lay, q0, q1, gq), err + gray_inf)

    if plan["seeds2"] and menu[(8, 2)]:
        lays2 = menu[(8, 2)][: plan.get("p2_layouts", 1)]
        lay12 = (
            menu[(12, 2)][0] if (menu[(12, 2)] and alpha) else None
        )
        seeds = _screen_partitions(colors, block_w, block_h, plan["seeds2"])
        for seed_k in _rank_seeds_cont(
            colors, seeds, plan["seeds2"], block_w, block_h,
            nparts=2, keep=plan.get("keep2", 1),
        ):
            mask = _mask_for_seeds(seed_k, block_w, block_h)
            p2i = plan.get("p2_iters", iters)
            for lay2 in lays2:
                q0, q1, gq, err = _fit_layout(colors, lay2, mask, p2i)
                consider(_pack_block(lay2, q0, q1, gq, seed_k), err)
            if lay12 is not None and quality >= 3:
                q0, q1, gq, err = _fit_layout(colors, lay12, mask, p2i)
                consider(_pack_block(lay12, q0, q1, gq, seed_k), err)

    if plan["seeds3"] and menu[(8, 3)]:
        lay3 = menu[(8, 3)][0]
        seeds = _screen_partitions(
            colors, block_w, block_h, plan["seeds3"], nparts=3
        )
        for seed_k in _rank_seeds(
            colors, seeds, plan["seeds3"], lay3, block_w, block_h, nparts=3,
            keep=plan.get("keep3", 1),
        ):
            mask = _mask_for_seeds(seed_k, block_w, block_h, nparts=3)
            q0, q1, gq, err = _fit_layout(colors, lay3, mask, iters)
            consider(_pack_block(lay3, q0, q1, gq, seed_k), err)

    lays4 = [menu[key][0] for key in ((0, 4), (4, 4)) if menu[key]]
    if plan["seeds4"] and lays4 and gray:
        seeds = _screen_partitions(
            colors, block_w, block_h, plan["seeds4"], nparts=4
        )
        for seed_k in _rank_seeds(
            colors, seeds, plan["seeds4"], lays4[0], block_w, block_h,
            nparts=4,
        ):
            mask = _mask_for_seeds(seed_k, block_w, block_h, nparts=4)
            for lay in lays4:
                q0, q1, gq, err = _fit_layout(colors, lay, mask, iters)
                consider(_pack_block(lay, q0, q1, gq, seed_k), err + gray_inf)

    return best_words


# ---------------------------------------------------------------------------
# HDR profile (CEM 11 direct submode / CEM 14)
# ---------------------------------------------------------------------------


def _sf16_to_lns_jnp(h):
    """Half bits -> 16-bit LNS code (vectorized inverse of lns_to_sf16)."""
    h = jnp.minimum(h.astype(jnp.int32), 0x7BFF)
    e = h >> 10
    mt = (h & 0x3FF) << 3
    m = jnp.where(
        mt < 3 * 512,
        (mt + 1) // 3,
        jnp.where(mt < 4 * 1536 - 512, (mt + 514) // 4, (mt + 2050) // 5),
    )
    return (e << 11) | jnp.minimum(m, 0x7FF)


def _to_lns16(x):
    """float (>=0) -> LNS16 code as float32 working values."""
    h = jax.lax.bitcast_convert_type(
        jnp.clip(x, 0.0, 65504.0).astype(jnp.float16), jnp.uint16
    )
    return _sf16_to_lns_jnp(h).astype(jnp.float32)


@functools.lru_cache(maxsize=64)
def hdr_layout_menu(bw: int, bh: int):
    """CEM 11 / CEM 14 single-partition layouts (8-bit colors forced:
    the direct submode's fields are plain bytes)."""

    def best(cem):
        cands = []
        for gw in range(2, 12):
            for gh in range(2, 12):
                for wl in (24, 20, 16, 12, 10, 8, 6, 5, 4):
                    lay = _try_layout(bw, bh, 1, cem, gw, gh, wl)
                    if lay and lay.clevels == 256:
                        cands.append(lay)
        if not cands:
            return None
        return max(
            cands,
            key=lambda l: (min(1.0, (l.gw * l.gh) / (bw * bh)), l.wlevels),
        )

    return {11: best(11), 14: best(14)}


def _fit_hdr_layout(t16, lay: Layout, iters):
    """Fit CEM 11 (direct) / CEM 14.  t16 [N,T,4] float: RGB = LNS16
    targets, A = UNORM16 target.  Returns (q0, q1, gq, err)."""
    a_mat_np, pinv_np = _prepared_np(lay.bw, lay.bh, lay.gw, lay.gh)
    a_mat = jnp.asarray(a_mat_np)
    pinv = jnp.asarray(pinv_np)
    use_alpha = lay.cem == 14
    nch = 4 if use_alpha else 3
    target = t16[..., :nch]
    n, t, _ = target.shape

    wq_lut, _ = _weight_qlut(lay.wlevels)
    wq_lut = jnp.asarray(wq_lut)
    unq_w_tab = jnp.asarray(weight_unquant(lay.wlevels), jnp.int32)

    mean = target.mean(1, keepdims=True)
    axis = _principal_axis(target - mean)
    proj = jnp.einsum("ntc,nc->nt", target - mean, axis)
    e0 = mean[:, 0] + axis * proj.min(1)[:, None]
    e1 = mean[:, 0] + axis * proj.max(1)[:, None]

    def quant(e):
        """16-bit targets -> (ISE byte values [N,C], dec16 [N,C])."""
        r = jnp.clip(jnp.round(e[..., 0] / 256.0), 0, 255).astype(jnp.int32)
        g = jnp.clip(jnp.round(e[..., 1] / 256.0), 0, 255).astype(jnp.int32)
        b7 = jnp.clip(jnp.round(e[..., 2] / 512.0), 0, 127).astype(jnp.int32)
        vals = [r, g, 0x80 | b7]
        decs = [r * 256, g * 256, b7 * 512]
        if use_alpha:
            a8 = jnp.clip(jnp.round(e[..., 3] / 257.0), 0, 255).astype(jnp.int32)
            vals.append(a8)
            decs.append(a8 * 257)
        return jnp.stack(vals, -1), jnp.stack(decs, -1).astype(jnp.float32)

    def texel_w64(gq_vals):
        u = jnp.take(unq_w_tab, gq_vals)
        return (jnp.einsum("tg,ng->nt", a_mat.astype(jnp.int32), u) + 8) >> 4

    def eval_exact(d0, d1, gq_vals):
        w64 = texel_w64(gq_vals).astype(jnp.float32)[..., None]
        c16 = jnp.floor(
            (d0[:, None, :] * (64.0 - w64) + d1[:, None, :] * w64 + 32.0) / 64.0
        )
        return ((c16 - target) ** 2).sum((1, 2))

    def ideal_t(d0, d1):
        d = (d1 - d0)[:, None, :]
        denom = (d * d).sum(-1) + 1e-6
        return jnp.clip(((target - d0[:, None, :]) * d).sum(-1) / denom, 0.0, 1.0)

    def quant_grid(tw):
        g = jnp.einsum("gt,nt->ng", pinv, tw)
        w64 = jnp.clip(jnp.round(jnp.clip(g, 0.0, 1.0) * 64.0), 0, 64).astype(jnp.int32)
        return jnp.take(wq_lut, w64)

    up_np, dn_np = _weight_neighbors(lay.wlevels)
    up_tab = jnp.asarray(up_np)
    dn_tab = jnp.asarray(dn_np)
    full_res = lay.gw == lay.bw and lay.gh == lay.bh

    def refine_grid(d0, d1, gq):
        """+-1 ladder-rung steps by exact decode error (the rounding in
        quant_grid is not the exact argmin; the HDR CPU bar's exhaustive
        sweep measured ~0.05 dB ahead without this).  Full-res grids
        choose per-texel independently, so keep-best needs no guard."""
        if not full_res:
            return gq
        for _ in range(2):
            best_g, best_e = gq, None
            for cand in (gq, jnp.take(up_tab, gq), jnp.take(dn_tab, gq)):
                w64 = texel_w64(cand).astype(jnp.float32)[..., None]
                c16 = jnp.floor(
                    (d0[:, None, :] * (64.0 - w64) + d1[:, None, :] * w64
                     + 32.0) / 64.0
                )
                e = ((c16 - target) ** 2).sum(-1)
                if best_e is None:
                    best_e = e
                else:
                    take = e < best_e
                    best_g = jnp.where(take, cand, best_g)
                    best_e = jnp.minimum(e, best_e)
            gq = best_g
        return gq

    best = None
    for it in range(max(1, iters)):
        q0, d0 = quant(e0)
        q1, d1 = quant(e1)
        gq = quant_grid(ideal_t(d0, d1))
        gq = refine_grid(d0, d1, gq)
        err = eval_exact(d0, d1, gq)
        cand = (q0[:, None, :], q1[:, None, :], gq, err)
        if best is None:
            best = cand
        else:
            take = err < best[3]
            best = tuple(
                jnp.where(take[(...,) + (None,) * (b.ndim - 1)], c, b)
                for c, b in zip(cand, best)
            )
        if it + 1 < iters:
            w = texel_w64(gq).astype(jnp.float32)[..., None] / 64.0
            from cuttlefish_tpu.kernels.bc import _ls_solve

            e1n, e0n = _ls_solve(target, w[..., 0])
            e0 = jnp.clip(e0n, 0.0, 65535.0)
            e1 = jnp.clip(e1n, 0.0, 65535.0)
    return best


def _void_extent_hdr(blocks, t16):
    """Solid-color HDR candidate.  blocks [N,T,4] float, t16 targets."""
    m = blocks.shape[0]
    mean = blocks.astype(jnp.float32).mean(1)  # [N,4] float
    v16 = jax.lax.bitcast_convert_type(
        jnp.clip(mean, 0.0, 65504.0).astype(jnp.float16), jnp.uint16
    ).astype(jnp.uint32)
    dec_rgb = _sf16_to_lns_jnp(v16[..., :3].astype(jnp.int32)).astype(jnp.float32)
    dec_a = jnp.clip(mean[..., 3:], 0.0, 1.0) * 65535.0
    dec = jnp.concatenate([dec_rgb, dec_a], -1)
    err = ((dec[:, None, :] - t16) ** 2).sum((1, 2))
    w0 = jnp.full((m,), 0x1FC | (1 << 9) | (0b11 << 10), jnp.uint32)
    w0 = w0 | jnp.uint32(0xFFFFF000)
    w1 = jnp.full((m,), 0xFFFFFFFF, jnp.uint32)
    w2 = (v16[:, 0] | (v16[:, 1] << 16)).astype(jnp.uint32)
    w3 = (v16[:, 2] | (v16[:, 3] << 16)).astype(jnp.uint32)
    return jnp.stack([w0, w1, w2, w3], axis=-1), err


@functools.partial(jax.jit, static_argnames=("block_w", "block_h", "quality", "alpha_ldr"))
def encode_astc_hdr(
    blocks: jnp.ndarray,
    block_w: int = 4,
    block_h: int = 4,
    quality: int = 2,
    alpha_ldr: bool = True,
) -> jnp.ndarray:
    """Encode [N, bw*bh, 4] float HDR RGBA to ASTC [N,4] uint32 words.

    RGB channels are HDR (CEM 11, direct submode; error metric is SSE in
    the spec's LNS space, i.e. approximately relative error); alpha is
    LDR in [0,1] (CEM 14) as in the reference's HDR_RGB_LDR_A profile
    (`/root/reference/lib/src/AstcConverter.cpp:151-163`).
    """
    iters = _PLAN[max(0, min(4, int(quality)))]["iters"]
    rgb = jnp.maximum(blocks[..., :3].astype(jnp.float32), 0.0)
    alpha = jnp.clip(blocks[..., 3].astype(jnp.float32), 0.0, 1.0)
    t16 = jnp.concatenate(
        [_to_lns16(rgb), (alpha * 65535.0)[..., None]], -1
    )

    menu = hdr_layout_menu(block_w, block_h)
    best_words, best_err = _void_extent_hdr(blocks, t16)

    lay11 = menu[11]
    q0, q1, gq, err = _fit_hdr_layout(t16, lay11, iters)
    # CEM 11 alpha decodes to exactly 1.0; account the unorm16 distance.
    err = err + ((t16[..., 3] - 65535.0) ** 2).sum(1)
    words = _pack_block(lay11, q0, q1, gq)
    take = err < best_err
    best_words = jnp.where(take[:, None], words, best_words)
    best_err = jnp.where(take, err, best_err)

    if alpha_ldr and menu[14] is not None:
        lay14 = menu[14]
        q0, q1, gq, err = _fit_hdr_layout(t16, lay14, iters)
        words = _pack_block(lay14, q0, q1, gq)
        take = err < best_err
        best_words = jnp.where(take[:, None], words, best_words)
        best_err = jnp.where(take, err, best_err)

    return best_words
