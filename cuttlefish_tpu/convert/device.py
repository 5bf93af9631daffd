"""Host<->device block batching shared by all compressed-format converters.

Pads block batches to power-of-two buckets so XLA compiles a bounded set of
program shapes (the jit cache is keyed on the padded N), shards the batch
axis over the active mesh, and trims/serializes the encoded words back into
raster-order bytes for the container writers.
"""

from __future__ import annotations

import numpy as np

from cuttlefish_tpu.convert import Converter, EncodeParams
from cuttlefish_tpu.convert.blocks import extract_blocks, interleave_block_bytes
from cuttlefish_tpu.parallel import get_mesh, shard_blocks

_MIN_BUCKET = 64


def _bucket(n: int) -> int:
    """Next power of two >= n (>= _MIN_BUCKET), rounded up to a multiple
    of the mesh size so the batch axis shards evenly on any mesh (a
    6-device mesh gets 96 for n=64, not an indivisible 64)."""
    b = _MIN_BUCKET
    while b < n:
        b *= 2
    mesh = get_mesh()
    if mesh is not None and b % mesh.size:
        b = ((b // mesh.size) + 1) * mesh.size
    return b


class BlockConverter(Converter):
    """Base for block-compressed formats: tiles the surface, batches blocks
    to the device, and packs the encoded words.

    Subclasses implement `encode_blocks([N, bh*bw, 4] jnp float32, params)
    -> [N, words] uint32` (a jitted batched kernel).

    ``transfer_dtype`` controls the host->device wire format — the axon
    tunnel is bandwidth-bound, so blocks travel as uint8 for 8-bit-domain
    LDR formats (exactly the reference encoders' input precision; rgbcx /
    bc7e / etc2comp all consume RGBA8) or float16 for signed / HDR /
    11-bit domains (lossless for BC6H's half-float inputs), and are
    dequantized to float32 on device.
    """

    block_w = 4
    block_h = 4
    transfer_dtype = "u8"  # "u8" | "f16" | "f32"

    def encode_blocks(self, blocks, params: EncodeParams):
        raise NotImplementedError

    def prepare_surface(self, surface: np.ndarray, params: EncodeParams) -> np.ndarray:
        """Hook for input-domain remaps (e.g. signed EAC rescale)."""
        return surface

    def refine_params(
        self, host_blocks: np.ndarray, params: EncodeParams
    ) -> EncodeParams:
        """Hook: inspect the host-side block batch and return params with
        content-derived static flags filled in (a changed flag selects a
        different compiled program variant, like quality does)."""
        return params

    def encode(self, surface: np.ndarray, params: EncodeParams) -> np.ndarray:
        return self.encode_many([surface], params)[0]

    def encode_many(
        self, surfaces: list, params: EncodeParams
    ) -> list[np.ndarray]:
        """One device dispatch for ALL surfaces: every surface's 4x4 (or
        format-native) blocks are concatenated on the batch axis, encoded
        as one padded bucket, and split back — a full mip chain costs one
        jit shape instead of one per mip level."""
        all_blocks = []
        counts = []
        for surface in surfaces:
            surface = self.prepare_surface(
                np.asarray(surface, np.float32), params
            )
            blocks, _, _ = extract_blocks(surface, self.block_w, self.block_h)
            all_blocks.append(blocks)
            counts.append(blocks.shape[0])
        blocks = (
            np.concatenate(all_blocks, axis=0)
            if len(all_blocks) > 1
            else all_blocks[0]
        )
        params = self.refine_params(blocks, params)
        n = blocks.shape[0]
        padded = _bucket(n)
        if padded != n:
            pad = np.broadcast_to(blocks[-1:], (padded - n,) + blocks.shape[1:])
            blocks = np.concatenate([blocks, pad], axis=0)
        blocks = _dequant_on_device(shard_blocks(_wire(blocks, self.transfer_dtype)))
        words = self.encode_blocks(blocks, params)
        words = _fetch_global(words)[:n].astype(np.uint32)
        out = []
        start = 0
        for c in counts:
            out.append(interleave_block_bytes(words[start : start + c]))
            start += c
        return out


_PYRAMID_FNS: dict = {}


def _normal_map_device(h, options: int, height: float, jnp):
    """[S,H,W] heightfield (red channel, linear) -> [S,H,W,4] normal map.

    Same math as Image.create_normal_map (image/image.py, mirroring the
    reference Image.cpp:1783-1880): central differences, one-sided at
    non-wrapped edges (distance 1), dy = south - north, z normalized,
    [-1,1] -> [0,1] remap unless KeepSign.  `options` is the
    NormalOptions bitmask (Image.h:116-123: KeepSign=1, WrapX=2, WrapY=4).
    """
    import jax

    keep_sign, wrap_x, wrap_y = options & 1, options & 2, options & 4
    hh, ww = h.shape[-2], h.shape[-1]

    if wrap_y:
        above = jnp.roll(h, 1, axis=-2)
        below = jnp.roll(h, -1, axis=-2)
        dist_y = np.full((hh, 1), 2.0, np.float32)
    else:
        above = jnp.concatenate([h[..., :1, :], h[..., :-1, :]], axis=-2)
        below = jnp.concatenate([h[..., 1:, :], h[..., -1:, :]], axis=-2)
        dist_y = np.full((hh, 1), 2.0, np.float32)
        if hh > 1:
            dist_y[0] = dist_y[-1] = 1.0
        else:
            dist_y[0] = 1.0
    dy = (below - above) * (height / dist_y)

    if wrap_x:
        left = jnp.roll(h, 1, axis=-1)
        right = jnp.roll(h, -1, axis=-1)
        dist_x = np.full((1, ww), 2.0, np.float32)
    else:
        left = jnp.concatenate([h[..., :, :1], h[..., :, :-1]], axis=-1)
        right = jnp.concatenate([h[..., :, 1:], h[..., :, -1:]], axis=-1)
        dist_x = np.full((1, ww), 2.0, np.float32)
        if ww > 1:
            dist_x[0, 0] = dist_x[0, -1] = 1.0
        else:
            dist_x[0, 0] = 1.0
    dx = (left - right) * (height / dist_x)

    inv_len = jax.lax.rsqrt(dx * dx + dy * dy + 1.0)
    normal = jnp.stack(
        [dx * inv_len, dy * inv_len, inv_len, jnp.ones_like(dx)], axis=-1
    )
    if not keep_sign:
        normal = normal.at[..., :3].set(normal[..., :3] * 0.5 + 0.5)
    return normal


def _mip_dims(h: int, w: int, levels: int) -> list[tuple[int, int]]:
    return [(max(h >> k, 1), max(w >> k, 1)) for k in range(levels)]


class _FusedPyramid:
    """One jit-compiled program: device-resident mip chain -> block tiling
    -> encode, for every level of every surface in a single dispatch.

    The TPU-first alternative to host-side `generate_mipmaps` + per-level
    uploads: level 0 is transferred once, the resample weight matrices
    (resample.py, same filters) ride along as compile-time constants and
    run on the MXU, sRGB levels round-trip through linear on device, and
    the concatenated block batch feeds the encoder kernel directly.
    Output bytes are equivalent-quality but not bit-identical to the host
    path (the host path quantizes blocks to the u8 wire format; this path
    keeps float32 end to end).
    """

    def __init__(self, converter, h, w, nsurf, levels, filter_name, srgb,
                 params, normal_opts=None):
        import jax
        import jax.numpy as jnp

        from cuttlefish_tpu.color import (
            linear_to_srgb_rgba,
            srgb_to_linear_rgba,
        )
        from cuttlefish_tpu.image.resample import resample_weights
        from cuttlefish_tpu.parallel import block_sharding, get_mesh

        mesh = get_mesh()

        bw, bh = converter.block_w, converter.block_h
        dims = _mip_dims(h, w, levels)
        self.dims = dims
        self.counts = [
            nsurf * (-(-hh // bh)) * (-(-ww // bw)) for hh, ww in dims
        ]
        self.per_surface = [(-(-hh // bh)) * (-(-ww // bw)) for hh, ww in dims]
        self.ntot = sum(self.counts)
        padded = _bucket(self.ntot)

        weights = []
        for k in range(1, levels):
            (h0, w0), (h1, w1) = dims[k - 1], dims[k]
            wy = resample_weights(h0, h1, filter_name).astype(np.float32)
            wx = resample_weights(w0, w1, filter_name).astype(np.float32)
            weights.append((wy, wx))

        def tile(cur, hh, ww):
            pad_h = -(-hh // bh) * bh - hh
            pad_w = -(-ww // bw) * bw - ww
            if pad_h or pad_w:
                cur = jnp.pad(
                    cur, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode="edge"
                )
            s = cur.shape[0]
            nby, nbx = cur.shape[1] // bh, cur.shape[2] // bw
            return (
                cur.reshape(s, nby, bh, nbx, bw, 4)
                .transpose(0, 1, 3, 2, 4, 5)
                .reshape(s * nby * nbx, bh * bw, 4)
            )

        def fn(x):  # [S, H, W, 4] float32, texture color space
            parts = []
            cur = x
            if normal_opts is not None:
                # Heightfield -> tangent-space normal map on device, the
                # fused analog of Image.create_normal_map (Image.cpp:
                # 1783-1880) followed by set_image's colorspace convert:
                # the stored level-0 heightfield is undone to linear, the
                # normal computed there, and the result re-encoded.
                opts, nm_height = normal_opts
                hf = srgb_to_linear_rgba(cur, jnp) if srgb else cur
                nm = _normal_map_device(hf[..., 0], opts, nm_height, jnp)
                cur = linear_to_srgb_rgba(nm, jnp) if srgb else nm
            for k, (hh, ww) in enumerate(dims):
                if k:
                    wy, wx = weights[k - 1]
                    src = srgb_to_linear_rgba(cur, jnp) if srgb else cur
                    t1 = jnp.einsum("oi,siwc->sowc", wy, src)
                    t2 = jnp.einsum("pj,sojc->sopc", wx, t1)
                    # No clamp: filter overshoot survives like the host
                    # path (encoders clamp LDR inputs; HDR/signed formats
                    # need the full range), and the sRGB transforms guard
                    # their pow branches internally.
                    cur = linear_to_srgb_rgba(t2, jnp) if srgb else t2
                parts.append(tile(cur, hh, ww))
            blocks = (
                jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
            )
            if padded != self.ntot:
                blocks = jnp.concatenate(
                    [
                        blocks,
                        jnp.broadcast_to(
                            blocks[-1:], (padded - self.ntot,) + blocks.shape[1:]
                        ),
                    ],
                    axis=0,
                )
            if mesh is not None:
                # Level 0 arrives replicated; the mip chain recomputes on
                # every chip (cheap matmuls) and the block batch — where
                # the work is — shards over the mesh, pure DP as in
                # encode_many (the bucket is padded to a mesh multiple).
                blocks = jax.lax.with_sharding_constraint(
                    blocks, block_sharding(mesh)
                )
            return converter.encode_blocks(blocks, params)

        self.fn = jax.jit(fn)


def _encode_pyramid(
    self,
    surfaces0: list,
    levels: int,
    filter_name: str,
    srgb: bool,
    params: EncodeParams,
    normal_opts: tuple | None = None,
) -> list[list[np.ndarray]]:
    """surfaces0: level-0 [H,W,4] float32 surfaces in (depth, face)
    order.  Returns bytes[level][surface] (mip-major, matching
    Texture.convert's traversal)."""
    # Kernel modules hold module-level jnp constants; importing one for
    # the first time INSIDE the fused jit trace would capture those
    # constants as tracers and leak them into later calls.  The package
    # import pulls in every kernel module eagerly (kernels/__init__.py),
    # outside any trace.
    import cuttlefish_tpu.kernels  # noqa: F401

    s = len(surfaces0)
    h, w = surfaces0[0].shape[:2]
    # Content flags from level 0 only (mips live on device).  A colored
    # level 0 whose mips average to gray keeps the conservative default
    # only if level 0 itself has a near-gray block; the residual risk is a
    # gray-ish deep mip block encoded via CEM 8/12 instead of CEM 0/4 —
    # a sub-0.1 dB effect on such content.
    lvl0_blocks = np.concatenate(
        [
            extract_blocks(
                np.asarray(sf, np.float32), self.block_w, self.block_h
            )[0]
            for sf in surfaces0
        ],
        axis=0,
    )
    params = self.refine_params(lvl0_blocks, params)
    from cuttlefish_tpu.parallel import get_mesh

    key = (
        type(self).__qualname__,
        tuple(sorted((k, repr(v)) for k, v in self.__dict__.items())),
        h, w, s, levels, filter_name, srgb, normal_opts,
        params.quality, params.alpha_type,
        repr(params.color_mask), params.color_space, params.content_gray,
        params.content_alpha,
        repr(get_mesh()),
    )
    fused = _PYRAMID_FNS.get(key)
    if fused is None:
        fused = _FusedPyramid(
            self, h, w, s, levels, filter_name, srgb, params, normal_opts
        )
        _PYRAMID_FNS[key] = fused
    x = np.stack([np.asarray(sf, np.float32) for sf in surfaces0])
    words = _fetch_global(fused.fn(x))[: fused.ntot].astype(np.uint32)
    out: list[list[np.ndarray]] = []
    start = 0
    for _lvl in range(levels):
        per = fused.per_surface[_lvl]
        level_out = []
        for _si in range(s):
            level_out.append(interleave_block_bytes(words[start : start + per]))
            start += per
        out.append(level_out)
    return out


BlockConverter.encode_pyramid = _encode_pyramid


def _wire(blocks: np.ndarray, dtype: str) -> np.ndarray:
    """Host-side wire encoding for the tunnel (see BlockConverter doc)."""
    if dtype == "u8":
        # Round-half-up in one vectorized pass (np.round's extra pass over
        # 30+ MB costs more than the whole device round-trip).
        return (np.clip(blocks, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    if dtype == "f16":
        return blocks.astype(np.float16)
    return blocks


_DEQUANT_FNS: dict = {}


def _dequant_on_device(blocks):
    """Inverse of _wire, on device (jitted once; preserves sharding —
    a fresh jit object per call would retrace and pay a full tunnel
    round-trip every convert)."""
    import jax
    import jax.numpy as jnp

    if blocks.dtype not in (np.uint8, np.float16):
        return blocks
    if not _DEQUANT_FNS:
        _DEQUANT_FNS["u8"] = jax.jit(
            lambda b: b.astype(jnp.float32) * (1.0 / 255.0)
        )
        _DEQUANT_FNS["f16"] = jax.jit(lambda b: b.astype(jnp.float32))
    key = "u8" if blocks.dtype == np.uint8 else "f16"
    return _DEQUANT_FNS[key](blocks)


def _fetch_global(words) -> np.ndarray:
    """Device words -> host numpy, correct on multi-process meshes.

    On a single process `np.asarray` suffices.  On a multi-host mesh the
    global array is only partially addressable per process, so the shards
    are all-gathered (SURVEY.md §2.3: "all_gather of encoded block bytes in
    raster order for container assembly"); every process then holds the
    full raster-order word array and process 0 (or any) can write the
    container.
    """
    import jax

    if jax.process_count() == 1:
        return np.asarray(words)
    if getattr(words, "is_fully_addressable", True):
        return np.asarray(words)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(words, tiled=True))
