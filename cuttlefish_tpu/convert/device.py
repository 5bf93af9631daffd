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
    """Next power of two >= n (>= _MIN_BUCKET), always mesh-divisible."""
    b = _MIN_BUCKET
    while b < n:
        b *= 2
    mesh = get_mesh()
    if mesh is not None:
        b = max(b, mesh.size)
    return b


class BlockConverter(Converter):
    """Base for block-compressed formats: tiles the surface, batches blocks
    to the device, and packs the encoded words.

    Subclasses implement `encode_blocks([N, bh*bw, 4] jnp float32, params)
    -> [N, words] uint32` (a jitted batched kernel).
    """

    block_w = 4
    block_h = 4

    def encode_blocks(self, blocks, params: EncodeParams):
        raise NotImplementedError

    def prepare_surface(self, surface: np.ndarray, params: EncodeParams) -> np.ndarray:
        """Hook for input-domain remaps (e.g. signed EAC rescale)."""
        return surface

    def encode(self, surface: np.ndarray, params: EncodeParams) -> np.ndarray:
        surface = self.prepare_surface(np.asarray(surface, np.float32), params)
        blocks, _, _ = extract_blocks(surface, self.block_w, self.block_h)
        n = blocks.shape[0]
        padded = _bucket(n)
        if padded != n:
            pad = np.broadcast_to(blocks[-1:], (padded - n,) + blocks.shape[1:])
            blocks = np.concatenate([blocks, pad], axis=0)
        words = self.encode_blocks(shard_blocks(blocks), params)
        words = np.asarray(words)[:n].astype(np.uint32)
        return interleave_block_bytes(words)
