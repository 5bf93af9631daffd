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
        words = _fetch_global(words)[:n].astype(np.uint32)
        return interleave_block_bytes(words)


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
