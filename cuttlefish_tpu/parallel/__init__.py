"""Device-mesh substrate: sharding the block grid over chips.

The reference's only concurrency is a std::thread pool over block-encode jobs
(`/root/reference/lib/src/Converter.cpp:508-593`).  The TPU-native analog is
pure data parallelism: blocks are independent, so the batched block axis is
sharded over a 1-D `jax.sharding.Mesh` and XLA partitions the fused encode
program with zero collectives on the hot path (SURVEY.md §2.3).  Encoded
bytes come back in raster order via the same sharded array, so container
assembly on the host is a plain gather.
"""

from cuttlefish_tpu.parallel.mesh import (  # noqa: F401
    BLOCK_AXIS,
    block_sharding,
    default_mesh,
    get_mesh,
    init_distributed,
    set_mesh,
    shard_blocks,
    use_mesh,
)
