"""TPU compute kernels: batched block encoders (JAX/XLA/Pallas).

Each encoder is a pure, jit-compiled function over a batch of blocks
([N, texels, channels] float32 -> [N, words] uint32).  The batch axis is the
data-parallel axis: single-chip it feeds the VPU/MXU as one fused program;
multi-chip it shards over a `jax.sharding.Mesh` (cuttlefish_tpu.parallel).

This replaces the reference's per-block thread pool
(`/root/reference/lib/src/Converter.cpp:508-593`) and its vendored CPU/ISPC
encoder kernels (rgbcx, squish, Compressonator, bc7e, etc2comp, astc-encoder).
"""
