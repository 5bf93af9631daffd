"""TPU compute kernels: batched block encoders (JAX/XLA/Pallas).

Each encoder is a pure, jit-compiled function over a batch of blocks
([N, texels, channels] float32 -> [N, words] uint32).  The batch axis is the
data-parallel axis: single-chip it feeds the VPU/MXU as one fused program;
multi-chip it shards over a `jax.sharding.Mesh` (cuttlefish_tpu.parallel).

This replaces the reference's per-block thread pool
(`/root/reference/lib/src/Converter.cpp:508-593`) and its vendored CPU/ISPC
encoder kernels (rgbcx, squish, Compressonator, bc7e, etc2comp, astc-encoder).
"""

# Eager imports: these modules hold module-level jnp constants (weight and
# partition tables).  If one of them were first imported INSIDE an active
# jit trace (kernels lazily import each other, e.g. etc -> bc.select_at_max),
# those constants would be created as tracers and leak into every later
# call.  Importing them all when the package loads — always outside any
# trace — makes that impossible.
from cuttlefish_tpu.kernels import (  # noqa: E402,F401
    astc,
    bc,
    bc6h,
    bc7,
    etc,
    pvrtc,
)
