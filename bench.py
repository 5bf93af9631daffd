"""Benchmark harness: BC7 encode throughput (Mtexels/sec/chip).

Run by the driver on real TPU hardware after each round.  Prints exactly one
JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The baseline is the reference CLI's measured multi-threaded CPU throughput
for BC7 Normal quality.  The reference publishes no numbers (BASELINE.md);
until a local build of the reference is benchmarked on this machine we use a
representative figure for bc7e.ispc "basic" on a modern 16-core host
(~10 Mtexels/s) so vs_baseline is meaningful across rounds.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_BC7_MTEXELS = 10.0

IMAGE = 2048  # 2048x2048 RGBA
WARMUP = 2
ITERS = 10
QUALITY = 2


def main() -> None:
    import jax

    from cuttlefish_tpu.convert.blocks import extract_blocks
    from cuttlefish_tpu.kernels.bc7 import encode_bc7

    rng = np.random.default_rng(0)
    # Smooth-ish test content: random low-frequency gradients, more
    # representative of textures than white noise.
    y, x = np.mgrid[0:IMAGE, 0:IMAGE].astype(np.float32) / IMAGE
    surf = np.stack(
        [
            0.5 + 0.5 * np.sin(6.0 * x + 2.0 * y),
            0.5 + 0.5 * np.cos(4.0 * y + x),
            0.5 + 0.5 * np.sin(3.0 * (x + y)),
            np.ones_like(x),
        ],
        axis=-1,
    ).astype(np.float32)
    surf += rng.normal(0, 0.02, surf.shape).astype(np.float32)
    surf = np.clip(surf, 0.0, 1.0)

    blocks, _, _ = extract_blocks(surf, 4, 4)
    dev = jax.devices()[0]
    placed = jax.device_put(blocks, dev)

    # The timed function XOR-folds ALL output words to a scalar fetched to
    # the host each iteration: the readback is the completion fence, and
    # reducing over every word keeps XLA from dead-code-eliminating any of
    # the bit packing.
    import jax.numpy as jnp

    def fenced(b):
        w = encode_bc7(b, quality=QUALITY)
        folded = w[:, 0] ^ w[:, 1] ^ w[:, 2] ^ w[:, 3]
        return folded.astype(jnp.uint32).sum()

    fn = jax.jit(fenced)
    for _ in range(WARMUP):
        float(np.asarray(fn(placed)))

    t0 = time.perf_counter()
    for _ in range(ITERS):
        float(np.asarray(fn(placed)))
    dt = (time.perf_counter() - t0) / ITERS

    texels = IMAGE * IMAGE
    mtexels = texels / dt / 1e6
    print(
        json.dumps(
            {
                "metric": "bc7_encode_throughput_q2_2048",
                "value": round(mtexels, 3),
                "unit": "Mtexels/sec/chip",
                "vs_baseline": round(mtexels / BASELINE_BC7_MTEXELS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
