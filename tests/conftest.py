"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Mirrors the multi-host test strategy in SURVEY.md §4: encoders and sharding
are validated on fake CPU devices; the driver benches on real TPU.

The TPU plugin in this image force-selects itself via jax_platforms at
interpreter startup (sitecustomize), so the env var alone is not enough —
the config must be updated back to cpu before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
