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

# Persistent compilation cache: the suite is dominated by XLA compiles of
# static-shape encoder kernels, which are identical run to run.  The cache
# makes the repeat developer loop fast (`-m "not slow"` for the quick set).
import tempfile  # noqa: E402

_cache_dir = os.path.join(tempfile.gettempdir(), "cuttlefish_jaxcache")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
