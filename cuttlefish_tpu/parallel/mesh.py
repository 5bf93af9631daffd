"""Mesh management and block-axis sharding helpers."""

from __future__ import annotations

import contextlib
import threading

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BLOCK_AXIS = "blocks"

_state = threading.local()


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> Mesh:
    """Multi-host runtime init + global mesh (SURVEY.md §2.3).

    Wraps `jax.distributed.initialize` (args may come from the environment
    on TPU pods) and returns a 1-D mesh over all global devices.  Blocks are
    embarrassingly parallel, so this is pure DP: each host encodes its block
    shard over ICI and the container writer gathers bytes on process 0.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    mesh = default_mesh()
    set_mesh(mesh)
    return mesh


def default_mesh() -> Mesh:
    """1-D mesh over all local devices."""
    devices = np.asarray(jax.devices())
    return Mesh(devices, (BLOCK_AXIS,))


def get_mesh() -> Mesh | None:
    return getattr(_state, "mesh", None)


def set_mesh(mesh: Mesh | None) -> None:
    _state.mesh = mesh


@contextlib.contextmanager
def use_mesh(mesh: Mesh | None):
    prev = get_mesh()
    set_mesh(mesh)
    try:
        yield mesh
    finally:
        set_mesh(prev)


def block_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (the block batch) over the mesh; replicate the rest."""
    return NamedSharding(mesh, P(BLOCK_AXIS))


def shard_blocks(blocks: np.ndarray):
    """Place a [N, ...] block batch on the active mesh (or default device).

    N must be a multiple of the mesh size (callers pad to power-of-two
    buckets, see convert.device).  With no active mesh the array goes to the
    default device and XLA runs the single-chip program.
    """
    mesh = get_mesh()
    if mesh is None:
        return jax.device_put(blocks)
    return jax.device_put(blocks, block_sharding(mesh))
