"""True multi-process mesh test (2 processes x 4 CPU devices).

Spawns two worker processes that jax.distributed-initialize against a
localhost coordinator, build the 8-device global mesh, run the full
Texture.convert -> DDS pipeline with the block axis sharded across both
processes, all-gather the encoded words, and write the container on
process 0.  The parent asserts the bytes equal the single-process result
— the multi-host analog of SURVEY.md §4's shard-equivalence requirement.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import sys
import jax

jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1])
port = sys.argv[2]
out_path = sys.argv[3]
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())

import numpy as np
import cuttlefish_tpu as ct
from cuttlefish_tpu.parallel import default_mesh, use_mesh

arr = np.random.default_rng(7).random((32, 48, 4)).astype(np.float32)
tex = ct.Texture(ct.Dimension.Dim2D, 48, 32)
tex.set_image(ct.Image.from_array(arr, ct.ImageFormat.RGBAF))
with use_mesh(default_mesh()):
    assert tex.convert(ct.TextureFormat.BC7, ct.TextureType.UNorm,
                       quality=ct.Quality.Low)
res, data = tex.save_to_bytes(ct.FileType.DDS)
assert res is ct.SaveResult.Success
if pid == 0:
    with open(out_path, "wb") as f:
        f.write(data)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_mesh_writes_identical_dds(tmp_path):
    port = _free_port()
    out = tmp_path / "mp.dds"
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(pid), str(port), str(out)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        for pid in range(2)
    ]
    outputs = [p.communicate(timeout=600)[0] for p in procs]
    for p, o in zip(procs, outputs):
        assert p.returncode == 0, o.decode(errors="replace")[-4000:]

    # single-process reference
    import cuttlefish_tpu as ct

    arr = np.random.default_rng(7).random((32, 48, 4)).astype(np.float32)
    tex = ct.Texture(ct.Dimension.Dim2D, 48, 32)
    tex.set_image(ct.Image.from_array(arr, ct.ImageFormat.RGBAF))
    assert tex.convert(
        ct.TextureFormat.BC7, ct.TextureType.UNorm, quality=ct.Quality.Low
    )
    res, ref = tex.save_to_bytes(ct.FileType.DDS)
    assert res is ct.SaveResult.Success
    assert out.read_bytes() == ref


@pytest.mark.slow
def test_bench_scaling_harness_virtual_mesh():
    """bench.py --scaling measures 1->N efficiency; on the 8-device
    virtual CPU mesh it must produce a sane efficiency figure (the real
    multi-chip run uses the same code path)."""
    import bench

    res = bench.measure_scaling()
    assert res["devices"] == 8
    assert res["mtexels_ndev"] > 0 and res["mtexels_1dev"] > 0
    assert 0 < res["efficiency"] <= 1.5
