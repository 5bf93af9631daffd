"""Fused device-mips pipeline (`Texture.convert_with_mips`): one dispatch
computes the mip chain on device and encodes every level."""

import numpy as np
import pytest

import cuttlefish_tpu as ct
from cuttlefish_tpu.decode.s3tc import decode_bc1, decode_bc3
from cuttlefish_tpu.formats import block_size

F, T, Q = ct.TextureFormat, ct.TextureType, ct.Quality


def _img(w, h, seed=0):
    rng = np.random.default_rng(seed)
    c0 = rng.random((1, 1, 4)).astype(np.float32)
    c1 = rng.random((1, 1, 4)).astype(np.float32)
    t = rng.random((h, w, 1)).astype(np.float32)
    arr = c0 * t + c1 * (1 - t)
    arr[..., 3] = 1.0
    return ct.Image.from_array(arr.astype(np.float32), ct.ImageFormat.RGBAF)


def _psnr(a, b):
    mse = np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2)
    return np.inf if mse == 0 else 10 * np.log10(255.0 * 255.0 / mse)


class TestFusedPipeline:
    def test_matches_host_path_structure_and_quality(self):
        img = _img(96, 64)
        host = ct.Texture(ct.Dimension.Dim2D, 96, 64)
        host.set_image(img)
        host.generate_mipmaps()
        assert host.convert(F.BC3, T.UNorm, quality=Q.Low)

        fused = ct.Texture(ct.Dimension.Dim2D, 96, 64)
        fused.set_image(img)
        assert fused.convert_with_mips(F.BC3, T.UNorm, quality=Q.Low)

        assert fused.mip_levels == host.mip_levels == 7
        for lvl in range(host.mip_levels):
            a = host.data(mip_level=lvl)
            b = fused.data(mip_level=lvl)
            assert len(a) == len(b)
            da = decode_bc3(np.frombuffer(a, np.uint8))
            db = decode_bc3(np.frombuffer(b, np.uint8))
            # Quality-equivalent (float path vs u8-wire host path).
            assert np.abs(da.astype(int) - db.astype(int)).mean() < 2.0

    def test_deterministic(self):
        img = _img(32, 32, seed=3)
        outs = []
        for _ in range(2):
            t = ct.Texture(ct.Dimension.Dim2D, 32, 32)
            t.set_image(img)
            assert t.convert_with_mips(F.BC1_RGB, T.UNorm, quality=Q.Lowest)
            outs.append(t.save_to_bytes(ct.FileType.DDS)[1])
        assert outs[0] == outs[1]

    @pytest.mark.parametrize("ndev", [4, 8])
    def test_mesh_shard_equivalence(self, ndev):
        """The fused pipeline shards its block batch over the active mesh
        and must produce bytes identical to the single-device run."""
        import jax
        from jax.sharding import Mesh

        from cuttlefish_tpu.parallel import BLOCK_AXIS, use_mesh

        img = _img(64, 48, seed=5)

        def run(mesh):
            t = ct.Texture(ct.Dimension.Dim2D, 64, 48)
            t.set_image(img)
            with use_mesh(mesh):
                assert t.convert_with_mips(F.BC3, T.UNorm, quality=Q.Low)
            return t.save_to_bytes(ct.FileType.KTX)[1]

        mesh = Mesh(np.asarray(jax.devices()[:ndev]), (BLOCK_AXIS,))
        assert run(mesh) == run(None)

    def test_srgb_cube_astc(self):
        img = _img(16, 16, seed=5)
        tex = ct.Texture(ct.Dimension.Cube, 16, 16, color_space=ct.ColorSpace.sRGB)
        for face in ct.CubeFace:
            tex.set_image(img, face=face)
        assert tex.convert_with_mips(F.ASTC_4x4, T.UNorm, quality=Q.Lowest)
        assert tex.mip_levels == 5
        for lvl in range(5):
            side = max(16 >> lvl, 1)
            blocks = (-(-side // 4)) ** 2
            for face in ct.CubeFace:
                assert len(tex.data(face, lvl)) == blocks * 16
        res, data = tex.save_to_bytes(ct.FileType.KTX)
        assert res is ct.SaveResult.Success

    def test_array(self):
        tex = ct.Texture(ct.Dimension.Dim2D, 16, 16, depth=3)
        for d in range(3):
            tex.set_image(_img(16, 16, seed=d), depth=d)
        assert tex.convert_with_mips(F.ETC2_R8G8B8, T.UNorm, quality=Q.Lowest)
        per = 16 * block_size(F.ETC2_R8G8B8)
        assert len(tex.data(depth=2)) == per
        # layers differ (different source images)
        assert tex.data(depth=0) != tex.data(depth=1)

    def test_rejections(self):
        # 3D and uncompressed formats fall back to the host path.
        t3 = ct.Texture(ct.Dimension.Dim3D, 8, 8, depth=2)
        for z in range(2):
            t3.set_image(_img(8, 8), depth=z)
        assert not t3.convert_with_mips(F.BC1_RGB, T.UNorm)
        t2 = ct.Texture(ct.Dimension.Dim2D, 8, 8)
        t2.set_image(_img(8, 8))
        assert not t2.convert_with_mips(F.R8G8B8A8, T.UNorm)
        assert not t2.convert_with_mips(F.BC1_RGB, T.SNorm)
        # missing level-0 image
        t4 = ct.Texture(ct.Dimension.Cube, 8, 8)
        t4.set_image(_img(8, 8), face=ct.CubeFace.PosX)
        assert not t4.convert_with_mips(F.BC1_RGB, T.UNorm)

    @pytest.mark.parametrize("srgb", [False, True])
    def test_device_normal_map(self, srgb):
        """convert_with_mips(normal_map=...) equals the host
        create_normal_map + set_image + generate_mipmaps + convert flow
        (within u8 wire quantization)."""
        from cuttlefish_tpu.decode.bc7 import decode_bc7
        from cuttlefish_tpu.image.image import NormalOptions

        y, x = np.mgrid[0:32, 0:48].astype(np.float32)
        hf = (0.5 + 0.4 * np.sin(x / 5) * np.cos(y / 7)).astype(np.float32)
        arr = np.stack([hf, hf, hf, np.ones_like(hf)], -1)
        cs = ct.ColorSpace.sRGB if srgb else ct.ColorSpace.Linear
        opts = NormalOptions.WrapX

        host = ct.Texture(ct.Dimension.Dim2D, 48, 32, color_space=cs)
        img = ct.Image.from_array(arr, ct.ImageFormat.RGBAF)
        host.set_image(img.create_normal_map(opts, height=2.0))
        host.generate_mipmaps()
        assert host.convert(F.BC7, T.UNorm, quality=Q.Low)

        fused = ct.Texture(ct.Dimension.Dim2D, 48, 32, color_space=cs)
        fused.set_image(ct.Image.from_array(arr, ct.ImageFormat.RGBAF))
        assert fused.convert_with_mips(
            F.BC7, T.UNorm, quality=Q.Low,
            normal_map=opts, normal_height=2.0,
        )
        assert fused.mip_levels == host.mip_levels
        for lvl in range(host.mip_levels):
            a = decode_bc7(np.frombuffer(host.data(mip_level=lvl), np.uint8))
            b = decode_bc7(np.frombuffer(fused.data(mip_level=lvl), np.uint8))
            assert np.abs(a.astype(int) - b.astype(int)).mean() < 2.0

    def test_signed_bc6h_negatives_survive_mips(self):
        """Regression: the device mip chain must not clamp — signed BC6H
        content keeps negative values through resampling."""
        from cuttlefish_tpu.decode.bc6h import decode_bc6h
        from cuttlefish_tpu.packfloat import half_bits_to_f32

        rng = np.random.default_rng(9)
        arr = (rng.random((16, 16, 4)).astype(np.float32) - 0.5) * 2.0
        arr[..., 3] = 1.0
        img = ct.Image.from_array(arr, ct.ImageFormat.RGBAF)

        fused = ct.Texture(ct.Dimension.Dim2D, 16, 16)
        fused.set_image(img)
        assert fused.convert_with_mips(F.BC6H, T.Float, quality=Q.Lowest)
        host = ct.Texture(ct.Dimension.Dim2D, 16, 16)
        host.set_image(img)
        host.generate_mipmaps()
        assert host.convert(F.BC6H, T.Float, quality=Q.Lowest)
        for lvl in (1, 2):
            df = half_bits_to_f32(
                decode_bc6h(
                    np.frombuffer(fused.data(mip_level=lvl), np.uint8),
                    signed=True,
                ).astype(np.uint16)
            )
            dh = half_bits_to_f32(
                decode_bc6h(
                    np.frombuffer(host.data(mip_level=lvl), np.uint8),
                    signed=True,
                ).astype(np.uint16)
            )
            assert (df < -0.05).any()  # negatives survived
            assert np.abs(df - dh).mean() < 0.05

    @pytest.mark.slow
    def test_fused_first_then_host_fresh_process(self):
        """Regression: running the fused path FIRST in a fresh process
        must not leak kernel-module jnp constants created mid-trace into
        the later host-path jit (UnexpectedTracerError)."""
        import os
        import subprocess
        import sys

        src = r"""
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np, cuttlefish_tpu as ct
rng = np.random.default_rng(0)
img = ct.Image.from_array(rng.random((32,32,4)).astype(np.float32), ct.ImageFormat.RGBAF)
t = ct.Texture(ct.Dimension.Dim2D, 32, 32)
t.set_image(img)
assert t.convert_with_mips(ct.TextureFormat.BC3, ct.TextureType.UNorm, quality=ct.Quality.Lowest)
t2 = ct.Texture(ct.Dimension.Dim2D, 32, 32)
t2.set_image(img); t2.generate_mipmaps()
assert t2.convert(ct.TextureFormat.BC3, ct.TextureType.UNorm, quality=ct.Quality.Lowest)
print("OK")
"""
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        out = subprocess.run(
            [sys.executable, "-c", src],
            capture_output=True,
            text=True,
            timeout=600,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            env=env,
        )
        assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-3000:]

    def test_mip_level_cap(self):
        t = ct.Texture(ct.Dimension.Dim2D, 32, 32)
        t.set_image(_img(32, 32))
        assert t.convert_with_mips(F.BC1_RGB, T.UNorm, mip_levels=3)
        assert t.mip_levels == 3
        res, data = t.save_to_bytes(ct.FileType.KTX)
        assert res is ct.SaveResult.Success
