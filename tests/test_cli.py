"""CLI integration tests: exit-code driven, mirroring the reference's ctest
tier (`/root/reference/tool/CMakeLists.txt` ~90 run-test.sh entries)."""

import os
import struct
import zlib

import numpy as np
import pytest

from cuttlefish_tpu.cli import run


def _write_png(path, w=16, h=16, seed=0, gray=False):
    import PIL.Image

    rng = np.random.default_rng(seed)
    if gray:
        arr = (rng.random((h, w)) * 255).astype(np.uint8)
        PIL.Image.fromarray(arr, "L").save(path)
    else:
        arr = (rng.random((h, w, 4)) * 255).astype(np.uint8)
        PIL.Image.fromarray(arr, "RGBA").save(path)
    return path


@pytest.fixture
def png(tmp_path):
    return _write_png(str(tmp_path / "texture.png"))


@pytest.fixture
def out(tmp_path):
    return str(tmp_path / "out.dds")


class TestBasic:
    def test_simple_convert(self, png, out):
        assert run(["-i", png, "-f", "R8G8B8A8", "-o", out]) == 0
        assert os.path.exists(out)

    def test_help(self, capsys):
        assert run(["--help"]) == 1
        assert "Usage" in capsys.readouterr().out

    def test_no_args_prints_help(self, capsys):
        assert run([]) == 1

    def test_missing_output(self, png):
        assert run(["-i", png, "-f", "R8G8B8A8"]) == 1

    def test_missing_format(self, png, out):
        assert run(["-i", png, "-o", out]) == 1

    def test_unknown_format(self, png, out):
        assert run(["-i", png, "-f", "NOPE", "-o", out]) == 1

    def test_unknown_flag(self, png, out):
        assert run(["-i", png, "-f", "R8", "-o", out, "--bogus"]) == 1

    def test_missing_input_file(self, tmp_path, out):
        assert run(["-i", str(tmp_path / "nope.png"), "-f", "R8", "-o", out]) == 2

    def test_quiet_and_verbose(self, png, out, capsys):
        assert run(["-q", "-i", png, "-f", "R8", "-o", out]) == 0
        assert capsys.readouterr().out == ""
        assert run(["-v", "-i", png, "-f", "R8", "-o", out]) == 0
        assert "loading" in capsys.readouterr().out

    def test_format_name_case_insensitive(self, png, out):
        assert run(["-i", png, "-f", "r8g8b8a8", "-o", out]) == 0

    def test_invalid_type_for_format(self, png, out):
        assert run(["-i", png, "-f", "BC1_RGB", "-t", "snorm", "-o", out]) == 1

    def test_create_dir(self, png, tmp_path):
        out = str(tmp_path / "sub" / "dir" / "out.dds")
        assert run(["-i", png, "-f", "R8", "-o", out, "--create-dir"]) == 0
        assert os.path.exists(out)

    def test_file_format_override(self, png, tmp_path):
        out = str(tmp_path / "weird.bin")
        assert run(["-i", png, "-f", "R8G8B8A8", "-o", out, "--file-format", "ktx"]) == 0

    def test_undeducible_file_type(self, png, tmp_path):
        assert run(["-i", png, "-f", "R8", "-o", str(tmp_path / "o.bin")]) == 1


class TestCompressed:
    def test_bc1_mipmaps(self, png, out):
        assert run(["-i", png, "-f", "BC1_RGB", "-m", "-o", out]) == 0

    def test_bc7_quality(self, png, out):
        assert run(["-i", png, "-f", "BC7", "-Q", "lowest", "-o", out]) == 0

    def test_quality_keyword_case(self, png, out):
        assert run(["-i", png, "-f", "BC1_RGB", "-Q", "LOWEST", "-o", out]) == 0

    def test_etc2_ktx(self, png, tmp_path):
        out = str(tmp_path / "o.ktx")
        assert run(["-i", png, "-f", "ETC2_R8G8B8", "-Q", "lowest", "-o", out]) == 0

    def test_astc_srgb(self, png, tmp_path):
        out = str(tmp_path / "o.ktx")
        assert run(
            ["-i", png, "-f", "ASTC_4x4", "--srgb", "-Q", "lowest", "-o", out]
        ) == 0

    def test_srgb_low_precision_falls_back_linear(self, png, out):
        # R5G6B5 has no native sRGB; texture silently converts to linear.
        assert run(["-i", png, "-f", "R5G6B5", "--srgb", "-o", out]) == 0


class TestProcessing:
    def test_resize_fixed(self, png, out):
        assert run(["-i", png, "-r", "8", "8", "-f", "R8", "-o", out]) == 0

    def test_resize_symbolic(self, tmp_path, out):
        png = _write_png(str(tmp_path / "t.png"), w=20, h=12)
        assert run(["-i", png, "-r", "nextpo2", "NEXTPO2", "-f", "R8", "-o", out]) == 0

    def test_resize_filter(self, png, out):
        assert run(
            ["-i", png, "-r", "8", "8", "b-spline", "-f", "R8", "-o", out]
        ) == 0

    def test_resize_bad(self, png, out):
        assert run(["-i", png, "-r", "0", "8", "-f", "R8", "-o", out]) == 1

    def test_rotate(self, png, out):
        assert run(["-i", png, "--rotate", "270", "-f", "R8", "-o", out]) == 0

    def test_rotate_invalid(self, png, out):
        assert run(["-i", png, "--rotate", "45", "-f", "R8", "-o", out]) == 1

    def test_flips_swizzle_grayscale(self, png, out):
        assert run(
            ["-i", png, "--flipx", "--flipy", "-g", "-s", "rrrx", "-f", "R8",
             "-o", out]
        ) == 0

    def test_swizzle_invalid(self, png, out):
        assert run(["-i", png, "-s", "rgbz", "-f", "R8", "-o", out]) == 1

    def test_normalmap(self, tmp_path, out):
        png = _write_png(str(tmp_path / "h.png"), gray=True)
        assert run(
            ["-i", png, "-n", "wrap", "2.0", "-f", "R8G8B8A8", "-o", out]
        ) == 0

    def test_premultiply(self, png, out):
        assert run(["-i", png, "--pre-multiply", "-f", "R8G8B8A8", "-o", out]) == 0


class TestMultiImage:
    def test_array(self, tmp_path):
        pngs = [_write_png(str(tmp_path / f"a{i}.png"), seed=i) for i in range(3)]
        out = str(tmp_path / "o.ktx")
        argv = []
        for i, p in enumerate(pngs):
            argv += ["-a", str(i), p]
        assert run(argv + ["-f", "R8G8B8A8", "-o", out]) == 0

    def test_cube(self, tmp_path):
        faces = ["+x", "-x", "+y", "-y", "+z", "-z"]
        out = str(tmp_path / "o.ktx")
        argv = []
        for i, f in enumerate(faces):
            argv += ["-c", f, _write_png(str(tmp_path / f"f{i}.png"), seed=i)]
        assert run(argv + ["-f", "BC1_RGB", "-Q", "lowest", "-o", out]) == 0

    def test_cube_face_keyword_case(self, tmp_path):
        out = str(tmp_path / "o.ktx")
        p = _write_png(str(tmp_path / "f.png"))
        argv = []
        for f in ["+X", "-X", "+Y", "-Y", "+Z", "-Z"]:
            argv += ["-c", f, p]
        assert run(argv + ["-f", "R8", "-o", out]) == 0

    def test_cube_incomplete(self, tmp_path):
        # Caught at validate like the reference (exit 1, "not all images
        # were provided" — CommandLine.cpp:676-683, ctest CubeMissingFace).
        out = str(tmp_path / "o.ktx")
        p = _write_png(str(tmp_path / "f.png"))
        assert run(["-c", "+x", p, "-f", "R8", "-o", out]) == 1

    def test_mixed_inputs_rejected(self, png, tmp_path):
        out = str(tmp_path / "o.dds")
        assert run(["-i", png, "-a", "1", png, "-f", "R8", "-o", out]) == 1

    def test_3d(self, tmp_path):
        pngs = [_write_png(str(tmp_path / f"s{i}.png"), seed=i) for i in range(4)]
        out = str(tmp_path / "o.ktx")
        argv = []
        for i, p in enumerate(pngs):
            argv += ["-a", str(i), p]
        assert run(argv + ["-d", "3", "-f", "R8G8B8A8", "-o", out]) == 0

    def test_input_list(self, tmp_path):
        pngs = [_write_png(str(tmp_path / f"l{i}.png"), seed=i) for i in range(2)]
        lst = tmp_path / "list.txt"
        lst.write_text("\n".join(pngs) + "\n")
        out = str(tmp_path / "o.ktx")
        assert run(["-I", "array", str(lst), "-f", "R8", "-o", out]) == 0


class TestCustomMips:
    def test_custom_mip(self, tmp_path):
        base = _write_png(str(tmp_path / "b.png"), w=16, h=16)
        mip = _write_png(str(tmp_path / "m.png"), w=8, h=8, seed=5)
        out = str(tmp_path / "o.dds")
        assert run(
            ["-i", base, "-m", "-M", "1", "once", mip, "-f", "R8G8B8A8",
             "-o", out]
        ) == 0

    def test_custom_mip_without_mipmap(self, tmp_path):
        base = _write_png(str(tmp_path / "b.png"))
        mip = _write_png(str(tmp_path / "m.png"), w=8, h=8)
        out = str(tmp_path / "o.dds")
        assert run(
            ["-i", base, "-M", "1", "once", mip, "-f", "R8", "-o", out]
        ) == 1

    def test_custom_mip_level0(self, tmp_path):
        base = _write_png(str(tmp_path / "b.png"))
        out = str(tmp_path / "o.dds")
        assert run(
            ["-i", base, "-m", "-M", "0", "once", base, "-f", "R8", "-o", out]
        ) == 1


class TestReferenceParityExtras:
    def test_unicode_filename(self, tmp_path):
        # Mirrors the reference fixture with a non-ASCII path (地.png).
        p = _write_png(str(tmp_path / "地.png"))
        out = str(tmp_path / "地.dds")
        assert run(["-i", p, "-f", "R8G8B8A8", "-o", out]) == 0
        assert os.path.exists(out)

    def test_cube_input_list(self, tmp_path):
        pngs = [_write_png(str(tmp_path / f"c{i}.png"), seed=i) for i in range(6)]
        lst = tmp_path / "cube.txt"
        lst.write_text("\n".join(pngs) + "\n")
        out = str(tmp_path / "o.ktx")
        assert run(["-I", "cube", str(lst), "-f", "R8", "-o", out]) == 0

    def test_custom_mip_list(self, tmp_path):
        base = _write_png(str(tmp_path / "b.png"), w=16, h=16)
        mip1 = _write_png(str(tmp_path / "m1.png"), w=8, h=8, seed=5)
        mip2 = _write_png(str(tmp_path / "m2.png"), w=4, h=4, seed=6)
        lst = tmp_path / "mips.txt"
        lst.write_text(f"1 once {mip1}\n2 continue {mip2}\n")
        out = str(tmp_path / "o.dds")
        assert run(
            ["-i", base, "-m", "--custom-mip-list", str(lst), "-f", "R8G8B8A8",
             "-o", out]
        ) == 0

    @pytest.mark.parametrize("mode", ["none", "standard", "pre-multiplied", "encoded"])
    def test_alpha_modes(self, png, out, mode):
        assert run(["-i", png, "--alpha", mode, "-f", "R8G8B8A8", "-o", out]) == 0

    def test_alpha_invalid(self, png, out):
        assert run(["-i", png, "--alpha", "weird", "-f", "R8", "-o", out]) == 1

    def test_dimension_invalid(self, png, out):
        assert run(["-i", png, "-d", "4", "-f", "R8", "-o", out]) == 1

    def test_swizzle_null_channel(self, png, out):
        assert run(["-i", png, "-s", "rgbx", "-f", "R8G8B8A8", "-o", out]) == 0

    def test_jobs_flag_accepted(self, png, out):
        assert run(["-j", "4", "-i", png, "-f", "R8", "-o", out]) == 0
        assert run(["-j", "-i", png, "-f", "R8", "-o", out]) == 0

    def test_resize_all_symbolic_forms(self, tmp_path, out):
        png = _write_png(str(tmp_path / "t.png"), w=20, h=12)
        for sym in ("nearestpo2", "width", "height", "min", "max",
                    "min-nearestpo2", "max-nextpo2", "width-nearestpo2",
                    "height-nextpo2"):
            assert run(["-i", png, "-r", sym, sym, "-f", "R8", "-o", out]) == 0

    def test_mipmap_levels_and_filter(self, png, out):
        assert run(
            ["-i", png, "-m", "2", "box", "-f", "R8G8B8A8", "-o", out]
        ) == 0

    def test_bc1a_punch_through_cli(self, tmp_path):
        import PIL.Image

        rng = np.random.default_rng(7)
        arr = (rng.random((16, 16, 4)) * 255).astype(np.uint8)
        arr[..., 3] = np.where(arr[..., 3] > 128, 255, 0)
        p = str(tmp_path / "a.png")
        PIL.Image.fromarray(arr, "RGBA").save(p)
        out = str(tmp_path / "o.dds")
        assert run(["-i", p, "-f", "BC1_RGBA", "-Q", "lowest", "-o", out]) == 0


class TestCustomMipDefaults:
    def test_default_replacement_is_continue(self, tmp_path):
        """-M without once/continue uses Continue (CommandLine.cpp:1076):
        mips BELOW the custom level must derive from the custom image, not
        resume the original chain."""
        import PIL.Image

        # 8x8 base: all black.  Custom mip 1 (4x4): all white.  With
        # Continue, mip 2 (2x2) is white; with Once it would be black.
        base = str(tmp_path / "base.png")
        PIL.Image.fromarray(np.zeros((8, 8, 4), np.uint8)).save(base)
        custom = str(tmp_path / "white.png")
        PIL.Image.fromarray(
            np.full((4, 4, 4), 255, np.uint8)).save(custom)
        out = str(tmp_path / "o.ktx")
        assert run([
            "-i", base, "-f", "R8G8B8A8", "-m", "-M", "1", custom,
            "-o", out,
        ]) == 0
        data = open(out, "rb").read()
        # KTX1: 64B header + per-mip (4B size + payload); mip2 is 2x2 RGBA8.
        off = 64
        for _ in range(2):  # skip mips 0 and 1
            (sz,) = struct.unpack("<I", data[off : off + 4])
            off += 4 + sz
        (sz,) = struct.unpack("<I", data[off : off + 4])
        mip2 = data[off + 4 : off + 4 + sz]
        assert sz == 2 * 2 * 4
        assert set(mip2[0::4]) == {255}, "mip2 must derive from the custom image"
