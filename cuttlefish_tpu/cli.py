"""Command-line tool: full flag surface of the reference `cuttlefish` CLI.

Parity target: `/root/reference/tool/CommandLine.cpp` (flags, symbolic
resize sizes, case-insensitive keywords, validation) and
`/root/reference/tool/main.cpp` (processing order, exit codes 1=args,
2=load, 3=convert/save).  `-j/--jobs` is accepted for compatibility; the
TPU build parallelizes over the device mesh instead of threads.
"""

from __future__ import annotations

import os
import sys

from cuttlefish_tpu.formats import (
    Alpha,
    ColorSpace,
    CubeFace,
    Dimension,
    FileType,
    ImageIndex,
    MipReplacement,
    Quality,
    SaveResult,
    TextureFormat,
    TextureType,
    file_type_for_name,
    has_native_srgb,
    is_format_valid,
)
from cuttlefish_tpu.image import Channel, Image, ImageFormat, NormalOptions, ResizeFilter, RotateAngle
from cuttlefish_tpu.texture import CustomMipImage, Texture

# Symbolic resize sizes (CommandLine.h:41-58).
ORIGINAL = -1
_SYMBOLIC_SIZES = {
    "nextpo2": -2, "nearestpo2": -3, "width": -4, "width-nextpo2": -5,
    "width-nearestpo2": -6, "height": -7, "height-nextpo2": -8,
    "height-nearestpo2": -9, "min": -10, "min-nextpo2": -11,
    "min-nearestpo2": -12, "max": -13, "max-nextpo2": -14,
    "max-nearestpo2": -15,
}

_FILTERS = {
    "box": ResizeFilter.Box,
    "linear": ResizeFilter.Linear,
    "cubic": ResizeFilter.Cubic,
    "catmull-rom": ResizeFilter.CatmullRom,
    "b-spline": ResizeFilter.BSpline,
}

_FACES = {
    "+x": CubeFace.PosX, "-x": CubeFace.NegX,
    "+y": CubeFace.PosY, "-y": CubeFace.NegY,
    "+z": CubeFace.PosZ, "-z": CubeFace.NegZ,
}

_TYPES = {
    "unorm": TextureType.UNorm, "snorm": TextureType.SNorm,
    "uint": TextureType.UInt, "int": TextureType.Int,
    "ufloat": TextureType.UFloat, "float": TextureType.Float,
}

_ALPHAS = {
    "none": Alpha.Null, "standard": Alpha.Standard,
    "pre-multiplied": Alpha.PreMultiplied, "encoded": Alpha.Encoded,
}

_QUALITIES = {
    "lowest": Quality.Lowest, "low": Quality.Low, "normal": Quality.Normal,
    "high": Quality.High, "highest": Quality.Highest,
}

_FILE_FORMATS = {
    "dds": FileType.DDS,
    "ktx": FileType.KTX,
    "ktx2": FileType.KTX2,
    "pvr": FileType.PVR,
}

_SWIZZLE = {
    "r": Channel.Red, "g": Channel.Green, "b": Channel.Blue,
    "a": Channel.Alpha, "x": Channel.Null,
}

_FORMATS = {f.name.lower(): f for f in TextureFormat if f is not TextureFormat.Unknown}

IMAGE, ARRAY, CUBE, CUBE_ARRAY = range(4)
_LIST_TYPES = {"image": IMAGE, "array": ARRAY, "cube": CUBE, "cube-array": CUBE_ARRAY}

HELP = """Usage: cuttlefish [options]

General options:
  -h, --help     display this help message
  -j, --jobs [n] the number of jobs to convert with (accepted for
                 compatibility; this build parallelizes over the TPU mesh)
  -q, --quiet    suppress all non-error output
  -v, --verbose  verbose output

Input files (at least one required, cannot mix different types):
  -i, --input file               input image for a standard texture
  -a, --array [n] file           input image for an array or 3D texture
  -c, --cube face file           input image for a cube map face
                                   (face: +x, -x, +y, -y, +z, -z)
  -C, --cube-array n face file   input image for a cube map array
  -I, --input-list type file     file listing image paths
                                   (type: image, array, cube, cube-array)

Image processing:
  -r, --resize w h [filter]      resize images; w/h may be a number or:
                                   nextpo2, nearestpo2, width, height, min,
                                   max (optionally with -nextpo2 /
                                   -nearestpo2 suffixes)
                                 filter: box, linear, cubic, catmull-rom,
                                 b-spline
  -m, --mipmap [levels] [filter] generate mipmaps
  -M, --custom-mip level [depth] [face] [once|continue] file
                                 provide a custom mip image
      --custom-mip-list file     file listing custom mip entries
      --flipx / --flipy          flip images
      --rotate degrees           rotate by a multiple of 90 degrees
  -n, --normalmap [wrap|wrapx|wrapy] [height]
                                 generate a normal map from a height field
  -g, --grayscale                convert to grayscale
  -s, --swizzle rgbax            swizzle channels (r, g, b, a, or x for none)
      --srgb                     treat input as sRGB
      --pre-multiply             pre-multiply alpha

Output:
  -d, --dimension 1|2|3          texture dimension
  -f, --format name              texture format (see list in docs)
  -t, --type type                unorm, snorm, uint, int, ufloat, float
      --alpha mode               none, standard, pre-multiplied, encoded
  -Q, --quality q                lowest, low, normal, high, highest
  -o, --output file              output texture path
      --file-format dds|ktx|ktx2|pvr
                                 container (deduced from extension if absent)
      --create-dir               create the output directory if needed
      --device-mips              fuse mipmap generation into the encode
                                 dispatch on device (TPU extension; block
                                 formats, no custom mips)
      --supercompression none|zstd|zlib
                                 KTX2 supercompression scheme, applied per
                                 mip level (KTX2 output only)
"""


class Args:
    def __init__(self):
        self.jobs = 1
        self.log = "normal"  # normal | quiet | verbose
        self.image_type = IMAGE
        self.images: list[tuple] = []  # (index|face|None..., path)
        self.width = ORIGINAL
        self.height = ORIGINAL
        self.resize_filter = ResizeFilter.CatmullRom
        self.mip_levels = 0
        self.mip_filter = ResizeFilter.CatmullRom
        self.custom_mips: dict[ImageIndex, CustomMipImage] = {}
        self.flip_x = False
        self.flip_y = False
        self.rotate = None
        self.normal_map = False
        self.normal_options = NormalOptions.Default
        self.normal_height = 1.0
        self.grayscale = False
        self.swizzle = None
        self.image_color_space = ColorSpace.Linear
        self.texture_color_space = ColorSpace.Linear
        self.pre_multiply = False
        self.dimension = Dimension.Dim2D
        self.fmt = TextureFormat.Unknown
        self.type = TextureType.UNorm
        self.alpha = None
        self.quality = Quality.Normal
        self.output = ""
        self.file_type = FileType.Auto
        self.create_dir = False
        self.device_mips = False
        self.supercompression = "none"


def _err(msg: str) -> None:
    print(f"error: {msg}", file=sys.stderr)


def _parse_custom_mip_entry(parts: list[str]):
    """One custom-mip list line: level [depth] [face] [once|continue] file."""
    if len(parts) < 2 or not parts[0].isdigit():
        _err(f"invalid custom mip entry: {' '.join(parts)}")
        return None
    level = int(parts[0])
    pos = 1
    depth = 0
    face = CubeFace.PosX
    repl = MipReplacement.Once
    if pos < len(parts) - 1 and parts[pos].isdigit():
        depth = int(parts[pos])
        pos += 1
    if pos < len(parts) - 1 and parts[pos].lower() in _FACES:
        face = _FACES[parts[pos].lower()]
        pos += 1
    if pos < len(parts) - 1 and parts[pos].lower() in ("once", "continue"):
        repl = (
            MipReplacement.Once
            if parts[pos].lower() == "once"
            else MipReplacement.Continue
        )
        pos += 1
    if pos != len(parts) - 1:
        _err(f"invalid custom mip entry: {' '.join(parts)}")
        return None
    idx = ImageIndex(cube_face=face, mip_level=level, depth=depth)
    return idx, CustomMipImage(parts[pos], repl)


def parse(argv: list[str]) -> Args | None:
    """Parse argv (without program name); None on error or after --help."""
    args = Args()
    if not argv:
        print(HELP)
        return None

    def need(i, n, flag):
        if i + n >= len(argv):
            _err(f"command {flag} requires {n} argument{'s' if n > 1 else ''}")
            return False
        return True

    input_seen = None

    def set_input_type(t, flag):
        nonlocal input_seen
        if input_seen is not None and input_seen != t:
            _err("cannot mix input types")
            return False
        input_seen = t
        args.image_type = t
        return True

    i = 0
    ok = True
    while i < len(argv) and ok:
        a = argv[i]
        if a in ("-h", "--help"):
            print(HELP)
            return None
        elif a in ("-j", "--jobs"):
            if i + 1 < len(argv) and argv[i + 1].isdigit():
                args.jobs = int(argv[i + 1])
                i += 1
            else:
                args.jobs = 0  # all cores / whole mesh
        elif a in ("-q", "--quiet"):
            args.log = "quiet"
        elif a in ("-v", "--verbose"):
            args.log = "verbose"
        elif a in ("-i", "--input"):
            ok = need(i, 1, a) and set_input_type(IMAGE, a)
            if ok:
                args.images.append((len(args.images), argv[i + 1]))
                i += 1
        elif a in ("-a", "--array"):
            ok = need(i, 1, a) and set_input_type(ARRAY, a)
            if ok:
                if i + 2 < len(argv) and argv[i + 1].isdigit():
                    args.images.append((int(argv[i + 1]), argv[i + 2]))
                    i += 2
                else:
                    args.images.append((len(args.images), argv[i + 1]))
                    i += 1
        elif a in ("-c", "--cube"):
            ok = need(i, 2, a) and set_input_type(CUBE, a)
            if ok:
                face = _FACES.get(argv[i + 1].lower())
                if face is None:
                    _err(f"unknown cube face '{argv[i + 1]}'")
                    ok = False
                else:
                    args.images.append((0, face, argv[i + 2]))
                    i += 2
        elif a in ("-C", "--cube-array"):
            ok = need(i, 3, a) and set_input_type(CUBE_ARRAY, a)
            if ok:
                if not argv[i + 1].isdigit():
                    _err(f"invalid cube array index '{argv[i + 1]}'")
                    ok = False
                else:
                    face = _FACES.get(argv[i + 2].lower())
                    if face is None:
                        _err(f"unknown cube face '{argv[i + 2]}'")
                        ok = False
                    else:
                        args.images.append((int(argv[i + 1]), face, argv[i + 3]))
                        i += 3
        elif a in ("-I", "--input-list"):
            ok = need(i, 2, a)
            if ok:
                ltype = _LIST_TYPES.get(argv[i + 1].lower())
                if ltype is None:
                    _err(f"unknown input list type '{argv[i + 1]}'")
                    ok = False
                else:
                    ok = set_input_type(ltype, a)
                    if ok:
                        try:
                            with open(argv[i + 2]) as f:
                                paths = [ln.strip() for ln in f if ln.strip()]
                        except OSError:
                            _err(f"couldn't read input list '{argv[i + 2]}'")
                            ok = False
                        else:
                            for n, p in enumerate(paths):
                                if ltype in (CUBE, CUBE_ARRAY):
                                    args.images.append(
                                        (n // 6, CubeFace(n % 6), p)
                                    )
                                else:
                                    args.images.append((n, p))
                            i += 2
        elif a in ("-r", "--resize"):
            ok = need(i, 2, a)
            if ok:
                def parse_size(s):
                    sl = s.lower()
                    if sl in _SYMBOLIC_SIZES:
                        return _SYMBOLIC_SIZES[sl]
                    if s.isdigit() and int(s) > 0:
                        return int(s)
                    return None

                w = parse_size(argv[i + 1])
                h = parse_size(argv[i + 2])
                if w is None or h is None:
                    _err("invalid resize size")
                    ok = False
                else:
                    args.width, args.height = w, h
                    i += 2
                    if i + 1 < len(argv) and argv[i + 1].lower() in _FILTERS:
                        args.resize_filter = _FILTERS[argv[i + 1].lower()]
                        i += 1
        elif a in ("-m", "--mipmap"):
            args.mip_levels = -1  # all levels
            if i + 1 < len(argv) and argv[i + 1].isdigit():
                args.mip_levels = int(argv[i + 1])
                i += 1
            if i + 1 < len(argv) and argv[i + 1].lower() in _FILTERS:
                args.mip_filter = _FILTERS[argv[i + 1].lower()]
                i += 1
        elif a in ("-M", "--custom-mip"):
            ok = need(i, 2, a)
            if ok:
                if not argv[i + 1].isdigit():
                    _err("custom mip level must be a number")
                    ok = False
                else:
                    level = int(argv[i + 1])
                    i += 1
                    depth = 0
                    face = CubeFace.PosX
                    repl = MipReplacement.Once
                    if i + 1 < len(argv) and argv[i + 1].isdigit():
                        depth = int(argv[i + 1])
                        i += 1
                    if i + 1 < len(argv) and argv[i + 1].lower() in _FACES:
                        face = _FACES[argv[i + 1].lower()]
                        i += 1
                    if i + 1 < len(argv) and argv[i + 1].lower() in ("once", "continue"):
                        repl = (
                            MipReplacement.Once
                            if argv[i + 1].lower() == "once"
                            else MipReplacement.Continue
                        )
                        i += 1
                    if i + 1 >= len(argv):
                        _err("custom mip requires an image path")
                        ok = False
                    else:
                        idx = ImageIndex(
                            cube_face=face, mip_level=level, depth=depth
                        )
                        args.custom_mips[idx] = CustomMipImage(
                            argv[i + 1], repl
                        )
                        i += 1
        elif a == "--custom-mip-list":
            ok = need(i, 1, a)
            if ok:
                try:
                    with open(argv[i + 1]) as f:
                        lines = [ln.split() for ln in f if ln.strip()]
                except OSError:
                    _err(f"couldn't read custom mip list '{argv[i + 1]}'")
                    ok = False
                else:
                    for parts in lines:
                        entry = _parse_custom_mip_entry(parts)
                        if entry is None:
                            ok = False
                            break
                        idx, cm = entry
                        args.custom_mips[idx] = cm
                    i += 1
        elif a == "--flipx":
            args.flip_x = True
        elif a == "--flipy":
            args.flip_y = True
        elif a == "--rotate":
            ok = need(i, 1, a)
            if ok:
                try:
                    angle = int(argv[i + 1])
                except ValueError:
                    angle = 1
                if angle % 90 != 0:
                    _err("rotate angle must be a multiple of 90 degrees")
                    ok = False
                else:
                    quarter = (angle // 90) % 4
                    args.rotate = {
                        0: None,
                        1: RotateAngle.CW90,
                        2: RotateAngle.CW180,
                        3: RotateAngle.CW270,
                    }[quarter]
                    i += 1
        elif a in ("-n", "--normalmap"):
            args.normal_map = True
            if i + 1 < len(argv):
                nl = argv[i + 1].lower()
                if nl == "wrap":
                    args.normal_options |= NormalOptions.WrapX | NormalOptions.WrapY
                    i += 1
                elif nl == "wrapx":
                    args.normal_options |= NormalOptions.WrapX
                    i += 1
                elif nl == "wrapy":
                    args.normal_options |= NormalOptions.WrapY
                    i += 1
            if i + 1 < len(argv):
                try:
                    args.normal_height = float(argv[i + 1])
                    i += 1
                except ValueError:
                    pass
        elif a in ("-g", "--grayscale"):
            args.grayscale = True
        elif a in ("-s", "--swizzle"):
            ok = need(i, 1, a)
            if ok:
                sw = argv[i + 1].lower()
                if len(sw) != 4 or any(c not in _SWIZZLE for c in sw):
                    _err(f"invalid swizzle '{argv[i + 1]}'")
                    ok = False
                else:
                    args.swizzle = tuple(_SWIZZLE[c] for c in sw)
                    i += 1
        elif a == "--srgb":
            args.image_color_space = ColorSpace.sRGB
            args.texture_color_space = ColorSpace.sRGB
        elif a == "--pre-multiply":
            args.pre_multiply = True
        elif a in ("-d", "--dimension"):
            ok = need(i, 1, a)
            if ok:
                dims = {"1": Dimension.Dim1D, "2": Dimension.Dim2D, "3": Dimension.Dim3D}
                d = dims.get(argv[i + 1])
                if d is None:
                    _err(f"invalid dimension '{argv[i + 1]}'")
                    ok = False
                else:
                    args.dimension = d
                    i += 1
        elif a in ("-f", "--format"):
            ok = need(i, 1, a)
            if ok:
                fmt = _FORMATS.get(argv[i + 1].lower())
                if fmt is None:
                    _err(f"unknown format '{argv[i + 1]}'")
                    ok = False
                else:
                    args.fmt = fmt
                    i += 1
        elif a in ("-t", "--type"):
            ok = need(i, 1, a)
            if ok:
                t = _TYPES.get(argv[i + 1].lower())
                if t is None:
                    _err(f"unknown type '{argv[i + 1]}'")
                    ok = False
                else:
                    args.type = t
                    i += 1
        elif a == "--alpha":
            ok = need(i, 1, a)
            if ok:
                al_mode = _ALPHAS.get(argv[i + 1].lower())
                if al_mode is None:
                    _err(f"unknown alpha mode '{argv[i + 1]}'")
                    ok = False
                else:
                    args.alpha = al_mode
                    i += 1
        elif a in ("-Q", "--quality"):
            ok = need(i, 1, a)
            if ok:
                q = _QUALITIES.get(argv[i + 1].lower())
                if q is None:
                    _err(f"unknown quality '{argv[i + 1]}'")
                    ok = False
                else:
                    args.quality = q
                    i += 1
        elif a in ("-o", "--output"):
            ok = need(i, 1, a)
            if ok:
                args.output = argv[i + 1]
                i += 1
        elif a == "--file-format":
            ok = need(i, 1, a)
            if ok:
                ft = _FILE_FORMATS.get(argv[i + 1].lower())
                if ft is None:
                    _err(f"unknown file format '{argv[i + 1]}'")
                    ok = False
                else:
                    args.file_type = ft
                    i += 1
        elif a == "--create-dir":
            args.create_dir = True
        elif a == "--device-mips":
            args.device_mips = True
        elif a == "--supercompression":
            ok = need(i, 1, a)
            if ok:
                sc = argv[i + 1].lower()
                if sc not in ("none", "zlib", "zstd"):
                    _err(f"unknown supercompression '{argv[i + 1]}'")
                    ok = False
                else:
                    args.supercompression = sc
                    i += 1
        else:
            _err(f"unknown option '{a}'")
            ok = False
        i += 1

    if not ok:
        return None
    if not validate(args):
        return None
    return args


def validate(args: Args) -> bool:
    """Post-parse validation (CommandLine.cpp:680-793)."""
    if not args.images:
        _err("no input images provided")
        return False
    if args.fmt is TextureFormat.Unknown:
        _err("no texture format specified")
        return False
    if not args.output:
        _err("no output file specified")
        return False
    if args.file_type is FileType.Auto:
        args.file_type = file_type_for_name(args.output)
        if args.file_type is FileType.Auto:
            _err(f"cannot deduce file type for '{args.output}'")
            return False
    if not is_format_valid(args.fmt, args.type, args.file_type):
        _err(
            f"file format {args.file_type.name} doesn't support format "
            f"{args.fmt.name} with type {args.type.name}"
        )
        return False
    if args.texture_color_space is ColorSpace.sRGB and not has_native_srgb(
        args.fmt, args.type
    ):
        args.texture_color_space = ColorSpace.Linear
    if args.image_type in (CUBE, CUBE_ARRAY) and args.dimension is not Dimension.Dim2D:
        _err("cube maps must be 2D")
        return False
    if args.mip_levels == 0 and args.custom_mips:
        _err("cannot specify custom mip images without generating mipmaps")
        return False
    for idx in args.custom_mips:
        if idx.mip_level == 0:
            _err("cannot provide custom mip for level 0")
            return False
    if args.alpha is None:
        args.alpha = Alpha.PreMultiplied if args.pre_multiply else Alpha.Standard
    return True


# ---------------------------------------------------------------------------
# Pipeline (tool/main.cpp)
# ---------------------------------------------------------------------------


def _next_po2(x: int) -> int:
    return 1 << (x - 1).bit_length()


def _nearest_po2(x: int) -> int:
    up = _next_po2(x)
    down = max(1, up >> 1)
    return up if up - x <= x - down else down


def _get_dimension(base: int, width: int, height: int, size: int) -> int:
    if size >= 0:
        return size
    table = {
        ORIGINAL: base,
        -2: _next_po2(base), -3: _nearest_po2(base),
        -4: width, -5: _next_po2(width), -6: _nearest_po2(width),
        -7: height, -8: _next_po2(height), -9: _nearest_po2(height),
        -10: min(width, height), -11: _next_po2(min(width, height)),
        -12: _nearest_po2(min(width, height)),
        -13: max(width, height), -14: _next_po2(max(width, height)),
        -15: _nearest_po2(max(width, height)),
    }
    return table[size]


def _is_signed(t: TextureType) -> bool:
    return t in (TextureType.SNorm, TextureType.Int, TextureType.Float)


def load_and_process_image(args: Args, path: str, size_box: list, mip_level: int = 0):
    """Load + process one input (main.cpp:147-277).  Returns Image or None."""
    verbose = args.log == "verbose"
    if verbose:
        print(f"loading image '{path}'")
    img = Image(path, args.image_color_space)
    if not img:
        _err(f"couldn't load image '{path}'")
        return None

    if size_box[0] is None:
        size_box[0] = _get_dimension(img.width, img.width, img.height, args.width)
        size_box[1] = _get_dimension(img.height, img.width, img.height, args.height)
    width, height = size_box

    orig_format = img.format
    if img.format is not ImageFormat.RGBAF:
        img = img.convert(ImageFormat.RGBAF)
    if args.texture_color_space is not args.image_color_space:
        img.change_color_space(args.texture_color_space)

    this_w = max(width >> mip_level, 1)
    this_h = max(height >> mip_level, 1)
    nw, nh = (width, height) if args.normal_map else (this_w, this_h)
    if nw != img.width or nh != img.height:
        if verbose:
            print(f"resizing image '{path}' to {nw} x {nh}")
        img = img.resize(nw, nh, args.resize_filter)
    if args.rotate is not None:
        img = img.rotate(args.rotate)
    if args.grayscale:
        img.grayscale()
    if args.normal_map:
        options = args.normal_options
        if _is_signed(args.type):
            options |= NormalOptions.KeepSign
        img = img.create_normal_map(options, args.normal_height)
        if (nw, nh) != (this_w, this_h):
            img = img.resize(this_w, this_h, args.resize_filter)
        orig_format = img.format
    if args.flip_x:
        img.flip_horizontal()
    if args.flip_y:
        img.flip_vertical()
    if args.swizzle is not None:
        img.swizzle(*args.swizzle)
    if args.pre_multiply:
        img.pre_multiply_alpha()
    img = Texture.adjust_image_value_range(img, args.type, orig_format)
    return img


def run(argv: list[str]) -> int:
    args = parse(argv)
    if args is None:
        return 1

    verbose = args.log == "verbose"
    size_box = [None, None]

    # Load all inputs.
    loaded = []
    for entry in args.images:
        img = load_and_process_image(args, entry[-1], size_box)
        if img is None:
            return 2
        loaded.append((entry, img))

    width, height = size_box
    if args.image_type in (CUBE, CUBE_ARRAY):
        dim = Dimension.Cube
    elif args.image_type in (ARRAY,) and args.dimension is Dimension.Dim3D:
        dim = Dimension.Dim3D
    elif args.dimension is Dimension.Dim1D:
        dim = Dimension.Dim1D
    else:
        dim = args.dimension

    if args.image_type in (ARRAY, CUBE_ARRAY):
        depth = 1 + max(e[0][0] for e in loaded)
    else:
        depth = 0 if args.image_type == IMAGE else 0
    if args.image_type == ARRAY and args.dimension is Dimension.Dim3D:
        is_array = False
    else:
        is_array = args.image_type in (ARRAY, CUBE_ARRAY)

    tex = Texture(
        dim,
        width,
        height,
        depth=depth if args.image_type != IMAGE else 0,
        mip_levels=1,
        color_space=args.texture_color_space,
    )
    if not tex.is_valid:
        _err("couldn't create texture")
        return 3

    for entry, img in loaded:
        if args.image_type in (CUBE, CUBE_ARRAY):
            index, face = entry[0], entry[1]
            ok = tex.set_image(img, face=face, depth=index if is_array else 0)
        else:
            ok = tex.set_image(img, depth=entry[0])
        if not ok:
            _err(f"couldn't set image '{entry[-1]}'")
            return 3

    if args.mip_levels != 0 and args.device_mips and not args.custom_mips:
        # Fused TPU pipeline: mip chain + encode in one device dispatch
        # (falls through to the host path when the format/shape doesn't
        # qualify — convert_with_mips returns False without side effects).
        levels = 0xFFFFFFFF if args.mip_levels < 0 else args.mip_levels
        if verbose:
            print("generating mipmaps on device (fused)")
        try:
            if tex.convert_with_mips(
                args.fmt,
                args.type,
                quality=args.quality,
                alpha_type=args.alpha,
                mip_levels=levels,
                filter=args.mip_filter,
            ):
                if verbose:
                    print(f"saving '{args.output}'")
                result = tex.save(args.output, args.file_type, args.supercompression)
                if result is SaveResult.WriteError and args.create_dir:
                    parent = os.path.dirname(args.output)
                    if parent:
                        os.makedirs(parent, exist_ok=True)
                        result = tex.save(args.output, args.file_type, args.supercompression)
                if result is not SaveResult.Success:
                    _err(f"couldn't save '{args.output}': {result.name}")
                    return 3
                if args.log == "normal":
                    print(f"converted '{args.output}'")
                return 0
        except (NotImplementedError, ValueError) as exc:
            _err(str(exc))
            return 3
        if verbose:
            print("fused path unavailable; falling back to host mipmaps")

    if args.mip_levels != 0:
        levels = 0xFFFFFFFF if args.mip_levels < 0 else args.mip_levels
        custom = {}
        for idx, cm in args.custom_mips.items():
            cimg = load_and_process_image(
                args, cm.image, size_box, mip_level=idx.mip_level
            )
            if cimg is None:
                return 2
            custom[idx] = CustomMipImage(cimg, cm.replacement)
        if verbose:
            print("generating mipmaps")
        if not tex.generate_mipmaps(
            filter=args.mip_filter,
            mip_levels=levels,
            custom_mip_images=custom or None,
        ):
            _err("couldn't generate mipmaps")
            return 3

    if verbose:
        print(f"converting to {args.fmt.name} ({args.type.name})")
    try:
        ok = tex.convert(
            args.fmt,
            args.type,
            quality=args.quality,
            alpha_type=args.alpha,
        )
    except (NotImplementedError, ValueError) as exc:
        _err(str(exc))
        return 3
    if not ok:
        _err("couldn't convert texture")
        return 3

    if verbose:
        print(f"saving '{args.output}'")
    result = tex.save(args.output, args.file_type, args.supercompression)
    if result is SaveResult.WriteError and args.create_dir:
        parent = os.path.dirname(args.output)
        if parent:
            os.makedirs(parent, exist_ok=True)
            result = tex.save(args.output, args.file_type, args.supercompression)
    if result is not SaveResult.Success:
        _err(f"couldn't save '{args.output}': {result.name}")
        return 3

    if args.log == "normal":
        print(f"converted '{args.output}'")
    elif verbose:
        print(f"done: '{args.output}'")
    return 0


def main() -> None:
    sys.exit(run(sys.argv[1:]))


if __name__ == "__main__":
    main()
