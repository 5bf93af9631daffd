"""Regenerate the format matrix in docs/formats.md from formats.py."""

from __future__ import annotations

import os
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

from cuttlefish_tpu import formats as F  # noqa: E402
from cuttlefish_tpu.formats import FileType, TextureFormat, TextureType  # noqa: E402

MARK = "| Format | Block | Bytes/block | Types | native sRGB | Containers |"


def matrix() -> str:
    lines = [MARK, "|---|---|---|---|---|---|"]
    for fmt in TextureFormat:
        if fmt is TextureFormat.Unknown:
            continue
        types = [t for t in TextureType if F.is_format_valid(fmt, t)]
        if not types:
            continue
        conts = "/".join(
            ft.name
            for ft in (FileType.DDS, FileType.KTX, FileType.KTX2, FileType.PVR)
            if F.is_format_valid(fmt, types[0], ft)
        )
        tn = " ".join(t.name for t in types)
        srgb = "yes" if any(F.has_native_srgb(fmt, t) for t in types) else ""
        lines.append(
            f"| `{fmt.name}` | {F.block_width(fmt)}x{F.block_height(fmt)} "
            f"| {F.block_size(fmt)} | {tn} | {srgb} | {conts} |"
        )
    return "\n".join(lines) + "\n"


def main(check: bool = False) -> int:
    path = ROOT / "docs" / "formats.md"
    text = path.read_text()
    head = text.split(MARK)[0]
    new = head + matrix()
    if check:
        if new != text:
            print("STALE docs/formats.md (re-run python docs/gen_formats.py)")
            return 1
        print("formats.md up to date")
        return 0
    path.write_text(new)
    print("wrote docs/formats.md")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(check="--check" in sys.argv))
