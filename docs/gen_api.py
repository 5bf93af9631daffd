"""API reference generator — the framework's analog of the reference's
Doxygen build (`/root/reference/doc/Doxyfile.in`, `doc/CMakeLists.txt`).

Walks the public surface of `cuttlefish_tpu` with `inspect` and emits one
Markdown page per module into `docs/api/`, plus an index.  No third-party
doc tooling is installed in this environment (no sphinx/pdoc), so this is
a self-contained generator:

    JAX_PLATFORMS=cpu python docs/gen_api.py

The CI workflow runs it and fails if the output is stale (the committed
pages must match the code), which is the "docs build" gate the reference
gets from its Doxygen CMake target.
"""

from __future__ import annotations

import enum
import importlib
import inspect
import os
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

MODULES = [
    "cuttlefish_tpu",
    "cuttlefish_tpu.formats",
    "cuttlefish_tpu.color",
    "cuttlefish_tpu.packfloat",
    "cuttlefish_tpu.image",
    "cuttlefish_tpu.texture",
    "cuttlefish_tpu.metrics",
    "cuttlefish_tpu.profiling",
    "cuttlefish_tpu.convert",
    "cuttlefish_tpu.parallel",
    "cuttlefish_tpu.containers.dds",
    "cuttlefish_tpu.containers.ktx",
    "cuttlefish_tpu.containers.ktx2",
    "cuttlefish_tpu.containers.pvr",
    "cuttlefish_tpu.containers.load",
    "cuttlefish_tpu.decode.surface",
    "cuttlefish_tpu.kernels.bc",
    "cuttlefish_tpu.kernels.bc6h",
    "cuttlefish_tpu.kernels.bc7",
    "cuttlefish_tpu.kernels.etc",
    "cuttlefish_tpu.kernels.astc",
    "cuttlefish_tpu.kernels.pvrtc",
    "cuttlefish_tpu.decode",
    "cuttlefish_tpu.native",
    "cuttlefish_tpu.cli",
]


def _sig(obj) -> str:
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"


def _doc(obj) -> str:
    d = inspect.getdoc(obj)
    return d.strip() if d else ""


def _first_line(text: str) -> str:
    return text.split("\n", 1)[0] if text else ""


def _is_public(name: str) -> bool:
    return not name.startswith("_")


def _own_members(mod):
    """Public members defined in (or exported by) this module."""
    names = getattr(mod, "__all__", None)
    if names is None:
        names = [n for n in vars(mod) if _is_public(n)]
    out = []
    for n in sorted(names):
        obj = getattr(mod, n, None)
        if inspect.ismodule(obj):
            continue
        # Skip re-exports in non-package modules (keep them for packages,
        # where the __init__ surface IS the API).
        if (
            not hasattr(mod, "__path__")
            and getattr(obj, "__module__", mod.__name__) != mod.__name__
        ):
            continue
        out.append((n, obj))
    return out


def _render_class(name: str, cls: type, lines: list[str]) -> None:
    lines.append(f"### class `{name}`\n")
    doc = _doc(cls)
    if doc:
        lines.append(doc + "\n")
    if isinstance(cls, type) and issubclass(cls, enum.Enum):
        lines.append("| Member | Value |")
        lines.append("|---|---|")
        for m in cls:
            lines.append(f"| `{m.name}` | `{m.value}` |")
        lines.append("")
        return
    for mname, meth in inspect.getmembers(cls):
        if not _is_public(mname):
            continue
        if inspect.isfunction(meth) or inspect.ismethod(meth):
            if meth.__qualname__.split(".")[0] != cls.__name__:
                continue  # inherited
            lines.append(f"- **`{mname}{_sig(meth)}`** — {_first_line(_doc(meth))}")
        elif isinstance(meth, property):
            fdoc = _first_line(_doc(meth.fget)) if meth.fget else ""
            lines.append(f"- *property* **`{mname}`** — {fdoc}")
    lines.append("")


def render_module(modname: str) -> str:
    mod = importlib.import_module(modname)
    lines = [f"# `{modname}`\n"]
    mdoc = _doc(mod)
    if mdoc:
        lines.append(mdoc + "\n")

    members = _own_members(mod)
    classes = [(n, o) for n, o in members if inspect.isclass(o)]
    funcs = [(n, o) for n, o in members if inspect.isfunction(o)]
    consts = [
        (n, o)
        for n, o in members
        if not inspect.isclass(o)
        and not inspect.isfunction(o)
        and not inspect.isbuiltin(o)
        and isinstance(o, (int, float, str, bytes, tuple, frozenset))
    ]

    if classes:
        lines.append("## Classes\n")
        for n, c in classes:
            _render_class(n, c, lines)
    if funcs:
        lines.append("## Functions\n")
        for n, f in funcs:
            lines.append(f"### `{n}{_sig(f)}`\n")
            doc = _doc(f)
            if doc:
                lines.append(doc + "\n")
    if consts:
        lines.append("## Constants\n")
        for n, v in consts:
            rep = repr(v)
            if len(rep) > 80:
                rep = rep[:77] + "..."
            lines.append(f"- `{n} = {rep}`")
        lines.append("")
    return "\n".join(lines) + "\n"


def main(check: bool = False) -> int:
    outdir = ROOT / "docs" / "api"
    outdir.mkdir(parents=True, exist_ok=True)
    index = ["# API reference\n"]
    stale = []
    for modname in MODULES:
        text = render_module(modname)
        fname = modname.replace(".", "_") + ".md"
        path = outdir / fname
        mod = importlib.import_module(modname)
        index.append(f"- [`{modname}`]({fname}) — {_first_line(_doc(mod))}")
        if check:
            if not path.exists() or path.read_text() != text:
                stale.append(str(path))
        else:
            path.write_text(text)
    index_text = "\n".join(index) + "\n"
    index_path = outdir / "index.md"
    if check:
        if not index_path.exists() or index_path.read_text() != index_text:
            stale.append(str(index_path))
        if stale:
            print("STALE docs (re-run python docs/gen_api.py):")
            for s in stale:
                print("  " + s)
            return 1
        print(f"docs up to date ({len(MODULES)} modules)")
        return 0
    index_path.write_text(index_text)
    print(f"wrote {len(MODULES) + 1} pages to {outdir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(check="--check" in sys.argv))
