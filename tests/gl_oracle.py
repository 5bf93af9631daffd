"""Independent compressed-texture decode oracle via Mesa llvmpipe.

Mesa's software GL implements the Khronos-specified decoders for S3TC,
RGTC, BPTC (BC6H/BC7), ETC2/EAC, and ASTC LDR.  Uploading our encoded
blocks with glCompressedTexImage2D and reading texels back with
glGetTexImage exercises a decoder we did not write — the external parity
check SURVEY.md §4 tier (a) requires (the reference validates against real
GPU drivers the same way).

Usage:
    from tests.gl_oracle import gl_decode, gl_available
    rgba = gl_decode(block_bytes, w, h, "COMPRESSED_RGBA_BPTC_UNORM")

Decoding happens in a single cached EGL surfaceless context (llvmpipe);
everything is headless and CPU-only.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

from cuttlefish_tpu.containers.ktx import GL as GL_ENUMS

_state: dict = {}


def _init_context():
    os.environ.setdefault("EGL_PLATFORM", "surfaceless")
    os.environ.setdefault("LIBGL_ALWAYS_SOFTWARE", "1")
    from OpenGL import EGL
    from OpenGL.EGL import (
        EGL_DEFAULT_DISPLAY,
        EGL_NO_CONTEXT,
        EGL_NO_SURFACE,
        EGL_NONE,
        EGL_OPENGL_API,
        EGL_OPENGL_BIT,
        EGL_PBUFFER_BIT,
        EGL_RENDERABLE_TYPE,
        EGL_SURFACE_TYPE,
        eglBindAPI,
        eglChooseConfig,
        eglCreateContext,
        eglGetDisplay,
        eglInitialize,
        eglMakeCurrent,
    )

    dpy = eglGetDisplay(EGL_DEFAULT_DISPLAY)
    major, minor = ctypes.c_long(), ctypes.c_long()
    if not eglInitialize(dpy, major, minor):
        raise RuntimeError("eglInitialize failed")
    attribs = [
        EGL_SURFACE_TYPE, EGL_PBUFFER_BIT,
        EGL_RENDERABLE_TYPE, EGL_OPENGL_BIT,
        EGL_NONE,
    ]
    configs = (EGL.EGLConfig * 4)()
    num = ctypes.c_long()
    eglChooseConfig(dpy, attribs, configs, 4, num)
    if num.value < 1:
        raise RuntimeError("no EGL config")
    eglBindAPI(EGL_OPENGL_API)
    ctx = eglCreateContext(dpy, configs[0], EGL_NO_CONTEXT, None)
    eglMakeCurrent(dpy, EGL_NO_SURFACE, EGL_NO_SURFACE, ctx)

    from OpenGL import GL

    n = GL.glGetIntegerv(GL.GL_NUM_EXTENSIONS)
    exts = {GL.glGetStringi(GL.GL_EXTENSIONS, i).decode() for i in range(n)}
    _state["GL"] = GL
    _state["exts"] = exts


def gl_available() -> bool:
    if "GL" not in _state and "failed" not in _state:
        try:
            _init_context()
        except Exception:  # noqa: BLE001 - any GL setup failure means skip
            _state["failed"] = True
    return "GL" in _state


def gl_has_extension(name: str) -> bool:
    return gl_available() and name in _state["exts"]


def gl_decode(
    data: bytes | np.ndarray,
    width: int,
    height: int,
    internal_format: str | int,
    float_out: bool = False,
) -> np.ndarray:
    """Decode compressed `data` via the GL; returns [height, width, 4].

    float_out=False -> uint8 RGBA readback; True -> float32 RGBA (use for
    BC6H, EAC R11/RG11, and signed RGTC where 8 bits would truncate).
    """
    if not gl_available():
        raise RuntimeError("GL oracle unavailable")
    GL = _state["GL"]
    fmt = GL_ENUMS[internal_format] if isinstance(internal_format, str) else internal_format
    raw = np.frombuffer(data, np.uint8) if isinstance(data, bytes) else (
        np.ascontiguousarray(data).view(np.uint8).reshape(-1)
    )

    while GL.glGetError():
        pass
    tex = GL.glGenTextures(1)
    GL.glBindTexture(GL.GL_TEXTURE_2D, tex)
    # PyOpenGL's wrapper derives imageSize from the array argument.
    GL.glCompressedTexImage2D(GL.GL_TEXTURE_2D, 0, fmt, width, height, 0, raw)
    err = GL.glGetError()
    if err:
        GL.glDeleteTextures([tex])
        raise RuntimeError(f"glCompressedTexImage2D error 0x{err:x} for {internal_format}")
    if float_out:
        out = np.zeros((height, width, 4), np.float32)
        GL.glGetTexImage(GL.GL_TEXTURE_2D, 0, GL.GL_RGBA, GL.GL_FLOAT, out)
    else:
        out = np.zeros((height, width, 4), np.uint8)
        GL.glGetTexImage(GL.GL_TEXTURE_2D, 0, GL.GL_RGBA, GL.GL_UNSIGNED_BYTE, out)
    err = GL.glGetError()
    GL.glDeleteTextures([tex])
    if err:
        raise RuntimeError(f"glGetTexImage error 0x{err:x} for {internal_format}")
    return out
