"""ctypes bindings for the native clip assembler (native/tecoloader.cpp).

The library is optional: ``load_library()`` returns None when the .so has
not been built (``make -C native``), and callers fall back to the numpy
path. ctypes releases the GIL during calls, so loader worker threads scale.
"""

from __future__ import annotations

import ctypes
import os.path as osp

import numpy as np

__all__ = ["load_library", "NativeBlob"]

_LIB = None
_TRIED = False


def _lib_path():
    root = osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))
    return osp.join(root, "native", "libtecoloader.so")


def load_library():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _lib_path()
    if not osp.exists(path):
        # build on demand if the toolchain is available
        import shutil
        import subprocess

        if shutil.which("make") and shutil.which("g++"):
            try:
                subprocess.run(
                    ["make", "-C", osp.dirname(path), "-s"],
                    check=True, capture_output=True, timeout=120)
            except Exception:
                return None
    if not osp.exists(path):
        return None
    lib = ctypes.CDLL(path)
    # a stale .so from an older tree may predate entry points: treat any
    # missing symbol as "library unavailable" so callers take the numpy
    # fallback instead of AttributeError-ing deep inside a loader worker
    for sym in ("teco_mmap_open", "teco_mmap_close",
                "teco_assemble_clip_f32", "teco_assemble_clip_u8"):
        if not hasattr(lib, sym):
            return None
    lib.teco_mmap_open.restype = ctypes.c_void_p
    lib.teco_mmap_open.argtypes = [ctypes.c_char_p,
                                   ctypes.POINTER(ctypes.c_int64)]
    lib.teco_mmap_close.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    clip_sig = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32, ctypes.c_int32, ctypes.c_void_p,
    ]
    lib.teco_assemble_clip_f32.argtypes = clip_sig
    lib.teco_assemble_clip_u8.argtypes = clip_sig
    _LIB = lib
    return _LIB


class NativeBlob:
    """mmap handle to a records data.bin served by the native library."""

    def __init__(self, path: str):
        self.lib = load_library()
        if self.lib is None:
            raise RuntimeError(
                "native loader not built (run `make -C native`)")
        size = ctypes.c_int64()
        self.base = self.lib.teco_mmap_open(path.encode(),
                                            ctypes.byref(size))
        if not self.base:
            raise OSError(f"mmap failed: {path}")
        self.size = size.value

    def assemble_clip(self, frame_offsets, h, w, c, tops, lefts, ch, cw,
                      dtype=np.float32):
        """-> (t, ch, cw, c) clip: float32 in [0, 1] or raw uint8."""
        t = len(frame_offsets)
        offs = np.ascontiguousarray(frame_offsets, np.int64)
        tops = np.ascontiguousarray(tops, np.int32)
        lefts = np.ascontiguousarray(lefts, np.int32)
        out = np.empty((t, ch, cw, c), dtype)
        fn = (self.lib.teco_assemble_clip_f32 if dtype == np.float32
              else self.lib.teco_assemble_clip_u8)
        fn(
            self.base,
            offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            t, h, w, c,
            tops.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            lefts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ch, cw,
            out.ctypes.data_as(ctypes.c_void_p),
        )
        return out

    def close(self):
        if self.base:
            self.lib.teco_mmap_close(self.base, self.size)
            self.base = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
