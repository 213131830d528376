"""ctypes bindings for the native clip assembler (native/tecoloader.cpp).

The library is optional: ``load_library()`` returns None when the .so has
not been built (``make -C native``), and callers fall back to the numpy
path. ctypes releases the GIL during calls, so loader worker threads scale.
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp

import numpy as np

__all__ = ["load_library", "NativeBlob", "set_assembler_threads"]

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
    # (re)build when the toolchain is available: make is incremental, so
    # this is a no-op stat check unless tecoloader.cpp is newer than the
    # .so (a stale library from an older tree would otherwise shadow new
    # entry points until someone remembers to rebuild it)
    import shutil
    import subprocess

    if shutil.which("make") and shutil.which("g++"):
        try:
            subprocess.run(
                ["make", "-C", osp.dirname(path), "-s"],
                check=True, capture_output=True, timeout=120)
        except Exception:
            pass
    if not osp.exists(path):
        return None
    lib = ctypes.CDLL(path)
    # a stale .so from an older tree may predate entry points: treat any
    # missing symbol as "library unavailable" so callers take the numpy
    # fallback instead of AttributeError-ing deep inside a loader worker
    for sym in ("teco_mmap_open", "teco_mmap_close",
                "teco_assemble_clip_f32", "teco_assemble_clip_u8",
                "teco_assemble_clip_aug_f32", "teco_assemble_clip_aug_u8",
                "teco_set_max_threads", "teco_get_max_threads"):
        if not hasattr(lib, sym):
            return None
    lib.teco_set_max_threads.argtypes = [ctypes.c_int32]
    lib.teco_get_max_threads.restype = ctypes.c_int32
    lib.teco_get_max_threads.argtypes = []
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
    aug_sig = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32,  # csz
        ctypes.c_int32, ctypes.c_int32,  # r0, c0
        ctypes.c_int32, ctypes.c_int32,  # drr, drc
        ctypes.c_int32, ctypes.c_int32,  # dcr, dcc
        ctypes.c_void_p,
    ]
    lib.teco_assemble_clip_aug_f32.argtypes = aug_sig
    lib.teco_assemble_clip_aug_u8.argtypes = aug_sig
    env_threads = os.environ.get("TECOGAN_LOADER_THREADS")
    if env_threads:
        try:
            lib.teco_set_max_threads(int(env_threads))
        except ValueError:
            raise ValueError(
                f"TECOGAN_LOADER_THREADS={env_threads!r} is not an int")
    _LIB = lib
    return _LIB


def set_assembler_threads(n: int) -> None:
    """Cap the per-sample assembly thread count (default 4).

    The Python TrainLoader already parallelises over SAMPLES with
    num_worker threads, so the effective host thread demand is
    num_workers * n; 4 suits a single-chip host, while a pod host feeding
    a dp-sharded global batch of 16-32 clips should raise it (SURVEY.md
    §7 hard part 8). Also settable before first use via the
    TECOGAN_LOADER_THREADS environment variable."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native loader not built (run `make -C native`)")
    lib.teco_set_max_threads(int(n))


_AUG_COEFFS = {}


def aug_coeffs(csz: int) -> np.ndarray:
    """(12, 6) int32 affine coefficients (r0, c0, drr, drc, dcr, dcc) of
    the 12 dihedral augmentations over a csz x csz crop: output pixel
    (ro, co) of aug a reads crop pixel
    (r0 + ro*drr + co*dcr, c0 + ro*drc + co*dcc).

    Derived from the SAME index maps the device-resident gather uses
    (data/device_data.py::dihedral_maps — an identity grid pushed through
    the numpy flip/rot90 the host fallback applies), so all three input
    paths share one source of truth."""
    if csz < 2:
        raise ValueError(f"aug_coeffs needs csz >= 2, got {csz}")
    if csz not in _AUG_COEFFS:
        from .device_data import dihedral_maps

        maps = dihedral_maps(csz)  # (12, csz, csz, 2)
        coeffs = np.empty((12, 6), np.int32)
        for a in range(12):
            m = maps[a]
            r0, c0 = m[0, 0]
            coeffs[a] = (r0, c0,
                         m[1, 0, 0] - r0, m[1, 0, 1] - c0,   # drr, drc
                         m[0, 1, 0] - r0, m[0, 1, 1] - c0)   # dcr, dcc
        # the extracted affine form must reproduce the maps exactly
        ro, co = np.meshgrid(np.arange(csz), np.arange(csz), indexing="ij")
        for a in range(12):
            r0, c0, drr, drc, dcr, dcc = (int(v) for v in coeffs[a])
            assert (maps[a][..., 0] == r0 + ro * drr + co * dcr).all()
            assert (maps[a][..., 1] == c0 + ro * drc + co * dcc).all()
        _AUG_COEFFS[csz] = coeffs
    return _AUG_COEFFS[csz]


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

    def assemble_clip_aug(self, frame_offsets, h, w, c, tops, lefts, csz,
                          aug: int, dtype=np.float32, out=None):
        """Fused gather + crop + dihedral aug -> (t, csz, csz, c) clip.

        ``out`` may be a preallocated C-contiguous destination (e.g. a
        batch slot) so the sample is materialised exactly once."""
        t = len(frame_offsets)
        dtype = np.dtype(dtype)
        assert dtype in (np.dtype(np.float32), np.dtype(np.uint8)), dtype
        offs = np.ascontiguousarray(frame_offsets, np.int64)
        tops = np.ascontiguousarray(tops, np.int32)
        lefts = np.ascontiguousarray(lefts, np.int32)
        if out is None:
            out = np.empty((t, csz, csz, c), dtype)
        else:
            assert out.flags.c_contiguous and out.dtype == dtype \
                and out.shape == (t, csz, csz, c), (out.shape, out.dtype)
        r0, c0, drr, drc, dcr, dcc = (int(v) for v in aug_coeffs(csz)[aug])
        fn = (self.lib.teco_assemble_clip_aug_f32 if dtype == np.float32
              else self.lib.teco_assemble_clip_aug_u8)
        fn(
            self.base,
            offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            t, h, w, c,
            tops.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            lefts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            csz, r0, c0, drr, drc, dcr, dcc,
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
