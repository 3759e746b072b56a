"""EXR I/O via the native exr_lite C++ library (ctypes binding).

Self-contained scanline OpenEXR support (NONE/RLE/ZIPS/ZIP/PIZ read,
NONE/ZIP write) with no network downloads — the reference relies on
imageio downloading the freeimage plugin at import time
(reference: test/utils.py:4-6). The shared library is built on first use
with g++ if not already present.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
import threading

import numpy as np

_NATIVE_DIR = pathlib.Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libexr_lite.so"
_lock = threading.Lock()
_lib = None


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not _LIB_PATH.exists():
            subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.exr_info.argtypes = [ctypes.c_char_p,
                                 ctypes.POINTER(ctypes.c_int),
                                 ctypes.POINTER(ctypes.c_int),
                                 ctypes.POINTER(ctypes.c_int)]
        lib.exr_info.restype = ctypes.c_int
        lib.exr_info_names.argtypes = [ctypes.c_char_p,
                                       ctypes.POINTER(ctypes.c_int),
                                       ctypes.POINTER(ctypes.c_int),
                                       ctypes.POINTER(ctypes.c_int),
                                       ctypes.c_char_p, ctypes.c_int]
        lib.exr_info_names.restype = ctypes.c_int
        lib.exr_read.argtypes = [ctypes.c_char_p,
                                 ctypes.POINTER(ctypes.c_float)]
        lib.exr_read.restype = ctypes.c_int
        lib.exr_write.argtypes = [ctypes.c_char_p,
                                  ctypes.POINTER(ctypes.c_float),
                                  ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                  ctypes.c_char_p, ctypes.c_int,
                                  ctypes.c_int]
        lib.exr_write.restype = ctypes.c_int
        lib.exr_last_error.restype = ctypes.c_char_p
        _lib = lib
        return lib


def _err(lib) -> str:
    return lib.exr_last_error().decode("utf-8", "replace")


def read_exr(path: str, channel_order=None) -> np.ndarray:
    """Read an EXR -> float32 [H, W] (single channel) or [H, W, C].

    Channels come back in file (alphabetical) order unless `channel_order`
    names a permutation (e.g. ["R", "G", "B"]).
    """
    lib = _load()
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    names_buf = ctypes.create_string_buffer(4096)
    if lib.exr_info_names(str(path).encode(), ctypes.byref(w),
                          ctypes.byref(h), ctypes.byref(c), names_buf,
                          len(names_buf)) != 0:
        raise IOError(f"exr_info({path}): {_err(lib)}")
    out = np.empty((h.value, w.value, c.value), np.float32)
    if lib.exr_read(str(path).encode(),
                    out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))) != 0:
        raise IOError(f"exr_read({path}): {_err(lib)}")
    if channel_order is not None:
        names = names_buf.value.decode().split(";")
        perm = [names.index(n) for n in channel_order]
        out = out[..., perm]
    return out[..., 0] if out.shape[-1] == 1 else out


def write_exr(path: str, data: np.ndarray, channel_names=None,
              half: bool = True, compression: str = "zip") -> None:
    """Write float32 [H, W] or [H, W, C] data as a scanline EXR."""
    data = np.ascontiguousarray(np.asarray(data, np.float32))
    if data.ndim == 2:
        data = data[..., None]
    h, w, c = data.shape
    if channel_names is None:
        channel_names = (["Y"] if c == 1 else
                         ["R", "G", "B", "A"][:c] if c <= 4 else
                         [f"C{i}" for i in range(c)])
    names = ";".join(channel_names).encode()
    comp = {"none": 0, "zip": 3}[compression]
    lib = _load()
    if lib.exr_write(str(path).encode(),
                     data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                     w, h, c, names, 1 if half else 2, comp) != 0:
        raise IOError(f"exr_write({path}): {_err(lib)}")
