"""ctypes binding for the C++ decode core (``native/decoder.cpp``).

Builds the shared library on first use if the toolchain is available; all
callers degrade gracefully to the PIL/cv2/numpy backends when it is not.
"""

from __future__ import annotations

import ctypes
import functools
import subprocess
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB = _NATIVE_DIR / "libcvaddecode.so"


@functools.cache
def load_library() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the decoder library; None if unavailable."""
    if not _LIB.exists():
        try:
            subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_LIB))
    except OSError:
        return None
    lib.cvad_decode_frame.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.cvad_decode_frame.restype = ctypes.c_int
    lib.cvad_probe.argtypes = [ctypes.c_char_p] + [ctypes.POINTER(ctypes.c_int)] * 3
    lib.cvad_probe.restype = ctypes.c_int
    lib.cvad_decode_clip.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.cvad_decode_clip.restype = ctypes.c_int
    lib.cvad_codecs.argtypes = []
    lib.cvad_codecs.restype = ctypes.c_int
    return lib


def supported_suffixes() -> tuple:
    """File extensions the loaded native core can decode.  PNM/BMP/TIFF are
    built in (the TIFF reader is hand-rolled: none/LZW/PackBits strips, both
    endians); JPEG/PNG depend on the system codec headers at build time
    (`cvad_codecs` bitmask: 1=JPEG, 2=PNG)."""
    lib = load_library()
    if lib is None:
        return ()
    suffixes = [".pgm", ".ppm", ".bmp", ".tif", ".tiff"]
    mask = lib.cvad_codecs()
    if mask & 1:
        suffixes += [".jpg", ".jpeg"]
    if mask & 2:
        suffixes += [".png"]
    return tuple(suffixes)


def decode_file(lib: ctypes.CDLL, path: str,
                size: Optional[tuple] = None, channels: Optional[int] = None
                ) -> Optional[np.ndarray]:
    """Decode one frame at native or requested size -> float32 HWC in [0,1]
    scaled back to [0,255] when used as a raw reader (decode.py normalizes)."""
    if size is not None and channels is not None:
        # fully specified output: skip the probe (a second file read);
        # cvad_decode_frame fails cleanly on undecodable input anyway
        oh, ow = size
        oc = channels
    else:
        h = ctypes.c_int()
        w = ctypes.c_int()
        c = ctypes.c_int()
        if lib.cvad_probe(path.encode(), ctypes.byref(h), ctypes.byref(w),
                          ctypes.byref(c)) != 0:
            return None
        oh, ow = size if size else (h.value, w.value)
        oc = channels if channels else c.value
    out = np.empty((oh, ow, oc), np.float32)
    rc = lib.cvad_decode_frame(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        oh, ow, oc)
    if rc != 0:
        return None
    return out * 255.0  # decode.py's shared normalize path divides by 255


def decode_clip(paths: Sequence[str], size: tuple, channels: int,
                nthreads: int = 4) -> Optional[np.ndarray]:
    """Decode a whole clip in one C call -> (T, H, W, C) float32 in [0,1].
    Returns None if the native library is unavailable."""
    lib = load_library()
    if lib is None:
        return None
    t = len(paths)
    oh, ow = size
    out = np.empty((t, oh, ow, channels), np.float32)
    arr = (ctypes.c_char_p * t)(*[p.encode() for p in paths])
    lib.cvad_decode_clip(arr, t,
                         out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                         oh, ow, channels, nthreads)
    return out
