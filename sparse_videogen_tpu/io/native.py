"""ctypes bindings for the native IO runtime (native/svt_io.cpp).

Follows the reference's graceful-degradation pattern (svg/models/wan/
attention.py:40-70): if the shared library isn't built, pure-Python
fallbacks are used and ENABLE_NATIVE_IO is False.

Build: make -C native  (or: python -m sparse_videogen_tpu.io.native build)
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
_LIB_PATH = os.path.join(_ROOT, "native", "libsvt_io.so")


def _load():
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.svt_pread_parallel.argtypes = [
            ctypes.c_char_p, ctypes.c_uint64, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ]
        lib.svt_pread_parallel.restype = ctypes.c_int
        lib.svt_write_y4m.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.svt_write_y4m.restype = ctypes.c_int
        return lib
    except OSError:
        return None


_LIB = _load()
ENABLE_NATIVE_IO = _LIB is not None


def build():
    subprocess.check_call(["make", "-C", os.path.join(_ROOT, "native")])
    global _LIB, ENABLE_NATIVE_IO
    _LIB = _load()
    ENABLE_NATIVE_IO = _LIB is not None
    return ENABLE_NATIVE_IO


def pread_parallel(path: str, offset: int, nbytes: int, *, n_threads: int = 8) -> np.ndarray:
    """Read a byte range into a fresh buffer (threaded when native lib is up)."""
    out = np.empty(nbytes, np.uint8)
    if _LIB is not None:
        rc = _LIB.svt_pread_parallel(
            path.encode(), offset, nbytes,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n_threads,
        )
        if rc == 0:
            return out
    with open(path, "rb") as f:  # fallback
        f.seek(offset)
        data = f.read(nbytes)
    out[:] = np.frombuffer(data, np.uint8)
    return out


def write_y4m(path: str, video: np.ndarray, fps: int = 16) -> None:
    """video: (T, H, W, 3) uint8 RGB -> .y4m (playable by ffmpeg/mpv)."""
    video = np.ascontiguousarray(video, np.uint8)
    T, H, W, C = video.shape
    assert C == 3 and H % 2 == 0 and W % 2 == 0, video.shape
    if _LIB is not None:
        rc = _LIB.svt_write_y4m(
            path.encode(), video.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            T, H, W, fps, 1,
        )
        if rc == 0:
            return
    # pure-python fallback (same math)
    with open(path, "wb") as f:
        f.write(f"YUV4MPEG2 W{W} H{H} F{fps}:1 Ip A1:1 C420jpeg\n".encode())
        rgb = video.astype(np.float32)
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        blk = rgb.reshape(T, H // 2, 2, W // 2, 2, 3).mean(axis=(2, 4))
        u = -0.168736 * blk[..., 0] - 0.331264 * blk[..., 1] + 0.5 * blk[..., 2] + 128
        v = 0.5 * blk[..., 0] - 0.418688 * blk[..., 1] - 0.081312 * blk[..., 2] + 128
        for t in range(T):
            f.write(b"FRAME\n")
            f.write(np.clip(y[t], 0, 255).astype(np.uint8).tobytes())
            f.write(np.clip(u[t], 0, 255).astype(np.uint8).tobytes())
            f.write(np.clip(v[t], 0, 255).astype(np.uint8).tobytes())


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "build":
    print("built:", build())
