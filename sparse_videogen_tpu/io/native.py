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


def read_y4m(path: str) -> tuple[np.ndarray, int]:
    """.y4m -> ((T, H, W, 3) uint8 RGB, fps). Inverse of write_y4m's
    C420jpeg layout (nearest-upsampled chroma, BT.601 full range)."""
    with open(path, "rb") as f:
        header = f.readline().decode()
        assert header.startswith("YUV4MPEG2"), header
        W = H = fps = 0
        for tok in header.split()[1:]:
            if tok[0] == "W":
                W = int(tok[1:])
            elif tok[0] == "H":
                H = int(tok[1:])
            elif tok[0] == "F":
                fps = int(tok[1:].split(":")[0])
        frames = []
        ysz, csz = H * W, (H // 2) * (W // 2)
        while True:
            line = f.readline()
            if not line:
                break
            assert line.startswith(b"FRAME"), line
            y = np.frombuffer(f.read(ysz), np.uint8).reshape(H, W).astype(np.float32)
            u = np.frombuffer(f.read(csz), np.uint8).reshape(H // 2, W // 2).astype(np.float32)
            v = np.frombuffer(f.read(csz), np.uint8).reshape(H // 2, W // 2).astype(np.float32)
            u = np.repeat(np.repeat(u, 2, 0), 2, 1) - 128.0
            v = np.repeat(np.repeat(v, 2, 0), 2, 1) - 128.0
            r = y + 1.402 * v
            g = y - 0.344136 * u - 0.714136 * v
            b = y + 1.772 * u
            frames.append(np.clip(np.stack([r, g, b], -1), 0, 255).astype(np.uint8))
    return np.stack(frames), fps


def load_video(path: str) -> np.ndarray:
    """.y4m or .npz/.npy -> (T, H, W, 3) float32 in [0, 1]."""
    if path.endswith(".y4m"):
        return read_y4m(path)[0].astype(np.float32) / 255.0
    arr = np.load(path)
    if hasattr(arr, "files"):
        arr = arr[arr.files[0]]
    arr = np.asarray(arr, np.float32)
    if arr.ndim == 5:
        arr = arr[0]
    if arr.shape[0] == 3 and arr.shape[-1] != 3:  # (3, T, H, W) -> (T, H, W, 3)
        arr = np.transpose(arr, (1, 2, 3, 0))
    if arr.min() < -0.01:  # [-1, 1] -> [0, 1]
        arr = (arr + 1.0) / 2.0
    return np.clip(arr, 0.0, 1.0)


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "build":
    print("built:", build())
