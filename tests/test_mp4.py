"""MP4 (MJPEG) muxer round-trip tests (io/mp4.py).

Parity surface: the reference exports .mp4 via diffusers export_to_video
(/root/reference/wan_t2v_inference.py:166). No ffmpeg in this environment,
so the writer is validated by (a) structural invariants of the ISO BMFF
boxes and (b) decode round-trip through the module's own parser + PIL.
"""

import struct

import numpy as np
import pytest

from sparse_videogen_tpu.io.mp4 import read_mp4_mjpeg, write_mp4


def _video(t=5, h=48, w=64, seed=0):
    rng = np.random.default_rng(seed)
    # smooth gradients compress well and survive JPEG q95 almost exactly
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack([yy * 255 // h, xx * 255 // w, (yy + xx) * 255 // (h + w)], -1)
    vid = np.clip(base[None] + rng.integers(-4, 5, (t, h, w, 3)), 0, 255)
    return vid.astype(np.uint8)


def test_mp4_round_trip(tmp_path):
    vid = _video()
    path = str(tmp_path / "out.mp4")
    write_mp4(path, vid, fps=16)
    back, fps = read_mp4_mjpeg(path)
    assert fps == 16
    assert back.shape == vid.shape
    # JPEG q95 4:4:4 on smooth content: small error
    err = np.abs(back.astype(np.int32) - vid.astype(np.int32)).mean()
    assert err < 4.0, err


def test_mp4_structure(tmp_path):
    vid = _video(t=3)
    path = str(tmp_path / "out.mp4")
    write_mp4(path, vid, fps=24)
    data = open(path, "rb").read()
    # top-level boxes tile the file exactly: ftyp, mdat, moov
    tags, off = [], 0
    while off < len(data):
        size, tag = struct.unpack(">I4s", data[off : off + 8])
        assert size >= 8
        tags.append(tag)
        off += size
    assert off == len(data)
    assert tags == [b"ftyp", b"mdat", b"moov"]
    # each sample is a JPEG (SOI marker) at its stco/stsz location
    back, _ = read_mp4_mjpeg(path)
    assert back.shape[0] == 3


def test_export_video_mp4_dispatch(tmp_path):
    from sparse_videogen_tpu.pipelines.wan import export_video

    vid = (_video(t=2).astype(np.float32) / 127.5 - 1.0).transpose(3, 0, 1, 2)[None]
    p_mp4 = str(tmp_path / "v.mp4")
    p_y4m = str(tmp_path / "v.y4m")
    export_video(vid, p_mp4, fps=16)
    export_video(vid, p_y4m, fps=16)
    assert open(p_mp4, "rb").read(8)[4:] == b"ftyp"
    assert open(p_y4m, "rb").read(9) == b"YUV4MPEG2"
