"""Multi-chip generation through the USER surface (VERDICT r2 item 5).

Drives the real CLIs on the 8 virtual CPU devices (conftest) with the
reference's parallel flags (--ulysses_degree / --ring_degree / --dp /
--dit_fsdp — hyvideo_orig/config.py:351-369 analog) and checks a video/latent
file comes out. This is the product path: mesh construction + FSDP
shard_params + runtime wiring all happen inside the CLI, not in a
hand-built test harness.
"""

import numpy as np
import pytest

from sparse_videogen_tpu.cli import wan_t2v


# interpret-mode Pallas at production-ish shapes / full pipeline drives:
# excluded from the fast CI gate (pytest -m 'not slow')
pytestmark = pytest.mark.slow
def _run(tmp_path, name, extra):
    out = str(tmp_path / name)
    wan_t2v.main([
        "--smoke", "--output_file", out,
        "--num_inference_steps", "2",
        *extra,
    ])
    return out


def test_cli_ulysses_fsdp_video(tmp_path):
    """SVG pattern, heads sharded sp=4, CFG pair on dp=2; mp4 out."""
    out = _run(tmp_path, "v.mp4", ["--pattern", "SVG", "--ulysses_degree", "4", "--dp", "2"])
    data = open(out, "rb").read()
    assert data[4:8] == b"ftyp" and len(data) > 1000


def test_cli_ring_dense(tmp_path):
    out = _run(tmp_path, "v.npz", ["--pattern", "dense", "--ring_degree", "4"])
    lat = np.load(out)["latents"]
    assert np.isfinite(lat).all()


def test_cli_ring_sap(tmp_path):
    out = _run(tmp_path, "v.npz", ["--pattern", "SAP", "--ring_degree", "4"])
    lat = np.load(out)["latents"]
    assert np.isfinite(lat).all()


def test_cli_usp_hybrid(tmp_path):
    """ring x ulysses x dp = 2 x 2 x 2 over 8 devices, dense pattern."""
    out = _run(
        tmp_path, "v.npz",
        ["--pattern", "dense", "--ring_degree", "2", "--ulysses_degree", "2", "--dp", "2"],
    )
    lat = np.load(out)["latents"]
    assert np.isfinite(lat).all()


def test_cli_pure_fsdp(tmp_path):
    out = _run(tmp_path, "v.npz", ["--pattern", "SVG", "--dit_fsdp"])
    lat = np.load(out)["latents"]
    assert np.isfinite(lat).all()


def test_cli_svg_ring_rejected(tmp_path):
    with pytest.raises(ValueError, match="ulysses"):
        _run(tmp_path, "v.npz", ["--pattern", "SVG", "--ring_degree", "4"])


def test_cli_cosmos_ulysses(tmp_path):
    """Cosmos CLI through the shared parallel surface (2 smoke heads -> sp=2)."""
    from sparse_videogen_tpu.cli import cosmos_t2v

    out = str(tmp_path / "cm.npz")
    cosmos_t2v.main(["--smoke", "--output_file", out, "--num_inference_steps", "2",
                     "--pattern", "SVG", "--ulysses_degree", "2"])
    lat = np.load(out)["latents"]
    assert np.isfinite(lat).all()


def test_cli_hyvideo_ulysses(tmp_path):
    from sparse_videogen_tpu.cli import hyvideo_t2v

    out = str(tmp_path / "hy.npz")
    hyvideo_t2v.main(["--smoke", "--output_file", out, "--num_inference_steps", "2",
                      "--pattern", "SVG", "--ulysses_degree", "4"])
    lat = np.load(out)["latents"]
    assert np.isfinite(lat).all()
