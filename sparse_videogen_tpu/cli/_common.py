"""Shared CLI helpers for reference entry-script parity.

The reference scripts take ``--model_id`` (an HF hub repo id downloaded via
``from_pretrained``, e.g. /root/reference/wan_t2v_inference.py:22,71-75).
This environment has no network, so the TPU CLIs load locally converted
checkpoints via ``--model_dir``. ``--model_id`` is still accepted so the
reference shell scripts run unmodified: a *local directory* passed as
``--model_id`` is used as the model dir; a repo id is recorded but the run
falls back to smoke mode unless ``--model_dir`` is also given.
"""

from __future__ import annotations

import os


def add_model_id(p, default: str):
    p.add_argument(
        "--model_id", type=str, default=default,
        help="reference-parity flag: HF repo id (informational; no network "
             "here) or a local converted checkpoint dir (used as --model_dir)")
    return p


def resolve_model_dir(args, logger=None):
    """Fold --model_id into --model_dir (local dir wins; repo id is noted)."""
    if getattr(args, "model_dir", None):
        return args.model_dir
    mid = getattr(args, "model_id", None)
    if mid and os.path.isdir(mid):
        if logger is not None:
            logger.info(f"--model_id is a local dir; using it as --model_dir: {mid}")
        return mid
    if mid and logger is not None and not getattr(args, "smoke", False):
        logger.warning(
            f"--model_id {mid!r} is an HF repo id but this environment has no "
            "network: convert the checkpoint locally (io/checkpoint.py) and "
            "pass --model_dir. Falling back to smoke generation.")
    return None
