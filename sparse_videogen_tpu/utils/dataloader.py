"""Prompt/image source resolution for batch generation.

Port of /root/reference/dataloader.py: resolves a prompt source into a list
of (prompt, image_path | None): a literal prompt, a .txt file of prompts
(one per line), or a directory of per-example subdirs N/{prompt.txt,
image.jpg} (the reference's examples/ layout).
"""

from __future__ import annotations

import os


def load_prompts(source: str):
    if os.path.isdir(source):
        out = []
        for name in sorted(os.listdir(source), key=lambda s: (len(s), s)):
            sub = os.path.join(source, name)
            pf = os.path.join(sub, "prompt.txt")
            if os.path.isdir(sub) and os.path.exists(pf):
                prompt = open(pf).read().strip()
                img = None
                for ext in ("jpg", "jpeg", "png"):
                    cand = os.path.join(sub, f"image.{ext}")
                    if os.path.exists(cand):
                        img = cand
                        break
                out.append((prompt, img))
        return out
    if source.endswith(".txt") and os.path.exists(source):
        return [(line.strip(), None) for line in open(source) if line.strip()]
    return [(source, None)]
