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


def load_prompt_or_image(prompt_source: str, prompt_idx: int, prompt, image_path):
    """Reference-compatible source resolution (/root/reference/dataloader.py):

    - "prompt": pass-through (prompt_idx must be 0)
    - "I2V_VBench": prompt = json of {idx: {original, improved}}, image dir
      holds "<original>.jpg"
    - "I2V_Wan_Web": per-example dirs NNN/{prompt.txt, image.jpg}
    - "T2V_*_VBench"/"T2V_*_Web"/"T2V_Xingyang_*": prompt = .txt, one per line
    """
    import json

    if prompt_source == "prompt":
        assert prompt_idx == 0, "You have already provided a prompt"
        return prompt, image_path
    if prompt_source == "I2V_VBench":
        assert prompt.endswith(".json"), "Prompt must be a json file"
        with open(prompt) as f:
            prompts = json.load(f)
        entry = prompts[str(prompt_idx)]
        image = os.path.join(image_path, f"{entry['original']}.jpg")
        assert os.path.exists(image), "Image path does not exist"
        return entry["improved"], image
    if prompt_source == "I2V_Wan_Web":
        assert prompt == image_path, "Prompt and image path must be the same"
        sub = str(prompt_idx).zfill(3)
        with open(os.path.join(prompt, sub, "prompt.txt")) as f:
            text = f.read()
        return text, os.path.join(image_path, sub, "image.jpg")
    if prompt_source in ("T2V_Wan_VBench", "T2V_Hyv_VBench", "T2V_Hyv_Web",
                         "T2V_Xingyang_Motion", "T2V_Xingyang_VBench"):
        assert prompt.endswith(".txt"), "Prompt must be a txt file"
        with open(prompt) as f:
            lines = f.readlines()
        return lines[prompt_idx], None
    raise ValueError(f"Invalid prompt source: {prompt_source}")
