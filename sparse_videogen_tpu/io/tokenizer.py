"""T5/UMT5 tokenizer without the `sentencepiece` package.

The reference tokenizes prompts with HF AutoTokenizer over google/umt5-xxl
(wan_orig/modules/tokenizers.py:36-90, t5.py:497-502). This environment has
the Rust `tokenizers` library but not `sentencepiece`, so we load either:
  - `tokenizer.json` (HF fast format) directly, or
  - `spiece.model` (sentencepiece protobuf), converted in-process to a
    `tokenizers.Unigram` model — the same recipe as transformers'
    SpmConverter/T5Converter, using transformers' vendored protobuf schema.

Cleaning matches the reference's clean="whitespace" mode
(tokenizers.py:13-22): ftfy fix (if available) + html unescape + whitespace
collapse.
"""

from __future__ import annotations

import html
import os
import re

import numpy as np

EOS = "</s>"
PAD_ID = 0
EOS_ID = 1


def whitespace_clean(text: str) -> str:
    try:
        import ftfy

        text = ftfy.fix_text(text)
    except ImportError:
        pass
    text = html.unescape(html.unescape(text))
    text = re.sub(r"\s+", " ", text)
    return text.strip()


def _tokenizer_from_spiece(path: str):
    """spiece.model -> tokenizers.Tokenizer (transformers T5Converter recipe)."""
    from tokenizers import Regex, Tokenizer, decoders, normalizers, pre_tokenizers, processors
    from tokenizers.models import Unigram

    try:
        from transformers.utils import sentencepiece_model_pb2_new as spm_pb2
    except ImportError:
        from transformers.utils import sentencepiece_model_pb2 as spm_pb2

    m = spm_pb2.ModelProto()
    with open(path, "rb") as f:
        m.ParseFromString(f.read())

    vocab = [(p.piece, p.score) for p in m.pieces]
    unk_id = m.trainer_spec.unk_id
    tok = Tokenizer(Unigram(vocab, unk_id, byte_fallback=False))

    norms = []
    if m.normalizer_spec.precompiled_charsmap:
        norms.append(normalizers.Precompiled(m.normalizer_spec.precompiled_charsmap))
    norms.append(normalizers.Replace(Regex(" {2,}"), " "))
    tok.normalizer = normalizers.Sequence(norms)
    tok.pre_tokenizer = pre_tokenizers.Metaspace(replacement="▁", prepend_scheme="always")
    tok.decoder = decoders.Metaspace(replacement="▁", prepend_scheme="always")
    eos_id = next((i for i, p in enumerate(m.pieces) if p.piece == EOS), EOS_ID)
    tok.post_processor = processors.TemplateProcessing(
        single=f"$A {EOS}", pair=f"$A {EOS} $B {EOS}", special_tokens=[(EOS, eos_id)]
    )
    return tok


class T5TokenizerLite:
    """Minimal prompt tokenizer: texts -> (ids, mask) padded to seq_len.

    Matches the reference call
    `tokenizer(texts, return_mask=True, add_special_tokens=True)` with
    padding="max_length", truncation=True (tokenizers.py:47-82).
    """

    def __init__(self, tok, pad_id: int = PAD_ID):
        self.tok = tok
        self.pad_id = pad_id

    @classmethod
    def from_dir(cls, path: str) -> "T5TokenizerLite":
        """Load from a dir holding tokenizer.json or spiece.model (searched
        recursively one level, matching Wan checkpoint layouts like
        google/umt5-xxl/)."""
        from tokenizers import Tokenizer

        candidates = [path] + [
            os.path.join(path, d) for d in sorted(os.listdir(path))
            if os.path.isdir(os.path.join(path, d))
        ]
        for d in candidates:
            tj = os.path.join(d, "tokenizer.json")
            if os.path.isfile(tj):
                return cls(Tokenizer.from_file(tj))
        for d in candidates:
            sp = os.path.join(d, "spiece.model")
            if os.path.isfile(sp):
                return cls(_tokenizer_from_spiece(sp))
        raise FileNotFoundError(f"no tokenizer.json or spiece.model under {path}")

    def __call__(self, texts, seq_len: int = 512, clean: str | None = "whitespace"):
        if isinstance(texts, str):
            texts = [texts]
        if clean == "whitespace":
            texts = [whitespace_clean(t) for t in texts]
        self.tok.enable_truncation(max_length=seq_len)
        self.tok.enable_padding(length=seq_len, pad_id=self.pad_id, pad_token="<pad>")
        enc = self.tok.encode_batch(list(texts))
        ids = np.asarray([e.ids for e in enc], np.int32)
        mask = np.asarray([e.attention_mask for e in enc], np.int32)
        return ids, mask


class HFTokenizerLite:
    """Generic tokenizer.json loader (LLaMA-3, CLIP, ...): texts ->
    (ids, mask) padded/truncated to seq_len.

    pad id resolution: tokenizer_config.json pad_token, else eos_token,
    else 0 (matches HF AutoTokenizer behavior for the hyvideo checkpoints).
    """

    def __init__(self, tok, pad_id: int):
        self.tok = tok
        self.pad_id = pad_id

    @classmethod
    def from_dir(cls, path: str) -> "HFTokenizerLite":
        import json

        from tokenizers import Tokenizer

        tj = os.path.join(path, "tokenizer.json")
        if not os.path.isfile(tj):
            raise FileNotFoundError(f"no tokenizer.json under {path}")
        tok = Tokenizer.from_file(tj)
        pad_id = None
        cfg = os.path.join(path, "tokenizer_config.json")
        if os.path.isfile(cfg):
            with open(cfg) as f:
                c = json.load(f)
            for key in ("pad_token", "eos_token"):
                t = c.get(key)
                if isinstance(t, dict):
                    t = t.get("content")
                if t is not None and tok.token_to_id(t) is not None:
                    pad_id = tok.token_to_id(t)
                    break
        self = cls(tok, 0 if pad_id is None else pad_id)
        return self

    def encode(self, text: str):
        """Unpadded ids (the causal-LM path, utils/prompt_extend.py)."""
        self.tok.no_truncation()
        self.tok.no_padding()
        return list(self.tok.encode(text).ids)

    def decode(self, ids) -> str:
        return self.tok.decode(list(map(int, ids)))

    def __call__(self, texts, seq_len: int):
        if isinstance(texts, str):
            texts = [texts]
        self.tok.enable_truncation(max_length=seq_len)
        pad_token = self.tok.id_to_token(self.pad_id) or "<pad>"
        self.tok.enable_padding(length=seq_len, pad_id=self.pad_id, pad_token=pad_token)
        enc = self.tok.encode_batch(list(texts))
        ids = np.asarray([e.ids for e in enc], np.int32)
        mask = np.asarray([e.attention_mask for e in enc], np.int32)
        return ids, mask
