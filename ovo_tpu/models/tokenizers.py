"""Text tokenizers.

- CLIPBPETokenizer: standalone byte-pair-encoding tokenizer implementing the
  CLIP scheme (lowercase + whitespace cleanup, byte-level unicode mapping,
  merge ranks from ``bpe_simple_vocab_16e6.txt.gz``). Used when the vocab
  file ships with the checkpoints (the reference gets this via open_clip /
  PE transforms, clip_utils.py:81,110).
- HashTokenizer: deterministic vocabulary-hash fallback so every pipeline
  stage runs without downloaded assets (tests, smoke runs). NOT semantically
  meaningful -- only structural.
"""
from __future__ import annotations

import functools
import gzip
import html
import os
import re
from typing import List

import numpy as np


@functools.lru_cache()
def bytes_to_unicode():
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("\xa1"), ord("\xac") + 1))
          + list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _clean(text: str) -> str:
    text = html.unescape(html.unescape(text))
    text = re.sub(r"\s+", " ", text.strip())
    return text.lower()


class CLIPBPETokenizer:
    def __init__(self, bpe_path: str, context_length: int = 77):
        self.context_length = context_length
        opener = gzip.open if bpe_path.endswith(".gz") else open
        with opener(bpe_path, "rt", encoding="utf-8") as f:
            merges = f.read().split("\n")
        merges = [tuple(m.split()) for m in merges[1:49152 - 256 - 2 + 1]]
        self.byte_encoder = bytes_to_unicode()
        vocab = list(self.byte_encoder.values())
        vocab = vocab + [v + "</w>" for v in vocab]
        for merge in merges:
            vocab.append("".join(merge))
        vocab.extend(["<|startoftext|>", "<|endoftext|>"])
        self.encoder = {v: i for i, v in enumerate(vocab)}
        self.bpe_ranks = dict(zip(merges, range(len(merges))))
        self.cache = {"<|startoftext|>": "<|startoftext|>",
                      "<|endoftext|>": "<|endoftext|>"}
        # \p{L}/\p{N} classes need the regex module; the stdlib-compatible
        # ASCII classes below are equivalent for English class names/queries
        self.pat = re.compile(
            r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"
            r"|[a-zA-Z]+|[0-9]|[^\sa-zA-Z0-9]+", re.IGNORECASE)
        self.sot = self.encoder["<|startoftext|>"]
        self.eot = self.encoder["<|endoftext|>"]

    def bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = set(zip(word[:-1], word[1:]))
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, 1 << 30))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: List[str] = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if (i < len(word) - 1 and word[i] == first
                        and word[i + 1] == second):
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = set(zip(word[:-1], word[1:]))
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        for token in re.findall(self.pat, _clean(text)):
            token = "".join(self.byte_encoder[b]
                            for b in token.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self.bpe(token).split(" "))
        return ids

    def __call__(self, texts) -> np.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        out = np.zeros((len(texts), self.context_length), np.int32)
        for i, t in enumerate(texts):
            ids = [self.sot] + self.encode(t)[: self.context_length - 2] \
                + [self.eot]
            out[i, :len(ids)] = ids
        return out


class HashTokenizer:
    """Deterministic fallback: word -> stable hash id. Gives structurally
    valid token arrays with a distinct high EOT id (so CLIP argmax pooling
    selects it)."""

    def __init__(self, vocab_size: int = 49408, context_length: int = 77):
        self.vocab_size = vocab_size
        self.context_length = context_length
        self.sot = vocab_size - 2
        self.eot = vocab_size - 1

    def encode(self, text: str) -> List[int]:
        import hashlib

        ids = []
        for w in _clean(text).split(" "):
            h = int(hashlib.md5(w.encode()).hexdigest()[:8], 16)
            ids.append(h % (self.vocab_size - 2))
        return ids

    def __call__(self, texts) -> np.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        out = np.zeros((len(texts), self.context_length), np.int32)
        for i, t in enumerate(texts):
            ids = [self.sot] + self.encode(t)[: self.context_length - 2] \
                + [self.eot]
            out[i, :len(ids)] = ids
        return out


def get_tokenizer(ckpt_dir: str | None = None, context_length: int = 77):
    """Prefer the real BPE vocab when present next to the checkpoints."""
    if ckpt_dir:
        for name in ("bpe_simple_vocab_16e6.txt.gz",
                     "bpe_simple_vocab_16e6.txt"):
            path = os.path.join(ckpt_dir, name)
            if os.path.exists(path):
                return CLIPBPETokenizer(path, context_length)
    import sys
    if ckpt_dir:
        # LOUD: real weights + hash tokens produce structurally plausible
        # but semantically garbage text embeddings -- silent fallback would
        # poison query results (mirrors the weight-fallback warnings)
        sys.stderr.write(
            "=" * 70 + "\n"
            f"WARNING: no BPE vocab (bpe_simple_vocab_16e6.txt[.gz]) in "
            f"{ckpt_dir}.\n"
            "Falling back to HashTokenizer: text embeddings will be GARBAGE\n"
            "with real model weights. Place the vocab next to the\n"
            "checkpoints for meaningful text queries.\n" + "=" * 70 + "\n")
    else:
        sys.stderr.write("[tokenizer] no ckpt_dir: using HashTokenizer "
                         "(fine for random-weight runs only)\n")
    return HashTokenizer(context_length=context_length)
