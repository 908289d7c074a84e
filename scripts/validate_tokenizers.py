#!/usr/bin/env python
"""Cross-validate ovo_tpu's self-contained tokenizers against the upstream
libraries (reference gets tokenization via open_clip / sentencepiece,
/root/reference/ovo/utils/clip_utils.py:51-86).

This image ships neither `sentencepiece` nor `open_clip`, so the harness is
built to run in three modes:

  --selftest         prove the diff machinery NOW, with no external deps:
                     (a) our Viterbi segmenter vs an independent brute-force
                         max-score segmenter on a synthesized ModelProto
                         (must agree on every corpus string);
                     (b) a deliberately corrupted vocabulary (must be
                         caught -- the harness fails loudly, not silently).
  --model FILE.model diff our SentencePieceTokenizer against the real
                     `sentencepiece` library on FILE (requires the lib +
                     a real SigLIP/Gemma .model; run wherever both exist).
  --bpe FILE         diff our CLIPBPETokenizer against `open_clip`'s
                     SimpleTokenizer on FILE (bpe vocab gz).

Exit code 0 = full agreement; 1 = any id-sequence mismatch (first diffs
printed). Corpus: the reference's prompt templates over the Replica /
ScanNet class vocabulary plus unicode/digit/punctuation edge strings.
"""
from __future__ import annotations

import argparse
import struct
import sys
from pathlib import Path
from typing import Callable, List, Sequence, Tuple

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


# ---------------------------------------------------------------------------
# corpus
# ---------------------------------------------------------------------------

CLASSES = ["wall", "floor", "chair", "sofa", "table", "door", "window",
           "bookshelf", "picture", "counter", "desk", "curtain",
           "refrigerator", "shower curtain", "toilet", "sink", "bathtub",
           "otherfurniture", "cabinet", "bed", "plant", "ceiling",
           "tv-screen", "wall-plug", "desk-organizer", "tissue-paper"]
TEMPLATES = ["{}", "This is a photo of a {}", "a photo of the {}",
             "there is a {} in the scene"]
EDGE = ["", " ", "  double  spaces  ", "CAPS and MiXeD", "123 456.789",
        "hyphen-ated word_underscore", "naïve café über",
        "日本語のテキスト", "emoji 🙂 test", "trailing space ",
        "punct!? (brackets) [and] {braces}, commas; colons:"]


def corpus() -> List[str]:
    out = list(EDGE)
    for t in TEMPLATES:
        out += [t.format(c) for c in CLASSES]
    return out


# ---------------------------------------------------------------------------
# diff machinery
# ---------------------------------------------------------------------------

def diff_tokenizers(name_a: str, enc_a: Callable[[str], List[int]],
                    name_b: str, enc_b: Callable[[str], List[int]],
                    texts: Sequence[str], max_print: int = 10
                    ) -> Tuple[int, int]:
    """Compare raw id sequences text by text. Returns (n_match, n_total)
    and prints the first ``max_print`` mismatches."""
    n_match = 0
    printed = 0
    for t in texts:
        a, b = list(enc_a(t)), list(enc_b(t))
        if a == b:
            n_match += 1
        elif printed < max_print:
            printed += 1
            print(f"  MISMATCH {t!r}:\n    {name_a}: {a}\n    {name_b}: {b}")
    print(f"[diff] {name_a} vs {name_b}: {n_match}/{len(texts)} texts agree")
    return n_match, len(texts)


# ---------------------------------------------------------------------------
# selftest: synthesized ModelProto + independent brute-force oracle
# ---------------------------------------------------------------------------

def _varint(n: int) -> bytes:
    if n < 0:
        n &= (1 << 64) - 1
    out = b""
    while True:
        b7 = n & 0x7F
        n >>= 7
        out += bytes([b7 | (0x80 if n else 0)])
        if not n:
            return out


def _f_bytes(num: int, payload: bytes) -> bytes:
    return _varint(num << 3 | 2) + _varint(len(payload)) + payload


def _f_varint(num: int, val: int) -> bytes:
    return _varint(num << 3 | 0) + _varint(val)


def _f_f32(num: int, val: float) -> bytes:
    return _varint(num << 3 | 5) + struct.pack("<f", val)


def make_sp_model(pieces, trainer_ids=(2, -1, 1, 0)) -> bytes:
    msg = b""
    for text, score, t in pieces:
        sub = (_f_bytes(1, text.encode("utf-8")) + _f_f32(2, score)
               + _f_varint(3, t))
        msg += _f_bytes(1, sub)
    unk, bos, eos, pad = trainer_ids
    msg += _f_bytes(2, _f_varint(40, unk) + _f_varint(41, bos)
                    + _f_varint(42, eos) + _f_varint(43, pad))
    return msg


def _synth_pieces():
    """A vocabulary rich enough that segmentation is ambiguous (multiple
    lattice paths) on the corpus words."""
    import itertools

    pieces = [("<pad>", 0.0, 3), ("</s>", 0.0, 3), ("<unk>", 0.0, 2)]
    words = set()
    for t in corpus():
        words.update(t.lower().split())
    rng_score = itertools.count()
    alphabet = sorted({ch for w in words for ch in w if ord(ch) < 128})
    pieces += [("▁", -2.0, 1)]
    for ch in alphabet:
        pieces.append((ch, -10.0 - (next(rng_score) % 7) * 0.13, 1))
        pieces.append(("▁" + ch, -9.0 - (next(rng_score) % 5) * 0.21, 1))
    for w in sorted(words):
        if 2 <= len(w) <= 8 and all(ord(c) < 128 for c in w):
            pieces.append(("▁" + w, -4.0 - (len(w) % 3) * 0.37, 1))
            if len(w) > 3:
                pieces.append(("▁" + w[:2], -6.1, 1))
                pieces.append((w[2:], -5.7 - (len(w) % 2) * 0.11, 1))
    # dedup keeping first
    seen, out = set(), []
    for p in pieces:
        if p[0] not in seen:
            seen.add(p[0])
            out.append(p)
    return out


def brute_force_unigram(pieces, trainer_unk: int):
    """Independent oracle: exhaustive max-score segmentation by dynamic
    programming over raw piece scores (same objective as SentencePiece's
    Viterbi, different implementation: dict lookups over every substring,
    no lattice). Single-char unknowns map to unk."""
    vocab = {p[0]: (i, p[1]) for i, p in enumerate(pieces)
             if p[2] not in (2, 3)}
    unk_score = -1e3

    def encode(text: str) -> List[int]:
        # the production tokenizer's canonicalization, re-expressed
        import unicodedata
        t = unicodedata.normalize("NFKC", text)
        t = " ".join(t.split())
        t = "▁" + t.replace(" ", "▁")
        n = len(t)
        best = [(-1e18, None)] * (n + 1)
        best[0] = (0.0, None)
        for i in range(n):
            sc_i = best[i][0]
            if sc_i <= -1e17:
                continue
            for j in range(i + 1, n + 1):
                piece = t[i:j]
                if piece in vocab:
                    s = sc_i + vocab[piece][1]
                    if s > best[j][0]:
                        best[j] = (s, (i, vocab[piece][0]))
            # unknown single char fallback
            s = sc_i + unk_score
            if s > best[i + 1][0]:
                best[i + 1] = (s, (i, trainer_unk))
        ids = []
        j = n
        while j > 0:
            i, pid = best[j][1]
            ids.append(pid)
            j = i
        return ids[::-1]

    return encode


def selftest() -> int:
    from ovo_tpu.models.tokenizers import SentencePieceTokenizer

    pieces = _synth_pieces()
    blob = make_sp_model(pieces)
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".model", delete=False) as f:
        f.write(blob)
        path = f.name
    ours = SentencePieceTokenizer(path)
    oracle = brute_force_unigram(pieces, trainer_unk=2)
    texts = [t.lower() for t in corpus()
             if t and all(ord(c) < 128 for c in t)]
    n, total = diff_tokenizers("ours", ours.encode, "brute-force-oracle",
                               oracle, texts)
    if n != total:
        print("[selftest] FAIL: Viterbi disagrees with the brute-force "
              "max-score oracle")
        return 1

    # (b) corrupted vocabulary MUST be caught: drop a word piece so the
    # segmentations diverge -- proves the diff machinery detects drift
    corrupt = [p for p in pieces if p[0] != "▁chair"]
    blob2 = make_sp_model(corrupt)
    with tempfile.NamedTemporaryFile(suffix=".model", delete=False) as f:
        f.write(blob2)
        path2 = f.name
    ours2 = SentencePieceTokenizer(path2)
    n2, total2 = diff_tokenizers("ours-corrupted", ours2.encode,
                                 "brute-force-oracle", oracle,
                                 ["this is a photo of a chair"],
                                 max_print=0)
    if n2 == total2:
        print("[selftest] FAIL: corrupted vocab was NOT detected")
        return 1
    print("[selftest] PASS: oracle agreement + corruption detection")
    return 0


# ---------------------------------------------------------------------------
# real-library modes
# ---------------------------------------------------------------------------

def diff_sentencepiece(model_path: str) -> int:
    try:
        import sentencepiece as spm
    except ImportError:
        print("sentencepiece is not installed in this image; run this mode "
              "in an environment that has it (pip install sentencepiece)")
        return 2
    from ovo_tpu.models.tokenizers import SentencePieceTokenizer

    ours = SentencePieceTokenizer(model_path)
    sp = spm.SentencePieceProcessor(model_file=model_path)
    n, total = diff_tokenizers("ovo_tpu", ours.encode, "sentencepiece",
                               lambda t: sp.encode(t, out_type=int),
                               corpus())
    return 0 if n == total else 1


def diff_bpe(vocab_path: str) -> int:
    try:
        from open_clip.tokenizer import SimpleTokenizer
    except ImportError:
        print("open_clip is not installed in this image; run this mode in "
              "an environment that has it (pip install open_clip_torch)")
        return 2
    from ovo_tpu.models.tokenizers import CLIPBPETokenizer

    ours = CLIPBPETokenizer(vocab_path)
    ref = SimpleTokenizer(bpe_path=vocab_path)
    n, total = diff_tokenizers("ovo_tpu", ours.encode, "open_clip",
                               lambda t: ref.encode(t), corpus())
    return 0 if n == total else 1


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--selftest", action="store_true")
    ap.add_argument("--model", help="real sentencepiece .model to diff")
    ap.add_argument("--bpe", help="real CLIP bpe vocab (gz) to diff")
    args = ap.parse_args()
    if args.selftest:
        return selftest()
    if args.model:
        return diff_sentencepiece(args.model)
    if args.bpe:
        return diff_bpe(args.bpe)
    ap.print_help()
    return 2


if __name__ == "__main__":
    sys.exit(main())
