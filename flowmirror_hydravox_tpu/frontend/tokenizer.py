"""Text tokenizers.

The reference uses a Qwen2 HF tokenizer augmented with paralinguistic and
phoneme special tokens (reference cosyvoice/tokenizer/tokenizer.py:241-313:
CosyVoice2Tokenizer adds [breath] etc.; CosyVoice3Tokenizer adds the full CMU
ARPABET set and pinyin initial/final-with-tone tokens, ~400 specials).

`QwenTokenizer` wraps a local HF tokenizer directory (the tokenizer assets
ship with the model weights, not the repo).  `ByteTokenizer` is a
self-contained fallback (UTF-8 bytes) used by tests and random-weight
benchmarks — same interface, no assets required.
"""

from __future__ import annotations

import logging
import os
from typing import List

logger = logging.getLogger(__name__)

# Default rank asset: the whisper-style multilingual zh/ja/yue vocab shipped
# with the reference (server/model_utils/cosyvoice/tokenizer/assets/
# multilingual_zh_ja_yue_char_del.tiktoken, 907 KB) — a data file, vendored
# here so the real tokenizer is the out-of-the-box default.
DEFAULT_TIKTOKEN_ASSET = os.path.join(
    os.path.dirname(__file__), "assets", "multilingual_zh_ja_yue_char_del.tiktoken"
)


# CosyVoice3 special tokens (tokenizer.py:274-313): paralinguistic +
# CMU ARPABET phonemes + pinyin initials/finals-with-tone.
PARALINGUISTIC_TOKENS = [
    "[breath]", "<strong>", "</strong>", "[noise]", "[laughter]", "[cough]",
    "[clucking]", "[accent]", "[quick_breath]", "<laughter>", "</laughter>",
    "[hissing]", "[sigh]", "[vocalized-noise]", "[lipsmack]", "[mn]",
]

_ARPABET = [
    "AA", "AE", "AH", "AO", "AW", "AY", "B", "CH", "D", "DH", "EH", "ER", "EY",
    "F", "G", "HH", "IH", "IY", "JH", "K", "L", "M", "N", "NG", "OW", "OY",
    "P", "R", "S", "SH", "T", "TH", "UH", "UW", "V", "W", "Y", "Z", "ZH",
]
_STRESS = ["", "0", "1", "2"]
CMU_PHONE_TOKENS = [f"[{p}{s}]" for p in _ARPABET for s in _STRESS]

_PINYIN_INITIALS = [
    "b", "p", "m", "f", "d", "t", "n", "l", "g", "k", "h", "j", "q", "x",
    "zh", "ch", "sh", "r", "z", "c", "s", "y", "w",
]
_PINYIN_FINALS = [
    "a", "o", "e", "i", "u", "v", "ai", "ei", "ui", "ao", "ou", "iu", "ie",
    "ve", "er", "an", "en", "in", "un", "vn", "ang", "eng", "ing", "ong",
    "ia", "iao", "ian", "iang", "iong", "ua", "uo", "uai", "uan", "uang",
    "ueng", "uen",
]
PINYIN_TOKENS = [f"[:{i}]" for i in _PINYIN_INITIALS] + [
    f"[:{f}{t}]" for f in _PINYIN_FINALS for t in "12345"
]

SPECIAL_TOKENS = PARALINGUISTIC_TOKENS + CMU_PHONE_TOKENS + PINYIN_TOKENS


class ByteTokenizer:
    """Self-contained UTF-8 byte tokenizer with the CosyVoice3 special-token
    inventory.  ids: 0-255 bytes, 256+ specials.  Interface-compatible with
    QwenTokenizer for tests and weightless benchmarks."""

    def __init__(self):
        self.specials = {tok: 256 + i for i, tok in enumerate(SPECIAL_TOKENS)}
        self.vocab_size = 256 + len(SPECIAL_TOKENS)

    def encode(self, text: str, **kwargs) -> List[int]:
        out: List[int] = []
        i = 0
        while i < len(text):
            matched = False
            if text[i] in "[<":
                for tok, tid in self.specials.items():
                    if text.startswith(tok, i):
                        out.append(tid)
                        i += len(tok)
                        matched = True
                        break
            if not matched:
                out.extend(text[i].encode("utf-8"))
                i += 1
        return out

    def decode(self, ids: List[int]) -> str:
        rev = {v: k for k, v in self.specials.items()}
        buf, out = bytearray(), []
        for t in ids:
            if t < 256:
                buf.append(t)
            else:
                if buf:
                    out.append(buf.decode("utf-8", errors="replace"))
                    buf = bytearray()
                out.append(rev.get(t, ""))
        if buf:
            out.append(buf.decode("utf-8", errors="replace"))
        return "".join(out)


class QwenTokenizer:
    """HF Qwen2 tokenizer from a local path, with CosyVoice3 specials added
    (reference tokenizer.py:241-327 get_qwen_tokenizer)."""

    def __init__(self, token_path: str, skip_special_tokens: bool = True):
        from transformers import AutoTokenizer

        self.tokenizer = AutoTokenizer.from_pretrained(token_path, local_files_only=True)
        self.tokenizer.add_special_tokens(
            {"additional_special_tokens": SPECIAL_TOKENS}
        )
        self.skip_special_tokens = skip_special_tokens
        self.vocab_size = len(self.tokenizer)

    def encode(self, text: str, **kwargs) -> List[int]:
        return self.tokenizer.encode(text, add_special_tokens=False)

    def decode(self, ids: List[int]) -> str:
        return self.tokenizer.decode(ids, skip_special_tokens=self.skip_special_tokens)


class WhisperTiktokenTokenizer:
    """Whisper-style tiktoken tokenizer (reference tokenizer.py:169-238:
    `get_encoding` over a .tiktoken rank file + TTS special tokens).  The
    rank asset IS present in the reference snapshot
    (tokenizer/assets/multilingual_zh_ja_yue_char_del.tiktoken) and is
    vendored under frontend/assets/ — it is the default tokenizer."""

    def __init__(self, tiktoken_file: str, num_languages: int = 100):
        import base64 as _b64

        import tiktoken

        ranks = {}
        with open(tiktoken_file) as f:
            for line in f:
                if not line.strip():
                    continue
                token, rank = line.split()
                ranks[_b64.b64decode(token)] = int(rank)
        n_vocab = len(ranks)
        specials = [
            "<|endoftext|>", "<|startoftranscript|>",
            *[f"<|lang_{i}|>" for i in range(num_languages)],
            "<|translate|>", "<|transcribe|>", "<|startoflm|>", "<|startofprev|>",
            "<|nospeech|>", "<|notimestamps|>",
        ] + SPECIAL_TOKENS
        special_tokens = {tok: n_vocab + i for i, tok in enumerate(specials)}
        self.encoding = tiktoken.Encoding(
            name="hydravox_whisper",
            explicit_n_vocab=n_vocab + len(special_tokens),
            pat_str=r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+""",
            mergeable_ranks=ranks,
            special_tokens=special_tokens,
        )
        self.vocab_size = self.encoding.n_vocab

    def encode(self, text: str, allowed_special="all", **kwargs):
        return self.encoding.encode(text, allowed_special=allowed_special)

    def decode(self, ids):
        return self.encoding.decode(ids)


def get_tokenizer(token_path: str | None = None, strict: bool = False):
    """Load the real tokenizer (reference tokenizer.py:316-327 get_qwen_tokenizer
    / :169-238 get_encoding equivalents).

    Resolution order:
      1. explicit `token_path` (.tiktoken rank file or HF tokenizer dir);
      2. the vendored whisper-tiktoken asset (DEFAULT_TIKTOKEN_ASSET,
         vocab 59,319 incl. the ~560 TTS/phoneme specials) — the default;
      3. ByteTokenizer, with a loud warning: byte-level ids do NOT match any
         reference checkpoint's text-embedding vocab (tests/benchmarks only).

    strict=True re-raises instead of falling through when a load fails.
    """
    candidates = [token_path] if token_path else []
    if not token_path and os.path.exists(DEFAULT_TIKTOKEN_ASSET):
        candidates.append(DEFAULT_TIKTOKEN_ASSET)
    for cand in candidates:
        try:
            if cand.endswith(".tiktoken"):
                return WhisperTiktokenTokenizer(cand)
            return QwenTokenizer(cand)
        except Exception as e:
            if strict:
                raise
            logger.warning("failed to load tokenizer from %s: %s", cand, e)
    logger.warning(
        "falling back to ByteTokenizer — byte-level token ids do NOT match "
        "reference checkpoints' text vocab; pass token_path for production use"
    )
    return ByteTokenizer()
