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

import json
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


# Special-token inventories, byte-exact with the reference
# (cosyvoice/tokenizer/tokenizer.py): the CosyVoice3 additional specials
# (paralinguistic + full CMU ARPABET + tone-marked pinyin initials/finals,
# tokenizer.py:274-313) and the whisper-side tables (LANGUAGES/AUDIO_EVENT/
# EMOTION/TTS_Vocal_Token, tokenizer.py:11-166) used by get_encoding's
# special layout. Vendored as a data asset — token-id compatibility with
# reference checkpoints depends on these exact strings in this exact order.
with open(os.path.join(os.path.dirname(__file__), "assets", "special_tokens.json"),
          encoding="utf-8") as _f:
    _TABLES = json.load(_f)

# CosyVoice3Tokenizer additional_special_tokens (tokenizer.py:277-306)
SPECIAL_TOKENS = list(_TABLES["cv3_additional_special_tokens"])
CMU_PHONE_TOKENS = [t for t in SPECIAL_TOKENS if t[1:-1].isupper() and t.startswith("[")]
PINYIN_TOKENS = [
    t for t in SPECIAL_TOKENS
    if t.startswith("[") and t[1:-1].islower() and t not in
    ("[breath]", "[noise]", "[laughter]", "[cough]", "[clucking]", "[accent]",
     "[quick_breath]", "[hissing]", "[sigh]", "[vocalized-noise]", "[lipsmack]", "[mn]")
]


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

    def __init__(self, tiktoken_file: str, num_languages: int = 99):
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
        # special layout mirrors reference get_encoding (tokenizer.py:179-198)
        # byte-exact and in order, so special ids match CV1 checkpoints; the
        # CosyVoice3 additional specials are appended AFTER (a documented
        # extension — the reference keeps those only on the HF-Qwen tokenizer,
        # whose assets are not in the snapshot)
        specials = [
            "<|endoftext|>", "<|startoftranscript|>",
            *[f"<|{lang}|>" for lang in _TABLES["languages"][:num_languages]],
            *[f"<|{ev}|>" for ev in _TABLES["audio_events"]],
            *[f"<|{em}|>" for em in _TABLES["emotions"]],
            "<|translate|>", "<|transcribe|>", "<|startoflm|>", "<|startofprev|>",
            "<|nospeech|>", "<|notimestamps|>",
            *[f"<|SPECIAL_TOKEN_{i}|>" for i in range(1, 31)],
            *[f"<|{tts}|>" for tts in _TABLES["tts_vocal_tokens"]],
            *[f"<|{i * 0.02:.2f}|>" for i in range(1501)],
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
