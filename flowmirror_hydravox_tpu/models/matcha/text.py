"""Matcha text processing (reference matcha/text/: symbols, cleaners,
text_to_sequence).

The reference phonemizes with a global espeak backend
(matcha/text/cleaners.py:28) — espeak is not in this image, so the default
cleaner is `english_cleaners_no_phonemizer`: lowercase, abbreviation +
number expansion, whitespace collapse, character-level symbols.  A
`phonemize_fn` hook accepts an external phonemizer when available (same IPA
symbol inventory as the reference)."""

from __future__ import annotations

import re
from typing import Callable, List, Optional

from ...frontend.text_norm import num_to_words_en

# reference matcha/text/symbols.py inventory
_pad = "_"
_punctuation = ';:,.!?¡¿—…"«»“” '
_letters = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
_letters_ipa = (
    "ɑɐɒæɓʙβɔɕçɗɖðʤəɘɚɛɜɝɞɟʄɡɠɢʛɦɧħɥʜɨɪʝɭɬɫɮʟɱɯɰŋɳɲɴøɵɸθœɶʘɹɺɾɻʀʁɽʂʃʈʧʉʊʋⱱʌɣɤʍχʎʏʑʐʒʔʡʕʢǀǁǂǃˈˌːˑʼʴʰʱʲʷˠˤ˞↓↑→↗↘'̩'ᵻ"
)

symbols = [_pad] + list(_punctuation) + list(_letters) + list(_letters_ipa)
_symbol_to_id = {s: i for i, s in enumerate(symbols)}

_abbreviations = [
    (re.compile(rf"\b{abbr}\.", re.IGNORECASE), full)
    for abbr, full in [
        ("mrs", "misess"), ("mr", "mister"), ("dr", "doctor"), ("st", "saint"),
        ("co", "company"), ("jr", "junior"), ("maj", "major"), ("gen", "general"),
        ("drs", "doctors"), ("rev", "reverend"), ("lt", "lieutenant"),
        ("hon", "honorable"), ("sgt", "sergeant"), ("capt", "captain"),
        ("esq", "esquire"), ("ltd", "limited"), ("col", "colonel"), ("ft", "fort"),
    ]
]


def expand_abbreviations(text: str) -> str:
    for pattern, replacement in _abbreviations:
        text = pattern.sub(replacement, text)
    return text


def expand_numbers(text: str) -> str:
    return re.sub(r"\d+", lambda m: num_to_words_en(int(m.group(0))), text)


def english_cleaners_no_phonemizer(text: str) -> str:
    text = text.lower()
    text = expand_abbreviations(text)
    text = expand_numbers(text)
    return re.sub(r"\s+", " ", text).strip()


_default_g2p = None


def default_phonemizer() -> Callable[[str], str]:
    """Built-in rule/lexicon G2P (g2p.py) — IPA over the reference symbol
    inventory; upgraded transparently by HYDRAVOX_CMU_LEXICON."""
    global _default_g2p
    if _default_g2p is None:
        from .g2p import G2P

        _default_g2p = G2P()
    return _default_g2p


def text_to_sequence(
    text: str, phonemize_fn: Optional[Callable[[str], str]] = None,
    use_g2p: bool = True,
) -> List[int]:
    """Text -> symbol-id sequence (matcha/text/__init__.py:1-53).

    Default path is phoneme-class like the reference's espeak cleaner
    (cleaners.py:28): cleaner -> G2P -> IPA symbol ids.  Pass an external
    `phonemize_fn` (e.g. a real espeak wrapper) to override the built-in,
    or `use_g2p=False` for character-level symbols."""
    cleaned = english_cleaners_no_phonemizer(text)
    if phonemize_fn is None and use_g2p:
        phonemize_fn = default_phonemizer()
    if phonemize_fn is not None:
        cleaned = phonemize_fn(cleaned)
    return [_symbol_to_id[ch] for ch in cleaned if ch in _symbol_to_id]


def intersperse(seq: List[int], item: int = 0) -> List[int]:
    """Insert `item` between symbols (matcha/utils/utils.py intersperse —
    the model trains on blank-interspersed sequences)."""
    out = [item] * (2 * len(seq) + 1)
    out[1::2] = seq
    return out
