"""Text normalization + segmentation.

The reference normalizes with a proprietary `fmtn` wheel (missing from the
snapshot — reference SURVEY.md §2.5) or wetext+inflect
(cli/frontend.py:124-155), then splits paragraphs at token_max_n=80 with
min 60 and short-segment merging at 20.  This module provides a
self-contained TN covering the behaviors the serving path exercises:
number spell-out (en + zh), unit/symbol expansion, whitespace and
punctuation cleanup, and the reference's punctuation-based long-text
splitting (infer_speech_model.py:263-356).
"""

from __future__ import annotations

import re
from typing import List

_EN_ONES = [
    "zero", "one", "two", "three", "four", "five", "six", "seven", "eight",
    "nine", "ten", "eleven", "twelve", "thirteen", "fourteen", "fifteen",
    "sixteen", "seventeen", "eighteen", "nineteen",
]
_EN_TENS = ["", "", "twenty", "thirty", "forty", "fifty", "sixty", "seventy", "eighty", "ninety"]
_EN_SCALE = [(10 ** 9, "billion"), (10 ** 6, "million"), (1000, "thousand"), (100, "hundred")]

_ZH_DIGITS = "零一二三四五六七八九"
_ZH_UNITS = ["", "十", "百", "千"]
_ZH_SCALE = ["", "万", "亿"]


def num_to_words_en(n: int) -> str:
    if n < 0:
        return "minus " + num_to_words_en(-n)
    if n < 20:
        return _EN_ONES[n]
    if n < 100:
        t, r = divmod(n, 10)
        return _EN_TENS[t] + ("-" + _EN_ONES[r] if r else "")
    for scale, name in _EN_SCALE:
        if n >= scale:
            head, rest = divmod(n, scale)
            out = num_to_words_en(head) + " " + name
            if rest:
                out += " " + num_to_words_en(rest)
            return out
    return str(n)


def _zh_four(n: int) -> str:
    """Chinese reading of 0..9999."""
    if n == 0:
        return ""
    out, started = "", False
    for i, div in ((3, 1000), (2, 100), (1, 10), (0, 1)):
        d = (n // div) % 10
        if d:
            if div == 10 and d == 1 and not started and n < 20:
                out += "十"
            else:
                out += _ZH_DIGITS[d] + _ZH_UNITS[i]
            started = True
        elif started and n % div:
            if not out.endswith("零"):
                out += "零"
    return out


def num_to_words_zh(n: int) -> str:
    if n < 0:
        return "负" + num_to_words_zh(-n)
    if n == 0:
        return "零"
    parts = []
    i = 0
    while n > 0 and i < 3:
        n, chunk = divmod(n, 10000)
        if chunk:
            parts.append(_zh_four(chunk) + _ZH_SCALE[i])
        elif parts and not parts[-1].startswith("零"):
            parts.append("零")
        i += 1
    return "".join(reversed([p for p in parts if p != "零" or len(parts) > 1]))


def _has_cjk(text: str) -> bool:
    return any("一" <= c <= "鿿" for c in text)


def _spell_number(match: re.Match, zh: bool) -> str:
    s = match.group(0)
    if "." in s:
        integer, frac = s.split(".", 1)
        if zh:
            return (
                num_to_words_zh(int(integer or 0)) + "点" +
                "".join(_ZH_DIGITS[int(d)] for d in frac)
            )
        return (
            num_to_words_en(int(integer or 0)) + " point " +
            " ".join(_EN_ONES[int(d)] for d in frac)
        )
    return num_to_words_zh(int(s)) if zh else num_to_words_en(int(s))


_SYMBOLS_ZH = {"%": "百分之", "+": "加", "=": "等于", "℃": "摄氏度", "$": "美元", "￥": "元"}
_SYMBOLS_EN = {"%": " percent", "+": " plus ", "=": " equals ", "℃": " degrees celsius", "$": " dollars"}


def normalize(text: str) -> str:
    """Normalize a piece of text for synthesis (fmtn-equivalent light TN)."""
    zh = _has_cjk(text)
    text = text.strip()
    # percentages: zh reads prefix ("百分之NN")
    if zh:
        text = re.sub(r"(\d+(?:\.\d+)?)%", lambda m: "百分之" + m.group(1), text)
    text = re.sub(r"\d+(?:\.\d+)?", lambda m: _spell_number(m, zh), text)
    symbols = _SYMBOLS_ZH if zh else _SYMBOLS_EN
    for sym, word in symbols.items():
        text = text.replace(sym, word)
    text = re.sub(r"\s+", " ", text)
    return text.strip()


_SPLIT_PUNCT = "。！？!?；;\n"
_SOFT_PUNCT = "，,、：:"


def split_text_by_punctuation(text: str, max_length: int = 30, min_length: int = 10) -> List[str]:
    """Punctuation-first segmentation with short-segment merging
    (infer_speech_model.py:263-356)."""
    segments, cur = [], ""
    for ch in text:
        cur += ch
        if ch in _SPLIT_PUNCT and len(cur.strip()) >= min_length:
            segments.append(cur.strip())
            cur = ""
        elif ch in _SOFT_PUNCT and len(cur.strip()) >= max_length:
            segments.append(cur.strip())
            cur = ""
    if cur.strip():
        segments.append(cur.strip())
    return merge_short_segments([s for s in segments if s], min_length)


def merge_short_segments(segments: List[str], min_length: int = 10) -> List[str]:
    """Merge segments shorter than min_length into the previous one
    (infer_speech_model.py:318-356)."""
    out: List[str] = []
    for seg in segments:
        if out and len(seg) < min_length:
            out[-1] = out[-1] + seg
        else:
            out.append(seg)
    if len(out) >= 2 and len(out[0]) < min_length:
        out[1] = out[0] + out[1]
        out.pop(0)
    return out
