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


_SYMBOLS_ZH = {
    "%": "百分之", "+": "加", "=": "等于", "℃": "摄氏度", "°C": "摄氏度",
    "$": "美元", "￥": "元",
}
_SYMBOLS_EN = {
    "%": " percent", "+": " plus ", "=": " equals ", "℃": " degrees celsius",
    "°C": " degrees celsius", "°F": " degrees fahrenheit", "$": " dollars",
}

# digit-wise zh reading; phone numbers read 1 as 幺 (wetext convention)
_ZH_DIGITS_PHONE = "零幺二三四五六七八九"


def _zh_digitwise(digits: str, phone: bool = False) -> str:
    table = _ZH_DIGITS_PHONE if phone else _ZH_DIGITS
    return "".join(table[int(d)] for d in digits)


_EN_ORDINAL_IRREG = {
    1: "first", 2: "second", 3: "third", 5: "fifth", 8: "eighth", 9: "ninth", 12: "twelfth",
}


def num_to_ordinal_en(n: int) -> str:
    if n in _EN_ORDINAL_IRREG:
        return _EN_ORDINAL_IRREG[n]
    if n < 20:
        return num_to_words_en(n) + "th"
    last2 = n % 100
    if last2 == 0:  # hundred/thousand/…th and twenty->twentieth style tens
        return num_to_words_en(n) + "th"
    if n >= 100 and last2 < 20:  # 101st..119th, 1013th: head + small ordinal
        return num_to_words_en(n - last2) + " " + num_to_ordinal_en(last2)
    if n % 10 == 0:  # 20th, 130th: ...ty -> ...tieth
        return num_to_words_en(n)[:-1] + "ieth"
    return num_to_words_en(n - n % 10) + "-" + num_to_ordinal_en(n % 10)


def num_to_year_en(y: int) -> str:
    """Conventional English year reading: 1984 -> nineteen eighty-four,
    1905 -> nineteen oh five, 1900 -> nineteen hundred, 2000 -> two
    thousand, 2005 -> two thousand five, 2024 -> twenty twenty-four."""
    hi, lo = divmod(y, 100)
    if y % 1000 == 0:
        return num_to_words_en(y)
    if hi % 10 == 0 and lo < 10:  # x00x: 2005-style reads through the thousand
        return num_to_words_en(hi * 100) + " " + num_to_words_en(lo)
    if lo == 0:
        return num_to_words_en(hi) + " hundred"
    if lo < 10:
        return num_to_words_en(hi) + " oh " + num_to_words_en(lo)
    return num_to_words_en(hi) + " " + num_to_words_en(lo)


# value-1 exact forms stay singular ("1 km" -> one kilometer)
_EN_UNITS = {
    "km/h": "kilometers per hour", "mph": "miles per hour",
    "km": "kilometers", "cm": "centimeters", "mm": "millimeters",
    "kg": "kilograms", "mg": "milligrams", "lb": "pounds", "oz": "ounces",
    "GHz": "gigahertz", "MHz": "megahertz", "kHz": "kilohertz", "Hz": "hertz",
    "TB": "terabytes", "GB": "gigabytes", "MB": "megabytes", "KB": "kilobytes",
    "ms": "milliseconds",
}
_EN_UNIT_RE = re.compile(
    r"(\d+(?:\.\d+)?)\s*(" + "|".join(re.escape(u) for u in _EN_UNITS) + r")(?![A-Za-z])"
)

# keithito-class salutation/title abbreviations (serving TN; the Matcha text
# cleaner keeps its own table for checkpoint-symbol compatibility)
_EN_ABBREV = {
    "mr": "mister", "mrs": "misess", "dr": "doctor", "st": "saint",
    "jr": "junior", "sr": "senior", "prof": "professor", "gen": "general",
    "capt": "captain", "sgt": "sergeant", "lt": "lieutenant",
    "col": "colonel", "maj": "major", "rev": "reverend", "hon": "honorable",
    "vs": "versus",
}
_EN_ABBREV_RE = re.compile(
    r"\b(" + "|".join(_EN_ABBREV) + r")\.(?=\s|$)", re.IGNORECASE
)


def _en_digitwise(digits: str) -> str:
    return " ".join(_EN_ONES[int(d)] for d in digits)


def _en_time(h: int, m: int) -> str:
    hour = num_to_words_en(h if 1 <= h <= 12 else (h - 12 if h > 12 else 12))
    if m == 0:
        return f"{hour} o'clock"
    if m < 10:
        return f"{hour} oh {num_to_words_en(m)}"
    return f"{hour} {num_to_words_en(m)}"


def _normalize_zh(text: str) -> str:
    # money: ￥/¥/$ BEFORE the amount reads AFTER it in zh
    text = re.sub(r"[￥¥](\d+(?:\.\d+)?)", lambda m: m.group(1) + "元", text)
    text = re.sub(r"\$(\d+(?:\.\d+)?)", lambda m: m.group(1) + "美元", text)
    # ISO dates 2024-05-01 -> 二零二四年5月1日 (generic pass reads M月D日)
    text = re.sub(
        r"(?<!\d)(\d{4})-(\d{1,2})-(\d{1,2})(?!\d)",
        lambda m: _zh_digitwise(m.group(1)) + "年" + str(int(m.group(2))) + "月"
        + str(int(m.group(3))) + "日",
        text,
    )
    # years: digit-wise before 年 (wetext: 2024年 -> 二零二四年)
    text = re.sub(r"(\d{4})年", lambda m: _zh_digitwise(m.group(1)) + "年", text)
    # phone-like digit runs (10-12 digits, e.g. 11-digit mobile): digit-wise with 幺
    text = re.sub(
        r"(?<!\d)(\d{10,12})(?!\d)", lambda m: _zh_digitwise(m.group(1), phone=True), text
    )
    # separated mobile format 138-1234-5678 (also spaces): digit-wise with 幺
    text = re.sub(
        r"(?<!\d)(\d{3})[- ](\d{4})[- ](\d{4})(?!\d)",
        lambda m: "".join(_zh_digitwise(g, phone=True) for g in m.groups()),
        text,
    )
    # time H:MM / H：MM -> H点MM分 (zero-minutes -> 整)
    def _zh_time(m):
        h, mm = int(m.group(1)), int(m.group(2))
        mins = "整" if mm == 0 else ("零" + num_to_words_zh(mm) if mm < 10 else num_to_words_zh(mm)) + ("分" if mm else "")
        return num_to_words_zh(h) + "点" + mins
    text = re.sub(r"(?<!\d)(\d{1,2})[:：](\d{2})(?!\d)", _zh_time, text)
    # fractions a/b -> b分之a
    text = re.sub(
        r"(?<!\d)(\d+)/(\d+)(?!\d)",
        lambda m: num_to_words_zh(int(m.group(2))) + "分之" + num_to_words_zh(int(m.group(1))),
        text,
    )
    # ranges a~b / a-b between digits -> a到b (incl. U+2212 minus)
    text = re.sub(r"(\d+(?:\.\d+)?)[~～—−-](\d+(?:\.\d+)?)", r"\1到\2", text)
    # scores 3:2 -> 3比2 (single-digit right side cannot be a clock time)
    text = re.sub(r"(?<!\d)(\d{1,2})[:：](\d)(?!\d)", r"\1比\2", text)
    # negative numbers (ranges already rewritten above, so a bare -N is a sign)
    text = re.sub(r"(?<![\d~～—\-.])[-−](\d+(?:\.\d+)?)", r"负\1", text)
    # percentages read prefix ("百分之NN")
    text = re.sub(r"(\d+(?:\.\d+)?)%", lambda m: "百分之" + m.group(1), text)
    return text


def _normalize_en(text: str) -> str:
    # salutation/title abbreviations: "Dr. Smith" -> "doctor Smith"
    text = _EN_ABBREV_RE.sub(lambda m: _EN_ABBREV[m.group(1).lower()], text)
    # money: $5.30 -> five dollars and thirty cents; $5 -> five dollars
    def _en_money(m):
        dollars = int(m.group(1))
        head = num_to_words_en(dollars) + (" dollar" if dollars == 1 else " dollars")
        if m.group(2):
            cents = int(m.group(2)[:2].ljust(2, "0"))
            if cents:
                head += " and " + num_to_words_en(cents) + (" cent" if cents == 1 else " cents")
        return head
    text = re.sub(r"\$(\d+)(?:\.(\d+))?", _en_money, text)
    # ordinals: 1st, 22nd, 103rd ...
    text = re.sub(
        r"(?<!\d)(\d+)(st|nd|rd|th)\b",
        lambda m: num_to_ordinal_en(int(m.group(1))),
        text,
    )
    # time H:MM -> eight thirty / eight oh five / eight o'clock
    text = re.sub(
        r"(?<!\d)(\d{1,2}):(\d{2})(?!\d)",
        lambda m: _en_time(int(m.group(1)), int(m.group(2))),
        text,
    )
    # units: 5 km -> five kilometers, 1 kg -> one kilogram
    def _en_unit(m):
        unit = _EN_UNITS[m.group(2)]
        if float(m.group(1)) == 1.0:
            if " per " in unit:
                unit = unit.replace("s per ", " per ", 1)
            elif unit.endswith("s"):
                unit = unit[:-1]
        return m.group(1) + " " + unit
    text = _EN_UNIT_RE.sub(_en_unit, text)
    # phone-like groups: 555-123-4567 / 555.1234 runs -> digit-wise
    text = re.sub(
        r"(?<!\d)(\d{3})[-.](\d{3,4})[-.](\d{4})(?!\d)",
        lambda m: ", ".join(_en_digitwise(g) for g in m.groups()),
        text,
    )
    text = re.sub(r"(?<!\d)(\d{10,11})(?!\d)", lambda m: _en_digitwise(m.group(1)), text)
    return text


def _en_years_decades(text: str) -> str:
    """Year/decade reading — runs BEFORE digit-grouping commas are stripped,
    so an explicit cardinal like '1,984 people' keeps its cardinal reading
    (only a bare 4-digit run can be a year)."""
    # decades: 1980s -> nineteen eighties, 90s -> nineties; x00s/x10s fall
    # through to the year rule below ('1900s' -> nineteen hundreds,
    # '2010s' -> twenty tens via the trailing s)
    def _en_decade(m):
        hi, tens = divmod(int(m.group(1)), 10)
        return num_to_words_en(hi) + " " + _EN_TENS[tens][:-1] + "ies"
    text = re.sub(r"(?<!\d)((?:1[5-9]|20)[2-9])0s\b", _en_decade, text)
    text = re.sub(
        r"(?<!\d)([2-9])0s\b", lambda m: _EN_TENS[int(m.group(1))][:-1] + "ies", text
    )
    # bare 4-digit years 1500-2099 read pairwise (inflect, the reference's en
    # fallback, has no year rule at all — this is wetext-class behavior).
    # Lookarounds: no digit/dot/dash/currency before (phone groups, decimals,
    # '$1984' stays money), no following digits incl. '.5' decimals — but a
    # sentence-final '1984.' still reads as a year
    text = re.sub(
        r"(?<![\d.\-$€£￥¥])((?:1[5-9]|20)\d{2})(?!\.?\d|st\b|nd\b|rd\b|th\b)",
        lambda m: num_to_year_en(int(m.group(1))),
        text,
    )
    return text


def normalize(text: str) -> str:
    """Normalize a piece of text for synthesis.

    fmtn-equivalent rule set (the proprietary wheel is absent from the
    snapshot; the reference's fallback is wetext+inflect,
    cli/frontend.py:124-155): grouped digits, money, years (zh digit-wise,
    en pairwise), decades, phone numbers (bare + separated), clock times,
    scores, fractions, ranges, negatives, percentages, ordinals, units,
    title abbreviations, generic number spell-out (en + zh), symbol
    expansion, whitespace cleanup."""
    zh = _has_cjk(text)
    text = text.strip()
    if not zh:
        # before comma stripping: '1,984' must stay a cardinal
        text = _en_years_decades(text)
    # strip digit-grouping commas (1,234,567)
    text = re.sub(r"(?<=\d),(?=\d{3}(?!\d))", "", text)
    text = _normalize_zh(text) if zh else _normalize_en(text)
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
