"""Phoneme-substitution augmentation (reference
train_llm_pretrain.py:86-195 semantics) with injected lexicons."""

import numpy as np
import pytest

from flowmirror_hydravox_tpu.frontend.tokenizer import SPECIAL_TOKENS, get_tokenizer
from flowmirror_hydravox_tpu.train.phoneme_aug import (
    PhonemeAugmenter, numeric_pinyin_to_tone_final,
)

pytestmark = pytest.mark.quick

CMU = {
    "hello": ["HH", "AH0", "L", "OW1"],
    "world": ["W", "ER1", "L", "D"],
}
PINYIN = {"中": "zhong1", "国": "guo2", "好": "hao3"}


def test_tone_mark_conversion():
    assert numeric_pinyin_to_tone_final("zhong1") == ("zh", "ōng")
    assert numeric_pinyin_to_tone_final("guo2") == ("g", "uó")
    assert numeric_pinyin_to_tone_final("hao3") == ("h", "ǎo")
    assert numeric_pinyin_to_tone_final("er2") == ("", "ér")
    assert numeric_pinyin_to_tone_final("lv4") == ("l", "ǜ")
    assert numeric_pinyin_to_tone_final("liu2") == ("l", "iú")


def test_en_substitution_replaces_word_with_specials():
    aug = PhonemeAugmenter(SPECIAL_TOKENS, cmu_lexicon=CMU, pinyin_lexicon=PINYIN, seed=0)
    out = aug("hello there")
    assert "hello" not in out
    assert " [HH][AH0][L][OW1] " in out
    assert "there" in out  # unknown word left alone


def test_zh_substitution_when_no_english():
    aug = PhonemeAugmenter(SPECIAL_TOKENS, cmu_lexicon=CMU, pinyin_lexicon=PINYIN, seed=1)
    out = aug("中国好")
    # two of the three characters replaced with [initial][final] specials
    assert out != "中国好"
    assert out.count("[") >= 2
    for tok in ("[zh]", "[g]", "[h]"):
        if tok in out:
            break
    else:
        raise AssertionError(out)


def test_en_priority_over_zh():
    """zh pass only runs when the en pass changed nothing
    (train_speech_model.py:556-559)."""
    aug = PhonemeAugmenter(SPECIAL_TOKENS, cmu_lexicon=CMU, pinyin_lexicon=PINYIN, seed=2)
    out = aug("hello 中国")
    assert "[HH]" in out and "中国" in out


def test_substituted_ids_are_tokenizer_specials():
    tok = get_tokenizer()
    aug = PhonemeAugmenter(SPECIAL_TOKENS, cmu_lexicon=CMU, pinyin_lexicon=PINYIN, seed=0)
    ids = tok.encode(aug("hello"))
    specials = {tok.encode(t)[0] for t in ("[HH]", "[AH0]", "[L]", "[OW1]")}
    assert specials.issubset(set(ids))
    # each special is a single id above the rank vocab
    assert all(i >= 58757 for i in specials)


def test_unknown_tokens_never_emitted():
    """Phones not in the special inventory are dropped, not emitted raw."""
    aug = PhonemeAugmenter(
        SPECIAL_TOKENS, cmu_lexicon={"xyzzy": ["QQ", "ZZ9"]}, pinyin_lexicon={}, seed=0
    )
    assert aug("xyzzy") == "xyzzy"


def test_collator_integration():
    from flowmirror_hydravox_tpu.train.data import LLMCollator

    tok = get_tokenizer()
    aug = PhonemeAugmenter(SPECIAL_TOKENS, cmu_lexicon=CMU, pinyin_lexicon=PINYIN, seed=0)
    coll = LLMCollator(tok, phoneme_aug=aug, normalize_text=False,
                       text_buckets=(32,), speech_buckets=(32,))
    rows = [{"text": "hello", "speech_token": list(range(10))}]
    batch = coll(rows)
    hh = tok.encode("[HH]")[0]
    assert hh in batch["text_token"][0]
