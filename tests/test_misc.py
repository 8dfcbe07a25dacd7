"""Frontend/text/wavio/vad/i18n/tools coverage."""

import json
import subprocess
import sys

import numpy as np
import pytest

from flowmirror_hydravox_tpu.frontend import text_norm
from flowmirror_hydravox_tpu.frontend.tokenizer import ByteTokenizer
from flowmirror_hydravox_tpu.preprocess.vad import VADConfig, detect_speech
from flowmirror_hydravox_tpu.utils import i18n, wavio

pytestmark = pytest.mark.quick



def test_num_to_words_en():
    assert text_norm.num_to_words_en(0) == "zero"
    assert text_norm.num_to_words_en(42) == "forty-two"
    assert text_norm.num_to_words_en(1234) == "one thousand two hundred thirty-four"
    assert text_norm.num_to_words_en(1000000) == "one million"


def test_num_to_words_zh():
    assert text_norm.num_to_words_zh(0) == "零"
    assert text_norm.num_to_words_zh(42) == "四十二"
    assert text_norm.num_to_words_zh(10) == "十"
    assert text_norm.num_to_words_zh(10000) == "一万"


def test_normalize_mixed():
    assert "forty-two" in text_norm.normalize("The answer is 42.")
    zh = text_norm.normalize("今天气温25℃，涨了10%")
    assert "二十五" in zh and "摄氏度" in zh and "百分之" in zh


def test_normalize_zh_rules():
    """wetext-class zh rules (reference TN fallback, cli/frontend.py:124-155)."""
    assert text_norm.normalize("2024年5月1日") == "二零二四年五月一日"
    assert text_norm.normalize("现在是8:30") == "现在是八点三十分"
    assert text_norm.normalize("现在是8:05") == "现在是八点零五分"
    assert text_norm.normalize("下午3:00开会") == "下午三点整开会"
    assert text_norm.normalize("完成了3/4") == "完成了四分之三"
    assert text_norm.normalize("价格￥12.5") == "价格十二点五元"
    assert text_norm.normalize("价格$9万") == "价格九美元万" or "九美元" in text_norm.normalize("价格$9")
    assert text_norm.normalize("电话13800138000") == "电话幺三八零零幺三八零零零"
    assert text_norm.normalize("大约3~5天") == "大约三到五天"
    assert text_norm.normalize("会议2024-05-01举行") == "会议二零二四年五月一日举行"
    assert text_norm.normalize("人口1,234,567人") == "人口一百二十三万四千五百六十七人"


def test_normalize_en_rules():
    assert text_norm.normalize("It costs $5.30 now") == "It costs five dollars and thirty cents now"
    assert text_norm.normalize("He won $1") == "He won one dollar"
    assert text_norm.normalize("the 1st and 22nd item") == "the first and twenty-second item"
    assert text_norm.normalize("Meet at 8:30") == "Meet at eight thirty"
    assert text_norm.normalize("Meet at 8:05") == "Meet at eight oh five"
    assert text_norm.normalize("Meet at 8:00") == "Meet at eight o'clock"
    assert text_norm.normalize("About 1,234 people") == "About one thousand two hundred thirty-four people"


def test_normalize_en_years_units_phones():
    """wetext-class extensions past the reference's inflect fallback."""
    assert text_norm.normalize("Born in 1984") == "Born in nineteen eighty-four"
    assert text_norm.normalize("Back in 1905") == "Back in nineteen oh five"
    assert text_norm.normalize("By 1900") == "By nineteen hundred"
    assert text_norm.normalize("In 2000") == "In two thousand"
    assert text_norm.normalize("In 2005") == "In two thousand five"
    assert text_norm.normalize("In 2024") == "In twenty twenty-four"
    assert text_norm.normalize("The 1980s rocked") == "The nineteen eighties rocked"
    assert text_norm.normalize("The 90s rocked") == "The nineties rocked"
    assert (
        text_norm.normalize("Call 555-123-4567")
        == "Call five five five, one two three, four five six seven"
    )
    assert text_norm.normalize("He ran 5 km") == "He ran five kilometers"
    assert text_norm.normalize("Add 1 kg") == "Add one kilogram"
    assert text_norm.normalize("At 60 km/h") == "At sixty kilometers per hour"
    assert text_norm.normalize("Dr. Who vs. Mr. Bean") == "doctor Who versus mister Bean"
    # decimals must not trip the year rule
    assert text_norm.normalize("pi is 3.1592") == "pi is three point one five nine two"
    # review-fix edges: x00s/x10s decades, sentence-final years, grouped
    # cardinals stay cardinal, currency/ordinal/phone contexts beat the year
    assert text_norm.normalize("The 2010s were wild") == "The twenty tens were wild"
    assert text_norm.normalize("The 1900s ended") == "The nineteen hundreds ended"
    assert text_norm.normalize("Born in 1984.") == "Born in nineteen eighty-four."
    assert (text_norm.normalize("About 1,984 people")
            == "About one thousand nine hundred eighty-four people")
    assert (text_norm.normalize("It cost $1984")
            == "It cost one thousand nine hundred eighty-four dollars")
    assert (text_norm.normalize("the 1984th item")
            == "the one thousand nine hundred eighty-fourth item")
    assert (text_norm.normalize("Call 555-123-1984")
            == "Call five five five, one two three, one nine eight four")


def test_normalize_zh_scores_negatives_phones():
    assert text_norm.normalize("比分3:2获胜") == "比分三比二获胜"
    assert text_norm.normalize("气温-5℃") == "气温负五摄氏度"
    assert text_norm.normalize("下降了-3.5%") == "下降了负百分之三点五"
    assert text_norm.normalize("温度25°C") == "温度二十五摄氏度"
    assert (
        text_norm.normalize("电话138-1234-5678")
        == "电话幺三八幺二三四五六七八"
    )
    # range still wins over the negative-sign rule (ASCII and U+2212)
    assert text_norm.normalize("大约3-5天") == "大约三到五天"
    assert text_norm.normalize("大约3−5天") == "大约三到五天"


def test_split_and_merge():
    text = "第一句话说完了。第二句话也说完了！短。"
    segs = text_norm.split_text_by_punctuation(text, max_length=30, min_length=5)
    assert len(segs) >= 2
    assert "".join(segs) == text


def test_byte_tokenizer_roundtrip():
    tok = ByteTokenizer()
    s = "hello 世界 [breath] [AA1]"
    ids = tok.encode(s)
    assert tok.decode(ids) == s
    # special tokens are single ids
    assert ids.count(tok.specials["[breath]"]) == 1


def test_default_tokenizer_is_tiktoken():
    """get_tokenizer() must default to the vendored whisper-tiktoken asset
    (reference tokenizer.py:169-238), not the byte fallback."""
    from flowmirror_hydravox_tpu.frontend.tokenizer import (
        WhisperTiktokenTokenizer, get_tokenizer,
    )

    tok = get_tokenizer()
    assert isinstance(tok, WhisperTiktokenTokenizer)
    # 58,757 ranks + whisper special layout (tokenizer.py:179-198: 2+99 langs
    # +11 events +4 emotions +6 +30 +20 +1501 timestamps) + 280 CV3 specials
    assert tok.vocab_size == 60789
    s = "你好，世界 hello world [breath] [AA1] [zh][ōng]"
    ids = tok.encode(s)
    assert tok.decode(ids) == s
    # specials encode to single ids at the top of the vocab
    assert max(ids) >= 58757


def test_get_tokenizer_strict_raises(tmp_path):
    from flowmirror_hydravox_tpu.frontend.tokenizer import ByteTokenizer, get_tokenizer

    bad = tmp_path / "bad.tiktoken"
    bad.write_text("not a rank file")
    with pytest.raises(Exception):
        get_tokenizer(str(bad), strict=True)
    assert isinstance(get_tokenizer(str(bad)), ByteTokenizer)


def test_wavio_roundtrip():
    wav = (np.sin(np.linspace(0, 100, 24000)) * 0.7).astype(np.float32)
    data = wavio.encode_wav(wav, 24000)
    back, sr = wavio.decode_wav(data)
    assert sr == 24000
    np.testing.assert_allclose(back, wav, atol=1e-3)
    b64 = wavio.audio_to_base64(wav, 24000)
    back2, _ = wavio.load_audio_from_base64(b64)
    np.testing.assert_allclose(back2, wav, atol=1e-3)


def test_vad_detects_speech_island():
    sr = 16000
    rng = np.random.default_rng(0)
    quiet = rng.standard_normal(sr) * 1e-4
    loud = np.sin(2 * np.pi * 220 * np.arange(sr * 2) / sr) * 0.5
    wav = np.concatenate([quiet, loud, quiet]).astype(np.float32)
    segs = detect_speech(wav, sr, VADConfig(min_dur_s=0.3))
    assert len(segs) >= 1
    s, e = segs[0]
    assert 0.5 <= s <= 1.5 and 2.4 <= e <= 3.6


def test_i18n_languages(monkeypatch):
    monkeypatch.setenv("HYDRAVOX_LANG", "en")
    assert "timeout" in i18n.t("tts_timeout")
    monkeypatch.setenv("HYDRAVOX_LANG", "zh")
    assert "超时" in i18n.t("tts_timeout")
    assert i18n.t("nonexistent_key") == "nonexistent_key"


def test_matcha_text_pipeline():
    from flowmirror_hydravox_tpu.models.matcha import text as mt

    seq = mt.text_to_sequence("Dr. Smith has 3 cats.")
    assert len(seq) > 0
    inter = mt.intersperse(seq)
    assert len(inter) == 2 * len(seq) + 1
    assert inter[0] == 0 and inter[2] == 0


def test_data_command_builder():
    from flowmirror_hydravox_tpu.runtime.training_manager import TrainingManager

    tm = TrainingManager()
    for stage in ("1", "2", "3", "4"):
        cmd = tm.build_data_command({"stage": stage, "input_dir": "i", "output_dir": "o"})
        assert cmd[0] == sys.executable and "--input_dir" in cmd
    with pytest.raises(ValueError):
        tm.build_data_command({"stage": "9", "input_dir": "i", "output_dir": "o"})


def test_convert_ckpt_cli_roundtrip(tmp_path):
    """tools/convert_ckpt: graft-mtp on a tiny npz."""
    import jax
    import jax.numpy as jnp

    from flowmirror_hydravox_tpu.config import tiny_config
    from flowmirror_hydravox_tpu.models import llm as llm_model
    from flowmirror_hydravox_tpu.tools import convert_ckpt
    from flowmirror_hydravox_tpu.train.checkpoint import load_params_npz, save_params_npz

    cfg = tiny_config().llm
    params = llm_model.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    src = str(tmp_path / "single.npz")
    dst = str(tmp_path / "multi.npz")
    save_params_npz(src, params)
    convert_ckpt.main(["graft-mtp", "--src", src, "--dst", dst, "--tiny", "--seed", "7"])
    grafted = load_params_npz(dst, params)
    assert not np.allclose(
        np.asarray(grafted["mtp_block"]["gate_proj_w"]),
        np.asarray(params["mtp_block"]["gate_proj_w"]),
    )
    np.testing.assert_array_equal(
        np.asarray(grafted["llm_decoder"]), np.asarray(params["llm_decoder"])
    )


def test_models_admin_list_delete_guard(tmp_path, monkeypatch):
    """Model management (reference training_tab.py:826-1070): list finds
    weights files, delete works, path escapes are rejected."""
    from flowmirror_hydravox_tpu.runtime import models_admin

    root = tmp_path / "models"
    (root / "sub").mkdir(parents=True)
    (root / "a.pt").write_bytes(b"x" * 100)
    (root / "sub" / "b.npz").write_bytes(b"y" * 200)
    monkeypatch.setenv("TTS_MODEL_ROOT", str(root))

    models = models_admin.list_models()
    paths = {m["path"] for m in models}
    assert paths == {"a.pt", "sub/b.npz"}

    out = models_admin.delete_model("sub/b.npz")
    assert out["success"] and not (root / "sub" / "b.npz").exists()

    with pytest.raises(ValueError):
        models_admin.delete_model("../outside")
    assert models_admin.delete_model("missing.pt")["success"] is False


def test_data_stage5_command():
    from flowmirror_hydravox_tpu.runtime.training_manager import TrainingManager

    cmd = TrainingManager().build_data_command(
        {"stage": "5", "input_dir": "a,b", "output_dir": "o"})
    assert "flowmirror_hydravox_tpu.preprocess.merge" in cmd


def test_webui_tabs_and_i18n_parity():
    """The UI page ships all six tabs and the zh/en string tables cover the
    same keys (reference user_interface/i18n.py bilingual table)."""
    import re

    from flowmirror_hydravox_tpu.runtime.webui import INDEX_HTML

    for tab in ("tts", "zeroshot", "data", "training", "models", "speakers"):
        assert f'data-tab="{tab}"' in INDEX_HTML
    m = re.search(r"const I18N = \{\s*en: \{(.*?)\},\s*zh: \{(.*?)\}\s*\};",
                  INDEX_HTML, re.S)
    assert m, "I18N table not found"
    key_re = r"(?:^|[,{])\s*(\w+):"  # keys only, not colons inside strings
    en_keys = set(re.findall(key_re, m.group(1), re.M))
    zh_keys = set(re.findall(key_re, m.group(2), re.M))
    assert en_keys == zh_keys and len(en_keys) > 30, (
        en_keys.symmetric_difference(zh_keys))
    # every data-i18n marker resolves to a key
    for key in re.findall(r'data-i18n="(\w+)"', INDEX_HTML):
        assert key in en_keys, key


def test_training_command_model_family_mapping():
    """hift/dpo map to their own trainers (previously hift fell through to
    train_flow with incompatible args) and advanced params pass through."""
    from flowmirror_hydravox_tpu.runtime.training_manager import TrainingManager

    tm = TrainingManager()
    base = {"train_data": "ds", "output_dir": "o"}
    assert "train_hift" in " ".join(tm.build_command({**base, "model_type": "hift"}))
    assert "train_dpo" in " ".join(tm.build_command({**base, "model_type": "dpo"}))
    cmd = tm.build_command({**base, "model_type": "llm", "warmup_steps": 7,
                            "tensor_parallel": 2, "shard_optimizer": True,
                            "phoneme_aug": True, "max_steps": 11})
    joined = " ".join(cmd)
    for frag in ("--warmup_steps 7", "--tensor_parallel 2", "--shard_optimizer",
                 "--phoneme_aug", "--max_steps 11"):
        assert frag in joined, frag
    # pipeline parallelism passes through for the LLM trainer only
    cmd_pp = " ".join(tm.build_command({**base, "model_type": "llm",
                                        "pipeline_parallel": 2,
                                        "pp_microbatches": 4}))
    assert "--pipeline_parallel 2" in cmd_pp and "--pp_microbatches 4" in cmd_pp
    cmd_fp = " ".join(tm.build_command({**base, "model_type": "flow",
                                        "pipeline_parallel": 2}))
    assert "--pipeline_parallel" not in cmd_fp
    # hift must NOT receive flags its CLI lacks
    cmd_h = " ".join(tm.build_command({**base, "model_type": "hift",
                                       "model_checkpoint": "x", "epochs": 2,
                                       "warmup_steps": 5}))
    for frag in ("--model_ckpt", "--epochs", "--warmup_steps"):
        assert frag not in cmd_h, frag


def test_data_stage_param_passthrough():
    from flowmirror_hydravox_tpu.runtime.training_manager import TrainingManager

    tm = TrainingManager()
    cmd2 = " ".join(tm.build_data_command(
        {"stage": "2", "input_dir": "i", "output_dir": "o", "vad_model": "energy",
         "min_dur": 0.3, "max_dur": 8, "min_gap": 0.4}))
    for frag in ("--model energy", "--min_dur 0.3", "--max_dur 8", "--min_gap 0.4"):
        assert frag in cmd2, frag
    cmd3 = " ".join(tm.build_data_command(
        {"stage": "3", "input_dir": "i", "output_dir": "o", "num_workers": 4,
         "min_sec": 0.5, "normalize_loudness": True, "asr_module": "m.f"}))
    for frag in ("--num_workers 4", "--min_sec 0.5", "--normalize_loudness",
                 "--asr_module m.f"):
        assert frag in cmd3, frag


def test_samples_browser(tmp_path):
    """Server-side reference-sample browser (reference inference_tab.py:23-71
    scan + :308-334 load): recursive wav scan with sidecar transcripts,
    base64 load, and containment guard."""
    import base64

    from flowmirror_hydravox_tpu.runtime import samples

    root = tmp_path / "samples"
    (root / "setA" / "spk1").mkdir(parents=True)
    (root / "setA" / "spk1" / "clip1.wav").write_bytes(b"RIFFxxxx")
    (root / "setA" / "spk1" / "clip1.txt").write_text("hello prompt", encoding="utf-8")
    (root / "b.wav").write_bytes(b"RIFFyyyy")
    (root / "notes.md").write_text("ignored")

    lst = samples.list_samples(str(root))
    assert [s["path"] for s in lst] == ["b.wav", "setA/spk1/clip1.wav"]
    assert lst[1]["has_text"] and not lst[0]["has_text"]
    assert lst[1]["name"] == "setA/spk1/clip1"

    d = samples.load_sample("setA/spk1/clip1.wav", str(root))
    assert base64.b64decode(d["audio_base64"]) == b"RIFFxxxx"
    assert d["prompt_text"] == "hello prompt"
    assert samples.load_sample("b.wav", str(root))["prompt_text"] == ""

    with pytest.raises(ValueError):
        samples.load_sample("../escape.wav", str(root))
    with pytest.raises(ValueError):
        samples.load_sample("setA/missing.wav", str(root))
    # missing root directory -> empty list, not an error
    assert samples.list_samples(str(tmp_path / "nope")) == []


def test_add_speaker_from_dataset(tmp_path):
    """Mean-embedding enrollment from an HF dataset (reference
    speaker_manage.py:191-259): precomputed 'embedding' column preferred,
    'audio' fallback extracts per row; no usable column -> error."""
    import datasets

    from flowmirror_hydravox_tpu.frontend.frontend import Frontend

    fe = Frontend.__new__(Frontend)  # registry-only; no extractor weights
    fe.spk2info = {}

    embs = [np.full(192, float(i), np.float32) for i in range(3)]
    ds = datasets.Dataset.from_dict({"embedding": [e.tolist() for e in embs]})
    ds.save_to_disk(str(tmp_path / "emb_ds"))
    n = Frontend.add_speaker_from_dataset(fe, "ds_spk", str(tmp_path / "emb_ds"))
    assert n == 3
    np.testing.assert_allclose(fe.spk2info["ds_spk"].embedding, np.full(192, 1.0))

    ds_audio = datasets.Dataset.from_dict({"audio": [
        {"array": np.ones(160, np.float32) * 0.1, "sampling_rate": 16000},
        {"array": np.ones(160, np.float32) * 0.2, "sampling_rate": 16000},
    ]})
    ds_audio.save_to_disk(str(tmp_path / "audio_ds"))
    fe.extract_spk_embedding = lambda wav, sr: np.full(192, float(wav[0]), np.float32)
    n = Frontend.add_speaker_from_dataset(fe, "au_spk", str(tmp_path / "audio_ds"))
    assert n == 2
    np.testing.assert_allclose(
        fe.spk2info["au_spk"].embedding, np.full(192, 0.15), rtol=1e-5)

    ds_bad = datasets.Dataset.from_dict({"text": ["x"]})
    ds_bad.save_to_disk(str(tmp_path / "bad_ds"))
    with pytest.raises(ValueError):
        Frontend.add_speaker_from_dataset(fe, "bad", str(tmp_path / "bad_ds"))


def test_shipped_demo_samples_regenerable():
    """The shipped demo sample set (assets/samples/, reference analog of the
    repo's demo prompt sets) is complete, transcribed, and deterministically
    regenerable from tools/make_demo_samples."""
    import os

    import flowmirror_hydravox_tpu
    from flowmirror_hydravox_tpu.runtime import samples
    from flowmirror_hydravox_tpu.tools.make_demo_samples import generate

    root = os.path.join(os.path.dirname(os.path.dirname(
        flowmirror_hydravox_tpu.__file__)), "assets", "samples")
    lst = samples.list_samples(root)
    assert len(lst) >= 4 and all(s["has_text"] for s in lst)
    d = samples.load_sample(lst[0]["path"], root)
    assert d["prompt_text"]

    with __import__("tempfile").TemporaryDirectory() as td:
        regen = generate(td)
        rel = os.path.relpath(regen[0], td)
        with open(os.path.join(td, rel), "rb") as f1, \
             open(os.path.join(root, rel), "rb") as f2:
            assert f1.read() == f2.read()
