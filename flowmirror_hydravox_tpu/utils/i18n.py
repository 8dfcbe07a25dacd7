"""Bilingual (zh/en) user-facing messages (reference server/i18n.py:1-114).

`t(key, **kwargs)` returns the message in the language selected by
HYDRAVOX_LANG (default en here; the reference defaults zh)."""

from __future__ import annotations

import os

_TABLE = {
    "synth_done": {
        "en": "synthesis done: {duration:.2f}s, tps {tps:.1f}, rtf {rtf:.3f}",
        "zh": "推理完成：{duration:.2f}秒，TPS {tps:.1f}，RTF {rtf:.3f}",
    },
    "synth_failed": {"en": "synthesis failed: {error}", "zh": "语音合成失败：{error}"},
    "tts_timeout": {"en": "tts timeout", "zh": "TTS 请求超时"},
    "unknown_speaker": {
        "en": "unknown speaker '{spk}'; available: {speakers}",
        "zh": "未知说话人 '{spk}'；可选：{speakers}",
    },
    "missing_prompt_audio": {
        "en": "prompt_audio_base64 required",
        "zh": "缺少提示音频 prompt_audio_base64",
    },
    "weights_loaded": {"en": "loaded weights: {path}", "zh": "已加载模型权重：{path}"},
    "training_started": {"en": "training started: {tid}", "zh": "训练已启动：{tid}"},
    "training_running": {
        "en": "a training is already running",
        "zh": "已有训练正在运行",
    },
    "training_stopped": {"en": "training stopped", "zh": "训练已停止"},
    "training_unknown": {"en": "unknown training {tid}", "zh": "未知训练任务 {tid}"},
}


def language() -> str:
    lang = os.environ.get("HYDRAVOX_LANG", os.environ.get("HYDRAVOX_UI_LANG", "en")).lower()
    return lang if lang in ("zh", "en") else "en"


def t(key: str, **kwargs) -> str:
    entry = _TABLE.get(key)
    if not entry:
        return key
    msg = entry.get(language(), entry["en"])
    try:
        return msg.format(**kwargs)
    except Exception:
        return msg
