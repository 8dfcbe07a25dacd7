"""WAV encode/decode with the stdlib (no torchaudio/soundfile dependency).

Serving boundary I/O: 16-bit PCM WAV <-> float32 [-1, 1] numpy arrays
(replaces reference torchaudio.load/save at infer_speech_model.py:459-521)."""

from __future__ import annotations

import base64
import io
import struct
import wave
from typing import Tuple

import numpy as np


def encode_wav(audio: np.ndarray, sample_rate: int) -> bytes:
    """audio: (T,) or (C, T) float in [-1, 1] -> 16-bit PCM WAV bytes."""
    audio = np.asarray(audio)
    if audio.ndim == 2:
        audio = audio.mean(axis=0)
    pcm = np.clip(audio, -1.0, 1.0)
    pcm16 = (pcm * 32767.0).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm16.tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> Tuple[np.ndarray, int]:
    """WAV bytes -> ((T,) float32 mono, sample_rate). Handles 16/24/32-bit PCM
    and 32-bit float; stereo is averaged to mono."""
    with wave.open(io.BytesIO(data), "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        ch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(n)
    if width == 2:
        x = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, np.int32).astype(np.float32) / 2147483648.0
    elif width == 3:
        b = np.frombuffer(raw, np.uint8).reshape(-1, 3)
        x = (
            (b[:, 0].astype(np.int32) | (b[:, 1].astype(np.int32) << 8)
             | (b[:, 2].astype(np.int32) << 16)) << 8
        ).astype(np.int32).astype(np.float32) / 2147483648.0
    elif width == 1:
        x = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported sample width {width}")
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return x, sr


def audio_to_base64(audio: np.ndarray, sample_rate: int) -> str:
    return base64.b64encode(encode_wav(audio, sample_rate)).decode("utf-8")


def load_audio_from_base64(audio_base64: str) -> Tuple[np.ndarray, int]:
    return decode_wav(base64.b64decode(audio_base64))
