"""Audio featurization in numpy/JAX — native replacement for librosa/torchaudio.

Implements:
  - Slaney-scale mel filterbank identical to `librosa.filters.mel`
    (used by reference scripts/preprocess/audio.py:53 and matcha/utils/audio.py).
  - STFT via framing + rfft (jnp) with the reference's padding conventions.
  - `mel_spectrogram`: the 24 kHz 80-bin mel (n_fft 1920, hop 480, win 1920,
    reflect-pad, center=False, log-clamp 1e-5) fed to flow/hift
    (reference train_speech_model.py:507).
  - `whisper_log_mel`: the 128-bin 16 kHz whisper log-mel feeding the speech
    tokenizer (reference cli/frontend.py:92-104 via whisper.log_mel_spectrogram).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax.numpy as jnp
import numpy as np


def hz_to_mel_slaney(freq):
    freq = np.asarray(freq, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (freq - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = freq >= min_log_hz
    mels = np.where(log_region, min_log_mel + np.log(np.maximum(freq, 1e-10) / min_log_hz) / logstep, mels)
    return mels


def mel_to_hz_slaney(mels):
    mels = np.asarray(mels, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = mels >= min_log_mel
    freqs = np.where(log_region, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs)
    return freqs


@functools.lru_cache(maxsize=16)
def mel_filterbank(
    sr: int, n_fft: int, n_mels: int, fmin: float = 0.0, fmax: Optional[float] = None,
    htk: bool = False,
) -> np.ndarray:
    """Triangular mel filterbank, (n_mels, n_fft//2 + 1).

    htk=False: Slaney scale + normalization, matching
    librosa.filters.mel(sr, n_fft, n_mels, fmin, fmax) defaults.
    htk=True: HTK mel scale, unnormalized (kaldi-fbank style).
    """
    if fmax is None:
        fmax = sr / 2.0
    n_freqs = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sr / 2.0, n_freqs)
    if htk:
        def to_mel(f):
            return 1127.0 * np.log(1.0 + np.asarray(f, np.float64) / 700.0)

        def to_hz(m):
            return 700.0 * (np.exp(np.asarray(m, np.float64) / 1127.0) - 1.0)

        mel_pts = np.linspace(to_mel(fmin), to_mel(fmax), n_mels + 2)
        hz_pts = to_hz(mel_pts)
    else:
        mel_pts = np.linspace(hz_to_mel_slaney(fmin), hz_to_mel_slaney(fmax), n_mels + 2)
        hz_pts = mel_to_hz_slaney(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    if not htk:
        # Slaney normalization: scale each filter to ~constant energy per channel.
        enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
        weights = weights * enorm[:, None]
    return weights.astype(np.float32)


def hann_window(win_size: int, periodic: bool = True) -> np.ndarray:
    """torch.hann_window equivalent (periodic=True by default)."""
    n = win_size if periodic else win_size - 1
    k = np.arange(win_size)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * k / n)).astype(np.float32)


def frame_signal(y: jnp.ndarray, frame_len: int, hop: int) -> jnp.ndarray:
    """(..., T) -> (..., n_frames, frame_len) with static shapes."""
    t = y.shape[-1]
    n_frames = 1 + (t - frame_len) // hop
    idx = np.arange(frame_len)[None, :] + hop * np.arange(n_frames)[:, None]
    return y[..., idx]


def stft_magnitude(
    y: jnp.ndarray, n_fft: int, hop: int, win_size: int, window: np.ndarray
) -> jnp.ndarray:
    """|STFT| of (..., T) -> (..., n_freqs, n_frames). Assumes pre-padded input,
    center=False (matches reference audio.py:62-76 with center=False)."""
    frames = frame_signal(y, win_size, hop) * window[None, :]
    if win_size < n_fft:
        pad = [(0, 0)] * (frames.ndim - 1) + [(0, n_fft - win_size)]
        frames = jnp.pad(frames, pad)
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    mag = jnp.sqrt(jnp.real(spec) ** 2 + jnp.imag(spec) ** 2 + 1e-9)
    return jnp.swapaxes(mag, -1, -2)


def mel_spectrogram(
    y: jnp.ndarray,
    n_fft: int = 1920,
    num_mels: int = 80,
    sampling_rate: int = 24000,
    hop_size: int = 480,
    win_size: int = 1920,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
) -> jnp.ndarray:
    """Log-mel matching reference scripts/preprocess/audio.py:45-82.

    y: (B, T) float waveform in [-1, 1]. Returns (B, num_mels, n_frames).
    """
    pad = (n_fft - hop_size) // 2
    y = jnp.pad(y, [(0, 0), (pad, pad)], mode="reflect")
    mag = stft_magnitude(y, n_fft, hop_size, win_size, hann_window(win_size))
    mel_fb = jnp.asarray(mel_filterbank(sampling_rate, n_fft, num_mels, fmin, fmax))
    mel = jnp.einsum("mf,...ft->...mt", mel_fb, mag)
    return jnp.log(jnp.clip(mel, 1e-5, None))


def whisper_log_mel(y: jnp.ndarray, n_mels: int = 128, sample_rate: int = 16000) -> jnp.ndarray:
    """Whisper-style log-mel (n_fft 400, hop 160, centered reflect pad),
    feeding the speech tokenizer (reference cli/frontend.py:92-104).

    y: (B, T) 16 kHz waveform. Returns (B, n_mels, T//160).
    """
    n_fft, hop = 400, 160
    t = y.shape[-1]
    y = jnp.pad(y, [(0, 0), (n_fft // 2, n_fft // 2)], mode="reflect")
    window = hann_window(n_fft)
    frames = frame_signal(y, n_fft, hop)
    # whisper drops the last frame (stft(center=True)[..., :-1])
    n_keep = t // hop
    frames = frames[..., :n_keep, :] * window[None, :]
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    power = jnp.swapaxes(power, -1, -2)
    mel_fb = jnp.asarray(mel_filterbank(sample_rate, n_fft, n_mels))
    mel = jnp.einsum("mf,...ft->...mt", mel_fb, power)
    log_spec = jnp.log10(jnp.clip(mel, 1e-10, None))
    log_spec = jnp.maximum(log_spec, jnp.max(log_spec, axis=(-2, -1), keepdims=True) - 8.0)
    return (log_spec + 4.0) / 4.0


def kaldi_fbank(y: jnp.ndarray, sample_rate: int = 16000, num_mels: int = 80) -> jnp.ndarray:
    """Kaldi-style log-mel fbank feeding the campplus speaker model
    (reference cli/frontend.py:105-116 uses torchaudio kaldi.fbank):
    25 ms / 10 ms frames, snip-edges, DC removal, povey window, HTK mel.

    y: (T,) 16 kHz waveform in [-1, 1]. Returns (n_frames, num_mels).
    Close-but-not-bit-exact to torchaudio's kaldi.fbank (documented delta:
    no dither, HTK mel instead of kaldi's; irrelevant until the opaque
    campplus graph itself is available)."""
    frame_len = int(sample_rate * 0.025)
    hop = int(sample_rate * 0.010)
    y = jnp.asarray(y, jnp.float32).reshape(-1) * 32768.0  # kaldi int16 scale
    n_frames = max(1 + (y.shape[0] - frame_len) // hop, 1)
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(frame_len)[None, :]
    frames = y[jnp.clip(idx, 0, y.shape[0] - 1)]
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)  # remove_dc
    hann = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(frame_len) / (frame_len - 1))
    povey = jnp.asarray(hann ** 0.85, jnp.float32)
    n_fft = 1 << (frame_len - 1).bit_length()
    spec = jnp.fft.rfft(frames * povey[None, :], n=n_fft, axis=-1)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    # HTK mel banks, kaldi default low 20 Hz
    mel_fb = jnp.asarray(
        mel_filterbank(sample_rate, n_fft, num_mels, fmin=20.0, htk=True)
    )
    mel = power @ mel_fb.T
    return jnp.log(jnp.clip(mel, 1e-10, None))


def resample_linear(y: jnp.ndarray, orig_sr: int, target_sr: int) -> jnp.ndarray:
    """Lightweight linear-interpolation resampler for frontend prompts.

    (The reference uses torchaudio kaldi-style resampling at the data layer;
    serving-path prompt resampling fidelity is dominated by the tokenizer, so
    linear interpolation is an acceptable boundary op.)
    """
    if orig_sr == target_sr:
        return y
    t = y.shape[-1]
    n_out = int(round(t * target_sr / orig_sr))
    src_pos = jnp.arange(n_out) * (orig_sr / target_sr)
    lo = jnp.clip(jnp.floor(src_pos).astype(jnp.int32), 0, t - 1)
    hi = jnp.clip(lo + 1, 0, t - 1)
    w = (src_pos - lo).astype(y.dtype)
    return y[..., lo] * (1 - w) + y[..., hi] * w
