"""Waveglow-style vocoder bias denoiser — functional JAX.

Reference: matcha/hifigan/denoiser.py:1-64 (itself from NVIDIA waveglow).
The HiFi-GAN generator has a deterministic "bias" — the audio it emits for an
all-zero mel.  Subtracting a small multiple of that bias magnitude spectrum
from synthesized audio (in the STFT domain, keeping the phase) removes the
metallic background artifact.

TPU-native design: one jittable program per step — STFT via static-shape
framing + rfft, spectral subtraction, inverse via irfft + overlap-add with
window-square NOLA normalization (no torch.istft; same framed-matmul style as
models/hift.py).  The bias spectrum is computed once from the vocoder
parameters and passed in as an array, so `denoise` stays a pure function.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...utils.audio import frame_signal, hann_window


def _stft(audio: jnp.ndarray, n_fft: int, hop: int, win: jnp.ndarray):
    """torch.stft(center=True) equivalent: reflect-pad n_fft//2, frame, rfft.
    audio (..., T) -> complex spec (..., n_freqs, n_frames)."""
    pad = n_fft // 2
    padded = jnp.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(pad, pad)], mode="reflect")
    frames = frame_signal(padded, n_fft, hop) * win
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    return jnp.swapaxes(spec, -1, -2)


def _istft(mag: jnp.ndarray, phase: jnp.ndarray, n_fft: int, hop: int,
           win: jnp.ndarray, length: int) -> jnp.ndarray:
    """torch.istft equivalent: irfft per frame, windowed overlap-add,
    divide by the window-square OLA envelope, trim the center padding.
    mag/phase (..., n_freqs, n_frames) -> (..., length)."""
    spec = mag * jnp.exp(1j * phase.astype(jnp.complex64))
    frames = jnp.fft.irfft(jnp.swapaxes(spec, -1, -2), n=n_fft, axis=-1)  # (..., F, n_fft)
    frames = frames * win
    n_frames = frames.shape[-2]
    total = n_fft + hop * (n_frames - 1)
    idx = (hop * np.arange(n_frames)[:, None] + np.arange(n_fft)[None, :]).reshape(-1)
    lead = frames.shape[:-2]
    flat = frames.reshape(lead + (n_frames * n_fft,))
    out = jnp.zeros(lead + (total,), frames.dtype).at[..., idx].add(flat)
    wsq = jnp.zeros((total,), win.dtype).at[idx].add(
        jnp.tile(win * win, n_frames))
    out = out / jnp.maximum(wsq, 1e-11)
    pad = n_fft // 2
    return out[..., pad:pad + length]


def make_bias_spec(
    vocoder_fn,
    n_mels: int = 80,
    filter_length: int = 1024,
    n_overlap: int = 4,
    mode: str = "zeros",
    rng: Optional[jax.Array] = None,
    mel_value: float = 0.0,
) -> jnp.ndarray:
    """Bias magnitude spectrum of a vocoder (denoiser.py:16-56).

    vocoder_fn: mel (1, n_mels, T) -> audio (1, T*hop).  mode 'zeros' feeds
    an all-`mel_value` mel (the reference uses 0.0; pass the log-mel floor,
    e.g. log(1e-5), for vocoders trained on log-clamped mels), 'normal' feeds
    unit-normal noise.  Returns (n_freqs,) = frame 0 of |STFT(bias audio)|.
    """
    if mode == "zeros":
        mel = jnp.full((1, n_mels, 88), mel_value, jnp.float32)
    elif mode == "normal":
        mel = jax.random.normal(
            rng if rng is not None else jax.random.PRNGKey(0), (1, n_mels, 88))
    else:
        raise ValueError(f"mode {mode} not supported")
    hop = filter_length // n_overlap
    bias_audio = jnp.asarray(vocoder_fn(mel), jnp.float32)  # (1, T)
    win = jnp.asarray(hann_window(filter_length))
    spec = _stft(bias_audio, filter_length, hop, win)
    return jnp.abs(spec)[0, :, 0]


def denoise(
    audio: jnp.ndarray,
    bias_spec: jnp.ndarray,
    strength: float = 0.00025,
    filter_length: int = 1024,
    n_overlap: int = 4,
) -> jnp.ndarray:
    """Subtract `strength` x bias magnitude in the STFT domain
    (denoiser.py:58-64). audio (B, T) -> (B, T); jittable."""
    audio = jnp.atleast_2d(audio)
    hop = filter_length // n_overlap
    win = jnp.asarray(hann_window(filter_length))
    spec = _stft(audio, filter_length, hop, win)
    mag = jnp.abs(spec)
    phase = jnp.angle(spec)
    mag = jnp.clip(mag - bias_spec[None, :, None] * strength, 0.0, None)
    return _istft(mag, phase, filter_length, hop, win, audio.shape[-1])
