"""Tiny trainable VAD — the native replacement for Silero in stage 2.

The reference's stage-2 segmentation runs the external Silero VAD torch model
(scripts/preprocess/vad_processor.py:16-31), whose weights are not in this
snapshot.  This module defines a ~30k-parameter dilated-conv frame classifier
over 40-bin log-mel (25 ms window / 10 ms hop @ 16 kHz) that is trained on
synthetic speech/noise mixtures with exact activity ground truth
(train/train_vad.py; corpus from train/synth_speech.py) and shipped in-repo
(preprocess/assets/vad.npz).

Design: all-conv (no recurrence) so the whole clip classifies in ONE fused
XLA program — frame probabilities for minutes of audio in a single dispatch.
Receptive field ±(1+2+4+8+16)*2 frames ≈ 620 ms, non-causal (offline tool).
`NativeVAD` plugs into detect_speech() as `speech_prob_fn`; the energy VAD
(vad.py) remains the dependency-free fallback and the quality baseline
(tools/eval_vad.py measures both on noisy clips).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple

import numpy as np

HOP_S = 0.010  # 10 ms frame hop — matches VADConfig.hop_ms default


@dataclasses.dataclass(frozen=True)
class VADModelConfig:
    n_mels: int = 40
    channels: int = 48
    dilations: Tuple[int, ...] = (1, 2, 4, 8, 16)


def init_params(rng, cfg: VADModelConfig = VADModelConfig(), dtype=None):
    import jax
    import jax.numpy as jnp

    dtype = dtype or jnp.float32
    keys = iter(jax.random.split(rng, len(cfg.dilations) + 2))

    def w(k, *shape):
        fan_in = shape[1] * shape[2]
        return (jax.random.normal(k, shape, jnp.float32)
                * (2.0 / fan_in) ** 0.5).astype(dtype)

    convs = []
    ch_in = cfg.n_mels
    for _ in cfg.dilations:
        convs.append({"w": w(next(keys), cfg.channels, ch_in, 3),
                      "b": jnp.zeros((cfg.channels,), dtype)})
        ch_in = cfg.channels
    return {
        "convs": convs,
        "out": {"w": w(next(keys), 1, cfg.channels, 1),
                "b": jnp.zeros((1,), dtype)},
    }


def frame_logits(params, cfg: VADModelConfig, wav_16k):
    """wav (B, T) float32 @16 kHz -> per-frame speech logits (B, T//160)."""
    import jax
    import jax.numpy as jnp

    from ..utils.audio import mel_spectrogram

    mel = mel_spectrogram(wav_16k, 400, cfg.n_mels, 16000, 160, 400)  # (B,M,F)
    # per-clip mean/var norm: robust to recording level
    mu = jnp.mean(mel, axis=-1, keepdims=True)
    sd = jnp.sqrt(jnp.var(mel, axis=-1, keepdims=True) + 1e-5)
    x = (mel - mu) / sd
    for conv, d in zip(params["convs"], cfg.dilations):
        x = jax.nn.relu(jax.lax.conv_general_dilated(
            x, conv["w"], window_strides=(1,), padding=[(d, d)],
            rhs_dilation=(d,), dimension_numbers=("NCH", "OIH", "NCH"),
        ) + conv["b"][None, :, None])
    out = jax.lax.conv_general_dilated(
        x, params["out"]["w"], window_strides=(1,), padding=[(0, 0)],
        dimension_numbers=("NCH", "OIH", "NCH"),
    ) + params["out"]["b"][None, :, None]
    return out[:, 0, :]


def bce_loss(params, cfg: VADModelConfig, wavs, frame_labels):
    """Mean BCE over frames; labels (B, F) in {0,1} aligned to the 10 ms
    hop grid (truncated to the shorter of the two)."""
    import jax.numpy as jnp
    import optax

    logits = frame_logits(params, cfg, wavs)
    f = min(logits.shape[1], frame_labels.shape[1])
    loss = optax.sigmoid_binary_cross_entropy(
        logits[:, :f], frame_labels[:, :f].astype(jnp.float32))
    acc = jnp.mean(((logits[:, :f] > 0) == (frame_labels[:, :f] > 0.5)))
    return jnp.mean(loss), acc


_ASSET = os.path.join(os.path.dirname(__file__), "assets", "vad.npz")


class NativeVAD:
    """Trained-model `speech_prob_fn` for vad.detect_speech (drop-in for the
    Silero role, vad_processor.py:16-31).  Loads preprocess/assets/vad.npz
    (or `path`); raises FileNotFoundError if no weights exist."""

    def __init__(self, path: Optional[str] = None):
        import jax
        import jax.numpy as jnp

        path = path or os.environ.get("HYDRAVOX_VAD_NPZ") or _ASSET
        if not os.path.exists(path):
            raise FileNotFoundError(path)
        from ..train.checkpoint import load_params_npz

        self.cfg = VADModelConfig()
        template = init_params(jax.random.PRNGKey(0), self.cfg)
        self.params = load_params_npz(path, template)
        self._fn = jax.jit(
            lambda w: jax.nn.sigmoid(frame_logits(self.params, self.cfg, w)))

    def __call__(self, wav: np.ndarray, sr: int) -> np.ndarray:
        import jax.numpy as jnp

        wav = np.asarray(wav, np.float32).reshape(-1)
        if sr != 16000:
            from ..utils.audio import resample_linear

            wav = np.asarray(resample_linear(jnp.asarray(wav)[None], sr, 16000))[0]
        return np.asarray(self._fn(jnp.asarray(wav)[None]))[0]


def maybe_native_vad(path: Optional[str] = None) -> Optional[NativeVAD]:
    """NativeVAD if shipped/env weights exist, else None (energy fallback)."""
    try:
        return NativeVAD(path)
    except Exception:
        return None
