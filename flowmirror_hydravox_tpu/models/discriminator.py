"""GAN discriminators for vocoder training — functional JAX.

Reimplements reference `cosyvoice/hifigan/discriminator.py` (MultipleDiscriminator
= MPD + multi-resolution spectrogram discriminator) used by the HiFiGan
training wrapper (hifigan/hifigan.py:9-67):

  - MPD: multi-period discriminators (periods 2,3,5,7,11), 2D convs over the
    (T/p, p) reshaped waveform (matcha/hifigan/models.py:209-263 layout).
  - MultiResSpecDiscriminator: 2D convs over |STFT| at three resolutions
    (discriminator.py:149-230; fft 1024/2048/512, hop 120/240/50,
    win 600/1200/240).

Weight norm is folded into plain weights (training keeps them folded —
a documented simplification; the reference trains the parametrized form).
"""

from __future__ import annotations

import math
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.audio import hann_window

PERIODS = (2, 3, 5, 7, 11)
SPEC_RESOLUTIONS = ((1024, 120, 600), (2048, 240, 1200), (512, 50, 240))


def _conv2d_init(key, in_ch, out_ch, kh, kw, dtype=jnp.float32):
    fan_in = in_ch * kh * kw
    bound = 1.0 / math.sqrt(fan_in)
    k1, k2 = jax.random.split(key)
    return {
        "w": jax.random.uniform(k1, (out_ch, in_ch, kh, kw), jnp.float32, -bound, bound).astype(dtype),
        "b": jax.random.uniform(k2, (out_ch,), jnp.float32, -bound, bound).astype(dtype),
    }


def conv2d(p, x, stride=(1, 1), padding=((0, 0), (0, 0))):
    out = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=stride, padding=list(padding),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out + p["b"][None, :, None, None]


# ---------------------------------------------------------------------------
# MPD


def init_mpd_params(rng: jax.Array, dtype=jnp.float32) -> list:
    out = []
    for period in PERIODS:
        keys = iter(jax.random.split(jax.random.fold_in(rng, period), 8))
        chans = [(1, 32), (32, 128), (128, 512), (512, 1024), (1024, 1024)]
        convs = [_conv2d_init(next(keys), i, o, 5, 1, dtype) for i, o in chans]
        post = _conv2d_init(next(keys), 1024, 1, 3, 1, dtype)
        out.append({"convs": convs, "post": post})
    return out


def _mpd_one(p, x, period):
    """x: (B, 1, T). Returns (score, fmaps)."""
    b, c, t = x.shape
    pad = (-t) % period
    x = jnp.pad(x, ((0, 0), (0, 0), (0, pad)), mode="reflect")
    x = x.reshape(b, c, (t + pad) // period, period)
    fmaps = []
    for i, conv in enumerate(p["convs"]):
        stride = (3, 1) if i < len(p["convs"]) - 1 else (1, 1)
        x = conv2d(conv, x, stride=stride, padding=((2, 2), (0, 0)))
        x = jax.nn.leaky_relu(x, 0.1)
        fmaps.append(x)
    x = conv2d(p["post"], x, padding=((1, 1), (0, 0)))
    fmaps.append(x)
    return x.reshape(b, -1), fmaps


# ---------------------------------------------------------------------------
# Multi-resolution spectrogram discriminator


def init_mrd_params(rng: jax.Array, dtype=jnp.float32) -> list:
    out = []
    for i, (n_fft, hop, win) in enumerate(SPEC_RESOLUTIONS):
        keys = iter(jax.random.split(jax.random.fold_in(rng, i), 8))
        convs = [
            _conv2d_init(next(keys), 1, 32, 3, 9, dtype),
            _conv2d_init(next(keys), 32, 32, 3, 9, dtype),
            _conv2d_init(next(keys), 32, 32, 3, 9, dtype),
            _conv2d_init(next(keys), 32, 32, 3, 9, dtype),
            _conv2d_init(next(keys), 32, 32, 3, 3, dtype),
        ]
        post = _conv2d_init(next(keys), 32, 1, 3, 3, dtype)
        out.append({"convs": convs, "post": post})
    return out


def _stft_mag(x: jnp.ndarray, n_fft: int, hop: int, win: int) -> jnp.ndarray:
    """|STFT| (B, frames, freq) with centered reflect pad (losses stft)."""
    window = jnp.asarray(hann_window(win))
    t = x.shape[-1]
    x = jnp.pad(x, ((0, 0), (n_fft // 2, n_fft // 2)), mode="reflect")
    n_frames = t // hop + 1
    idx = np.arange(win)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = x[:, idx] * window[None, None, :]
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    return jnp.sqrt(jnp.clip(jnp.real(spec) ** 2 + jnp.imag(spec) ** 2, 1e-9, None))


def _mrd_one(p, x, n_fft, hop, win):
    """x: (B, 1, T). Returns (score, fmaps)."""
    mag = _stft_mag(x[:, 0], n_fft, hop, win)[:, None]  # (B,1,F_t,freq)
    fmaps = []
    h = mag
    strides = [(1, 1), (1, 2), (1, 2), (1, 2), (1, 1)]
    pads = [((1, 1), (4, 4))] * 4 + [((1, 1), (1, 1))]
    for conv, s, pd in zip(p["convs"], strides, pads):
        h = conv2d(conv, h, stride=s, padding=pd)
        h = jax.nn.leaky_relu(h, 0.1)
        fmaps.append(h)
    h = conv2d(p["post"], h, padding=((1, 1), (1, 1)))
    fmaps.append(h)
    return h.reshape(h.shape[0], -1), fmaps


# ---------------------------------------------------------------------------
# combined


def init_params(rng: jax.Array, dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(rng)
    return {"mpd": init_mpd_params(k1, dtype), "mrd": init_mrd_params(k2, dtype)}


def forward(params: dict, wav: jnp.ndarray) -> Tuple[List[jnp.ndarray], List[list]]:
    """wav: (B, T). Returns (scores per sub-discriminator, fmaps per sub)."""
    x = wav[:, None, :]
    scores, fmaps = [], []
    for p, period in zip(params["mpd"], PERIODS):
        s, f = _mpd_one(p, x, period)
        scores.append(s)
        fmaps.append(f)
    for p, (n_fft, hop, win) in zip(params["mrd"], SPEC_RESOLUTIONS):
        s, f = _mrd_one(p, x, n_fft, hop, win)
        scores.append(s)
        fmaps.append(f)
    return scores, fmaps
