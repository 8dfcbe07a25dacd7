"""MatchaTTS model: synthesise + training losses.

Reimplements reference `matcha/models/matcha_tts.py`:
  - synthesise (matcha_tts.py:74-148): encoder -> durations -> alignment path
    -> mu_y -> CFM Euler sample -> denormalized mel.
  - forward (matcha_tts.py:150-239): MAS alignment (native kernel), duration
    loss, prior loss, CFM loss.  The Grad-TTS random-segment cut is applied
    at the data layer in our pipeline (static shapes), not inside the model.
"""

from __future__ import annotations

import dataclasses
import math
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import cfm, mas
from . import decoder as unet
from . import text_encoder
from .decoder import MatchaDecoderConfig
from .text_encoder import MatchaEncoderConfig


@dataclasses.dataclass(frozen=True)
class MatchaConfig:
    encoder: MatchaEncoderConfig = MatchaEncoderConfig()
    decoder: MatchaDecoderConfig = MatchaDecoderConfig()
    n_feats: int = 80
    sigma_min: float = 1e-4
    n_timesteps: int = 10
    sample_rate: int = 22050
    hop_length: int = 256
    mel_mean: float = -5.517
    mel_std: float = 2.064
    prior_loss: bool = True


def init_params(rng: jax.Array, cfg: MatchaConfig, dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(rng)
    return {
        "encoder": text_encoder.init_params(k1, cfg.encoder, dtype),
        "decoder": unet.init_params(k2, cfg.decoder, dtype),
    }


def _generate_path_jax(durations: jnp.ndarray, t_y: int) -> jnp.ndarray:
    """durations (B, t_x) -> path (B, t_x, t_y) (utils/model.py generate_path)."""
    cum = jnp.cumsum(durations, axis=1)
    frame = jnp.arange(t_y)[None, None, :]
    upper = cum[:, :, None]
    lower = jnp.concatenate([jnp.zeros_like(cum[:, :1]), cum[:, :-1]], axis=1)[:, :, None]
    return ((frame >= lower) & (frame < upper)).astype(jnp.float32)


def synthesise(
    params: dict,
    cfg: MatchaConfig,
    rng: jax.Array,
    x: jnp.ndarray,  # (B, T) phoneme ids
    x_lengths: jnp.ndarray,
    n_timesteps: Optional[int] = None,
    temperature: float = 1.0,
    length_scale: float = 1.0,
    max_mel_len: int = 1024,
    spks: Optional[jnp.ndarray] = None,
) -> dict:
    """Text -> mel. Static output length max_mel_len (mask carries true
    length); returns dict with decoder_outputs/mel/mel_lengths."""
    n_timesteps = n_timesteps or cfg.n_timesteps
    mu_x, logw, x_mask = text_encoder.forward(params["encoder"], cfg.encoder, x, x_lengths, spks)

    w = jnp.exp(logw) * x_mask
    w_ceil = jnp.ceil(w) * length_scale
    y_lengths = jnp.clip(jnp.sum(w_ceil, axis=(1, 2)), 1, max_mel_len).astype(jnp.int32)

    durations = w_ceil[:, 0, :]
    attn = _generate_path_jax(durations, max_mel_len)  # (B, t_x, t_y)
    attn = attn * x_mask[:, 0, :, None]
    y_mask = (jnp.arange(max_mel_len)[None, :] < y_lengths[:, None]).astype(mu_x.dtype)[:, None, :]
    attn = attn * y_mask[:, 0, None, :]

    mu_y = jnp.einsum("bxt,bfx->bft", attn.astype(mu_x.dtype), mu_x)  # align text mu onto mel frames
    dec = cfm.sample(
        params["decoder"], cfg.decoder, rng, mu_y, y_mask, n_timesteps, temperature, spks
    )
    mel = dec * cfg.mel_std + cfg.mel_mean
    return {
        "encoder_outputs": mu_y,
        "decoder_outputs": dec,
        "attn": attn,
        "mel": mel,
        "mel_lengths": y_lengths,
    }


def forward_loss(
    params: dict,
    cfg: MatchaConfig,
    rng: jax.Array,
    x: jnp.ndarray,  # (B, Tx)
    x_lengths: jnp.ndarray,
    y: jnp.ndarray,  # (B, n_feats, Ty) normalized mel
    y_lengths: jnp.ndarray,
    attn: jnp.ndarray,  # (B, Tx, Ty) MAS path (precomputed host-side)
    spks: Optional[jnp.ndarray] = None,
) -> dict:
    """Duration + prior + CFM losses given a precomputed MAS path.

    MAS runs on the host (compute_alignment) between the two jitted halves,
    exactly like the reference's torch.no_grad() block — the DP is O(T^2)
    sequential and stays on CPU (native kernel)."""
    mu_x, logw, x_mask = text_encoder.forward(params["encoder"], cfg.encoder, x, x_lengths, spks)
    ty = y.shape[2]
    y_mask = (jnp.arange(ty)[None, :] < y_lengths[:, None]).astype(mu_x.dtype)[:, None, :]

    logw_ = jnp.log(1e-8 + jnp.sum(attn, axis=2))[:, None, :] * x_mask
    dur_loss = jnp.sum((logw - logw_) ** 2) / jnp.maximum(jnp.sum(x_lengths), 1)

    mu_y = jnp.einsum("bxt,bfx->bft", attn.astype(mu_x.dtype), mu_x)

    diff_loss = cfm.compute_loss(
        params["decoder"], cfg.decoder, rng, y.astype(jnp.float32), y_mask, mu_y, spks,
        sigma_min=cfg.sigma_min,
    )

    if cfg.prior_loss:
        prior = jnp.sum(
            0.5 * ((y - mu_y) ** 2 + math.log(2 * math.pi)) * y_mask
        ) / (jnp.maximum(jnp.sum(y_mask), 1.0) * cfg.n_feats)
    else:
        prior = jnp.float32(0.0)
    return {
        "dur_loss": dur_loss,
        "prior_loss": prior,
        "diff_loss": diff_loss,
        "loss": dur_loss + prior + diff_loss,
    }


def compute_alignment(
    params: dict,
    cfg: MatchaConfig,
    x: np.ndarray,
    x_lengths: np.ndarray,
    y: np.ndarray,  # (B, n_feats, Ty)
    y_lengths: np.ndarray,
    spks=None,
) -> np.ndarray:
    """Host-side MAS (matcha_tts.py:183-192): gaussian log-prior between
    encoder mu and mel frames, then the native monotonic DP."""
    mu_x, _, x_mask = text_encoder.forward(
        params["encoder"], cfg.encoder, jnp.asarray(x), jnp.asarray(x_lengths), spks
    )
    mu_x = np.asarray(mu_x, np.float32)
    y = np.asarray(y, np.float32)
    ty = y.shape[2]

    const = -0.5 * math.log(2 * math.pi) * cfg.n_feats
    factor = -0.5 * np.ones_like(mu_x)
    y_sq = np.einsum("bfx,bft->bxt", factor, y ** 2)
    y_mu = np.einsum("bfx,bft->bxt", 2.0 * factor * mu_x, y)
    mu_sq = np.sum(factor * mu_x ** 2, axis=1)[:, :, None]
    log_prior = y_sq - y_mu + mu_sq + const

    xm = np.asarray(x_mask[:, 0, :]) > 0
    ym = np.arange(ty)[None, :] < np.asarray(y_lengths)[:, None]
    attn_mask = (xm[:, :, None] & ym[:, None, :]).astype(np.float32)
    return mas.maximum_path(log_prior, attn_mask).astype(np.float32)
