"""Matcha-TTS text encoder + duration predictor — functional JAX.

Reimplements reference `matcha/models/components/text_encoder.py`:
  - embedding * sqrt(C), ConvReluNorm prenet (3x conv k5 + channel LayerNorm
    + relu, zero-init residual proj) (text_encoder.py:36-67)
  - 6-layer post-norm transformer: MHA + channel-LN + conv FFN (k3) + LN
    (text_encoder.py:280-330).  NOTE the reference's rotary embedding is a
    no-op by construction (its RotaryPositionalEmbeddings receives (b,h,t,d)
    but indexes positions along the *batch* axis — labml layout mismatch —
    so q and k at matching positions get identical rotations which cancel in
    the dot product).  We therefore implement plain dot-product attention;
    numerically equivalent for all batch sizes.
  - proj_m -> mu (n_feats), detached DurationPredictor (2x conv+LN) -> logw
    (text_encoder.py:70-96, 390-410).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..dit import _conv_init, conv1d


@dataclasses.dataclass(frozen=True)
class MatchaEncoderConfig:
    n_vocab: int = 178
    n_feats: int = 80
    n_channels: int = 192
    filter_channels: int = 768
    filter_channels_dp: int = 256
    n_heads: int = 2
    n_layers: int = 6
    kernel_size: int = 3
    dp_kernel_size: int = 3
    prenet: bool = True
    n_spks: int = 1
    spk_emb_dim: int = 64


def channel_layer_norm(x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray,
                       eps: float = 1e-4) -> jnp.ndarray:
    """LayerNorm over the channel axis of (B, C, T) (text_encoder.py:15-33)."""
    mean = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=1, keepdims=True)
    x = (x - mean) * jax.lax.rsqrt(var + eps)
    return x * gamma[None, :, None] + beta[None, :, None]


def init_params(rng: jax.Array, cfg: MatchaEncoderConfig, dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(rng, 16 + cfg.n_layers * 8))
    c = cfg.n_channels

    def conv(in_c, out_c, k):
        return _conv_init(next(keys), in_c, out_c, k, 1, dtype)

    def ln(ch):
        return {"g": jnp.ones((ch,), dtype), "b": jnp.zeros((ch,), dtype)}

    emb = (jax.random.normal(next(keys), (cfg.n_vocab, c), jnp.float32) * c ** -0.5).astype(dtype)

    prenet = {
        "convs": [conv(c, c, 5) for _ in range(3)],
        "norms": [ln(c) for _ in range(3)],
        "proj": {"w": jnp.zeros((c, c, 1), dtype), "b": jnp.zeros((c,), dtype)},
    }

    layers = []
    for _ in range(cfg.n_layers):
        layers.append({
            "q": conv(c, c, 1), "k": conv(c, c, 1), "v": conv(c, c, 1),
            "o": conv(c, c, 1),
            "ln1": ln(c),
            "ff1": conv(c, cfg.filter_channels, cfg.kernel_size),
            "ff2": conv(cfg.filter_channels, c, cfg.kernel_size),
            "ln2": ln(c),
        })

    dp = {
        "conv1": conv(c, cfg.filter_channels_dp, cfg.dp_kernel_size),
        "ln1": ln(cfg.filter_channels_dp),
        "conv2": conv(cfg.filter_channels_dp, cfg.filter_channels_dp, cfg.dp_kernel_size),
        "ln2": ln(cfg.filter_channels_dp),
        "proj": conv(cfg.filter_channels_dp, 1, 1),
    }

    params = {
        "emb": emb,
        "prenet": prenet,
        "layers": layers,
        "proj_m": conv(c, cfg.n_feats, 1),
        "dp": dp,
    }
    if cfg.n_spks > 1:
        params["spk_emb"] = (
            jax.random.normal(next(keys), (cfg.n_spks, cfg.spk_emb_dim), jnp.float32) * 0.02
        ).astype(dtype)
    return params


def _conv_same(p, x):
    k = p["w"].shape[-1]
    return conv1d(p, x, padding=[(k // 2, k // 2)])


def _prenet(p, x, mask):
    org = x
    for conv_p, norm in zip(p["convs"], p["norms"]):
        x = _conv_same(conv_p, x * mask)
        x = channel_layer_norm(x, norm["g"], norm["b"])
        x = jax.nn.relu(x)
    return (org + conv1d(p["proj"], x)) * mask


def _attention(layer, x, mask, n_heads):
    """Self-attention over (B, C, T); attn_mask (B, T, T) bool."""
    b, c, t = x.shape
    q = conv1d(layer["q"], x)
    k = conv1d(layer["k"], x)
    v = conv1d(layer["v"], x)
    hd = c // n_heads
    qh = q.reshape(b, n_heads, hd, t)
    kh = k.reshape(b, n_heads, hd, t)
    vh = v.reshape(b, n_heads, hd, t)
    scores = jnp.einsum("bhct,bhcs->bhts", qh, kh) / math.sqrt(hd)
    scores = jnp.where(mask[:, None, :, :], scores, -1e4)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
    out = jnp.einsum("bhts,bhcs->bhct", probs, vh).reshape(b, c, t)
    return conv1d(layer["o"], out)


def forward(
    params: dict,
    cfg: MatchaEncoderConfig,
    x: jnp.ndarray,  # (B, T) int32 phoneme ids
    x_lengths: jnp.ndarray,  # (B,)
    spks: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (mu (B, n_feats, T), logw (B, 1, T), x_mask (B, 1, T))."""
    b, t = x.shape
    h = jnp.take(params["emb"], jnp.clip(x, 0), axis=0) * math.sqrt(cfg.n_channels)
    h = jnp.swapaxes(h, 1, 2)  # (B, C, T)
    mask = (jnp.arange(t)[None, :] < x_lengths[:, None]).astype(h.dtype)[:, None, :]

    if cfg.prenet:
        h = _prenet(params["prenet"], h, mask)

    attn_mask = (mask[:, 0, :, None] * mask[:, 0, None, :]) > 0  # (B, T, T)
    for layer in params["layers"]:
        h = h * mask
        y = _attention(layer, h, attn_mask, cfg.n_heads)
        h = channel_layer_norm(h + y, layer["ln1"]["g"], layer["ln1"]["b"])
        y = _conv_same(layer["ff1"], h * mask)
        y = _conv_same(layer["ff2"], jax.nn.relu(y) * mask)
        h = channel_layer_norm(h + y, layer["ln2"]["g"], layer["ln2"]["b"])
    h = h * mask

    mu = conv1d(params["proj_m"], h) * mask

    hd = jax.lax.stop_gradient(h)
    dp = params["dp"]
    w = _conv_same(dp["conv1"], hd * mask)
    w = channel_layer_norm(jax.nn.relu(w), dp["ln1"]["g"], dp["ln1"]["b"])
    w = _conv_same(dp["conv2"], w * mask)
    w = channel_layer_norm(jax.nn.relu(w), dp["ln2"]["g"], dp["ln2"]["b"])
    logw = conv1d(dp["proj"], w * mask) * mask
    return mu, logw, mask
