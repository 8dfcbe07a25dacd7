"""WeNet-lineage conformer encoder package — functional JAX.

Reimplements the reference `cosyvoice/transformer/` pieces needed by the
CV1/CV2 model generations (SURVEY §2.6):

  - Espnet relative positional encoding + rel-pos multi-head attention
    (embedding.py:201-302, attention.py:200-330).  Instead of the torch
    rel_shift trick we gather the (2T-1)-length relative projection with an
    explicit (T, T) index map — same O(T^2 H D) cost, shape-static.
  - ConformerEncoderLayer (encoder_layer.py:109-236): macaron FF (0.5x) ->
    rel-pos MHA -> conv module -> FF (0.5x) -> final LayerNorm.
  - ConvolutionModule (convolution.py): pointwise->GLU->depthwise(k=15)->
    LayerNorm->swish->pointwise, optional causal left padding.
  - LinearNoSubsampling input layer (subsampling.py).
  - ConformerEncoder (encoder.py:387) and UpsampleConformerEncoder
    (upsample_encoder.py:106: pre-lookahead -> N blocks -> 2x nearest
    upsample conv -> 4 blocks) with static-chunk streaming masks.
  - InterpolateRegulator (length_regulator.py:21-70) for the CV1 flow.

Dropout: rng-threaded through every block via `dropout_rng`/`drop_rng`
(train path; the default `dropout_rng=None` is the deterministic inference
path) — matching the reference's 0.1 train-time defaults
(encoder_layer.py:151-170).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .dit import _conv_init, _linear_init, conv1d, dropout, linear


@dataclasses.dataclass(frozen=True)
class ConformerConfig:
    input_size: int = 512
    output_size: int = 512
    attention_heads: int = 8
    linear_units: int = 2048
    num_blocks: int = 6
    num_up_blocks: int = 4  # UpsampleConformerEncoder second stage
    cnn_module_kernel: int = 15
    macaron_style: bool = True
    use_cnn_module: bool = True
    static_chunk_size: int = 25  # token-rate chunks for streaming
    pre_lookahead_len: int = 3
    causal_cnn: bool = False
    max_len: int = 8192


# ---------------------------------------------------------------------------
# espnet relative positional encoding


def espnet_rel_pos(t: int, d_model: int) -> np.ndarray:
    """pe spanning relative positions [T-1 ... -(T-1)], (2T-1, D)
    (embedding.py:224-255)."""
    pos = np.arange(t, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float64) * -(math.log(10000.0) / d_model))
    pe_pos = np.zeros((t, d_model))
    pe_pos[:, 0::2] = np.sin(pos * div)
    pe_pos[:, 1::2] = np.cos(pos * div)
    pe_neg = np.zeros((t, d_model))
    pe_neg[:, 0::2] = np.sin(-pos * div)
    pe_neg[:, 1::2] = np.cos(-pos * div)
    return np.concatenate([pe_pos[::-1], pe_neg[1:]], axis=0).astype(np.float32)


# ---------------------------------------------------------------------------
# init


def _layer_init(keys, cfg: ConformerConfig, dtype):
    d, h = cfg.output_size, cfg.attention_heads
    dk = d // h
    layer = {
        "norm_mha": _ln(d, dtype),
        "attn_q": _linear_init(next(keys), d, d, dtype),
        "attn_k": _linear_init(next(keys), d, d, dtype),
        "attn_v": _linear_init(next(keys), d, d, dtype),
        "attn_out": _linear_init(next(keys), d, d, dtype),
        "linear_pos": {"w": _linear_init(next(keys), d, d, dtype)["w"]},  # no bias
        "pos_bias_u": (jax.random.normal(next(keys), (h, dk), jnp.float32) * 0.02).astype(dtype),
        "pos_bias_v": (jax.random.normal(next(keys), (h, dk), jnp.float32) * 0.02).astype(dtype),
        "norm_ff": _ln(d, dtype),
        "ff_in": _linear_init(next(keys), d, cfg.linear_units, dtype),
        "ff_out": _linear_init(next(keys), cfg.linear_units, d, dtype),
    }
    if cfg.macaron_style:
        layer["norm_ff_macaron"] = _ln(d, dtype)
        layer["ff_mac_in"] = _linear_init(next(keys), d, cfg.linear_units, dtype)
        layer["ff_mac_out"] = _linear_init(next(keys), cfg.linear_units, d, dtype)
    if cfg.use_cnn_module:
        layer["norm_conv"] = _ln(d, dtype)
        layer["norm_final"] = _ln(d, dtype)
        layer["conv_pw1"] = _conv_init(next(keys), d, 2 * d, 1, 1, dtype)
        layer["conv_dw"] = _conv_init(next(keys), d, d, cfg.cnn_module_kernel, d, dtype)
        layer["conv_ln"] = _ln(d, dtype)
        layer["conv_pw2"] = _conv_init(next(keys), d, d, 1, 1, dtype)
    return layer


def _ln(d, dtype):
    return {"g": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)}


def init_encoder_params(rng: jax.Array, cfg: ConformerConfig, n_blocks: int,
                        dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(rng, 4 + n_blocks * 16))
    return {
        "embed_linear": _linear_init(next(keys), cfg.input_size, cfg.output_size, dtype),
        "embed_norm": _ln(cfg.output_size, dtype),
        "layers": [_layer_init(keys, cfg, dtype) for _ in range(n_blocks)],
        "after_norm": _ln(cfg.output_size, dtype),
    }


def init_upsample_encoder_params(rng: jax.Array, cfg: ConformerConfig,
                                 dtype=jnp.float32) -> dict:
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    base = init_encoder_params(k1, cfg, cfg.num_blocks, dtype)
    up = init_encoder_params(k2, cfg, cfg.num_up_blocks, dtype)
    d = cfg.output_size
    return {
        "embed_linear": base["embed_linear"],
        "embed_norm": base["embed_norm"],
        "pre_lookahead_conv1": _conv_init(k3, d, d, cfg.pre_lookahead_len + 1, 1, dtype),
        "pre_lookahead_conv2": _conv_init(k4, d, d, 3, 1, dtype),
        "layers": base["layers"],
        "up_conv": _conv_init(jax.random.fold_in(rng, 7), d, d, 5, 1, dtype),
        "up_embed_linear": up["embed_linear"],
        "up_embed_norm": up["embed_norm"],
        "up_layers": up["layers"],
        "after_norm": base["after_norm"],
    }


# ---------------------------------------------------------------------------
# pieces


def _layer_norm(x, p, eps=1e-12):
    dt = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean((x32 - mean) ** 2, axis=-1, keepdims=True)
    return (((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(dt)) * p["g"] + p["b"]


def _rel_attention(layer, x, pos_proj, attn_mask, heads):
    """Rel-pos MHA (attention.py:248-330). x: (B, T, D); pos_proj: (2T-1, H, Dk)
    precomputed linear_pos(pe); attn_mask: (B, T, T) bool."""
    b, t, d = x.shape
    dk = d // heads
    q = linear(layer["attn_q"], x).reshape(b, t, heads, dk)
    k = linear(layer["attn_k"], x).reshape(b, t, heads, dk)
    v = linear(layer["attn_v"], x).reshape(b, t, heads, dk)

    qu = q + layer["pos_bias_u"][None, None]
    qv = q + layer["pos_bias_v"][None, None]
    ac = jnp.einsum("bthd,bshd->bhts", qu, k)
    # bd[i, j] = qv_i . P[(T-1) - (i - j)]
    qp = jnp.einsum("bthd,rhd->bhtr", qv, pos_proj)  # (B, H, T, 2T-1)
    idx = (t - 1) - (jnp.arange(t)[:, None] - jnp.arange(t)[None, :])  # (T, T)
    bd = jnp.take_along_axis(qp, jnp.broadcast_to(idx, (b, heads, t, t)), axis=-1)
    scores = (ac + bd).astype(jnp.float32) / math.sqrt(dk)
    scores = jnp.where(attn_mask[:, None, :, :], scores, -1e10)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhts,bshd->bthd", probs, v).reshape(b, t, d)
    return linear(layer["attn_out"], out)


def _conv_module(layer, x, pad_mask, kernel: int, causal: bool):
    """ConvolutionModule (convolution.py): x (B, T, D); pad_mask (B, T) bool."""
    h = jnp.swapaxes(x * pad_mask[..., None].astype(x.dtype), 1, 2)  # (B, D, T)
    h = conv1d(layer["conv_pw1"], h)
    a, g = jnp.split(h, 2, axis=1)
    h = a * jax.nn.sigmoid(g)  # GLU
    if causal:
        h = jnp.pad(h, ((0, 0), (0, 0), (kernel - 1, 0)))
        h = conv1d(layer["conv_dw"], h, groups=h.shape[1])
    else:
        p = (kernel - 1) // 2
        h = conv1d(layer["conv_dw"], h, groups=h.shape[1], padding=[(p, p)])
    h = jnp.swapaxes(h, 1, 2)
    h = _layer_norm(h, layer["conv_ln"])  # cosyvoice uses layer_norm cnn norm
    h = h * jax.nn.sigmoid(h)  # swish
    h = jnp.swapaxes(h, 1, 2)
    h = conv1d(layer["conv_pw2"], h)
    return jnp.swapaxes(h, 1, 2)


def _ff(x, w_in, w_out):
    return linear(w_out, jax.nn.silu(linear(w_in, x)))  # swish activation


def _conformer_layer(layer, x, pos_proj, attn_mask, pad_mask, cfg: ConformerConfig,
                     drop_rate: float = 0.0, drop_rng=None):
    """encoder_layer.py:160-236 order (normalize_before=True); each sub-module
    output passes train-time dropout before the residual add
    (encoder_layer.py self.dropout, rate 0.1)."""
    ks = [None] * 4
    if drop_rng is not None:
        ks = list(jax.random.split(drop_rng, 4))
    if cfg.macaron_style:
        res = x
        h = _layer_norm(x, layer["norm_ff_macaron"])
        x = res + 0.5 * dropout(_ff(h, layer["ff_mac_in"], layer["ff_mac_out"]),
                                drop_rate, ks[0])
    res = x
    h = _layer_norm(x, layer["norm_mha"])
    x = res + dropout(
        _rel_attention(layer, h, pos_proj, attn_mask, cfg.attention_heads),
        drop_rate, ks[1])
    if cfg.use_cnn_module:
        res = x
        h = _layer_norm(x, layer["norm_conv"])
        x = res + dropout(
            _conv_module(layer, h, pad_mask, cfg.cnn_module_kernel, cfg.causal_cnn),
            drop_rate, ks[2])
    res = x
    h = _layer_norm(x, layer["norm_ff"])
    ff_scale = 0.5 if cfg.macaron_style else 1.0
    x = res + ff_scale * dropout(_ff(h, layer["ff_in"], layer["ff_out"]),
                                 drop_rate, ks[3])
    if cfg.use_cnn_module:
        x = _layer_norm(x, layer["norm_final"])
    return x


def _chunk_attn_mask(valid: jnp.ndarray, chunk: int) -> jnp.ndarray:
    """(B, T) valid -> (B, T, T) attention mask; chunk==0 -> full."""
    b, t = valid.shape
    m = valid[:, None, :] & valid[:, :, None]
    if chunk > 0:
        idx = jnp.arange(t)
        m = m & ((idx[None, :] // chunk) <= (idx[:, None] // chunk))[None]
    return m


def _run_blocks(params_layers, x, valid, cfg, chunk, pos_pe,
                drop_rate: float = 0.0, drop_rng=None):
    t = x.shape[1]
    attn_mask = _chunk_attn_mask(valid, chunk)
    for i, layer in enumerate(params_layers):
        pos_proj = (pos_pe @ layer["linear_pos"]["w"]).reshape(
            2 * t - 1, cfg.attention_heads, cfg.output_size // cfg.attention_heads
        )
        rng_i = None if drop_rng is None else jax.random.fold_in(drop_rng, i)
        x = _conformer_layer(layer, x, pos_proj, attn_mask, valid, cfg,
                             drop_rate, rng_i)
    return x


def encoder_forward(
    params: dict,
    cfg: ConformerConfig,
    xs: jnp.ndarray,  # (B, T, input_size)
    xs_lens: jnp.ndarray,
    streaming: bool = False,
    dropout_rng=None,
    dropout_rate: float = 0.1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Plain ConformerEncoder with linear input layer (encoder.py:111-183).
    Returns (out (B, T, D), valid (B, T))."""
    b, t, _ = xs.shape
    valid = jnp.arange(t)[None, :] < xs_lens[:, None]
    x = _layer_norm(linear(params["embed_linear"], xs), params["embed_norm"])
    x = x * math.sqrt(cfg.output_size)  # espnet xscale
    pe = jnp.asarray(espnet_rel_pos(t, cfg.output_size), x.dtype)
    chunk = cfg.static_chunk_size if streaming else 0
    rate = dropout_rate if dropout_rng is not None else 0.0
    x = _run_blocks(params["layers"], x, valid, cfg, chunk, pe, rate, dropout_rng)
    return _layer_norm(x, params["after_norm"]), valid


def upsample_encoder_forward(
    params: dict,
    cfg: ConformerConfig,
    xs: jnp.ndarray,  # (B, T, input_size) token embeddings
    xs_lens: jnp.ndarray,
    context: Optional[jnp.ndarray] = None,  # (B, pre_lookahead_len, input_size)
    streaming: bool = False,
    dropout_rng=None,
    dropout_rate: float = 0.1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """UpsampleConformerEncoder.forward (upsample_encoder.py:244-305):
    embed -> pre-lookahead -> N conformer blocks -> 2x nearest-upsample conv
    -> embed -> 4 blocks -> after_norm. Returns (out (B, 2T, D), valid)."""
    b, t, _ = xs.shape
    valid = jnp.arange(t)[None, :] < xs_lens[:, None]
    x = _layer_norm(linear(params["embed_linear"], xs), params["embed_norm"])
    x = x * math.sqrt(cfg.output_size)
    if context is not None:
        ctx = _layer_norm(linear(params["embed_linear"], context), params["embed_norm"])
        ctx = ctx * math.sqrt(cfg.output_size)
    else:
        ctx = None

    # pre-lookahead (upsample_encoder.py:66-105)
    la = cfg.pre_lookahead_len
    h = jnp.swapaxes(x, 1, 2)
    if ctx is None:
        h = jnp.pad(h, ((0, 0), (0, 0), (0, la)))
    else:
        h = jnp.concatenate([h, jnp.swapaxes(ctx, 1, 2)], axis=2)
    h = jax.nn.leaky_relu(conv1d(params["pre_lookahead_conv1"], h), 0.01)
    h = jnp.pad(h, ((0, 0), (0, 0), (2, 0)))
    h = conv1d(params["pre_lookahead_conv2"], h)
    x = jnp.swapaxes(h, 1, 2) + x

    pe = jnp.asarray(espnet_rel_pos(t, cfg.output_size), x.dtype)
    chunk = cfg.static_chunk_size if streaming else 0
    rate = dropout_rate if dropout_rng is not None else 0.0
    rng_a = rng_b = None
    if dropout_rng is not None:
        rng_a, rng_b = jax.random.split(dropout_rng)
    x = _run_blocks(params["layers"], x, valid, cfg, chunk, pe, rate, rng_a)

    # Upsample1D: nearest x2, left-pad 2*stride, conv k5 (upsample_encoder.py:37-63)
    h = jnp.swapaxes(x, 1, 2)
    h = jnp.repeat(h, 2, axis=-1)
    h = jnp.pad(h, ((0, 0), (0, 0), (4, 0)))
    h = conv1d(params["up_conv"], h)
    x = jnp.swapaxes(h, 1, 2)
    t2 = x.shape[1]
    lens2 = xs_lens * 2
    valid2 = jnp.arange(t2)[None, :] < lens2[:, None]

    x = _layer_norm(linear(params["up_embed_linear"], x), params["up_embed_norm"])
    x = x * math.sqrt(cfg.output_size)
    pe2 = jnp.asarray(espnet_rel_pos(t2, cfg.output_size), x.dtype)
    chunk2 = cfg.static_chunk_size * 2 if streaming else 0
    x = _run_blocks(params["up_layers"], x, valid2, cfg, chunk2, pe2, rate, rng_b)
    return _layer_norm(x, params["after_norm"]), valid2


# ---------------------------------------------------------------------------
# InterpolateRegulator (CV1 flow length regulator, length_regulator.py:21-70)


def init_regulator_params(rng: jax.Array, channels: int, n_groups: int = 1,
                          dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(rng, 8))
    return {
        "convs": [_conv_init(next(keys), channels, channels, 3, 1, dtype) for _ in range(2)],
        "norms": [_ln(channels, dtype) for _ in range(2)],
        "proj": _conv_init(next(keys), channels, channels, 1, 1, dtype),
    }


def regulator_forward(params: dict, x: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """Linear-interp to out_len then conv stack. x: (B, T, C) -> (B, out_len, C)."""
    h = jnp.swapaxes(x, 1, 2)  # (B, C, T)
    t = h.shape[-1]
    pos = jnp.linspace(0.0, t - 1.0, out_len)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, t - 1)
    hi = jnp.clip(lo + 1, 0, t - 1)
    w = (pos - lo).astype(h.dtype)
    h = h[..., lo] * (1 - w) + h[..., hi] * w
    for conv, norm in zip(params["convs"], params["norms"]):
        h = conv1d(conv, h, padding=[(1, 1)])
        h = jnp.swapaxes(_layer_norm(jnp.swapaxes(h, 1, 2), norm), 1, 2)
        h = jax.nn.gelu(h)
    h = conv1d(params["proj"], h)
    return jnp.swapaxes(h, 1, 2)
