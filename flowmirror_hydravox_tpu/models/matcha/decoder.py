"""Matcha U-Net CFM estimator — functional JAX.

Reimplements reference `matcha/models/components/decoder.py` (Decoder) and
`transformer.py` (BasicTransformerBlock with SnakeBeta feed-forward):
  - down path: ResnetBlock1D (conv k3 + GroupNorm(8) + Mish, time-emb bias)
    -> n_blocks transformer blocks -> stride-2 downsample conv (last: k3 s1)
  - mid: num_mid_blocks x (resnet + transformer)
  - up path: skip-concat resnets + ConvTranspose(k4 s2 p1) upsample
  - final Block1D + 1x1 proj
Defaults match the reference decoder_params: channels (256, 256),
attention_head_dim 64, num_heads 4, n_blocks 1, num_mid_blocks 2,
act "snakebeta"."""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..dit import _conv_init, _linear_init, conv1d, linear
from ..hift import conv_transpose1d


@dataclasses.dataclass(frozen=True)
class MatchaDecoderConfig:
    in_feats: int = 80  # mel dim; estimator input = 2*in_feats (+ spk + cond)
    channels: Tuple[int, ...] = (256, 256)
    attention_head_dim: int = 64
    num_heads: int = 4
    n_blocks: int = 1
    num_mid_blocks: int = 2
    spk_emb_dim: int = 0  # 0 for single speaker
    groups: int = 8
    use_cond: bool = False  # extra mel-cond channel group (cosyvoice estimator)
    causal: bool = False  # CausalConditionalDecoder (decoder.py:294-494)
    static_chunk_size: int = 50  # streaming chunk attention (all resolutions)


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


def group_norm(x, gamma, beta, groups=8, eps=1e-5):
    """GroupNorm over (B, C, T)."""
    b, c, t = x.shape
    xg = x.reshape(b, groups, c // groups, t).astype(jnp.float32)
    mean = jnp.mean(xg, axis=(2, 3), keepdims=True)
    var = jnp.mean((xg - mean) ** 2, axis=(2, 3), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    x = xg.reshape(b, c, t).astype(x.dtype)
    return x * gamma[None, :, None] + beta[None, :, None]


def _block1d_init(key, dim, dim_out, dtype):
    return {
        "conv": _conv_init(key, dim, dim_out, 3, 1, dtype),
        "gn_g": jnp.ones((dim_out,), dtype),
        "gn_b": jnp.zeros((dim_out,), dtype),
    }


def _block1d(p, x, mask, groups, causal=False):
    pad = [(2, 0)] if causal else [(1, 1)]
    h = conv1d(p["conv"], x * mask, padding=pad)
    h = group_norm(h, p["gn_g"], p["gn_b"], groups)
    return mish(h) * mask


def _resnet_init(key, dim, dim_out, time_dim, dtype):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "block1": _block1d_init(k1, dim, dim_out, dtype),
        "block2": _block1d_init(k2, dim_out, dim_out, dtype),
        "time_mlp": _linear_init(k3, time_dim, dim_out, dtype),
        "res_conv": _conv_init(k4, dim, dim_out, 1, 1, dtype),
    }


def _resnet(p, x, mask, t_emb, groups, causal=False):
    h = _block1d(p["block1"], x, mask, groups, causal)
    h = h + linear(p["time_mlp"], mish(t_emb))[:, :, None]
    h = _block1d(p["block2"], h, mask, groups, causal)
    return h + conv1d(p["res_conv"], x * mask)


def _tf_block_init(key, dim, inner, heads, dim_head, dtype):
    ks = iter(jax.random.split(key, 8))
    attn_inner = heads * dim_head

    def lin_nobias(k, i, o):
        p = _linear_init(k, i, o, dtype)
        return {"w": p["w"], "b": jnp.zeros((o,), dtype)}

    return {
        "norm1_g": jnp.ones((dim,), dtype), "norm1_b": jnp.zeros((dim,), dtype),
        "to_q": lin_nobias(next(ks), dim, attn_inner),
        "to_k": lin_nobias(next(ks), dim, attn_inner),
        "to_v": lin_nobias(next(ks), dim, attn_inner),
        "to_out": _linear_init(next(ks), attn_inner, dim, dtype),
        "norm3_g": jnp.ones((dim,), dtype), "norm3_b": jnp.zeros((dim,), dtype),
        "ff_snake": _linear_init(next(ks), dim, inner, dtype),
        "ff_alpha": jnp.zeros((inner,), dtype),  # log-scale, exp() at use
        "ff_beta": jnp.zeros((inner,), dtype),
        "ff_out": _linear_init(next(ks), inner, dim, dtype),
    }


def _layer_norm_affine(x, g, b, eps=1e-5):
    dt = x.dtype
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    return (((x - mean) * jax.lax.rsqrt(var + eps)).astype(dt)) * g + b


def _tf_block(p, x, attn_mask, heads, dim_head):
    """x: (B, T, C); attn_mask: (B, T, T) or (B, 1, T) bool."""
    b, t, c = x.shape
    h = _layer_norm_affine(x, p["norm1_g"], p["norm1_b"])
    q = (h @ p["to_q"]["w"]).reshape(b, t, heads, dim_head)
    k = (h @ p["to_k"]["w"]).reshape(b, t, heads, dim_head)
    v = (h @ p["to_v"]["w"]).reshape(b, t, heads, dim_head)
    scores = jnp.einsum("bthd,bshd->bhts", q, k).astype(jnp.float32) * dim_head ** -0.5
    scores = jnp.where(attn_mask[:, None, :, :], scores, -1e9)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    attn = jnp.einsum("bhts,bshd->bthd", probs, v).reshape(b, t, heads * dim_head)
    x = x + linear(p["to_out"], attn)

    h = _layer_norm_affine(x, p["norm3_g"], p["norm3_b"])
    h = linear(p["ff_snake"], h)
    alpha, beta = jnp.exp(p["ff_alpha"]), jnp.exp(p["ff_beta"])
    h = h + (1.0 / (beta + 1e-9)) * jnp.sin(h * alpha) ** 2  # SnakeBeta
    return x + linear(p["ff_out"], h)


def init_params(rng: jax.Array, cfg: MatchaDecoderConfig, dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(rng, 64))
    in_ch = (3 if cfg.use_cond else 2) * cfg.in_feats + cfg.spk_emb_dim
    time_dim = cfg.channels[0] * 4
    heads, hd = cfg.num_heads, cfg.attention_head_dim
    tf_dim = lambda ch: _tf_block_init(next(keys), ch, 4 * ch, heads, hd, dtype)

    down, out_ch = [], in_ch
    for i, ch in enumerate(cfg.channels):
        is_last = i == len(cfg.channels) - 1
        down.append({
            "resnet": _resnet_init(next(keys), out_ch, ch, time_dim, dtype),
            "tf": [tf_dim(ch) for _ in range(cfg.n_blocks)],
            "down": _conv_init(next(keys), ch, ch, 3, 1, dtype),
        })
        del is_last
        out_ch = ch

    mid = [
        {
            "resnet": _resnet_init(next(keys), cfg.channels[-1], cfg.channels[-1], time_dim, dtype),
            "tf": [tf_dim(cfg.channels[-1]) for _ in range(cfg.n_blocks)],
        }
        for _ in range(cfg.num_mid_blocks)
    ]

    up_channels = tuple(reversed(cfg.channels)) + (cfg.channels[0],)
    up = []
    for i in range(len(up_channels) - 1):
        ic, oc = up_channels[i], up_channels[i + 1]
        is_last = i == len(up_channels) - 2
        if is_last:
            upsample = _conv_init(next(keys), oc, oc, 3, 1, dtype)
        else:
            # ConvTranspose1d(oc, oc, 4, 2, 1): torch weight (I, O, K)
            kk = next(keys)
            bound = 1.0 / math.sqrt(oc * 4)
            kw, kb = jax.random.split(kk)
            upsample = {
                "w": jax.random.uniform(kw, (oc, oc, 4), jnp.float32, -bound, bound).astype(dtype),
                "b": jax.random.uniform(kb, (oc,), jnp.float32, -bound, bound).astype(dtype),
            }
        up.append({
            "resnet": _resnet_init(next(keys), 2 * ic, oc, time_dim, dtype),
            "tf": [tf_dim(oc) for _ in range(cfg.n_blocks)],
            "up": upsample,
        })
        del is_last

    return {
        "time_mlp_in": _linear_init(next(keys), in_ch, time_dim, dtype),
        "time_mlp_out": _linear_init(next(keys), time_dim, time_dim, dtype),
        "down": down,
        "mid": mid,
        "up": up,
        "final_block": _block1d_init(next(keys), up_channels[-1], up_channels[-1], dtype),
        "final_proj": _conv_init(next(keys), up_channels[-1], cfg.in_feats, 1, 1, dtype),
    }


def _attn_mask_for(mask, streaming, chunk):
    """mask: (B, 1, T) -> (B, T, T) bool: full over valid, or chunked."""
    valid = mask[:, 0, :] > 0
    m = valid[:, None, :] & valid[:, :, None]
    if streaming and chunk > 0:
        t = mask.shape[2]
        idx = jnp.arange(t)
        m = m & ((idx[None, :] // chunk) <= (idx[:, None] // chunk))[None]
    return m


def forward(
    params: dict,
    cfg: MatchaDecoderConfig,
    x: jnp.ndarray,  # (B, n_feats, T) noised input
    mask: jnp.ndarray,  # (B, 1, T)
    mu: jnp.ndarray,  # (B, n_feats, T)
    t: jnp.ndarray,  # (B,)
    spks: Optional[jnp.ndarray] = None,
    cond: Optional[jnp.ndarray] = None,
    streaming: bool = False,
) -> jnp.ndarray:
    """Velocity estimate (decoder.py:363-443; causal/chunked 420-494)."""
    # compute in the parameter dtype: the CFM integrator keeps its state in
    # f32 (cfm.solve_euler) and hands us f32 tensors — cast at the boundary
    # so a bf16-loaded U-Net actually runs bf16 throughout
    wdtype = params["time_mlp_in"]["w"].dtype
    x = x.astype(wdtype)
    mask = mask.astype(wdtype)
    mu = mu.astype(wdtype)
    if spks is not None:
        spks = spks.astype(wdtype)
    if cond is not None:
        cond = cond.astype(wdtype)
    in_ch = (3 if cfg.use_cond else 2) * cfg.in_feats + cfg.spk_emb_dim
    # SinusoidalPosEmb(in_ch, scale=1000)
    half = in_ch // 2
    scale_f = math.log(10000) / (half - 1)
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -scale_f)
    ang = 1000.0 * t.astype(jnp.float32)[:, None] * freqs[None, :]
    t_emb = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1).astype(x.dtype)
    t_emb = linear(params["time_mlp_out"], jax.nn.silu(linear(params["time_mlp_in"], t_emb)))

    h = jnp.concatenate([x, mu], axis=1)
    if cfg.spk_emb_dim > 0 and spks is not None:
        h = jnp.concatenate(
            [h, jnp.broadcast_to(spks[:, :, None], (h.shape[0], cfg.spk_emb_dim, h.shape[2]))],
            axis=1,
        )
    if cfg.use_cond:
        h = jnp.concatenate(
            [h, cond if cond is not None else jnp.zeros_like(x)], axis=1
        )

    heads, hd = cfg.num_heads, cfg.attention_head_dim
    hiddens, masks = [], [mask]
    n_down = len(params["down"])
    for i_blk, blk in enumerate(params["down"]):
        m = masks[-1]
        h = _resnet(blk["resnet"], h, m, t_emb, cfg.groups, cfg.causal)
        hm = _attn_mask_for(m, streaming, cfg.static_chunk_size)
        ht = jnp.swapaxes(h, 1, 2)
        for tf in blk["tf"]:
            ht = _tf_block(tf, ht, hm, heads, hd)
        h = jnp.swapaxes(ht, 1, 2)
        hiddens.append(h)
        if i_blk == n_down - 1:
            pad = [(2, 0)] if cfg.causal else [(1, 1)]
            h = conv1d(blk["down"], h * m, padding=pad)
            masks.append(m)
        else:
            h = jax.lax.conv_general_dilated(
                h * m, blk["down"]["w"], window_strides=(2,), padding=[(1, 1)],
                dimension_numbers=("NCH", "OIH", "NCH"),
            ) + blk["down"]["b"][None, :, None]
            masks.append(m[:, :, ::2])

    masks = masks[:-1]
    m = masks[-1]
    for blk in params["mid"]:
        h = _resnet(blk["resnet"], h, m, t_emb, cfg.groups, cfg.causal)
        hm = _attn_mask_for(m, streaming, cfg.static_chunk_size)
        ht = jnp.swapaxes(h, 1, 2)
        for tf in blk["tf"]:
            ht = _tf_block(tf, ht, hm, heads, hd)
        h = jnp.swapaxes(ht, 1, 2)

    n_up = len(params["up"])
    for i_blk, blk in enumerate(params["up"]):
        m = masks.pop()
        skip = hiddens.pop()
        h = _resnet(
            blk["resnet"], jnp.concatenate([h[:, :, : skip.shape[2]], skip], axis=1),
            m, t_emb, cfg.groups, cfg.causal,
        )
        hm = _attn_mask_for(m, streaming, cfg.static_chunk_size)
        ht = jnp.swapaxes(h, 1, 2)
        for tf in blk["tf"]:
            ht = _tf_block(tf, ht, hm, heads, hd)
        h = jnp.swapaxes(ht, 1, 2)
        if i_blk == n_up - 1:
            pad = [(2, 0)] if cfg.causal else [(1, 1)]
            h = conv1d(blk["up"], h * m, padding=pad)
        else:
            h = conv_transpose1d(blk["up"], h * m, 2, 1)

    h = _block1d(params["final_block"], h, m, cfg.groups, cfg.causal)
    out = conv1d(params["final_proj"], h * m)
    return out * mask
