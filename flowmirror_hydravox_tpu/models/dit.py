"""F5-TTS-style DiT velocity estimator — functional JAX.

Reimplements reference `cosyvoice/flow/DiT/{dit.py,modules.py}` semantics:

  - AdaLN-Zero modulated transformer blocks (modules.py:230-265, 500-530).
  - Causal conv position embedding (modules.py:115-144).
  - Rotary embedding exactly as the reference computes it: x-transformers
    `apply_rotary_pos_emb` is called on the *flattened* (heads*dim_head) q/k
    tensors (modules.py:368-373), whose partial-rotary behavior rotates only
    the first `dim_head` channels — i.e. only head 0 — with interleaved pair
    layout.  We reproduce this exactly for weight parity.
  - Non-streaming mask = full attention over valid positions; streaming mask
    = static chunk mask (dit.py:163-166 via add_optional_chunk_mask).

All convs/matmuls run in the param dtype (bf16 on TPU) with f32 softmax and
f32 LayerNorm statistics.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DiTConfig
from ..ops.rope import rope_cos_sin

NEG_INF = -1.0e10


def _linear_init(key, fan_in, fan_out, dtype):
    bound = 1.0 / math.sqrt(fan_in)
    kw, kb = jax.random.split(key)
    w = jax.random.uniform(kw, (fan_in, fan_out), jnp.float32, -bound, bound)
    b = jax.random.uniform(kb, (fan_out,), jnp.float32, -bound, bound)
    return {"w": w.astype(dtype), "b": b.astype(dtype)}


def _conv_init(key, in_ch, out_ch, kernel, groups, dtype):
    fan_in = in_ch // groups * kernel
    bound = 1.0 / math.sqrt(fan_in)
    kw, kb = jax.random.split(key)
    w = jax.random.uniform(kw, (out_ch, in_ch // groups, kernel), jnp.float32, -bound, bound)
    b = jax.random.uniform(kb, (out_ch,), jnp.float32, -bound, bound)
    return {"w": w.astype(dtype), "b": b.astype(dtype)}


def linear(p, x):
    return x @ p["w"] + p["b"]


def conv1d(p, x, *, groups: int = 1, padding="VALID"):
    """x: (B, C, T) torch layout; p['w']: (O, I/g, K).

    Grouped VALID convs route through a tap-stacked batched einsum instead of
    `conv_general_dilated`: the narrow per-group channel width (64 < the
    128-lane VPU) left the grouped conv at ~5% efficiency (204 us/call in the
    DiT conv-pos-embed, xplane v5e 2026-08); the einsum contracts
    (taps*in) x out per group on the MXU."""
    o, ig, kk = p["w"].shape
    if groups > 1 and padding == "VALID" and o % groups == 0:
        b, c, tpad = x.shape
        t = tpad - kk + 1
        og = o // groups
        xg = x.reshape(b, groups, ig, tpad)
        xs = jnp.stack([xg[..., k : k + t] for k in range(kk)])  # (K,B,G,I,T)
        w = p["w"].reshape(groups, og, ig, kk)  # (G,O,I,K)
        y = jnp.einsum("kbgit,goik->bgot", xs, w)  # (B,G,O,T)
        return y.reshape(b, o, t) + p["b"][None, :, None]
    out = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(1,), padding=padding,
        dimension_numbers=("NCH", "OIH", "NCH"), feature_group_count=groups,
    )
    return out + p["b"][None, :, None]


def dropout(x: jnp.ndarray, rate: float, rng) -> jnp.ndarray:
    """Inverted dropout; identity when rng is None or rate == 0 (inference).
    `rate` must be a static Python float so the no-op path traces to nothing
    (reference trains with 0.1, e.g. transformer/encoder.py:46)."""
    if rng is None or rate <= 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), jnp.zeros_like(x))


def layer_norm(x, eps=1e-6):
    """LayerNorm without affine params (elementwise_affine=False)."""
    dt = x.dtype
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    return ((x - mean) * jax.lax.rsqrt(var + eps)).astype(dt)


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


# ---------------------------------------------------------------------------
# init


def init_params(rng: jax.Array, cfg: DiTConfig, dtype=jnp.bfloat16) -> dict:
    keys = iter(jax.random.split(rng, 64))
    dim, inner = cfg.dim, cfg.heads * cfg.dim_head
    in_dim = cfg.mel_dim * 2 + cfg.mu_dim + cfg.spk_dim

    def stack(fn, n):
        parts = [fn(next(keys)) for _ in range(n)]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *parts)

    def block_init(key):
        ks = iter(jax.random.split(key, 10))
        return {
            "attn_norm_linear": _linear_init(next(ks), dim, dim * 6, dtype),
            "to_q": _linear_init(next(ks), dim, inner, dtype),
            "to_k": _linear_init(next(ks), dim, inner, dtype),
            "to_v": _linear_init(next(ks), dim, inner, dtype),
            "to_out": _linear_init(next(ks), inner, dim, dtype),
            "ff_in": _linear_init(next(ks), dim, dim * cfg.ff_mult, dtype),
            "ff_out": _linear_init(next(ks), dim * cfg.ff_mult, dim, dtype),
        }

    return {
        "time_mlp_in": _linear_init(next(keys), cfg.freq_embed_dim, dim, dtype),
        "time_mlp_out": _linear_init(next(keys), dim, dim, dtype),
        "input_proj": _linear_init(next(keys), in_dim, dim, dtype),
        "conv_pos1": _conv_init(next(keys), dim, dim, 31, 16, dtype),
        "conv_pos2": _conv_init(next(keys), dim, dim, 31, 16, dtype),
        "blocks": stack(block_init, cfg.depth),
        "norm_out_linear": _linear_init(next(keys), dim, dim * 2, dtype),
        "proj_out": _linear_init(next(keys), dim, cfg.mel_dim, dtype),
    }


# ---------------------------------------------------------------------------
# pieces


def timestep_embedding(params: dict, t: jnp.ndarray, freq_embed_dim: int) -> jnp.ndarray:
    """SinusPositionEmbedding (scale=1000) + MLP (modules.py:71-83, 606-616).
    t: (B,) in [0, 1] -> (B, dim)."""
    half = freq_embed_dim // 2
    emb_scale = math.log(10000) / (half - 1)
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -emb_scale)
    ang = 1000.0 * t.astype(jnp.float32)[:, None] * freqs[None, :]
    sincos = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    hidden = linear(params["time_mlp_in"], sincos.astype(params["time_mlp_in"]["w"].dtype))
    return linear(params["time_mlp_out"], jax.nn.silu(hidden))


def causal_conv_pos_embed(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, D) -> (B, T, D); two left-padded grouped convs with Mish
    (modules.py:115-144)."""
    h = jnp.swapaxes(x, 1, 2)  # (B, D, T)
    h = jnp.pad(h, ((0, 0), (0, 0), (30, 0)))
    h = mish(conv1d(params["conv_pos1"], h, groups=16))
    h = jnp.pad(h, ((0, 0), (0, 0), (30, 0)))
    h = mish(conv1d(params["conv_pos2"], h, groups=16))
    return jnp.swapaxes(h, 1, 2)


def _apply_rope_flat_partial(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray, rot_dim: int):
    """Reference quirk: rotate only the first rot_dim channels of the flat
    (B, T, heads*dim_head) tensor, interleaved pair layout (see module doc)."""
    xr, xu = x[..., :rot_dim], x[..., rot_dim:]
    shape = xr.shape
    pairs = xr.reshape(shape[:-1] + (rot_dim // 2, 2))
    x1, x2 = pairs[..., 0], pairs[..., 1]
    o1 = x1 * cos - x2 * sin
    o2 = x2 * cos + x1 * sin
    rotated = jnp.stack([o1, o2], axis=-1).reshape(shape).astype(x.dtype)
    return jnp.concatenate([rotated, xu], axis=-1)


def _attention(block, x, mask_bias, cos, sin, heads: int, dim_head: int):
    b, t, _ = x.shape
    q = linear(block["to_q"], x)
    k = linear(block["to_k"], x)
    v = linear(block["to_v"], x)
    q = _apply_rope_flat_partial(q, cos, sin, dim_head)
    k = _apply_rope_flat_partial(k, cos, sin, dim_head)
    q = q.reshape(b, t, heads, dim_head)
    k = k.reshape(b, t, heads, dim_head)
    v = v.reshape(b, t, heads, dim_head)
    logits = jnp.einsum("bthd,bshd->bhts", q, k).astype(jnp.float32) * (dim_head ** -0.5)
    if mask_bias is not None:
        logits = logits + mask_bias[:, None, :, :]
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhts,bshd->bthd", probs, v).reshape(b, t, heads * dim_head)
    return linear(block["to_out"], out)


def _dit_block(block, x, t_emb, mask_bias, cos, sin, heads, dim_head,
               drop_rate=0.0, drop_rng=None):
    """AdaLN-Zero block (modules.py:500-530); attn-out + FF dropout at train
    time (modules.py Attention/FeedForward dropout, default 0.1)."""
    mod = linear(block["attn_norm_linear"], jax.nn.silu(t_emb))  # (B, 6*dim)
    shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = jnp.split(mod, 6, axis=-1)
    k1 = k2 = None
    if drop_rng is not None:
        k1, k2 = jax.random.split(drop_rng)
    norm = layer_norm(x) * (1 + scale_msa[:, None]) + shift_msa[:, None]
    attn_out = _attention(block, norm, mask_bias, cos, sin, heads, dim_head)
    x = x + gate_msa[:, None] * dropout(attn_out, drop_rate, k1)
    ff_norm = layer_norm(x) * (1 + scale_mlp[:, None]) + shift_mlp[:, None]
    ff = linear(block["ff_out"], dropout(
        jax.nn.gelu(linear(block["ff_in"], ff_norm), approximate=True), drop_rate, k2))
    return x + gate_mlp[:, None] * ff


# ---------------------------------------------------------------------------
# forward


def forward(
    params: dict,
    cfg: DiTConfig,
    x: jnp.ndarray,  # (B, mel_dim, T) noised input
    mask: jnp.ndarray,  # (B, 1, T) validity (1 = valid)
    mu: jnp.ndarray,  # (B, mu_dim, T) token stream
    t: jnp.ndarray,  # (B,) diffusion time
    spks: jnp.ndarray,  # (B, spk_dim)
    cond: jnp.ndarray,  # (B, mel_dim, T) prompt-mel conditioning
    streaming: bool = False,
    unroll: Optional[bool] = None,
    dropout_rng: Optional[jax.Array] = None,
    dropout_rate: float = 0.0,
) -> jnp.ndarray:
    """Velocity estimate, (B, mel_dim, T). Mirrors DiT.forward (dit.py:145-176).

    `unroll` defaults to True on TPU: the axon backend miscompiles bf16 scan
    *backward* (see models/qwen2.py forward docstring); inference-only
    callers may pass unroll=False for faster compiles.

    `dropout_rng`/`dropout_rate`: train-time attn/FF dropout inside each
    block (reference DiT modules default 0.1); inference passes neither."""
    # mixed-precision policy: compute in the param dtype (bf16 in training
    # CLIs / serving), accumulate the loss in f32 at the caller
    dtype = params["input_proj"]["w"].dtype
    x = jnp.swapaxes(x, 1, 2).astype(dtype)
    mu = jnp.swapaxes(mu, 1, 2).astype(dtype)
    cond = jnp.swapaxes(cond, 1, 2).astype(dtype)
    spks = spks.astype(dtype)
    b, seq_len, _ = x.shape

    t_emb = timestep_embedding(params, t, cfg.freq_embed_dim)  # (B, dim)

    spk_bc = jnp.broadcast_to(spks[:, None, :], (b, seq_len, spks.shape[-1]))
    h = linear(params["input_proj"], jnp.concatenate([x, cond, mu, spk_bc], axis=-1))
    h = causal_conv_pos_embed(params, h) + h

    cos, sin = rope_cos_sin(jnp.arange(seq_len), cfg.dim_head, cfg.rope_theta)

    valid = mask[:, 0, :] > 0  # (B, T)
    attn = valid[:, None, :] & valid[:, :, None]
    if streaming:
        idx = jnp.arange(seq_len)
        qc = idx[:, None] // cfg.static_chunk_size
        kc = idx[None, :] // cfg.static_chunk_size
        attn = attn & (kc <= qc)[None]
    mask_bias = jnp.where(attn, 0.0, NEG_INF).astype(jnp.float32)

    if unroll is None:
        unroll = jax.default_backend() == "tpu"
    use_drop = dropout_rng is not None and dropout_rate > 0.0

    if use_drop:
        block_rngs = jax.random.split(dropout_rng, cfg.depth)

        def body(hh, scanned):
            block, rng_i = scanned
            return _dit_block(block, hh, t_emb, mask_bias, cos, sin, cfg.heads,
                              cfg.dim_head, dropout_rate, rng_i), None

        if unroll:
            # dots_saveable: keep matmul outputs in the backward instead of
            # full per-layer recompute (full remat capped train MFU at 75%;
            # forward-only inference is unaffected by the policy)
            ckpt = jax.checkpoint(body, policy=jax.checkpoint_policies.dots_saveable)
            for i in range(cfg.depth):
                block_i = jax.tree.map(lambda a: a[i], params["blocks"])
                h, _ = ckpt(h, (block_i, block_rngs[i]))
        else:
            h, _ = jax.lax.scan(body, h, (params["blocks"], block_rngs))
    else:
        def body(hh, block):
            return _dit_block(block, hh, t_emb, mask_bias, cos, sin,
                              cfg.heads, cfg.dim_head), None

        if unroll:
            ckpt = jax.checkpoint(body, policy=jax.checkpoint_policies.dots_saveable)
            for i in range(cfg.depth):
                block_i = jax.tree.map(lambda a: a[i], params["blocks"])
                h, _ = ckpt(h, block_i)
        else:
            h, _ = jax.lax.scan(body, h, params["blocks"])

    mod = linear(params["norm_out_linear"], jax.nn.silu(t_emb))
    scale, shift = jnp.split(mod, 2, axis=-1)  # note: scale first (modules.py:262)
    h = layer_norm(h) * (1 + scale[:, None]) + shift[:, None]
    out = linear(params["proj_out"], h)
    return jnp.swapaxes(out, 1, 2)
