"""CV1/CV2-generation flow models (kept functional for full capability parity).

Reimplements reference `cosyvoice/flow/flow.py`:
  - MaskedDiffWithXvec (CV1, flow.py:24-145): token embed -> conformer
    encoder -> InterpolateRegulator to mel length -> CFM with U-Net estimator.
  - CausalMaskedDiffWithXvec (CV2, flow.py:148-275): UpsampleConformerEncoder
    (2x token->mel) -> CFM with the causal chunked U-Net estimator.
Both use the ConditionalCFM Euler solve with CFG batch-2
(flow_matching.py:71-124) — shared `solve_euler_unet` here.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .conformer import (
    ConformerConfig,
    encoder_forward,
    init_encoder_params,
    init_regulator_params,
    init_upsample_encoder_params,
    regulator_forward,
    upsample_encoder_forward,
)
from .dit import _linear_init, linear
from .matcha import decoder as unet
from .matcha.decoder import MatchaDecoderConfig


@dataclasses.dataclass(frozen=True)
class LegacyFlowConfig:
    input_size: int = 512
    output_size: int = 80
    spk_embed_dim: int = 192
    vocab_size: int = 6561
    input_frame_rate: int = 25
    token_mel_ratio: int = 2  # CV2
    pre_lookahead_len: int = 3
    encoder: ConformerConfig = ConformerConfig()
    estimator: MatchaDecoderConfig = MatchaDecoderConfig(
        in_feats=80, spk_emb_dim=80, use_cond=True, causal=True, static_chunk_size=50
    )
    sigma_min: float = 1e-6
    t_scheduler: str = "cosine"
    inference_cfg_rate: float = 0.7
    n_timesteps: int = 10
    causal: bool = True  # False -> CV1 (MaskedDiffWithXvec)


def init_params(rng: jax.Array, cfg: LegacyFlowConfig, dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(rng, 8))
    params = {
        "input_embedding": (
            jax.random.normal(next(keys), (cfg.vocab_size, cfg.input_size), jnp.float32) * 0.02
        ).astype(dtype),
        "spk_embed_affine": _linear_init(next(keys), cfg.spk_embed_dim, cfg.output_size, dtype),
        "encoder_proj": _linear_init(next(keys), cfg.encoder.output_size, cfg.output_size, dtype),
        "estimator": unet.init_params(next(keys), cfg.estimator, dtype),
    }
    if cfg.causal:
        params["encoder"] = init_upsample_encoder_params(next(keys), cfg.encoder, dtype)
    else:
        params["encoder"] = init_encoder_params(next(keys), cfg.encoder, cfg.encoder.num_blocks, dtype)
        params["length_regulator"] = init_regulator_params(next(keys), cfg.output_size, dtype=dtype)
    return params


def solve_euler_unet(
    params: dict,
    cfg: LegacyFlowConfig,
    z: jnp.ndarray,  # (B, 80, T)
    mu: jnp.ndarray,
    mask: jnp.ndarray,
    spks: jnp.ndarray,
    cond: jnp.ndarray,
    n_timesteps: int,
    streaming: bool = False,
) -> jnp.ndarray:
    """CFG batch-2 Euler scan over the U-Net estimator (flow_matching.py:71-124)."""
    t_span = jnp.linspace(0.0, 1.0, n_timesteps + 1)
    if cfg.t_scheduler == "cosine":
        t_span = 1.0 - jnp.cos(t_span * 0.5 * jnp.pi)
    ts, dts = t_span[:-1], t_span[1:] - t_span[:-1]
    b = z.shape[0]
    dtype = params["input_embedding"].dtype

    mu2 = jnp.concatenate([mu, jnp.zeros_like(mu)], axis=0).astype(dtype)
    spks2 = jnp.concatenate([spks, jnp.zeros_like(spks)], axis=0).astype(dtype)
    cond2 = jnp.concatenate([cond, jnp.zeros_like(cond)], axis=0).astype(dtype)
    mask2 = jnp.concatenate([mask, mask], axis=0)
    rate = cfg.inference_cfg_rate

    def step(x, t_dt):
        t, dt = t_dt
        x2 = jnp.concatenate([x, x], axis=0).astype(dtype)
        v = unet.forward(
            params["estimator"], cfg.estimator, x2, mask2, mu2,
            jnp.full((2 * b,), t), spks2, cond2, streaming=streaming,
        ).astype(jnp.float32)
        dphi = (1.0 + rate) * v[:b] - rate * v[b:]
        return x + dt * dphi, None

    x, _ = jax.lax.scan(step, z.astype(jnp.float32), (ts, dts))
    return x


def _project_spk(params, embedding):
    norm = embedding / jnp.maximum(
        jnp.linalg.norm(embedding.astype(jnp.float32), axis=-1, keepdims=True), 1e-12
    )
    return linear(params["spk_embed_affine"], norm.astype(params["input_embedding"].dtype))


def inference(
    params: dict,
    cfg: LegacyFlowConfig,
    rng: jax.Array,
    token: jnp.ndarray,  # (1, Lp + Lt) prompt + generated tokens
    token_len: jnp.ndarray,
    prompt_feat: jnp.ndarray,  # (1, mel_len1, 80)
    prompt_mel_len: jnp.ndarray,
    embedding: jnp.ndarray,  # (1, 192)
    streaming: bool = False,
    finalize: bool = True,
    n_timesteps: Optional[int] = None,
) -> jnp.ndarray:
    """CV2 path (flow.py:229-275) when cfg.causal else CV1 (flow.py:101-145).
    Returns mel (1, 80, T_mel) including the prompt region."""
    n_timesteps = n_timesteps or cfg.n_timesteps
    t = token.shape[1]
    valid = jnp.arange(t)[None, :] < token_len[:, None]
    emb = jnp.take(params["input_embedding"], jnp.clip(token, 0), axis=0)
    emb = emb * valid[..., None].astype(emb.dtype)
    spks = _project_spk(params, embedding)

    if cfg.causal:
        if finalize:
            h, h_valid = upsample_encoder_forward(
                params["encoder"], cfg.encoder, emb, token_len, streaming=streaming
            )
        else:
            la = cfg.pre_lookahead_len
            h, h_valid = upsample_encoder_forward(
                params["encoder"], cfg.encoder, emb[:, :-la], token_len - la,
                context=emb[:, -la:], streaming=streaming,
            )
        h = linear(params["encoder_proj"], h)
        t_mel = h.shape[1]
    else:
        enc, _ = encoder_forward(params["encoder"], cfg.encoder, emb, token_len)
        enc = linear(params["encoder_proj"], enc)
        # mel length = tokens / frame_rate * (22050/256)-style ratio; CV1 uses
        # the regulator to the requested feat length — here 2x for parity
        t_mel = t * cfg.token_mel_ratio
        h = regulator_forward(params["length_regulator"], enc, t_mel)
        h_valid = jnp.repeat(valid, cfg.token_mel_ratio, axis=1)

    mel_dim = cfg.output_size
    frame = jnp.arange(t_mel)
    pf = jnp.zeros((1, t_mel, mel_dim), h.dtype)
    if prompt_feat.shape[1] > 0:
        src = jnp.pad(
            prompt_feat.astype(h.dtype),
            ((0, 0), (0, max(t_mel - prompt_feat.shape[1], 0)), (0, 0)),
        )[:, :t_mel]
        pf = jnp.where((frame < prompt_mel_len)[None, :, None], src, pf)
    conds = jnp.swapaxes(pf, 1, 2)

    mask = h_valid.astype(jnp.float32)[:, None, :t_mel]
    z = jax.random.normal(rng, (1, mel_dim, t_mel), jnp.float32)
    mu = jnp.swapaxes(h, 1, 2)
    return solve_euler_unet(params, cfg, z, mu, mask, spks, conds, n_timesteps, streaming)


def compute_loss(
    params: dict,
    cfg: LegacyFlowConfig,
    rng: jax.Array,
    token: jnp.ndarray,  # (B, Lt)
    token_len: jnp.ndarray,
    feat: jnp.ndarray,  # (B, Tm, 80)
    feat_len: jnp.ndarray,
    embedding: jnp.ndarray,
    streaming: bool = False,
    training_cfg_rate: float = 0.2,
) -> jnp.ndarray:
    """CFM loss (flow.py:183-227 + flow_matching.py:155-194)."""
    rng_t, rng_z, rng_cfg, rng_cond, rng_idx, rng_drop = jax.random.split(rng, 6)
    b, t_mel, mel_dim = feat.shape
    valid = jnp.arange(token.shape[1])[None, :] < token_len[:, None]
    emb = jnp.take(params["input_embedding"], jnp.clip(token, 0), axis=0)
    emb = emb * valid[..., None].astype(emb.dtype)
    spks = _project_spk(params, embedding)

    if cfg.causal:
        h, _ = upsample_encoder_forward(
            params["encoder"], cfg.encoder, emb, token_len, streaming=streaming,
            dropout_rng=rng_drop,
        )
    else:
        enc, _ = encoder_forward(params["encoder"], cfg.encoder, emb, token_len,
                                 dropout_rng=rng_drop)
        h = regulator_forward(
            params["length_regulator"], linear(params["encoder_proj"], enc), t_mel
        )
    if cfg.causal:
        h = linear(params["encoder_proj"], h)
    h = h[:, :t_mel]
    mu = jnp.swapaxes(h, 1, 2)

    x1 = jnp.swapaxes(feat, 1, 2).astype(jnp.float32)
    mask = (jnp.arange(t_mel)[None, :] < feat_len[:, None]).astype(jnp.float32)[:, None, :]

    t = jax.random.uniform(rng_t, (b, 1, 1))
    if cfg.t_scheduler == "cosine":
        t = 1.0 - jnp.cos(t * 0.5 * jnp.pi)
    z = jax.random.normal(rng_z, x1.shape)
    y = (1.0 - (1.0 - cfg.sigma_min) * t) * z + t * x1
    u = x1 - (1.0 - cfg.sigma_min) * z

    use_cond = jax.random.uniform(rng_cond, (b,)) >= 0.5
    prefix = (jax.random.uniform(rng_idx, (b,)) * 0.3 * feat_len.astype(jnp.float32)).astype(jnp.int32)
    sel = use_cond[:, None] & (jnp.arange(t_mel)[None, :] < prefix[:, None])
    cond = jnp.where(sel[:, None, :], x1, 0.0)

    if training_cfg_rate > 0:
        keep = jax.random.uniform(rng_cfg, (b,)) > training_cfg_rate
        mu = mu * keep[:, None, None]
        spks = spks * keep[:, None]
        cond = cond * keep[:, None, None]

    pred = unet.forward(
        params["estimator"], cfg.estimator, y.astype(mu.dtype), mask, mu,
        t[:, 0, 0], spks, cond.astype(mu.dtype), streaming=streaming,
    ).astype(jnp.float32)
    num = jnp.sum(((pred - u) * mask) ** 2)
    return num / (jnp.maximum(jnp.sum(mask), 1.0) * mel_dim)
