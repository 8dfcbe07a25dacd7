"""Flow-matching mel decoder (CausalMaskedDiffWithDiT + CausalConditionalCFM).

TPU-native reimplementation of reference `cosyvoice/flow/flow.py:278-430` and
`cosyvoice/flow/flow_matching.py`:

  - The 10-step Euler ODE solve is a `lax.scan` with the classifier-free
    guidance pair batched inside one estimator call (flow_matching.py:95-123)
    — a single jitted program per mel-length bucket; no TRT/context-pool
    machinery needed (XLA plays that role, SURVEY §2.12 item 4).
  - The deterministic streaming noise buffer (flow_matching.py:200-201:
    `set_all_random_seed(0); torch.randn([1, 80, 15000])`) is reproduced
    bit-exactly by drawing it from torch once at parameter-init/conversion
    time; it lives in the param pytree as a non-trainable buffer.
  - PreLookaheadLayer (upsample_encoder.py:66-105): right-context conv
    (kernel pre_lookahead_len+1, zero/context right pad) -> leaky_relu ->
    left-padded conv(k=3) -> residual.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import FlowConfig
from . import dit
from .dit import _conv_init, _linear_init, conv1d, linear


def make_rand_noise(cfg: FlowConfig) -> np.ndarray:
    """Bit-exact reference noise buffer (flow_matching.py:200-201)."""
    try:
        import torch

        torch.manual_seed(0)
        buf = torch.randn([1, 80, 15000]).numpy()
        return buf[:, :, : cfg.rand_noise_len].astype(np.float32)
    except ImportError:  # pragma: no cover — torch is available in this image
        rng = np.random.default_rng(0)
        return rng.standard_normal((1, 80, cfg.rand_noise_len), dtype=np.float32)


def init_params(rng: jax.Array, cfg: FlowConfig, dtype=jnp.bfloat16) -> dict:
    keys = jax.random.split(rng, 6)
    return {
        "input_embedding": (
            jax.random.normal(keys[0], (cfg.vocab_size, cfg.input_size), jnp.float32)
        ).astype(dtype),
        "spk_embed_affine": _linear_init(keys[1], cfg.spk_embed_dim, cfg.output_size, dtype),
        "pre_lookahead_conv1": _conv_init(
            keys[2], cfg.input_size, cfg.input_size, cfg.pre_lookahead_len + 1, 1, dtype
        ),
        "pre_lookahead_conv2": _conv_init(keys[3], cfg.input_size, cfg.input_size, 3, 1, dtype),
        "estimator": dit.init_params(keys[4], cfg.estimator, dtype),
        "rand_noise": jnp.asarray(make_rand_noise(cfg)),  # f32 buffer, non-trainable
    }


def pre_lookahead(params: dict, cfg: FlowConfig, x: jnp.ndarray,
                  context: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """x: (B, T, C). context: (B, pre_lookahead_len, C) future tokens or None."""
    h = jnp.swapaxes(x, 1, 2)  # (B, C, T)
    la = cfg.pre_lookahead_len
    if context is None:
        h = jnp.pad(h, ((0, 0), (0, 0), (0, la)))
    else:
        h = jnp.concatenate([h, jnp.swapaxes(context, 1, 2)], axis=2)
    h = jax.nn.leaky_relu(conv1d(params["pre_lookahead_conv1"], h), 0.01)
    h = jnp.pad(h, ((0, 0), (0, 0), (2, 0)))
    h = conv1d(params["pre_lookahead_conv2"], h)
    return jnp.swapaxes(h, 1, 2) + x


def encode_tokens(
    params: dict,
    cfg: FlowConfig,
    token: jnp.ndarray,  # (B, T) int32 (prompt tokens + new tokens)
    token_valid: jnp.ndarray,  # (B, T) bool
    context_token: Optional[jnp.ndarray] = None,  # (B, pre_lookahead_len) or None
) -> jnp.ndarray:
    """Token -> mu stream at mel rate: embed, mask, pre-lookahead, x2 repeat
    (flow.py:398-405). Returns (B, T*token_mel_ratio, input_size)."""
    vocab = params["input_embedding"].shape[0]
    emb = jnp.take(params["input_embedding"], jnp.clip(token, 0, vocab - 1), axis=0)
    emb = emb * token_valid[..., None].astype(emb.dtype)
    ctx = None
    if context_token is not None:
        ctx = jnp.take(
            params["input_embedding"], jnp.clip(context_token, 0, vocab - 1), axis=0
        )
    h = pre_lookahead(params, cfg, emb, ctx)
    return jnp.repeat(h, cfg.token_mel_ratio, axis=1)


def project_speaker(params: dict, embedding: jnp.ndarray) -> jnp.ndarray:
    """L2-normalize then affine 192 -> 80 (flow.py:389-390)."""
    dt = params["spk_embed_affine"]["w"].dtype
    norm = embedding / jnp.maximum(
        jnp.linalg.norm(embedding.astype(jnp.float32), axis=-1, keepdims=True), 1e-12
    )
    return linear(params["spk_embed_affine"], norm.astype(dt))


def solve_euler(
    params: dict,
    cfg: FlowConfig,
    z: jnp.ndarray,  # (B, 80, T) initial noise
    mu: jnp.ndarray,  # (B, mu_dim, T)
    mask: jnp.ndarray,  # (B, 1, T)
    spks: jnp.ndarray,  # (B, 80)
    cond: jnp.ndarray,  # (B, 80, T)
    n_timesteps: int,
    streaming: bool = False,
) -> jnp.ndarray:
    """Fixed-step Euler with CFG batch-2 per step (flow_matching.py:71-124),
    rolled into a lax.scan."""
    t_span = jnp.linspace(0.0, 1.0, n_timesteps + 1)
    if cfg.t_scheduler == "cosine":
        t_span = 1.0 - jnp.cos(t_span * 0.5 * jnp.pi)
    dts = t_span[1:] - t_span[:-1]
    ts = t_span[:-1]
    cfg_rate = cfg.inference_cfg_rate

    b = z.shape[0]
    dtype = params["input_embedding"].dtype
    mu2 = jnp.concatenate([mu, jnp.zeros_like(mu)], axis=0).astype(dtype)
    spks2 = jnp.concatenate([spks, jnp.zeros_like(spks)], axis=0).astype(dtype)
    cond2 = jnp.concatenate([cond, jnp.zeros_like(cond)], axis=0).astype(dtype)
    mask2 = jnp.concatenate([mask, mask], axis=0)

    def step(x, t_dt):
        t, dt = t_dt
        x_in = jnp.concatenate([x, x], axis=0).astype(dtype)
        t_in = jnp.full((2 * b,), t, jnp.float32)
        v = dit.forward(
            params["estimator"], cfg.estimator, x_in, mask2, mu2, t_in, spks2, cond2,
            streaming=streaming, unroll=False,  # inference-only: scan is safe + compiles fast
        ).astype(jnp.float32)
        v_cond, v_uncond = v[:b], v[b:]
        dphi = (1.0 + cfg_rate) * v_cond - cfg_rate * v_uncond
        return x + dt * dphi, None

    x, _ = jax.lax.scan(step, z.astype(jnp.float32), (ts, dts))
    return x


def inference(
    params: dict,
    cfg: FlowConfig,
    token: jnp.ndarray,  # (1, Lp + Lt) prompt + generated speech tokens
    token_valid: jnp.ndarray,  # (1, Lp + Lt) bool
    prompt_feat: jnp.ndarray,  # (1, mel_len1, 80) prompt mel (may be 0-length)
    prompt_mel_len: jnp.ndarray,  # scalar int32
    embedding: jnp.ndarray,  # (1, 192) speaker embedding
    finalize: bool = True,
    streaming: bool = False,
    n_timesteps: Optional[int] = None,
    emit_valid: Optional[jnp.ndarray] = None,  # (1, T) bool: tokens emitting mel
) -> jnp.ndarray:
    """Full flow inference (flow.py:367-430). Returns mel (1, 80, T_mel) incl.
    the prompt region; caller slices [:, :, prompt_mel_len:].

    finalize=False semantics (reference flow.py:401-404): the trailing
    pre_lookahead_len tokens are conv context only and emit no mel frames.
    For exact-shape calls the split happens here; for bucket-padded streaming
    calls pass `emit_valid` marking the emitting (non-context) tokens —
    context tokens stay in `token_valid` so the lookahead conv sees them,
    while their mel frames are attention-masked and sliced off by the
    caller."""
    n_timesteps = n_timesteps or cfg.n_timesteps
    if finalize or emit_valid is not None:
        h = encode_tokens(params, cfg, token, token_valid)
    else:
        la = cfg.pre_lookahead_len
        h = encode_tokens(
            params, cfg, token[:, :-la], token_valid[:, :-la], context_token=token[:, -la:]
        )
    t_mel = h.shape[1]
    mel_dim = cfg.output_size
    b = token.shape[0]

    spks = project_speaker(params, embedding)

    # conds: prompt mel occupies the first prompt_mel_len frames (flow.py:412-417)
    # prompt_mel_len is a scalar (shared prompt) or (B,) (per-row prompts in
    # the flash batch — batched zero-shot cloning)
    frame = jnp.arange(t_mel)
    in_prompt = frame[None, :] < jnp.reshape(jnp.asarray(prompt_mel_len), (-1, 1))
    pf = jnp.zeros((b, t_mel, mel_dim), h.dtype)
    lp = prompt_feat.shape[1]
    if lp > 0:
        pf_src = jnp.pad(prompt_feat.astype(h.dtype), ((0, 0), (0, max(t_mel - lp, 0)), (0, 0)))
        pf_src = jnp.broadcast_to(pf_src[:, :t_mel], (b, t_mel, mel_dim))
        pf = jnp.where(in_prompt[:, :, None], pf_src, pf)
    conds = jnp.swapaxes(pf, 1, 2)  # (B, 80, T)

    mask_src = emit_valid if emit_valid is not None else token_valid
    mask = mask_src.astype(jnp.float32)
    mask = jnp.repeat(mask, cfg.token_mel_ratio, axis=1)[:, None, :t_mel]  # (B, 1, T)

    z = jnp.broadcast_to(
        params["rand_noise"][:, :, :t_mel], (b, cfg.output_size, t_mel)
    ).astype(jnp.float32)
    mu = jnp.swapaxes(h, 1, 2)
    return solve_euler(params, cfg, z, mu, mask, spks, conds, n_timesteps, streaming)


def compute_loss(
    params: dict,
    cfg: FlowConfig,
    rng: jax.Array,
    token: jnp.ndarray,  # (B, Lt)
    token_len: jnp.ndarray,  # (B,)
    feat: jnp.ndarray,  # (B, T_mel, 80) target mel, T_mel == Lt * ratio
    feat_len: jnp.ndarray,  # (B,)
    embedding: jnp.ndarray,  # (B, 192)
    streaming: bool = False,
) -> jnp.ndarray:
    """CFM training loss (flow.py:312-365 + flow_matching.py:155-194):
    random cosine t, OT interpolant, CFG condition dropout, masked MSE."""
    rng_t, rng_z, rng_cfg, rng_cond, rng_idx, rng_drop = jax.random.split(rng, 6)
    b, t_mel, mel_dim = feat.shape

    token_valid = jnp.arange(token.shape[1])[None, :] < token_len[:, None]
    h = encode_tokens(params, cfg, token, token_valid)[:, :t_mel]
    mu = jnp.swapaxes(h, 1, 2)
    spks = project_speaker(params, embedding)

    x1 = jnp.swapaxes(feat, 1, 2).astype(jnp.float32)  # (B, 80, T)
    feat_valid = (jnp.arange(t_mel)[None, :] < feat_len[:, None]).astype(jnp.float32)
    mask = feat_valid[:, None, :]

    t = jax.random.uniform(rng_t, (b, 1, 1))
    if cfg.t_scheduler == "cosine":
        t = 1.0 - jnp.cos(t * 0.5 * jnp.pi)
    z = jax.random.normal(rng_z, x1.shape)
    y = (1.0 - (1.0 - cfg.sigma_min) * t) * z + t * x1
    u = x1 - (1.0 - cfg.sigma_min) * z

    # 50% of samples carry a random mel prefix as conditioning (flow.py:346-353)
    use_cond = jax.random.uniform(rng_cond, (b,)) >= 0.5
    prefix = (
        jax.random.uniform(rng_idx, (b,)) * 0.3 * feat_len.astype(jnp.float32)
    ).astype(jnp.int32)
    cond_sel = use_cond[:, None] & (jnp.arange(t_mel)[None, :] < prefix[:, None])
    cond = jnp.where(cond_sel[:, None, :], x1, 0.0)

    if cfg.training_cfg_rate > 0:
        keep = jax.random.uniform(rng_cfg, (b,)) > cfg.training_cfg_rate
        mu = mu * keep[:, None, None]
        spks = spks * keep[:, None]
        cond = cond * keep[:, None, None]

    pred = dit.forward(
        params["estimator"], cfg.estimator, y, mask, mu, t[:, 0, 0], spks, cond,
        streaming=streaming,
        dropout_rng=rng_drop, dropout_rate=cfg.estimator.dropout_rate,
    ).astype(jnp.float32)
    num = jnp.sum(((pred - u) * mask) ** 2)
    return num / (jnp.maximum(jnp.sum(mask), 1.0) * mel_dim)
