"""Vocoder GAN training: losses + two-optimizer train step.

Reimplements the reference HiFiGan wrapper objective (hifigan/hifigan.py:9-67):
  gen loss = adv(LSGAN) + 2.0 * feature-match + 45 * multi-res mel L1
             + 1.0 * TPR + F0 L1
  disc loss = LSGAN real/fake (+ TPR) (utils/losses.py:6-22,
  matcha/hifigan/models.py feature_loss/generator_loss/discriminator_loss).

The generator here is the HiFT model (models/hift.py); both models train
with separate optax optimizers in one jitted step (the reference's WeNet
GAN executor two-optimizer loop, utils/executor.py:88-145)."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import optax

from ..models import discriminator as disc_model
from ..models import hift as hift_model
from ..utils.audio import mel_spectrogram

MEL_TRANSFORMS = (  # (n_fft, num_mels, hop, win) multi-res mel set
    (1024, 80, 256, 1024),
    (2048, 80, 512, 2048),
    (512, 80, 128, 512),
)


def discriminator_loss(real_scores, fake_scores):
    """LSGAN: mean((1-Dr)^2) + mean(Dg^2) (matcha/hifigan/models.py:352)."""
    loss = 0.0
    for dr, dg in zip(real_scores, fake_scores):
        loss += jnp.mean((1.0 - dr) ** 2) + jnp.mean(dg ** 2)
    return loss


def generator_adv_loss(fake_scores):
    return sum(jnp.mean((1.0 - dg) ** 2) for dg in fake_scores)


def feature_loss(real_fmaps, fake_fmaps):
    """L1 feature matching * 2 (matcha/hifigan/models.py:340)."""
    loss = 0.0
    for fr, ff in zip(real_fmaps, fake_fmaps):
        for r, f in zip(fr, ff):
            loss += jnp.mean(jnp.abs(r - f))
    return loss * 2.0


def tpr_loss(real_scores, fake_scores, tau: float = 0.04):
    """Relativistic truncated-pointwise loss (utils/losses.py:6-13)."""
    loss = 0.0
    for dr, dg in zip(real_scores, fake_scores):
        diff = dr - dg
        m = jnp.median(diff)
        mask = dr < dg + m
        sq = ((diff - m) ** 2) * mask
        l_rel = jnp.sum(sq) / jnp.maximum(jnp.sum(mask), 1)
        loss += tau - jax.nn.relu(tau - l_rel)
    return loss


def multi_mel_loss(real: jnp.ndarray, fake: jnp.ndarray, sample_rate: int) -> jnp.ndarray:
    """Multi-resolution mel L1 (utils/losses.py:15-21)."""
    loss = 0.0
    for n_fft, nm, hop, win in MEL_TRANSFORMS:
        mr = mel_spectrogram(real, n_fft, nm, sample_rate, hop, win)
        mf = mel_spectrogram(fake, n_fft, nm, sample_rate, hop, win)
        loss += jnp.mean(jnp.abs(mr - mf))
    return loss


def gan_gen_step(
    gen_state,
    disc_params,
    batch: dict,
    rng: jax.Array,
    hift_cfg,
    gen_opt: optax.GradientTransformation,
    *,
    mel_weight: float = 45.0,
    tpr_weight: float = 1.0,
    tpr_tau: float = 0.04,
):
    """Generator half of the split two-program GAN step (see
    gan_train_step_split).  Returns (new_gen_state, fake_sg, metrics).
    The discriminator forward inside the loss is rematerialized
    (jax.checkpoint) so the generator backward does not keep both
    discriminators' activations live."""
    from .steps import _apply_grads

    mel = jnp.swapaxes(batch["speech_feat"], 1, 2)
    real = batch["speech"]
    pitch = batch.get("pitch_feat")
    disc_fwd = jax.checkpoint(lambda w: disc_model.forward(disc_params, w))

    def gen_loss_fn(gp):
        f0 = hift_model.predict_f0(gp, mel)
        f0_up = jnp.repeat(f0, hift_cfg.upsample_scale, axis=-1)[..., None]
        s, _ = hift_model.sine_source(rng, hift_cfg, f0_up)
        sine = jnp.tanh(hift_model.linear(gp["m_source_linear"], s))
        fake = hift_model.decode(gp, hift_cfg, mel, jnp.swapaxes(sine, 1, 2))
        real_scores, real_fmaps = disc_fwd(real)
        fake_scores, fake_fmaps = disc_fwd(fake)
        adv = generator_adv_loss(fake_scores)
        fm = feature_loss(real_fmaps, fake_fmaps)
        mel_l = multi_mel_loss(real, fake, hift_cfg.sampling_rate) * mel_weight
        tpr = tpr_loss(real_scores, fake_scores, tpr_tau) * tpr_weight
        f0_l = jnp.mean(jnp.abs(f0 - pitch)) if pitch is not None else 0.0
        total = adv + fm + mel_l + tpr + f0_l
        return total, (fake, dict(adv=adv, fm=fm, mel=mel_l, tpr=tpr, f0=f0_l))

    (g_loss, (fake, parts)), g_grads = jax.value_and_grad(
        gen_loss_fn, has_aux=True)(gen_state.params)
    new_gen, g_norm = _apply_grads(gen_state, g_grads, gen_opt)
    metrics = {"gen_loss": g_loss, "gen_grad_norm": g_norm, **parts}
    return new_gen, jax.lax.stop_gradient(fake), metrics


def gan_disc_step(
    disc_state,
    real: jnp.ndarray,
    fake_sg: jnp.ndarray,
    disc_opt: optax.GradientTransformation,
    *,
    tpr_weight: float = 1.0,
    tpr_tau: float = 0.04,
):
    """Discriminator half of the split step. Returns (new_disc_state, metrics)."""
    from .steps import _apply_grads

    def disc_loss_fn(dp):
        real_scores, _ = disc_model.forward(dp, real)
        fake_scores, _ = disc_model.forward(dp, fake_sg)
        d = discriminator_loss(real_scores, fake_scores)
        if tpr_weight > 0:
            d = d + tpr_loss(real_scores, fake_scores, tpr_tau) * tpr_weight
        return d

    d_loss, d_grads = jax.value_and_grad(disc_loss_fn)(disc_state.params)
    new_disc, d_norm = _apply_grads(disc_state, d_grads, disc_opt)
    return new_disc, {"disc_loss": d_loss, "disc_grad_norm": d_norm}


def gan_train_step(
    gen_state,
    disc_state,
    batch: dict,  # speech_feat (B, Tm, 80), pitch_feat (B, Tm), speech (B, T)
    rng: jax.Array,
    hift_cfg,
    gen_opt: optax.GradientTransformation,
    disc_opt: optax.GradientTransformation,
    *,
    mel_weight: float = 45.0,
    tpr_weight: float = 1.0,
    tpr_tau: float = 0.04,
) -> Tuple[object, object, dict]:
    """One generator + one discriminator update (executor.py:88-145 order:
    generator first, then discriminator on the detached sample)."""
    from .steps import TrainState, _apply_grads

    mel = jnp.swapaxes(batch["speech_feat"], 1, 2)  # (B, 80, Tm)
    real = batch["speech"]
    pitch = batch.get("pitch_feat")

    def gen_loss_fn(gp):
        f0 = hift_model.predict_f0(gp, mel)
        f0_up = jnp.repeat(f0, hift_cfg.upsample_scale, axis=-1)[..., None]
        s, _ = hift_model.sine_source(rng, hift_cfg, f0_up)
        sine = jnp.tanh(hift_model.linear(gp["m_source_linear"], s))
        fake = hift_model.decode(gp, hift_cfg, mel, jnp.swapaxes(sine, 1, 2))

        real_scores, real_fmaps = disc_model.forward(disc_state.params, real)
        fake_scores, fake_fmaps = disc_model.forward(disc_state.params, fake)
        adv = generator_adv_loss(fake_scores)
        fm = feature_loss(real_fmaps, fake_fmaps)
        mel_l = multi_mel_loss(real, fake, hift_cfg.sampling_rate) * mel_weight
        tpr = tpr_loss(real_scores, fake_scores, tpr_tau) * tpr_weight
        f0_l = jnp.mean(jnp.abs(f0 - pitch)) if pitch is not None else 0.0
        total = adv + fm + mel_l + tpr + f0_l
        return total, (fake, dict(adv=adv, fm=fm, mel=mel_l, tpr=tpr, f0=f0_l))

    (g_loss, (fake, parts)), g_grads = jax.value_and_grad(gen_loss_fn, has_aux=True)(
        gen_state.params
    )
    new_gen, g_norm = _apply_grads(gen_state, g_grads, gen_opt)

    fake_sg = jax.lax.stop_gradient(fake)

    def disc_loss_fn(dp):
        real_scores, _ = disc_model.forward(dp, real)
        fake_scores, _ = disc_model.forward(dp, fake_sg)
        d = discriminator_loss(real_scores, fake_scores)
        if tpr_weight > 0:
            d = d + tpr_loss(real_scores, fake_scores, tpr_tau) * tpr_weight
        return d

    d_loss, d_grads = jax.value_and_grad(disc_loss_fn)(disc_state.params)
    new_disc, d_norm = _apply_grads(disc_state, d_grads, disc_opt)

    metrics = {"gen_loss": g_loss, "disc_loss": d_loss,
               "gen_grad_norm": g_norm, "disc_grad_norm": d_norm, **parts}
    return new_gen, new_disc, metrics
