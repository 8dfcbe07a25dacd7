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


def _split_micro(tree, k: int):
    """Reshape every leaf (B, ...) -> (k, B//k, ...) for accumulation."""
    def _s(x):
        if x.shape[0] % k:
            raise ValueError(
                f"batch dim {x.shape[0]} not divisible by accum_steps {k}")
        return x.reshape(k, x.shape[0] // k, *x.shape[1:])
    return jax.tree.map(_s, tree)


def _scan_accum(vg, params, xs, k: int):
    """Run value_and_grad over k micro-batches with lax.scan, summing grads
    (f32) and scalar metrics; the FIRST aux element stacks as a scan output
    (the GAN gen half's per-micro fakes), the second averages as metrics.
    The GAN twin of steps._value_and_grad_accum (same f32-sum scan,
    eval_shape zero-init, mean-over-micros convention — keep the two
    bit-compatible); reference GAN accumulation: executor.train_one_epoc_gan
    + batch_backward loss/accum scaling, train_utils.py:277-291."""
    def body(carry, x):
        gsum, lsum, msum = carry
        (loss, (stacked, scal)), g = vg(params, x)
        gsum = jax.tree.map(lambda a, b: a + b.astype(jnp.float32), gsum, g)
        msum = jax.tree.map(lambda a, b: a + b.astype(jnp.float32), msum, scal)
        return (gsum, lsum + loss.astype(jnp.float32), msum), stacked

    x0 = jax.tree.map(lambda v: v[0], xs)
    (_, (stack_shape, scal_shape)), _ = jax.eval_shape(
        lambda p: vg(p, x0), params)
    init = (
        jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32), params),
        jnp.float32(0.0),
        jax.tree.map(lambda s: jnp.zeros(s.shape, jnp.float32), scal_shape),
    )
    (gsum, lsum, msum), stacked = jax.lax.scan(body, init, xs)
    grads = jax.tree.map(lambda g, p: (g / k).astype(p.dtype), gsum, params)
    scal = jax.tree.map(lambda a: a / k, msum)
    return lsum / k, scal, grads, stacked


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
    accum_steps: int = 1,
):
    """Generator half of the split two-program GAN step (see
    gan_train_step_split).  Returns (new_gen_state, fake_sg, metrics).
    The discriminator forward inside the loss is rematerialized
    (jax.checkpoint) so the generator backward does not keep both
    discriminators' activations live.  accum_steps > 1 scans the backward
    over micro-batches (one micro-batch of GAN activations live at a time)
    and returns the micro fakes restitched to (B, T) so the disc half can
    re-split them identically."""
    from .steps import _apply_grads

    disc_fwd = jax.checkpoint(lambda w: disc_model.forward(disc_params, w))

    def gen_loss_fn(gp, mb_rng):
        mb, r = mb_rng
        mel = jnp.swapaxes(mb["speech_feat"], 1, 2)
        real = mb["speech"]
        pitch = mb.get("pitch_feat")
        f0 = hift_model.predict_f0(gp, mel)
        f0_up = jnp.repeat(f0, hift_cfg.upsample_scale, axis=-1)[..., None]
        s, _ = hift_model.sine_source(r, hift_cfg, f0_up)
        sine = jnp.tanh(hift_model.linear(gp["m_source_linear"], s))
        fake = hift_model.decode(gp, hift_cfg, mel, jnp.swapaxes(sine, 1, 2))
        real_scores, real_fmaps = disc_fwd(real)
        fake_scores, fake_fmaps = disc_fwd(fake)
        adv = generator_adv_loss(fake_scores)
        fm = feature_loss(real_fmaps, fake_fmaps)
        mel_l = multi_mel_loss(real, fake, hift_cfg.sampling_rate) * mel_weight
        tpr = tpr_loss(real_scores, fake_scores, tpr_tau) * tpr_weight
        # jnp scalar (not Python 0.0): the accum scan's metric summing calls
        # .astype on every aux leaf, and carries must be arrays either way
        f0_l = (jnp.mean(jnp.abs(f0 - pitch)) if pitch is not None
                else jnp.float32(0.0))
        total = adv + fm + mel_l + tpr + f0_l
        return total, (fake, dict(adv=adv, fm=fm, mel=mel_l, tpr=tpr, f0=f0_l))

    vg = jax.value_and_grad(gen_loss_fn, has_aux=True)
    if accum_steps <= 1:
        (g_loss, (fake, parts)), g_grads = vg(gen_state.params, (batch, rng))
    else:
        k = int(accum_steps)
        xs = (_split_micro(batch, k), jax.random.split(rng, k))
        g_loss, parts, g_grads, fake_k = _scan_accum(
            vg, gen_state.params, xs, k)
        fake = fake_k.reshape(-1, *fake_k.shape[2:])  # (k, mb, T) -> (B, T)
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
    accum_steps: int = 1,
):
    """Discriminator half of the split step. Returns (new_disc_state, metrics).
    accum_steps must match the gen half's so the micro boundaries of real
    and fake line up (both reshape (B, T) -> (k, B//k, T) row-contiguously)."""
    from .steps import _apply_grads

    def disc_loss_fn(dp, rf):
        r, f = rf
        real_scores, _ = disc_model.forward(dp, r)
        fake_scores, _ = disc_model.forward(dp, f)
        d = discriminator_loss(real_scores, fake_scores)
        if tpr_weight > 0:
            d = d + tpr_loss(real_scores, fake_scores, tpr_tau) * tpr_weight
        return d, (jnp.float32(0.0), {})

    vg = jax.value_and_grad(disc_loss_fn, has_aux=True)
    if accum_steps <= 1:
        (d_loss, _), d_grads = vg(disc_state.params, (real, fake_sg))
    else:
        k = int(accum_steps)
        xs = (_split_micro(real, k), _split_micro(fake_sg, k))
        d_loss, _, d_grads, _ = _scan_accum(vg, disc_state.params, xs, k)
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
    accum_steps: int = 1,
) -> Tuple[object, object, dict]:
    """One generator + one discriminator update (executor.py:88-145 order:
    generator first, then discriminator on the detached sample).  Composes
    the two split halves into one program — jit this whole function for the
    fused single-dispatch form, or jit the halves separately when the host's
    XLA compiler can't take the fused G+D graph (train_hift --split_step).

    Note the composition inherits the gen half's disc-forward remat
    (jax.checkpoint): the gen backward recomputes both discriminator
    forwards instead of holding their activations.  That trades a little
    recompute for the bounded memory that lets the big G+D graphs compile
    at all — deliberate, since the fused form targets exactly the memory-
    constrained case (the earlier activation-holding fused step is what
    killed the remote compiler)."""
    new_gen, fake_sg, gmetrics = gan_gen_step(
        gen_state, disc_state.params, batch, rng, hift_cfg, gen_opt,
        mel_weight=mel_weight, tpr_weight=tpr_weight, tpr_tau=tpr_tau,
        accum_steps=accum_steps,
    )
    new_disc, dmetrics = gan_disc_step(
        disc_state, batch["speech"], fake_sg, disc_opt,
        tpr_weight=tpr_weight, tpr_tau=tpr_tau, accum_steps=accum_steps,
    )
    return new_gen, new_disc, {**gmetrics, **dmetrics}
