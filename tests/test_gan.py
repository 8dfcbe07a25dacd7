"""GAN vocoder training: discriminator shapes, loss semantics, joint step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowmirror_hydravox_tpu.config import tiny_config
from flowmirror_hydravox_tpu.models import discriminator as disc
from flowmirror_hydravox_tpu.models import hift
from flowmirror_hydravox_tpu.train import gan
from flowmirror_hydravox_tpu.train.steps import OptimConfig, init_state, make_optimizer

HIFT_CFG = tiny_config().hift


def test_discriminator_forward():
    p = disc.init_params(jax.random.PRNGKey(0))
    wav = jax.random.normal(jax.random.PRNGKey(1), (2, 4800)) * 0.1
    scores, fmaps = disc.forward(p, wav)
    assert len(scores) == len(disc.PERIODS) + len(disc.SPEC_RESOLUTIONS)
    assert len(fmaps) == len(scores)
    for s in scores:
        assert s.shape[0] == 2 and np.isfinite(np.asarray(s)).all()


def test_lsgan_losses():
    real = [jnp.ones((2, 10))]
    fake = [jnp.zeros((2, 10))]
    # perfect discriminator -> zero loss
    assert float(gan.discriminator_loss(real, fake)) == 0.0
    # generator wants fake -> 1
    assert float(gan.generator_adv_loss([jnp.ones((2, 10))])) == 0.0
    assert float(gan.generator_adv_loss([jnp.zeros((2, 10))])) == 1.0


def test_feature_and_mel_losses():
    f_a = [[jnp.ones((1, 2, 3, 4))]]
    f_b = [[jnp.zeros((1, 2, 3, 4))]]
    assert float(gan.feature_loss(f_a, f_b)) == pytest.approx(2.0)
    wav = jax.random.normal(jax.random.PRNGKey(0), (1, 4800)) * 0.1
    assert float(gan.multi_mel_loss(wav, wav, 24000)) == 0.0
    assert float(gan.multi_mel_loss(wav, wav * 0.5, 24000)) > 0.0


def test_gan_train_step_updates_both():
    t_mel = 8
    gen_params = hift.init_params(jax.random.PRNGKey(0), HIFT_CFG, jnp.float32)
    disc_params = disc.init_params(jax.random.PRNGKey(1))
    gen_opt = make_optimizer(OptimConfig(learning_rate=1e-4, warmup_steps=1, total_steps=10))
    disc_opt = make_optimizer(OptimConfig(learning_rate=1e-4, warmup_steps=1, total_steps=10))
    gen_state = init_state(gen_params, gen_opt)
    disc_state = init_state(disc_params, disc_opt)

    rng = jax.random.PRNGKey(2)
    batch = {
        "speech_feat": jax.random.normal(rng, (1, t_mel, 80)) * 0.3,
        "speech": jax.random.normal(rng, (1, t_mel * HIFT_CFG.upsample_scale)) * 0.1,
        "pitch_feat": jnp.abs(jax.random.normal(rng, (1, t_mel))) * 100,
    }
    # two steps: the warmup schedule gives lr=0 at step 0
    new_gen, new_disc, metrics = gan.gan_train_step(
        gen_state, disc_state, batch, rng, HIFT_CFG, gen_opt, disc_opt
    )
    new_gen, new_disc, metrics = gan.gan_train_step(
        new_gen, new_disc, batch, rng, HIFT_CFG, gen_opt, disc_opt
    )
    assert np.isfinite(float(metrics["gen_loss"]))
    assert np.isfinite(float(metrics["disc_loss"]))
    assert np.isfinite(float(metrics["gen_grad_norm"]))
    # both models actually moved
    dg = float(jnp.max(jnp.abs(new_gen.params["conv_pre"]["w"] - gen_params["conv_pre"]["w"])))
    dd = float(jnp.max(jnp.abs(
        new_disc.params["mpd"][0]["convs"][0]["w"] - disc_params["mpd"][0]["convs"][0]["w"]
    )))
    assert dg > 0 and dd > 0


def test_gan_split_step_matches_fused():
    """gan_gen_step + gan_disc_step (the --split_step two-program variant,
    a remote-compiler-OOM workaround) must produce the same updates as the
    fused gan_train_step."""
    t_mel = 8
    gen_params = hift.init_params(jax.random.PRNGKey(0), HIFT_CFG, jnp.float32)
    disc_params = disc.init_params(jax.random.PRNGKey(1))
    gen_opt = make_optimizer(OptimConfig(learning_rate=1e-3, warmup_steps=0, total_steps=10))
    disc_opt = make_optimizer(OptimConfig(learning_rate=1e-3, warmup_steps=0, total_steps=10))
    rng = jax.random.PRNGKey(2)
    batch = {
        "speech_feat": jax.random.normal(rng, (1, t_mel, 80)) * 0.3,
        "speech": jax.random.normal(rng, (1, t_mel * HIFT_CFG.upsample_scale)) * 0.1,
        "pitch_feat": jnp.abs(jax.random.normal(rng, (1, t_mel))) * 100,
    }

    fused_g, fused_d, fused_m = gan.gan_train_step(
        init_state(gen_params, gen_opt), init_state(disc_params, disc_opt),
        batch, rng, HIFT_CFG, gen_opt, disc_opt)

    split_g, fake_sg, gm = gan.gan_gen_step(
        init_state(gen_params, gen_opt), disc_params, batch, rng, HIFT_CFG, gen_opt)
    split_d, dm = gan.gan_disc_step(
        init_state(disc_params, disc_opt), batch["speech"], fake_sg, disc_opt)

    np.testing.assert_allclose(float(gm["gen_loss"]), float(fused_m["gen_loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(dm["disc_loss"]), float(fused_m["disc_loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(split_g.params), jax.tree.leaves(fused_g.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    for a, b in zip(jax.tree.leaves(split_d.params), jax.tree.leaves(fused_d.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_gan_grad_accum_duplicated_micro_batches():
    """accum_steps=2 on a batch whose two micro-batches are identical: the
    disc update equals the unaccumulated update on the same batch (identical
    micro losses average to the full loss, incl. the per-micro tpr median),
    and the gen half's first-micro fake equals a solo accum=1 run on that
    micro with the matching rng split — proving the scan plumbing hands each
    micro its own rng and restitches fakes row-contiguously."""
    t_mel = 8
    gen_params = hift.init_params(jax.random.PRNGKey(0), HIFT_CFG, jnp.float32)
    disc_params = disc.init_params(jax.random.PRNGKey(1))
    gen_opt = make_optimizer(OptimConfig(learning_rate=1e-3, warmup_steps=0, total_steps=10))
    disc_opt = make_optimizer(OptimConfig(learning_rate=1e-3, warmup_steps=0, total_steps=10))
    rng = jax.random.PRNGKey(3)
    micro = {
        "speech_feat": jax.random.normal(rng, (2, t_mel, 80)) * 0.3,
        "speech": jax.random.normal(rng, (2, t_mel * HIFT_CFG.upsample_scale)) * 0.1,
        "pitch_feat": jnp.abs(jax.random.normal(rng, (2, t_mel))) * 100,
    }
    batch = jax.tree.map(lambda x: jnp.concatenate([x, x], 0), micro)

    # gen half: accum=2 vs solo accum=1 on micro 0 with rngs[0]
    rngs = jax.random.split(rng, 2)
    acc_gen, fake_acc, gm = gan.gan_gen_step(
        init_state(gen_params, gen_opt), disc_params, batch, rng, HIFT_CFG,
        gen_opt, accum_steps=2)
    solo_gen, fake_solo, _ = gan.gan_gen_step(
        init_state(gen_params, gen_opt), disc_params, micro, rngs[0],
        HIFT_CFG, gen_opt)
    assert fake_acc.shape == (4, t_mel * HIFT_CFG.upsample_scale)
    np.testing.assert_allclose(np.asarray(fake_acc[:2]), np.asarray(fake_solo),
                               atol=1e-6)
    assert np.isfinite(float(gm["gen_loss"]))

    # disc half: identical micros -> accum=2 update == accum=1 update
    d_acc, dm_acc = gan.gan_disc_step(
        init_state(disc_params, disc_opt), batch["speech"],
        jnp.concatenate([fake_solo, fake_solo], 0), disc_opt, accum_steps=2)
    d_one, dm_one = gan.gan_disc_step(
        init_state(disc_params, disc_opt), batch["speech"],
        jnp.concatenate([fake_solo, fake_solo], 0), disc_opt)
    np.testing.assert_allclose(float(dm_acc["disc_loss"]),
                               float(dm_one["disc_loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(d_acc.params), jax.tree.leaves(d_one.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_gan_gen_step_accum_without_pitch():
    """The accum scan sums aux metrics with .astype — a batch without
    pitch_feat must still work (f0 loss term is a jnp scalar, not a Python
    float)."""
    t_mel = 8
    gen_params = hift.init_params(jax.random.PRNGKey(0), HIFT_CFG, jnp.float32)
    disc_params = disc.init_params(jax.random.PRNGKey(1))
    gen_opt = make_optimizer(OptimConfig(learning_rate=1e-3, warmup_steps=0,
                                         total_steps=10, schedule="constant"))
    rng = jax.random.PRNGKey(4)
    batch = {
        "speech_feat": jax.random.normal(rng, (4, t_mel, 80)) * 0.3,
        "speech": jax.random.normal(rng, (4, t_mel * HIFT_CFG.upsample_scale)) * 0.1,
    }
    new_gen, fake_sg, metrics = gan.gan_gen_step(
        init_state(gen_params, gen_opt), disc_params, batch, rng, HIFT_CFG,
        gen_opt, accum_steps=2)
    assert np.isfinite(float(metrics["gen_loss"]))
    assert float(metrics["f0"]) == 0.0
    assert fake_sg.shape == (4, t_mel * HIFT_CFG.upsample_scale)


def test_gan_train_step_accum_runs():
    t_mel = 8
    gen_params = hift.init_params(jax.random.PRNGKey(0), HIFT_CFG, jnp.float32)
    disc_params = disc.init_params(jax.random.PRNGKey(1))
    # constant schedule: warmup_cosine is lr=0 at step 0 and this runs 1 step
    gen_opt = make_optimizer(OptimConfig(learning_rate=1e-3, warmup_steps=0,
                                         total_steps=10, schedule="constant"))
    disc_opt = make_optimizer(OptimConfig(learning_rate=1e-3, warmup_steps=0,
                                          total_steps=10, schedule="constant"))
    rng = jax.random.PRNGKey(2)
    batch = {
        "speech_feat": jax.random.normal(rng, (4, t_mel, 80)) * 0.3,
        "speech": jax.random.normal(rng, (4, t_mel * HIFT_CFG.upsample_scale)) * 0.1,
        "pitch_feat": jnp.abs(jax.random.normal(rng, (4, t_mel))) * 100,
    }
    new_gen, new_disc, metrics = jax.jit(
        lambda gs, ds, b, r: gan.gan_train_step(
            gs, ds, b, r, HIFT_CFG, gen_opt, disc_opt, accum_steps=2)
    )(init_state(gen_params, gen_opt), init_state(disc_params, disc_opt),
      batch, rng)
    for key in ("gen_loss", "disc_loss", "gen_grad_norm", "disc_grad_norm"):
        assert np.isfinite(float(metrics[key])), key
    dg = float(jnp.max(jnp.abs(new_gen.params["conv_pre"]["w"] - gen_params["conv_pre"]["w"])))
    assert dg > 0
