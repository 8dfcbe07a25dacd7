"""Conformer package + legacy (CV1/CV2) flow models."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowmirror_hydravox_tpu.models import flow_legacy
from flowmirror_hydravox_tpu.models.conformer import (
    ConformerConfig, encoder_forward, espnet_rel_pos, init_encoder_params,
    init_regulator_params, init_upsample_encoder_params, regulator_forward,
    upsample_encoder_forward,
)
from flowmirror_hydravox_tpu.models.matcha.decoder import MatchaDecoderConfig

TINY = ConformerConfig(
    input_size=32, output_size=32, attention_heads=4, linear_units=64,
    num_blocks=2, num_up_blocks=1, cnn_module_kernel=7, static_chunk_size=4,
)


def test_espnet_rel_pos_shape_and_symmetry():
    pe = espnet_rel_pos(5, 8)
    assert pe.shape == (9, 8)
    # center row is relative position 0: sin(0)=0, cos(0)=1 pattern
    np.testing.assert_allclose(pe[4, 0::2], 0.0, atol=1e-7)
    np.testing.assert_allclose(pe[4, 1::2], 1.0, atol=1e-7)


def test_encoder_forward_shapes():
    p = init_encoder_params(jax.random.PRNGKey(0), TINY, TINY.num_blocks)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 10, 32)) * 0.1
    out, valid = encoder_forward(p, TINY, x, jnp.asarray([10, 6]))
    assert out.shape == (2, 10, 32)
    assert np.isfinite(np.asarray(out)).all()
    assert valid[1, 6] == False  # noqa: E712


def test_upsample_encoder_doubles_length():
    p = init_upsample_encoder_params(jax.random.PRNGKey(0), TINY)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 32)) * 0.1
    out, valid = upsample_encoder_forward(p, TINY, x, jnp.asarray([8]))
    assert out.shape == (1, 16, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_regulator_interpolates():
    p = init_regulator_params(jax.random.PRNGKey(0), 16)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 16))
    out = regulator_forward(p, x, 12)
    assert out.shape == (1, 12, 16)


LEGACY_TINY = flow_legacy.LegacyFlowConfig(
    input_size=32, vocab_size=50, encoder=TINY,
    estimator=MatchaDecoderConfig(in_feats=80, channels=(32, 32), attention_head_dim=8,
                                  num_heads=4, num_mid_blocks=1, spk_emb_dim=80,
                                  use_cond=True, causal=True, static_chunk_size=8),
)


def test_cv2_flow_inference():
    params = flow_legacy.init_params(jax.random.PRNGKey(0), LEGACY_TINY)
    tok = jax.random.randint(jax.random.PRNGKey(1), (1, 8), 0, 50)
    emb = jax.random.normal(jax.random.PRNGKey(2), (1, 192))
    mel = flow_legacy.inference(
        params, LEGACY_TINY, jax.random.PRNGKey(3), tok, jnp.asarray([8]),
        jnp.zeros((1, 0, 80)), jnp.int32(0), emb, n_timesteps=2,
    )
    assert mel.shape == (1, 80, 16)
    assert np.isfinite(np.asarray(mel)).all()


def test_cv1_flow_inference():
    cfg = flow_legacy.LegacyFlowConfig(
        input_size=32, vocab_size=50, encoder=TINY, causal=False,
        estimator=MatchaDecoderConfig(in_feats=80, channels=(32, 32), attention_head_dim=8,
                                      num_heads=4, num_mid_blocks=1, spk_emb_dim=80,
                                      use_cond=True, causal=False),
    )
    params = flow_legacy.init_params(jax.random.PRNGKey(0), cfg)
    tok = jax.random.randint(jax.random.PRNGKey(1), (1, 8), 0, 50)
    emb = jax.random.normal(jax.random.PRNGKey(2), (1, 192))
    mel = flow_legacy.inference(
        params, cfg, jax.random.PRNGKey(3), tok, jnp.asarray([8]),
        jnp.zeros((1, 0, 80)), jnp.int32(0), emb, n_timesteps=2,
    )
    assert mel.shape == (1, 80, 16)


def test_cv2_flow_loss_and_grad():
    params = flow_legacy.init_params(jax.random.PRNGKey(0), LEGACY_TINY)
    rng = jax.random.PRNGKey(4)
    tok = jax.random.randint(rng, (2, 6), 0, 50)
    feat = jax.random.normal(rng, (2, 12, 80))
    emb = jax.random.normal(rng, (2, 192))
    loss = flow_legacy.compute_loss(
        params, LEGACY_TINY, rng, tok, jnp.asarray([6, 4]), feat,
        jnp.asarray([12, 8]), emb,
    )
    assert np.isfinite(float(loss))
