"""Native frontend-model training: FSQ autoencoder + AAM speaker encoder
(train/train_frontend.py — the TPU-native path to real zero-shot weights;
the reference ships these only as frozen ONNX blobs)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowmirror_hydravox_tpu.frontend import speech_tokenizer as st

pytestmark = pytest.mark.quick

TOK_CFG = st.SpeechTokenizerConfig(dim=64, num_layers=2, num_heads=4)
SPK_CFG = st.SpeakerEncoderConfig(dim=32, num_layers=2)


def test_fsq_ste_grads_and_codes():
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 8))
    q = st.fsq_quantize_ste(z, TOK_CFG.fsq_levels)
    assert q.shape == z.shape
    # quantized values live on the lattice in [-1, 1]
    lv = np.asarray(TOK_CFG.fsq_levels, np.float32)
    half = (lv - 1) / 2
    onehalf = np.round(np.asarray(q) * half) / half
    np.testing.assert_allclose(np.asarray(q), onehalf, atol=1e-6)
    # straight-through: gradient of sum(q) wrt z equals tanh' (nonzero)
    g = jax.grad(lambda z: jnp.sum(st.fsq_quantize_ste(z, TOK_CFG.fsq_levels)))(z)
    assert np.abs(np.asarray(g)).max() > 0


def test_tokenizer_autoencoder_loss_decreases():
    import optax

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {
        "enc": st.init_tokenizer_params(k1, TOK_CFG),
        "dec": st.init_decoder_params(k2, TOK_CFG),
    }
    # smooth, compressible targets (noise has no structure to reconstruct
    # through the 4x-downsampled bottleneck — its loss floors at the variance)
    t = np.arange(32) / 32.0
    f = np.arange(128)[:, None] / 128.0
    mel = jnp.asarray(np.stack([
        np.sin(2 * np.pi * (2 * t[None, :] + k * f)) * 0.5 for k in (1, 3)
    ], dtype=np.float32))
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(
            lambda p: st.tokenizer_recon_loss(p["enc"], p["dec"], TOK_CFG, mel)
        )(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(30):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, losses[:: len(losses) - 1]
    # the trained encoder still produces valid token ids
    toks = st.tokenize_mel(params["enc"], TOK_CFG, mel)
    n_codes = int(np.prod(TOK_CFG.fsq_levels))
    assert (np.asarray(toks) >= 0).all() and (np.asarray(toks) < n_codes).all()


def test_aam_speaker_loss_decreases():
    import optax

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {
        "spk": st.init_speaker_params(k1, SPK_CFG),
        "classifier": jax.random.normal(k2, (4, SPK_CFG.embed_dim)) * 0.05,
    }
    # separable synthetic features: distinct per-speaker spectral patterns
    rng = np.random.default_rng(0)
    labels = np.repeat(np.arange(4), 4).astype(np.int32)
    mel = np.stack([
        np.float32(rng.standard_normal((80, 40)) * 0.1 + np.sin(
            np.arange(80) * (l + 1))[:, None])
        for l in labels
    ])
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            emb = st.speaker_embedding(p["spk"], SPK_CFG, jnp.asarray(mel))
            loss, acc = st.aam_softmax_loss(emb, p["classifier"], jnp.asarray(labels))
            return loss, acc

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, acc

    first = None
    for i in range(40):
        params, opt_state, loss, acc = step(params, opt_state)
        if first is None:
            first = float(loss)
    assert np.isfinite(float(loss))
    assert float(loss) < first
    assert float(acc) == 1.0  # separable toy data must be fully classified


def test_train_frontend_cli_smoke(tmp_path):
    from flowmirror_hydravox_tpu.train.train_frontend import main

    out = tmp_path / "tok"
    main([
        "--model", "tokenizer", "--synthetic", "--tiny",
        "--output_dir", str(out), "--batch_size", "2", "--seconds", "0.5",
        "--max_steps", "2", "--logging_steps", "1",
    ])
    assert (out / "tokenizer.npz").exists() and (out / "tokenizer_full.npz").exists()

    out2 = tmp_path / "spk"
    main([
        "--model", "speaker", "--synthetic", "--tiny",
        "--output_dir", str(out2), "--batch_size", "4", "--seconds", "0.5",
        "--n_speakers", "3", "--max_steps", "2", "--logging_steps", "1",
    ])
    assert (out2 / "speaker.npz").exists()

    # trained encoder weights hot-plug into the serving Frontend via env
    from flowmirror_hydravox_tpu.config import tiny_config
    from flowmirror_hydravox_tpu.frontend.frontend import Frontend

    os.environ["HYDRAVOX_SPEAKER_NPZ"] = str(out2 / "speaker.npz")
    try:
        fe = Frontend(tiny_config())
        # tiny CLI config != serving config shapes -> loader should raise or
        # the env path should load cleanly when shapes match; here we only
        # assert construction doesn't crash with the env set
        assert fe.speaker_params is not None
    finally:
        del os.environ["HYDRAVOX_SPEAKER_NPZ"]
