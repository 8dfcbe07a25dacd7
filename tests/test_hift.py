"""HiFT vocoder: tiny STFT/ISTFT parity vs torch, source generator sanity,
full mel->wav shape/finiteness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowmirror_hydravox_tpu.config import tiny_config
from flowmirror_hydravox_tpu.models import hift

CFG = tiny_config().hift


@pytest.fixture(scope="module")
def params():
    return hift.init_params(jax.random.PRNGKey(0), CFG, jnp.float32)


def test_stft_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 480)).astype(np.float32)
    n_fft, hop = 16, 4
    win = torch.hann_window(n_fft)
    spec = torch.stft(torch.from_numpy(x), n_fft, hop, n_fft, window=win, return_complex=True)
    ref_r, ref_i = spec.real.numpy(), spec.imag.numpy()
    got_r, got_i = hift._stft_16(jnp.asarray(x), n_fft, hop)
    np.testing.assert_allclose(np.asarray(got_r), ref_r, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_i), ref_i, atol=1e-4)


def test_istft_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    n_fft, hop = 16, 4
    tt = 121
    mag = np.abs(rng.standard_normal((2, n_fft // 2 + 1, tt))).astype(np.float32)
    phase = rng.standard_normal((2, n_fft // 2 + 1, tt)).astype(np.float32)
    real, imag = mag * np.cos(phase), mag * np.sin(phase)
    win = torch.hann_window(n_fft)
    ref = torch.istft(
        torch.complex(torch.from_numpy(real), torch.from_numpy(imag)),
        n_fft, hop, n_fft, window=win,
    ).numpy()
    got = np.asarray(hift._istft_16(jnp.asarray(real), jnp.asarray(imag), n_fft, hop))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_interp_linear_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 3, 480)).astype(np.float32)
    ref_down = F.interpolate(torch.from_numpy(x), scale_factor=1 / 480, mode="linear").numpy()
    got_down = np.asarray(hift._interp_linear(jnp.asarray(x), 1))
    np.testing.assert_allclose(got_down, ref_down, atol=1e-5)

    y = rng.standard_normal((1, 3, 5)).astype(np.float32)
    ref_up = F.interpolate(torch.from_numpy(y), scale_factor=4, mode="linear").numpy()
    got_up = np.asarray(hift._interp_linear(jnp.asarray(y), 20))
    np.testing.assert_allclose(got_up, ref_up, atol=1e-5)


def test_sine_source_voiced_unvoiced():
    rng = jax.random.PRNGKey(0)
    t_mel = 8
    up = CFG.upsample_scale
    f0 = jnp.concatenate(
        [jnp.full((1, t_mel // 2 * up, 1), 220.0), jnp.zeros((1, t_mel // 2 * up, 1))], axis=1
    )
    src, uv = hift.sine_source(rng, CFG, f0)
    assert src.shape == (1, t_mel * up, CFG.nb_harmonics + 1)
    # voiced region: bounded harmonic sines + small noise
    voiced = np.asarray(src[0, : t_mel // 2 * up, 0])
    assert np.abs(voiced).max() <= CFG.nsf_alpha * 1.5
    # unvoiced region: pure noise with std ~ alpha/3
    unvoiced = np.asarray(src[0, t_mel // 2 * up :, 0])
    assert 0.2 * CFG.nsf_alpha / 3 < unvoiced.std() < 3 * CFG.nsf_alpha / 3
    np.testing.assert_array_equal(np.asarray(uv[0, :, 0] > 0),
                                  np.asarray(f0[0, :, 0] > CFG.nsf_voiced_threshold))


def test_inference_shape(params):
    t_mel = 12
    mel = jax.random.normal(jax.random.PRNGKey(1), (1, 80, t_mel)) * 0.5
    wav = hift.inference(params, CFG, mel)
    assert wav.shape == (1, t_mel * CFG.upsample_scale)  # 480 samples / frame
    w = np.asarray(wav)
    assert np.isfinite(w).all()
    assert np.abs(w).max() <= CFG.audio_limit + 1e-6


def test_causal_inference_shapes(params):
    """finalize=True emits T*480 samples; finalize=False consumes the 7-frame
    lookahead and trims hop*upsample at the tail."""
    t_mel = 24
    mel = jax.random.normal(jax.random.PRNGKey(4), (1, 80, t_mel)) * 0.5
    wav_full = hift.inference_causal(params, CFG, mel, finalize=True)
    assert wav_full.shape == (1, t_mel * CFG.upsample_scale)
    assert np.isfinite(np.asarray(wav_full)).all()

    wav_part = hift.inference_causal(params, CFG, mel, finalize=False)
    up_prod = 1
    for r in CFG.upsample_rates:
        up_prod *= r
    lookahead = hift.f0_look_right(params) + hift.conv_pre_look_right(params)
    expect = (t_mel - lookahead) * CFG.upsample_scale - up_prod * CFG.istft_hop_len
    assert wav_part.shape == (1, expect)


def test_causal_streaming_prefix_consistency(params):
    """Growing-prefix calls must reproduce earlier samples (the reference's
    chunked-equivalence harness, generator.py:729-746): deterministic fixed
    noise buffers make re-runs of a prefix identical."""
    t_mel = 40
    mel = jax.random.normal(jax.random.PRNGKey(5), (1, 80, t_mel)) * 0.5
    full = np.asarray(hift.inference_causal(params, CFG, mel, finalize=True))

    chunk = 10
    ctx = hift.f0_look_right(params) + hift.conv_pre_look_right(params)
    up = CFG.upsample_scale
    max_err = 0.0
    for i in range(0, t_mel, chunk):
        end = i + chunk + ctx
        finalize = end >= t_mel
        part = np.asarray(
            hift.inference_causal(params, CFG, mel[:, :, : min(end, t_mel)],
                                  finalize=finalize)
        )
        seg = part[:, i * up :]
        ref_seg = full[:, i * up : i * up + seg.shape[1]]
        if seg.shape[1]:
            max_err = max(max_err, float(np.abs(seg - ref_seg).max()))
    # causal convs guarantee prefix outputs agree up to istft edge effects
    assert max_err < 5e-2, max_err
