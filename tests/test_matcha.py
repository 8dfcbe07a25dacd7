"""Matcha-TTS stack: MAS parity (native vs numpy vs reference semantics),
encoder/decoder shapes, end-to-end synthesise, training losses."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowmirror_hydravox_tpu.models.matcha import cfm, mas, model, text_encoder, vocoder
from flowmirror_hydravox_tpu.models.matcha.decoder import MatchaDecoderConfig
from flowmirror_hydravox_tpu.models.matcha.model import MatchaConfig
from flowmirror_hydravox_tpu.models.matcha.text_encoder import MatchaEncoderConfig
from flowmirror_hydravox_tpu.models.matcha.vocoder import HiFiGANConfig

TINY = MatchaConfig(
    encoder=MatchaEncoderConfig(n_vocab=40, n_feats=16, n_channels=32,
                                filter_channels=64, filter_channels_dp=32,
                                n_heads=2, n_layers=2),
    decoder=MatchaDecoderConfig(in_feats=16, channels=(32, 32), attention_head_dim=8,
                                num_heads=4, n_blocks=1, num_mid_blocks=1),
    n_feats=16,
)


def test_mas_path_properties():
    rng = np.random.default_rng(0)
    b, tx, ty = 3, 5, 12
    value = rng.standard_normal((b, tx, ty)).astype(np.float32)
    mask = np.ones((b, tx, ty), np.float32)
    path = mas.maximum_path(value, mask)
    assert path.shape == (b, tx, ty)
    # each mel frame assigned to exactly one token
    np.testing.assert_array_equal(path.sum(axis=1), np.ones((b, ty)))
    # monotonic non-decreasing token index over time
    idx = path.argmax(axis=1)
    assert (np.diff(idx, axis=1) >= 0).all()
    # path starts at token 0 and ends at last token
    assert (idx[:, 0] == 0).all() and (idx[:, -1] == tx - 1).all()


def test_mas_native_matches_numpy():
    rng = np.random.default_rng(1)
    b, tx, ty = 2, 7, 20
    value = rng.standard_normal((b, tx, ty)).astype(np.float32)
    mask = np.zeros((b, tx, ty), np.float32)
    mask[0, :5, :15] = 1
    mask[1, :7, :20] = 1
    native = mas._load_native()
    numpy_paths = np.stack([
        mas._maximum_path_numpy((value[i] * mask[i]).copy(), int(mask[i].sum(0)[0]),
                                int(mask[i].sum(1)[0]))
        for i in range(b)
    ])
    got = mas.maximum_path(value, mask)
    if native is None:
        pytest.skip("no native kernel (g++ unavailable)")
    np.testing.assert_array_equal(got, numpy_paths)


def test_mas_maximizes_score():
    """DP result must beat a greedy monotonic path on total log-prior."""
    rng = np.random.default_rng(2)
    tx, ty = 4, 10
    value = rng.standard_normal((1, tx, ty)).astype(np.float32)
    mask = np.ones((1, tx, ty), np.float32)
    path = mas.maximum_path(value.copy(), mask)[0]
    best = (path * value[0]).sum()
    # uniform split path
    uniform = np.zeros((tx, ty))
    for y in range(ty):
        uniform[min(y * tx // ty, tx - 1), y] = 1
    assert best >= (uniform * value[0]).sum() - 1e-4


@pytest.fixture(scope="module")
def params():
    return model.init_params(jax.random.PRNGKey(0), TINY)


def test_synthesise_shapes(params):
    x = jnp.asarray([[1, 5, 9, 2, 0, 0]])
    out = model.synthesise(params, TINY, jax.random.PRNGKey(1), x, jnp.asarray([4]),
                           n_timesteps=2, max_mel_len=64)
    assert out["mel"].shape == (1, TINY.n_feats, 64)
    ml = int(out["mel_lengths"][0])
    assert 1 <= ml <= 64
    assert np.isfinite(np.asarray(out["mel"])).all()


def test_forward_loss_and_grad(params):
    rng = np.random.default_rng(3)
    x = jnp.asarray([[1, 5, 9, 2], [3, 7, 0, 0]])
    xl = jnp.asarray([4, 2])
    y = jnp.asarray(rng.standard_normal((2, TINY.n_feats, 24)), jnp.float32)
    yl = jnp.asarray([24, 16])
    attn = jnp.asarray(model.compute_alignment(params, TINY, np.asarray(x), np.asarray(xl),
                                               np.asarray(y), np.asarray(yl)))
    losses = model.forward_loss(params, TINY, jax.random.PRNGKey(2), x, xl, y, yl, attn)
    for k in ("dur_loss", "prior_loss", "diff_loss"):
        assert np.isfinite(float(losses[k])), k

    g = jax.grad(
        lambda p: model.forward_loss(p, TINY, jax.random.PRNGKey(2), x, xl, y, yl, attn)["loss"]
    )(params)
    gn = float(jnp.sqrt(sum(jnp.sum(l ** 2) for l in jax.tree.leaves(g))))
    assert np.isfinite(gn) and gn > 0


def test_vocoder_shapes():
    cfg = HiFiGANConfig(in_channels=16, upsample_initial_channel=32)
    p = vocoder.init_params(jax.random.PRNGKey(0), cfg)
    mel = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 20))
    wav = vocoder.forward(p, cfg, mel)
    assert wav.shape == (1, 20 * cfg.hop_length)
    w = np.asarray(wav)
    assert np.isfinite(w).all() and np.abs(w).max() <= 1.0


def test_matcha_demo_app_synth():
    """Web-demo equivalent of reference matcha/app.py: build_synth produces
    a waveform through the full text->MAS->CFM->HiFi-GAN path (tiny)."""
    from flowmirror_hydravox_tpu.models.matcha.app import build_synth

    synth = build_synth(tiny=True)
    wav, sr, dt = synth("hello demo", steps=2, temperature=0.667, speaking_rate=1.0)
    assert sr == 22050 and len(wav) > 0 and np.isfinite(wav).all()


# ---------------------------------------------------------------------------
# vocoder bias denoiser (reference matcha/hifigan/denoiser.py:1-64)


@pytest.mark.quick
def test_denoiser_torch_parity():
    """Our STFT-subtract-ISTFT chain must match the reference Denoiser math
    (torch.stft/istft, center=True, hann) on the same bias spectrum."""
    torch = pytest.importorskip("torch")
    from flowmirror_hydravox_tpu.models.matcha import denoiser as dn

    n_fft, n_overlap = 1024, 4
    hop = n_fft // n_overlap
    rng = np.random.default_rng(0)
    audio = rng.standard_normal((1, 8192)).astype(np.float32) * 0.1
    bias_audio = rng.standard_normal((1, 4096)).astype(np.float32) * 0.01
    win_t = torch.hann_window(n_fft)

    def stft_t(x):
        spec = torch.stft(torch.as_tensor(x), n_fft=n_fft, hop_length=hop,
                          win_length=n_fft, window=win_t, return_complex=True)
        return spec.abs(), spec.angle()

    # reference: bias = frame 0 of |STFT(bias audio)| (denoiser.py:52-56)
    bias_mag_t, _ = stft_t(bias_audio)
    bias_t = bias_mag_t[0, :, 0]
    strength = 0.005
    mag_t, ang_t = stft_t(audio)
    den_t = torch.clamp(mag_t - bias_t[None, :, None] * strength, 0.0)
    out_t = torch.istft(torch.complex(den_t * torch.cos(ang_t), den_t * torch.sin(ang_t)),
                        n_fft=n_fft, hop_length=hop, win_length=n_fft, window=win_t)

    win_j = jnp.asarray(np.asarray(win_t))
    bias_j = jnp.abs(dn._stft(jnp.asarray(bias_audio), n_fft, hop, win_j))[0, :, 0]
    np.testing.assert_allclose(np.asarray(bias_j), bias_t.numpy(), atol=1e-3)
    out_j = dn.denoise(jnp.asarray(audio), bias_j, strength=strength,
                       filter_length=n_fft, n_overlap=n_overlap)
    t = min(out_t.shape[-1], out_j.shape[-1])
    np.testing.assert_allclose(np.asarray(out_j)[0, :t], out_t.numpy()[0, :t],
                               atol=2e-3)


def test_denoiser_bias_spec_and_reduction():
    """make_bias_spec drives a real (tiny) vocoder; denoising the raw bias
    audio at strength 1 should strictly reduce its energy."""
    from flowmirror_hydravox_tpu.models.matcha import denoiser as dn

    voc_cfg = HiFiGANConfig(in_channels=8, upsample_initial_channel=16)
    voc_params = vocoder.init_params(jax.random.PRNGKey(0), voc_cfg)
    fn = lambda m: vocoder.forward(voc_params, voc_cfg, m)
    bias = dn.make_bias_spec(fn, n_mels=8, mode="zeros")
    assert bias.shape == (513,) and bool(jnp.all(jnp.isfinite(bias)))
    bias_audio = fn(jnp.zeros((1, 8, 88)))
    out = dn.denoise(bias_audio, bias, strength=1.0)
    assert float(jnp.mean(out ** 2)) < float(jnp.mean(bias_audio ** 2)) * 0.5


# ---------------------------------------------------------------------------
# G2P default cleaner (espeak replacement, reference matcha/text/cleaners.py:28)


@pytest.mark.quick
def test_g2p_phoneme_class_default():
    """Default text path yields IPA phoneme symbols, not raw characters."""
    from flowmirror_hydravox_tpu.models.matcha import text as mt
    from flowmirror_hydravox_tpu.models.matcha.g2p import G2P, arpa_to_ipa

    g = G2P()
    assert g("hello") == "həlˈoʊ"          # exception lexicon
    assert g("the cat") == "ðə kˈæt"        # lexicon + rules
    out = g("phonetics")                    # rules only (ph->F, tion-like)
    assert out.startswith("f") and all(ord(c) < 0x3000 for c in out)
    assert arpa_to_ipa(["HH", "AH0", "L", "OW1"]) == "həlˈoʊ"
    ids = mt.text_to_sequence("hello world")
    chars = mt.text_to_sequence("hello world", use_g2p=False)
    assert ids != chars
    # IPA symbols present (ids beyond the ascii letter block)
    letter_ids = {mt._symbol_to_id[c] for c in "abcdefghijklmnopqrstuvwxyz"}
    assert any(i not in letter_ids and i > 52 for i in ids)
    # punctuation / prosodic breaks survive
    assert mt._symbol_to_id[","] in mt.text_to_sequence("well, yes")


@pytest.mark.quick
def test_g2p_lexicon_override(tmp_path, monkeypatch):
    """HYDRAVOX_CMU_LEXICON entries take priority over rules."""
    lex = tmp_path / "lex.txt"
    lex.write_text("ZYZZYX  Z IH1 K S\n")
    monkeypatch.setenv("HYDRAVOX_CMU_LEXICON", str(lex))
    from flowmirror_hydravox_tpu.models.matcha.g2p import G2P

    assert G2P()("zyzzyx") == "zˈɪks"
