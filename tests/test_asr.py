"""Native CTC ASR (preprocess/asr_model.py + train/train_asr.py).

Covers: greedy CTC collapse, forward shapes + pad-frame invariance, CTC
training progress on the synthetic segment corpus, the shipped demo
checkpoint's held-out accuracy, and the transcribe-stage `--asr_module
native` integration (reference ASR-worker role,
scripts/preprocess/transcribe_to_dataset.py:219-418)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flowmirror_hydravox_tpu.preprocess import asr_model
from flowmirror_hydravox_tpu.train.synth_speech import (
    FRIC_SYMBOLS, VOWEL_SYMBOLS, synth_utterance_with_mask,
    synth_utterance_with_segments,
)

VOCAB = list(VOWEL_SYMBOLS) + list(FRIC_SYMBOLS)


@pytest.mark.quick
def test_greedy_decode_collapse():
    # repeats collapse, blanks (0) separate repeats and are dropped
    ids = np.array([0, 3, 3, 0, 3, 5, 5, 0, 0, 1])
    assert asr_model.greedy_decode(ids, len(ids)) == [3, 3, 5, 1]
    # padded tail ignored
    assert asr_model.greedy_decode(ids, 3) == [3]
    assert asr_model.greedy_decode(np.zeros(8, np.int32), 8) == []


@pytest.mark.quick
def test_token_error_rate():
    assert asr_model.token_error_rate("abc", "abc") == 0.0
    assert asr_model.token_error_rate("abc", "abd") == pytest.approx(1 / 3)
    assert asr_model.token_error_rate("abc", "ac") == pytest.approx(1 / 3)
    assert asr_model.token_error_rate("", "x") == 1.0


@pytest.mark.quick
def test_forward_shapes_and_pad_invariance():
    cfg = asr_model.ASRModelConfig(vocab_size=len(VOCAB) + 1)
    params = asr_model.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    wav = rng.standard_normal((2, 16000 * 2)).astype(np.float32) * 0.1
    n_valid = 16000  # row 0 only half-valid
    lens = jnp.asarray([n_valid, 16000 * 2], jnp.int32)
    lgts, pad = asr_model.logits(params, cfg, jnp.asarray(wav), lens)
    frames = 16000 * 2 // (asr_model.HOP * asr_model.SUBSAMPLE)
    assert lgts.shape == (2, frames, cfg.vocab_size)
    # conservative valid count: only mel frames fully inside valid samples
    def valid(n):
        return ((n - 280) // asr_model.HOP + 1) // asr_model.SUBSAMPLE

    assert int(pad[0].sum()) == frames - valid(n_valid)
    assert int(pad[1].sum()) == frames - valid(16000 * 2)  # last straddler

    # valid-region logits must not depend on what's in the padded samples
    wav2 = wav.copy()
    wav2[0, n_valid:] = 5.0 * rng.standard_normal(16000).astype(np.float32)
    lgts2, _ = asr_model.logits(params, cfg, jnp.asarray(wav2), lens)
    valid = n_valid // (asr_model.HOP * asr_model.SUBSAMPLE)
    # mel frames straddling the boundary see some contamination; attention
    # masking + conv zeroing keep strictly-valid frames clean (conv halo of
    # k//2 subsampled frames + one straddling mel window)
    halo = asr_model.ASRModelConfig().conv_kernel // 2 + 1
    np.testing.assert_allclose(np.asarray(lgts[0, :valid - halo]),
                               np.asarray(lgts2[0, :valid - halo]),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.quick
def test_ctc_training_learns():
    """A few dozen steps on a tiny pool must cut the CTC loss sharply."""
    import optax

    from flowmirror_hydravox_tpu.train.train_asr import synthetic_batches

    cfg = asr_model.ASRModelConfig(vocab_size=len(VOCAB) + 1)
    params = asr_model.init_params(jax.random.PRNGKey(0), cfg)
    gen = synthetic_batches(8, 2.0, 0, VOCAB, pool=32, noise_pool=2)
    opt = optax.adam(2e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s, w, wl, lab, ll):
        (l, _), g = jax.value_and_grad(
            lambda p: asr_model.ctc_loss(p, cfg, w, wl, lab, ll),
            has_aux=True)(p)
        u, s = opt.update(g, s, p)
        return optax.apply_updates(p, u), s, l

    losses = []
    for _ in range(30):
        w, wl, lab, ll = next(gen)
        params, opt_state, loss = step(params, opt_state, jnp.asarray(w),
                                       jnp.asarray(wl), jnp.asarray(lab),
                                       jnp.asarray(ll))
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, losses[::6]


@pytest.mark.quick
def test_ckpt_roundtrip(tmp_path):
    cfg = asr_model.ASRModelConfig(vocab_size=len(VOCAB) + 1, num_layers=1)
    params = asr_model.init_params(jax.random.PRNGKey(1), cfg)
    path = str(tmp_path / "asr.npz")
    asr_model.save_ckpt(path, jax.device_get(params), cfg, VOCAB)
    params2, cfg2, vocab2 = asr_model.load_ckpt(path)
    assert cfg2 == cfg and vocab2 == VOCAB
    np.testing.assert_array_equal(np.asarray(params["embed"]),
                                  np.asarray(params2["embed"]))


@pytest.mark.quick
def test_shipped_ckpt_transcribes_heldout():
    """The committed demo checkpoint must transcribe held-out synthetic
    speech (unseen speakers AND utterance ids) with low token error rate —
    the measured-quality bar for the native stage-3 ASR option."""
    asr = asr_model.NativeASR()
    ters = []
    for c in range(6):
        wav, segs = synth_utterance_with_segments(300 + c, 10_000 + c, 4.0,
                                                  seed=1)
        if not segs:
            continue
        hyp = list(asr(wav, 16000))
        ters.append(asr_model.token_error_rate(segs, hyp))
    assert ters and float(np.mean(ters)) < 0.25, ters


@pytest.mark.quick
def test_transcribe_stage_with_native_asr(tmp_path):
    """Stage 3 end-to-end with --asr_module native: wavs with no transcript
    get ASR text (reference worker model slot)."""
    datasets = pytest.importorskip("datasets")

    from flowmirror_hydravox_tpu.preprocess import transcribe
    from flowmirror_hydravox_tpu.utils.wavio import encode_wav

    in_dir = tmp_path / "wavs"
    in_dir.mkdir()
    refs = {}
    for c in range(2):
        wav, segs = synth_utterance_with_segments(301 + c, 20_000 + c, 3.0,
                                                  seed=1)
        (in_dir / f"clip{c}.wav").write_bytes(encode_wav(wav, 16000))
        refs[f"clip{c}"] = segs
    out_dir = tmp_path / "ds"
    transcribe.main(["--input_dir", str(in_dir), "--output_dir", str(out_dir),
                     "--asr_module", "native", "--no_filename_fallback"])
    ds = datasets.load_from_disk(str(out_dir))
    assert len(ds) == 2
    for row in ds:
        assert row["text"]  # non-empty ASR output
        assert set(row["text"]) <= set(VOCAB)


@pytest.mark.quick
def test_segments_synthesis_consistency():
    """synth_utterance_with_segments shares the seeded path with
    synth_utterance_with_mask: same wav, and segment count matches the
    mask's speech runs at least as an upper bound."""
    w1, m = synth_utterance_with_mask(5, 9, 3.0, seed=1)
    w2, segs = synth_utterance_with_segments(5, 9, 3.0, seed=1)
    np.testing.assert_array_equal(w1, w2)
    runs = int(np.sum(np.diff(np.concatenate([[0], m])) == 1))
    assert len(segs) >= runs  # adjacent segments merge into one mask run
