"""Stage-2/3 preprocessing depth (VERDICT round-2 item 8): trained-VAD
infrastructure, transcribe orchestration (workers, sidecar txt, cleaning,
loudness, stats), and the synthetic speech/noise corpus they train on."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.quick


def test_synth_mask_marks_speech():
    from flowmirror_hydravox_tpu.train.synth_speech import (
        synth_noise, synth_utterance, synth_utterance_with_mask)

    wav, mask = synth_utterance_with_mask(3, 0, 2.0)
    assert wav.shape == mask.shape == (32000,)
    assert 0.2 < mask.mean() < 1.0
    # speech frames carry the energy; silence frames are (near) zero
    assert np.abs(wav[mask == 1]).mean() > 10 * (np.abs(wav[mask == 0]).mean() + 1e-9)
    # synth_utterance stays bit-identical to the masked variant's wave
    np.testing.assert_array_equal(wav, synth_utterance(3, 0, 2.0))
    rng = np.random.default_rng(0)
    for kind in ("white", "pink", "hum", "babble"):
        n = synth_noise(kind, 8000, rng)
        assert n.shape == (8000,) and np.isfinite(n).all()


def test_vad_model_shapes_and_training_step():
    import jax

    from flowmirror_hydravox_tpu.preprocess import vad_model

    cfg = vad_model.VADModelConfig(n_mels=40, channels=8, dilations=(1, 2))
    params = vad_model.init_params(jax.random.PRNGKey(0), cfg)
    wav = np.random.default_rng(0).standard_normal((2, 16000)).astype(np.float32)
    logits = vad_model.frame_logits(params, cfg, wav)
    assert logits.shape == (2, 100)  # 16000 samples / 160 hop (center-padded)
    labels = (np.random.default_rng(1).random((2, 100)) > 0.5)
    loss, acc = vad_model.bce_loss(params, cfg, wav, labels)
    assert np.isfinite(float(loss)) and 0.0 <= float(acc) <= 1.0


def test_vad_cli_energy_mode(tmp_path):
    """--model energy segments a clip with a silence gap into >= 2 files."""
    from flowmirror_hydravox_tpu.preprocess import vad
    from flowmirror_hydravox_tpu.utils.wavio import encode_wav

    sr = 16000
    t = np.arange(sr) / sr
    tone = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    wav = np.concatenate([tone, np.zeros(sr, np.float32), tone])
    (tmp_path / "in").mkdir()
    (tmp_path / "in" / "x.wav").write_bytes(encode_wav(wav, sr))
    vad.main(["--input_dir", str(tmp_path / "in"), "--output_dir",
              str(tmp_path / "out"), "--model", "energy", "--min_dur", "0.3"])
    segs = list((tmp_path / "out").rglob("*.wav"))
    assert len(segs) >= 2


def test_transcribe_orchestration(tmp_path):
    """Multi-worker fan-out + sidecar txt + CJK cleaning + loudness norm +
    skip accounting + stats JSON (reference transcribe_to_dataset.py:37-637)."""
    datasets = pytest.importorskip("datasets")
    from flowmirror_hydravox_tpu.train.synth_speech import synth_utterance
    from flowmirror_hydravox_tpu.utils.wavio import encode_wav

    src = tmp_path / "in"
    (src / "sub").mkdir(parents=True)
    for i in range(4):
        p = src / ("sub" if i % 2 else ".") / f"clip_{i}.wav"
        p.write_bytes(encode_wav(synth_utterance(i, i, 1.0), 16000))
        if i < 2:
            p.with_suffix(".txt").write_text("你好 世界 hello  world")
    (src / "tiny.wav").write_bytes(encode_wav(np.zeros(800, np.float32), 16000))
    (src / "bad.wav").write_bytes(b"nope")

    out = tmp_path / "out"
    # run via module CLI so spawn workers can re-import main
    proc = subprocess.run(
        [sys.executable, "-m", "flowmirror_hydravox_tpu.preprocess.transcribe",
         "--input_dir", str(src), "--output_dir", str(out),
         "--num_workers", "2", "--normalize_loudness", "--min_sec", "0.5"],
        capture_output=True, text=True, timeout=240,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert proc.returncode == 0, proc.stderr[-2000:]
    ds = datasets.load_from_disk(str(out))
    assert len(ds) == 4
    assert "你好世界 hello world" in set(ds["text"])  # CJK spaces dropped
    stats = json.loads((out / "corpus_stats.json").read_text())
    assert stats["rows"] == 4
    assert stats["skipped"]["unreadable"] == 1
    assert stats["skipped"]["too_short"] == 1
    # loudness normalization: RMS near 0.1 target
    arr = np.asarray(ds[0]["audio"]["array"], np.float32)
    assert 0.05 < float(np.sqrt(np.mean(arr ** 2))) < 0.2


def test_transcribe_no_fallback_drops(tmp_path):
    datasets = pytest.importorskip("datasets")
    from flowmirror_hydravox_tpu.preprocess import transcribe
    from flowmirror_hydravox_tpu.utils.wavio import encode_wav

    src = tmp_path / "in"
    src.mkdir()
    (src / "a.wav").write_bytes(
        encode_wav(np.random.default_rng(0).standard_normal(16000).astype(np.float32) * 0.1, 16000))
    with pytest.raises(SystemExit):
        transcribe.main(["--input_dir", str(src), "--output_dir",
                         str(tmp_path / "out"), "--no_filename_fallback"])


def test_trained_vad_beats_energy_in_noise():
    """The shipped VAD checkpoint must hold frame-F1 where the energy VAD
    structurally fails (noise energy ~ speech energy). Full eval table:
    `python -m flowmirror_hydravox_tpu.tools.eval_vad --cpu` (at SNR 5 dB the
    round-3 training run measured native 0.91-0.95 vs energy 0.36-0.56)."""
    import os

    from flowmirror_hydravox_tpu.preprocess.vad_model import _ASSET, maybe_native_vad
    from flowmirror_hydravox_tpu.tools import eval_vad

    assert os.path.exists(_ASSET), "shipped VAD weights missing"
    assert maybe_native_vad() is not None
    results = eval_vad.evaluate(n_clips=2, snr_db=5.0, seconds=4.0)
    for cond in ("white", "hum"):
        f1_native = results[cond]["native"][2]
        f1_energy = results[cond]["energy"][2]
        assert f1_native > 0.8, (cond, f1_native)
        assert f1_native > f1_energy + 0.2, (cond, f1_native, f1_energy)
    assert results["clean"]["native"][2] > 0.85
