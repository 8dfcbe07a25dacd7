"""Shipped frontend extractor checkpoints: zero-shot conditioning must be
real signal, not noise (VERDICT round-2 item 1).

The reference ships speech_tokenizer_v3.onnx / campplus.onnx weights
(cli/frontend.py:54-57,92-116) that are absent from this snapshot; the repo
instead commits small checkpoints for the native stand-in extractors, trained
by the deterministic recipe

  python -m flowmirror_hydravox_tpu.train.train_frontend --model tokenizer \
      --synthetic_speech --preset shipped --corpus_utts 1536 ...

(see frontend/assets/ckpt/RECIPE.md).  These tests pin the properties the
zero-shot pipeline needs from them:
  - the default Frontend auto-loads the committed weights;
  - speaker embeddings separate speakers (within-speaker similarity >
    between-speaker similarity on held-out utterances);
  - speech tokens track content deterministically and with code diversity;
  - inference_zero_shot output depends measurably on the prompt speaker.
"""

import os

import numpy as np
import pytest

from flowmirror_hydravox_tpu.config import tiny_config
from flowmirror_hydravox_tpu.frontend.frontend import Frontend
from flowmirror_hydravox_tpu.train.synth_speech import synth_utterance

pytestmark = pytest.mark.quick

ASSET_DIR = os.path.join(
    os.path.dirname(__file__), "..", "flowmirror_hydravox_tpu", "frontend",
    "assets", "ckpt")

# held-out utterance ids: the training corpus uses ids < 100k
UTT0 = 1_000_000


@pytest.fixture(scope="module")
def frontend():
    for name in ("tokenizer", "speaker"):
        assert os.path.exists(os.path.join(ASSET_DIR, f"{name}.npz")), (
            f"committed frontend checkpoint missing: {name}.npz")
    return Frontend(tiny_config())


def _cos(a, b):
    return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-8))


def test_default_frontend_loads_shipped_weights(frontend):
    """Auto-load path: default ctor picks up frontend/assets/ckpt (no env)."""
    import jax

    from flowmirror_hydravox_tpu.frontend import speech_tokenizer as st

    k1, _ = jax.random.split(jax.random.PRNGKey(0))
    random_tree = st.init_tokenizer_params(k1, frontend.st_cfg)
    loaded = jax.tree.leaves(frontend.tokenizer_params)
    rand = jax.tree.leaves(random_tree)
    diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
             for a, b in zip(loaded, rand)]
    assert max(diffs) > 1e-3, "frontend is still using random-init weights"


def test_speaker_embeddings_separate_speakers(frontend):
    """Within-speaker cosine must beat between-speaker cosine with margin on
    held-out synthetic utterances (the campplus.onnx property the zero-shot
    path needs, cli/frontend.py:105-116)."""
    speakers, utts = 6, 2
    embs = np.stack([
        np.stack([
            frontend.extract_spk_embedding(
                synth_utterance(spk, UTT0 + u, seconds=3.0), 16000)
            for u in range(utts)
        ]) for spk in range(speakers)
    ])  # (S, U, 192)
    within = [_cos(embs[s, 0], embs[s, 1]) for s in range(speakers)]
    between = [_cos(embs[s1, 0], embs[s2, 0])
               for s1 in range(speakers) for s2 in range(speakers) if s1 != s2]
    assert np.mean(within) > np.mean(between) + 0.15, (
        f"within {np.mean(within):.3f} vs between {np.mean(between):.3f}")


def test_speech_tokens_track_content(frontend):
    """Tokenizer output is deterministic, content-dependent, and uses a
    non-trivial slice of the codebook (speech_tokenizer_v3.onnx property,
    cli/frontend.py:92-104)."""
    wav_a = synth_utterance(0, UTT0, seconds=3.0)
    wav_b = synth_utterance(0, UTT0 + 1, seconds=3.0)  # same spk, new content
    t1 = frontend.extract_speech_tokens(wav_a, 16000)
    t2 = frontend.extract_speech_tokens(wav_a, 16000)
    t3 = frontend.extract_speech_tokens(wav_b, 16000)
    np.testing.assert_array_equal(t1, t2)
    assert t1.shape == (75,)  # 3 s * 25 Hz
    assert (t1 != t3).mean() > 0.3, "tokens do not depend on content"
    uniq = len(set(np.concatenate([t1, t3]).tolist()))
    assert uniq >= 10, f"token stream collapsed to {uniq} codes"
    # silence should not tokenize like speech
    sil = frontend.extract_speech_tokens(np.zeros(48000, np.float32), 16000)
    assert (t1 != sil).mean() > 0.3


def test_zero_shot_conditioning_depends_on_prompt(frontend):
    """frontend_zero_shot features differ between two prompt speakers, so
    inference_zero_shot is conditioned on the prompt in a verified way
    (cli/frontend.py:163-209 + engine zero-shot path)."""
    wav_a = synth_utterance(1, UTT0, seconds=3.0)
    wav_b = synth_utterance(2, UTT0, seconds=3.0)
    fa = frontend.frontend_zero_shot("你好世界", "prompt", wav_a, 16000)
    fb = frontend.frontend_zero_shot("你好世界", "prompt", wav_b, 16000)
    assert _cos(fa["spk_embedding"], fb["spk_embedding"]) < 0.9
    ta, tb = fa["prompt_speech_tokens"], fb["prompt_speech_tokens"]
    n = min(len(ta), len(tb))
    assert n > 0 and (np.asarray(ta[:n]) != np.asarray(tb[:n])).mean() > 0.3
    assert not np.allclose(fa["prompt_mel"][: len(fb["prompt_mel"])],
                           fb["prompt_mel"][: len(fa["prompt_mel"])])


REAL_SPEECH_DIR = os.environ.get(
    "HYDRAVOX_REAL_SPEECH_DIR", "/root/reference/assets/samples")


@pytest.mark.skipif(not os.path.isdir(REAL_SPEECH_DIR),
                    reason="no real-speech corpus in this environment")
def test_shipped_extractors_carry_signal_on_real_speech(frontend):
    """The synthetic-corpus-trained extractors must carry usable signal on
    REAL human speech (VERDICT r3 item 4): the reference snapshot's five demo
    speakers (read in place, never copied here) must separate in embedding
    space, and tokens must be deterministic + content-driven.  Matches the
    zero-shot frontend role, cli/frontend.py:92-116; measured numbers live
    in frontend/assets/ckpt/RECIPE.md."""
    from flowmirror_hydravox_tpu.tools.eval_frontend_real import evaluate

    out = evaluate(REAL_SPEECH_DIR, frontend=frontend)
    assert out["speakers"] >= 2
    # separation: clearly positive gap, bounded between-speaker leakage
    assert out["separation_gap"] > 0.15, out
    assert out["between_above_within_median"] < 0.25, out
    # tokens: reproducible, content-driven, non-degenerate code usage
    assert out["token_deterministic"], out
    assert out["token_content_diff_frac"] > 0.5, out
    assert out["token_unique_codes"] >= 8, out
