"""Inference modes: cross-lingual / instruct / instruct2 / voice conversion."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowmirror_hydravox_tpu.config import tiny_config
from flowmirror_hydravox_tpu.frontend.frontend import Frontend, SpeakerInfo
from flowmirror_hydravox_tpu.models import flow, hift, llm
from flowmirror_hydravox_tpu.runtime.engine import Engine


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    engine = Engine(
        cfg,
        llm.init_params(k1, cfg.llm, jnp.float32),
        flow.init_params(k2, cfg.flow, jnp.float32),
        hift.init_params(k3, cfg.hift, jnp.float32),
        max_tokens=64,
        prompt_buckets=(32, 64),
        token_buckets=(32, 64, 128),
        mel_buckets=(128, 256),
    )
    frontend = Frontend(cfg)
    frontend.add_speaker("demo", SpeakerInfo(embedding=np.zeros(192, np.float32)))
    rng = np.random.default_rng(0)
    wav = (np.sin(2 * np.pi * 220 * np.arange(16000) / 16000) * 0.4).astype(np.float32)
    return engine, frontend, wav


def test_cross_lingual_feats(setup):
    _, frontend, wav = setup
    feats = frontend.frontend_cross_lingual("hello there", wav, 16000)
    assert len(feats["llm_prompt_speech_tokens"]) == 0  # llm: no prompt tokens
    assert len(feats["prompt_speech_tokens"]) > 0  # flow keeps them
    assert feats["prompt_mel"].shape[0] == 2 * len(feats["prompt_speech_tokens"])


def test_instruct_feats(setup):
    _, frontend, _ = setup
    feats = frontend.frontend_instruct("say this", "demo", "please whisper")
    base = frontend.frontend_sft("say this", "demo")
    assert len(feats["text_tokens"]) > len(base["text_tokens"])  # instruct prepended
    assert len(feats["llm_prompt_speech_tokens"]) == 0


def test_instruct2_feats(setup):
    _, frontend, wav = setup
    feats = frontend.frontend_instruct2("say this", "gently", wav, 16000)
    assert len(feats["llm_prompt_speech_tokens"]) == 0
    assert len(feats["prompt_speech_tokens"]) > 0


def test_engine_cross_lingual_synthesis(setup):
    engine, frontend, wav = setup
    feats = frontend.frontend_cross_lingual("hello", wav, 16000)
    # the real FSQ tokenizer emits ids up to 6561; tiny flow vocab is 50
    feats["prompt_speech_tokens"] = feats["prompt_speech_tokens"] % engine.cfg.flow.vocab_size
    res = engine.synthesize(
        text_tokens=feats["text_tokens"],
        tts_text_len=feats["tts_text_len"],
        inference_head_num=1,
        prompt_speech_tokens=feats["prompt_speech_tokens"],
        prompt_mel=feats["prompt_mel"],
        spk_embedding=feats["spk_embedding"],
        llm_prompt_speech_tokens=feats["llm_prompt_speech_tokens"],
        rng=jax.random.PRNGKey(1),
    )
    spt = engine.cfg.flow.token_mel_ratio * engine.cfg.hift.upsample_scale
    assert len(res.audio) == len(res.speech_tokens) * spt
    assert np.isfinite(res.audio).all()


def test_voice_conversion(setup):
    engine, frontend, wav = setup
    feats = frontend.frontend_vc(wav, 16000, wav[::-1].copy(), 16000)
    vs = engine.cfg.flow.vocab_size
    feats["source_speech_tokens"] = feats["source_speech_tokens"] % vs
    feats["prompt_speech_tokens"] = feats["prompt_speech_tokens"] % vs
    out = engine.voice_convert(
        feats["source_speech_tokens"], feats["prompt_speech_tokens"],
        feats["prompt_mel"], feats["spk_embedding"], rng=jax.random.PRNGKey(2),
    )
    spt = engine.cfg.flow.token_mel_ratio * engine.cfg.hift.upsample_scale
    assert len(out) == min(len(feats["source_speech_tokens"]), engine.max_tokens) * spt
    assert np.isfinite(out).all()
