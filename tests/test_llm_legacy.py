"""CV1/CV2 legacy LMs: loss finiteness, target layout, cached decode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowmirror_hydravox_tpu.config import Qwen2Config
from flowmirror_hydravox_tpu.models import llm_legacy
from flowmirror_hydravox_tpu.models.conformer import ConformerConfig
from flowmirror_hydravox_tpu.ops.sampling import SamplingParams

Q2_TINY = llm_legacy.Qwen2LMConfig(
    backbone=Qwen2Config(hidden_size=64, num_layers=2, num_heads=4, num_kv_heads=2,
                         head_dim=16, intermediate_size=128, vocab_size=256),
    speech_token_size=50,
)


@pytest.fixture(scope="module")
def q2_params():
    return llm_legacy.init_qwen2lm_params(jax.random.PRNGKey(0), Q2_TINY, jnp.float32)


def test_qwen2lm_loss(q2_params):
    rng = jax.random.PRNGKey(1)
    tt = jax.random.randint(rng, (2, 6), 0, 200)
    st = jax.random.randint(rng, (2, 10), 0, 50)
    out = llm_legacy.qwen2lm_forward_loss(
        q2_params, Q2_TINY, tt, jnp.asarray([6, 4]), st, jnp.asarray([10, 7])
    )
    assert np.isfinite(float(out["loss"]))
    assert 0 <= float(out["acc"]) <= 1


def test_qwen2lm_generate(q2_params):
    text = jnp.arange(5, dtype=jnp.int32)
    tokens, num = llm_legacy.qwen2lm_generate(
        q2_params, Q2_TINY, jax.random.PRNGKey(2), text, jnp.int32(5),
        jnp.zeros((0,), jnp.int32), jnp.int32(0),
        jnp.int32(3), jnp.int32(16), SamplingParams.make(), max_tokens=24,
    )
    n = int(num)
    assert 3 <= n <= 16
    toks = np.asarray(tokens[:n])
    assert (toks >= 0).all() and (toks < Q2_TINY.speech_token_size).all()
    assert (np.asarray(tokens[n:]) == -1).all()


def test_transformerlm_loss():
    cfg = llm_legacy.TransformerLMConfig(
        text_encoder_input_size=32, llm_input_size=48, llm_output_size=48,
        text_token_size=100, speech_token_size=40,
        text_encoder=ConformerConfig(input_size=32, output_size=32, attention_heads=4,
                                     linear_units=64, num_blocks=1),
        llm=ConformerConfig(input_size=48, output_size=48, attention_heads=4,
                            linear_units=64, num_blocks=1,
                            use_cnn_module=False, macaron_style=False),
    )
    params = llm_legacy.init_transformerlm_params(jax.random.PRNGKey(0), cfg)
    rng = jax.random.PRNGKey(1)
    tt = jax.random.randint(rng, (2, 5), 0, 100)
    st = jax.random.randint(rng, (2, 8), 0, 40)
    emb = jax.random.normal(rng, (2, 192))
    out = llm_legacy.transformerlm_forward_loss(
        params, cfg, tt, jnp.asarray([5, 3]), st, jnp.asarray([8, 6]), emb
    )
    assert np.isfinite(float(out["loss"]))


def test_transformerlm_generate():
    """CV1 AR decode (TransformerLM.inference) emits valid tokens."""
    cfg = llm_legacy.TransformerLMConfig(
        text_encoder_input_size=32, llm_input_size=32, llm_output_size=32,
        text_token_size=300, speech_token_size=50,
        text_encoder=ConformerConfig(input_size=32, output_size=32,
                                     attention_heads=4, linear_units=64, num_blocks=2),
        llm=ConformerConfig(input_size=32, output_size=32, attention_heads=4,
                            linear_units=64, num_blocks=2,
                            use_cnn_module=False, macaron_style=False),
    )
    params = llm_legacy.init_transformerlm_params(jax.random.PRNGKey(0), cfg)
    tokens, num = llm_legacy.transformerlm_generate(
        params, cfg, jax.random.PRNGKey(1),
        jnp.arange(5, dtype=jnp.int32), jnp.int32(5),
        jnp.zeros((192,), jnp.float32),
        jnp.int32(3), jnp.int32(12), SamplingParams.make(), max_tokens=16,
    )
    n = int(num)
    assert 3 <= n <= 12
    toks = np.asarray(tokens[:n])
    assert (toks >= 0).all() and (toks < cfg.speech_token_size).all()


def test_legacy_tts_cli_end_to_end(tmp_path):
    """CV1 + CV2 full pipelines (LM -> legacy flow -> HiFT) through the CLI."""
    from flowmirror_hydravox_tpu.tools.legacy_tts import main

    for gen in ("cv1", "cv2"):
        out = main(["--gen", gen, "--text", "hi", "--tiny",
                    "--output", str(tmp_path / f"{gen}.wav"), "--max_tokens", "16"])
        assert out["tokens"] > 0 and out["duration_s"] > 0
        assert (tmp_path / f"{gen}.wav").exists()
