"""Streaming synthesis: chunked output vs one-shot, seam continuity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowmirror_hydravox_tpu.config import tiny_config
from flowmirror_hydravox_tpu.models import flow, hift, llm
from flowmirror_hydravox_tpu.runtime.engine import Engine
from flowmirror_hydravox_tpu.runtime.streaming import StreamingSynthesizer, fade_in_out


@pytest.fixture(scope="module")
def engine():
    cfg = tiny_config()
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    return Engine(
        cfg,
        llm.init_params(k1, cfg.llm, jnp.float32),
        flow.init_params(k2, cfg.flow, jnp.float32),
        hift.init_params(k3, cfg.hift, jnp.float32),
        max_tokens=64,
        prompt_buckets=(64, 128),
        token_buckets=(64, 128),
        mel_buckets=(128, 256),
    )


def test_fade_in_out():
    win = np.hamming(8)
    a = np.ones(16, np.float32)
    b = np.full(16, 2.0, np.float32)
    out = fade_in_out(a.copy(), b, win)
    # first 4 samples blend a and b's tail; rest untouched
    assert not np.allclose(out[:4], 1.0)
    np.testing.assert_array_equal(out[4:], a[4:])


def test_stream_yields_chunks_and_total_length(engine):
    synth = StreamingSynthesizer(engine, token_hop_len=8, mel_cache_len=4)
    chunks = list(
        synth.synthesize_stream(
            text_tokens=np.arange(12, dtype=np.int32),
            tts_text_len=12,
            inference_head_num=2,
            rng=jax.random.PRNGKey(5),
        )
    )
    assert len(chunks) >= 1
    total = np.concatenate(chunks)
    assert np.isfinite(total).all()
    # total samples = n_tokens * ratio * upsample (chunk slicing must not
    # drop or duplicate audio)
    spt = engine.cfg.flow.token_mel_ratio * engine.cfg.hift.upsample_scale
    assert len(total) % spt == 0
    n_tok = len(total) // spt
    assert n_tok >= 12  # at least min_len = 2 * ceil? (min ratio 2 -> 24)... >= hop


def test_stream_token_parity_with_oneshot(engine):
    """Same rng -> the streaming LLM state machine must produce the same
    token sequence as the one-shot generate (chunked while_loops compose)."""
    from flowmirror_hydravox_tpu.models.llm import (
        generate, init_generate_state, generate_until,
    )
    from flowmirror_hydravox_tpu.ops.sampling import SamplingParams

    cfg = engine.cfg.llm
    rng = jax.random.PRNGKey(9)
    text = jnp.arange(6, dtype=jnp.int32)
    emb, plen = llm.build_inference_prompt(
        engine.llm_params, cfg, text, jnp.int32(6), jnp.zeros((0,), jnp.int32), jnp.int32(0)
    )
    sp = SamplingParams.make()

    oneshot = generate(
        engine.llm_params, cfg, rng, emb, plen, jnp.int32(4), jnp.int32(30), sp,
        inference_head_num=2, max_tokens=40,
    )

    state = init_generate_state(
        engine.llm_params, cfg, rng, emb, plen, inference_head_num=2, max_tokens=40
    )
    for target in (7, 14, 21, 30):
        state = generate_until(
            engine.llm_params, cfg, state, jnp.int32(target), jnp.int32(4),
            jnp.int32(30), sp, inference_head_num=2,
        )
        if bool(state["finished"]):
            break
    a = np.asarray(oneshot.tokens[: int(oneshot.num_tokens)])
    b = np.asarray(state["tokens"][: int(state["num"])])
    np.testing.assert_array_equal(a, b)


def test_spec_stream_token_parity_with_oneshot(engine):
    """Speculative decode is a resumable state machine too: pausing at chunk
    targets must not change the emitted sequence (same rng stream), and a
    spec_decode engine must stream end-to-end."""
    from flowmirror_hydravox_tpu.models.llm import (
        generate_spec_until, generate_speculative, init_spec_state,
    )
    from flowmirror_hydravox_tpu.ops.sampling import SamplingParams

    cfg = engine.cfg.llm
    rng = jax.random.PRNGKey(13)
    text = jnp.arange(6, dtype=jnp.int32)
    emb, plen = llm.build_inference_prompt(
        engine.llm_params, cfg, text, jnp.int32(6), jnp.zeros((0,), jnp.int32), jnp.int32(0)
    )
    sp = SamplingParams.make()
    mn, mx = jnp.int32(4), jnp.int32(30)

    oneshot = generate_speculative(
        engine.llm_params, cfg, rng, emb, plen, mn, mx, sp,
        num_heads=3, max_tokens=40,
    )
    state = init_spec_state(
        engine.llm_params, cfg, rng, emb, plen, mn, mx, sp,
        num_heads=3, max_tokens=40,
    )
    for target in (7, 14, 21, 30):
        state = generate_spec_until(
            engine.llm_params, cfg, state, jnp.int32(target), mn, mx, sp,
            num_heads=3,
        )
        if bool(state["finished"]):
            break
    a = np.asarray(oneshot.result.tokens[: int(oneshot.result.num_tokens)])
    b = np.asarray(state["tokens"][: int(state["num"])])
    np.testing.assert_array_equal(a, b)

    # e2e: the streaming synthesizer rides the spec state machine
    spec_engine = Engine(
        engine.cfg, engine.llm_params, engine.flow_params, engine.hift_params,
        max_tokens=64, prompt_buckets=(64, 128), token_buckets=(64, 128),
        mel_buckets=(128, 256), spec_decode=True,
    )
    synth = StreamingSynthesizer(spec_engine, token_hop_len=8, mel_cache_len=4)
    chunks = list(
        synth.synthesize_stream(
            text_tokens=np.arange(12, dtype=np.int32), tts_text_len=12,
            inference_head_num=3, rng=jax.random.PRNGKey(5),
        )
    )
    total = np.concatenate(chunks)
    assert len(chunks) >= 1 and np.isfinite(total).all()
    spt = engine.cfg.flow.token_mel_ratio * engine.cfg.hift.upsample_scale
    assert len(total) % spt == 0 and len(total) // spt >= 12
