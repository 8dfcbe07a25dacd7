"""Continuous (in-flight) batching: exact token parity vs solo decode,
mid-flight admission, and concurrent completion.

The TPU-native vLLM-equivalent serving core (runtime/continuous.py): fixed
decode slots over one persistent batched KV cache; per-slot PRNG chains are
split exactly like the solo loop's, so tokens must match `llm.generate`
bit-for-bit for the same rng.
"""

import threading
import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flowmirror_hydravox_tpu.config import tiny_config
from flowmirror_hydravox_tpu.models import flow, hift, llm
from flowmirror_hydravox_tpu.ops.sampling import SamplingParams
from flowmirror_hydravox_tpu.runtime.continuous import ContinuousBatcher
from flowmirror_hydravox_tpu.runtime.engine import Engine

# only the parity test rides the quick tier — the other cases re-use the
# same programs but add minutes of CPU compile/drain time


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
        prompt_buckets=(32, 64),
        token_buckets=(64, 128),
        mel_buckets=(128, 256),
    )


def _solo_tokens(engine, text, rng, head_num, min_ratio=2.0, max_ratio=8.0):
    cfg = engine.cfg.llm
    bucket = 32 if len(text) <= 32 else 64
    padded = np.zeros((bucket,), np.int32)
    padded[: len(text)] = text
    emb, plen = llm.build_inference_prompt(
        engine.llm_params, cfg, jnp.asarray(padded), jnp.int32(len(text)),
        jnp.zeros((0,), jnp.int32), jnp.int32(0),
    )
    res = llm.generate(
        engine.llm_params, cfg, rng, emb, plen,
        jnp.int32(int(len(text) * min_ratio)),
        jnp.int32(min(int(len(text) * max_ratio), 64)),
        SamplingParams.make(),
        inference_head_num=head_num, max_tokens=64,
        cache_len_cap=ContinuousBatcher(engine, slots=1).cache_cap,
    )
    n = int(res.num_tokens)
    return np.asarray(res.tokens)[:n]


@pytest.mark.quick
def test_continuous_matches_solo_decode(engine):
    """A request admitted into a slot produces the same tokens as the solo
    KV-cached decode loop with the same rng (per-slot rng chains replicate
    generate_until's split order)."""
    batcher = ContinuousBatcher(engine, slots=2, chunk_steps=4, head_num=2)
    try:
        texts = [np.arange(6, dtype=np.int32), np.arange(9, dtype=np.int32) % 7]
        rngs = [jax.random.PRNGKey(11), jax.random.PRNGKey(22)]
        reqs = [
            batcher.submit(t, rng=r, min_token_text_ratio=2.0, max_token_text_ratio=8.0)
            for t, r in zip(texts, rngs)
        ]
        outs = [batcher.result(r, timeout=600.0) for r in reqs]
        for (wav, stats), text, rng in zip(outs, texts, rngs):
            solo = _solo_tokens(engine, text, rng, head_num=2)
            assert stats["tokens"] == solo.tolist(), (stats["tokens"], solo)
            assert wav.dtype == np.float32 and len(wav) > 0
            assert np.isfinite(wav).all()
    finally:
        batcher.shutdown()


def test_continuous_admits_mid_flight(engine):
    """A request submitted while another is decoding joins a live batch (more
    slots than sequential drains would use) and still matches solo tokens."""
    batcher = ContinuousBatcher(engine, slots=2, chunk_steps=2, head_num=2)
    try:
        t1 = np.arange(12, dtype=np.int32)  # longer: stays in flight
        r1 = batcher.submit(t1, rng=jax.random.PRNGKey(5),
                            min_token_text_ratio=4.0, max_token_text_ratio=5.0)
        # wait until the first decode chunk is underway, then submit another
        import time

        deadline = time.time() + 120
        while batcher._slot_req[0] is None and time.time() < deadline:
            time.sleep(0.01)
        t2 = np.arange(5, dtype=np.int32)
        r2 = batcher.submit(t2, rng=jax.random.PRNGKey(6),
                            min_token_text_ratio=2.0, max_token_text_ratio=4.0)
        wav1, stats1 = batcher.result(r1, timeout=600.0)
        wav2, stats2 = batcher.result(r2, timeout=600.0)
        assert stats1["tokens"] == _solo_tokens(
            engine, t1, jax.random.PRNGKey(5), 2, 4.0, 5.0).tolist()
        assert stats2["tokens"] == _solo_tokens(
            engine, t2, jax.random.PRNGKey(6), 2, 2.0, 4.0).tolist()
        assert len(wav1) > 0 and len(wav2) > 0
        # admission latency recorded per admitted request (served by /metrics)
        assert len(batcher.admission_lat_s) == 2
        assert all(0 <= v < 600 for v in batcher.admission_lat_s)
    finally:
        batcher.shutdown()


def test_service_continuous_mode(engine):
    """TTSService(continuous_slots=2): default-config SFT requests bypass the
    worker queue and ride the shared decode slots; a non-default request
    still flows through the regular worker path."""
    from flowmirror_hydravox_tpu.frontend.frontend import Frontend, SpeakerInfo
    from flowmirror_hydravox_tpu.runtime.server import TTSService

    frontend = Frontend(engine.cfg)
    rng = np.random.default_rng(0)
    frontend.add_speaker("a", SpeakerInfo(embedding=rng.standard_normal(192).astype(np.float32)))
    service = TTSService(engine, frontend, request_timeout=600.0,
                         continuous_slots=2, continuous_head_num=2)
    try:
        tids = [service.submit({
            "type": "tts", "text": f"slot test {i}", "speaker_id": "a",
        }) for i in range(3)]
        # custom sampling -> regular worker path
        solo = service.submit({
            "type": "tts", "text": "regular path", "speaker_id": "a",
            "extra_params": {"top_p": 0.5, "inference_head_num": 1},
        })
        outs = [service.wait(t) for t in tids] + [service.wait(solo)]
        for r in outs:
            assert "output_audio" in r and len(r["output_audio"]) > 0, r
        assert service.continuous_requests == 3, service.continuous_requests
    finally:
        service.shutdown()


def test_service_zero_shot_rides_slots(engine):
    """Plain-mode zero_shot requests join the continuous decode slots with
    per-slot prompts extracted from the request audio; a cross-lingual
    request (which needs the per-row empty-LM-prefix override) falls back to
    the worker path instead of erroring."""
    from flowmirror_hydravox_tpu.frontend.frontend import Frontend
    from flowmirror_hydravox_tpu.runtime.server import TTSService

    frontend = Frontend(engine.cfg)
    rng = np.random.default_rng(3)
    service = TTSService(engine, frontend, request_timeout=600.0,
                         continuous_slots=2, continuous_head_num=2)
    # match the batcher's one compiled sampling config (win_size=24)
    extra = {"top_p": 0.9, "top_k": 10, "win_size": 24, "tau_r": 0.2,
             "inference_head_num": 2}
    try:
        wavs = [(rng.standard_normal(8000) * 0.1).astype(np.float32)
                for _ in range(2)]
        tids = [service.submit({
            "type": "zero_shot", "tts_text": f"clone on a slot {i}",
            "prompt_text": "slot prompt", "prompt_audio": wavs[i],
            "prompt_sample_rate": 16000, "extra_params": dict(extra),
        }) for i in range(2)]
        xl = service.submit({
            "type": "zero_shot", "tts_text": "worker path row",
            "mode": "cross_lingual", "prompt_audio": wavs[0],
            "prompt_sample_rate": 16000, "extra_params": dict(extra),
        })
        outs = [service.wait(t) for t in tids] + [service.wait(xl)]
        for r in outs:
            assert "output_audio" in r and len(r["output_audio"]) > 0, r
            assert np.isfinite(r["output_audio"]).all()
        assert service.continuous_requests == 2, service.continuous_requests
    finally:
        service.shutdown()


def test_continuous_zero_shot_prompt_matches_solo(engine):
    """A request with zero-shot prompt speech tokens rides a slot and
    matches the solo decode with the same prompt+rng; prompt mel conditions
    the synthesis."""
    cfg = engine.cfg.llm
    text = np.arange(7, dtype=np.int32)
    sp = (np.arange(6, dtype=np.int32) * 3) % 50
    pm = np.random.default_rng(1).standard_normal((12, 80)).astype(np.float32)
    rng = jax.random.PRNGKey(33)

    batcher = ContinuousBatcher(engine, slots=2, chunk_steps=4, head_num=2)
    try:
        req = batcher.submit(text, prompt_speech_tokens=sp, prompt_mel=pm,
                             rng=rng, min_token_text_ratio=2.0,
                             max_token_text_ratio=6.0)
        wav, stats = batcher.result(req, timeout=600.0)

        padded = np.zeros((32,), np.int32)
        padded[: len(text)] = text
        sp_pad = np.zeros((32,), np.int32)
        sp_pad[: len(sp)] = sp
        emb, plen = llm.build_inference_prompt(
            engine.llm_params, cfg, jnp.asarray(padded), jnp.int32(len(text)),
            jnp.asarray(sp_pad), jnp.int32(len(sp)),
        )
        res = llm.generate(
            engine.llm_params, cfg, rng, emb, plen,
            jnp.int32(14), jnp.int32(42), SamplingParams.make(),
            inference_head_num=2, max_tokens=64,
            cache_len_cap=batcher.cache_cap,
        )
        solo = np.asarray(res.tokens)[: int(res.num_tokens)]
        assert stats["tokens"] == solo.tolist(), (stats["tokens"], solo)
        assert len(wav) > 0 and np.isfinite(wav).all()
    finally:
        batcher.shutdown()


def test_service_continuous_long_text_falls_back(engine):
    """A segment longer than the slots' largest prompt bucket must fall back
    to the regular worker path (no silent truncation) and still synthesize."""
    from flowmirror_hydravox_tpu.frontend.frontend import Frontend, SpeakerInfo
    from flowmirror_hydravox_tpu.runtime.server import TTSService

    frontend = Frontend(engine.cfg)
    frontend.add_speaker("a", SpeakerInfo(embedding=np.zeros(192, np.float32)))
    service = TTSService(engine, frontend, request_timeout=600.0,
                         continuous_slots=2, continuous_head_num=2)
    try:
        # one unbroken segment that tokenizes past the (32, 64) bucket ladder
        long_text = " ".join(f"word{i}" for i in range(60))
        assert len(frontend.extract_text_tokens(long_text)) > 64
        tid = service.submit({"type": "tts", "text": long_text, "speaker_id": "a"})
        out = service.wait(tid)
        assert "output_audio" in out and len(out["output_audio"]) > 0, out
        assert service.continuous_requests == 0  # served by the regular path
    finally:
        service.shutdown()


def test_batch_per_row_embeddings_differ(engine):
    """synthesize_batch with (B, 192) embeddings conditions each row on its
    own speaker: rows with different embeddings must produce different audio
    for the same text/rng, and a row must match its solo-synthesis output."""
    rng = np.random.default_rng(3)
    text = np.arange(8, dtype=np.int32)
    emb_a = rng.standard_normal(192).astype(np.float32)
    emb_b = rng.standard_normal(192).astype(np.float32) * 2.0

    def run(embs):
        return engine.synthesize_batch(
            [text, text], inference_head_num=1, rng=jax.random.PRNGKey(9),
            spk_embedding=np.stack(embs),
            min_token_text_ratio=2.0, max_token_text_ratio=3.0,
        )

    wavs1, stats1 = run([emb_a, emb_b])
    wavs2, stats2 = run([emb_b, emb_a])
    # same rng -> identical tokens either way; only the flow conditioning
    # (per-row speaker embedding) changes, so row 0's audio must change
    assert stats1["tokens"] == stats2["tokens"], (stats1, stats2)
    assert len(wavs1[0]) == len(wavs2[0])
    assert not np.allclose(wavs1[0], wavs2[0]), "row 0 ignored its embedding"


def test_continuous_many_concurrent(engine):
    """More requests than slots: all complete, slots recycle."""
    batcher = ContinuousBatcher(engine, slots=2, chunk_steps=4, head_num=2)
    try:
        results = {}

        def one(i):
            req = batcher.submit(
                np.arange(4 + i, dtype=np.int32),
                rng=jax.random.PRNGKey(100 + i),
                max_token_text_ratio=4.0,
            )
            results[i] = batcher.result(req, timeout=600.0)

        threads = [threading.Thread(target=one, args=(i,)) for i in range(5)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert len(results) == 5
        for wav, stats in results.values():
            assert len(wav) > 0 and stats["steps"] > 0
    finally:
        batcher.shutdown()


def test_streaming_rides_slots(engine):
    """A stream=True request through the shared decode slots yields the same
    chunk boundaries, bit-identical tokens, and (near-)identical audio as the
    solo StreamingSynthesizer session with the same rng.  (The solo first
    chunk rides the fused TTFT program whose waveform is int16-quantized on
    device, hence the small tolerance.)"""
    from flowmirror_hydravox_tpu.config import SamplingConfig

    # the batcher's default SamplingParams.make() values — the solo session
    # must sample identically for token parity
    match = SamplingConfig(top_p=0.8, top_k=25, win_size=10, tau_r=0.1)
    batcher = ContinuousBatcher(engine, slots=2, chunk_steps=4, head_num=2)
    try:
        text = np.arange(8, dtype=np.int32)
        solo_chunks = list(engine.streaming().synthesize_stream(
            text_tokens=text, tts_text_len=len(text), inference_head_num=2,
            rng=jax.random.PRNGKey(33), max_token_text_ratio=8.0,
            sampling=match,
        ))
        req = batcher.submit(
            text, rng=jax.random.PRNGKey(33), stream=True,
            max_token_text_ratio=8.0,
        )
        slot_chunks = list(batcher.stream_result(req, timeout=600.0))
        assert req.stats is not None and req.stats["ttft"] > 0
        # decode chain: submit rng splits exactly like synthesize_stream's
        decode_rng = jax.random.split(jax.random.PRNGKey(33))[0]
        solo = _solo_tokens(engine, text, decode_rng, head_num=2)
        assert req.stats["tokens"] == solo.tolist()
        assert len(slot_chunks) == len(solo_chunks), (
            [len(c) for c in slot_chunks], [len(c) for c in solo_chunks])
        for a, b in zip(slot_chunks, solo_chunks):
            assert a.shape == b.shape
            assert np.allclose(a, b, atol=2e-3), float(np.abs(a - b).max())
    finally:
        batcher.shutdown()


def test_streaming_on_slots_concurrent(engine):
    """Two streams decode concurrently on the slots; each stream's audio
    still matches its own solo session (per-request carried HiFT caches and
    rng chains don't cross-talk)."""
    from flowmirror_hydravox_tpu.config import SamplingConfig

    match = SamplingConfig(top_p=0.8, top_k=25, win_size=10, tau_r=0.1)
    batcher = ContinuousBatcher(engine, slots=2, chunk_steps=4, head_num=2)
    try:
        texts = [np.arange(8, dtype=np.int32), (np.arange(10) % 5).astype(np.int32)]
        rngs = [44, 55]
        solos = [
            [c.copy() for c in engine.streaming().synthesize_stream(
                text_tokens=t, tts_text_len=len(t), inference_head_num=2,
                rng=jax.random.PRNGKey(s), max_token_text_ratio=8.0,
                sampling=match)]
            for t, s in zip(texts, rngs)
        ]
        reqs = [
            batcher.submit(t, rng=jax.random.PRNGKey(s), stream=True,
                           max_token_text_ratio=8.0)
            for t, s in zip(texts, rngs)
        ]
        outs = [list(batcher.stream_result(r, timeout=600.0)) for r in reqs]
        for got, want in zip(outs, solos):
            assert len(got) == len(want)
            for a, b in zip(got, want):
                assert a.shape == b.shape
                assert np.allclose(a, b, atol=2e-3), float(np.abs(a - b).max())
    finally:
        batcher.shutdown()


def test_service_streaming_rides_slots(engine):
    """A default-config tts_stream task is served through the decode slots
    (continuous_requests increments — server._run_continuous_stream) and
    yields valid 16-bit PCM chunks ending with the None sentinel."""
    import queue as _q

    from flowmirror_hydravox_tpu.frontend.frontend import Frontend, SpeakerInfo
    from flowmirror_hydravox_tpu.runtime.server import TTSService

    frontend = Frontend(engine.cfg)
    rng = np.random.default_rng(0)
    frontend.add_speaker(
        "a", SpeakerInfo(embedding=rng.standard_normal(192).astype(np.float32)))
    service = TTSService(engine, frontend, request_timeout=600.0,
                         continuous_slots=2, continuous_head_num=2)
    try:
        cq = _q.Queue()
        service.submit({"type": "tts_stream", "text": "stream on slots",
                        "speaker_id": "a", "chunk_queue": cq})
        chunks = []
        while True:
            item = cq.get(timeout=600)
            if item is None:
                break
            assert not isinstance(item, Exception), item
            chunks.append(item)
        assert chunks and all(isinstance(c, bytes) for c in chunks)
        pcm = np.frombuffer(b"".join(chunks), dtype="<i2")
        assert len(pcm) > 0
        assert service.continuous_requests == 1
    finally:
        service.shutdown()


def _solo_spec_tokens(engine, text, rng, head_num, min_ratio=2.0, max_ratio=8.0):
    cfg = engine.cfg.llm
    bucket = 32 if len(text) <= 32 else 64
    padded = np.zeros((bucket,), np.int32)
    padded[: len(text)] = text
    emb, plen = llm.build_inference_prompt(
        engine.llm_params, cfg, jnp.asarray(padded), jnp.int32(len(text)),
        jnp.zeros((0,), jnp.int32), jnp.int32(0),
    )
    res = llm.generate_speculative(
        engine.llm_params, cfg, rng, emb, plen,
        jnp.int32(int(len(text) * min_ratio)),
        jnp.int32(min(int(len(text) * max_ratio), 64)),
        SamplingParams.make(),
        num_heads=head_num, max_tokens=64,
    )
    n = int(res.result.num_tokens)
    acc, dr = int(res.accepted), int(res.drafted)
    return np.asarray(res.result.tokens)[:n], (acc / dr if dr else 0.0)


@pytest.mark.quick
def test_spec_slots_match_solo_speculative(engine):
    """spec_decode slots produce bit-identical tokens (and acceptance rate)
    to llm.generate_speculative with the same rng — the continuous batcher
    no longer trades the verified heads=1 distribution for slot residency."""
    batcher = ContinuousBatcher(engine, slots=2, chunk_steps=4, head_num=3,
                                spec_decode=True)
    try:
        texts = [np.arange(6, dtype=np.int32), np.arange(9, dtype=np.int32) % 7]
        rngs = [jax.random.PRNGKey(11), jax.random.PRNGKey(22)]
        reqs = [
            batcher.submit(t, rng=r, min_token_text_ratio=2.0,
                           max_token_text_ratio=8.0)
            for t, r in zip(texts, rngs)
        ]
        for req, text, rng in zip(reqs, texts, rngs):
            wav, stats = batcher.result(req, timeout=600.0)
            solo, acc = _solo_spec_tokens(engine, text, rng, head_num=3)
            assert stats["tokens"] == solo.tolist(), (stats["tokens"], solo)
            assert stats["spec_acceptance"] == pytest.approx(acc)
            assert len(wav) > 0 and np.isfinite(wav).all()
    finally:
        batcher.shutdown()


def test_spec_slots_admit_mid_flight(engine):
    """Spec slots desynchronize (1..K commits per block) — a request admitted
    mid-flight still matches its solo spec decode bit-for-bit."""
    import time

    batcher = ContinuousBatcher(engine, slots=2, chunk_steps=2, head_num=3,
                                spec_decode=True)
    try:
        t1 = np.arange(12, dtype=np.int32)
        r1 = batcher.submit(t1, rng=jax.random.PRNGKey(5),
                            min_token_text_ratio=4.0, max_token_text_ratio=5.0)
        deadline = time.time() + 120
        while batcher._slot_req[0] is None and time.time() < deadline:
            time.sleep(0.01)
        t2 = np.arange(5, dtype=np.int32)
        r2 = batcher.submit(t2, rng=jax.random.PRNGKey(6),
                            min_token_text_ratio=2.0, max_token_text_ratio=4.0)
        _, stats1 = batcher.result(r1, timeout=600.0)
        _, stats2 = batcher.result(r2, timeout=600.0)
        assert stats1["tokens"] == _solo_spec_tokens(
            engine, t1, jax.random.PRNGKey(5), 3, 4.0, 5.0)[0].tolist()
        assert stats2["tokens"] == _solo_spec_tokens(
            engine, t2, jax.random.PRNGKey(6), 3, 2.0, 4.0)[0].tolist()
    finally:
        batcher.shutdown()


def test_streaming_rides_spec_slots(engine):
    """A stream=True request on spec_decode slots: chunks arrive, the token
    stream is bit-identical to the solo speculative decode of the same
    decode-chain rng, and the acceptance stat lands in req.stats."""
    batcher = ContinuousBatcher(engine, slots=2, chunk_steps=4, head_num=3,
                                spec_decode=True)
    try:
        text = np.arange(8, dtype=np.int32)
        req = batcher.submit(text, rng=jax.random.PRNGKey(33), stream=True,
                             max_token_text_ratio=8.0)
        chunks = list(batcher.stream_result(req, timeout=600.0))
        assert chunks and all(np.isfinite(c).all() for c in chunks)
        decode_rng = jax.random.split(jax.random.PRNGKey(33))[0]
        solo, acc = _solo_spec_tokens(engine, text, decode_rng, head_num=3)
        assert req.stats["tokens"] == solo.tolist()
        assert req.stats["spec_acceptance"] == pytest.approx(acc)
        assert req.stats["ttft"] > 0
    finally:
        batcher.shutdown()


def test_service_spec_decode_with_continuous(engine):
    """--spec-decode + --continuous-batching now compose: matching requests
    ride the slots AND keep the verified heads=1 distribution (the former
    blind-MTP incompatibility rejection is gone)."""
    from flowmirror_hydravox_tpu.frontend.frontend import Frontend, SpeakerInfo
    from flowmirror_hydravox_tpu.runtime.engine import Engine
    from flowmirror_hydravox_tpu.runtime.server import TTSService

    spec_engine = Engine(
        engine.cfg, engine.llm_params, engine.flow_params, engine.hift_params,
        max_tokens=engine.max_tokens, prompt_buckets=engine.prompt_buckets,
        token_buckets=engine.token_buckets, mel_buckets=engine.mel_buckets,
        spec_decode=True,
    )
    frontend = Frontend(engine.cfg)
    rng = np.random.default_rng(0)
    frontend.add_speaker(
        "a", SpeakerInfo(embedding=rng.standard_normal(192).astype(np.float32)))
    service = TTSService(spec_engine, frontend, request_timeout=600.0,
                         continuous_slots=2, continuous_head_num=2)
    try:
        assert service.batcher is not None and service.batcher.spec
        tid = service.submit({"type": "tts", "text": "spec on slots",
                              "speaker_id": "a"})
        res = service.wait(tid)
        assert "output_audio" in res and len(res["output_audio"]) > 0, res
        assert service.continuous_requests == 1
        # head_num 1 cannot draft: still refused up front
        import pytest as _pytest

        with _pytest.raises(ValueError, match="head"):
            TTSService(spec_engine, frontend, continuous_slots=2,
                       continuous_head_num=1)
    finally:
        service.shutdown()


@pytest.mark.quick
def test_stream_priority_admission(engine):
    """Stream requests jump the admission backlog: when a slot frees, a
    waiting stream=True request is admitted before OLDER non-stream requests
    (VERDICT r3: TTFT under load must be bounded by the chunk cadence, not
    the whole-utterance queue depth). Driven by hand — no loop threads."""
    b = ContinuousBatcher(engine, slots=1, chunk_steps=2, head_num=2)
    b._started = True  # keep the loop threads off; _tick is driven by hand
    b._state = b._init_state()
    t = np.arange(5, dtype=np.int32)
    plain = [b.submit(t, rng=jax.random.PRNGKey(i),
                      min_token_text_ratio=2.0, max_token_text_ratio=4.0)
             for i in range(2)]
    stream = b.submit(t, rng=jax.random.PRNGKey(9), stream=True,
                      min_token_text_ratio=2.0, max_token_text_ratio=4.0)
    b._tick()  # admission pass: the younger stream wins the free slot
    # the admit BURST may complete a short stream entirely at admission
    # (slot already cleared, its chunks queued) — either way the stream,
    # not the older plain traffic, got the slot
    assert b._slot_req[0] is stream or (
        b._slot_req[0] is None and stream.sched_offset >= 0
        and not b._stream_q.empty())
    assert plain[0] in b._backlog and plain[1] in b._backlog
    b._started = False  # threads never ran; skip joins, fail leftovers
    b.shutdown()
    assert all(r.error for r in plain)


def test_stream_fairness_bound(engine):
    """Stream priority is BOUNDED: after stream_fairness_k consecutive
    stream admissions while whole-utterance work waits, one backlog request
    is admitted before the next stream — sustained streaming load can no
    longer starve the backlog to its result() timeout (ADVICE r4)."""
    b = ContinuousBatcher(engine, slots=1, chunk_steps=8, head_num=2)
    b.stream_fairness_k = 2
    b._started = True  # manual ticks, no loop threads
    b._state = b._init_state()
    t = np.arange(5, dtype=np.int32)
    streams = [b.submit(t, rng=jax.random.PRNGKey(i), stream=True,
                        min_token_text_ratio=2.0, max_token_text_ratio=2.0)
               for i in range(4)]
    plain = b.submit(t, rng=jax.random.PRNGKey(9),
                     min_token_text_ratio=2.0, max_token_text_ratio=2.0)
    for _ in range(30):
        b._tick()  # short streams may admit AND finish inside one tick
        if plain.t_admit is not None:
            break
    assert plain.t_admit is not None, "backlog request starved by stream lane"
    # the bound: at most stream_fairness_k streams were admitted before it
    before = sum(1 for s in streams
                 if s.t_admit is not None and s.t_admit < plain.t_admit)
    assert before <= 2, f"{before} streams admitted before the backlog"
    b._started = False
    b.shutdown()


def test_stream_lane_bypasses_worker_queue(engine):
    """Window mode (no continuous slots): a tts_stream request is served from
    the dedicated stream lane, not behind queued /tts work. Three slow /tts
    tasks occupy the worker; the stream's first chunk must arrive while they
    are still draining."""
    import queue as _q

    from flowmirror_hydravox_tpu.frontend.frontend import Frontend, SpeakerInfo
    from flowmirror_hydravox_tpu.runtime.server import TTSService

    frontend = Frontend(engine.cfg)
    rng = np.random.default_rng(0)
    frontend.add_speaker(
        "a", SpeakerInfo(embedding=rng.standard_normal(192).astype(np.float32)))
    service = TTSService(engine, frontend, request_timeout=600.0,
                         batch_window=0.0)
    try:
        # absorb stream-path compiles before timing anything
        cq0 = _q.Queue()
        service.submit({"type": "tts_stream", "text": "warm the stream path",
                        "speaker_id": "a", "chunk_queue": cq0})
        while cq0.get(timeout=600) is not None:
            pass

        orig = TTSService._process_tts_segmented

        def slow(self, task, sampling, head_num, speed):
            time.sleep(0.8)
            return orig(self, task, sampling, head_num, speed)

        TTSService._process_tts_segmented = slow
        try:
            t0 = time.time()
            for i in range(3):
                service.submit({"type": "tts", "text": f"slow {i}",
                                "speaker_id": "a"})
            cq = _q.Queue()
            service.submit({"type": "tts_stream", "text": "priority stream",
                            "speaker_id": "a", "chunk_queue": cq})
            first = cq.get(timeout=600)
            t_first = time.time() - t0
            assert first is not None and not isinstance(first, Exception)
            # three 0.8 s blockers are ahead in the worker queue; the warm
            # stream path must beat their 2.4 s serial drain
            assert t_first < 2.0, f"stream first chunk took {t_first:.2f}s"
            while cq.get(timeout=600) is not None:
                pass
        finally:
            TTSService._process_tts_segmented = orig
    finally:
        service.shutdown()


def test_service_prewarm_marks_batch_shapes(engine):
    """TTSService.prewarm compiles the flash-batch ladder and marks the warm
    keys so the cold-group fallback never triggers for prewarmed traffic; a
    subsequent coalesced group rides the warm program directly."""
    from flowmirror_hydravox_tpu.frontend.frontend import Frontend, SpeakerInfo
    from flowmirror_hydravox_tpu.runtime.server import TTSService

    frontend = Frontend(engine.cfg)
    rng = np.random.default_rng(0)
    frontend.add_speaker(
        "a", SpeakerInfo(embedding=rng.standard_normal(192).astype(np.float32)))
    service = TTSService(engine, frontend, request_timeout=600.0,
                         batch_window=0.1, cold_batch_fallback=True)
    try:
        text = "prewarm shapes test"
        service.prewarm(texts=[text], speaker_id="a", head_nums=[2],
                        batch_sizes=(1, 2), stream=False)
        assert len(service._warm_batches) >= 2
        # a coalesced pair must now be served AS a batch (not fall back cold)
        import threading as _th

        outs = [None, None]

        def one(i):
            tid = service.submit({"type": "tts", "text": text,
                                  "speaker_id": "a"})
            outs[i] = service.wait(tid)

        threads = [_th.Thread(target=one, args=(i,)) for i in range(2)]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        assert all(o and "output_audio" in o for o in outs)
        assert service.batched_requests >= 2
    finally:
        service.shutdown()


def test_service_prewarm_zero_shot_shapes(engine):
    """prewarm(zero_shot_prompt_shapes=[(pm, sp)]) extends the batch-synth
    ladder to zero-shot shapes (pm_bucket > 0), so strict mode can route
    coalesced zero-shot batches onto warm programs (ADVICE r4)."""
    from flowmirror_hydravox_tpu.frontend.frontend import Frontend, SpeakerInfo
    from flowmirror_hydravox_tpu.runtime.server import TTSService

    frontend = Frontend(engine.cfg)
    rng = np.random.default_rng(0)
    frontend.add_speaker(
        "a", SpeakerInfo(embedding=rng.standard_normal(192).astype(np.float32)))
    service = TTSService(engine, frontend, request_timeout=600.0,
                         batch_window=0.1)
    try:
        service.prewarm(texts=["zs shapes"], speaker_id="a", head_nums=[2],
                        batch_sizes=(1, 2), stream=False,
                        zero_shot_prompt_shapes=[(128, 32)])
        zs_warm = [k for k in engine._warm_group_shapes
                   if k[2] == 128 and k[3] == 32]
        assert zs_warm, "no zero-shot (pm=128, sp=32) batch-synth shape warmed"
        assert engine.strict_shapes
    finally:
        service.shutdown()


@pytest.mark.quick
def test_reserved_stream_slot(engine):
    """reserve_stream_slots=1: whole-utterance traffic can occupy at most
    slots-1, so an arriving stream starts decoding at the next chunk boundary
    instead of waiting for a full utterance to drain."""
    b = ContinuousBatcher(engine, slots=2, chunk_steps=2, head_num=2,
                          reserve_stream_slots=1)
    b._started = True  # drive _tick by hand
    b._state = b._init_state()
    t = np.arange(5, dtype=np.int32)
    plain = [b.submit(t, rng=jax.random.PRNGKey(i),
                      min_token_text_ratio=2.0, max_token_text_ratio=4.0)
             for i in range(2)]
    b._tick()  # only the non-reserved slot 1 takes plain traffic
    assert b._slot_req[0] is None and b._slot_req[1] is plain[0]
    stream = b.submit(t, rng=jax.random.PRNGKey(9), stream=True,
                      min_token_text_ratio=2.0, max_token_text_ratio=4.0)
    b._tick()  # the reserved slot admits the stream immediately
    # the admit burst may run the short stream to completion at admission
    # (slot cleared, chunks queued) — either way slot 0 served the stream
    # and never the plain backlog
    assert b._slot_req[0] is stream or (
        b._slot_req[0] is None and not b._stream_q.empty())
    assert b._slot_req[1] is plain[0]
    b._started = False
    b.shutdown()


@pytest.mark.quick
def test_stream_synth_queue_first_chunk_priority(engine):
    """The stream-synth queue serves FIRST chunks (token_offset 0, the TTFT
    product metric) before later chunks of other streams: decode runs ~5x
    realtime, so an earlier stream's whole chunk ladder is already queued
    when a new stream's first chunk arrives — FIFO order would put ~N
    chunk synths between an arriving stream and its first audio."""
    b = ContinuousBatcher(engine, slots=2, chunk_steps=2, head_num=2)
    reqA = b.submit(np.arange(5, dtype=np.int32), stream=True,
                    rng=jax.random.PRNGKey(0),
                    min_token_text_ratio=2.0, max_token_text_ratio=4.0)
    reqB = b.submit(np.arange(5, dtype=np.int32), stream=True,
                    rng=jax.random.PRNGKey(1),
                    min_token_text_ratio=2.0, max_token_text_ratio=4.0)
    b.shutdown()  # only the queue mechanics are under test
    q = b._stream_q
    while not q.empty():  # drop anything the loop threads queued
        q.get_nowait()
    # stream A's chunks 2 and 3 are backlogged; stream B's FIRST arrives last
    b._put_stream_chunk(("schunk", reqA, None, 25, False, 0, 0.0))
    b._put_stream_chunk(("schunk", reqA, None, 50, False, 0, 0.0))
    b._put_stream_chunk(("schunk", reqB, None, 0, False, 0, 0.0))
    order = [q.get_nowait()[2] for _ in range(3)]
    assert order[0][1] is reqB and order[0][3] == 0  # first chunk jumps
    assert [it[3] for it in order[1:]] == [25, 50]  # FIFO among the rest
