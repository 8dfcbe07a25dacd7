"""End-to-end engine + HTTP server tests (tiny config, random weights)."""

import base64
import io
import json
import threading
import urllib.request
import wave

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowmirror_hydravox_tpu.config import tiny_config
from flowmirror_hydravox_tpu.frontend.frontend import Frontend, SpeakerInfo
from flowmirror_hydravox_tpu.models import flow, hift, llm
from flowmirror_hydravox_tpu.runtime.engine import Engine


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


def test_synthesize_e2e(engine):
    res = engine.synthesize(
        text_tokens=np.arange(10, dtype=np.int32),
        tts_text_len=10,
        inference_head_num=2,
        rng=jax.random.PRNGKey(0),
    )
    n_tok = len(res.speech_tokens)
    assert n_tok >= 10 * 2 // 2  # >= min_len default 2x.. at least some tokens
    # n_tok tokens at 25 Hz -> n_tok * token_mel_ratio mel frames * 480 samples
    samples_per_token = engine.cfg.flow.token_mel_ratio * engine.cfg.hift.upsample_scale
    assert res.audio.shape == (n_tok * samples_per_token,)
    assert np.isfinite(res.audio).all()
    assert res.tps > 0 and res.rtf > 0


def test_synthesize_zero_shot_inputs(engine):
    """Prompt tokens + prompt mel path (flow conditioning region sliced off)."""
    res = engine.synthesize(
        text_tokens=np.arange(8, dtype=np.int32),
        tts_text_len=8,
        inference_head_num=1,
        prompt_speech_tokens=np.arange(6, dtype=np.int32) % 50,
        prompt_mel=np.random.default_rng(0).standard_normal((12, 80)).astype(np.float32),
        spk_embedding=np.random.default_rng(1).standard_normal(192).astype(np.float32),
        rng=jax.random.PRNGKey(1),
    )
    samples_per_token = engine.cfg.flow.token_mel_ratio * engine.cfg.hift.upsample_scale
    assert len(res.audio) == len(res.speech_tokens) * samples_per_token


def test_speed_changes_length(engine):
    kwargs = dict(
        text_tokens=np.arange(8, dtype=np.int32), tts_text_len=8,
        inference_head_num=1, rng=jax.random.PRNGKey(2),
    )
    normal = engine.synthesize(speed=1.0, **kwargs)
    fast = engine.synthesize(speed=2.0, **kwargs)
    # same rng -> same token count; fast audio should be about half as long
    assert len(fast.audio) < len(normal.audio)


def test_http_server_roundtrip(engine):
    from flowmirror_hydravox_tpu.runtime.server import make_server

    frontend = Frontend(engine.cfg)
    frontend.add_speaker(
        "demo",
        SpeakerInfo(embedding=np.zeros(192, np.float32)),
    )
    server = make_server("127.0.0.1", 0, engine, frontend)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/api/v1/speakers", timeout=10) as r:
            body = json.load(r)
        assert body["success"] and body["data"]["speakers"] == ["demo"]

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/v1/tts",
            json.dumps({"text": "hi there world number 3",
                        "speaker_id": "demo",
                        "extra_params": {"inference_head_num": 1}}).encode(),
            {"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            body = json.load(r)
        assert body["success"], body
        wav_bytes = base64.b64decode(body["data"]["audio_base64"])
        with wave.open(io.BytesIO(wav_bytes)) as w:
            assert w.getframerate() == engine.cfg.sample_rate
            assert w.getnframes() > 0
        assert body["data"]["duration"] > 0
    finally:
        server.shutdown()


def test_service_concurrent_requests(engine):
    """API<->worker handoff under concurrency: parallel submitters all get
    results (the queue+worker design keeps the single device program stream
    race-free by construction, reference app_server.py:25-37 semantics)."""
    from flowmirror_hydravox_tpu.runtime.server import TTSService

    frontend = Frontend(engine.cfg)
    frontend.add_speaker("demo", SpeakerInfo(embedding=np.zeros(192, np.float32)))
    service = TTSService(engine, frontend, request_timeout=300.0)
    try:
        results = {}

        def one(i):
            tid = service.submit({
                "type": "tts", "text": f"hello {i}", "speaker_id": "demo",
                "extra_params": {"inference_head_num": 1},
            })
            results[i] = service.wait(tid)

        threads = [threading.Thread(target=one, args=(i,)) for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert len(results) == 3
        for r in results.values():
            assert "output_audio" in r and len(r["output_audio"]) > 0, r
    finally:
        service.shutdown()


def test_service_coalesces_concurrent_requests(engine):
    """Cross-request dynamic batching: concurrent plain SFT requests from
    DIFFERENT speakers ride one flash-batch dispatch (per-row speaker
    embeddings); a non-batchable request (speed!=1) runs solo."""
    from flowmirror_hydravox_tpu.runtime.server import TTSService

    frontend = Frontend(engine.cfg)
    rng = np.random.default_rng(0)
    frontend.add_speaker("a", SpeakerInfo(embedding=rng.standard_normal(192).astype(np.float32)))
    frontend.add_speaker("b", SpeakerInfo(embedding=rng.standard_normal(192).astype(np.float32)))
    service = TTSService(engine, frontend, request_timeout=600.0, batch_window=1.0,
                         cold_batch_fallback=False)
    try:
        tids = []
        for i, spk in enumerate(["a", "b", "a"]):
            tids.append(service.submit({
                "type": "tts", "text": f"hello sample {i}", "speaker_id": spk,
                "extra_params": {"inference_head_num": 1},
            }))
        # speed != 1.0 -> not batchable, runs through the solo path
        solo = service.submit({
            "type": "tts", "text": "solo request", "speaker_id": "b",
            "extra_params": {"inference_head_num": 1, "speed": 2.0},
        })
        outs = [service.wait(t) for t in tids]
        solo_out = service.wait(solo)
        for r in outs + [solo_out]:
            assert "output_audio" in r and len(r["output_audio"]) > 0, r
            assert np.isfinite(r["output_audio"]).all()
        # the three batchable requests were coalesced (first is picked up
        # immediately; the 1 s window collects the other two)
        assert service.batched_requests >= 2, service.batched_requests
    finally:
        service.shutdown()


def test_service_cold_batch_falls_back_per_task(engine):
    """With cold_batch_fallback on (default), the first-ever coalesced batch
    shape serves its group per-task (no client blocks on a batch compile)
    while the batch program warms in the background."""
    from flowmirror_hydravox_tpu.runtime.server import TTSService

    frontend = Frontend(engine.cfg)
    frontend.add_speaker("demo", SpeakerInfo(embedding=np.zeros(192, np.float32)))
    service = TTSService(engine, frontend, request_timeout=600.0, batch_window=1.0)
    try:
        tids = [service.submit({
            "type": "tts", "text": f"cold group {i}", "speaker_id": "demo",
            "extra_params": {"inference_head_num": 1},
        }) for i in range(3)]
        outs = [service.wait(t) for t in tids]
        for r in outs:
            assert "output_audio" in r and len(r["output_audio"]) > 0, r
        assert service.batched_requests == 0  # cold shape -> per-task
        # the compile may still be in flight; either set proves scheduling
        assert service._warm_batches or service._warming_batches
    finally:
        service.shutdown()


def test_service_coalesces_zero_shot_with_sft(engine):
    """Zero-shot requests with DIFFERENT prompt speakers coalesce with each
    other AND with plain SFT traffic in one flash batch (per-row prompt
    tokens/mel/embedding + per-row LM-prefix override — a cross-lingual row's
    LM sees no prefix while its flow is still prompt-conditioned).  Beyond
    the reference, which serves zero-shot one request per GPU worker."""
    from flowmirror_hydravox_tpu.runtime.server import TTSService

    frontend = Frontend(engine.cfg)
    rng = np.random.default_rng(7)
    frontend.add_speaker("sftspk", SpeakerInfo(
        embedding=rng.standard_normal(192).astype(np.float32)))
    service = TTSService(engine, frontend, request_timeout=600.0,
                         batch_window=1.0, cold_batch_fallback=False)
    try:
        wav_a = (rng.standard_normal(8000) * 0.1).astype(np.float32)
        wav_b = (rng.standard_normal(9600) * 0.1).astype(np.float32)
        tids = [
            service.submit({
                "type": "zero_shot", "tts_text": "clone me please",
                "prompt_text": "prompt one", "prompt_audio": wav_a,
                "prompt_sample_rate": 16000,
                "extra_params": {"inference_head_num": 1},
            }),
            service.submit({
                "type": "zero_shot", "tts_text": "another clone",
                "prompt_text": "prompt two", "prompt_audio": wav_b,
                "prompt_sample_rate": 16000,
                "extra_params": {"inference_head_num": 1},
            }),
            service.submit({
                "type": "zero_shot", "tts_text": "no lm prefix here",
                "mode": "cross_lingual", "prompt_audio": wav_a,
                "prompt_sample_rate": 16000,
                "extra_params": {"inference_head_num": 1},
            }),
            service.submit({
                "type": "tts", "text": "plain sft rides along",
                "speaker_id": "sftspk",
                "extra_params": {"inference_head_num": 1},
            }),
        ]
        outs = [service.wait(t) for t in tids]
        for r in outs:
            assert "output_audio" in r and len(r["output_audio"]) > 0, r
            assert np.isfinite(r["output_audio"]).all()
        # first task is picked up immediately; the 1 s window collects the
        # other three into its batch
        assert service.batched_requests >= 3, service.batched_requests
    finally:
        service.shutdown()


def test_service_survives_malformed_extra_params(engine):
    """A request with non-numeric extra_params must come back as a per-task
    error — not kill the worker thread (later requests still serve)."""
    from flowmirror_hydravox_tpu.runtime.server import TTSService

    frontend = Frontend(engine.cfg)
    frontend.add_speaker("demo", SpeakerInfo(embedding=np.zeros(192, np.float32)))
    service = TTSService(engine, frontend, request_timeout=300.0)
    try:
        bad = service.submit({
            "type": "tts", "text": "x", "speaker_id": "demo",
            "extra_params": {"speed": "fast", "top_p": None},
        })
        out = service.wait(bad)
        assert "error" in out, out
        good = service.submit({
            "type": "tts", "text": "still alive", "speaker_id": "demo",
            "extra_params": {"inference_head_num": 1},
        })
        out2 = service.wait(good)
        assert "output_audio" in out2 and len(out2["output_audio"]) > 0, out2
    finally:
        service.shutdown()


def test_fused_matches_two_stage(engine):
    """The single-dispatch fused program must produce the same tokens and
    waveform as the two-stage (decode -> fetch -> synth) path."""
    kwargs = dict(
        text_tokens=np.arange(10, dtype=np.int32), tts_text_len=10,
        inference_head_num=2, rng=jax.random.PRNGKey(5),
    )
    res_f = engine.synthesize(**kwargs)
    two_stage = Engine(
        engine.cfg, engine.llm_params, engine.flow_params, engine.hift_params,
        max_tokens=64, prompt_buckets=(64, 128), token_buckets=(64, 128),
        mel_buckets=(128, 256), fused=False,
    )
    res_t = two_stage.synthesize(**kwargs)
    np.testing.assert_array_equal(res_f.speech_tokens, res_t.speech_tokens)
    assert res_f.audio.shape == res_t.audio.shape
    np.testing.assert_allclose(res_f.audio, res_t.audio, atol=1e-6)


def test_spec_decode_engine_path(engine):
    """spec_decode=True: the fused single-dispatch program runs speculative
    verification — valid tokens/audio, acceptance stat surfaced; both fused
    and two-stage spec paths agree bit-for-bit (same rng stream)."""
    spec = Engine(
        engine.cfg, engine.llm_params, engine.flow_params, engine.hift_params,
        max_tokens=64, prompt_buckets=(64, 128), token_buckets=(64, 128),
        mel_buckets=(128, 256), spec_decode=True,
    )
    kwargs = dict(
        text_tokens=np.arange(10, dtype=np.int32), tts_text_len=10,
        inference_head_num=3, rng=jax.random.PRNGKey(7),
    )
    res = spec.synthesize(**kwargs)
    n_tok = len(res.speech_tokens)
    assert n_tok >= 10  # min_len = 2x text len... at least min ratio tokens
    assert (np.asarray(res.speech_tokens) < engine.cfg.llm.speech_token_size).all()
    spt = engine.cfg.flow.token_mel_ratio * engine.cfg.hift.upsample_scale
    assert res.audio.shape == (n_tok * spt,)
    assert np.isfinite(res.audio).all()
    assert 0.0 <= res.spec_acceptance <= 1.0
    # speculation emits >= 1 token per backbone block forward
    assert res.steps <= n_tok + 1

    spec2 = Engine(
        engine.cfg, engine.llm_params, engine.flow_params, engine.hift_params,
        max_tokens=64, prompt_buckets=(64, 128), token_buckets=(64, 128),
        mel_buckets=(128, 256), spec_decode=True, fused=False,
    )
    res2 = spec2.synthesize(**kwargs)
    np.testing.assert_array_equal(res.speech_tokens, res2.speech_tokens)
    # one int16 PCM step: fused (estimated bucket) vs two-stage (realized
    # bucket) accumulate f32 in different orders (see fallback test below)
    np.testing.assert_allclose(res.audio, res2.audio, atol=1.01 / 32767.0)
    # non-spec engines report no acceptance
    base = engine.synthesize(**kwargs)
    assert base.spec_acceptance == -1.0


def test_fused_underestimate_falls_back(engine):
    """A too-small fused bucket estimate must redispatch stage 2 correctly
    (and still match the well-estimated fused output bit-for-bit)."""
    kwargs = dict(
        text_tokens=np.arange(24, dtype=np.int32), tts_text_len=24,
        inference_head_num=2, min_token_text_ratio=2.0,
        max_token_text_ratio=2.0,  # exactly 48 tokens
        rng=jax.random.PRNGKey(6),
    )
    good = engine.synthesize(**kwargs)
    assert len(good.speech_tokens) == 48

    orig = engine._estimate_token_bucket
    engine._estimate_token_bucket = lambda *a: 32  # < 48 realized: overflow
    try:
        res = engine.synthesize(**kwargs)
    finally:
        engine._estimate_token_bucket = orig
    np.testing.assert_array_equal(res.speech_tokens, good.speech_tokens)
    assert res.audio.shape == good.audio.shape
    # tolerance = one int16 PCM step: the fused and two-stage programs may
    # accumulate f32 in different orders, flipping samples on the rounding
    # boundary by one LSB (1/32767)
    np.testing.assert_allclose(res.audio, good.audio, atol=1.01 / 32767.0)


def test_http_samples_and_dataset_enrollment(engine, tmp_path, monkeypatch):
    """Reference-sample browser routes + dataset mean-embedding enrollment
    (reference inference_tab.py:23-71/308-334, speaker_manage.py:191-259)."""
    import datasets as hf_datasets

    from flowmirror_hydravox_tpu.runtime.server import make_server

    sd = tmp_path / "samples"
    (sd / "spk").mkdir(parents=True)
    with wave.open(str(sd / "spk" / "clip.wav"), "wb") as w:
        w.setnchannels(1); w.setsampwidth(2); w.setframerate(16000)
        w.writeframes(np.zeros(1600, np.int16).tobytes())
    (sd / "spk" / "clip.txt").write_text("prompt words", encoding="utf-8")
    monkeypatch.setenv("TTS_SAMPLES_DIR", str(sd))

    hf_datasets.Dataset.from_dict(
        {"embedding": [[0.5] * 192, [1.5] * 192]}
    ).save_to_disk(str(tmp_path / "enroll_ds"))

    frontend = Frontend(engine.cfg)
    server = make_server("127.0.0.1", 0, engine, frontend)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    def post(path, payload, timeout=30):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}", json.dumps(payload).encode(),
            {"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return json.load(r)

    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/api/v1/samples", timeout=10) as r:
            body = json.load(r)
        assert body["success"]
        assert body["data"]["samples"] == [
            {"name": "spk/clip", "path": "spk/clip.wav", "has_text": True}]

        body = post("/api/v1/samples/load", {"path": "spk/clip.wav"})
        assert body["success"] and body["data"]["prompt_text"] == "prompt words"
        assert base64.b64decode(body["data"]["audio_base64"])[:4] == b"RIFF"

        with pytest.raises(urllib.error.HTTPError) as exc:
            post("/api/v1/samples/load", {"path": "../escape.wav"})
        assert exc.value.code == 400

        body = post("/api/v1/speakers/add",
                    {"speaker_id": "dsavg", "dataset_dir": str(tmp_path / "enroll_ds")})
        assert body["success"] and body["data"]["rows_averaged"] == 2
        np.testing.assert_allclose(
            frontend.spk2info["dsavg"].embedding, np.full(192, 1.0))

        with pytest.raises(urllib.error.HTTPError) as exc:
            post("/api/v1/speakers/add", {"speaker_id": "x"})
        assert exc.value.code == 400
    finally:
        server.shutdown()
