"""End-to-end benchmark on real hardware.

Measures the headline metric from BASELINE.md: end-to-end RTF for a
single-utterance synthesis (LLM multi-head decode @ heads=4 -> 10-step CFM
flow -> HiFT vocoder) at full flagship model size with random weights
(weights are absent from the reference snapshot; compute cost is identical).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline = target_rtf / measured_rtf (>= 1.0 means meeting the
RTF <= 0.05 target from BASELINE.json; that target assumes v5e-8 — this
bench runs whatever jax.devices() provides, typically one chip).
Also prints auxiliary metrics (tokens/sec at heads 1/2/4, TTFT-ish llm step
latency) on preceding lines as JSON with "aux": true.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import os

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # rbg PRNG: ~7% faster decode steps than threefry (sampling draws full-
    # vocab gumbels every step); sampling quality is unaffected, streams are
    # just a different counter-based generator
    if os.environ.get("HYDRAVOX_FAST_RNG", "1") not in ("0", "false"):
        jax.config.update("jax_default_prng_impl", "rbg")

    from flowmirror_hydravox_tpu.config import HydraVoxConfig
    from flowmirror_hydravox_tpu.models import llm as llm_model
    from flowmirror_hydravox_tpu.ops.sampling import SamplingParams
    from flowmirror_hydravox_tpu.runtime.engine import Engine
    from flowmirror_hydravox_tpu.models import flow as flow_model
    from flowmirror_hydravox_tpu.models import hift as hift_model

    cfg = HydraVoxConfig()
    rng = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)

    backend = jax.default_backend()
    print(f"# backend={backend} devices={jax.devices()}", file=sys.stderr)

    t0 = time.time()
    llm_params = jax.jit(lambda k: llm_model.init_params(k, cfg.llm, jnp.bfloat16))(k1)
    flow_params = jax.jit(lambda k: flow_model.init_params(k, cfg.flow, jnp.bfloat16))(k2)
    hift_params = jax.jit(lambda k: hift_model.init_params(k, cfg.hift, jnp.float32))(k3)
    jax.block_until_ready(llm_params["llm_decoder"])
    print(f"# init {time.time()-t0:.1f}s", file=sys.stderr)

    # ~5 s utterance: force exactly 125 speech tokens (min_len == max_len)
    n_tokens = 125
    text_len = 63  # tokens; max ratio 20 >> 125, min ratio 2 ~ 126
    max_gen = 128

    # two-stage engine for the per-stage sweeps (accurate llm_time/TPS split);
    # the headline RTF uses the default fused single-dispatch engine below
    engine = Engine(cfg, llm_params, flow_params, hift_params, max_tokens=max_gen,
                    fused=False)

    def run(head_num, rng):
        text = np.arange(text_len, dtype=np.int32) % 1000
        return engine.synthesize(
            text_tokens=text,
            tts_text_len=text_len,
            inference_head_num=head_num,
            min_token_text_ratio=n_tokens / text_len,
            max_token_text_ratio=n_tokens / text_len,
            rng=rng,
        )

    # warmup/compile each head config
    aux = {}
    for heads in (1, 2, 4):
        t0 = time.time()
        r = run(heads, jax.random.PRNGKey(42))
        compile_time = time.time() - t0
        # timed runs
        best_tps, best = 0.0, None
        for i in range(3):
            r = run(heads, jax.random.PRNGKey(100 + i))
            if r.tps > best_tps:
                best_tps, best = r.tps, r
        aux[heads] = best
        print(json.dumps({
            "aux": True, "metric": f"speech_tokens_per_sec_heads{heads}",
            "value": round(best.tps, 2), "unit": "tok/s",
            "tokens": int(len(best.speech_tokens)), "steps": best.steps,
            "llm_time_s": round(best.llm_time, 4),
            "compile_s": round(compile_time, 1),
        }))

    # weight-only int8 serving mode (Engine(quantize="int8"), ops/quant.py).
    # Two measurements: a two-stage engine for a decode tok/s directly
    # comparable to the bf16 sweep above (same llm_time denominator), and the
    # default fused engine for the e2e RTF a server actually gets.
    engine_q2 = Engine(cfg, llm_params, flow_params, hift_params,
                       max_tokens=max_gen, quantize="int8", fused=False)
    engine_q = Engine(cfg, llm_params, flow_params, hift_params,
                      max_tokens=max_gen, quantize="int8")

    def run_q(eng, rng):
        text = np.arange(text_len, dtype=np.int32) % 1000
        return eng.synthesize(
            text_tokens=text, tts_text_len=text_len, inference_head_num=4,
            min_token_text_ratio=n_tokens / text_len,
            max_token_text_ratio=n_tokens / text_len, rng=rng,
        )

    run_q(engine_q2, jax.random.PRNGKey(41))  # compile
    best_tps_q = None
    for i in range(3):
        rq = run_q(engine_q2, jax.random.PRNGKey(310 + i))
        if best_tps_q is None or rq.tps > best_tps_q.tps:
            best_tps_q = rq
    run_q(engine_q, jax.random.PRNGKey(41))  # compile
    best_q = None
    for i in range(3):
        rq = run_q(engine_q, jax.random.PRNGKey(300 + i))
        if best_q is None or rq.total_time < best_q.total_time:
            best_q = rq
    rtf_q = best_q.total_time / (len(best_q.audio) / cfg.sample_rate)
    print(json.dumps({
        "aux": True, "metric": "rtf_e2e_heads4_int8",
        "value": round(rtf_q, 5), "unit": "x_realtime",
        "tokens_per_sec": round(best_tps_q.tps, 1),
        "llm_time_s": round(best_tps_q.llm_time, 4),
        "note": "weight-only int8 LLM (--quantize int8); bf16 is the default/headline",
    }))
    del engine_q, engine_q2

    # self-speculative MTP decode (--spec-decode): heads 1..3 draft, head 0
    # verifies — exact heads=1 output distribution; throughput depends on
    # draft acceptance.  With random weights the near-uniform head dists
    # give a structural acceptance floor; trained MTP heads (the reference
    # ships them trained) push acceptance — and tok/s — toward the heads=4
    # blind-commit rate while keeping heads=1 quality.
    try:
        engine_s = Engine(cfg, llm_params, flow_params, hift_params,
                          max_tokens=max_gen, fused=False, spec_decode=True)

        def run_s(rng):
            text = np.arange(text_len, dtype=np.int32) % 1000
            return engine_s.synthesize(
                text_tokens=text, tts_text_len=text_len, inference_head_num=4,
                min_token_text_ratio=n_tokens / text_len,
                max_token_text_ratio=n_tokens / text_len, rng=rng,
            )

        run_s(jax.random.PRNGKey(40))  # compile
        best_s = None
        for i in range(3):
            rs = run_s(jax.random.PRNGKey(320 + i))
            if best_s is None or rs.tps > best_s.tps:
                best_s = rs
        print(json.dumps({
            "aux": True, "metric": "spec_decode_tokens_per_sec_heads4",
            "value": round(best_s.tps, 2), "unit": "tok/s",
            "acceptance": round(best_s.spec_acceptance, 3),
            "tokens_per_step": round(
                len(best_s.speech_tokens) / max(best_s.steps, 1), 2),
            "llm_time_s": round(best_s.llm_time, 4),
            "note": "exact heads=1 output distribution (verified drafts); "
                    "compare speech_tokens_per_sec_heads1",
        }))
        del engine_s
    except Exception as e:  # aux metric must never kill the headline run
        print(json.dumps({
            "aux": True, "metric": "spec_decode_tokens_per_sec_heads4",
            "error": f"{type(e).__name__}: {e}"[:300],
        }))

    # TTFT: time to the first streamed ~1 s chunk at heads=4
    synth = engine.streaming()
    text = np.arange(text_len, dtype=np.int32) % 1000

    def first_chunk_latency(rng):
        t0 = time.time()
        gen = synth.synthesize_stream(
            text_tokens=text, tts_text_len=text_len, inference_head_num=4,
            min_token_text_ratio=n_tokens / text_len,
            max_token_text_ratio=n_tokens / text_len, rng=rng,
        )
        next(gen)
        dt = time.time() - t0
        for _ in gen:  # drain
            pass
        return dt

    first_chunk_latency(jax.random.PRNGKey(7))  # warmup/compile
    ttfts = [first_chunk_latency(jax.random.PRNGKey(200 + i)) for i in range(3)]
    print(json.dumps({
        "aux": True, "metric": "ttft_first_chunk_heads4",
        "value": round(float(np.median(ttfts)) * 1000, 1), "unit": "ms",
        "target_ms": 200,
    }))

    # flash batch: 4 utterances decode+vocode together (BASELINE config 4)
    # headline engine (default fused single-dispatch path) — also used for
    # the flash-batch metric, which serves through the same fused programs
    engine_f = Engine(cfg, llm_params, flow_params, hift_params, max_tokens=max_gen)

    def run_batch(rng):
        texts = [np.arange(text_len, dtype=np.int32) % 1000 for _ in range(4)]
        return engine_f.synthesize_batch(
            texts, inference_head_num=4,
            min_token_text_ratio=n_tokens / text_len,
            max_token_text_ratio=n_tokens / text_len, rng=rng,
        )

    run_batch(jax.random.PRNGKey(50))  # compile
    best = None
    for i in range(3):
        _, stats = run_batch(jax.random.PRNGKey(60 + i))
        if best is None or stats["rtf"] < best["rtf"]:
            best = stats
    print(json.dumps({
        "aux": True, "metric": "flash_batch4_rtf_heads4",
        "value": round(best["rtf"], 5), "unit": "x_realtime",
        "tokens": best["tokens"],
        "llm_s": round(best["llm_time"], 4), "synth_s": round(best["synth_time"], 4),
    }))

    def run_f(rng):
        text = np.arange(text_len, dtype=np.int32) % 1000
        return engine_f.synthesize(
            text_tokens=text, tts_text_len=text_len, inference_head_num=4,
            min_token_text_ratio=n_tokens / text_len,
            max_token_text_ratio=n_tokens / text_len, rng=rng,
        )

    run_f(jax.random.PRNGKey(42))  # compile
    r = None
    for i in range(4):
        cand = run_f(jax.random.PRNGKey(400 + i))
        if r is None or cand.total_time < r.total_time:
            r = cand
    audio_dur = len(r.audio) / cfg.sample_rate
    rtf = r.total_time / audio_dur
    target = 0.05

    # honest stage split: time the vocoder alone on the same mel shape, then
    # flow_s = fused synth_s - hift_s (flow+hift are one fused program in the
    # served path; this decomposition is for observability only)
    n_frames = n_tokens * cfg.flow.token_mel_ratio
    mbkt = engine._bucket_mel(n_frames)
    mel_probe = jax.random.normal(jax.random.PRNGKey(3), (1, 80, mbkt)) * 2.0 - 6.0
    hift_fn = engine._hift_only_fn()
    jax.block_until_ready(hift_fn(hift_params, mel_probe, jax.random.PRNGKey(4)))
    probes = []
    for i in range(5):
        t0 = time.time()
        jax.block_until_ready(hift_fn(hift_params, mel_probe, jax.random.PRNGKey(5 + i)))
        probes.append(time.time() - t0)
    hift_s = min(probes)  # min: the tunnel adds tens of ms of jitter per call
    r2 = aux[4]  # two-stage run: accurate llm/synth split
    flow_s = max(r2.synth_time - hift_s, 0.0)
    print(json.dumps({
        "aux": True, "metric": "stage_times_heads4",
        "llm_s": round(r2.llm_time, 4), "flow_s": round(flow_s, 4),
        "hift_s": round(hift_s, 4), "audio_s": round(audio_dur, 3),
        "fused_total_s": round(r.total_time, 4),
    }))

    # decode HBM roofline: each base-LLM step streams the backbone layers,
    # the active MTP heads, and the shared decoder once from HBM (batch 1,
    # bandwidth-bound). The embedding table is gathered (K rows), not
    # streamed, so it is excluded; so is the unused 5th head. v5e ~819 GB/s.
    def tree_bytes(t):
        return sum(int(np.prod(p.shape)) * p.dtype.itemsize for p in jax.tree.leaves(t))

    heads_used = 4
    mtp_bytes = tree_bytes(llm_params["mtp_block"]) * heads_used / cfg.llm.head_num
    weight_bytes = (
        tree_bytes(llm_params["backbone"]["layers"])
        + mtp_bytes
        + tree_bytes(llm_params["llm_decoder"])
    )
    # step time: queue several decode dispatches back-to-back and fetch only
    # the last — on this bench host a single dispatch carries a ~30 ms tunnel
    # round-trip that is NOT decode cost (docs/profiles/decode_heads4.md has
    # the xplane-verified device-side budget). Reuses the warm heads=4
    # program from the sweep above.
    from flowmirror_hydravox_tpu.ops.sampling import SamplingParams as _SP

    tbkt = engine._bucket_prompt(text_len)
    text_pad = np.zeros((tbkt,), np.int32)
    text_pad[:text_len] = np.arange(text_len, dtype=np.int32) % 1000
    s_cfg = cfg.tts_sampling
    sp_roof = _SP.make(s_cfg.top_p, s_cfg.top_k, s_cfg.win_size, s_cfg.tau_r)
    gen_roof = engine._generate_fn(tbkt, 0, 4)

    def roof_dispatch(key):
        _, packed = gen_roof(engine.llm_params, key, jnp.asarray(text_pad),
                             jnp.int32(text_len), jnp.asarray(np.zeros((0,), np.int32)),
                             jnp.int32(0), jnp.int32(n_tokens), jnp.int32(n_tokens),
                             sp_roof)
        return packed

    np.asarray(roof_dispatch(jax.random.PRNGKey(70)))  # warm
    reps_r = 6
    t0 = time.time()
    for i in range(reps_r - 1):
        roof_dispatch(jax.random.PRNGKey(71 + i))
    steps_r = int(np.asarray(roof_dispatch(jax.random.PRNGKey(80)))[-1])
    step_s = (time.time() - t0) / (reps_r * max(steps_r, 1))
    hbm_peak = 819e9
    roofline_pct = (weight_bytes / step_s) / hbm_peak * 100
    print(json.dumps({
        "aux": True, "metric": "decode_hbm_roofline_heads4",
        "value": round(roofline_pct, 1), "unit": "%_of_819GBps",
        "weight_gb": round(weight_bytes / 1e9, 3),
        "step_ms": round(step_s * 1000, 3),
        "single_dispatch_step_ms": round(r2.llm_time / max(r2.steps, 1) * 1000, 3),
        "tokens_per_sec_per_chip": round(r2.tps / max(len(jax.devices()), 1), 1),
    }))
    # loaded serving throughput: 8 concurrent /tts requests through the
    # TTSService worker — exercises cross-request dynamic batching (requests
    # coalesce into one flash-batch dispatch with per-row embeddings)
    import threading

    from flowmirror_hydravox_tpu.frontend.frontend import Frontend, SpeakerInfo
    from flowmirror_hydravox_tpu.runtime.server import TTSService

    fe = Frontend(cfg)
    for i in range(3):
        fe.add_speaker(f"spk{i}", SpeakerInfo(
            embedding=np.random.default_rng(i).standard_normal(192).astype(np.float32)))
    service = TTSService(engine_f, fe, request_timeout=600.0, batch_window=0.05,
                         cold_batch_fallback=False)
    texts = [
        "并发请求吞吐测试第%d句，新闻播报的速度通常是每分钟两百四十字左右。" % i
        for i in range(8)
    ]

    def fire_all():
        outs = [None] * 8
        def one(i):
            tid = service.submit({
                "type": "tts", "text": texts[i], "speaker_id": f"spk{i % 3}",
                "extra_params": {"inference_head_num": 4},
            })
            outs[i] = service.wait(tid)
        threads = [threading.Thread(target=one, args=(i,)) for i in range(8)]
        t0 = time.time()
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        return time.time() - t0, outs

    fire_all()  # warmup/compile the coalesced batch shapes
    wall, outs = min((fire_all() for _ in range(2)), key=lambda x: x[0])
    n_err = sum(1 for o in outs if not (o and "output_audio" in o))
    audio_s = sum(len(o["output_audio"]) / cfg.sample_rate for o in outs
                  if o and "output_audio" in o)
    print(json.dumps({
        "aux": True, "metric": "service_throughput_8way",
        "wall_s": round(wall, 3),
        "audio_s": round(audio_s, 2),
        "rtf_effective": round(wall / max(audio_s, 1e-9), 5),
        "errors": n_err,  # >0 invalidates rtf_effective
        "batched_requests": service.batched_requests,
    }))
    service.shutdown()

    # --- real-HTTP serving metrics (VERDICT r2 items 4-5) -------------------
    # a live ThreadingHTTPServer on a loopback port, driven by the loadgen
    # machinery: (a) streaming TTFT percentiles while the worker is busy with
    # concurrent /tts traffic; (b) window-coalescing vs continuous-batching
    # under identical staggered (poisson open-loop) arrivals, with the
    # continuous mode's admission latency from /metrics.
    from flowmirror_hydravox_tpu.runtime.server import make_server
    from flowmirror_hydravox_tpu.tools.loadgen import run_load

    def _with_server(slots, fn, head_num=2):
        srv = make_server("127.0.0.1", 0, engine_f, fe, continuous_slots=slots,
                          continuous_head_num=head_num)
        th = threading.Thread(target=srv.serve_forever, daemon=True)
        th.start()
        url = f"http://127.0.0.1:{srv.server_address[1]}"
        try:
            return fn(url)
        finally:
            srv.shutdown()
            srv.RequestHandlerClass.service.shutdown()

    lg_text = "流式播报延迟测试：新闻播报的语速通常是每分钟两百四十字左右。"
    pay_h4 = json.dumps({"text": lg_text, "speaker_id": "spk0",
                         "extra_params": {"inference_head_num": 4}}).encode()
    pay_def = json.dumps({"text": lg_text, "speaker_id": "spk0"}).encode()

    def _ttft_under_load(url):
        # background /tts pressure: 6 closed-loop workers for the window
        stop_flag = [False]

        def bg():
            from flowmirror_hydravox_tpu.tools.loadgen import _tts_once
            while not stop_flag[0]:
                try:
                    _tts_once(url, pay_h4, 300.0)
                except Exception:
                    pass

        bgs = [threading.Thread(target=bg, daemon=True) for _ in range(6)]
        run_load(url, pay_h4, mode="stream", concurrency=1, duration=0.1,
                 warmup=1, timeout=600)  # compile absorption (stream programs)
        for t in bgs:
            t.start()
        # absorb the bg load's own compiles too: its 6 concurrent /tts
        # coalesce into flash-batch shapes (2..6) that may not be compiled
        # yet; measuring while they compile pollutes the stream TTFT tail
        time.sleep(12)
        res = run_load(url, pay_h4, mode="stream", concurrency=2, duration=20,
                       warmup=1, timeout=600)
        stop_flag[0] = True
        return res

    res = _with_server(0, _ttft_under_load)
    print(json.dumps({
        "aux": True, "metric": "ttft_under_load_http",
        "ttft_p50_ms": res["ttft_p50_ms"], "ttft_p95_ms": res["ttft_p95_ms"],
        "interchunk_gap_p95_ms": res["interchunk_gap_p95_ms"],
        "stream_requests": res["requests"], "errors": res["errors"],
        "bg_load": "6 closed-loop /tts workers", "target_ms": 200,
    }))

    # same scenario with continuous batching on (slots=4, head_num=4 so both
    # the bg /tts load and the streams ride the shared decode slots): the
    # stream's decode is admitted into the in-flight batch at a chunk
    # boundary instead of waiting behind whole utterances in the worker
    # queue, which is what bounds the TTFT tail under load
    res_c = _with_server(4, _ttft_under_load, head_num=4)
    print(json.dumps({
        "aux": True, "metric": "ttft_under_load_http_continuous",
        "ttft_p50_ms": res_c["ttft_p50_ms"], "ttft_p95_ms": res_c["ttft_p95_ms"],
        "interchunk_gap_p95_ms": res_c["interchunk_gap_p95_ms"],
        "stream_requests": res_c["requests"], "errors": res_c["errors"],
        "bg_load": "6 closed-loop /tts workers on the same 4 slots",
        "ttft_p95_window_ms": res["ttft_p95_ms"], "target_ms": 200,
    }))

    def _staggered(url):
        run_load(url, pay_def, mode="tts", concurrency=2, duration=0.1,
                 warmup=2, timeout=600)  # compile absorption
        out = run_load(url, pay_def, mode="tts", arrival="poisson", rate=3.0,
                       concurrency=8, duration=20, warmup=0, timeout=600)
        import urllib.request as _ur
        try:
            with _ur.urlopen(f"{url}/api/v1/metrics", timeout=10) as r:
                m = json.load(r).get("data") or {}
            out["admission_ms_p50"] = m.get("admission_ms_p50")
            out["admission_ms_p95"] = m.get("admission_ms_p95")
        except Exception:
            pass
        return out

    modes = {}
    for label, slots in (("window", 0), ("continuous", 4)):
        r_m = _with_server(slots, _staggered)
        modes[label] = r_m
        print(json.dumps({
            "aux": True, "metric": f"staggered_load_{label}",
            "rate_rps": 3.0, "requests": r_m["requests"], "errors": r_m["errors"],
            "latency_p50_ms": r_m["latency_p50_ms"],
            "latency_p95_ms": r_m["latency_p95_ms"],
            "rtf_effective": r_m["rtf_effective"],
            "admission_ms_p50": r_m.get("admission_ms_p50"),
            "admission_ms_p95": r_m.get("admission_ms_p95"),
        }))
    try:
        better = min(modes, key=lambda k: modes[k]["latency_p95_ms"] or 1e18)
        note = ("fixed decode slots bound the tail: admitted requests don't "
                "wait for a coalescing window" if better == "continuous" else
                "per-dispatch tunnel cost (~30ms) penalizes the chunked "
                "continuous mode on this bench host; see PARITY.md")
        print(json.dumps({
            "aux": True, "metric": "staggered_mode_winner", "winner": better,
            "p95_window_ms": modes["window"]["latency_p95_ms"],
            "p95_continuous_ms": modes["continuous"]["latency_p95_ms"],
            "note": note,
        }))
    except Exception:
        pass

    # Matcha-TTS RTF — the vendored second stack's reference-defined metric
    # (matcha/models/matcha_tts.py:138-139: rtf = t * 22050 / (mel_len * 256)).
    # Default (reference-size) config, mel + HiFi-GAN vocoder end to end.
    try:
        from flowmirror_hydravox_tpu.models.matcha import cli as matcha_cli  # noqa: F401
        from flowmirror_hydravox_tpu.models.matcha import model as matcha_model
        from flowmirror_hydravox_tpu.models.matcha import vocoder as matcha_vocoder

        mcfg = matcha_model.MatchaConfig()
        vcfg = matcha_vocoder.HiFiGANConfig()
        mk1, mk2 = jax.random.split(jax.random.PRNGKey(7))
        mparams = jax.jit(lambda k: matcha_model.init_params(k, mcfg))(mk1)
        vparams = jax.jit(lambda k: matcha_vocoder.init_params(k, vcfg))(mk2)
        t_x, max_mel = 64, 512
        mx = jnp.asarray(np.random.default_rng(0).integers(5, 100, (1, t_x)),
                         jnp.int32)
        mxl = jnp.asarray([t_x], jnp.int32)

        @jax.jit
        def matcha_e2e(rng):
            out = matcha_model.synthesise(mparams, mcfg, rng, mx, mxl,
                                          max_mel_len=max_mel)
            wav = matcha_vocoder.forward(vparams, vcfg, out["mel"])
            return wav, out["mel_lengths"]

        wav, mlen = matcha_e2e(jax.random.PRNGKey(0))  # compile
        reps_m = 4
        t0 = time.time()
        for i in range(reps_m - 1):
            matcha_e2e(jax.random.PRNGKey(1 + i))
        wav, mlen = matcha_e2e(jax.random.PRNGKey(reps_m))
        np.asarray(wav)  # fetch = sync (axon)
        t_m = (time.time() - t0) / reps_m
        audio_s_m = float(mlen[0]) * mcfg.hop_length / mcfg.sample_rate
        print(json.dumps({
            "aux": True, "metric": "matcha_rtf",
            "value": round(t_m / max(audio_s_m, 1e-9), 5), "unit": "x_realtime",
            "synth_s": round(t_m, 4), "audio_s": round(audio_s_m, 3),
            "note": "full-size Matcha + HiFi-GAN, 10 ODE steps, reference "
                    "metric matcha_tts.py:138",
        }))
    except Exception as e:
        print(json.dumps({"aux": True, "metric": "matcha_rtf",
                          "error": f"{type(e).__name__}: {str(e)[:200]}"}))

    # training throughput: one DP train step (MTP multi-head CE) at a
    # serving-scale batch; MFU vs v5e bf16 peak 197 TFLOP/s.  FLOPs model:
    # 6 * params_matmul * tokens (fwd+bwd) for the backbone over the full
    # padded sequence + the K heads applied per position.
    from flowmirror_hydravox_tpu.train.steps import (
        OptimConfig, init_state, llm_train_step, make_optimizer,
    )

    # NOTE: the donated train step invalidates llm_params' buffers — this
    # section must stay LAST in the bench (the engines above are done).
    b_tr, lt_tr, ls_tr = 8, 64, 256
    optimizer = make_optimizer(OptimConfig(warmup_steps=10, total_steps=1000))
    state = init_state(llm_params, optimizer)
    batch = {
        "text_token": jnp.zeros((b_tr, lt_tr), jnp.int32),
        "text_len": jnp.full((b_tr,), lt_tr, jnp.int32),
        "speech_token": jnp.asarray(
            np.random.default_rng(0).integers(0, cfg.llm.speech_token_size,
                                              (b_tr, ls_tr)).astype(np.int32)),
        "speech_len": jnp.full((b_tr,), ls_tr, jnp.int32),
    }
    step_fn = jax.jit(lambda s, bt: llm_train_step(s, bt, cfg.llm, optimizer),
                      donate_argnums=(0,))
    state, m = step_fn(state, batch)
    float(m["loss"])  # fetch = real sync on the axon backend
    # queue-and-fetch timing (same as tools/bench_train._time_steps):
    # block_until_ready does not reliably wait over the tunnel, and a
    # per-rep sync adds the ~30 ms dispatch cost to every step
    reps_tr = 8
    t0 = time.time()
    for _ in range(reps_tr - 1):
        state, m = step_fn(state, batch)
    state, m = step_fn(state, batch)
    float(m["loss"])
    step_s_tr = (time.time() - t0) / reps_tr
    seq = 2 + lt_tr + ls_tr
    tok_total = b_tr * seq

    def tree_matmul_params(t):
        return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(t) if p.ndim >= 2)

    p_backbone = tree_matmul_params(llm_params["backbone"]["layers"])
    p_heads = tree_matmul_params(llm_params["mtp_block"])  # all 5 heads train
    p_dec = int(np.prod(llm_params["llm_decoder"].shape))
    flops = 6 * tok_total * (p_backbone + p_heads + p_dec)
    peak = 197e12  # v5e bf16
    # this step is unsharded (single chip): MFU is per-chip regardless of how
    # many devices the host exposes
    mfu = flops / step_s_tr / peak * 100
    print(json.dumps({
        "aux": True, "metric": "train_step_llm",
        "tokens_per_sec": round(tok_total / step_s_tr, 1),
        "step_ms": round(step_s_tr * 1000, 1),
        "mfu_pct": round(mfu, 1),
        "batch": [b_tr, lt_tr, ls_tr],
    }))

    # flow/GAN/DPO train-step benches run as SUBPROCESSES: the GAN program's
    # compile once crashed the axon remote compiler (SIGKILL), and an isolated
    # process degrades that to a reported error instead of killing the bench
    # (tools/bench_train.py).
    import subprocess

    for which, budget_s in (("llm", 1500), ("flow", 1200), ("gan", 1800),
                            ("dpo", 1200)):
        try:
            proc = subprocess.run(
                [sys.executable, "-m", "flowmirror_hydravox_tpu.tools.bench_train",
                 "--which", which, "--cache_dir", cache_dir],
                capture_output=True, text=True, timeout=budget_s,
                cwd=os.path.dirname(os.path.abspath(__file__)))
            line = next((ln for ln in proc.stdout.strip().splitlines()[::-1]
                         if ln.startswith("{")), None)
            if line:
                print(json.dumps({"aux": True, **json.loads(line)}))
            else:
                print(json.dumps({
                    "aux": True, "metric": f"train_step_{which}",
                    "error": f"exit {proc.returncode}: {proc.stderr[-300:]}"}))
        except subprocess.TimeoutExpired:
            print(json.dumps({"aux": True, "metric": f"train_step_{which}",
                              "error": f"timeout after {budget_s}s"}))

    print(json.dumps({
        "metric": "rtf_e2e_heads4", "value": round(rtf, 5), "unit": "x_realtime",
        "vs_baseline": round(target / rtf, 3),
    }))


if __name__ == "__main__":
    main()
