"""End-to-end benchmark on real hardware.

Measures the headline metric from BASELINE.md: end-to-end RTF for a
single-utterance synthesis (LLM multi-head decode @ heads=4 -> 10-step CFM
flow -> HiFT vocoder) at full flagship model size with random weights
(weights are absent from the reference snapshot; compute cost is identical).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline = target_rtf / measured_rtf (>= 1.0 means meeting the
RTF <= 0.05 target from BASELINE.json; that target assumes v5e-8 — this
bench runs whatever jax.devices() provides, typically one chip).
Also prints auxiliary metrics on preceding lines as JSON with "aux": true.

Structure (VERDICT r4 items 1-2 — rounds 3 AND 4 hit the driver's kill
timer at rc=124 because the global budget was calibrated against a
3000/3600 s ceiling while the driver kills near ~1800 s, and the
must-capture sections were ordered last):
  - global budget default is 1500 s (HYDRAVOX_BENCH_BUDGET) — the driver
    kill is treated as 1800 s and the plan targets 1500;
  - the HEADLINE is measured and printed FIRST, right after init, and
    re-printed verbatim as the final line (the driver parses the last line);
  - sections run in PRIORITY order: headline -> serving-under-load ->
    the four train steps -> trained-spec-decode (measure-only, committed
    checkpoint) -> tok-sweep/ttft/flash/roofline -> int8/spec/matcha last;
  - every section logs {"section": ..., "elapsed_s": ...} so a future
    timeout is attributable;
  - risky long-tail sections (train steps, serving under load) run as
    SUBPROCESSES with hard timeouts — a hang degrades to one error line;
  - the budget is checked between sections; sections that don't fit are
    skipped with a note instead of risking the driver's kill.
"""

import json
import os
import subprocess
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

T_START = time.time()
BUDGET_S = float(os.environ.get("HYDRAVOX_BENCH_BUDGET", 1500))

# every metric captured during the run, compacted — re-emitted as ONE line
# right before the final headline because the driver keeps only the LAST
# ~2000 chars of stdout: in rounds 2-4 the early sections' numbers scrolled
# out of that tail and read as "never ran" even when they did
SUMMARY = {}
_DROP_KEYS = ("aux", "metric", "note", "unit", "bg_load", "step_time_def",
              "batch", "tokens", "skipped")


def record(m: dict):
    name = m.get("metric")
    if not name:
        return
    if m.get("skipped"):
        SUMMARY[name] = "skip"
        return
    if "error" in m:
        SUMMARY[name] = "err"
        return
    keep = {k: v for k, v in m.items()
            if k not in _DROP_KEYS and isinstance(v, (int, float, bool))
            or k == "winner"}
    SUMMARY[name] = keep["value"] if list(keep) == ["value"] else keep


def emit(m: dict):
    record(m)
    print(json.dumps(m))


def _summary_lines():
    """The two driver-facing tail lines: compact summary + final headline
    (the measured one if it exists, else an honest error marker)."""
    summary = dict(SUMMARY)
    line = json.dumps({"aux": True, "summary": summary}, separators=(",", ":"))
    prime = ("value", "ttft_p50_ms", "latency_p95_ms", "tokens_per_sec",
             "step_ms", "rtf_effective", "winner")
    while len(line) > 1800:
        dicts = sorted((k for k, v in summary.items() if isinstance(v, dict)
                        and len(v) > 1),
                       key=lambda k: -len(json.dumps(summary[k])))
        if not dicts:
            break
        k = dicts[0]
        v = summary[k]
        pick = next((p for p in prime if p in v), next(iter(v)))
        summary[k] = v[pick]
        line = json.dumps({"aux": True, "summary": summary},
                          separators=(",", ":"))
    head = SUMMARY.get("rtf_e2e_heads4")
    if isinstance(head, (int, float)):
        final = json.dumps({"metric": "rtf_e2e_heads4", "value": head,
                            "unit": "x_realtime",
                            "vs_baseline": round(0.05 / head, 3)})
    else:
        final = json.dumps({"metric": "rtf_e2e_heads4",
                            "error": "not measured before watchdog"})
    return line, final


def _watchdog(limit_s: float):
    """Last-resort exit: if anything (including an XLA compile) is still
    running `limit_s` after start — i.e. just under the driver's ~1800 s
    kill — print the tail lines with whatever was captured and exit 0.
    rc=124 with an empty tail (rounds 3-4) loses EVERY number; rc=0 with
    partial numbers loses only the stuck section."""
    import threading

    def fire():
        time.sleep(max(limit_s - (time.time() - T_START), 1.0))
        line, final = _summary_lines()
        print(json.dumps({"aux": True, "metric": "bench_watchdog",
                          "error": f"still running at {limit_s:.0f}s; "
                                   "forced exit with captured metrics"}),
              flush=True)
        print(line, flush=True)
        print(final, flush=True)
        os._exit(0)

    threading.Thread(target=fire, daemon=True).start()


def remaining():
    return BUDGET_S - (time.time() - T_START)


class section:
    """Context manager: prints per-section elapsed; converts exceptions into
    one {"metric": name, "error": ...} line (aux sections must never kill
    the run). Use `with section(name, need_s) as ok:` and skip when not ok."""

    def __init__(self, name, need_s=0.0):
        self.name = name
        self.need_s = need_s
        self.ok = remaining() >= need_s

    def __enter__(self):
        if not self.ok:
            emit({
                "aux": True, "metric": self.name, "skipped": True,
                "note": f"budget: {remaining():.0f}s left, need ~{self.need_s:.0f}s"})
        self.t0 = time.time()
        return self.ok

    def __exit__(self, et, ev, tb):
        if et is not None and issubclass(et, Exception):
            emit({
                "aux": True, "metric": self.name,
                "error": f"{et.__name__}: {ev}"[:300]})
        if self.ok:
            print(json.dumps({
                "aux": True, "section": self.name,
                "elapsed_s": round(time.time() - self.t0, 1)}))
        # swallow ordinary exceptions (aux sections never take the headline
        # down) but let KeyboardInterrupt/SystemExit propagate — an operator
        # Ctrl-C or a driver SIGINT must actually stop the bench
        return et is not None and issubclass(et, Exception)


def main():
    # last-resort watchdog: forced clean exit with captured metrics
    # just before the driver's ~1800 s kill (rc=124 loses everything)
    _watchdog(min(BUDGET_S + 200.0, 1700.0))
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

    # ---- HEADLINE FIRST: fused single-dispatch engine, e2e RTF @ heads=4 ----
    engine_f = Engine(cfg, llm_params, flow_params, hift_params, max_tokens=max_gen)

    def run_f(rng_):
        text = np.arange(text_len, dtype=np.int32) % 1000
        return engine_f.synthesize(
            text_tokens=text, tts_text_len=text_len, inference_head_num=4,
            min_token_text_ratio=n_tokens / text_len,
            max_token_text_ratio=n_tokens / text_len, rng=rng_,
        )

    # NOT inside section(): a headline failure must fail the bench loudly
    t0 = time.time()
    run_f(jax.random.PRNGKey(42))  # compile
    print(f"# headline compile {time.time()-t0:.1f}s", file=sys.stderr)
    r = None
    for i in range(4):
        cand = run_f(jax.random.PRNGKey(400 + i))
        if r is None or cand.total_time < r.total_time:
            r = cand
    audio_dur = len(r.audio) / cfg.sample_rate
    rtf = r.total_time / audio_dur
    target = 0.05
    headline = {
        "metric": "rtf_e2e_heads4", "value": round(rtf, 5),
        "unit": "x_realtime", "vs_baseline": round(target / rtf, 3),
    }
    # printed NOW so a later hang can't lose it; re-printed verbatim as
    # the final line for the driver's last-line parse
    print(json.dumps(headline), flush=True)
    print(json.dumps({"aux": True, "section": "headline_rtf",
                      "elapsed_s": round(time.time() - T_START, 1)}))

    def run_tool(mod_args, name, budget_s):
        """One subprocess tool bounded by budget_s; relays its JSON lines.

        Skips (with a note) unless the FULL budget_s plus a 60 s global
        margin still fits — a shrunken budget would kill the tool mid-
        compile, which both loses the metric AND risks leaving queued
        remote work (the round-5 tunnel wedge).  stdout goes to a FILE,
        not a pipe: on timeout the lines the tool already printed are
        relayed anyway (round-5 dev: the serving bench timed out mid-suite
        and subprocess.run(capture_output=True) threw away the metrics it
        HAD captured)."""
        import tempfile

        with section(name, budget_s + 60) as ok:
            if not ok:
                return
            rc, timed_out = None, False
            with tempfile.TemporaryFile(mode="w+t") as out_f, \
                    tempfile.TemporaryFile(mode="w+t") as err_f:
                proc = subprocess.Popen(
                    [sys.executable, "-m"] + mod_args,
                    stdout=out_f, stderr=err_f, text=True,
                    cwd=os.path.dirname(os.path.abspath(__file__)))
                got = False
                pos = 0

                def relay_new():
                    """Relay complete new lines as the tool writes them, so
                    a watchdog exit mid-section still carries everything the
                    tool printed so far."""
                    nonlocal got, pos
                    out_f.seek(pos)
                    chunk = out_f.read()
                    if not chunk:
                        return
                    lines = chunk.split("\n")
                    # keep a trailing partial line for the next pass
                    tail_partial = lines.pop() if not chunk.endswith("\n") else ""
                    pos += len(chunk) - len(tail_partial)
                    for ln in lines:
                        ln = ln.strip()
                        if ln.startswith("{"):
                            try:
                                emit({"aux": True, **json.loads(ln)})
                                got = True
                            except ValueError:
                                pass

                deadline = time.time() + budget_s
                while True:
                    try:
                        rc = proc.wait(timeout=5)
                        break
                    except subprocess.TimeoutExpired:
                        relay_new()
                        if time.time() >= deadline:
                            timed_out = True
                            # SIGTERM first: give the tool a chance to
                            # unwind its device client — a SIGKILLed
                            # process can leave queued work on the remote
                            # chip that starves later sections (observed as
                            # a multi-hour tunnel backlog, round-5 dev)
                            proc.terminate()
                            try:
                                proc.wait(timeout=10)
                            except subprocess.TimeoutExpired:
                                proc.kill()
                                proc.wait()
                            break
                relay_new()
                err_f.seek(0)
                if timed_out:
                    emit({
                        "aux": True, "metric": name,
                        "error": f"timeout after {budget_s}s"
                                 + ("" if got else " (no output captured)")})
                    # drain barrier: the killed tool's queued remote work
                    # keeps executing and starves the NEXT sections (round-5
                    # rehearsal: a timed-out serving section made a 32 s
                    # train bench miss its 150 s budget).  A subprocess
                    # probe whose trivial fetch completes only after the
                    # backlog drains converts that hidden tax into one
                    # attributed line.
                    lim = max(min(300.0, remaining() - 250.0), 0.0)
                    if lim >= 30:
                        t_d = time.time()
                        probe = subprocess.Popen(
                            [sys.executable, "-c",
                             "import jax, numpy as np, jax.numpy as jnp;"
                             "print(float(np.asarray("
                             "jax.jit(lambda x: x + 1)(jnp.float32(1)))))"],
                            stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL)
                        try:
                            probe.wait(timeout=lim)
                            drained = True
                        except subprocess.TimeoutExpired:
                            probe.terminate()
                            try:
                                probe.wait(timeout=10)
                            except subprocess.TimeoutExpired:
                                probe.kill()
                                probe.wait()
                            drained = False
                        print(json.dumps({
                            "aux": True, "section": f"{name}_drain",
                            "elapsed_s": round(time.time() - t_d, 1),
                            "drained": drained}))
                elif not got:
                    err_tail = err_f.read()[-300:]
                    emit({
                        "aux": True, "metric": name,
                        "error": f"exit {rc}: {err_tail}"})

    # ---- serving under load FIRST among aux (VERDICT r4 items 1 & 3: the
    # round's headline claim — stream TTFT under load — must be captured
    # before anything optional gets a chance to eat the budget).  Budget
    # from the measured warm-cache sweep (2026-08-20 on this host):
    # continuous prewarm+TTFT ~190 s, staggered + capacity ~16 s each,
    # window prewarm+TTFT ~220 s with the trimmed (1,8)x192 ladder,
    # staggered window ~45 s, 8way ~70 s -> ~560 s + margin ------------------
    run_tool(["flowmirror_hydravox_tpu.tools.bench_serving",
              "--cache_dir", cache_dir,
              "--budget", str(int(min(640, max(remaining() - 120, 60))))],
             "bench_serving", int(min(670, max(remaining() - 100, 60))))

    # ---- train-step benches (subprocesses: a compiler OOM/SIGKILL degrades
    # to one error line — the GAN program once crashed the remote compiler).
    # Budgets from measured warm-cache costs + margin; each is skipped with
    # a note when the remaining budget says it can no longer fit. ----------
    # measured warm-cache costs on this host (2026-08-20): llm 32 s,
    # flow 68 s, gan 187 s (one ~150 s program recompiles every run —
    # it never lands in the persistent cache), dpo 86 s
    for which, budget_s in (("llm", 150), ("flow", 150), ("gan", 280),
                            ("dpo", 160)):
        run_tool(["flowmirror_hydravox_tpu.tools.bench_train",
                  "--which", which, "--cache_dir", cache_dir],
                 f"train_step_{which}", budget_s)

    # ---- spec decode with TRAINED heads (VERDICT r4 item 2): measure-only —
    # loads the committed checkpoint (assets/spec_readout.npz) instead of
    # training on-chip inside the bench (round 4 burned 684 s and timed out)
    run_tool(["flowmirror_hydravox_tpu.tools.bench_spec", "--trained",
              "--cache_dir", cache_dir],
             "spec_decode_trained", 200)

    # ---- two-stage engine: per-stage sweeps (accurate llm_time/TPS split) --
    engine = Engine(cfg, llm_params, flow_params, hift_params, max_tokens=max_gen,
                    fused=False)

    def run(head_num, rng_):
        text = np.arange(text_len, dtype=np.int32) % 1000
        return engine.synthesize(
            text_tokens=text,
            tts_text_len=text_len,
            inference_head_num=head_num,
            min_token_text_ratio=n_tokens / text_len,
            max_token_text_ratio=n_tokens / text_len,
            rng=rng_,
        )

    aux = {}
    with section("tok_s_sweep", 150) as ok:
        if ok:
            for heads in (1, 2, 4):
                t0 = time.time()
                r2 = run(heads, jax.random.PRNGKey(42))
                compile_time = time.time() - t0
                best_tps, best = 0.0, None
                for i in range(3):
                    r2 = run(heads, jax.random.PRNGKey(100 + i))
                    if r2.tps > best_tps:
                        best_tps, best = r2.tps, r2
                aux[heads] = best
                emit({
                    "aux": True, "metric": f"speech_tokens_per_sec_heads{heads}",
                    "value": round(best.tps, 2), "unit": "tok/s",
                    "tokens": int(len(best.speech_tokens)), "steps": best.steps,
                    "llm_time_s": round(best.llm_time, 4),
                    "compile_s": round(compile_time, 1),
                })

    # ---- TTFT: time to the first streamed ~1 s chunk at heads=4 ------------
    with section("ttft_solo", 120) as ok:
        if ok:
            synth = engine.streaming()
            text = np.arange(text_len, dtype=np.int32) % 1000

            def first_chunk_latency(rng_):
                t0 = time.time()
                gen = synth.synthesize_stream(
                    text_tokens=text, tts_text_len=text_len, inference_head_num=4,
                    min_token_text_ratio=n_tokens / text_len,
                    max_token_text_ratio=n_tokens / text_len, rng=rng_,
                )
                next(gen)
                dt = time.time() - t0
                for _ in gen:  # drain
                    pass
                return dt

            first_chunk_latency(jax.random.PRNGKey(7))  # warmup/compile
            ttfts = [first_chunk_latency(jax.random.PRNGKey(200 + i)) for i in range(3)]
            emit({
                "aux": True, "metric": "ttft_first_chunk_heads4",
                "value": round(float(np.median(ttfts)) * 1000, 1), "unit": "ms",
                "target_ms": 200,
            })

    # ---- flash batch: 4 utterances decode+vocode together (config 4) -------
    with section("flash_batch", 150) as ok:
        if ok:
            def run_batch(rng_):
                texts = [np.arange(text_len, dtype=np.int32) % 1000 for _ in range(4)]
                return engine_f.synthesize_batch(
                    texts, inference_head_num=4,
                    min_token_text_ratio=n_tokens / text_len,
                    max_token_text_ratio=n_tokens / text_len, rng=rng_,
                )

            run_batch(jax.random.PRNGKey(50))  # compile
            best = None
            for i in range(3):
                _, stats = run_batch(jax.random.PRNGKey(60 + i))
                if best is None or stats["rtf"] < best["rtf"]:
                    best = stats
            emit({
                "aux": True, "metric": "flash_batch4_rtf_heads4",
                "value": round(best["rtf"], 5), "unit": "x_realtime",
                "tokens": best["tokens"],
                "llm_s": round(best["llm_time"], 4),
                "synth_s": round(best["synth_time"], 4),
            })

    # ---- honest stage split + decode HBM roofline ---------------------------
    with section("stage_split_roofline", 100) as ok:
        if ok and 4 in aux:
            # time the vocoder alone on the same mel shape, then flow_s =
            # fused synth_s - hift_s (flow+hift are one fused program in the
            # served path; this decomposition is for observability only)
            n_frames = n_tokens * cfg.flow.token_mel_ratio
            mbkt = engine._bucket_mel(n_frames)
            mel_probe = jax.random.normal(jax.random.PRNGKey(3), (1, 80, mbkt)) * 2.0 - 6.0
            hift_fn = engine._hift_only_fn()
            jax.block_until_ready(hift_fn(hift_params, mel_probe, jax.random.PRNGKey(4)))
            probes = []
            for i in range(5):
                t0 = time.time()
                jax.block_until_ready(hift_fn(hift_params, mel_probe,
                                              jax.random.PRNGKey(5 + i)))
                probes.append(time.time() - t0)
            hift_s = min(probes)  # min: the tunnel adds tens of ms of jitter
            r2 = aux[4]  # two-stage run: accurate llm/synth split
            flow_s = max(r2.synth_time - hift_s, 0.0)
            emit({
                "aux": True, "metric": "stage_times_heads4",
                "llm_s": round(r2.llm_time, 4), "flow_s": round(flow_s, 4),
                "hift_s": round(hift_s, 4),
                "fused_total_s": round(r.total_time, 4),
            })

            # decode HBM roofline: each base-LLM step streams the backbone
            # layers, the active MTP heads, and the shared decoder once from
            # HBM (batch 1, bandwidth-bound). The embedding table is gathered
            # (K rows), not streamed, so it is excluded; so is the unused 5th
            # head. v5e ~819 GB/s.  CANONICAL step time = queued-dispatch
            # wall / steps (docs/profiles/decode_heads4.md pins the three
            # methodologies; this one is the round-over-round comparable).
            def tree_bytes(t):
                return sum(int(np.prod(p.shape)) * p.dtype.itemsize
                           for p in jax.tree.leaves(t))

            heads_used = 4
            mtp_bytes = tree_bytes(llm_params["mtp_block"]) * heads_used / cfg.llm.head_num
            weight_bytes = (
                tree_bytes(llm_params["backbone"]["layers"])
                + mtp_bytes
                + tree_bytes(llm_params["llm_decoder"])
            )
            # step time: queue several decode dispatches back-to-back and
            # fetch only the last — a single dispatch carries a ~30 ms tunnel
            # round-trip that is NOT decode cost (docs/profiles/
            # decode_heads4.md has the xplane-verified device-side budget).
            from flowmirror_hydravox_tpu.ops.sampling import SamplingParams as _SP

            tbkt = engine._bucket_prompt(text_len)
            text_pad = np.zeros((tbkt,), np.int32)
            text_pad[:text_len] = np.arange(text_len, dtype=np.int32) % 1000
            s_cfg = cfg.tts_sampling
            sp_roof = _SP.make(s_cfg.top_p, s_cfg.top_k, s_cfg.win_size, s_cfg.tau_r)
            gen_roof = engine._generate_fn(tbkt, 0, 4)

            def roof_dispatch(key):
                _, packed = gen_roof(engine.llm_params, key, jnp.asarray(text_pad),
                                     jnp.int32(text_len),
                                     jnp.asarray(np.zeros((0,), np.int32)),
                                     jnp.int32(0), jnp.int32(n_tokens),
                                     jnp.int32(n_tokens), sp_roof)
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
            emit({
                "aux": True, "metric": "decode_hbm_roofline_heads4",
                "value": round(roofline_pct, 1), "unit": "%_of_819GBps",
                "weight_gb": round(weight_bytes / 1e9, 3),
                "step_ms": round(step_s * 1000, 3),
                "step_time_def": "queued-dispatch wall (canonical; see "
                                 "docs/profiles/decode_heads4.md)",
                "single_dispatch_step_ms": round(
                    r2.llm_time / max(r2.steps, 1) * 1000, 3),
                "tokens_per_sec_per_chip": round(
                    r2.tps / max(len(jax.devices()), 1), 1),
            })

    # ---- weight-only int8 serving mode (ops/quant.py) -----------------------
    with section("int8", 100) as ok:
        if ok:
            engine_q2 = Engine(cfg, llm_params, flow_params, hift_params,
                               max_tokens=max_gen, quantize="int8", fused=False)
            engine_q = Engine(cfg, llm_params, flow_params, hift_params,
                              max_tokens=max_gen, quantize="int8")

            def run_q(eng, rng_):
                text = np.arange(text_len, dtype=np.int32) % 1000
                return eng.synthesize(
                    text_tokens=text, tts_text_len=text_len, inference_head_num=4,
                    min_token_text_ratio=n_tokens / text_len,
                    max_token_text_ratio=n_tokens / text_len, rng=rng_,
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
            emit({
                "aux": True, "metric": "rtf_e2e_heads4_int8",
                "value": round(rtf_q, 5), "unit": "x_realtime",
                "tokens_per_sec": round(best_tps_q.tps, 1),
                "llm_time_s": round(best_tps_q.llm_time, 4),
                "note": "weight-only int8 LLM (--quantize int8); bf16 is the "
                        "default/headline",
            })
            del engine_q, engine_q2

    # ---- self-speculative MTP decode (--spec-decode), random weights --------
    # heads 1..3 draft, head 0 verifies — exact heads=1 output distribution;
    # throughput depends on draft acceptance.  Random weights give a
    # structural acceptance floor; spec_decode_trained above measured the
    # design point with the committed trained-readout checkpoint.
    with section("spec_decode", 80) as ok:
        if ok:
            engine_s = Engine(cfg, llm_params, flow_params, hift_params,
                              max_tokens=max_gen, fused=False, spec_decode=True)

            def run_s(rng_):
                text = np.arange(text_len, dtype=np.int32) % 1000
                return engine_s.synthesize(
                    text_tokens=text, tts_text_len=text_len, inference_head_num=4,
                    min_token_text_ratio=n_tokens / text_len,
                    max_token_text_ratio=n_tokens / text_len, rng=rng_,
                )

            run_s(jax.random.PRNGKey(40))  # compile
            best_s = None
            for i in range(3):
                rs = run_s(jax.random.PRNGKey(320 + i))
                if best_s is None or rs.tps > best_s.tps:
                    best_s = rs
            emit({
                "aux": True, "metric": "spec_decode_tokens_per_sec_heads4",
                "value": round(best_s.tps, 2), "unit": "tok/s",
                "acceptance": round(best_s.spec_acceptance, 3),
                "tokens_per_step": round(
                    len(best_s.speech_tokens) / max(best_s.steps, 1), 2),
                "llm_time_s": round(best_s.llm_time, 4),
                "note": "exact heads=1 output distribution (verified drafts); "
                        "random weights = acceptance floor, see "
                        "spec_decode_trained for the trained number",
            })
            del engine_s

    # ---- Matcha-TTS RTF (vendored second stack, reference metric) -----------
    with section("matcha", 90) as ok:
        if ok:
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
            def matcha_e2e(rng_):
                out = matcha_model.synthesise(mparams, mcfg, rng_, mx, mxl,
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
            emit({
                "aux": True, "metric": "matcha_rtf",
                "value": round(t_m / max(audio_s_m, 1e-9), 5), "unit": "x_realtime",
                "synth_s": round(t_m, 4), "audio_s": round(audio_s_m, 3),
                "note": "full-size Matcha + HiFi-GAN, 10 ODE steps, reference "
                        "metric matcha_tts.py:138",
            })

    print(json.dumps({"aux": True, "section": "bench_total",
                      "elapsed_s": round(time.time() - T_START, 1)}))
    # one COMPACT line with every captured metric: the driver keeps only the
    # last ~2000 chars of stdout, so numbers printed early (serving, train
    # steps) would otherwise scroll out of the recorded tail (VERDICT r4
    # item 2 — the round-4 headline printed fine and was still "lost")
    record(headline)
    line, _final = _summary_lines()
    print(line)
    # final line = the driver-parsed headline, identical to the early print
    print(json.dumps(headline))


if __name__ == "__main__":
    main()
