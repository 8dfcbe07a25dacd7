"""HTTP serving layer with the reference's REST schema (server/router.py).

Endpoints (identical JSON shapes):
  POST /api/v1/tts        {text, speaker_id, output_format, extra_params}
  POST /api/v1/zero-shot  {tts_text, prompt_text, prompt_audio_base64, extra_params}
  POST /api/v1/load_pt    {llm_pt, flow_pt}
  GET  /api/v1/speakers
Responses: {success, message, data: {audio_base64, sample_rate, duration, ...},
  error} matching APIResponse (router.py:61-66, 184-190).

Architecture delta from the reference (documented, TPU-native): instead of a
FastAPI process + N GPU worker processes wired through a multiprocessing
Manager queue (app_server.py:22-66), requests run in one process against the
jitted Engine; a worker thread pool drains a queue so the HTTP layer stays
responsive while the device is busy (single TPU program stream).  FastAPI is
not in this image; the stdlib ThreadingHTTPServer keeps the dependency
surface zero while preserving the wire protocol.
"""

from __future__ import annotations

import json
import logging
import queue
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, Optional

import numpy as np

from ..config import SamplingConfig
from ..utils.wavio import audio_to_base64, load_audio_from_base64
from .engine import Engine

logger = logging.getLogger("hydravox.server")

DEFAULT_TTS_EXTRA = {"top_p": 0.9, "top_k": 10, "win_size": 24, "tau_r": 0.2,
                     "speed": 1.0, "inference_head_num": 2}
DEFAULT_ZS_EXTRA = {"top_p": 0.9, "top_k": 10, "win_size": 32, "tau_r": 0.2,
                    "speed": 1.0, "inference_head_num": 2}


class TTSService:
    """Queue + worker thread around the Engine (one device program stream).

    Mirrors worker.py:54-102 semantics: per-task sampling params rebind,
    text normalization, error capture into the result payload."""

    def __init__(self, engine: Engine, frontend, request_timeout: float = 60.0,
                 batch_window: float = 0.03, max_batch: int = 8,
                 continuous_slots: int = 0, continuous_head_num: int = 2,
                 cold_batch_fallback: bool = True,
                 continuous_reserve_stream: int = 1):
        """`batch_window`/`max_batch`: cross-request dynamic batching — when
        several plain SFT `/tts` requests are queued concurrently, the worker
        coalesces them (up to `max_batch` requests arriving within
        `batch_window` s) into ONE flash-batch program dispatch with per-row
        speaker embeddings.  Decode is HBM-bound, so a batch of 4 costs about
        the same wall-clock as 1 — the TPU-native upgrade over the
        reference's one-request-per-GPU-worker pool (server/worker.py:25-31).
        Set batch_window=0 to disable.

        `continuous_slots` > 0 enables CONTINUOUS (in-flight) batching
        (runtime/continuous.py, the vLLM-equivalent serving core): plain SFT
        requests with the default sampling/head config bypass the worker
        queue entirely and join a persistent fixed-slot decode — a new
        request joins mid-flight at the next chunk boundary instead of
        waiting for the running batch to drain.  Plain-mode zero-shot and
        streaming requests ride the slots too (per-slot prompts / chunked
        decode); cross-lingual/instruct2 and custom-sampling requests still
        flow through the worker (where concurrent ones window-coalesce)."""
        from .profiling import MetricsAggregator

        self.engine = engine
        self.frontend = frontend
        self.timeout = request_timeout
        self.batch_window = batch_window
        self.max_batch = max_batch
        self.batched_requests = 0  # requests served through a coalesced batch
        self.continuous_requests = 0  # requests served through continuous slots
        # a cold server's first coalesced batch shape would compile for
        # minutes while its clients block on the 60 s timeout: serve such a
        # group per-task instead and compile the batch program on a
        # background thread so the NEXT group rides it
        self.cold_batch_fallback = cold_batch_fallback
        self._warm_batches: set = set()  # shapes whose compile COMPLETED
        self._warming_batches: set = set()  # shapes compiling in the background
        self.metrics = MetricsAggregator()
        self.tasks: "queue.Queue" = queue.Queue()
        # submit -> worker-dequeue wait (window-mode queueing visibility; the
        # continuous slots report admission_lat_s instead) — /metrics
        from collections import deque

        self.queue_wait_s: "deque" = deque(maxlen=512)
        self.results: Dict[str, Any] = {}
        self.results_lock = threading.Lock()
        self._stop = threading.Event()
        self.batcher = None
        self._continuous_key = None
        self._cont_pool = None
        # the server's default extra_params; the HTTP handler merges these
        # under client values, so the continuous head count must BE the
        # default head count or no request would ever match the slots
        self.default_extra = dict(DEFAULT_TTS_EXTRA)
        spec = bool(getattr(engine, "spec_decode", False))
        if continuous_slots > 0 and spec and continuous_head_num < 2:
            raise ValueError(
                "--spec-decode with --continuous-batching needs "
                "--continuous-heads >= 2 (heads 1..K-1 draft, head 0 "
                "verifies)"
            )
        if continuous_slots > 0:
            from concurrent.futures import ThreadPoolExecutor

            from ..ops.sampling import SamplingParams
            from .continuous import ContinuousBatcher

            self.default_extra["inference_head_num"] = int(continuous_head_num)
            default = SamplingConfig(top_p=0.9, top_k=10, win_size=24, tau_r=0.2)
            self._continuous_key = (default, int(continuous_head_num))
            self.batcher = ContinuousBatcher(
                engine, slots=continuous_slots, head_num=continuous_head_num,
                sampling=SamplingParams.make(
                    default.top_p, default.top_k, default.win_size, default.tau_r
                ),
                # with --spec-decode the slots draft-and-verify too, so every
                # serving path keeps the exact heads=1 output distribution
                spec_decode=spec,
                # default: one slot reserved for streams (TTFT is the product
                # metric; costs 1/slots of batch throughput when no streams)
                reserve_stream_slots=continuous_reserve_stream,
            )
            # bounded frontend/wait threads for the continuous fast path (the
            # batcher itself bounds decode concurrency by its slot count)
            self._cont_pool = ThreadPoolExecutor(
                max_workers=max(8, 2 * continuous_slots),
                thread_name_prefix="continuous",
            )
        self.worker = threading.Thread(target=self._worker_loop, daemon=True)
        self.worker.start()
        # dedicated lane for streaming requests: TTFT is the product metric,
        # so a stream must never queue behind whole-utterance /tts groups in
        # the worker (the isolation the reference buys with one-request-per-
        # GPU-worker, server/worker.py:25-31).  Two threads so a pair of
        # concurrent streams don't serialize on each other either; device
        # dispatches interleave at chunk granularity.
        self.stream_tasks: "queue.Queue" = queue.Queue()
        self._stream_workers = [
            threading.Thread(target=self._stream_worker_loop, daemon=True)
            for _ in range(2)
        ]
        for t in self._stream_workers:
            t.start()

    def _record_wait(self, task: dict):
        t = task.get("t_submit")
        if t is not None:
            self.queue_wait_s.append(time.time() - t)

    def _stream_worker_loop(self):
        while not self._stop.is_set():
            try:
                task = self.stream_tasks.get(timeout=0.1)
            except queue.Empty:
                continue
            self._record_wait(task)
            self._run_one(task)

    def _worker_loop(self):
        while not self._stop.is_set():
            try:
                task = self.tasks.get(timeout=0.1)
            except queue.Empty:
                continue
            self._record_wait(task)
            try:
                group, leftover = [task], None
                if self.batch_window > 0 and self._batchable(task) is not None:
                    more, leftover = self._coalesce_more(task)
                    group += more
            except Exception:  # never let the worker thread die
                logger.exception("coalesce failed")
                group, leftover = [task], None
            if len(group) > 1:
                self._run_group(group)
            else:
                self._run_one(task)
            if leftover is not None:
                # the non-matching task pulled during coalescing runs NOW, in
                # arrival order — re-queuing it behind newer traffic would
                # starve it under sustained batchable load
                self._run_one(leftover)

    def _run_one(self, task: dict):
        tid = task["task_id"]
        try:
            result = self._process(task)
        except Exception as e:  # error flows back through the result dict
            logger.exception("task %s failed", tid)
            result = {"error": str(e)}
        with self.results_lock:
            self.results[tid] = result

    def _batchable(self, task: dict) -> Optional[tuple]:
        """A task joins a cross-request batch iff it is a non-stream, speed=1,
        no-rolling-prompt tts OR zero-shot request.  The flash batch carries
        per-row prompt tokens/mel/embedding, so zero-shot clones with
        DIFFERENT prompt speakers coalesce with each other and with plain SFT
        traffic (the reference runs one request per GPU worker instead).
        Returns the coalesce key (sampling, head_num), or None — including
        for malformed extra_params, which then surface as a per-task error
        via _run_one rather than killing the worker thread."""
        if task.get("type") == "tts":
            if task.get("last_prompt"):
                return None
        elif task.get("type") != "zero_shot":
            return None
        extra = task.get("extra_params") or {}
        try:
            if float(extra.get("speed", 1.0)) != 1.0:
                return None
            sampling = self._sampling(extra)
            head_num = int(extra.get("inference_head_num", 2))
        except (TypeError, ValueError):
            return None
        return (sampling, head_num)

    def _stream_batchable(self, task: dict) -> Optional[tuple]:
        """A tts_stream task rides the continuous slots iff its (sampling,
        head_num) is the batcher's one compiled configuration — the same
        matching rule as _batchable, minus the speed/last_prompt constraints
        (streaming has neither)."""
        if task.get("type") != "tts_stream":
            return None
        extra = task.get("extra_params") or {}
        try:
            sampling = self._sampling(extra)
            head_num = int(extra.get("inference_head_num", 2))
        except (TypeError, ValueError):
            return None
        return (sampling, head_num)

    def _coalesce_more(self, first: dict) -> tuple:
        """Pull more same-key batchable tasks for up to batch_window s.
        Returns (group_tail, leftover): a non-matching task ends coalescing
        and is handed back as `leftover` to run right after the group
        (preserving arrival order instead of re-queuing it at the back)."""
        key = self._batchable(first)
        group = []
        deadline = time.time() + self.batch_window
        while len(group) + 1 < self.max_batch:
            remaining = deadline - time.time()
            if remaining <= 0:
                break
            try:
                cand = self.tasks.get(timeout=remaining)
            except queue.Empty:
                break
            if self._batchable(cand) == key:
                group.append(cand)
            else:
                return group, cand
        return group, None

    def _run_group(self, group: list):
        """One flash-batch dispatch for N coalesced requests: rows = all
        requests' text segments, per-row speaker embeddings AND per-row
        zero-shot prompts (tokens + mel); results split back per request
        (with the reference's inter-segment pauses)."""
        import random as _random

        spans = []
        try:
            extra = group[0].get("extra_params") or {}
            sampling = self._sampling(extra)
            head_num = int(extra.get("inference_head_num", 2))
            sr = self.engine.cfg.sample_rate

            token_lists, tts_lens, emb_rows = [], [], []
            llm_rows, sp_rows, pm_rows = [], [], []
            fallback = []  # (task, reason) pairs that can't ride the batch
            for task in group:
                try:
                    row_feats = self._prepare_batch_rows(task)
                except Exception as e:
                    fallback.append((task, e))
                    continue
                start = len(token_lists)
                for tt, tl, llm_t, sp_t, pm_t, emb in row_feats:
                    token_lists.append(tt)
                    tts_lens.append(tl)
                    llm_rows.append(llm_t)
                    sp_rows.append(sp_t)
                    pm_rows.append(pm_t)
                    emb_rows.append(emb)
                spans.append((task, start, len(token_lists)))

            for task, err in fallback:
                if err is not None:
                    with self.results_lock:
                        self.results[task["task_id"]] = {"error": str(err)}
                else:
                    self._run_one(task)

            if not spans:
                return
            n_real = len(token_lists)
            warm_key, token_lists, batch_kwargs = self._assemble_batch(
                token_lists, tts_lens, llm_rows, sp_rows, pm_rows, emb_rows,
                sampling, head_num,
            )
            n_pad = len(token_lists)
            if self.cold_batch_fallback and warm_key not in self._warm_batches:
                if warm_key not in self._warming_batches:
                    self._warming_batches.add(warm_key)
                    rows = [np.array(t) for t in token_lists]

                    def warm():
                        try:
                            self.engine.synthesize_batch(rows, **batch_kwargs)
                            # mark warm only once the compile COMPLETED —
                            # groups arriving mid-compile keep falling back
                            self._warm_batches.add(warm_key)
                            logger.info("batch shape %s compiled", warm_key)
                        except Exception:
                            logger.exception("batch warmup failed")
                        finally:
                            self._warming_batches.discard(warm_key)

                    threading.Thread(target=warm, daemon=True).start()
                for task, _s, _e in spans:
                    self._run_one(task)  # serve this cold group per-task
                return
            wavs, stats = self.engine.synthesize_batch(token_lists, **batch_kwargs)
            self.batched_requests += len(spans)
            logger.info(
                "coalesced %d requests (%d rows, padded %d) rtf=%.4f",
                len(spans), n_real, n_pad, stats["rtf"],
            )
            for task, start, end in spans:
                pieces = []
                for i in range(start, end):
                    pieces.append(wavs[i])
                    if i < end - 1:
                        pieces.append(
                            np.zeros(int(_random.uniform(0.05, 0.15) * sr), np.float32)
                        )
                audio = np.concatenate(pieces) if pieces else np.zeros(0, np.float32)
                with self.results_lock:
                    self.results[task["task_id"]] = {
                        "output_audio": audio, "sample_rate": sr,
                    }
        except Exception as e:
            logger.exception("coalesced batch failed")
            # only span tasks still await a result here; fallback tasks were
            # already answered above (setdefault on them would leak entries)
            with self.results_lock:
                for task, _s, _e in spans:
                    self.results.setdefault(task["task_id"], {"error": str(e)})

    def _assemble_batch(self, token_lists, tts_lens, llm_rows, sp_rows,
                        pm_rows, emb_rows, sampling, head_num):
        """Pad the row count up to a power of two (so coalesced dispatches
        reuse a small set of compiled program shapes instead of compiling one
        per realized batch size) and compute the compile-shape warm key: the
        padded batch, text bucket, prompt-token/mel buckets, AND the fused
        program's estimated token bucket (a longer-text group with the same
        prompt bucket still needs a fresh compile).  Shared by _run_group and
        prewarm so the warmed keys are exactly the served keys."""
        token_lists = list(token_lists)
        tts_lens = list(tts_lens)
        llm_rows, sp_rows = list(llm_rows), list(sp_rows)
        pm_rows, emb_rows = list(pm_rows), list(emb_rows)
        n_pad = 1 << (len(token_lists) - 1).bit_length()
        while len(token_lists) < n_pad:
            token_lists.append(token_lists[-1])
            tts_lens.append(tts_lens[-1])
            llm_rows.append(llm_rows[-1])
            sp_rows.append(sp_rows[-1])
            pm_rows.append(pm_rows[-1])
            emb_rows.append(emb_rows[-1])
        max_lt = max(len(t) for t in token_lists)
        max_tts = max(tts_lens)
        lp_max = max((len(s) for s in sp_rows if s is not None), default=0)
        lm_max = max(
            (len(s) if e is None else len(e)
             for e, s in zip(llm_rows, sp_rows)
             if (s if e is None else e) is not None),
            default=0,
        )
        pm_max = max((len(p) for p in pm_rows if p is not None), default=0)
        warm_key = (
            n_pad,
            self.engine._bucket_prompt(max_lt),
            self.engine._estimate_token_bucket(
                max_tts, 2 * max_tts,
                min(20 * max_tts, self.engine.max_tokens), lp_max,
            ),
            head_num,
            self.engine._bucket_prompt(lm_max) if lm_max else 0,
            self.engine._bucket_prompt(lp_max) if lp_max else 0,
            self.engine._bucket_mel(pm_max) if pm_max else 0,
        )
        batch_kwargs = dict(
            sampling=sampling, inference_head_num=head_num,
            spk_embedding=np.stack(emb_rows),
            prompt_speech_tokens=sp_rows, prompt_mel=pm_rows,
            tts_text_lens=tts_lens, llm_prompt_speech_tokens=llm_rows,
        )
        return warm_key, token_lists, batch_kwargs

    def prewarm(self, texts=None, speaker_id=None, head_nums=None,
                batch_sizes=(1, 2, 4, 8), stream: bool = True,
                continuous_token_counts=(60, 125), timeout: float = 1800.0,
                zero_shot_prompt_shapes=(), ladder_token_cap=None,
                engine_paths: bool = True):
        """Compile every program the serving paths will use for traffic
        shaped like `texts` BEFORE it arrives: the flash-batch ladder
        (each padded batch size in `batch_sizes`), the solo path, the
        streaming path, and — when continuous batching is on — the slot
        programs (ContinuousBatcher.prewarm).  An XLA compile landing inside
        a serving window stalls every concurrent request for tens of seconds
        (BENCH_r03's 30-47 s TTFT under load); after prewarm the window/
        continuous modes serve exclusively from warm program caches.
        `engine_paths=False` skips the engine-level flash-batch/solo/stream
        shapes entirely and warms only the continuous-slot programs — the
        right profile for a slots-only deployment where every supported
        request rides the batcher (unsupported ones still fall back to the
        engine and compile on first use).  Returns seconds spent."""
        t0 = time.time()
        texts = texts or ["预热语句：新闻播报的语速通常是每分钟两百四十字左右。"]
        if speaker_id is None:
            speakers = self.frontend.available_speakers()
            if not speakers:
                raise ValueError("prewarm needs at least one enrolled speaker")
            speaker_id = speakers[0]
        head_nums = sorted(set(
            head_nums or [int(self.default_extra["inference_head_num"])]))
        sampling = self._sampling(self.default_extra)
        # engine-level prewarm marks: the jitted programs live on the shared
        # Engine, so a LATER service on the same engine (multi-tenant tests,
        # the serving bench's per-scenario servers) skips re-executing
        # engine-level prewarm work and only pays for its own batcher
        if not hasattr(self.engine, "_prewarm_marks"):
            self.engine._prewarm_marks = set()
        marks = self.engine._prewarm_marks
        for text in (texts if engine_paths else []):
            task = {"type": "tts", "text": text, "speaker_id": speaker_id}
            rows = self._prepare_batch_rows(task)
            for head in head_nums:
                for n in batch_sizes:
                    reps = -(-n // len(rows))
                    sub = (rows * reps)[:n]
                    warm_key, token_lists, kwargs = self._assemble_batch(
                        [r[0] for r in sub], [r[1] for r in sub],
                        [r[2] for r in sub], [r[3] for r in sub],
                        [r[4] for r in sub], [r[5] for r in sub],
                        sampling, head,
                    )
                    if warm_key in self._warm_batches:
                        continue
                    if ("batch", warm_key) not in marks:
                        self.engine.synthesize_batch(token_lists, **kwargs)
                        marks.add(("batch", warm_key))
                        logger.info("prewarmed batch shape %s", warm_key)
                    self._warm_batches.add(warm_key)
                # solo path (cold-group fallback + custom-sampling traffic)
                feats = self.frontend.frontend_sft(
                    self.frontend.text_normalize(text, split=True)[0],
                    speaker_id)
                solo_key = ("solo", len(feats["text_tokens"]), head, stream)
                if solo_key in marks:
                    continue
                marks.add(solo_key)
                self._synthesize_one(feats, sampling, head, 1.0)
                if stream:
                    # one sample stream compiles the fused-first-chunk +
                    # resumable-decode programs for this text bucket ...
                    gen = self.engine.streaming().synthesize_stream(
                        text_tokens=feats["text_tokens"],
                        tts_text_len=feats["tts_text_len"],
                        sampling=sampling, inference_head_num=head,
                        prompt_speech_tokens=feats.get("prompt_speech_tokens"),
                        prompt_mel=feats.get("prompt_mel"),
                        spk_embedding=feats.get("spk_embedding"),
                    )
                    for _ in gen:
                        pass
                    # ... and the chunk-program LADDER is walked directly: a
                    # sample stream only visits its own realized length's
                    # keys, leaving e.g. shorter buckets' finalize programs
                    # cold — a served stream then stalls 15 s+ MID-utterance
                    # compiling one (engine-level jit cache: this also covers
                    # streams riding the continuous slots)
                    cap = int(min(self.engine.max_tokens,
                                  20 * max(feats["tts_text_len"], 1)))
                    self.engine.streaming().prewarm_ladder(
                        cap, prompt_tokens=feats.get("prompt_speech_tokens"),
                        prompt_mel=feats.get("prompt_mel"))
        # fallback ladder: a request whose realized token count exceeds the
        # fused program's estimate redispatches into the two-stage synth at
        # the REALIZED bucket (engine.synthesize/synthesize_batch).  Those
        # programs are big; compiling one mid-traffic stalls the device for
        # a minute (BENCH r4 dev: a 73 s latency spike in a staggered
        # window).  Compile them now — solo for every oversize bucket, batch
        # for the group sizes closed-loop coalescing actually realizes.
        import jax
        import jax.numpy as jnp

        eng = self.engine
        task0 = {"type": "tts", "text": texts[0], "speaker_id": speaker_id}
        rows0 = self._prepare_batch_rows(task0)
        n_text = len(rows0[0][0])
        max_tts = max(r[1] for r in rows0)
        est = eng._estimate_token_bucket(
            max_tts, 2 * max_tts, min(20 * max_tts, eng.max_tokens), 0)
        # ladder_token_cap trims the fallback ladder's upper reach: each
        # shape costs a compile (cold) plus a program upload (~8-55 s on a
        # tunnel-attached host), and callers who KNOW their traffic's token
        # range (benchmarks, fixed-domain deployments) can skip the shapes
        # it never realizes — uncovered counts just dispatch the baseline
        # with the strict-mode warning
        hard_cap = min(20 * max_tts, eng.max_tokens)
        if ladder_token_cap is not None:
            hard_cap = min(hard_cap, int(ladder_token_cap))
        lo_bkt = eng._bucket_synth(max(2 * max_tts, 1))
        cap_bkt = eng._bucket_synth(hard_cap)
        est = min(est, cap_bkt)
        rng0 = jax.random.PRNGKey(0)

        # token buffers MUST be the canonical (max_tokens,) shape the serving
        # redispatch passes (GenerateResult.tokens): any other length would
        # warm a different trace, and the real redispatch would still compile
        # cold mid-traffic (measured: a 123 s batch-synth compile during a
        # load window because the prewarm traced max_tokens + head_num)
        def warm_solo(tb):
            jax.block_until_ready(eng._synth_fn(tb, 0, 0)(
                eng.flow_params, eng.hift_params,
                jnp.zeros((eng.max_tokens,), jnp.int32),
                jnp.int32(min(tb, eng.max_tokens)),
                jnp.zeros((0,), jnp.int32), jnp.int32(0),
                jnp.zeros((1, 0, eng.cfg.flow.output_size), jnp.float32),
                jnp.int32(0), jnp.zeros((1, 192), jnp.float32), rng0))

        def warm_batch(n_pad, tb, pmb=0, spb=0):
            jax.block_until_ready(eng._batch_synth_fn(n_pad, tb, pmb, spb)(
                eng.flow_params, eng.hift_params,
                jnp.zeros((n_pad, eng.max_tokens), jnp.int32),
                jnp.full((n_pad,), min(tb, eng.max_tokens), jnp.int32),
                jnp.zeros((n_pad, spb), jnp.int32),
                jnp.full((n_pad,), spb, jnp.int32),
                jnp.zeros((n_pad, pmb, eng.cfg.flow.output_size), jnp.float32),
                jnp.full((n_pad,), pmb, jnp.int32),
                jnp.zeros((n_pad, 192), jnp.float32), rng0))
            eng.register_warm_batch_synth(n_pad, tb, pmb, spb)

        # the flash-batch path is two-stage for coalesced traffic: decode,
        # fetch realized counts, synth at the tight bucket (length-grouped
        # when cheaper — engine._plan_synth_groups only ever uses shapes
        # registered HERE, so this ladder defines the serving shapes).
        # Ordering matters under the wall-clock bound: the shapes traffic is
        # most likely to realize (large batch, buckets at/under the
        # estimate) compile first; an unwarmed shape is never compiled
        # mid-request — the planner just pads onto a warmer one.
        ladder = []
        in_range = [tb for tb in eng.synth_buckets if lo_bkt <= tb <= est]
        for tb in reversed(in_range):
            for n_pad in sorted((p for p in batch_sizes if p >= 2),
                                reverse=True):
                ladder.append(("batch", n_pad, tb))
        for tb in (tb for tb in eng.synth_buckets if est < tb <= cap_bkt):
            ladder.append(("solo", 0, tb))
            for n_pad in (p for p in batch_sizes if p >= 4):
                ladder.append(("batch", n_pad, tb))
        # zero-shot coalescing shapes (pm_bucket > 0): the SFT ladder above
        # covers none of them, so strict mode would otherwise fall back to a
        # possibly-cold baseline dispatch on the first coalesced zero-shot
        # batch.  Callers name the (prompt-mel bucket, prompt-token bucket)
        # pairs their enrolled prompts realize, e.g. a ~5 s clone prompt is
        # (256, 128); each pair adds batch shapes at the likeliest buckets.
        for pmb, spb in zero_shot_prompt_shapes:
            zs_lo = eng._bucket_synth(max(spb + 2 * max_tts, 1))
            zs_hi = eng._bucket_synth(min(spb + 20 * max_tts, eng.max_tokens))
            zs_range = [tb for tb in eng.synth_buckets if zs_lo <= tb <= zs_hi]
            for tb in zs_range:
                for n_pad in (p for p in batch_sizes if p >= 2):
                    ladder.append(("batch", n_pad, tb, pmb, spb))
        if not engine_paths:
            ladder = []
        deadline = t0 + timeout
        for kind, n_pad, tb, *zs in ladder:
            pmb, spb = zs if zs else (0, 0)
            if time.time() > deadline:
                logger.warning(
                    "prewarm wall-clock budget (%.0fs) exhausted; remaining "
                    "synth shapes stay cold (served via warmer buckets)",
                    timeout)
                break
            key = ("fallback", kind, n_pad, tb, pmb, spb)
            if key in marks:
                if kind == "batch":  # a fresh service on a warm engine
                    eng.register_warm_batch_synth(n_pad, tb, pmb, spb)
                continue
            marks.add(key)
            if kind == "solo":
                warm_solo(tb)
            else:
                warm_batch(n_pad, tb, pmb, spb)
            logger.info("prewarmed %s synth bucket %d x%d (pm %d sp %d)",
                        kind, tb, n_pad, pmb, spb)
        if self.batcher is not None:
            # the engine ladder above may have spent most of the budget:
            # hand the batcher what is actually LEFT, not the full window
            # (round-5 dev: the nested full-window timeout let a bench's
            # prewarm overrun its subprocess budget by minutes)
            self.batcher.prewarm(
                text_lens=(n_text,), token_counts=continuous_token_counts,
                stream=stream, timeout=max(deadline - time.time(), 20.0),
                token_cap=ladder_token_cap)
        # from here on, the grouped-synth planner must never compile a new
        # batch-synth shape mid-traffic — the ladder above defines serving
        eng.strict_shapes = True
        dt = time.time() - t0
        logger.info("service prewarm done in %.1fs", dt)
        return dt

    def _sampling(self, extra: dict) -> SamplingConfig:
        return SamplingConfig(
            top_p=float(extra.get("top_p", 0.9)),
            top_k=int(extra.get("top_k", 10)),
            win_size=int(extra.get("win_size", 24)),
            tau_r=float(extra.get("tau_r", 0.2)),
        )

    def _process(self, task: dict) -> dict:
        kind = task["type"]
        extra = task.get("extra_params") or {}
        sampling = self._sampling(extra)
        head_num = int(extra.get("inference_head_num", 2))
        speed = float(extra.get("speed", 1.0))

        if kind == "tts":
            return self._process_tts_segmented(task, sampling, head_num, speed)
        elif kind == "tts_stream":
            return self._process_tts_stream(task, sampling, head_num)
        elif kind == "zero_shot":
            wav, sr = task["prompt_audio"], task["prompt_sample_rate"]
            mode = task.get("mode", "zero_shot")
            segments = self.frontend.text_normalize(task["tts_text"], split=True)
            if mode == "cross_lingual":
                feats_list = [
                    self.frontend.frontend_cross_lingual(seg, wav, sr) for seg in segments
                ]
            elif mode == "instruct2":
                feats_list = [
                    self.frontend.frontend_instruct2(seg, task["prompt_text"], wav, sr)
                    for seg in segments
                ]
            else:
                norm_prompt = self.frontend.text_normalize(task["prompt_text"], split=False)[0]
                feats_list = [
                    self.frontend.frontend_zero_shot(seg, norm_prompt, wav, sr)
                    for seg in segments
                ]
        elif kind == "vc":
            feats = self.frontend.frontend_vc(
                task["source_audio"], task["source_sample_rate"],
                task["prompt_audio"], task["prompt_sample_rate"],
            )
            audio = self.engine.voice_convert(
                feats["source_speech_tokens"], feats["prompt_speech_tokens"],
                feats["prompt_mel"], feats["spk_embedding"],
            )
            return {"output_audio": audio, "sample_rate": self.engine.cfg.sample_rate}
        else:
            raise ValueError(f"unknown task type {kind}")

        chunks = []
        for feats in feats_list:
            res = self._synthesize_one(feats, sampling, head_num, speed)
            chunks.append(res.audio)
        audio = np.concatenate(chunks) if chunks else np.zeros(0, np.float32)
        return {"output_audio": audio, "sample_rate": self.engine.cfg.sample_rate}

    def _process_tts_segmented(self, task: dict, sampling, head_num, speed) -> dict:
        """Long-text chunked synthesis (infer_speech_model.py:357-455):
        punctuation segmentation, random 50-150 ms inter-segment pauses, and
        the rolling last-segment-as-zero-shot-prompt continuity mode."""
        import random as _random

        segments = self.frontend.text_normalize(task["text"], split=True)
        last_prompt = bool(task.get("last_prompt", False))
        sr = self.engine.cfg.sample_rate

        if not last_prompt and len(segments) > 1:
            # flash batch: all same-speaker segments decode in one program
            feats0 = self.frontend.frontend_sft(segments[0], task["speaker_id"])
            token_lists = [self.frontend.extract_text_tokens(s) for s in segments]
            wavs, stats = self.engine.synthesize_batch(
                token_lists,
                sampling=sampling,
                inference_head_num=head_num,
                prompt_speech_tokens=feats0.get("prompt_speech_tokens"),
                prompt_mel=feats0.get("prompt_mel"),
                spk_embedding=feats0.get("spk_embedding"),
            )
            import random as _random

            pieces = []
            for i, w in enumerate(wavs):
                pieces.append(w)
                if i < len(wavs) - 1:
                    pieces.append(np.zeros(int(_random.uniform(0.05, 0.15) * sr), np.float32))
            return {
                "output_audio": np.concatenate(pieces) if pieces else np.zeros(0, np.float32),
                "sample_rate": sr,
            }

        chunks = []
        prev: dict = {}
        for i, segment in enumerate(segments):
            feats = self.frontend.frontend_sft(segment, task["speaker_id"])
            if last_prompt and prev:
                feats = {**feats, **prev}
            res = self._synthesize_one(feats, sampling, head_num, speed)
            chunks.append(res.audio)
            if i < len(segments) - 1:
                pause = _random.uniform(0.05, 0.15)  # 50-150 ms
                chunks.append(np.zeros(int(pause * sr), np.float32))
            if last_prompt:
                # roll the fresh segment in as the next zero-shot prompt
                mel = self.frontend.extract_mel(res.audio, sr)
                n = min(len(res.speech_tokens), mel.shape[0] // 2)
                prev = {
                    "prompt_speech_tokens": res.speech_tokens[:n],
                    "prompt_mel": mel[: 2 * n],
                }
        audio = np.concatenate(chunks) if chunks else np.zeros(0, np.float32)
        return {"output_audio": audio, "sample_rate": sr}

    def _process_tts_stream(self, task: dict, sampling, head_num) -> dict:
        """Streaming synthesis: ~1 s PCM chunks pushed into task['chunk_queue']
        as the multi-head decode produces tokens (StreamingSynthesizer rides
        the fused first-chunk program, TTFT ~130 ms). A capability extension
        over the reference server, whose HTTP layer is offline-only
        (SURVEY §3.4: the streaming machinery exists but only the CLI uses
        it); chunk semantics follow cli/model.py:279-360 (25-token hop,
        Hamming cross-fade, inter-segment pauses)."""
        import random as _random

        q = task["chunk_queue"]
        try:
            segments = self.frontend.text_normalize(task["text"], split=True)
            synth = self.engine.streaming()
            sr = self.engine.cfg.sample_rate
            for i, seg in enumerate(segments):
                feats = self.frontend.frontend_sft(seg, task["speaker_id"])
                gen = synth.synthesize_stream(
                    text_tokens=feats["text_tokens"],
                    tts_text_len=feats["tts_text_len"],
                    sampling=sampling,
                    inference_head_num=head_num,
                    prompt_speech_tokens=feats.get("prompt_speech_tokens"),
                    prompt_mel=feats.get("prompt_mel"),
                    spk_embedding=feats.get("spk_embedding"),
                )
                for wav in gen:
                    pcm = (np.clip(wav, -1.0, 1.0) * 32767.0).astype("<i2")
                    q.put(pcm.tobytes())
                if i < len(segments) - 1:
                    pause = int(_random.uniform(0.05, 0.15) * sr)
                    q.put(np.zeros(pause, "<i2").tobytes())
            q.put(None)
            return {"streamed": True}
        except Exception as e:
            q.put(e)
            q.put(None)
            raise

    def _synthesize_one(self, feats, sampling, head_num, speed):
        res = self.engine.synthesize(
            text_tokens=feats["text_tokens"],
            tts_text_len=feats["tts_text_len"],
            sampling=sampling,
            inference_head_num=head_num,
            prompt_speech_tokens=feats.get("prompt_speech_tokens"),
            prompt_mel=feats.get("prompt_mel"),
            spk_embedding=feats.get("spk_embedding"),
            speed=speed,
            llm_prompt_speech_tokens=feats.get("llm_prompt_speech_tokens"),
        )
        self.metrics.record(res)
        return res

    def submit(self, task: dict) -> str:
        tid = str(uuid.uuid4())
        task["task_id"] = tid
        task.setdefault("t_submit", time.time())
        continuous_ok = task.get("type") == "tts" or (
            # plain-mode zero_shot rides the slots too (per-slot prompts);
            # cross-lingual/instruct2 need the per-row LM-prefix override,
            # which the fixed-slot batcher doesn't carry -> window-coalesced
            # in the worker instead
            task.get("type") == "zero_shot"
            and task.get("mode", "zero_shot") == "zero_shot"
        )
        if (self.batcher is not None and continuous_ok
                and self._batchable(task) == self._continuous_key):
            # continuous fast path: frontend + slot admission run on a bounded
            # pool thread so concurrent requests join the shared decode
            # instead of serializing behind the worker queue
            self._cont_pool.submit(self._run_continuous, task)
        elif (self.batcher is not None
              and self._stream_batchable(task) == self._continuous_key):
            # streaming rides the slots too: the stream's decode joins the
            # in-flight batch, so TTFT under concurrent load is bounded by
            # the chunk cadence instead of the worker-queue depth
            self._cont_pool.submit(self._run_continuous_stream, task)
        elif task.get("type") == "tts_stream":
            self.stream_tasks.put(task)  # dedicated low-latency lane
        else:
            self.tasks.put(task)
        return tid

    def _prepare_sft_rows(self, task: dict):
        """Shared SFT featurization for the batched paths: returns
        (token_lists, emb, prompts) where prompts is None for plain SFT
        speakers or {"prompt_speech_tokens", "prompt_mel"} for speakers
        carrying a zero-shot prompt (both batched paths carry these per
        row/slot — see _prepare_batch_rows)."""
        segments = self.frontend.text_normalize(task["text"], split=True)
        feats0 = self.frontend.frontend_sft(segments[0], task["speaker_id"])
        pt = feats0.get("prompt_speech_tokens")
        pm = feats0.get("prompt_mel")
        prompts = None
        if (pt is not None and len(pt) > 0) or (pm is not None and len(pm) > 0):
            prompts = {"prompt_speech_tokens": pt, "prompt_mel": pm}
        emb = np.asarray(feats0["spk_embedding"], np.float32).reshape(-1)[:192]
        token_lists = []
        for j, seg in enumerate(segments):
            tt = (feats0["text_tokens"] if j == 0 and "text_tokens" in feats0
                  else self.frontend.extract_text_tokens(seg))
            token_lists.append(np.asarray(tt, np.int32).reshape(-1))
        return token_lists, emb, prompts

    def _prepare_batch_rows(self, task: dict) -> list:
        """Featurize one coalesced task into flash-batch rows
        (text_tokens, tts_text_len, llm_prompt_speech_tokens|None,
        prompt_speech_tokens|None, prompt_mel|None, embedding).
        tts tasks share the speaker's (possibly zero-shot) prompt across
        their segments; zero_shot tasks extract the prompt from the request
        audio exactly like the solo path (_process kind == 'zero_shot') —
        including the tts-portion length (min/max token ratios exclude the
        prompt text) and the LM-prefix override (empty for cross-lingual /
        instruct2 rows, which condition the flow but not the LM)."""
        if task["type"] == "zero_shot":
            wav, sr = task["prompt_audio"], task["prompt_sample_rate"]
            mode = task.get("mode", "zero_shot")
            segments = self.frontend.text_normalize(task["tts_text"], split=True)
            if mode == "cross_lingual":
                feats_list = [
                    self.frontend.frontend_cross_lingual(seg, wav, sr)
                    for seg in segments
                ]
            elif mode == "instruct2":
                feats_list = [
                    self.frontend.frontend_instruct2(
                        seg, task["prompt_text"], wav, sr)
                    for seg in segments
                ]
            else:
                norm_prompt = self.frontend.text_normalize(
                    task["prompt_text"], split=False)[0]
                feats_list = [
                    self.frontend.frontend_zero_shot(seg, norm_prompt, wav, sr)
                    for seg in segments
                ]
            return [
                (
                    np.asarray(f["text_tokens"], np.int32).reshape(-1),
                    int(f["tts_text_len"]),
                    f.get("llm_prompt_speech_tokens"),
                    f.get("prompt_speech_tokens"),
                    f.get("prompt_mel"),
                    np.asarray(f["spk_embedding"], np.float32).reshape(-1)[:192],
                )
                for f in feats_list
            ]
        token_lists, emb, prompts = self._prepare_sft_rows(task)
        sp_t = (prompts or {}).get("prompt_speech_tokens")
        pm_t = (prompts or {}).get("prompt_mel")
        return [(tt, len(tt), None, sp_t, pm_t, emb) for tt in token_lists]

    def _run_continuous(self, task: dict):
        """tts AND plain-mode zero_shot requests join the in-flight slots
        (per-slot prompt tokens/mel/embedding).  Rows that exceed the slots'
        bucket ladders or carry an LM-prefix override (cross-lingual /
        instruct2, which the fixed-slot program doesn't model) fall back to
        the worker queue before anything is admitted."""
        import random as _random

        tid = task["task_id"]
        try:
            rows = self._prepare_batch_rows(task)
            if any(
                len(tt) > self.batcher.prompt_buckets[-1]
                or (sp is not None and len(sp) > self.batcher.sp_buckets[-1])
                or llm_t is not None
                for tt, _tl, llm_t, sp, _pm, _e in rows
            ):
                self.tasks.put(task)  # outside the slots' bucket ladders
                return
            reqs = [
                self.batcher.submit(tt, emb, prompt_speech_tokens=sp,
                                    prompt_mel=pm, tts_text_len=tl)
                for tt, tl, _llm_t, sp, pm, emb in rows
            ]
            sr = self.engine.cfg.sample_rate
            pieces = []
            for j, req in enumerate(reqs):
                wav, _stats = self.batcher.result(req, timeout=self.timeout)
                pieces.append(wav)
                if j < len(reqs) - 1:
                    pieces.append(np.zeros(int(_random.uniform(0.05, 0.15) * sr), np.float32))
            result = {
                "output_audio": np.concatenate(pieces) if pieces else np.zeros(0, np.float32),
                "sample_rate": sr,
            }
            with self.results_lock:
                self.continuous_requests += 1
                self.results[tid] = result
            return
        except Exception as e:
            if "batcher shut down" in str(e):
                # expected drain path: shutdown() fails in-flight requests so
                # waiters unblock — not an error worth a traceback per task
                logger.info("continuous task %s cancelled by shutdown", tid)
            else:
                logger.exception("continuous task %s failed", tid)
            result = {"error": str(e)}
        with self.results_lock:
            self.results[tid] = result

    def _run_continuous_stream(self, task: dict):
        """Streaming over the shared decode slots (runtime/continuous.py
        stream=True): chunk synthesis keeps the solo streamer's semantics
        while the LLM decode is admitted into the in-flight batch.  Falls
        back to the worker path (solo streaming) when a segment is outside
        the slots' bucket ladders — nothing has been pushed to the chunk
        queue at that point, so the fallback is seamless."""
        import random as _random

        q = task["chunk_queue"]
        try:
            segments = self.frontend.text_normalize(task["text"], split=True)
            feats_list = [
                self.frontend.frontend_sft(seg, task["speaker_id"])
                for seg in segments
            ]
            for feats in feats_list:
                sp = feats.get("prompt_speech_tokens")
                if (len(feats["text_tokens"]) > self.batcher.prompt_buckets[-1]
                        or (sp is not None and len(sp) > self.batcher.sp_buckets[-1])):
                    self.stream_tasks.put(task)  # solo-streaming lane
                    return
            sr = self.engine.cfg.sample_rate
            for i, feats in enumerate(feats_list):
                req = self.batcher.submit(
                    feats["text_tokens"],
                    feats.get("spk_embedding"),
                    prompt_speech_tokens=feats.get("prompt_speech_tokens"),
                    prompt_mel=feats.get("prompt_mel"),
                    stream=True,
                    tts_text_len=feats["tts_text_len"],
                )
                for wav in self.batcher.stream_result(req, timeout=self.timeout):
                    pcm = (np.clip(wav, -1.0, 1.0) * 32767.0).astype("<i2")
                    q.put(pcm.tobytes())
                if i < len(feats_list) - 1:
                    pause = int(_random.uniform(0.05, 0.15) * sr)
                    q.put(np.zeros(pause, "<i2").tobytes())
            q.put(None)
            with self.results_lock:
                self.continuous_requests += 1
        except Exception as e:
            if "batcher shut down" in str(e):
                logger.info("continuous stream task %s cancelled by shutdown",
                            task.get("task_id"))
            else:
                logger.exception("continuous stream task %s failed",
                                 task.get("task_id"))
            q.put(e)
            q.put(None)

    def wait(self, tid: str) -> dict:
        """Poll the result dict (router.py:248-295: 50 ms poll, 60 s timeout)."""
        deadline = time.time() + self.timeout
        while time.time() < deadline:
            with self.results_lock:
                if tid in self.results:
                    return self.results.pop(tid)
            time.sleep(0.05)
        raise TimeoutError("tts timeout")

    def shutdown(self):
        self._stop.set()
        # cancel queued continuous tasks BEFORE killing the batcher so no
        # pool thread submits into a dead batcher and blocks on its result
        if self._cont_pool is not None:
            self._cont_pool.shutdown(wait=False, cancel_futures=True)
        if self.batcher is not None:
            self.batcher.shutdown()


def _response(success: bool, message: str, data=None, error=None) -> dict:
    return {"success": success, "message": message, "data": data, "error": error}


class _Handler(BaseHTTPRequestHandler):
    service: TTSService = None  # injected by make_server

    def log_message(self, fmt, *args):
        logger.debug(fmt, *args)

    def _send(self, code: int, payload: dict):
        body = json.dumps(payload).encode("utf-8")
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path == "/api/v1/speakers":
            speakers = self.service.frontend.available_speakers()
            self._send(200, _response(True, "ok", data={"speakers": speakers}))
        elif self.path.startswith("/api/v1/training/status/"):
            from .training_manager import training_manager

            tid = self.path.rsplit("/", 1)[1]
            status = training_manager.get_training_status(tid)
            if status.get("success"):
                self._send(200, _response(True, "ok", data=status))
            else:
                self._send(404, _response(False, "unknown training", error=status.get("error")))
        elif self.path == "/api/v1/metrics":
            data = self.service.metrics.summary()
            data["batched_requests"] = self.service.batched_requests
            data["continuous_requests"] = self.service.continuous_requests
            import numpy as _np

            batcher = getattr(self.service, "batcher", None)
            if batcher is not None and len(batcher.admission_lat_s):
                lat = _np.asarray(batcher.admission_lat_s)
                data["admission_ms_p50"] = round(float(_np.percentile(lat, 50)) * 1000, 1)
                data["admission_ms_p95"] = round(float(_np.percentile(lat, 95)) * 1000, 1)
            if len(self.service.queue_wait_s):
                # window-mode queueing visibility (submit -> worker dequeue)
                w = _np.asarray(self.service.queue_wait_s)
                data["queue_wait_ms_p50"] = round(float(_np.percentile(w, 50)) * 1000, 1)
                data["queue_wait_ms_p95"] = round(float(_np.percentile(w, 95)) * 1000, 1)
            self._send(200, _response(True, "ok", data=data))
        elif self.path == "/api/v1/devices":
            # device autodetect for the UI (reference data_tab.py:157-171
            # CUDA probe -> here the jax platform/device census)
            import jax

            try:
                devs = jax.devices()
                data = {
                    "platform": devs[0].platform if devs else "none",
                    "device_count": len(devs),
                    "devices": [str(d) for d in devs],
                    "default_backend": jax.default_backend(),
                }
            except Exception as e:
                data = {"platform": "unknown", "device_count": 0,
                        "devices": [], "error": str(e)}
            self._send(200, _response(True, "ok", data=data))
        elif self.path.startswith("/api/v1/training/plot/"):
            from .training_manager import training_manager
            from .training_plots import generate_training_plot

            tid = self.path.split("?")[0].rsplit("/", 1)[1]
            with training_manager.lock:
                entry = training_manager.trainings.get(tid)
            if entry is None:
                self._send(404, _response(False, "unknown training", error=tid))
                return
            try:
                png = generate_training_plot(entry["log_path"], entry["output_dir"])
                with open(png, "rb") as f:
                    body = f.read()
                self.send_response(200)
                self.send_header("Content-Type", "image/png")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            except Exception as e:
                self._send(500, _response(False, "plot failed", error=str(e)))
        elif self.path.startswith("/api/v1/models/list"):
            from . import models_admin

            self._send(200, _response(True, "ok", data={
                "root": models_admin.models_root(),
                "models": models_admin.list_models(),
            }))
        elif self.path == "/api/v1/training/list":
            from .training_manager import training_manager

            self._send(200, _response(
                True, "ok", data={"trainings": training_manager.list_trainings()}
            ))
        elif self.path == "/api/v1/samples":
            # reference-sample browser (inference_tab.py:23-71)
            from . import samples

            self._send(200, _response(True, "ok", data={
                "root": samples.samples_root(),
                "samples": samples.list_samples(),
            }))
        elif self.path in ("/health", "/"):
            if self.path == "/" and getattr(self.service, "serve_ui", False):
                self._send_ui()
            else:
                self._send(200, {"status": "ok"})
        else:
            self._send(404, _response(False, "not found", error="not found"))

    def _send_ui(self):
        from .webui import INDEX_HTML

        body = INDEX_HTML.encode("utf-8")
        self.send_response(200)
        self.send_header("Content-Type", "text/html; charset=utf-8")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_POST(self):
        try:
            length = int(self.headers.get("Content-Length", 0))
            body = json.loads(self.rfile.read(length) or b"{}")
        except Exception as e:
            self._send(400, _response(False, "bad request", error=str(e)))
            return

        try:
            if self.path == "/api/v1/tts":
                self._handle_tts(body)
            elif self.path == "/api/v1/tts/stream":
                self._handle_tts_stream(body)
            elif self.path == "/api/v1/zero-shot":
                self._handle_zero_shot(body)
            elif self.path == "/api/v1/vc":
                self._handle_vc(body)
            elif self.path == "/api/v1/load_pt":
                self._handle_load_pt(body)
            elif self.path == "/api/v1/samples/load":
                # one reference sample as base64 + transcript
                # (inference_tab.py:308-334 load_reference_sample)
                from . import samples

                try:
                    data = samples.load_sample(str(body.get("path", "")))
                except ValueError as e:
                    self._send(400, _response(False, "bad sample path", error=str(e)))
                    return
                self._send(200, _response(True, "ok", data=data))
            elif self.path == "/api/v1/speakers/add":
                if not body.get("speaker_id") or not (
                    body.get("audio_base64") or body.get("dataset_dir")
                ):
                    self._send(400, _response(
                        False, "missing fields",
                        error="speaker_id + (audio_base64 or dataset_dir) required"))
                    return
                if body.get("dataset_dir"):
                    # mean-embedding enrollment over an HF dataset
                    # (speaker_manage.py:191-259)
                    try:
                        n = self.service.frontend.add_speaker_from_dataset(
                            body["speaker_id"], body["dataset_dir"],
                            prompt_text=body.get("prompt_text"),
                        )
                    except (ValueError, FileNotFoundError) as e:
                        self._send(400, _response(False, "bad dataset", error=str(e)))
                        return
                    self._send(200, _response(True, "speaker added", data={
                        "speaker_id": body["speaker_id"], "rows_averaged": n}))
                    return
                wav, sr = load_audio_from_base64(body["audio_base64"])
                self.service.frontend.add_speaker_from_audio(
                    body["speaker_id"], wav, sr, prompt_text=body.get("prompt_text")
                )
                self._send(200, _response(True, "speaker added",
                                          data={"speaker_id": body["speaker_id"]}))
            elif self.path.startswith("/api/v1/speakers/remove/"):
                spk = self.path.rsplit("/", 1)[1]
                ok = self.service.frontend.remove_speaker(spk)
                code = 200 if ok else 404
                self._send(code, _response(ok, "removed" if ok else "unknown speaker",
                                           error=None if ok else f"unknown speaker {spk}"))
            elif self.path == "/api/v1/models/delete":
                from . import models_admin

                if not body.get("path"):
                    self._send(400, _response(False, "missing fields", error="path required"))
                    return
                try:
                    result = models_admin.delete_model(body["path"])
                except ValueError as e:
                    self._send(400, _response(False, "bad path", error=str(e)))
                    return
                code = 200 if result.get("success") else 404
                self._send(code, _response(
                    result.get("success", False), "deleted" if result.get("success") else "failed",
                    data=result if result.get("success") else None,
                    error=result.get("error"),
                ))
            elif self.path == "/api/v1/models/convert":
                from . import models_admin

                result = models_admin.convert_model(body)
                code = 200 if result.get("success") else 400
                self._send(code, _response(
                    result.get("success", False),
                    "convert started" if result.get("success") else "failed",
                    data=result if result.get("success") else None,
                    error=result.get("error"),
                ))
            elif self.path == "/api/v1/data/run":
                from .training_manager import training_manager

                result = training_manager.start_data_stage(body)
                code = 200 if result.get("success") else 400
                self._send(code, _response(
                    result.get("success", False),
                    "stage started" if result.get("success") else "failed",
                    data=result if result.get("success") else None,
                    error=result.get("error"),
                ))
            elif self.path == "/api/v1/training/start":
                from .training_manager import training_manager

                result = training_manager.start_training(body)
                code = 200 if result.get("success") else 400
                self._send(code, _response(
                    result.get("success", False),
                    "training started" if result.get("success") else "failed",
                    data=result if result.get("success") else None,
                    error=result.get("error"),
                ))
            elif self.path.startswith("/api/v1/training/stop/"):
                from .training_manager import training_manager

                tid = self.path.rsplit("/", 1)[1]
                result = training_manager.stop_training(tid)
                code = 200 if result.get("success") else 404
                self._send(code, _response(
                    result.get("success", False), "stopped", error=result.get("error")
                ))
            else:
                self._send(404, _response(False, "not found", error="not found"))
        except TimeoutError:
            self._send(408, _response(False, "timeout", error="tts timeout"))
        except Exception as e:
            logger.exception("request failed")
            self._send(500, _response(False, "error", error=str(e)))

    def _finish_audio(self, result: dict):
        if "error" in result:
            self._send(500, _response(False, "synthesis failed", error=result["error"]))
            return
        audio, sr = result["output_audio"], result["sample_rate"]
        self._send(200, _response(
            True, "ok",
            data={
                "audio_base64": audio_to_base64(audio, sr),
                "sample_rate": sr,
                "duration": float(len(audio)) / sr,
            },
        ))

    def _handle_tts(self, body: dict):
        extra = {**self.service.default_extra, **(body.get("extra_params") or {})}
        tid = self.service.submit({
            "type": "tts",
            "text": body.get("text", ""),
            "speaker_id": body.get("speaker_id"),
            "last_prompt": body.get("last_prompt", False),
            "extra_params": extra,
        })
        self._finish_audio(self.service.wait(tid))

    def _handle_tts_stream(self, body: dict):
        """Streamed WAV over a plain HTTP response body: an unknown-length
        RIFF header (0xFFFFFFFF sizes, the standard live-WAV convention)
        followed by 16-bit PCM chunks as synthesis proceeds; the connection
        closes at end-of-utterance."""
        import struct

        if not body.get("text") or not body.get("speaker_id"):
            self._send(400, _response(False, "missing fields",
                                      error="text + speaker_id required"))
            return
        # merge the SERVICE defaults (not the module table): with continuous
        # batching on, the default head count is the batcher's, so default
        # streams ride the shared decode slots (service._run_continuous_stream)
        extra = {**self.service.default_extra, **(body.get("extra_params") or {})}
        chunk_q: "queue.Queue" = queue.Queue()
        self.service.submit({
            "type": "tts_stream",
            "text": body["text"],
            "speaker_id": body["speaker_id"],
            "extra_params": extra,
            "chunk_queue": chunk_q,
        })
        try:
            first = chunk_q.get(timeout=self.service.timeout)
        except queue.Empty:
            self._send(408, _response(False, "timeout", error="tts timeout"))
            return
        if isinstance(first, Exception):
            self._send(500, _response(False, "synthesis failed", error=str(first)))
            return
        sr = self.service.engine.cfg.sample_rate
        self.send_response(200)
        self.send_header("Content-Type", "audio/wav")
        self.send_header("X-Sample-Rate", str(sr))
        self.send_header("Connection", "close")
        self.end_headers()
        header = (
            b"RIFF" + struct.pack("<I", 0xFFFFFFFF) + b"WAVEfmt "
            + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16)
            + b"data" + struct.pack("<I", 0xFFFFFFFF)
        )
        self.wfile.write(header)
        chunk = first
        while chunk is not None:
            if isinstance(chunk, Exception):
                break  # mid-stream failure: truncate the stream
            self.wfile.write(chunk)
            self.wfile.flush()
            chunk = chunk_q.get(timeout=self.service.timeout)

    def _handle_zero_shot(self, body: dict):
        if not body.get("prompt_audio_base64"):
            self._send(400, _response(False, "missing prompt audio",
                                      error="prompt_audio_base64 required"))
            return
        wav, sr = load_audio_from_base64(body["prompt_audio_base64"])
        extra = {**DEFAULT_ZS_EXTRA, **(body.get("extra_params") or {})}
        tid = self.service.submit({
            "type": "zero_shot",
            "tts_text": body.get("tts_text", ""),
            "prompt_text": body.get("prompt_text", ""),
            "prompt_audio": wav,
            "prompt_sample_rate": sr,
            "mode": body.get("mode", "zero_shot"),
            "extra_params": extra,
        })
        self._finish_audio(self.service.wait(tid))

    def _handle_vc(self, body: dict):
        if not body.get("source_audio_base64") or not body.get("prompt_audio_base64"):
            self._send(400, _response(False, "missing audio",
                                      error="source_audio_base64 + prompt_audio_base64 required"))
            return
        src, src_sr = load_audio_from_base64(body["source_audio_base64"])
        pw, pw_sr = load_audio_from_base64(body["prompt_audio_base64"])
        tid = self.service.submit({
            "type": "vc",
            "source_audio": src, "source_sample_rate": src_sr,
            "prompt_audio": pw, "prompt_sample_rate": pw_sr,
        })
        self._finish_audio(self.service.wait(tid))

    def _handle_load_pt(self, body: dict):
        """Hot-reload weights (router.py:307-340, infer_speech_model.py:169-184)."""
        from ..convert import torch_import

        engine = self.service.engine
        loaded = {}
        if body.get("llm_pt"):
            sd = torch_import.load_torch_pt(body["llm_pt"])
            # set_llm_params applies the engine's dtype + quantization policy
            engine.set_llm_params(torch_import.llm_from_state_dict(sd, engine.cfg.llm))
            loaded["llm"] = body["llm_pt"]
        if body.get("flow_pt"):
            sd = torch_import.load_torch_pt(body["flow_pt"])
            engine.flow_params = _cast_like(
                torch_import.flow_from_state_dict(sd, engine.cfg.flow), engine.flow_params
            )
            loaded["flow"] = body["flow_pt"]
        self._send(200, _response(True, "loaded", data=loaded))


def _cast_like(new_params, old_params):
    import jax
    import jax.numpy as jnp

    return jax.tree.map(
        lambda n, o: jnp.asarray(n, getattr(o, "dtype", jnp.float32)), new_params, old_params
    )


def make_server(
    host: str, port: int, engine: Engine, frontend, with_ui: bool = False,
    continuous_slots: int = 0, continuous_head_num: int = 2,
    request_timeout: float = 60.0, continuous_reserve_stream: int = 1,
) -> ThreadingHTTPServer:
    service = TTSService(engine, frontend, continuous_slots=continuous_slots,
                         continuous_head_num=continuous_head_num,
                         request_timeout=request_timeout,
                         continuous_reserve_stream=continuous_reserve_stream)
    service.serve_ui = with_ui
    handler = type("Handler", (_Handler,), {"service": service})
    return ThreadingHTTPServer((host, port), handler)


def serve(host: str, port: int, engine: Engine, frontend, with_ui: bool = False,
          continuous_slots: int = 0, continuous_head_num: int = 2,
          prewarm: bool = False, continuous_reserve_stream: int = 1):
    server = make_server(host, port, engine, frontend, with_ui=with_ui,
                         continuous_slots=continuous_slots,
                         continuous_head_num=continuous_head_num,
                         continuous_reserve_stream=continuous_reserve_stream)
    if prewarm:
        server.RequestHandlerClass.service.prewarm()
    logger.info("serving on %s:%d (ui=%s, continuous_slots=%d)",
                host, port, with_ui, continuous_slots)
    server.serve_forever()
