"""Continuous (in-flight) batching for the multi-head LLM decode.

The TPU-native equivalent of the reference's vLLM fast path
(llm_multi_head_v3.py:476-504 + vllm/cosyvoice2.py): a fixed set of decode
SLOTS share one persistent batched KV cache and one jitted chunked decode
program.  New requests are admitted into free slots *between chunks* — they
join a decode already in flight instead of waiting for the whole batch to
drain (the window-coalescing mode in runtime/server.py) or for a dedicated
replica (the reference's one-request-per-GPU-worker pool, server/worker.py).

Everything is shape-static for XLA:
  - the slot count, cache capacity, prompt buckets, and head count are fixed
    at construction -> exactly one chunk program + one admit program per
    prompt bucket, compiled once;
  - a chunk runs `chunk_steps` base-LLM group-steps as a bounded while_loop
    with per-slot active masking (finished/empty slots are no-ops);
  - admission prefils a single row on a batch-1 cache and
    dynamic-update-slices it into the slot's region of the big cache.

Distribution parity: each slot carries its own PRNG chain, split exactly as
the solo decode loop splits its key (models/llm.py generate_until), so a
request admitted with rng R produces bit-identical tokens to
`llm.generate(..., rng=R)` run solo (tests/test_continuous.py).

`spec_decode=True` switches the slots from blind multi-head commits to
draft-and-verify speculative decoding (heads 1..K-1 draft, head 0 verifies
— the exact heads=1 output distribution, models/llm.py
generate_spec_until): slots then commit 1..K tokens per block forward and
desynchronize in progress, which the per-slot bookkeeping already absorbs;
tokens are bit-identical to `llm.generate_speculative(..., rng=R)`.

Synthesis (flow+HiFT) of finished rows reuses the Engine's jitted synth
programs; decode and synthesis interleave on the device stream.
"""

from __future__ import annotations

import logging
import queue
import threading
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import llm as llm_model
from ..models import qwen2
from ..ops.sampling import SamplingParams, ras_sample_heads

logger = logging.getLogger("hydravox.continuous")


class _Request:
    __slots__ = ("text_tokens", "spk_embedding", "min_len", "max_len", "rng",
                 "sampling", "prompt_speech_tokens", "prompt_mel",
                 "done", "wav", "stats", "error", "t_submit",
                 # streaming-on-slots state (stream=True requests):
                 #   chunk_q carries np.float32 waveform chunks + a None
                 #   sentinel; sched_offset is the decode loop's emission
                 #   cursor; token_offset/hift_cache are the synth thread's
                 #   carried flow/HiFT streaming state (never touched by the
                 #   decode loop); hift_rng matches the solo streamer's split
                 "stream", "chunk_q", "hift_rng", "prompt_pad",
                 "sched_offset", "token_offset", "hift_cache", "t_first",
                 # TTFT breakdown timestamps (submit -> admit -> first chunk
                 # scheduled -> synth starts -> first wav out): logged at the
                 # first chunk so under-load latency is attributable
                 "t_admit", "t_sched", "t_synth_start",
                 # per-request chunk-order gate for the stream-synth thread
                 # POOL: synth_next is the token_offset the next synthesized
                 # chunk must carry (the hift_cache/fade chain is sequential)
                 "synth_cv", "synth_next",
                 # spec-decode slots: (accepted, drafted) at finish
                 "spec_pair")

    def __init__(self, text_tokens, spk_embedding, min_len, max_len, rng, sampling,
                 prompt_speech_tokens=None, prompt_mel=None, stream=False,
                 hift_rng=None, prompt_pad=0):
        self.text_tokens = text_tokens
        self.spk_embedding = spk_embedding
        self.min_len = min_len
        self.max_len = max_len
        self.rng = rng
        self.sampling = sampling
        self.prompt_speech_tokens = prompt_speech_tokens
        self.prompt_mel = prompt_mel
        self.done = threading.Event()
        self.wav = None
        self.stats = None
        self.error = None
        self.t_submit = time.time()
        self.stream = stream
        self.chunk_q = queue.Queue() if stream else None
        self.hift_rng = hift_rng
        self.prompt_pad = prompt_pad
        self.sched_offset = 0
        self.token_offset = 0
        self.hift_cache = None
        self.t_first = None
        self.t_admit = None
        self.t_sched = None
        self.t_synth_start = None
        self.synth_cv = threading.Condition() if stream else None
        self.synth_next = 0
        self.spec_pair = None


class ContinuousBatcher:
    """Fixed-slot continuous decode on top of an Engine's params/programs."""

    def __init__(
        self,
        engine,
        slots: int = 4,
        chunk_steps: int = 8,
        head_num: int = 4,
        prompt_buckets=None,
        sampling: Optional[SamplingParams] = None,
        spec_decode: bool = False,
        reserve_stream_slots: int = 0,
    ):
        """One batcher serves ONE (head_num, sampling) configuration — the
        chunk program shares the base step across slots, so requests with a
        different head count or sampling params must go through the regular
        Engine paths instead.

        `reserve_stream_slots=N` keeps the first N slots exclusive to
        stream=True requests: whole-utterance traffic can saturate at most
        slots-N, so an arriving stream starts decoding at the NEXT chunk
        boundary instead of waiting for a full utterance to drain — the
        worker-isolation property the reference buys with one request per
        GPU worker (server/worker.py:25-31), priced at N slots of batch
        throughput while no streams are active.

        `spec_decode=True` makes the slots draft with MTP heads 1..K-1 and
        verify against head 0 (the exact heads=1 output distribution —
        models/llm.py generate_spec_until) instead of blindly committing
        every head's sample.  Slots desynchronize in tokens-per-step (1..K
        commits per block forward) but the chunk scheduling already handles
        per-slot progress; per-slot rng chains replicate the solo spec
        loop's splits, so tokens stay bit-identical to
        `llm.generate_speculative(..., rng=R)`."""
        self.engine = engine
        self.cfg = engine.cfg.llm
        self.sampling = sampling or SamplingParams.make()
        self.slots = slots
        self.chunk_steps = chunk_steps
        self.spec = bool(spec_decode)
        self.head_k = max(1, min(int(head_num), self.cfg.head_num))
        if self.spec and self.head_k < 2:
            raise ValueError(
                "spec_decode slots need head_num >= 2 (heads 1..K-1 draft, "
                "head 0 verifies)")
        self.reserve_stream_slots = max(0, min(int(reserve_stream_slots),
                                               slots - 1))
        # fairness bound on the stream lane's priority: after K consecutive
        # stream admissions while whole-utterance work is waiting, one
        # backlog request is admitted (into a non-reserved slot) before the
        # next stream.  Without this, sustained streaming load could hold
        # ALL slots and starve the backlog until its 600 s result() timeout.
        self.stream_fairness_k = 4
        self._stream_admits_streak = 0
        self.max_tokens = engine.max_tokens
        # default text ladder covers up to 128 tokens (ordinary sentences and
        # the reference's ~80-token paragraph segments); longer segments fall
        # back to the Engine's full bucket ladder at the server layer
        self.prompt_buckets = tuple(prompt_buckets or engine.prompt_buckets[:3])
        # zero-shot prompt speech runs at 25 Hz, so realistic cloned-speaker
        # prompts are 75-250 tokens (3-10 s; frontend caps at 30 s): the sp
        # ladder extends past the text ladder up to 256 so those prompts
        # actually ride the slots
        sp_max = max(self.prompt_buckets[-1],
                     max((b for b in engine.prompt_buckets if b <= 256),
                         default=self.prompt_buckets[-1]))
        self.sp_buckets = (0,) + tuple(sorted({
            b for b in (self.prompt_buckets + tuple(engine.prompt_buckets))
            if b <= sp_max
        }))
        cap = (2 + self.prompt_buckets[-1] + self.sp_buckets[-1]
               + self.max_tokens + self.head_k)
        self.cache_cap = -(-cap // 256) * 256

        self._admit_cache = {}
        self._chunk_jit = None
        self._streamer = None
        self._state = None
        self._slot_req: list = [None] * slots
        self._slot_steps = [0] * slots
        # two admission lanes: stream=True requests are LATENCY-sensitive
        # (TTFT is the product metric) and get strict priority over
        # whole-utterance requests — the isolation property the reference
        # buys with one-request-per-GPU-worker (server/worker.py:25-31)
        self._backlog: list = []
        self._backlog_stream: list = []
        # submit->slot-assignment latencies (bounded window) for /metrics
        from collections import deque

        self.admission_lat_s: "deque" = deque(maxlen=512)
        self._pending: "queue.Queue[_Request]" = queue.Queue()
        # finished rows synthesize on their own thread so the decode loop can
        # admit + dispatch the next chunk while wavs transfer to the host;
        # stream CHUNKS get a second, dedicated thread so a whole-utterance
        # synth (or its first-time XLA compile) can't sit between a live
        # stream and its next ~1 s chunk.  The stream queue is PRIORITY-
        # ordered: first chunks (TTFT-critical) jump ahead of later chunks of
        # other streams — decode runs ~5x realtime, so a stream dumps its
        # whole chunk ladder into the queue within ~0.5 s while chunk N+1
        # isn't DUE until ~N s of playback later; FIFO order let that backlog
        # sit between an arriving stream and its first chunk (measured: the
        # synthq wait was the dominant share of under-load TTFT, p50 ~140 ms
        # of 338, p95 440 ms)
        import itertools

        self._synth_q: "queue.Queue" = queue.Queue()
        self._stream_q: "queue.PriorityQueue" = queue.PriorityQueue()
        self._stream_seq = itertools.count()
        # first chunks queued but not yet dispatched: the whole-utterance
        # synth thread holds its (big, ~100 ms device) dispatch while one is
        # imminent, so the device stream is clear for the TTFT-critical chunk
        self._prio0_pending = 0
        self._prio0_lock = threading.Lock()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._synth_thread = threading.Thread(
            target=self._synth_loop, args=(self._synth_q,), daemon=True)
        # ONE stream-synth thread: measured on the tunneled chip, a 2-thread
        # pool drove queue wait to ~0 but stretched the decode chunk cadence
        # (2 in-flight chunk synths interleave between decode chunks: TTFT
        # decode share 81 -> 145 ms p50, admit 10 -> 53) for a NET loss —
        # the single thread is a deliberate throttle that keeps the decode
        # loop's share of the device stream high.  The queue stays priority-
        # ordered (first chunks jump the ladder backlog) and
        # _synth_stream_chunk keeps the per-request order gate, so the pool
        # size is a tunable, not a correctness constraint.
        self._stream_threads = [
            threading.Thread(target=self._synth_loop, args=(self._stream_q,),
                             daemon=True)
            for _ in range(1)
        ]
        self._started = False
        self._lock = threading.Lock()

    # -- device programs -----------------------------------------------------

    def _init_state(self):
        bb = self.cfg.backbone
        dtype = self.engine.llm_params["speech_embedding"].dtype
        s, k = self.slots, self.head_k
        key0 = jax.random.PRNGKey(0)
        state = dict(
            cache=qwen2.init_kv_cache(bb, s, self.cache_cap, dtype=dtype),
            last_hidden=jnp.zeros((s, bb.hidden_size), dtype),
            tokens=jnp.full((s, self.max_tokens + k), -1, jnp.int32),
            num=jnp.zeros((s,), jnp.int32),
            steps=jnp.zeros((s,), jnp.int32),
            min_len=jnp.zeros((s,), jnp.int32),
            max_len=jnp.zeros((s,), jnp.int32),
            rngs=jnp.tile(key0[None], (s, 1)),
            finished=jnp.ones((s,), bool),
        )
        if self.spec:
            # pend = newest emitted token not yet in the KV cache (the solo
            # spec loop's invariant); accepted/drafted feed the per-request
            # acceptance-rate stat
            state.update(
                pend=jnp.zeros((s,), jnp.int32),
                accepted=jnp.zeros((s,), jnp.int32),
                drafted=jnp.zeros((s,), jnp.int32),
            )
        return state

    def _admit_fn(self, bucket: int, sp_bucket: int = 0):
        """Jitted: prefill one request into slot `i` of the shared state.
        `sp_bucket` > 0 carries zero-shot prompt speech tokens in the LM
        prompt (llm_multi_head_v3.py:948-952)."""
        key = (bucket, sp_bucket)
        if key in self._admit_cache:
            return self._admit_cache[key]
        cfg, bb = self.cfg, self.cfg.backbone

        def fn(params, state, slot, text_tokens, text_len, sp_tokens, sp_len,
               min_len, max_len, rng):
            emb, plen = llm_model.build_inference_prompt(
                params, cfg, text_tokens, text_len, sp_tokens, sp_len,
            )
            emb = emb.astype(state["last_hidden"].dtype)
            small = qwen2.init_kv_cache(bb, 1, self.cache_cap, dtype=emb.dtype)
            hidden, small = qwen2.forward_block_with_cache(
                params["backbone"], bb, emb[None], small, advance=plen[None]
            )

            def put(big, one):
                # big: (L, S, cap, Hkv, D); one: (L, 1, cap, Hkv, D)
                start = (0, slot) + (0,) * (big.ndim - 2)
                return jax.lax.dynamic_update_slice(big, one, start)

            cache = state["cache"]._replace(
                k=put(state["cache"].k, small.k),
                v=put(state["cache"].v, small.v),
                length=state["cache"].length.at[slot].set(plen),
            )
            k = self.head_k
            h0 = hidden[0, plen - 1]
            buf = jnp.full((self.max_tokens + k,), -1, jnp.int32)
            if not self.spec:
                return dict(
                    cache=cache,
                    last_hidden=state["last_hidden"].at[slot].set(h0),
                    tokens=state["tokens"].at[slot].set(buf),
                    num=state["num"].at[slot].set(0),
                    steps=state["steps"].at[slot].set(0),
                    min_len=state["min_len"].at[slot].set(min_len),
                    max_len=state["max_len"].at[slot].set(max_len),
                    rngs=state["rngs"].at[slot].set(rng),
                    finished=state["finished"].at[slot].set(False),
                )
            # spec admit = init_spec_state for this row: first token from
            # head 0 on the prompt hidden (exact heads=1), same rng split
            from ..ops.sampling import ras_dist, sample_dist

            sts = cfg.speech_token_size
            p_tgt = dict(
                params, mtp_block=jax.tree.map(lambda a: a[:1], params["mtp_block"])
            )
            rng2, r0 = jax.random.split(rng)
            q0 = ras_dist(
                llm_model.mtp_logits(p_tgt, cfg, h0, 1)[0], buf, jnp.int32(0),
                self.sampling, jnp.int32(0) < min_len, sts,
            )
            t0 = sample_dist(r0, q0)
            stop0 = (t0 >= sts) | (max_len < 1)
            return dict(
                cache=cache,
                last_hidden=state["last_hidden"].at[slot].set(h0),
                tokens=state["tokens"].at[slot].set(
                    jnp.where(stop0, buf, buf.at[0].set(t0))),
                num=state["num"].at[slot].set(jnp.where(stop0, 0, 1)),
                steps=state["steps"].at[slot].set(0),
                min_len=state["min_len"].at[slot].set(min_len),
                max_len=state["max_len"].at[slot].set(max_len),
                rngs=state["rngs"].at[slot].set(rng2),
                finished=state["finished"].at[slot].set(stop0),
                pend=state["pend"].at[slot].set(t0),
                accepted=state["accepted"].at[slot].set(0),
                drafted=state["drafted"].at[slot].set(0),
            )

        self._admit_cache[key] = jax.jit(fn, donate_argnums=(1,))
        return self._admit_cache[key]

    def _step_body(self, params, sampling: SamplingParams):
        """One group-decode step over an arbitrary leading slot dim S — the
        shared traceable body of the chunk program (S = self.slots) and the
        stream admit burst (S = 1).  Both paths MUST run these exact ops so a
        request's token stream is bit-identical wherever its steps execute."""
        cfg, bb = self.cfg, self.cfg.backbone
        k = self.head_k
        emb_dtype = params["speech_embedding"].dtype

        def body(carry):
            it, s = carry
            split = jax.vmap(jax.random.split)(s["rngs"])  # (S, 2, key)
            new_rngs = jnp.where(s["finished"][:, None], s["rngs"], split[:, 0])
            step_rngs = split[:, 1]
            logits = llm_model.mtp_logits(params, cfg, s["last_hidden"], k)
            sampled = jax.vmap(
                lambda r, lg, hist, n, mn: ras_sample_heads(
                    r, lg, hist, n, sampling, mn, cfg.speech_token_size
                ),
                in_axes=(0, 1, 0, 0, 0),
            )(step_rngs, logits, s["tokens"], s["num"], s["min_len"])  # (S, K)

            is_stop = sampled >= cfg.speech_token_size
            before_stop = jnp.cumsum(is_stop, axis=1) == 0
            n_ok = jnp.sum(before_stop, axis=1).astype(jnp.int32)
            budget = jnp.maximum(s["max_len"] - s["num"], 0)
            n_accept = jnp.where(s["finished"], 0, jnp.minimum(n_ok, budget))

            write_pos = s["num"][:, None] + jnp.arange(k)[None, :]
            accept = jnp.arange(k)[None, :] < n_accept[:, None]
            cur = jnp.take_along_axis(s["tokens"], write_pos, axis=1)
            tokens = jax.vmap(lambda row, idx, val: row.at[idx].set(val))(
                s["tokens"], write_pos, jnp.where(accept, sampled, cur)
            )
            num = s["num"] + n_accept
            finished = (
                s["finished"] | jnp.any(is_stop, axis=1)
                | (num >= s["max_len"]) | (n_accept == 0)
            )

            emb = jnp.take(params["speech_embedding"], sampled, axis=0).astype(emb_dtype)
            hidden, cache = qwen2.forward_block_with_cache(
                params["backbone"], bb, emb, s["cache"],
                advance=jnp.where(finished, 0, k).astype(jnp.int32),
            )
            last_hidden = jnp.where(
                finished[:, None], s["last_hidden"], hidden[:, k - 1]
            )
            steps = s["steps"] + jnp.where(s["finished"], 0, 1)
            return it + 1, dict(
                cache=cache, last_hidden=last_hidden, tokens=tokens, num=num,
                steps=steps, min_len=s["min_len"], max_len=s["max_len"],
                rngs=new_rngs, finished=finished,
            )

        return body

    def _chunk_fn(self):
        """Jitted: run up to chunk_steps group-decode steps over all slots."""
        if self._chunk_jit is not None:
            return self._chunk_jit
        if self.spec:
            self._chunk_jit = jax.jit(self._spec_chunk_body(), donate_argnums=(1,))
            return self._chunk_jit
        k = self.head_k

        def fn(params, state, sampling: SamplingParams):
            params = dict(
                params, mtp_block=jax.tree.map(lambda a: a[:k], params["mtp_block"])
            )

            def cond(carry):
                it, s = carry
                return (it < self.chunk_steps) & ~jnp.all(s["finished"])

            body = self._step_body(params, sampling)
            _, final = jax.lax.while_loop(cond, body, (jnp.int32(0), state))
            meta = jnp.concatenate(
                [
                    final["tokens"],
                    final["num"][:, None],
                    final["steps"][:, None],
                    final["finished"].astype(jnp.int32)[:, None],
                ],
                axis=1,
            )
            return final, meta

        self._chunk_jit = jax.jit(fn, donate_argnums=(1,))
        return self._chunk_jit

    def _admit_stream_fn(self, bucket: int, sp_bucket: int = 0):
        """Jitted stream admission with a DECODE BURST: prefill + the first
        `n_burst` group steps of this request run inside the admit dispatch
        (on a 1-row state, the other slots untouched), sized so the first
        streamable hop (+ lookahead, + zero-shot prompt alignment pad) exists
        the moment admission returns.  TTFT then pays prefill + ~n_burst
        steps instead of prefill + a wait for the NEXT shared chunk boundary
        + a full chunk (measured: -70..90 ms p50 under load).  The burst
        runs self._step_body — the same traced ops, same per-request rng
        chain — so tokens stay bit-identical to the chunk-program path.
        Non-spec only (spec admission seeds head-0 state instead).
        Returns (state, row_meta) with row_meta = [tokens…, num, steps,
        finished] matching one row of the chunk program's meta."""
        key = (bucket, sp_bucket, "burst")
        if key in self._admit_cache:
            return self._admit_cache[key]
        cfg, bb = self.cfg, self.cfg.backbone
        k = self.head_k
        hop = self._get_streamer().token_hop_len
        la = self.engine.cfg.flow.pre_lookahead_len
        # first hop needs hop + la tokens, plus up to hop-1 alignment pad
        # when a zero-shot speech prompt is spliced in (submit: prompt_pad)
        need = hop + la + (hop - 1 if sp_bucket > 0 else 0)
        n_burst = -(-need // k)

        def fn(params, state, slot, text_tokens, text_len, sp_tokens, sp_len,
               min_len, max_len, rng):
            emb, plen = llm_model.build_inference_prompt(
                params, cfg, text_tokens, text_len, sp_tokens, sp_len,
            )
            emb = emb.astype(state["last_hidden"].dtype)
            small = qwen2.init_kv_cache(bb, 1, self.cache_cap, dtype=emb.dtype)
            hidden, small = qwen2.forward_block_with_cache(
                params["backbone"], bb, emb[None], small, advance=plen[None]
            )
            st1 = dict(
                cache=small,
                last_hidden=hidden[:, plen - 1],
                tokens=jnp.full((1, self.max_tokens + k), -1, jnp.int32),
                num=jnp.zeros((1,), jnp.int32),
                steps=jnp.zeros((1,), jnp.int32),
                min_len=min_len[None].astype(jnp.int32),
                max_len=max_len[None].astype(jnp.int32),
                rngs=rng[None],
                finished=jnp.zeros((1,), bool),
            )
            p_k = dict(
                params, mtp_block=jax.tree.map(lambda a: a[:k], params["mtp_block"])
            )
            body = self._step_body(p_k, self.sampling)

            def cond(carry):
                it, s = carry
                return (it < n_burst) & ~jnp.all(s["finished"])

            _, st1 = jax.lax.while_loop(cond, body, (jnp.int32(0), st1))

            def put(big, one):
                start = (0, slot) + (0,) * (big.ndim - 2)
                return jax.lax.dynamic_update_slice(big, one, start)

            cache = state["cache"]._replace(
                k=put(state["cache"].k, st1["cache"].k),
                v=put(state["cache"].v, st1["cache"].v),
                length=state["cache"].length.at[slot].set(st1["cache"].length[0]),
            )
            row_meta = jnp.concatenate([
                st1["tokens"][0],
                st1["num"][:1],
                st1["steps"][:1],
                st1["finished"][:1].astype(jnp.int32),
            ])
            return dict(
                cache=cache,
                last_hidden=state["last_hidden"].at[slot].set(st1["last_hidden"][0]),
                tokens=state["tokens"].at[slot].set(st1["tokens"][0]),
                num=state["num"].at[slot].set(st1["num"][0]),
                steps=state["steps"].at[slot].set(st1["steps"][0]),
                min_len=state["min_len"].at[slot].set(min_len),
                max_len=state["max_len"].at[slot].set(max_len),
                rngs=state["rngs"].at[slot].set(st1["rngs"][0]),
                finished=state["finished"].at[slot].set(st1["finished"][0]),
            ), row_meta

        self._admit_cache[key] = jax.jit(fn, donate_argnums=(1,))
        return self._admit_cache[key]

    def _admit_stream_fused_fn(self, bucket: int):
        """Jitted stream admission with the FIRST WAVEFORM CHUNK fused in:
        prefill + decode burst + flow (streaming mask) + HiFT of the first
        hop run as ONE device program, and the host reads wav + row meta in
        ONE packed fetch — TTFT pays ~2 host round trips (dispatch + fetch)
        instead of ~5 (admit, meta fetch, synth dispatch, wav fetch; each
        costs ~30 ms over the tunnel, VERDICT r4 item 3).

        SFT-speaker streams only (no prompt speech tokens / prompt mel): the
        chunk shapes are then fully static — token bucket for hop+lookahead,
        50-frame chunk — so one program per text bucket covers all traffic.
        Zero-shot streams keep the unfused burst (_admit_stream_fn): their
        first-chunk length depends on the runtime prompt length.

        The synth ops/shapes equal streaming._chunk_fn's key
        (tbucket, 0, chunk_bucket, has_cache=False, finalize=False) and the
        hift_rng is the same per-session constant, so the audio matches the
        unfused path within int16 quantization; tokens are bit-identical
        (the burst is _step_body).  Returns (state, packed_i16, cache_mel,
        cache_source): packed = [wav_i16 (chunk_bucket*upsample), tokens…,
        num, steps, finished] — speech-token ids (< 6761) fit int16 exactly;
        the mel/source caches stay device-resident for the next chunk."""
        key = (bucket, 0, "burst_fused")
        if key in self._admit_cache:
            return self._admit_cache[key]
        from ..models import flow as flow_model
        from ..models import hift as hift_model
        from .streaming import _bucket_chunk

        cfg, bb = self.cfg, self.cfg.backbone
        fcfg, hcfg = self.engine.cfg.flow, self.engine.cfg.hift
        k = self.head_k
        streamer = self._get_streamer()
        hop = streamer.token_hop_len
        la = fcfg.pre_lookahead_len
        mc, sc = streamer.mel_cache_len, streamer.source_cache_len
        ratio, up = fcfg.token_mel_ratio, hcfg.upsample_scale
        n_all = hop + la  # first chunk token prefix (no prompt speech)
        n_burst = -(-n_all // k)
        tbucket = self.engine._bucket_token(n_all)
        n_frames = hop * ratio  # emitted frames (lookahead = conv context)
        chunk_bucket = _bucket_chunk(n_frames)

        def fn(llm_params, flow_params, hift_params, state, slot,
               text_tokens, text_len, min_len, max_len, rng, hift_rng,
               embedding):
            emb, plen = llm_model.build_inference_prompt(
                llm_params, cfg, text_tokens, text_len,
                jnp.zeros((0,), jnp.int32), jnp.int32(0),
            )
            emb = emb.astype(state["last_hidden"].dtype)
            small = qwen2.init_kv_cache(bb, 1, self.cache_cap, dtype=emb.dtype)
            hidden, small = qwen2.forward_block_with_cache(
                llm_params["backbone"], bb, emb[None], small, advance=plen[None]
            )
            st1 = dict(
                cache=small,
                last_hidden=hidden[:, plen - 1],
                tokens=jnp.full((1, self.max_tokens + k), -1, jnp.int32),
                num=jnp.zeros((1,), jnp.int32),
                steps=jnp.zeros((1,), jnp.int32),
                min_len=min_len[None].astype(jnp.int32),
                max_len=max_len[None].astype(jnp.int32),
                rngs=rng[None],
                finished=jnp.zeros((1,), bool),
            )
            p_k = dict(
                llm_params,
                mtp_block=jax.tree.map(lambda a: a[:k], llm_params["mtp_block"]),
            )
            body = self._step_body(p_k, self.sampling)

            def cond(carry):
                it, s = carry
                return (it < n_burst) & ~jnp.all(s["finished"])

            _, st1 = jax.lax.while_loop(cond, body, (jnp.int32(0), st1))

            # ---- first chunk: flow (streaming mask) + HiFT, the exact ops
            # of streaming._chunk_fn at (tbucket, 0, chunk_bucket, False,
            # False).  Wasted (discarded host-side) only when the burst
            # finished short of hop+lookahead tokens.
            toks = st1["tokens"][0]
            pos = jnp.arange(tbucket)
            seq = jnp.where(
                pos < n_all,
                jnp.clip(toks[jnp.minimum(pos, toks.shape[0] - 1)], 0), 0,
            )[None]
            valid = (pos < n_all)[None]
            emit = (pos < n_all - la)[None]
            pm = jnp.zeros((1, 0, fcfg.output_size), jnp.float32)
            mel_full = flow_model.inference(
                flow_params, fcfg, seq, valid, pm, jnp.int32(0), embedding,
                finalize=False, streaming=True, emit_valid=emit,
            )  # (1, 80, tbucket*ratio)
            mel_pad = jnp.pad(mel_full, ((0, 0), (0, 0), (0, chunk_bucket)))
            mel_chunk = jax.lax.dynamic_slice(
                mel_pad, (0, 0, 0), (1, 80, chunk_bucket))
            frame = jnp.arange(chunk_bucket)
            src_idx = jnp.minimum(frame, n_frames - 1)
            mel_chunk = mel_chunk[:, :, src_idx]
            f0 = hift_model.predict_f0(hift_params, mel_chunk)
            f0_up = jnp.repeat(f0, up, axis=-1)[..., None]
            s_src, _ = hift_model.sine_source(hift_rng, hcfg, f0_up)
            source = jnp.swapaxes(
                jnp.tanh(hift_model.linear(hift_params["m_source_linear"], s_src)),
                1, 2,
            )
            wav = hift_model.decode(hift_params, hcfg, mel_chunk, source)
            wav_i16 = (jnp.clip(wav[0], -1.0, 1.0) * 32767.0).astype(jnp.int16)
            cache_mel = mel_chunk[:, :, n_frames - mc:n_frames]
            cache_source = source[:, :, n_frames * up - sc:n_frames * up]

            def put(big, one):
                start = (0, slot) + (0,) * (big.ndim - 2)
                return jax.lax.dynamic_update_slice(big, one, start)

            cache = state["cache"]._replace(
                k=put(state["cache"].k, st1["cache"].k),
                v=put(state["cache"].v, st1["cache"].v),
                length=state["cache"].length.at[slot].set(st1["cache"].length[0]),
            )
            packed = jnp.concatenate([
                wav_i16,
                st1["tokens"][0].astype(jnp.int16),
                st1["num"][:1].astype(jnp.int16),
                st1["steps"][:1].astype(jnp.int16),
                st1["finished"][:1].astype(jnp.int16),
            ])
            return dict(
                cache=cache,
                last_hidden=state["last_hidden"].at[slot].set(st1["last_hidden"][0]),
                tokens=state["tokens"].at[slot].set(st1["tokens"][0]),
                num=state["num"].at[slot].set(st1["num"][0]),
                steps=state["steps"].at[slot].set(st1["steps"][0]),
                min_len=state["min_len"].at[slot].set(min_len),
                max_len=state["max_len"].at[slot].set(max_len),
                rngs=state["rngs"].at[slot].set(st1["rngs"][0]),
                finished=state["finished"].at[slot].set(st1["finished"][0]),
            ), packed, cache_mel, cache_source

        self._admit_cache[key] = jax.jit(fn, donate_argnums=(3,))
        return self._admit_cache[key]

    def _spec_chunk_body(self):
        """Chunk program for spec_decode slots: per-slot draft/verify steps
        (the solo loop's _spec_draft_row/_spec_verify_row vmapped over slots,
        like llm.generate_batched_speculative but with per-slot rng chains
        and resumable slot state).  Each block forward commits 1..K tokens
        per active slot; meta gains accepted/drafted columns before
        [num, steps, finished]."""
        cfg, bb = self.cfg, self.cfg.backbone
        k = self.head_k
        kd = k - 1
        s_n = self.slots
        sts = cfg.speech_token_size

        def fn(params, state, sampling: SamplingParams):
            p_tgt = dict(
                params, mtp_block=jax.tree.map(lambda a: a[:1], params["mtp_block"])
            )
            p_draft = dict(
                params, mtp_block=jax.tree.map(lambda a: a[1:k], params["mtp_block"])
            )
            emb_dtype = params["speech_embedding"].dtype

            def cond(carry):
                it, s = carry
                return (it < self.chunk_steps) & ~jnp.all(s["finished"])

            def body(carry):
                it, s = carry
                active = ~s["finished"]
                num, buf = s["num"], s["tokens"]
                # same 5-way split order as generate_spec_until, per slot
                splits = jax.vmap(lambda r: jax.random.split(r, 5))(s["rngs"])
                new_rngs = jnp.where(active[:, None], splits[:, 0], s["rngs"])
                r_draft, r_acc = splits[:, 1], splits[:, 2]
                r_res, r_bonus = splits[:, 3], splits[:, 4]

                draft_logits = llm_model.mtp_logits(
                    p_draft, cfg, s["last_hidden"], kd)  # (kd, S, V)
                drafts, p_dists, buf_d = jax.vmap(
                    lambda r, lg, hist, n, mn: llm_model._spec_draft_row(
                        r, lg, hist, n, sampling, mn, sts)
                )(r_draft, jnp.swapaxes(draft_logits, 0, 1), buf, num,
                  s["min_len"])  # (S, kd), (S, kd, V), (S, L)

                block = jnp.concatenate([s["pend"][:, None], drafts], axis=1)
                emb = jnp.take(
                    params["speech_embedding"], block, axis=0).astype(emb_dtype)
                hidden_blk, cache_w = qwen2.forward_block_with_cache(
                    params["backbone"], bb, emb, s["cache"],
                    advance=jnp.zeros((s_n,), jnp.int32),
                )  # (S, K, H)

                tgt_logits = llm_model.mtp_logits(p_tgt, cfg, hidden_blk, 1)[0]
                e, n_emit, n_commit, n_acc, fin_row = jax.vmap(
                    lambda ra, rr, rb, tl, d, pd, bd, n, mn, mx:
                        llm_model._spec_verify_row(
                            ra, rr, rb, tl, d, pd, bd, n, mn, mx, sampling, sts)
                )(r_acc, r_res, r_bonus, tgt_logits, drafts, p_dists, buf_d,
                  num, s["min_len"], s["max_len"])

                n_emit = jnp.where(active, n_emit, 0)
                n_commit = jnp.where(active, n_commit, 0)
                finished = s["finished"] | (active & fin_row)

                arange_k = jnp.arange(k)
                wpos = num[:, None] + arange_k[None, :]
                wmask = arange_k[None, :] < n_commit[:, None]
                cur = jnp.take_along_axis(buf, wpos, axis=1)
                tokens = jax.vmap(lambda row, idx, val: row.at[idx].set(val))(
                    buf, wpos, jnp.where(wmask, e, cur))
                cache = qwen2.KVCache(
                    k=cache_w.k, v=cache_w.v,
                    length=s["cache"].length + n_emit,
                )
                idx_last = jnp.maximum(n_emit - 1, 0)
                h_next = jnp.take_along_axis(
                    hidden_blk, idx_last[:, None, None], axis=1)[:, 0]
                last_hidden = jnp.where(
                    active[:, None], h_next, s["last_hidden"])
                pend = jnp.where(
                    active,
                    jnp.take_along_axis(e, idx_last[:, None], axis=1)[:, 0],
                    s["pend"],
                )
                return it + 1, dict(
                    cache=cache, last_hidden=last_hidden, tokens=tokens,
                    num=num + n_commit,
                    steps=s["steps"] + jnp.where(active, 1, 0),
                    min_len=s["min_len"], max_len=s["max_len"],
                    rngs=new_rngs, finished=finished, pend=pend,
                    accepted=s["accepted"] + jnp.where(active, n_acc, 0),
                    drafted=s["drafted"] + jnp.where(active, kd, 0),
                )

            _, final = jax.lax.while_loop(cond, body, (jnp.int32(0), state))
            meta = jnp.concatenate(
                [
                    final["tokens"],
                    final["accepted"][:, None],
                    final["drafted"][:, None],
                    final["num"][:, None],
                    final["steps"][:, None],
                    final["finished"].astype(jnp.int32)[:, None],
                ],
                axis=1,
            )
            return final, meta

        return fn

    # -- host loop -----------------------------------------------------------

    def _get_streamer(self):
        """Shared StreamingSynthesizer for chunk synthesis of stream=True
        requests — its flow/HiFT chunk programs are shape-bucketed jits, so
        one instance serves every concurrent stream."""
        if self._streamer is None:
            # engine.streaming() so the chunk programs (and any prewarm) are
            # shared with solo streaming sessions
            self._streamer = self.engine.streaming()
        return self._streamer

    def submit(
        self,
        text_tokens: np.ndarray,
        spk_embedding: Optional[np.ndarray] = None,
        min_token_text_ratio: float = 2.0,
        max_token_text_ratio: float = 20.0,
        rng: Optional[jax.Array] = None,
        prompt_speech_tokens: Optional[np.ndarray] = None,
        prompt_mel: Optional[np.ndarray] = None,
        stream: bool = False,
        tts_text_len: Optional[int] = None,
    ) -> _Request:
        """`stream=True` makes this request a STREAMING session riding the
        shared decode slots: ~1 s waveform chunks appear on `req.chunk_q`
        (drain with `stream_result`) as the slot accumulates tokens, with the
        solo streamer's exact chunk semantics (25-token hop + lookahead,
        carried HiFT mel/source cache, Hamming cross-fade — cli/model.py:
        279-360).  Token streams stay bit-identical to the solo paths: the
        submit rng is split exactly as StreamingSynthesizer.synthesize_stream
        splits it (decode chain vs vocoder-noise chain)."""
        n = len(text_tokens)
        if n > self.prompt_buckets[-1]:
            # silent truncation would garble audio — callers must route long
            # prompts through the regular Engine paths (full bucket ladder)
            raise ValueError(
                f"prompt of {n} tokens exceeds the continuous slots' largest "
                f"bucket {self.prompt_buckets[-1]}; use Engine.synthesize"
            )
        sp = (np.zeros((0,), np.int32) if prompt_speech_tokens is None
              else np.asarray(prompt_speech_tokens, np.int32))
        if len(sp) > self.sp_buckets[-1]:
            raise ValueError(
                f"prompt speech of {len(sp)} tokens exceeds bucket "
                f"{self.sp_buckets[-1]}; use Engine.synthesize"
            )
        if self._stop.is_set():
            raise RuntimeError("batcher shut down")
        rng = rng if rng is not None else self.engine.next_rng()
        hift_rng = None
        prompt_pad = 0
        if stream:
            # same split as synthesize_stream: decode chain / vocoder noise
            rng, hift_rng = jax.random.split(rng)
            hop = self._get_streamer().token_hop_len
            prompt_pad = int(np.ceil(len(sp) / hop) * hop - len(sp))
        n_ratio = int(tts_text_len) if tts_text_len is not None else n
        req = _Request(
            np.asarray(text_tokens, np.int32),
            spk_embedding,
            int(n_ratio * min_token_text_ratio),
            min(int(n_ratio * max_token_text_ratio), self.max_tokens),
            rng,
            self.sampling,
            prompt_speech_tokens=sp,
            prompt_mel=prompt_mel,
            stream=stream,
            hift_rng=hift_rng,
            prompt_pad=prompt_pad,
        )
        with self._lock:
            if not self._started:
                self._started = True
                self._state = self._init_state()
                self._thread.start()
                self._synth_thread.start()
                for t in self._stream_threads:
                    t.start()
        self._pending.put(req)
        return req

    def result(self, req: _Request, timeout: float = 600.0):
        if not req.done.wait(timeout):
            raise TimeoutError("continuous decode timeout")
        if req.error is not None:
            raise RuntimeError(req.error)
        return req.wav, req.stats

    def stream_result(self, req: _Request, timeout: float = 600.0):
        """Yield waveform chunks (np.float32) of a stream=True request until
        the end-of-utterance sentinel; raises if the session failed."""
        if not req.stream:
            raise ValueError("stream_result on a non-stream request")
        while True:
            item = req.chunk_q.get(timeout=timeout)
            if item is None:
                if req.error is not None:
                    raise RuntimeError(req.error)
                return
            if isinstance(item, Exception):
                raise item
            yield item

    def prewarm(self, text_lens=(16,), token_counts=(125,),
                stream: bool = True, timeout: float = 1800.0,
                token_cap: int | None = None) -> float:
        """Compile every program the slots will use — admit (per text
        bucket), the shared chunk program, whole-utterance synthesis for the
        expected token buckets, and the stream-chunk ladder — by running real
        dummy requests end to end.  Call BEFORE serving traffic: an XLA
        compile landing inside a serving window blocks the decode loop for
        tens of seconds and reads as starvation (BENCH_r03's 30-47 s TTFT
        under load was exactly this).  `token_cap` bounds the longest decode
        prewarmed (callers who KNOW their traffic's token range skip the
        ratio-cap pass — on a tunnel-attached host that one pass costs
        ~2 compiles / 60-110 s for shapes the traffic never realizes).
        Returns seconds spent."""
        t0 = time.time()
        deadline = t0 + timeout
        # engine-level marks: a LATER batcher on the same engine (serving
        # bench scenarios, restarts) shares the engine's synth/stream-chunk
        # programs — it only needs ONE pass per text bucket to exercise its
        # own admit + chunk programs, not the whole count ladder again
        if not hasattr(self.engine, "_prewarm_marks"):
            self.engine._prewarm_marks = set()
        marks = self.engine._prewarm_marks
        for n_text in text_lens:
            # always include the longest decode this text length can realize
            # (max_token_text_ratio 20, buffer-capped): served requests that
            # run past the largest explicit count would otherwise compile
            # their synth/stream-chunk buckets cold, mid-traffic
            cap = min(self.max_tokens, 20 * n_text)
            if token_cap is not None:
                cap = min(cap, int(token_cap))
            counts = sorted(set(
                c for c in tuple(token_counts) + (cap,) if c <= cap))
            ran_one = False
            for n_tok in counts:
                if ran_one and time.time() > deadline:
                    logger.warning(
                        "continuous prewarm wall-clock budget (%.0fs) "
                        "exhausted; remaining token counts stay cold "
                        "(compile on first use)", timeout)
                    break
                key = ("cont", self._bucket(n_text), n_tok, stream,
                       self.head_k, self.spec)
                if key in marks and (ran_one or n_tok != counts[-1]):
                    continue
                marks.add(key)
                ran_one = True
                ratio = n_tok / max(n_text, 1)
                text = np.arange(n_text, dtype=np.int32) % 100
                req = self.submit(
                    text, min_token_text_ratio=ratio, max_token_text_ratio=ratio,
                    rng=jax.random.PRNGKey(0))
                self.result(req, timeout=timeout)
                if stream:
                    req = self.submit(
                        text, min_token_text_ratio=ratio,
                        max_token_text_ratio=ratio, stream=True,
                        rng=jax.random.PRNGKey(1))
                    for _ in self.stream_result(req, timeout=timeout):
                        pass
        if stream and time.time() < deadline:
            # every chunk-program bucket a slot stream can touch (see
            # StreamingSynthesizer.prewarm_ladder) — engine-level jit cache,
            # shared with solo streaming sessions
            ladder_cap = min(self.max_tokens, 20 * max(text_lens))
            if token_cap is not None:
                ladder_cap = min(ladder_cap, int(token_cap))
            self._get_streamer().prewarm_ladder(int(ladder_cap))
        elif stream:
            logger.warning(
                "continuous prewarm budget exhausted before the stream "
                "chunk ladder; stream finalize shapes compile on first use")
        dt = time.time() - t0
        logger.info("continuous prewarm done in %.1fs", dt)
        return dt

    def _bucket(self, n: int) -> int:
        from .engine import _bucket

        return _bucket(n, self.prompt_buckets)

    def _sp_bucket(self, n: int) -> int:
        from .engine import _bucket

        return _bucket(n, self.sp_buckets[1:]) if n else 0

    def _loop(self):
        while not self._stop.is_set():
            try:
                self._tick()
            except Exception as e:  # pragma: no cover - defensive
                logger.exception("continuous batcher tick failed")
                with self._lock:
                    for i, req in enumerate(self._slot_req):
                        if req is not None:
                            req.error = str(e)
                            if req.stream:
                                req.chunk_q.put(None)
                            req.done.set()
                            self._slot_req[i] = None
                    # donated buffers may be gone after a failed dispatch
                    self._state = self._init_state()
                time.sleep(0.1)

    def _tick(self):
        # move arrivals into the backlogs (streams into the priority lane),
        # then admit into free slots — stream lane strictly first
        while True:
            try:
                req = self._pending.get_nowait()
            except queue.Empty:
                break
            (self._backlog_stream if req.stream else self._backlog).append(req)
        for i in range(self.slots):
            if self._slot_req[i] is not None:
                continue
            # stream lane wins by default (TTFT is the product metric), but
            # a bounded streak: after stream_fairness_k consecutive stream
            # admissions with whole-utterance work waiting, one backlog
            # request goes first so the backlog can't starve indefinitely
            backlog_turn = (
                self._backlog and i >= self.reserve_stream_slots
                and (not self._backlog_stream
                     or self._stream_admits_streak >= self.stream_fairness_k))
            if backlog_turn:
                req = self._backlog.pop(0)
                self._stream_admits_streak = 0
            elif self._backlog_stream:
                req = self._backlog_stream.pop(0)
                if self._backlog:
                    self._stream_admits_streak += 1
            else:
                continue
            try:
                # admission latency: submit -> slot assignment (the queueing
                # metric continuous batching exists to bound under load)
                req.t_admit = time.time()
                self.admission_lat_s.append(req.t_admit - req.t_submit)
                bucket = self._bucket(len(req.text_tokens))
                text = np.zeros((bucket,), np.int32)
                text[: len(req.text_tokens)] = req.text_tokens[:bucket]
                sp = req.prompt_speech_tokens
                lp = len(sp)
                sp_bucket = self._sp_bucket(lp)
                sp_pad = np.zeros((sp_bucket,), np.int32)
                sp_pad[:lp] = sp
                burst = req.stream and not self.spec
                # SFT-speaker streams fuse the first waveform chunk into the
                # admit program: ONE dispatch + ONE packed fetch to first
                # audio (see _admit_stream_fused_fn)
                fused = (burst and sp_bucket == 0
                         and (req.prompt_mel is None or len(req.prompt_mel) == 0))
                row_meta = None
                fused_out = None
                if fused:
                    emb = (np.zeros((192,), np.float32)
                           if req.spk_embedding is None else
                           np.asarray(req.spk_embedding,
                                      np.float32).reshape(-1)[:192])
                    admit = self._admit_stream_fused_fn(bucket)
                    self._state, packed_dev, cmel_dev, csrc_dev = admit(
                        self.engine.llm_params, self.engine.flow_params,
                        self.engine.hift_params, self._state, jnp.int32(i),
                        jnp.asarray(text),
                        jnp.int32(min(len(req.text_tokens), bucket)),
                        jnp.int32(req.min_len), jnp.int32(req.max_len),
                        req.rng, req.hift_rng, jnp.asarray(emb)[None],
                    )
                    packed = np.asarray(packed_dev)  # the ONE fetch
                    n_wav = len(packed) - (self.max_tokens + self.head_k + 3)
                    row_meta = packed[n_wav:].astype(np.int32)
                    fused_out = (packed[:n_wav], cmel_dev, csrc_dev)
                else:
                    admit = (self._admit_stream_fn(bucket, sp_bucket) if burst
                             else self._admit_fn(bucket, sp_bucket))
                    out = admit(
                        self.engine.llm_params, self._state, jnp.int32(i),
                        jnp.asarray(text), jnp.int32(min(len(req.text_tokens), bucket)),
                        jnp.asarray(sp_pad), jnp.int32(lp),
                        jnp.int32(req.min_len), jnp.int32(req.max_len), req.rng,
                    )
                    if burst:
                        self._state, row_dev = out
                        row_meta = np.asarray(row_dev)
                    else:
                        self._state = out
            except Exception as e:
                # fail THIS request (it is in neither backlog nor a slot at
                # this point — without this its waiter would hang to timeout)
                logger.exception("admit failed")
                req.error = str(e)
                if req.stream:
                    req.chunk_q.put(None)
                req.done.set()
                # the admit donates the state: a device-side failure leaves
                # its buffers deleted, which would spuriously fail every
                # later request — detect and rebuild, failing active slots
                leaves = jax.tree.leaves(self._state)
                if leaves and getattr(leaves[0], "is_deleted", lambda: False)():
                    logger.warning("state donated by failed admit; resetting")
                    with self._lock:
                        for j, other in enumerate(self._slot_req):
                            if other is not None:
                                other.error = str(e)
                                if other.stream:
                                    other.chunk_q.put(None)
                                other.done.set()
                                self._slot_req[j] = None
                        self._state = self._init_state()
                continue
            self._slot_req[i] = req
            self._slot_steps[i] = 0
            if row_meta is not None:
                num = int(row_meta[-3])
                streamer = self._get_streamer()
                hop = streamer.token_hop_len
                la = self.engine.cfg.flow.pre_lookahead_len
                if fused_out is not None and num >= hop + la:
                    # the fused admit already synthesized the first chunk:
                    # hand its waveform straight to the stream and prime the
                    # carried HiFT cache — no synth-queue hop, no extra
                    # transfers (the mel/source caches stay device-resident)
                    wav16, cmel_dev, csrc_dev = fused_out
                    sc = streamer.source_cache_len
                    up = self.engine.cfg.hift.upsample_scale
                    ratio = self.engine.cfg.flow.token_mel_ratio
                    wav = wav16[: hop * ratio * up].astype(np.float32) / 32767.0
                    req.hift_cache = {"mel": cmel_dev, "source": csrc_dev,
                                      "speech": wav[-sc:]}
                    req.t_sched = req.t_synth_start = req.t_first = time.time()
                    req.sched_offset = hop
                    req.token_offset = 0
                    with req.synth_cv:
                        req.synth_next = hop
                    req.chunk_q.put(wav[:-sc])
                    logger.info(
                        "stream ttft %.0fms (fused admit): admit %.0f + "
                        "burst+chunk %.0f",
                        (req.t_first - req.t_submit) * 1000,
                        (req.t_admit - req.t_submit) * 1000,
                        (req.t_first - req.t_admit) * 1000,
                    )
                # the admit burst may already hold the first streamable hop
                # (or the whole short utterance): schedule it NOW instead of
                # after the next shared chunk
                self._emit_stream_row(
                    i, req, row_meta, num, int(row_meta[-2]),
                    bool(row_meta[-1]), 0.0)

        if all(r is None for r in self._slot_req):
            # idle: block briefly for the next arrival
            try:
                req = self._pending.get(timeout=0.05)
                (self._backlog_stream if req.stream else self._backlog).append(req)
            except queue.Empty:
                pass
            return

        # one decode chunk over all active slots
        t0 = time.time()
        self._state, meta = self._chunk_fn()(
            self.engine.llm_params, self._state, self.sampling
        )
        meta = np.asarray(meta)  # (S, max_tokens+k+3) — the chunk's one transfer
        chunk_time = time.time() - t0

        k = self.head_k
        for i in range(self.slots):
            req = self._slot_req[i]
            if req is None:
                continue
            self._slot_steps[i] += 1
            num = int(meta[i, -3])
            steps = int(meta[i, -2])
            fin = bool(meta[i, -1])
            if self.spec and fin:
                # acceptance-rate stat (spec meta layout adds the pair
                # before [num, steps, finished])
                req.spec_pair = (int(meta[i, -5]), int(meta[i, -4]))
            if req.stream:
                self._emit_stream_row(i, req, meta[i], num, steps, fin,
                                      chunk_time)
            elif fin:  # finished: hand off to the synth thread
                tokens = meta[i, : self.max_tokens + k][:num]
                logger.info(
                    "slot %d decode done: %d tokens in %d steps "
                    "(%.2fs since submit)", i, num, steps,
                    time.time() - req.t_submit,
                )
                self._synth_q.put(("final", req, tokens, steps, chunk_time))
                self._slot_req[i] = None

    def _emit_stream_row(self, i, req, row, num, steps, fin, chunk_time):
        """Schedule every full hop a stream slot has accumulated (same chunk
        boundaries as the solo streamer's loop), then the finalize flush;
        synthesis runs on the stream-synth pool so decode of the OTHER slots
        isn't blocked by this stream's flow/HiFT.  Shared by the chunk loop
        (row = meta[i]) and the admit burst (row = the admit's row_meta)."""
        la = self.engine.cfg.flow.pre_lookahead_len
        hop = self._get_streamer().token_hop_len
        while True:
            this_hop = hop + req.prompt_pad if req.sched_offset == 0 else hop
            if num - req.sched_offset < this_hop + la:
                break
            if req.t_sched is None:
                req.t_sched = time.time()
            toks = row[: req.sched_offset + this_hop + la].copy()
            self._put_stream_chunk(
                ("schunk", req, toks, req.sched_offset, False,
                 steps, chunk_time))
            req.sched_offset += this_hop
        if fin:
            logger.info(
                "slot %d stream decode done: %d tokens in %d steps "
                "(%.2fs since submit)", i, num, steps,
                time.time() - req.t_submit,
            )
            if req.t_sched is None:
                req.t_sched = time.time()
            toks = row[:num].copy()
            self._put_stream_chunk(
                ("schunk", req, toks, req.sched_offset, True,
                 steps, chunk_time))
            self._slot_req[i] = None

    def _put_stream_chunk(self, item):
        """Enqueue a stream chunk for synthesis.  Priority 0 = a session's
        FIRST chunk (token_offset 0 — the TTFT product metric); priority 1 =
        later chunks, FIFO among themselves via the seq tiebreaker (they are
        due only at their playback offset, ~1 s per hop after the first)."""
        prio = 0 if item[3] == 0 else 1
        if prio == 0:
            with self._prio0_lock:
                self._prio0_pending += 1
        self._stream_q.put((prio, next(self._stream_seq), item))

    def _synth_loop(self, q: "queue.Queue"):
        is_prio = isinstance(q, queue.PriorityQueue)
        while not self._stop.is_set():
            try:
                item = q.get(timeout=0.1)
            except queue.Empty:
                continue
            if is_prio:
                item = item[2]
                if item[0] == "schunk" and item[3] == 0:
                    # this thread is about to dispatch a first chunk
                    with self._prio0_lock:
                        self._prio0_pending = max(0, self._prio0_pending - 1)
            else:
                # whole-utterance synths are ~100 ms device programs: hold
                # the dispatch while a first-chunk synth is imminent so the
                # TTFT-critical program isn't queued behind this one
                # (bounded wait — liveness over perfect priority)
                t_hold = time.time()
                while self._prio0_pending > 0 and time.time() - t_hold < 0.3:
                    time.sleep(0.005)
            if item[0] == "schunk":
                self._synth_stream_chunk(*item[1:])
                continue
            _, req, tokens, steps, chunk_time = item
            try:
                wav, synth_time = self._synthesize(req, tokens)
                req.wav = wav
                req.stats = dict(
                    tokens=tokens.tolist(), steps=steps,
                    latency=time.time() - req.t_submit,
                    synth_time=synth_time, chunk_time=chunk_time,
                )
                if req.spec_pair is not None:
                    acc, drafted = req.spec_pair
                    req.stats["spec_acceptance"] = (
                        acc / drafted if drafted else 0.0)
            except Exception as e:
                logger.exception("continuous synth failed")
                req.error = str(e)
            req.done.set()

    def _synth_stream_chunk(self, req, tokens, token_offset, finalize,
                            steps, chunk_time):
        """One streaming chunk of a stream=True request: flow over the token
        prefix (streaming attention mask) + HiFT with the request's carried
        mel/source cache — the solo streamer's _token2wav, shared jit cache.

        Thread-pool safe: chunks of ONE request form a sequential chain
        (hift_cache + host-side cross-fade), so a chunk whose token_offset
        isn't the request's `synth_next` waits on the request's condition
        variable until its predecessor (claimed by a sibling thread) lands."""
        if req.done.is_set():  # failed earlier; drop late chunks
            return
        t_gate = time.time()
        with req.synth_cv:
            while req.synth_next != token_offset and not req.done.is_set():
                req.synth_cv.wait(timeout=1.0)  # re-check done every second
                if time.time() - t_gate > 120.0:
                    req.error = req.error or "stream chunk order stall"
                    req.chunk_q.put(None)
                    req.done.set()
                    return
        if req.done.is_set():
            return
        try:
            if req.t_first is None:
                req.t_synth_start = time.time()
            emb = (np.zeros((192,), np.float32) if req.spk_embedding is None
                   else np.asarray(req.spk_embedding, np.float32).reshape(-1)[:192])
            wav, req.hift_cache = self._get_streamer()._token2wav(
                tokens, req.prompt_speech_tokens, req.prompt_mel, emb,
                token_offset, req.hift_rng, finalize=finalize,
                hift_cache=req.hift_cache,
            )
            req.token_offset = token_offset
            if req.t_first is None:
                req.t_first = time.time()
                logger.info(
                    "stream ttft %.0fms: admit %.0f + decode %.0f + synthq "
                    "%.0f + synth %.0f",
                    (req.t_first - req.t_submit) * 1000,
                    (req.t_admit - req.t_submit) * 1000,
                    (req.t_sched - req.t_admit) * 1000,
                    (req.t_synth_start - req.t_sched) * 1000,
                    (req.t_first - req.t_synth_start) * 1000,
                )
            req.chunk_q.put(wav)
            hop = self._get_streamer().token_hop_len
            with req.synth_cv:
                req.synth_next = token_offset + hop + (
                    req.prompt_pad if token_offset == 0 else 0)
                req.synth_cv.notify_all()
            if finalize:
                req.stats = dict(
                    tokens=tokens.tolist(), steps=steps,
                    latency=time.time() - req.t_submit,
                    ttft=req.t_first - req.t_submit, chunk_time=chunk_time,
                )
                if req.spec_pair is not None:
                    acc, drafted = req.spec_pair
                    req.stats["spec_acceptance"] = (
                        acc / drafted if drafted else 0.0)
                req.chunk_q.put(None)
                req.done.set()
        except Exception as e:
            logger.exception("continuous stream chunk failed")
            req.error = str(e)
            req.chunk_q.put(e)
            req.chunk_q.put(None)
            req.done.set()
            with req.synth_cv:
                req.synth_cv.notify_all()  # release a sibling gate waiter

    def _synthesize(self, req: _Request, tokens: np.ndarray):
        eng = self.engine
        t0 = time.time()
        sp = req.prompt_speech_tokens
        lp = 0 if sp is None else len(sp)
        tok_bkt = eng._bucket_token(max(lp + len(tokens), 1))
        # canonical synth token-buffer shape is (max_tokens,) — the same
        # trace the Engine's two-stage paths use (GenerateResult.tokens is
        # trimmed to max_tokens); any other length retraces the synth program
        # per caller and compiles a duplicate mid-traffic
        buf = np.full((eng.max_tokens,), -1, np.int32)
        buf[: len(tokens)] = tokens[: eng.max_tokens]
        emb = (np.zeros((192,), np.float32) if req.spk_embedding is None
               else np.asarray(req.spk_embedding, np.float32).reshape(-1)[:192])
        if lp:
            sp_bkt = eng._bucket_prompt(lp)
            sp_pad = np.zeros((sp_bkt,), np.int32)
            sp_pad[:lp] = sp
        else:
            sp_bkt = 0
            sp_pad = np.zeros((0,), np.int32)
        pm = req.prompt_mel
        if pm is not None and len(pm) > 0:
            pm_bkt = eng._bucket_mel(len(pm))
            pm_buf = np.zeros((1, pm_bkt, eng.cfg.flow.output_size), np.float32)
            pm_buf[0, : len(pm)] = pm
            pm_len = len(pm)
        else:
            pm_bkt, pm_len = 0, 0
            pm_buf = np.zeros((1, 0, eng.cfg.flow.output_size), np.float32)
        synth = eng._synth_fn(tok_bkt, pm_bkt, sp_bkt)
        wav_i16, _mel = synth(
            eng.flow_params, eng.hift_params, jnp.asarray(buf),
            jnp.int32(len(tokens)), jnp.asarray(sp_pad), jnp.int32(lp),
            jnp.asarray(pm_buf), jnp.int32(pm_len),
            jnp.asarray(emb)[None], req.rng,
        )
        ratio = eng.cfg.flow.token_mel_ratio
        up = eng.cfg.hift.upsample_scale
        wav = np.asarray(wav_i16)[0, : len(tokens) * ratio * up].astype(np.float32) / 32767.0
        return wav, time.time() - t0

    def shutdown(self):
        self._stop.set()
        if self._started:
            self._thread.join(timeout=5.0)
            self._synth_thread.join(timeout=5.0)
            for t in self._stream_threads:
                t.join(timeout=5.0)
        # fail everything still queued or in flight so waiters unblock now
        # instead of sitting out their full result() timeout
        leftovers = list(self._backlog) + list(self._backlog_stream)
        self._backlog = []
        self._backlog_stream = []
        while True:
            try:
                leftovers.append(self._pending.get_nowait())
            except queue.Empty:
                break
        while True:
            try:
                leftovers.append(self._synth_q.get_nowait()[1])
            except queue.Empty:
                break
        while True:
            try:
                leftovers.append(self._stream_q.get_nowait()[2][1])
            except queue.Empty:
                break
        with self._lock:
            for i, req in enumerate(self._slot_req):
                if req is not None:
                    leftovers.append(req)
                    self._slot_req[i] = None
        for req in leftovers:
            if not req.done.is_set():
                req.error = "batcher shut down"
                if req.stream:
                    req.chunk_q.put(None)  # unblock a draining stream_result
                req.done.set()
