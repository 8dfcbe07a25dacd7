"""Chunked streaming synthesis (reference cli/model.py:236-360 token2wav/tts).

Semantics preserved from the reference:
  - 25-token hop (1 s of audio) + pre_lookahead_len=3 token lookahead per
    flow chunk; first chunk absorbs prompt-token padding to a hop multiple.
  - flow runs over the full token prefix with the static-chunk streaming
    attention mask; emitted mel is sliced at token_offset * token_mel_ratio.
  - HiFT chunk seams: 8 mel frames + 8*480 source samples of cache carried
    between chunks; a Hamming window cross-fades consecutive waveforms
    (fade_in_out, utils/common.py:169).

TPU redesign: the LLM producer is the resumable `generate_until` state
machine — each streaming turn runs a device-side while_loop until the next
hop of tokens is ready (state donated, KV cache stays on device), instead of
the reference's thread + 100 ms polling loop.
"""

from __future__ import annotations

import logging
import time
from typing import Generator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SamplingConfig
from ..models import flow as flow_model
from ..models import hift as hift_model
from ..models import llm as llm_model
from ..ops.sampling import SamplingParams

logger = logging.getLogger("hydravox.streaming")


def fade_in_out(fade_in: np.ndarray, fade_out: np.ndarray, window: np.ndarray) -> np.ndarray:
    """Hamming cross-fade (reference common.py:169-177)."""
    n = window.shape[0] // 2
    out = fade_in.copy()
    out[..., :n] = fade_in[..., :n] * window[:n] + fade_out[..., -n:] * window[n:]
    return out


class StreamingSynthesizer:
    """Per-utterance streaming session over an Engine's params/jit caches."""

    def __init__(self, engine, token_hop_len: int = 25, mel_cache_len: int = 8):
        self.engine = engine
        self.cfg = engine.cfg
        self.token_hop_len = token_hop_len
        self.mel_cache_len = mel_cache_len
        upsample = self.cfg.hift.upsample_scale
        self.source_cache_len = mel_cache_len * upsample
        self.speech_window = np.hamming(2 * self.source_cache_len)
        self._gen_until_cache = {}
        self._flow_stream_cache = {}
        self._hift_cache_fn = {}

    # -- jit-cached stages ---------------------------------------------------

    def _spec(self, head_num: int) -> bool:
        """Speculative decoding rides the same resumable-state streaming
        machinery: spec state is a pytree with the same num/tokens/finished
        fields, and pausing at chunk targets does not change the rng stream."""
        return bool(getattr(self.engine, "spec_decode", False)) and head_num >= 2

    def _generate_until_fn(self, head_num: int):
        if head_num not in self._gen_until_cache:
            cfg = self.cfg.llm
            spec = self._spec(head_num)

            def fn(params, state, target, min_len, max_len, sampling):
                if spec:
                    return llm_model.generate_spec_until(
                        params, cfg, state, target, min_len, max_len, sampling,
                        num_heads=head_num,
                    )
                return llm_model.generate_until(
                    params, cfg, state, target, min_len, max_len, sampling,
                    inference_head_num=head_num,
                )

            self._gen_until_cache[head_num] = jax.jit(fn, donate_argnums=(1,))
        return self._gen_until_cache[head_num]

    def _decode_init_until(self, params, cfg, rng, emb, plen, target, min_len,
                           max_len, sampling, head_num: int, cap: int):
        """Traceable prefill + decode-to-target in either mode."""
        if self._spec(head_num):
            state = llm_model.init_spec_state(
                params, cfg, rng, emb, plen, min_len, max_len, sampling,
                num_heads=head_num, max_tokens=self.engine.max_tokens,
                cache_len_cap=cap,
            )
            return llm_model.generate_spec_until(
                params, cfg, state, target, min_len, max_len, sampling,
                num_heads=head_num,
            )
        state = llm_model.init_generate_state(
            params, cfg, rng, emb, plen, inference_head_num=head_num,
            max_tokens=self.engine.max_tokens, cache_len_cap=cap,
        )
        return llm_model.generate_until(
            params, cfg, state, target, min_len, max_len, sampling,
            inference_head_num=head_num,
        )

    def _init_fn(self, text_bucket: int, sp_bucket: int, head_num: int):
        """Jitted prompt assembly + KV prefill + decode to the first hop —
        TTFT's whole LLM cost in ONE dispatch (running this eagerly costs
        dozens of tunnel round-trips)."""
        key = ("init", text_bucket, sp_bucket, head_num)
        if key not in self._gen_until_cache:
            cfg = self.cfg.llm
            cap = 2 + text_bucket + sp_bucket + self.engine.max_tokens + head_num

            def fn(params, rng, text_tokens, text_len, sp_tokens, sp_len,
                   target, min_len, max_len, sampling):
                emb, plen = llm_model.build_inference_prompt(
                    params, cfg, text_tokens, text_len, sp_tokens, sp_len
                )
                return self._decode_init_until(
                    params, cfg, rng, emb, plen, target, min_len, max_len,
                    sampling, head_num, cap,
                )

            self._gen_until_cache[key] = jax.jit(fn)
        return self._gen_until_cache[key]

    def _first_chunk_fn(self, tbkt: int, sbkt: int, pm_bucket: int,
                        head_num: int, first_target: int, chunk_bucket: int):
        """TTFT fast path: ONE jitted program = prompt assembly + KV prefill +
        decode to the first hop + flow (streaming mask) + HiFT. Collapses the
        two dispatches (+ the host round-trips between them) of the unfused
        path into a single device program — each tunnel dispatch costs ~30 ms.

        Assumes the utterance produces >= first_target tokens; the caller
        checks state['num'] and falls back to the unfused path for very short
        generations (the fused chunk is then discarded)."""
        key = ("first", tbkt, sbkt, pm_bucket, head_num, first_target, chunk_bucket)
        if key in self._flow_stream_cache:
            return self._flow_stream_cache[key]

        cfg = self.cfg.llm
        fcfg, hcfg = self.cfg.flow, self.cfg.hift
        ratio = fcfg.token_mel_ratio
        la = fcfg.pre_lookahead_len
        up = hcfg.upsample_scale
        cap = 2 + tbkt + sbkt + self.engine.max_tokens + head_num
        tok_bucket = self.engine._bucket_token(max(sbkt + first_target, 1))

        @jax.jit
        def fn(llm_params, flow_params, hift_params, rng, hift_rng,
               text_tokens, text_len, sp_tokens, sp_len,
               target, min_len, max_len, sampling,
               prompt_feat, prompt_mel_len, embedding):
            emb, plen = llm_model.build_inference_prompt(
                llm_params, cfg, text_tokens, text_len, sp_tokens, sp_len
            )
            state = self._decode_init_until(
                llm_params, cfg, rng, emb, plen, target, min_len, max_len,
                sampling, head_num, cap,
            )

            # flow token sequence: [prompt speech tokens, first_target generated]
            pos = jnp.arange(tok_bucket)
            gen_idx = jnp.clip(pos - sp_len, 0, state["tokens"].shape[0] - 1)
            if sbkt > 0:
                sp_idx = jnp.clip(pos, 0, sbkt - 1)
                seq = jnp.where(pos < sp_len, sp_tokens[sp_idx], state["tokens"][gen_idx])
            else:
                seq = state["tokens"][gen_idx]
            n_tokens = sp_len + first_target
            valid = pos < n_tokens
            emit = pos < (n_tokens - la)

            mel_full = flow_model.inference(
                flow_params, fcfg, seq[None], valid[None], prompt_feat,
                prompt_mel_len, embedding, finalize=False, streaming=True,
                emit_valid=emit[None],
            )
            # generated frames only (prompt-token region is context)
            start = prompt_mel_len + 0  # token_offset == 0 for the first chunk
            mel_pad = jnp.pad(mel_full, ((0, 0), (0, 0), (0, chunk_bucket)))
            mel_chunk = jax.lax.dynamic_slice(mel_pad, (0, 0, start), (1, 80, chunk_bucket))
            n_frames = (first_target - la - 0) * ratio  # static
            frame = jnp.arange(chunk_bucket)
            src_idx = jnp.minimum(frame, max(n_frames - 1, 0))
            mel_chunk = mel_chunk[:, :, src_idx]

            f0 = hift_model.predict_f0(hift_params, mel_chunk)
            f0_up = jnp.repeat(f0, up, axis=-1)[..., None]
            s, _ = hift_model.sine_source(hift_rng, hcfg, f0_up)
            source = jnp.swapaxes(
                jnp.tanh(hift_model.linear(hift_params["m_source_linear"], s)), 1, 2
            )
            wav = hift_model.decode(hift_params, hcfg, mel_chunk, source)

            # pack wav (int16 PCM) + num + finished into ONE array: the tunnel
            # charges ~30-100 ms per device->host transfer, so TTFT fetches
            # exactly one buffer; mel/source caches stay device-resident
            wav_i16 = (jnp.clip(wav[0], -1.0, 1.0) * 32767.0).astype(jnp.int16)
            tail = jnp.stack([
                state["num"].astype(jnp.int16),
                state["finished"].astype(jnp.int16),
            ])
            packed = jnp.concatenate([wav_i16, tail])
            return state, packed, source, mel_chunk

        self._flow_stream_cache[key] = fn
        return fn

    def _chunk_fn(self, token_bucket: int, pm_bucket: int, chunk_bucket: int,
                  has_cache: bool, finalize: bool):
        """One jitted program per chunk shape: flow (streaming masks) ->
        chunk mel slice -> cache splice -> HiFT with exact source-cache
        splice (generator.py:566-567).  A single device dispatch per chunk
        (~2 fewer tunnel round-trips than separate flow/hift calls)."""
        key = (token_bucket, pm_bucket, chunk_bucket, has_cache, finalize)
        if key not in self._flow_stream_cache:
            fcfg, hcfg = self.cfg.flow, self.cfg.hift
            ratio = fcfg.token_mel_ratio
            mc = self.mel_cache_len if has_cache else 0
            sc = self.source_cache_len if has_cache else 0
            up = hcfg.upsample_scale

            @jax.jit
            def fn(flow_params, hift_params, token, token_valid, emit_valid,
                   prompt_feat, prompt_mel_len, embedding, rng,
                   token_offset, n_frames, cache_mel, cache_source):
                mel_full = flow_model.inference(
                    flow_params, fcfg, token, token_valid, prompt_feat,
                    prompt_mel_len, embedding, finalize=finalize, streaming=True,
                    emit_valid=None if finalize else emit_valid,
                )  # (1, 80, tb*ratio) f32

                start = prompt_mel_len + token_offset * ratio
                mel_pad = jnp.pad(mel_full, ((0, 0), (0, 0), (0, chunk_bucket)))
                mel_chunk = jax.lax.dynamic_slice(
                    mel_pad, (0, 0, start), (1, 80, chunk_bucket)
                )
                # edge-replicate past the valid chunk end (f0-conv boundary)
                frame = jnp.arange(chunk_bucket)
                src_idx = jnp.minimum(frame, jnp.maximum(n_frames - 1, 0))
                mel_chunk = mel_chunk[:, :, src_idx]

                if has_cache:
                    mel_in = jnp.concatenate([cache_mel, mel_chunk], axis=2)
                else:
                    mel_in = mel_chunk

                f0 = hift_model.predict_f0(hift_params, mel_in)
                f0_up = jnp.repeat(f0, up, axis=-1)[..., None]
                s, _ = hift_model.sine_source(rng, hcfg, f0_up)
                source = jnp.swapaxes(
                    jnp.tanh(hift_model.linear(hift_params["m_source_linear"], s)), 1, 2
                )
                if has_cache:
                    source = jnp.concatenate([cache_source, source[:, :, sc:]], axis=2)
                wav = hift_model.decode(hift_params, hcfg, mel_in, source)
                return wav, source, mel_in

            self._flow_stream_cache[key] = fn
        return self._flow_stream_cache[key]

    # -- session -------------------------------------------------------------

    def synthesize_stream(
        self,
        text_tokens: np.ndarray,
        tts_text_len: int,
        sampling: Optional[SamplingConfig] = None,
        inference_head_num: Optional[int] = None,
        prompt_speech_tokens: Optional[np.ndarray] = None,
        prompt_mel: Optional[np.ndarray] = None,
        spk_embedding: Optional[np.ndarray] = None,
        rng: Optional[jax.Array] = None,
        max_token_text_ratio: float = 20.0,
        min_token_text_ratio: float = 2.0,
    ) -> Generator[np.ndarray, None, None]:
        """Yields 24 kHz waveform chunks (~1 s each)."""
        engine = self.engine
        cfg = self.cfg
        sampling = sampling or cfg.tts_sampling
        head_num = inference_head_num or cfg.llm.inference_head_num
        rng = rng if rng is not None else engine.next_rng()
        prompt_speech_tokens = (
            np.zeros((0,), np.int32) if prompt_speech_tokens is None else
            np.asarray(prompt_speech_tokens, np.int32)
        )
        if spk_embedding is None:
            spk_embedding = np.zeros((192,), np.float32)

        # ---- LLM state machine ----
        lt, lp = len(text_tokens), len(prompt_speech_tokens)
        tbkt = engine._bucket_prompt(lt)
        sbkt = engine._bucket_prompt(lp) if lp else 0
        text_pad = np.zeros((tbkt,), np.int32)
        text_pad[:lt] = text_tokens
        sp_pad = np.zeros((sbkt,), np.int32)
        sp_pad[:lp] = prompt_speech_tokens
        min_len = jnp.int32(int(tts_text_len * min_token_text_ratio))
        max_len_i = min(int(tts_text_len * max_token_text_ratio), engine.max_tokens)
        max_len = jnp.int32(max_len_i)
        sp = SamplingParams.make(sampling.top_p, sampling.top_k, sampling.win_size, sampling.tau_r)

        la = cfg.flow.pre_lookahead_len
        ratio = cfg.flow.token_mel_ratio
        hop = self.token_hop_len
        # first chunk absorbs prompt-token padding to a hop multiple
        prompt_pad = int(np.ceil(lp / hop) * hop - lp)

        # gen_until donates its state (which carries this rng) — keep an
        # independent stream for the vocoder noise
        rng, hift_rng = jax.random.split(rng)
        first_target = min(hop + prompt_pad + la, max_len_i)
        gen_until = self._generate_until_fn(head_num)

        token_offset = 0
        hift_cache = None  # dict(mel (1,80,Lc), source (1,1,Sc), speech (1,Sc))

        # prompt mel (zero-shot) padded to its bucket for the fused program
        if prompt_mel is not None and len(prompt_mel) > 0:
            lm = len(prompt_mel)
            pm_bucket = engine._bucket_mel(lm)
            pm = np.zeros((1, pm_bucket, cfg.flow.output_size), np.float32)
            pm[0, :lm] = prompt_mel
            pm_len = lm
        else:
            pm = np.zeros((1, 0, cfg.flow.output_size), np.float32)
            pm_bucket, pm_len = 0, 0

        fused_viable = first_target == hop + prompt_pad + la  # not len-capped
        if fused_viable:
            # TTFT fast path: one dispatch produces the LLM state AND the
            # first waveform chunk (discarded if generation ended early)
            first_hop = hop + prompt_pad
            n_frames0 = first_hop * cfg.flow.token_mel_ratio
            chunk_bucket0 = _bucket_chunk(max(n_frames0, 1))
            fused = self._first_chunk_fn(
                tbkt, sbkt, pm_bucket, head_num, first_target, chunk_bucket0
            )
            state, packed_dev, source_dev, mel_dev = fused(
                engine.llm_params, engine.flow_params, engine.hift_params,
                rng, hift_rng, jnp.asarray(text_pad), jnp.int32(lt),
                jnp.asarray(sp_pad), jnp.int32(lp),
                jnp.int32(first_target), min_len, max_len, sp,
                jnp.asarray(pm), jnp.int32(pm_len),
                jnp.asarray(spk_embedding, jnp.float32)[None],
            )
            packed = np.asarray(packed_dev)  # the ONLY transfer before yield
            n0 = int(packed[-2])
            finished = bool(packed[-1]) or n0 >= max_len_i
            if n0 >= first_target:
                mc, sc, up = self.mel_cache_len, self.source_cache_len, cfg.hift.upsample_scale
                wav = packed[: n_frames0 * up].astype(np.float32) / 32767.0
                # mel/source caches stay on device for the next chunk
                hift_cache = {
                    "mel": mel_dev[:, :, n_frames0 - mc : n_frames0],
                    "source": source_dev[:, :, n_frames0 * up - sc : n_frames0 * up],
                    "speech": wav[-sc:],
                }
                token_offset = first_hop
                yield wav[:-sc]
            produced = np.asarray(state["tokens"][:n0])
        else:
            state = self._init_fn(tbkt, sbkt, head_num)(
                engine.llm_params, rng, jnp.asarray(text_pad), jnp.int32(lt),
                jnp.asarray(sp_pad), jnp.int32(lp),
                jnp.int32(first_target), min_len, max_len, sp,
            )
            n0 = int(state["num"])
            produced = np.asarray(state["tokens"][:n0])
            finished = bool(state["finished"]) or n0 >= max_len_i

        while True:
            this_hop = hop + prompt_pad if token_offset == 0 else hop
            target = token_offset + this_hop + la
            if not finished and len(produced) < target:
                state = gen_until(
                    engine.llm_params, state, jnp.int32(min(target, max_len_i)),
                    min_len, max_len, sp,
                )
                n = int(state["num"])
                produced = np.asarray(state["tokens"][:n])
                finished = bool(state["finished"]) or n >= max_len_i

            if len(produced) - token_offset >= this_hop + la:
                chunk_tokens = produced[: token_offset + this_hop + la]
                wav, hift_cache = self._token2wav(
                    chunk_tokens, prompt_speech_tokens, prompt_mel, spk_embedding,
                    token_offset, hift_rng, finalize=False, hift_cache=hift_cache,
                )
                token_offset += this_hop
                yield wav
                continue
            if finished:
                break

        # final flush with all tokens
        wav, _ = self._token2wav(
            produced, prompt_speech_tokens, prompt_mel, spk_embedding,
            token_offset, hift_rng, finalize=True, hift_cache=hift_cache,
        )
        yield wav

    def prewarm_ladder(self, max_total_tokens: int,
                       prompt_tokens: Optional[np.ndarray] = None,
                       prompt_mel: Optional[np.ndarray] = None) -> float:
        """Compile the full chunk-program ladder a stream can touch.

        A session's per-chunk program is keyed by the token-prefix bucket and
        the finalize flag (`_chunk_fn`); one sample stream only compiles the
        keys its own realized length visits — in particular the FINALIZE
        program of every shorter bucket stays cold, and a served stream then
        stalls tens of seconds mid-utterance on first use (BENCH r4 dev runs:
        14-18 s inter-chunk gaps).  This walks every (bucket, cache, finalize)
        combination up to `max_total_tokens` directly.  Idempotent per
        (cap, prompt shape): later callers on the same engine (the per-
        scenario servers in the serving bench, multi-tenant services) skip
        the walk.  Returns seconds."""
        t0 = time.time()
        pt_n = 0 if prompt_tokens is None else len(prompt_tokens)
        pm_n = 0 if prompt_mel is None else len(prompt_mel)
        mark = ("ladder", int(max_total_tokens), pt_n, pm_n)
        if not hasattr(self, "_ladder_marks"):
            self._ladder_marks = set()
        if mark in self._ladder_marks:
            return 0.0
        self._ladder_marks.add(mark)
        hop, la = self.token_hop_len, self.cfg.flow.pre_lookahead_len
        mc, sc = self.mel_cache_len, self.source_cache_len
        pt = (np.zeros((0,), np.int32) if prompt_tokens is None
              else np.asarray(prompt_tokens, np.int32))
        emb = np.zeros((192,), np.float32)
        rng = jax.random.PRNGKey(0)
        cache = {
            "mel": jnp.zeros((1, 80, mc), jnp.float32),
            "source": jnp.zeros((1, 1, sc), jnp.float32),
            "speech": np.zeros((sc,), np.float32),
        }
        # cacheless first-chunk + short-stream-finalize variants
        n0 = min(hop + la, max(max_total_tokens, 1))
        self._token2wav(np.zeros((n0,), np.int32), pt, prompt_mel, emb,
                        0, rng, False, None)
        self._token2wav(np.zeros((max(n0 - 1, 1),), np.int32), pt, prompt_mel,
                        emb, 0, rng, True, None)
        # carried-cache mid-stream + finalize, one per token bucket
        cap = max_total_tokens + len(pt)
        for tb in self.engine.token_buckets:
            n = min(tb, cap) - len(pt)
            if n < hop + la:
                continue
            # mid-stream chunks emit exactly one hop (frames = 2*hop -> the
            # 64 chunk bucket); finalize flushes a sub-hop remainder — match
            # both shapes exactly so the compiled keys equal the served keys
            self._token2wav(np.zeros((n,), np.int32), pt, prompt_mel, emb,
                            n - la - hop, rng, False, dict(cache))
            self._token2wav(np.zeros((n,), np.int32), pt, prompt_mel, emb,
                            max(n - 10, 0), rng, True, dict(cache))
            if tb >= cap:
                break
        dt = time.time() - t0
        logger.info("stream chunk-ladder prewarm done in %.1fs", dt)
        return dt

    def _token2wav(
        self, tokens, prompt_tokens, prompt_mel, spk_embedding, token_offset, rng,
        finalize: bool, hift_cache,
    ):
        engine = self.engine
        cfg = self.cfg
        ratio = cfg.flow.token_mel_ratio
        la = cfg.flow.pre_lookahead_len
        up = cfg.hift.upsample_scale
        mc, sc = self.mel_cache_len, self.source_cache_len

        all_tokens = np.concatenate([prompt_tokens, tokens])
        n_all = len(all_tokens)
        n_emit = n_all - (0 if finalize else la)
        tbucket = engine._bucket_token(max(n_all, 1))
        tok_pad = np.zeros((1, tbucket), np.int32)
        tok_pad[0, :n_all] = all_tokens
        valid = np.zeros((1, tbucket), bool)
        valid[0, :n_all] = True
        emit = np.zeros((1, tbucket), bool)
        emit[0, :n_emit] = True

        if prompt_mel is not None and len(prompt_mel) > 0:
            lm = len(prompt_mel)
            pm_bucket = engine._bucket_mel(lm)
            pm = np.zeros((1, pm_bucket, cfg.flow.output_size), np.float32)
            pm[0, :lm] = prompt_mel
            pm_len = lm
        else:
            pm = np.zeros((1, 0, cfg.flow.output_size), np.float32)
            pm_bucket, pm_len = 0, 0

        # frames emitted by this chunk (generated tokens only, lookahead
        # consumed as conv context when not finalizing)
        n_gen_emit = len(tokens) - (0 if finalize else la)
        n_frames = max((n_gen_emit - token_offset) * ratio, 0)
        chunk_bucket = _bucket_chunk(max(n_frames, 1))
        has_cache = hift_cache is not None

        cache_mel = (
            hift_cache["mel"] if has_cache else np.zeros((1, 80, mc), np.float32)
        )
        cache_source = (
            hift_cache["source"] if has_cache else np.zeros((1, 1, sc), np.float32)
        )

        fn = self._chunk_fn(tbucket, pm_bucket, chunk_bucket, has_cache, finalize)
        wav_full, source_full, mel_in = fn(
            engine.flow_params, engine.hift_params,
            jnp.asarray(tok_pad), jnp.asarray(valid), jnp.asarray(emit),
            jnp.asarray(pm), jnp.int32(pm_len),
            jnp.asarray(spk_embedding, jnp.float32)[None], rng,
            jnp.int32(token_offset), jnp.int32(n_frames),
            jnp.asarray(cache_mel, jnp.float32), jnp.asarray(cache_source, jnp.float32),
        )
        total_frames = (mc if has_cache else 0) + n_frames
        wav = np.asarray(wav_full, np.float32)[0, : total_frames * up]

        if not finalize:
            # mel/source caches never leave the device (tunnel transfers cost
            # ~30-100 ms each); only the waveform is fetched
            new_cache = {
                "mel": mel_in[:, :, total_frames - mc : total_frames],
                "source": source_full[:, :, total_frames * up - sc : total_frames * up],
                "speech": wav[-sc:],
            }
            if has_cache:
                wav = fade_in_out(wav, hift_cache["speech"], self.speech_window)
            return wav[:-sc], new_cache
        if has_cache:
            wav = fade_in_out(wav, hift_cache["speech"], self.speech_window)
        return wav, None


def _bucket_chunk(n: int) -> int:
    for b in (64, 128, 256, 512, 1024, 2048):
        if n <= b:
            return b
    return 2048
