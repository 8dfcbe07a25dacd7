"""Inference engine: the end-to-end TTS pipeline with shape bucketing.

Replaces the reference's per-GPU worker process + ModelManager
(server/worker.py:25-137, infer_speech_model.py:40-230) with a single-process
engine around jitted, shape-bucketed programs:

  - LLM generate: one compilation per (prompt-bucket, head_num); decode loop
    is a device-side while_loop (no host round trips per token).
  - Flow: one compilation per token-count bucket (the XLA answer to the
    reference's TensorRT shape-profile engine, SURVEY §2.12 item 4).
  - HiFT: one compilation per mel-length bucket.

Metrics (TPS/RTF) follow the reference definitions
(infer_speech_model.py:563-604): tps = tokens / llm_time,
rtf = total_time / (samples / sample_rate).
"""

from __future__ import annotations

import dataclasses
import logging
import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import HydraVoxConfig, SamplingConfig
from ..models import flow as flow_model
from ..models import hift as hift_model
from ..models import llm as llm_model
from ..ops.sampling import SamplingParams

logger = logging.getLogger("hydravox.engine")


def _bucket(n: int, buckets) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


PROMPT_BUCKETS = (32, 64, 128, 256, 512, 1024)
TOKEN_BUCKETS = (64, 128, 256, 512, 1024)
MEL_BUCKETS = (128, 256, 512, 1024, 2048)


@dataclasses.dataclass
class SynthesisResult:
    audio: np.ndarray  # (T,) float32 at cfg.sample_rate
    speech_tokens: np.ndarray
    llm_time: float
    flow_time: float
    hift_time: float
    total_time: float
    tps: float
    rtf: float
    steps: int


class Engine:
    """Holds params + jit caches for the three-model pipeline."""

    def __init__(
        self,
        cfg: HydraVoxConfig,
        llm_params,
        flow_params,
        hift_params,
        max_tokens: int = 1024,
        prompt_buckets=PROMPT_BUCKETS,
        token_buckets=TOKEN_BUCKETS,
        mel_buckets=MEL_BUCKETS,
    ):
        self.cfg = cfg
        self.llm_params = llm_params
        self.flow_params = flow_params
        self.hift_params = hift_params
        self.max_tokens = max_tokens
        self.prompt_buckets = prompt_buckets
        self.token_buckets = token_buckets
        self.mel_buckets = mel_buckets
        self._gen_cache = {}
        self._flow_cache = {}
        self._hift_cache = {}
        self._rng = jax.random.PRNGKey(int(time.time()))

    # -- jit-cached stages ---------------------------------------------------

    def _generate_fn(self, prompt_bucket: int, head_num: int):
        key = (prompt_bucket, head_num)
        if key not in self._gen_cache:
            cfg = self.cfg.llm

            @partial(jax.jit, static_argnames=())
            def fn(params, rng, prompt_embeds, prompt_len, min_len, max_len, sampling):
                return llm_model.generate(
                    params, cfg, rng, prompt_embeds, prompt_len, min_len, max_len,
                    sampling, inference_head_num=head_num, max_tokens=self.max_tokens,
                    cache_len_cap=prompt_bucket + self.max_tokens + head_num,
                )

            self._gen_cache[key] = fn
        return self._gen_cache[key]

    def _flow_fn(self, token_bucket: int, prompt_mel_bucket: int):
        key = (token_bucket, prompt_mel_bucket)
        if key not in self._flow_cache:
            cfg = self.cfg.flow

            @jax.jit
            def fn(params, token, token_valid, prompt_feat, prompt_mel_len, embedding):
                return flow_model.inference(
                    params, cfg, token, token_valid, prompt_feat, prompt_mel_len, embedding
                )

            self._flow_cache[key] = fn
        return self._flow_cache[key]

    def _hift_fn(self, mel_bucket: int):
        if mel_bucket not in self._hift_cache:
            cfg = self.cfg.hift

            @jax.jit
            def fn(params, mel, rng):
                return hift_model.inference(params, cfg, mel, rng)

            self._hift_cache[mel_bucket] = fn
        return self._hift_cache[mel_bucket]

    # -- pipeline ------------------------------------------------------------

    def next_rng(self):
        self._rng, out = jax.random.split(self._rng)
        return out

    def synthesize(
        self,
        text_tokens: np.ndarray,  # (Lt,) int32: prompt_text + tts_text tokens
        tts_text_len: int,  # length of the tts portion (min/max len base)
        sampling: Optional[SamplingConfig] = None,
        inference_head_num: Optional[int] = None,
        prompt_speech_tokens: Optional[np.ndarray] = None,  # (Lp,)
        prompt_mel: Optional[np.ndarray] = None,  # (Lm, 80)
        spk_embedding: Optional[np.ndarray] = None,  # (192,)
        speed: float = 1.0,
        rng: Optional[jax.Array] = None,
        max_token_text_ratio: float = 20.0,
        min_token_text_ratio: float = 2.0,
    ) -> SynthesisResult:
        """Single-utterance synthesis (reference inference_tts /
        inference_zero_shot, infer_speech_model.py:523-689)."""
        t_start = time.time()
        cfg = self.cfg
        sampling = sampling or cfg.tts_sampling
        head_num = inference_head_num or cfg.llm.inference_head_num
        rng = rng if rng is not None else self.next_rng()
        prompt_speech_tokens = (
            np.zeros((0,), np.int32) if prompt_speech_tokens is None else prompt_speech_tokens
        )
        if spk_embedding is None:
            spk_embedding = np.zeros((192,), np.float32)

        # ---- LLM ----
        lt = len(text_tokens)
        lp = len(prompt_speech_tokens)
        raw_len = 2 + lt + lp
        pbucket = _bucket(raw_len, self.prompt_buckets)

        # assemble prompt embeds at bucket size
        text_pad = np.zeros((pbucket - 2 - lp,), np.int32)
        text_pad[:lt] = text_tokens
        emb, plen = llm_model.build_inference_prompt(
            self.llm_params, cfg.llm,
            jnp.asarray(text_pad), jnp.int32(lt),
            jnp.asarray(prompt_speech_tokens, jnp.int32), jnp.int32(lp),
        )
        min_len = int(tts_text_len * min_token_text_ratio)
        max_len = min(int(tts_text_len * max_token_text_ratio), self.max_tokens)

        sp = SamplingParams.make(sampling.top_p, sampling.top_k, sampling.win_size, sampling.tau_r)
        t0 = time.time()
        gen = self._generate_fn(pbucket, head_num)
        res = gen(self.llm_params, rng, emb, plen, jnp.int32(min_len), jnp.int32(max_len), sp)
        n_tok = int(res.num_tokens)
        steps = int(res.steps)
        tokens = np.asarray(res.tokens[:n_tok])
        llm_time = time.time() - t0

        # ---- Flow ----
        t0 = time.time()
        all_tokens = np.concatenate([np.asarray(prompt_speech_tokens, np.int32), tokens])
        n_all = len(all_tokens)
        tbucket = _bucket(max(n_all, 1), self.token_buckets)
        tok_pad = np.zeros((1, tbucket), np.int32)
        tok_pad[0, :n_all] = all_tokens
        valid = np.zeros((1, tbucket), bool)
        valid[0, :n_all] = True

        if prompt_mel is not None and len(prompt_mel) > 0:
            lm = len(prompt_mel)
            pm_bucket = _bucket(lm, self.mel_buckets)
            pm = np.zeros((1, pm_bucket, cfg.flow.output_size), np.float32)
            pm[0, :lm] = prompt_mel
            prompt_mel_len = lm
        else:
            pm = np.zeros((1, 0, cfg.flow.output_size), np.float32)
            pm_bucket, prompt_mel_len = 0, 0

        flow_fn = self._flow_fn(tbucket, pm_bucket)
        mel_full = flow_fn(
            self.flow_params, jnp.asarray(tok_pad), jnp.asarray(valid),
            jnp.asarray(pm), jnp.int32(prompt_mel_len),
            jnp.asarray(spk_embedding, jnp.float32)[None],
        )
        r = cfg.flow.token_mel_ratio
        mel = np.asarray(mel_full)[:, :, prompt_mel_len : n_all * r]  # (1, 80, Tm)
        flow_time = time.time() - t0

        # speed adjustment by linear interp (infer_speech_model.py:586-587)
        if speed != 1.0 and mel.shape[2] > 0:
            new_t = max(1, int(mel.shape[2] / speed))
            src = np.linspace(0, mel.shape[2] - 1, new_t)
            lo = np.floor(src).astype(int)
            hi = np.minimum(lo + 1, mel.shape[2] - 1)
            w = src - lo
            mel = mel[:, :, lo] * (1 - w) + mel[:, :, hi] * w
            mel = mel.astype(np.float32)

        # ---- HiFT ----
        t0 = time.time()
        tm = mel.shape[2]
        mbucket = _bucket(max(tm, 1), self.mel_buckets)
        mel_pad = np.concatenate(
            [mel, np.repeat(mel[:, :, -1:] if tm else np.zeros((1, 80, 1), np.float32),
                            mbucket - tm, axis=2)], axis=2
        ) if tm < mbucket else mel[:, :, :mbucket]
        hift_fn = self._hift_fn(mbucket)
        wav = hift_fn(self.hift_params, jnp.asarray(mel_pad), rng)
        wav = np.asarray(wav)[0, : tm * cfg.hift.upsample_scale]
        hift_time = time.time() - t0

        total = time.time() - t_start
        dur = len(wav) / cfg.sample_rate if len(wav) else 1e-9
        result = SynthesisResult(
            audio=wav.astype(np.float32),
            speech_tokens=tokens,
            llm_time=llm_time,
            flow_time=flow_time,
            hift_time=hift_time,
            total_time=total,
            tps=n_tok / llm_time if llm_time > 0 else 0.0,
            rtf=total / dur,
            steps=steps,
        )
        logger.info(
            "synth: %d tokens in %d steps, tps=%.1f rtf=%.4f (llm %.3fs flow %.3fs hift %.3fs)",
            n_tok, steps, result.tps, result.rtf, llm_time, flow_time, hift_time,
        )
        return result
