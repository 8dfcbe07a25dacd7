"""Inference engine: the end-to-end TTS pipeline with shape bucketing.

Replaces the reference's per-GPU worker process + ModelManager
(server/worker.py:25-137, infer_speech_model.py:40-230) with a single-process
engine around jitted, shape-bucketed programs:

  - Stage 1 (one jitted program per (text-bucket, prompt-bucket, heads)):
    prompt embedding assembly + KV-cache prefill + the whole multi-head
    decode while_loop.  No host round-trips per token.
  - Stage 2 (one program per (token-bucket, prompt-mel-bucket)): speech
    tokens -> flow 10-step CFM -> HiFT vocoder, fused — the mel never
    leaves the device (the XLA answer to the reference's TRT engine +
    separate vocoder launch, SURVEY §2.12 items 4-5).
    Only the final waveform transfers to host.

Metrics (TPS/RTF) follow the reference definitions
(infer_speech_model.py:563-604): tps = tokens / llm_time,
rtf = total_time / (samples / sample_rate).
"""

from __future__ import annotations

import dataclasses
import logging
import time
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
TOKEN_BUCKETS = (32, 64, 128, 256, 512, 1024)
MEL_BUCKETS = (128, 256, 512, 1024, 2048)
# Finer ladder for the flow+HiFT stage only: synthesis cost is linear in the
# padded bucket (10 CFM steps + vocoder over every padded frame), so the
# coarse x2 ladder wastes up to 2x synth compute when a realized token count
# lands just over a boundary (e.g. 132 -> 256).  Decode and streaming keep
# the coarse TOKEN_BUCKETS: their programs are cheap per shape but numerous
# (chunk ladders), so fewer shapes wins there.
SYNTH_BUCKETS = (32, 64, 96, 128, 160, 192, 256, 384, 512, 768, 1024)


@dataclasses.dataclass
class SynthesisResult:
    audio: np.ndarray  # (T,) float32 at cfg.sample_rate
    speech_tokens: np.ndarray
    llm_time: float
    synth_time: float  # fused flow+hift
    total_time: float
    tps: float
    rtf: float
    steps: int
    # kept for logging parity with the reference's stage breakdown
    flow_time: float = 0.0
    hift_time: float = 0.0
    # spec_decode mode only: drafts accepted / drafts proposed (else -1)
    spec_acceptance: float = -1.0


class Engine:
    """Holds params + jit caches for the fused two-stage pipeline."""

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
        synth_buckets=None,
        mesh=None,
        quantize: str | None = None,
        fused: bool = True,
        fused_est_ratio: float = 6.0,
        spec_decode: bool = False,
    ):
        """`mesh`: optional jax.sharding.Mesh for multi-chip serving — params
        replicate across the mesh and flash-batch rows shard over its 'data'
        axis (the TPU-native replacement for the reference's
        one-replica-per-GPU worker pool, server/worker.py:25-31; here the
        replicas are batch rows of one jitted program and XLA keeps each
        utterance's decode local to its shard).

        `quantize`: None (bf16, default) or "int8" — weight-only int8 for the
        HBM-bound LLM decode (ops/quant.py; ~1.3x faster decode steps on v5e,
        +14% more with the Pallas kernel's cache wins on long prefixes).
        Flow/HiFT stay bf16/f32: their matmuls are batch-amortized, not
        weight-streaming-bound.

        `fused`: single-dispatch synthesis (LLM+flow+HiFT one program, one
        packed transfer — saves a host round-trip per utterance; ~30 ms over
        the tunnel).  `fused_est_ratio`: speech-tokens-per-text-token estimate
        used to bucket the fused program's flow stage (overestimate wastes
        flow compute, underestimate falls back to a two-stage redispatch).

        `spec_decode`: decodes run self-speculative MTP verification — heads
        1..K-1 draft, head 0 verifies, output distribution EXACTLY equals
        heads=1 sequential decoding (the reference's highest-fidelity mode)
        at up-to-K tokens per block forward.  Covers single-utterance
        (llm.generate_speculative), streaming (generate_spec_until), and
        flash-batch (generate_batched_speculative — rows verify
        independently with per-row cache lengths).  The continuous batcher
        keeps blind-MTP slots (fixed hop scheduling assumes a constant
        tokens-per-step)."""
        self.cfg = cfg
        self.mesh = mesh
        self.quantize = quantize
        self.fused = fused
        self.fused_est_ratio = fused_est_ratio
        self.spec_decode = spec_decode
        # dtype policy for hot-reloaded LLM weights (set_llm_params): follow
        # whatever the engine was constructed with (bf16 in serving, f32 in
        # CPU tests), captured before any quantization rewrites the tree
        try:
            self._llm_dtype = llm_params["backbone"]["embed_tokens"].dtype
        except (KeyError, TypeError, AttributeError):
            self._llm_dtype = jnp.bfloat16
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(mesh, P())
            llm_params = jax.device_put(llm_params, repl)
            flow_params = jax.device_put(flow_params, repl)
            hift_params = jax.device_put(hift_params, repl)
        self.llm_params = self._prepare_llm_params(llm_params)
        self.flow_params = flow_params
        self.hift_params = hift_params
        self.max_tokens = max_tokens
        self.prompt_buckets = prompt_buckets
        self.token_buckets = token_buckets
        self.mel_buckets = mel_buckets
        # synth ladder defaults to the fine SYNTH_BUCKETS when the caller
        # kept the default coarse token ladder; tests that pass custom tiny
        # token_buckets get the same values for both unless they say otherwise
        if synth_buckets is None:
            synth_buckets = (SYNTH_BUCKETS if token_buckets == TOKEN_BUCKETS
                             else token_buckets)
        self.synth_buckets = synth_buckets
        self._gen_cache = {}
        self._synth_cache = {}
        # (batch, token_bucket, pm_bucket, sp_bucket) batch-synth shapes that
        # have EXECUTED (prewarm or traffic): the grouped-synth planner only
        # routes rows onto shapes that can't trigger a cold XLA compile
        # mid-request (a cold batch-synth compile measured 123 s on the
        # remote compiler — worse than any padding waste it could save)
        self._warm_group_shapes = set()
        # strict_shapes: set True after a serving prewarm — the grouped-synth
        # planner then NEVER routes a batch onto an unexecuted shape (pads
        # onto warmer buckets instead of compiling mid-traffic)
        self.strict_shapes = False
        self._streaming = None
        self._rng = jax.random.PRNGKey(int(time.time()))
        import threading as _threading

        self._rng_lock = _threading.Lock()

    # -- param policy --------------------------------------------------------

    def _prepare_llm_params(self, params):
        if self.quantize == "int8":
            from ..ops.quant import quantize_llm_params

            return jax.jit(quantize_llm_params)(params)
        if self.quantize not in (None, "", "none", "bf16"):
            raise ValueError(f"unknown quantize mode {self.quantize!r}")
        return params

    def set_llm_params(self, params):
        """Hot-reload entry (POST /load_pt): re-applies dtype/quantize policy.
        Jitted programs close over nothing — next calls pick up the new tree."""
        params = jax.tree.map(lambda a: jnp.asarray(a, self._llm_dtype), params)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            params = jax.device_put(params, NamedSharding(self.mesh, P()))
        self.llm_params = self._prepare_llm_params(params)

    # -- bucket helpers ------------------------------------------------------

    def _bucket_prompt(self, n: int) -> int:
        return _bucket(n, self.prompt_buckets)

    def _estimate_token_bucket(self, tts_text_len: int, min_len: int,
                               max_len: int, flow_prompt_len: int) -> int:
        """Token bucket for the fused program's flow stage, estimated before
        the realized token count exists (see _fused_fn)."""
        est = min(max_len, max(min_len, int(tts_text_len * self.fused_est_ratio)))
        return _bucket(max(flow_prompt_len + est, 1), self.synth_buckets)

    def _bucket_token(self, n: int) -> int:
        return _bucket(n, self.token_buckets)

    def _bucket_synth(self, n: int) -> int:
        return _bucket(n, self.synth_buckets)

    def register_warm_batch_synth(self, batch: int, token_bucket: int,
                                  pm_bucket: int, sp_bucket: int) -> None:
        """Mark a batch-synth shape as executed (compile done) — the grouped
        planner will consider it from now on."""
        self._warm_group_shapes.add((batch, token_bucket, pm_bucket, sp_bucket))

    def _bucket_mel(self, n: int) -> int:
        return _bucket(n, self.mel_buckets)

    # -- jit-cached stages ---------------------------------------------------

    def _decode_body(self, cfg, rng, emb, plen, min_len, max_len, sampling,
                     head_num: int, cache_cap: int, params):
        """Traceable single-utterance decode: blind-MTP group commit
        (default, the reference's MTP mode) or self-speculative verification
        (spec_decode=True, exact heads=1 distribution).  Returns
        (GenerateResult, (2,) int32 [accepted, drafted] — zeros when not
        speculating) so callers pack one extra pair into the host transfer."""
        if self.spec_decode and head_num >= 2:
            spec = llm_model.generate_speculative(
                params, cfg, rng, emb, plen, min_len, max_len, sampling,
                num_heads=head_num, max_tokens=self.max_tokens,
                cache_len_cap=cache_cap,
            )
            return spec.result, jnp.stack([spec.accepted, spec.drafted])
        res = llm_model.generate(
            params, cfg, rng, emb, plen, min_len, max_len, sampling,
            inference_head_num=head_num, max_tokens=self.max_tokens,
            cache_len_cap=cache_cap,
        )
        return res, jnp.zeros((2,), jnp.int32)

    def _generate_fn(self, text_bucket: int, sp_bucket: int, head_num: int):
        """Jitted: text tokens + prompt speech tokens -> GenerateResult."""
        key = (text_bucket, sp_bucket, head_num)
        if key not in self._gen_cache:
            cfg = self.cfg.llm
            cache_cap = 2 + text_bucket + sp_bucket + self.max_tokens + head_num

            def fn(params, rng, text_tokens, text_len, sp_tokens, sp_len,
                   min_len, max_len, sampling):
                emb, plen = llm_model.build_inference_prompt(
                    params, cfg, text_tokens, text_len, sp_tokens, sp_len
                )
                res, spec_meta = self._decode_body(
                    cfg, rng, emb, plen, min_len, max_len, sampling,
                    head_num, cache_cap, params,
                )
                # (tokens, [acc, drafted], num, steps) packed into one int32
                # buffer: the host reads everything in ONE transfer (each
                # tunnel round-trip costs ~30 ms); tokens also stay
                # device-resident for stage 2.  num/steps stay the LAST two
                # entries so meta[-2]/meta[-1] parsing is mode-independent.
                packed = jnp.concatenate(
                    [res.tokens, spec_meta,
                     jnp.stack([res.num_tokens, res.steps])]
                )
                return res, packed

            self._gen_cache[key] = jax.jit(fn)
        return self._gen_cache[key]

    def _synth_body(self, token_bucket: int, pm_bucket: int, sp_bucket: int):
        """Traceable flow+hift body shared by the two-stage and fused paths.

        tokens: (max_tokens+,) generated buffer (device-resident)
        num: scalar count; sp_tokens: (sp_bucket,) prompt speech tokens.
        Returns (wav_i16 (1, token_bucket*ratio*upsample), mel (1, 80, t_mel))."""
        fcfg, hcfg = self.cfg.flow, self.cfg.hift
        ratio = fcfg.token_mel_ratio
        t_mel = token_bucket * ratio

        def fn(flow_params, hift_params, tokens, num, sp_tokens, sp_len,
               prompt_mel, pm_len, embedding, rng):
            pos = jnp.arange(token_bucket)
            gen_idx = jnp.clip(pos - sp_len, 0, tokens.shape[0] - 1)
            sp_idx = jnp.clip(pos, 0, max(sp_bucket - 1, 0))
            if sp_bucket > 0:
                seq = jnp.where(pos < sp_len, sp_tokens[sp_idx], tokens[gen_idx])
            else:
                seq = tokens[gen_idx]
            n_all = sp_len + num
            valid = pos < n_all

            mel = flow_model.inference(
                flow_params, fcfg, seq[None], valid[None],
                prompt_mel, pm_len, embedding,
            )  # (1, 80, t_mel) f32, includes prompt region

            # drop the prompt-mel region with a dynamic-start slice
            mel_pad = jnp.pad(mel, ((0, 0), (0, 0), (0, pm_bucket)))
            mel_gen = jax.lax.dynamic_slice(
                mel_pad, (0, 0, pm_len), (1, 80, t_mel)
            )
            # edge-replicate past the valid end so the f0 convs near the
            # boundary see plausible context instead of masked garbage
            n_frames = num * ratio
            frame = jnp.arange(t_mel)
            src = jnp.minimum(frame, jnp.maximum(n_frames - 1, 0))
            mel_gen = mel_gen[:, :, src]

            wav = hift_model.inference(hift_params, hcfg, mel_gen, rng)
            # int16 PCM halves the host transfer (quantization matches the
            # WAV output the server emits anyway)
            wav_i16 = (jnp.clip(wav, -1.0, 1.0) * 32767.0).astype(jnp.int16)
            return wav_i16, mel_gen

        return fn

    def _synth_fn(self, token_bucket: int, pm_bucket: int, sp_bucket: int):
        """Jitted fused flow+hift: device token buffer -> waveform."""
        key = (token_bucket, pm_bucket, sp_bucket)
        if key not in self._synth_cache:
            self._synth_cache[key] = jax.jit(
                self._synth_body(token_bucket, pm_bucket, sp_bucket)
            )
        return self._synth_cache[key]

    def _fused_fn(self, text_bucket: int, sp_bucket: int, fsp_bucket: int,
                  head_num: int, token_bucket: int, pm_bucket: int):
        """Jitted single-dispatch synthesis: LLM decode + flow + HiFT in ONE
        device program with ONE packed host transfer.

        The two-stage path needs a host round-trip between decode and synth
        (to bucket stage 2 by the realized token count); over the v5e tunnel
        each round-trip costs ~30 ms.  Here stage 2 runs at a host-estimated
        `token_bucket`; the packed result carries wav + tokens + counts, and
        the caller falls back to a correctly-bucketed stage-2 redispatch on
        the (device-resident) tokens only when the estimate was too small.

        sp_bucket: LLM prefix speech tokens; fsp_bucket: flow prompt tokens
        (they differ in cross-lingual/instruct2 modes, cli/frontend.py:186-209).
        Returns (GenerateResult, packed int32
        (t_wav//2 + max_tokens + 2 + 2,)): wav32, tokens, [accepted, drafted]
        spec pair (zeros when not speculating), then num and steps LAST —
        parse counts with meta[-2:]/meta[-4:-2], never positive offsets."""
        key = ("fused", text_bucket, sp_bucket, fsp_bucket, head_num,
               token_bucket, pm_bucket)
        if key not in self._gen_cache:
            cfg = self.cfg.llm
            cache_cap = 2 + text_bucket + sp_bucket + self.max_tokens + head_num
            synth_body = self._synth_body(token_bucket, pm_bucket, fsp_bucket)

            def fn(llm_params, flow_params, hift_params, rng,
                   text_tokens, text_len, sp_tokens, sp_len,
                   fsp_tokens, fsp_len, min_len, max_len, sampling,
                   prompt_mel, pm_len, embedding):
                emb, plen = llm_model.build_inference_prompt(
                    llm_params, cfg, text_tokens, text_len, sp_tokens, sp_len
                )
                res, spec_meta = self._decode_body(
                    cfg, rng, emb, plen, min_len, max_len, sampling,
                    head_num, cache_cap, llm_params,
                )
                wav_i16, _ = synth_body(
                    flow_params, hift_params, res.tokens, res.num_tokens,
                    fsp_tokens, fsp_len, prompt_mel, pm_len, embedding, rng,
                )
                # pack wav (int16 pairs bitcast to int32) + tokens + counts
                # into one buffer -> a single tunnel transfer
                wav32 = jax.lax.bitcast_convert_type(
                    wav_i16.reshape(-1, 2), jnp.int32
                ).reshape(-1)
                packed = jnp.concatenate(
                    [wav32, res.tokens, spec_meta,
                     jnp.stack([res.num_tokens, res.steps])]
                )
                return res, packed

            self._gen_cache[key] = jax.jit(fn)
        return self._gen_cache[key]

    def _batch_decode_body(self, cfg, rng, emb, plen, min_len, max_len,
                           sampling, head_num: int, cache_cap: int, params,
                           batch: int):
        """Traceable flash-batch decode: blind-MTP group commit (default) or
        per-row speculative verification (spec_decode=True — see _decode_body;
        rows verify independently, generate_batched_speculative).  Returns
        (GenerateResult, (B, 2) int32 [accepted, drafted] — batch totals
        broadcast per row, zeros when not speculating)."""
        if self.spec_decode and head_num >= 2:
            spec = llm_model.generate_batched_speculative(
                params, cfg, rng, emb, plen, min_len, max_len, sampling,
                num_heads=head_num, max_tokens=self.max_tokens,
                cache_len_cap=cache_cap,
            )
            meta = jnp.broadcast_to(
                jnp.stack([spec.accepted, spec.drafted]), (batch, 2)
            )
            return spec.result, meta
        res = llm_model.generate_batched(
            params, cfg, rng, emb, plen, min_len, max_len, sampling,
            inference_head_num=head_num, max_tokens=self.max_tokens,
            cache_len_cap=cache_cap,
        )
        return res, jnp.zeros((batch, 2), jnp.int32)

    def _batch_gen_fn(self, batch: int, text_bucket: int, sp_bucket: int, head_num: int):
        """Jitted batched generate — the 'flash batch' decode."""
        key = ("batch", batch, text_bucket, sp_bucket, head_num)
        if key not in self._gen_cache:
            cfg = self.cfg.llm
            cache_cap = 2 + text_bucket + sp_bucket + self.max_tokens + head_num

            def fn(params, rng, text_tokens, text_len, sp_tokens, sp_len,
                   min_len, max_len, sampling):
                # sp_tokens (B, sp_bucket) / sp_len (B,): per-row zero-shot
                # prompts batch together
                emb, plen = jax.vmap(
                    lambda tt, tl, st, sl: llm_model.build_inference_prompt(
                        params, cfg, tt, tl, st, sl
                    )
                )(text_tokens, text_len, sp_tokens, sp_len)
                res, spec_meta = self._batch_decode_body(
                    cfg, rng, emb, plen, min_len, max_len, sampling,
                    head_num, cache_cap, params, batch,
                )
                # num/steps stay the LAST two columns (meta[:, -2:] parsing)
                packed = jnp.concatenate(
                    [
                        res.tokens,
                        spec_meta,
                        res.num_tokens[:, None],
                        jnp.full((batch, 1), res.steps, jnp.int32),
                    ],
                    axis=1,
                )
                return res, packed

            self._gen_cache[key] = jax.jit(fn)
        return self._gen_cache[key]

    def _batch_synth_body(self, batch: int, token_bucket: int, pm_bucket: int,
                          sp_bucket: int):
        """Traceable batched flow+hift body, used by both the two-stage and
        fused batch paths.  Prompts are PER ROW — sp_tokens (B, sp_bucket),
        sp_len (B,), prompt_mel (B, pm_bucket, 80), pm_len (B,) — so zero-shot
        requests with different prompt speakers batch together (beyond the
        reference, which runs zero-shot one request per GPU worker)."""
        fcfg, hcfg = self.cfg.flow, self.cfg.hift
        ratio = fcfg.token_mel_ratio
        t_mel = token_bucket * ratio

        def fn(flow_params, hift_params, tokens, num, sp_tokens, sp_len,
               prompt_mel, pm_len, embedding, rng):
            # tokens: (B, max_tokens+), num: (B,)
            pos = jnp.arange(token_bucket)[None, :]  # (1, T)
            spl = sp_len[:, None]  # (B, 1)
            gen_idx = jnp.clip(pos - spl, 0, tokens.shape[1] - 1)
            if sp_bucket > 0:
                sp_idx = jnp.broadcast_to(
                    jnp.clip(pos, 0, sp_bucket - 1), (batch, token_bucket)
                )
                seq = jnp.where(
                    pos < spl, jnp.take_along_axis(sp_tokens, sp_idx, axis=1),
                    jnp.take_along_axis(tokens, gen_idx, axis=1),
                )
            else:
                seq = jnp.take_along_axis(tokens, gen_idx, axis=1)
            valid = pos < (sp_len + num)[:, None]

            emb_b = jnp.broadcast_to(embedding, (batch, embedding.shape[-1]))
            mel = flow_model.inference(
                flow_params, fcfg, seq, valid, prompt_mel, pm_len, emb_b,
            )  # (B, 80, t_mel)

            # drop each row's own prompt-mel prefix (per-row offset gather)
            mel_pad = jnp.pad(mel, ((0, 0), (0, 0), (0, pm_bucket)))
            idx = pm_len[:, None] + jnp.arange(t_mel)[None, :]  # (B, t_mel)
            mel_gen = jnp.take_along_axis(mel_pad, idx[:, None, :], axis=2)
            n_frames = (num * ratio)[:, None]
            frame = jnp.arange(t_mel)[None, :]
            src = jnp.minimum(frame, jnp.maximum(n_frames - 1, 0))
            mel_gen = jnp.take_along_axis(mel_gen, src[:, None, :], axis=2)

            wav = hift_model.inference(hift_params, hcfg, mel_gen, rng)
            return (jnp.clip(wav, -1.0, 1.0) * 32767.0).astype(jnp.int16)

        return fn

    def _batch_synth_fn(self, batch: int, token_bucket: int, pm_bucket: int, sp_bucket: int):
        """Jitted batched flow+hift (shared prompt/speaker across rows)."""
        key = ("batch", batch, token_bucket, pm_bucket, sp_bucket)
        if key not in self._synth_cache:
            self._synth_cache[key] = jax.jit(
                self._batch_synth_body(batch, token_bucket, pm_bucket, sp_bucket)
            )
        return self._synth_cache[key]

    # per-extra-dispatch overhead in padded-bucket-row units: ~30 ms host RTT
    # and queueing vs ~0.28 ms of flow+HiFT per bucket-row at full model size
    _GROUP_DISPATCH_OVERHEAD = 160
    # a cold batch-synth XLA compile measured 123 s on the remote compiler —
    # dominate every padding tradeoff when a warm plan exists
    _COLD_COMPILE_PENALTY = 1_000_000

    def _plan_synth_groups(self, n_alls, pm_bucket: int, sp_bucket: int):
        """Split a flash batch's rows into <=2 length-sorted synth groups so
        short rows skip the long rows' padded flow+HiFT frames.

        Only shapes that have already EXECUTED (self._warm_group_shapes) are
        candidates — a cold batch-synth XLA compile mid-request (measured
        123 s on the remote compiler) dwarfs any padding it could save.  The
        baseline is the single full-batch dispatch at the realized max
        bucket.  Cost model: padded_batch x bucket (flow+HiFT cost is linear
        in both).  Returns [(row_indices, padded_batch, bucket), ...] or None
        for the baseline."""
        bsz = len(n_alls)
        n_alls = np.asarray(n_alls)
        warm = [k for k in self._warm_group_shapes
                if k[2] == pm_bucket and k[3] == sp_bucket]
        if not warm:
            return None
        order = np.argsort(n_alls, kind="stable")

        def shape_for(gsz: int, n_max: int):
            cands = [(b, t) for (b, t, _p, _s) in warm if b >= gsz and t >= n_max]
            return min(cands, key=lambda c: c[0] * c[1]) if cands else None

        base_bkt = _bucket(max(int(n_alls.max()), 1), self.synth_buckets)
        base = bsz * base_bkt
        if ((bsz, base_bkt, pm_bucket, sp_bucket) not in self._warm_group_shapes
                and self.strict_shapes):
            # strict (serving) mode: a cold compile mid-request stalls every
            # concurrent request for up to minutes — never cheaper than any
            # padding a warm plan costs.  Offline engines (strict off) take
            # the one-time compile when it wins on steady-state cost: it
            # amortizes and self-warms the shape for future batches.
            base += self._COLD_COMPILE_PENALTY
        best, best_cost = None, base
        for k in range(0, bsz):
            if k == 0:
                sa, lo, hi = None, order[:0], order
            else:
                lo, hi = order[:k], order[k:]
                sa = shape_for(len(lo), int(n_alls[lo].max()))
                if sa is None:
                    continue
            sb = shape_for(len(hi), int(n_alls[hi].max()))
            if sb is None:
                continue
            cost = sb[0] * sb[1]
            if k > 0:
                cost += sa[0] * sa[1] + self._GROUP_DISPATCH_OVERHEAD
            if cost < best_cost:
                best_cost = cost
                plan = [(tuple(int(i) for i in hi), sb[0], sb[1])]
                if k > 0:
                    plan.insert(0, (tuple(int(i) for i in lo), sa[0], sa[1]))
                best = plan
        if (best is not None and len(best) == 1
                and best[0][1:] == (bsz, base_bkt)):
            return None  # identical to the plain dispatch — skip the gathers
        return best

    def _fused_batch_fn(self, batch: int, text_bucket: int, sp_bucket: int,
                        head_num: int, token_bucket: int, pm_bucket: int,
                        fsp_bucket: int):
        """Jitted single-dispatch flash batch: batched decode + flow + HiFT in
        one program, one packed (B, t_wav//2 + max_tokens + 2 + 2) int32
        transfer — per row: wav32, tokens, [accepted, drafted], num, steps
        (see _fused_fn for the rationale, layout rule, and fallback contract).
        sp_* is the per-row LM prefix, fsp_* the per-row flow prompt (they
        differ in cross-lingual/instruct2 rows)."""
        key = ("fused_batch", batch, text_bucket, sp_bucket, head_num,
               token_bucket, pm_bucket, fsp_bucket)
        if key not in self._gen_cache:
            cfg = self.cfg.llm
            cache_cap = 2 + text_bucket + sp_bucket + self.max_tokens + head_num
            synth_body = self._batch_synth_body(batch, token_bucket, pm_bucket, fsp_bucket)

            def fn(llm_params, flow_params, hift_params, rng,
                   text_tokens, text_len, sp_tokens, sp_len,
                   min_len, max_len, sampling, fsp_tokens, fsp_len,
                   prompt_mel, pm_len, embedding):
                # per-row prompts (see _batch_gen_fn / _batch_synth_body)
                emb, plen = jax.vmap(
                    lambda tt, tl, st, sl: llm_model.build_inference_prompt(
                        llm_params, cfg, tt, tl, st, sl
                    )
                )(text_tokens, text_len, sp_tokens, sp_len)
                res, spec_meta = self._batch_decode_body(
                    cfg, rng, emb, plen, min_len, max_len, sampling,
                    head_num, cache_cap, llm_params, batch,
                )
                wav_i16 = synth_body(
                    flow_params, hift_params, res.tokens, res.num_tokens,
                    fsp_tokens, fsp_len, prompt_mel, pm_len, embedding, rng,
                )  # (B, t_wav)
                wav32 = jax.lax.bitcast_convert_type(
                    wav_i16.reshape(batch, -1, 2), jnp.int32
                ).reshape(batch, -1)
                packed = jnp.concatenate(
                    [
                        wav32,
                        res.tokens,
                        spec_meta,
                        res.num_tokens[:, None],
                        jnp.full((batch, 1), res.steps, jnp.int32),
                    ],
                    axis=1,
                )
                return res, packed

            self._gen_cache[key] = jax.jit(fn)
        return self._gen_cache[key]

    def synthesize_batch(
        self,
        text_tokens_list,  # list of (Lt_i,) int32 arrays (same speaker)
        sampling: Optional[SamplingConfig] = None,
        inference_head_num: Optional[int] = None,
        prompt_speech_tokens: Optional[np.ndarray] = None,
        prompt_mel: Optional[np.ndarray] = None,
        spk_embedding: Optional[np.ndarray] = None,
        rng: Optional[jax.Array] = None,
        max_token_text_ratio: float = 20.0,
        min_token_text_ratio: float = 2.0,
        tts_text_lens=None,  # per-row tts-portion lengths (min/max base);
        # None -> full text lengths (plain SFT rows have no prompt text)
        llm_prompt_speech_tokens="same",  # LM-prefix override, mirroring
        # synthesize(): "same" -> the flow prompt tokens; a per-row list
        # (entry None -> that row's flow prompt, empty -> no LM prefix,
        # cross-lingual/instruct2) or one shared array
    ):
        """Flash-batch synthesis: N utterances (e.g. long-text segments,
        infer_speech_model.py:357-455, or coalesced concurrent requests)
        decode and vocode together.  `spk_embedding` is (192,) shared across
        rows or (B, 192) per row; `prompt_speech_tokens` / `prompt_mel` are
        a single shared prompt OR a per-row list (entries may be None) — so
        zero-shot requests with DIFFERENT prompt speakers batch together,
        beyond the reference's one-request-per-worker serving.  Returns
        (list of wavs, stats dict)."""
        t_start = time.time()
        cfg = self.cfg
        sampling = sampling or cfg.tts_sampling
        head_num = inference_head_num or cfg.llm.inference_head_num
        rng = rng if rng is not None else self.next_rng()
        bsz = len(text_tokens_list)

        def _rows(x, dtype, empty_shape):
            if isinstance(x, (list, tuple)):
                assert len(x) == bsz, "per-row prompt list length != batch"
                return [np.zeros(empty_shape, dtype) if r is None or len(r) == 0
                        else np.asarray(r, dtype) for r in x]
            shared = (np.zeros(empty_shape, dtype) if x is None or len(x) == 0
                      else np.asarray(x, dtype))
            return [shared] * bsz

        flow_sp_rows = _rows(prompt_speech_tokens, np.int32, (0,))
        if isinstance(llm_prompt_speech_tokens, str):  # "same"
            sp_rows = flow_sp_rows
        elif isinstance(llm_prompt_speech_tokens, (list, tuple)):
            assert len(llm_prompt_speech_tokens) == bsz
            sp_rows = [
                flow_sp_rows[i] if e is None else np.asarray(e, np.int32).reshape(-1)
                for i, e in enumerate(llm_prompt_speech_tokens)
            ]
        else:
            arr = np.asarray(llm_prompt_speech_tokens, np.int32).reshape(-1)
            sp_rows = [arr] * bsz
        pm_rows = _rows(prompt_mel, np.float32, (0, cfg.flow.output_size))
        if spk_embedding is None:
            spk_embedding = np.zeros((192,), np.float32)
        elif isinstance(spk_embedding, (list, tuple)):
            spk_embedding = np.stack([np.asarray(e, np.float32) for e in spk_embedding])
        spk_embedding = np.asarray(spk_embedding, np.float32)
        emb_rows = (
            spk_embedding
            if spk_embedding.ndim == 2
            else spk_embedding[None]  # (1, 192): broadcast across rows
        )

        tbkt = _bucket(max(len(t) for t in text_tokens_list), self.prompt_buckets)
        if any(len(t) > tbkt for t in text_tokens_list):
            # degenerate unpunctuated input beyond the largest bucket:
            # truncate with a warning instead of crashing (the reference has
            # no shape caps and just runs the oversized prompt)
            logger.warning(
                "text rows longer than the largest prompt bucket %d truncated", tbkt
            )
            text_tokens_list = [t[:tbkt] for t in text_tokens_list]
        lts = [len(t) for t in text_tokens_list]
        tts_lens = (
            lts if tts_text_lens is None
            else [min(int(n), lt) for n, lt in zip(tts_text_lens, lts)]
        )
        lp_max = max(len(r) for r in sp_rows)
        sbkt = _bucket(lp_max, self.prompt_buckets) if lp_max else 0
        sp_rows = [r[:sbkt] for r in sp_rows]
        lps = np.asarray([len(r) for r in sp_rows], np.int32)
        lp = int(lps.max())
        # flow conditioning uses the FLOW prompt tokens, which may differ
        # from the LM prefix in cross-lingual/instruct2 rows (synthesize())
        flp_max = max(len(r) for r in flow_sp_rows)
        fsbkt = _bucket(flp_max, self.prompt_buckets) if flp_max else 0
        flow_sp_rows = [r[:fsbkt] for r in flow_sp_rows]
        flps = np.asarray([len(r) for r in flow_sp_rows], np.int32)
        text_pad = np.zeros((bsz, tbkt), np.int32)
        for i, t in enumerate(text_tokens_list):
            text_pad[i, : len(t)] = t
        sp_pad = np.zeros((bsz, sbkt), np.int32)
        for i, r in enumerate(sp_rows):
            sp_pad[i, : len(r)] = r
        fsp_pad = np.zeros((bsz, fsbkt), np.int32)
        for i, r in enumerate(flow_sp_rows):
            fsp_pad[i, : len(r)] = r
        min_lens = np.asarray([int(n * min_token_text_ratio) for n in tts_lens], np.int32)
        max_lens = np.asarray(
            [min(int(n * max_token_text_ratio), self.max_tokens) for n in tts_lens],
            np.int32,
        )
        sp = SamplingParams.make(sampling.top_p, sampling.top_k, sampling.win_size, sampling.tau_r)

        # multi-chip: shard batch rows over the mesh 'data' axis
        row_shard = None
        if self.mesh is not None and bsz % self.mesh.shape.get("data", 1) == 0:
            from jax.sharding import NamedSharding, PartitionSpec as P

            row_shard = lambda a: jax.device_put(  # noqa: E731
                jnp.asarray(a), NamedSharding(self.mesh, P("data", *([None] * (np.ndim(a) - 1))))
            )
        put_rows = row_shard if row_shard is not None else jnp.asarray

        lm_max = max(len(r) for r in pm_rows)
        if lm_max > 0:
            pm_bucket = _bucket(lm_max, self.mel_buckets)
            pm = np.zeros((bsz, pm_bucket, cfg.flow.output_size), np.float32)
            for i, r in enumerate(pm_rows):
                pm[i, : len(r)] = r[:pm_bucket]
            pm_lens = np.asarray(
                [min(len(r), pm_bucket) for r in pm_rows], np.int32
            )
        else:
            pm = np.zeros((bsz, 0, cfg.flow.output_size), np.float32)
            pm_bucket = 0
            pm_lens = np.zeros((bsz,), np.int32)

        ratio = cfg.flow.token_mel_ratio
        up = cfg.hift.upsample_scale

        # fused single-dispatch flash batch (see synthesize): one program,
        # one packed transfer; fallback redispatch when the bucket estimate
        # undershoots the realized max token count
        res = None
        wavs = None
        llm_time = 0.0
        # fused single-dispatch is latency-optimal when the token count is
        # (nearly) known — forced-ratio callers and small batches.  For
        # larger batches with a wide min/max window the pre-decode bucket
        # estimate overshoots the realized counts and flow+HiFT pay for every
        # padded frame across every row, so the two-stage path (decode, fetch
        # realized counts, synth at the tight bucket, optionally
        # length-grouped) wins despite its extra host round trip (~30 ms).
        est_tight = bool(np.all(max_lens <= np.maximum(min_lens, 1) * 2))
        if self.fused and (bsz < 4 or est_tight):
            tok_bkt = self._estimate_token_bucket(
                max(tts_lens), int(min_lens.max()), int(max_lens.max()), flp_max
            )
            t0 = time.time()
            fused = self._fused_batch_fn(bsz, tbkt, sbkt, head_num, tok_bkt,
                                         pm_bucket, fsbkt)
            res, packed = fused(
                self.llm_params, self.flow_params, self.hift_params, rng,
                put_rows(text_pad), put_rows(np.asarray(lts, np.int32)),
                put_rows(sp_pad), put_rows(lps),
                put_rows(min_lens), put_rows(max_lens), sp,
                put_rows(fsp_pad), put_rows(flps),
                put_rows(pm), put_rows(pm_lens),
                jnp.asarray(emb_rows),
            )
            buf = np.asarray(packed)  # the single transfer
            llm_time = time.time() - t0
            n32 = tok_bkt * ratio * up // 2
            meta = buf[:, n32:]
            nums = meta[:, -2]
            steps = int(meta[0, -1])
            if int((flps + nums).max()) <= tok_bkt:
                wav16 = np.ascontiguousarray(buf[:, :n32]).view(np.int16)
                wavs = [
                    wav16[i, : int(nums[i]) * ratio * up].astype(np.float32) / 32767.0
                    for i in range(bsz)
                ]

        if res is None:
            t0 = time.time()
            gen = self._batch_gen_fn(bsz, tbkt, sbkt, head_num)
            res, packed = gen(
                self.llm_params, rng, put_rows(text_pad),
                put_rows(np.asarray(lts, np.int32)), put_rows(sp_pad), put_rows(lps),
                put_rows(min_lens), put_rows(max_lens), sp,
            )
            meta = np.asarray(packed)  # one transfer: tokens + nums + steps
            nums = meta[:, -2]
            steps = int(meta[0, -1])
            llm_time = time.time() - t0

        t0 = time.time()
        synth_groups = None
        if wavs is None:
            n_alls = (flps + nums).astype(np.int64)
            plan = None
            if bsz >= 3 and row_shard is None:
                plan = self._plan_synth_groups(n_alls, pm_bucket, fsbkt)
            if plan is not None:
                # length-grouped synth: short rows skip the long rows' padded
                # frames.  All dispatches are queued before the first fetch so
                # the device pipelines the groups.
                # NOTE: tokens are identical either way, but the synthesis is
                # SAMPLE-equivalent, not bit-identical, to the ungrouped
                # dispatch — vocoder/CFM noise is drawn from the same rng
                # over a different batch shape, so which plan the warm-shape
                # planner picks changes the noise realization (never the
                # distribution).
                emb_full = (emb_rows if emb_rows.shape[0] == bsz else
                            np.broadcast_to(emb_rows, (bsz, emb_rows.shape[-1])))
                pending = []
                for rows_idx, g_b, g_bkt in plan:
                    pad = [rows_idx[-1]] * (g_b - len(rows_idx))
                    idx_np = np.asarray(list(rows_idx) + pad, np.int32)
                    idx_dev = jnp.asarray(idx_np)
                    synth = self._batch_synth_fn(g_b, g_bkt, pm_bucket, fsbkt)
                    wav_dev = synth(
                        self.flow_params, self.hift_params,
                        jnp.take(res.tokens, idx_dev, axis=0),
                        jnp.take(res.num_tokens, idx_dev, axis=0),
                        jnp.asarray(fsp_pad[idx_np]), jnp.asarray(flps[idx_np]),
                        jnp.asarray(pm[idx_np]), jnp.asarray(pm_lens[idx_np]),
                        jnp.asarray(emb_full[idx_np]), rng,
                    )
                    pending.append((rows_idx, g_b, g_bkt, wav_dev))
                wavs = [None] * bsz
                for rows_idx, g_b, g_bkt, wav_dev in pending:
                    w_np = np.asarray(wav_dev).astype(np.float32) / 32767.0
                    for j, i_row in enumerate(rows_idx):
                        wavs[i_row] = w_np[j, : int(nums[i_row]) * ratio * up]
                    self.register_warm_batch_synth(g_b, g_bkt, pm_bucket, fsbkt)
                synth_groups = [(len(g), b, t) for g, b, t in plan]
            else:
                tok_bkt = _bucket(max(int(n_alls.max()), 1), self.synth_buckets)
                if (self.strict_shapes
                        and (bsz, tok_bkt, pm_bucket, fsbkt)
                        not in self._warm_group_shapes):
                    # strict mode promises no mid-traffic compiles, but no
                    # warm shape covers this realized batch (typically a
                    # zero-shot pm_bucket the prewarm ladder didn't visit) —
                    # the baseline dispatch below may cold-compile (~123 s).
                    # Surface it so operators extend the prewarm instead of
                    # debugging a one-off stall.
                    logger.warning(
                        "strict_shapes: no warm batch-synth shape covers "
                        "(batch=%d, bucket=%d, pm=%d, sp=%d); dispatching a "
                        "possibly-cold baseline — extend prewarm to this "
                        "shape", bsz, tok_bkt, pm_bucket, fsbkt)
                synth = self._batch_synth_fn(bsz, tok_bkt, pm_bucket, fsbkt)
                wav_dev = synth(
                    self.flow_params, self.hift_params, res.tokens, res.num_tokens,
                    put_rows(fsp_pad), put_rows(flps), put_rows(pm), put_rows(pm_lens),
                    jnp.asarray(emb_rows), rng,
                )
                wavs_np = np.asarray(wav_dev).astype(np.float32) / 32767.0
                wavs = [wavs_np[i, : int(nums[i]) * ratio * up] for i in range(bsz)]
                self.register_warm_batch_synth(bsz, tok_bkt, pm_bucket, fsbkt)
        synth_time = time.time() - t0

        total = time.time() - t_start
        dur = sum(len(w) for w in wavs) / cfg.sample_rate
        stats = dict(
            llm_time=llm_time, synth_time=synth_time, total_time=total,
            tokens=[int(n) for n in nums], steps=steps,
            rtf=total / max(dur, 1e-9),
        )
        if synth_groups is not None:
            stats["synth_groups"] = synth_groups  # [(rows, padded_B, bucket)]
        if self.spec_decode and head_num >= 2:
            # packed layout keeps [accepted, drafted] just before num/steps
            stats["spec_acceptance"] = float(meta[0, -4]) / max(float(meta[0, -3]), 1.0)
        logger.info(
            "flash batch x%d: %s tokens, rtf=%.4f (llm %.3fs synth %.3fs)",
            bsz, stats["tokens"], stats["rtf"], llm_time, synth_time,
        )
        return wavs, stats

    def _hift_only_fn(self):
        """Cached vocoder-only program for the speed != 1.0 re-vocode path
        (one compile per mel bucket via shape polymorphism of jit's cache —
        previously rebuilt jax.jit per request, recompiling every time)."""
        if "hift_only" not in self._synth_cache:
            hcfg = self.cfg.hift
            self._synth_cache["hift_only"] = jax.jit(
                lambda p, m, r: hift_model.inference(p, hcfg, m, r)
            )
        return self._synth_cache["hift_only"]

    def prewarm(
        self,
        head_nums=(2, 4),
        text_buckets=None,
        token_buckets=None,
        streaming: bool = True,
    ) -> float:
        """Compile the hot (text-bucket, prompt-bucket, heads) programs before
        serving traffic, so a cold server's first request doesn't pay
        seconds-to-minutes of XLA compilation (VERDICT r1 weak #3). Returns
        seconds spent. Run with the persistent compile cache enabled for
        fast warm restarts."""
        t0 = time.time()
        text_buckets = text_buckets or self.prompt_buckets[:2]
        token_buckets = token_buckets or self.token_buckets[2:4]
        rng = jax.random.PRNGKey(0)
        sp = SamplingParams.make()
        for heads in head_nums:
            for tbkt in text_buckets:
                gen = self._generate_fn(tbkt, 0, heads)
                _, packed = gen(
                    self.llm_params, rng, jnp.zeros((tbkt,), jnp.int32),
                    jnp.int32(min(8, tbkt)), jnp.zeros((0,), jnp.int32), jnp.int32(0),
                    jnp.int32(2), jnp.int32(4), sp,
                )
                jax.block_until_ready(packed)
        for tok_bkt in token_buckets:
            synth = self._synth_fn(tok_bkt, 0, 0)
            w, _ = synth(
                self.flow_params, self.hift_params,
                jnp.zeros((self.max_tokens,), jnp.int32), jnp.int32(4),
                jnp.zeros((0,), jnp.int32), jnp.int32(0),
                jnp.zeros((1, 0, self.cfg.flow.output_size), jnp.float32), jnp.int32(0),
                jnp.zeros((1, 192), jnp.float32), rng,
            )
            jax.block_until_ready(w)
        if self.fused:
            for heads in head_nums:
                for tbkt in text_buckets:
                    for tok_bkt in token_buckets:
                        fused = self._fused_fn(tbkt, 0, 0, heads, tok_bkt, 0)
                        _, packed = fused(
                            self.llm_params, self.flow_params, self.hift_params, rng,
                            jnp.zeros((tbkt,), jnp.int32), jnp.int32(min(8, tbkt)),
                            jnp.zeros((0,), jnp.int32), jnp.int32(0),
                            jnp.zeros((0,), jnp.int32), jnp.int32(0),
                            jnp.int32(2), jnp.int32(4), sp,
                            jnp.zeros((1, 0, self.cfg.flow.output_size), jnp.float32),
                            jnp.int32(0), jnp.zeros((1, 192), jnp.float32),
                        )
                        jax.block_until_ready(packed)
        if streaming:
            synth = self.streaming()
            for heads in head_nums:
                gen = synth.synthesize_stream(
                    text_tokens=np.arange(max(text_buckets[0] // 2, 14), dtype=np.int32),
                    tts_text_len=max(text_buckets[0] // 2, 14),
                    inference_head_num=heads,
                    rng=jax.random.PRNGKey(1),
                )
                for _ in gen:
                    pass
        dt = time.time() - t0
        logger.info("prewarm done in %.1fs", dt)
        return dt

    def streaming(self):
        """Shared StreamingSynthesizer (jit caches live as long as the engine,
        so prewarmed streaming programs are reused by later sessions)."""
        if self._streaming is None:
            from .streaming import StreamingSynthesizer

            self._streaming = StreamingSynthesizer(self)
        return self._streaming

    # -- pipeline ------------------------------------------------------------

    def next_rng(self):
        # called from concurrent request threads (continuous fast path) —
        # guard the read-modify-write so no two requests share a key
        with self._rng_lock:
            self._rng, out = jax.random.split(self._rng)
            return out

    def voice_convert(
        self,
        source_speech_tokens: np.ndarray,  # (Ls,) tokens of the source speech
        prompt_speech_tokens: np.ndarray,
        prompt_mel: np.ndarray,
        spk_embedding: np.ndarray,
        rng: Optional[jax.Array] = None,
    ) -> np.ndarray:
        """Voice conversion (reference frontend_vc + CosyVoiceModel.vc_job,
        cli/model.py:123-130): source speech tokens bypass the LLM and are
        re-voiced by the flow with the prompt timbre. Returns (T,) wav."""
        rng = rng if rng is not None else self.next_rng()
        cfg = self.cfg
        src = np.asarray(source_speech_tokens, np.int32)[: self.max_tokens]
        n_tok = len(src)
        # canonical (max_tokens,) token-buffer shape: shares the synth trace
        # with the TTS paths (GenerateResult.tokens) instead of retracing
        buf = np.zeros((self.max_tokens,), np.int32)
        buf[:n_tok] = src

        flp = len(prompt_speech_tokens)
        fsbkt = _bucket(flp, self.prompt_buckets) if flp else 0
        fsp_pad = np.zeros((fsbkt,), np.int32)
        fsp_pad[:flp] = prompt_speech_tokens
        tok_bkt = _bucket(max(flp + n_tok, 1), self.synth_buckets)
        lm = len(prompt_mel)
        pm_bucket = _bucket(lm, self.mel_buckets) if lm else 0
        pm = np.zeros((1, pm_bucket, cfg.flow.output_size), np.float32)
        pm[0, :lm] = prompt_mel

        synth = self._synth_fn(tok_bkt, pm_bucket, fsbkt)
        wav_dev, _ = synth(
            self.flow_params, self.hift_params, jnp.asarray(buf), jnp.int32(n_tok),
            jnp.asarray(fsp_pad), jnp.int32(flp), jnp.asarray(pm), jnp.int32(lm),
            jnp.asarray(spk_embedding, jnp.float32)[None], rng,
        )
        up = cfg.hift.upsample_scale
        ratio = cfg.flow.token_mel_ratio
        return np.asarray(wav_dev)[0, : n_tok * ratio * up].astype(np.float32) / 32767.0

    def synthesize(
        self,
        text_tokens: np.ndarray,  # (Lt,) int32: prompt_text + tts_text tokens
        tts_text_len: int,  # length of the tts portion (min/max len base)
        sampling: Optional[SamplingConfig] = None,
        inference_head_num: Optional[int] = None,
        prompt_speech_tokens: Optional[np.ndarray] = None,  # (Lp,) — flow prompt
        prompt_mel: Optional[np.ndarray] = None,  # (Lm, 80)
        spk_embedding: Optional[np.ndarray] = None,  # (192,)
        speed: float = 1.0,
        rng: Optional[jax.Array] = None,
        max_token_text_ratio: float = 20.0,
        min_token_text_ratio: float = 2.0,
        llm_prompt_speech_tokens: Optional[np.ndarray] = None,  # override: LLM
        # prefix tokens; None -> same as prompt_speech_tokens; empty array ->
        # none (cross-lingual/instruct2 modes, cli/frontend.py:186-209)
    ) -> SynthesisResult:
        """Single-utterance synthesis (reference inference_tts /
        inference_zero_shot, infer_speech_model.py:523-689)."""
        t_start = time.time()
        cfg = self.cfg
        sampling = sampling or cfg.tts_sampling
        head_num = inference_head_num or cfg.llm.inference_head_num
        rng = rng if rng is not None else self.next_rng()
        flow_sp_tokens = (
            np.zeros((0,), np.int32)
            if prompt_speech_tokens is None
            else np.asarray(prompt_speech_tokens, np.int32)
        )
        sp_tokens = (
            flow_sp_tokens
            if llm_prompt_speech_tokens is None
            else np.asarray(llm_prompt_speech_tokens, np.int32)
        )
        if spk_embedding is None:
            spk_embedding = np.zeros((192,), np.float32)

        # ---- shared padding/bucketing ----
        lt, lp = len(text_tokens), len(sp_tokens)
        tbkt = _bucket(lt, self.prompt_buckets)
        if lt > tbkt:
            logger.warning(
                "text of %d tokens exceeds the largest prompt bucket %d; truncating",
                lt, tbkt,
            )
            text_tokens, lt = text_tokens[:tbkt], tbkt
            tts_text_len = min(int(tts_text_len), tbkt)
        sbkt = _bucket(lp, self.prompt_buckets) if lp else 0
        if lp > sbkt:
            sp_tokens, lp = sp_tokens[:sbkt], sbkt
        text_pad = np.zeros((tbkt,), np.int32)
        text_pad[:lt] = text_tokens
        sp_pad = np.zeros((sbkt,), np.int32)
        sp_pad[:lp] = sp_tokens

        min_len = int(tts_text_len * min_token_text_ratio)
        max_len = min(int(tts_text_len * max_token_text_ratio), self.max_tokens)
        sp = SamplingParams.make(sampling.top_p, sampling.top_k, sampling.win_size, sampling.tau_r)

        # flow conditioning always uses the FLOW prompt tokens (which may
        # differ from the LLM prefix in cross-lingual/instruct2 modes)
        flp = len(flow_sp_tokens)
        fsbkt = _bucket(flp, self.prompt_buckets) if flp else 0
        fsp_pad = np.zeros((fsbkt,), np.int32)
        fsp_pad[:flp] = flow_sp_tokens
        if prompt_mel is not None and len(prompt_mel) > 0:
            lm = len(prompt_mel)
            pm_bucket = _bucket(lm, self.mel_buckets)
            pm = np.zeros((1, pm_bucket, cfg.flow.output_size), np.float32)
            pm[0, :lm] = prompt_mel
            pm_len = lm
        else:
            pm = np.zeros((1, 0, cfg.flow.output_size), np.float32)
            pm_bucket, pm_len = 0, 0

        ratio = cfg.flow.token_mel_ratio
        up = cfg.hift.upsample_scale

        # ---- fused single-dispatch path (default): LLM + flow + HiFT in one
        # program, ONE packed host transfer.  Stage 2 runs at a bucket
        # estimated from the text length; an underestimate falls back to a
        # correctly-bucketed redispatch on the device-resident tokens. ----
        res = None
        wav = None
        n_tok = steps = 0
        meta = None
        llm_time = 0.0
        if self.fused and speed == 1.0:
            tok_bkt = self._estimate_token_bucket(tts_text_len, min_len, max_len, flp)
            t0 = time.time()
            fused = self._fused_fn(tbkt, sbkt, fsbkt, head_num, tok_bkt, pm_bucket)
            res, packed = fused(
                self.llm_params, self.flow_params, self.hift_params, rng,
                jnp.asarray(text_pad), jnp.int32(lt),
                jnp.asarray(sp_pad), jnp.int32(lp),
                jnp.asarray(fsp_pad), jnp.int32(flp),
                jnp.int32(min_len), jnp.int32(max_len), sp,
                jnp.asarray(pm), jnp.int32(pm_len),
                jnp.asarray(spk_embedding, jnp.float32)[None],
            )
            buf = np.asarray(packed)  # the single transfer
            llm_time = time.time() - t0  # whole fused dispatch (no split)
            n32 = tok_bkt * ratio * up // 2
            meta = buf[n32:]
            n_tok = int(meta[-2])
            steps = int(meta[-1])
            if flp + n_tok <= tok_bkt:
                wav16 = np.ascontiguousarray(buf[:n32]).view(np.int16)
                wav = wav16[: n_tok * ratio * up].astype(np.float32) / 32767.0
            # else: bucket estimate too small — flow output is truncated;
            # redispatch stage 2 below at the right bucket (tokens on device)

        if res is None:
            # ---- stage 1: LLM ----
            t0 = time.time()
            gen = self._generate_fn(tbkt, sbkt, head_num)
            res, packed = gen(
                self.llm_params, rng, jnp.asarray(text_pad), jnp.int32(lt),
                jnp.asarray(sp_pad), jnp.int32(lp),
                jnp.int32(min_len), jnp.int32(max_len), sp,
            )
            meta = np.asarray(packed)  # single host transfer: tokens + num + steps
            n_tok = int(meta[-2])
            steps = int(meta[-1])
            llm_time = time.time() - t0

        # ---- stage 2: fused flow + hift (tokens stay on device) ----
        # skipped entirely when the fused program already produced `wav`
        t0 = time.time()
        if wav is None:
            n_all = flp + n_tok
            tok_bkt = _bucket(max(n_all, 1), self.synth_buckets)
            synth = self._synth_fn(tok_bkt, pm_bucket, fsbkt)
            wav_dev, mel_dev = synth(
                self.flow_params, self.hift_params, res.tokens, res.num_tokens,
                jnp.asarray(fsp_pad), jnp.int32(flp), jnp.asarray(pm), jnp.int32(pm_len),
                jnp.asarray(spk_embedding, jnp.float32)[None], rng,
            )
            if speed != 1.0:
                # slow path: resample mel on host then re-vocode (rare;
                # infer_speech_model.py:586-587)
                mel = np.asarray(mel_dev)[:, :, : n_tok * ratio]
                new_t = max(1, int(mel.shape[2] / speed))
                src = np.linspace(0, mel.shape[2] - 1, new_t)
                lo = np.floor(src).astype(int)
                hi = np.minimum(lo + 1, mel.shape[2] - 1)
                w = (src - lo).astype(np.float32)
                mel = (mel[:, :, lo] * (1 - w) + mel[:, :, hi] * w).astype(np.float32)
                mbkt = _bucket(mel.shape[2], self.mel_buckets)
                mel_pad = np.concatenate(
                    [mel, np.repeat(mel[:, :, -1:], mbkt - mel.shape[2], axis=2)], axis=2
                )
                wav = np.asarray(
                    self._hift_only_fn()(self.hift_params, jnp.asarray(mel_pad), rng)
                )[0, : mel.shape[2] * up]
            else:
                wav = np.asarray(wav_dev)[0, : n_tok * ratio * up].astype(np.float32) / 32767.0
        synth_time = time.time() - t0

        tokens = meta[: self.max_tokens][:n_tok]
        total = time.time() - t_start
        dur = len(wav) / cfg.sample_rate if len(wav) else 1e-9
        spec_acceptance = -1.0
        if self.spec_decode and head_num >= 2:
            # packed layout keeps [accepted, drafted] just before num/steps
            spec_acceptance = float(meta[-4]) / max(float(meta[-3]), 1.0)
        result = SynthesisResult(
            audio=wav.astype(np.float32),
            speech_tokens=tokens,
            llm_time=llm_time,
            synth_time=synth_time,
            flow_time=synth_time,
            hift_time=0.0,
            total_time=total,
            tps=n_tok / llm_time if llm_time > 0 else 0.0,
            rtf=total / dur,
            steps=steps,
            spec_acceptance=spec_acceptance,
        )
        logger.info(
            "synth: %d tokens in %d steps, tps=%.1f rtf=%.4f (llm %.3fs flow+hift %.3fs)",
            n_tok, steps, result.tps, result.rtf, llm_time, synth_time,
        )
        return result
