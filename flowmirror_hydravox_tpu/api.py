"""Library-level Python API — the reference's `cli/cosyvoice.py` equivalent.

The reference exposes `CosyVoice/CosyVoice2/CosyVoice3` orchestrator classes
(cli/cosyvoice.py:27-238) whose `inference_*` methods are generators yielding
`{'tts_speech': tensor}` dicts, with `stream=True` producing ~1 s chunks
through the `CosyVoiceModel.tts()` thread pipeline (cli/model.py:315-360).

TPU-natively the orchestration is the jitted `Engine` + `Frontend`; this
module wraps them in the same user-facing surface:

    from flowmirror_hydravox_tpu.api import HydraVox
    hv = HydraVox(model_dir="weights/", quantize="int8")
    for out in hv.inference_sft("你好世界", "demo"):
        wav = out["tts_speech"]            # np.float32 (n,) at 24 kHz

`CosyVoice3` is an alias of `HydraVox` (same generation).  The CV1/CV2
legacy generations run through `tools/legacy_tts.py` (their model classes
live in models/llm_legacy.py / models/flow_legacy.py).
"""

from __future__ import annotations

import logging
import os
import time
from typing import Generator, Optional

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger("hydravox.api")


class HydraVox:
    """Flagship (CosyVoice3/HydraVox) synthesis API.

    Args:
      model_dir: directory with llm.pt/flow.pt/hift.pt (or .npz) — absent
        files fall back to random init, like the serving launcher.
      tiny: use the tiny smoke config instead of the flagship sizes.
      quantize: None | "int8" weight-only LLM quantization (ops/quant.py).
      tokenizer_path: optional explicit tokenizer asset.
      spk2info: optional speaker registry (.pt or .npz) to preload.
      prewarm: compile the hot bucket programs up front (like the server).
      spec_decode: self-speculative MTP verification for single-utterance
        decodes — exact heads=1 output distribution at up-to-K tokens/step
        (llm.generate_speculative).
    """

    def __init__(
        self,
        model_dir: Optional[str] = None,
        *,
        tiny: bool = False,
        quantize: Optional[str] = None,
        tokenizer_path: Optional[str] = None,
        spk2info: Optional[str] = None,
        max_tokens: int = 1024,
        prewarm: bool = False,
        dtype=jnp.bfloat16,
        spec_decode: bool = False,
    ):
        from .__main__ import load_or_init
        from .config import HydraVoxConfig, tiny_config
        from .frontend.frontend import Frontend, SpeakerInfo
        from .frontend.tokenizer import get_tokenizer
        from .models import flow as flow_model
        from .models import hift as hift_model
        from .models import llm as llm_model
        from .convert import torch_import
        from .runtime.engine import Engine

        cfg = tiny_config() if tiny else HydraVoxConfig()
        self.cfg = cfg
        tokenizer = get_tokenizer(tokenizer_path)
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
        llm_params = load_or_init(
            model_dir, "llm",
            lambda: jax.jit(lambda k: llm_model.init_params(k, cfg.llm, dtype))(k1),
            lambda sd: torch_import.llm_from_state_dict(sd, cfg.llm), dtype,
        )
        flow_params = load_or_init(
            model_dir, "flow",
            lambda: jax.jit(lambda k: flow_model.init_params(k, cfg.flow, dtype))(k2),
            lambda sd: torch_import.flow_from_state_dict(sd, cfg.flow), dtype,
        )
        hift_params = load_or_init(
            model_dir, "hift",
            lambda: jax.jit(lambda k: hift_model.init_params(k, cfg.hift, jnp.float32))(k3),
            lambda sd: torch_import.hift_from_state_dict(sd, cfg.hift), jnp.float32,
        )
        self.engine = Engine(
            cfg, llm_params, flow_params, hift_params,
            max_tokens=max_tokens, quantize=quantize, spec_decode=spec_decode,
        )
        self.frontend = Frontend(cfg, tokenizer=tokenizer)
        if spk2info and os.path.exists(spk2info):
            self.frontend.load_spk2info(spk2info)
        if not self.frontend.available_speakers():
            self.frontend.add_speaker(
                "default", SpeakerInfo(embedding=np.zeros(192, np.float32))
            )
        self.sample_rate = cfg.sample_rate
        # the engine-owned streamer, so prewarm=True warms the same jit caches
        self._streamer = self.engine.streaming()
        if prewarm:
            self.engine.prewarm()

    # -- speaker management (cli/cosyvoice.py:55-75) -------------------------

    def list_available_spks(self):
        return self.frontend.available_speakers()

    def add_zero_shot_spk(self, prompt_text: str, prompt_wav: np.ndarray,
                          sample_rate: int, zero_shot_spk_id: str) -> bool:
        self.frontend.add_speaker_from_audio(
            zero_shot_spk_id, prompt_wav, sample_rate, prompt_text=prompt_text
        )
        return True

    def save_spkinfo(self, path: str = "spk2info.npz"):
        self.frontend.save_spk2info(path)

    # -- inference generators (cli/cosyvoice.py:77-238) ----------------------

    def _segments(self, tts_text: str, text_frontend: bool = True):
        """Reference `text_frontend=False` skips TN/splitting
        (cli/frontend.py:124-131)."""
        if not text_frontend:
            return [tts_text]
        return self.frontend.text_normalize(tts_text, split=True)

    def inference_sft(self, tts_text: str, spk_id: str, stream: bool = False,
                      speed: float = 1.0, text_frontend: bool = True,
                      **kw) -> Generator[dict, None, None]:
        for seg in self._segments(tts_text, text_frontend):
            feats = self.frontend.frontend_sft(seg, spk_id)
            yield from self._run(feats, stream=stream, speed=speed, **kw)

    def inference_zero_shot(self, tts_text: str, prompt_text: str,
                            prompt_wav: np.ndarray, sample_rate: int,
                            zero_shot_spk_id: str = "", stream: bool = False,
                            speed: float = 1.0, text_frontend: bool = True,
                            **kw) -> Generator[dict, None, None]:
        if zero_shot_spk_id:
            # registered zero-shot speaker: stored prompt text + speech
            # features, same sampling as the unregistered path
            for seg in self._segments(tts_text, text_frontend):
                feats = self.frontend.frontend_zero_shot_registered(seg, zero_shot_spk_id)
                yield from self._run(feats, stream=stream, speed=speed,
                                     sampling=self.cfg.zero_shot_sampling, **kw)
            return
        norm_prompt = self.frontend.text_normalize(prompt_text, split=False)[0]
        for seg in self._segments(tts_text, text_frontend):
            feats = self.frontend.frontend_zero_shot(seg, norm_prompt, prompt_wav, sample_rate)
            yield from self._run(feats, stream=stream, speed=speed,
                                 sampling=self.cfg.zero_shot_sampling, **kw)

    def inference_cross_lingual(self, tts_text: str, prompt_wav: np.ndarray,
                                sample_rate: int, stream: bool = False,
                                speed: float = 1.0, text_frontend: bool = True,
                                **kw) -> Generator[dict, None, None]:
        for seg in self._segments(tts_text, text_frontend):
            feats = self.frontend.frontend_cross_lingual(seg, prompt_wav, sample_rate)
            yield from self._run(feats, stream=stream, speed=speed,
                                 sampling=self.cfg.zero_shot_sampling, **kw)

    def inference_instruct2(self, tts_text: str, instruct_text: str,
                            prompt_wav: np.ndarray, sample_rate: int,
                            stream: bool = False, speed: float = 1.0,
                            text_frontend: bool = True,
                            **kw) -> Generator[dict, None, None]:
        for seg in self._segments(tts_text, text_frontend):
            feats = self.frontend.frontend_instruct2(seg, instruct_text, prompt_wav, sample_rate)
            yield from self._run(feats, stream=stream, speed=speed,
                                 sampling=self.cfg.zero_shot_sampling, **kw)

    def inference_instruct(self, tts_text: str, spk_id: str, instruct_text: str,
                           stream: bool = False, speed: float = 1.0,
                           text_frontend: bool = True,
                           **kw) -> Generator[dict, None, None]:
        for seg in self._segments(tts_text, text_frontend):
            feats = self.frontend.frontend_instruct(seg, spk_id, instruct_text)
            yield from self._run(feats, stream=stream, speed=speed, **kw)

    def inference_vc(self, source_wav: np.ndarray, source_sr: int,
                     prompt_wav: np.ndarray, prompt_sr: int,
                     **kw) -> Generator[dict, None, None]:
        feats = self.frontend.frontend_vc(source_wav, source_sr, prompt_wav, prompt_sr)
        t0 = time.time()
        audio = self.engine.voice_convert(
            feats["source_speech_tokens"], feats["prompt_speech_tokens"],
            feats["prompt_mel"], feats["spk_embedding"],
        )
        self._log_rtf(audio, time.time() - t0)
        yield {"tts_speech": audio, "sample_rate": self.sample_rate}

    # -- internals ------------------------------------------------------------

    def _run(self, feats: dict, *, stream: bool, speed: float = 1.0,
             sampling=None, inference_head_num: Optional[int] = None,
             **kw) -> Generator[dict, None, None]:
        head_num = inference_head_num or self.cfg.llm.inference_head_num
        if stream and speed == 1.0 and feats.get("llm_prompt_speech_tokens") is None:
            t0 = time.time()
            for chunk in self._streamer.synthesize_stream(
                text_tokens=feats["text_tokens"],
                tts_text_len=feats["tts_text_len"],
                sampling=sampling,
                inference_head_num=head_num,
                prompt_speech_tokens=feats.get("prompt_speech_tokens"),
                prompt_mel=feats.get("prompt_mel"),
                spk_embedding=feats.get("spk_embedding"),
                **kw,
            ):
                logger.info("yield chunk %.3fs after start", time.time() - t0)
                yield {"tts_speech": chunk, "sample_rate": self.sample_rate}
            return
        # offline (or modes whose LLM prefix differs from the flow prompt,
        # which the chunked streamer does not support yet)
        t0 = time.time()
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
            **kw,
        )
        self._log_rtf(res.audio, time.time() - t0)
        yield {"tts_speech": res.audio, "sample_rate": self.sample_rate}

    def _log_rtf(self, audio: np.ndarray, dt: float):
        dur = len(audio) / self.sample_rate
        if dur > 0:
            logger.info("rtf %.4f (%.2fs audio in %.2fs)", dt / dur, dur, dt)


# Generation alias: HydraVox IS the CosyVoice3 generation (cli/cosyvoice.py:172).
CosyVoice3 = HydraVox
