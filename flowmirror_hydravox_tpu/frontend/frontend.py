"""Frontend glue: CosyVoiceFrontEnd equivalent (reference cli/frontend.py:39-219).

Responsibilities:
  - text tokenize + normalize + split
  - speaker registry (spk2info) for preset-speaker TTS
  - zero-shot prompt featurization: 24k mel (for flow conditioning),
    speech tokens (JAX FSQ tokenizer), speaker embedding — with the
    reference's exact 30 s prompt cap and 2:1 mel:token trim
    (cli/frontend.py:94, 169-173).
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import HydraVoxConfig
from ..utils import audio

logger = logging.getLogger("hydravox.frontend")
from . import speech_tokenizer as st
from .text_norm import normalize, split_text_by_punctuation
from .tokenizer import get_tokenizer


# Built-in instruct prompts (reference cosyvoice/utils/common.py:28-53):
# dialect/emotion/style control strings ending in <|endofprompt|>.
INSTRUCT_PROMPTS = [
    *[f"You are a helpful assistant. 请用{d}表达。<|endofprompt|>" for d in (
        "广东话", "东北话", "甘肃话", "贵州话", "河南话", "湖北话", "湖南话",
        "江西话", "闽南话", "宁夏话", "山西话", "陕西话", "山东话", "上海话",
        "四川话", "天津话", "云南话",
    )],
    "You are a helpful assistant. Please say a sentence as loudly as possible.<|endofprompt|>",
    "You are a helpful assistant. Please say a sentence in a very soft voice.<|endofprompt|>",
    "You are a helpful assistant. 请用尽可能慢地语速说一句话。<|endofprompt|>",
    "You are a helpful assistant. 请用尽可能快地语速说一句话。<|endofprompt|>",
    "You are a helpful assistant. 请非常开心地说一句话。<|endofprompt|>",
    "You are a helpful assistant. 请非常伤心地说一句话。<|endofprompt|>",
    "You are a helpful assistant. 请非常生气地说一句话。<|endofprompt|>",
    "You are a helpful assistant. 我想体验一下小猪佩奇风格，可以吗？<|endofprompt|>",
    "You are a helpful assistant. 你可以尝试用机器人的方式解答吗？<|endofprompt|>",
]


@dataclasses.dataclass
class SpeakerInfo:
    embedding: np.ndarray  # (192,)
    prompt_text: Optional[np.ndarray] = None  # (Lt,) tokens
    prompt_speech_tokens: Optional[np.ndarray] = None  # (Lp,)
    prompt_mel: Optional[np.ndarray] = None  # (Lm, 80)


class Frontend:
    def __init__(
        self,
        cfg: HydraVoxConfig,
        tokenizer=None,
        tokenizer_params=None,
        speaker_params=None,
        rng: Optional[jax.Array] = None,
    ):
        self.cfg = cfg
        self.tokenizer = tokenizer or get_tokenizer()
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(rng)
        # Weight resolution order per extractor (trained > random):
        #   1. explicit ctor params (caller owns the matching config)
        #   2. HYDRAVOX_TOKENIZER_NPZ / HYDRAVOX_SPEAKER_NPZ env
        #   3. committed default checkpoints (frontend/assets/ckpt/, trained by
        #      train/train_frontend.py --preset shipped --synthetic_speech —
        #      the in-repo replacement for the reference's frozen ONNX weights)
        #   4. random init (keeps the pipeline executable, conditioning = noise)
        # Paths 2-3 read a `<model>.json` sidecar for the architecture config.
        import os as _os

        asset_dir = _os.path.join(_os.path.dirname(__file__), "assets", "ckpt")
        self.st_cfg = st.SpeechTokenizerConfig()
        self.spk_cfg = st.SpeakerEncoderConfig()
        self.tokenizer_params = tokenizer_params
        self.speaker_params = speaker_params
        for attr, name, explicit in (
            ("tokenizer_params", "tokenizer", tokenizer_params),
            ("speaker_params", "speaker", speaker_params),
        ):
            if explicit is not None:
                continue
            env_path = _os.environ.get(f"HYDRAVOX_{name.upper()}_NPZ")
            path = (env_path if env_path and _os.path.exists(env_path)
                    else _os.path.join(asset_dir, f"{name}.npz"))
            if not _os.path.exists(path):
                continue
            try:
                loaded_cfg = self._load_extractor_cfg(path, name)
                if name == "tokenizer":
                    self.st_cfg = loaded_cfg or self.st_cfg
                    template = st.init_tokenizer_params(k1, self.st_cfg)
                else:
                    self.spk_cfg = loaded_cfg or self.spk_cfg
                    template = st.init_speaker_params(k2, self.spk_cfg)
                from ..train.checkpoint import load_params_npz

                setattr(self, attr, load_params_npz(path, template))
                logger.info("loaded trained %s weights from %s", name, path)
            except Exception as e:
                logger.warning("could not load %s weights %s (%s); falling "
                               "back to random init", name, path, e)
        if self.tokenizer_params is None:
            self.tokenizer_params = st.init_tokenizer_params(k1, self.st_cfg)
        if self.speaker_params is None:
            self.speaker_params = st.init_speaker_params(k2, self.spk_cfg)
        self.spk2info: Dict[str, SpeakerInfo] = {}
        self._tokenize_jit = jax.jit(
            lambda p, w: st.tokenize_waveform(p, self.st_cfg, w)
        )
        self._spk_embed_jit = jax.jit(
            lambda p, m: st.speaker_embedding(p, self.spk_cfg, m)
        )
        # ONNX adapters take over the moment the reference graphs + runtime
        # exist (speech_tokenizer.maybe_onnx_extractors; env
        # HYDRAVOX_SPEECH_TOKENIZER_ONNX / HYDRAVOX_CAMPPLUS_ONNX); until
        # then the native random-weight architectures keep the pipeline
        # executable — zero-shot timbre transfer needs real weights either way
        self._onnx_tokenizer, self._onnx_speaker = st.maybe_onnx_extractors()

    @staticmethod
    def _load_extractor_cfg(npz_path: str, name: str):
        """Read the `<model>.json` architecture sidecar next to a trained
        extractor npz (written by train/train_frontend.py). None = no sidecar
        (use the default config)."""
        import json
        import os as _os

        sidecar = _os.path.join(_os.path.dirname(npz_path), f"{name}.json")
        if not _os.path.exists(sidecar):
            return None
        with open(sidecar) as f:
            d = json.load(f)
        if name == "tokenizer":
            if "fsq_levels" in d:
                d["fsq_levels"] = tuple(d["fsq_levels"])
            return st.SpeechTokenizerConfig(**d)
        return st.SpeakerEncoderConfig(**d)

    # -- text ---------------------------------------------------------------

    def text_normalize(self, text: str, split: bool = True) -> List[str]:
        text = normalize(text)
        if not split:
            return [text]
        return split_text_by_punctuation(text) or [text]

    def extract_text_tokens(self, text: str) -> np.ndarray:
        return np.asarray(self.tokenizer.encode(text), np.int32)

    # -- audio --------------------------------------------------------------

    def extract_speech_tokens(self, wav: np.ndarray, sample_rate: int) -> np.ndarray:
        """Prompt wav -> 25 Hz speech tokens; 30 s cap (cli/frontend.py:94)."""
        wav = np.asarray(wav, np.float32).reshape(-1)
        wav = wav[: sample_rate * 30]
        wav16 = np.asarray(audio.resample_linear(jnp.asarray(wav)[None], sample_rate, 16000))
        # pad to a whole number of 640-sample token frames
        t = wav16.shape[-1]
        frame = 640  # 16000 / 25
        pad = (-t) % frame
        if pad:
            wav16 = np.pad(wav16, [(0, 0), (0, pad)])
        if self._onnx_tokenizer is not None:
            return self._onnx_tokenizer(wav16[0])
        toks = self._tokenize_jit(self.tokenizer_params, jnp.asarray(wav16))
        return np.asarray(toks)[0]

    def extract_mel(self, wav: np.ndarray, sample_rate: int) -> np.ndarray:
        """Prompt wav -> 24 kHz 80-bin mel (Lm, 80) (cli/frontend.py:117-123)."""
        wav = np.asarray(wav, np.float32).reshape(-1)
        wav24 = np.asarray(
            audio.resample_linear(jnp.asarray(wav)[None], sample_rate, self.cfg.mel.sample_rate)
        )
        m = self.cfg.mel
        mel = audio.mel_spectrogram(
            jnp.asarray(wav24), m.n_fft, m.num_mels, m.sample_rate, m.hop_size, m.win_size,
            m.fmin, m.fmax,
        )
        return np.asarray(mel)[0].T  # (Lm, 80)

    def extract_spk_embedding(self, wav: np.ndarray, sample_rate: int) -> np.ndarray:
        wav16 = np.asarray(audio.resample_linear(
            jnp.asarray(np.asarray(wav, np.float32).reshape(-1))[None], sample_rate, 16000
        ))
        if self._onnx_speaker is not None:
            return self._onnx_speaker(wav16[0])
        mel = audio.mel_spectrogram(jnp.asarray(wav16), 400, 80, 16000, 160, 400)
        emb = self._spk_embed_jit(self.speaker_params, mel)
        return np.asarray(emb)[0]

    # -- request assembly ---------------------------------------------------

    def frontend_zero_shot(
        self, tts_text: str, prompt_text: str, prompt_wav: np.ndarray, sample_rate: int
    ) -> dict:
        """Zero-shot featurization with the reference's 2:1 mel:token trim
        (cli/frontend.py:163-209)."""
        tts_tokens = self.extract_text_tokens(tts_text)
        prompt_tokens = self.extract_text_tokens(prompt_text)
        speech_tokens = self.extract_speech_tokens(prompt_wav, sample_rate)
        mel = self.extract_mel(prompt_wav, sample_rate)
        # enforce exact token:mel = 1:2 (trim the longer one)
        n = min(len(speech_tokens), mel.shape[0] // 2)
        speech_tokens = speech_tokens[:n]
        mel = mel[: 2 * n]
        emb = self.extract_spk_embedding(prompt_wav, sample_rate)
        return dict(
            text_tokens=np.concatenate([prompt_tokens, tts_tokens]),
            tts_text_len=len(tts_tokens),
            prompt_speech_tokens=speech_tokens,
            prompt_mel=mel,
            spk_embedding=emb,
        )

    def frontend_cross_lingual(
        self, tts_text: str, prompt_wav: np.ndarray, sample_rate: int
    ) -> dict:
        """Cross-lingual cloning (cli/frontend.py:186-194): the LLM sees no
        prompt text/tokens (different language); the flow keeps the prompt
        mel/tokens + embedding for timbre."""
        feats = self.frontend_zero_shot(tts_text, "", prompt_wav, sample_rate)
        feats["llm_prompt_speech_tokens"] = np.zeros((0,), np.int32)
        feats["text_tokens"] = feats["text_tokens"][-feats["tts_text_len"]:]
        return feats

    def frontend_instruct(self, tts_text: str, spk_id: str, instruct_text: str) -> dict:
        """Instruct mode (cli/frontend.py:196-203): instruct text becomes the
        prompt text; no speaker embedding leaks into the LLM."""
        feats = self.frontend_sft(tts_text, spk_id)
        instruct_tokens = self.extract_text_tokens(instruct_text)
        feats["text_tokens"] = np.concatenate([instruct_tokens, feats["text_tokens"]])
        feats["llm_prompt_speech_tokens"] = np.zeros((0,), np.int32)
        return feats

    def frontend_instruct2(
        self, tts_text: str, instruct_text: str, prompt_wav: np.ndarray, sample_rate: int
    ) -> dict:
        """Instruct2 (cli/frontend.py:205-209): zero-shot with the instruct
        text as prompt text, but the LLM gets no prompt speech tokens."""
        feats = self.frontend_zero_shot(tts_text, instruct_text, prompt_wav, sample_rate)
        feats["llm_prompt_speech_tokens"] = np.zeros((0,), np.int32)
        return feats

    def frontend_vc(
        self, source_wav: np.ndarray, source_sr: int,
        prompt_wav: np.ndarray, prompt_sr: int,
    ) -> dict:
        """Voice conversion (cli/frontend.py:211-219): source speech tokens
        bypass the LLM; the flow re-voices them with the prompt timbre."""
        source_tokens = self.extract_speech_tokens(source_wav, source_sr)
        prompt_tokens = self.extract_speech_tokens(prompt_wav, prompt_sr)
        mel = self.extract_mel(prompt_wav, prompt_sr)
        n = min(len(prompt_tokens), mel.shape[0] // 2)
        return dict(
            source_speech_tokens=source_tokens,
            prompt_speech_tokens=prompt_tokens[:n],
            prompt_mel=mel[: 2 * n],
            spk_embedding=self.extract_spk_embedding(prompt_wav, prompt_sr),
        )

    def frontend_sft(self, tts_text: str, spk_id: str) -> dict:
        """Preset-speaker featurization (cli/frontend.py:157-162)."""
        if spk_id not in self.spk2info:
            raise KeyError(
                f"unknown speaker_id '{spk_id}'; available: {self.available_speakers()}"
            )
        info = self.spk2info[spk_id]
        tokens = self.extract_text_tokens(tts_text)
        return dict(
            text_tokens=tokens,
            tts_text_len=len(tokens),
            prompt_speech_tokens=info.prompt_speech_tokens,
            prompt_mel=info.prompt_mel,
            spk_embedding=info.embedding,
        )

    def frontend_zero_shot_registered(self, tts_text: str, spk_id: str) -> dict:
        """Zero-shot via a registered speaker id (reference frontend_zero_shot
        with zero_shot_spk_id, cli/frontend.py:163-170): reuses the stored
        prompt text tokens, speech tokens, mel and embedding so the LLM sees
        the same text/speech prompt pairing as the unregistered path."""
        feats = self.frontend_sft(tts_text, spk_id)
        info = self.spk2info[spk_id]
        if info.prompt_text is not None and len(info.prompt_text) > 0:
            feats["text_tokens"] = np.concatenate(
                [np.asarray(info.prompt_text, np.int32), feats["text_tokens"]]
            )
        return feats

    # -- speaker registry ---------------------------------------------------

    def add_speaker(self, spk_id: str, info: SpeakerInfo):
        self.spk2info[spk_id] = info

    def available_speakers(self) -> List[str]:
        return sorted(self.spk2info.keys())

    def add_speaker_from_audio(
        self, spk_id: str, wav: np.ndarray, sample_rate: int,
        prompt_text: Optional[str] = None,
    ):
        """Register a speaker from reference audio: embedding + zero-shot
        prompt features (speaker_manage.py:268-407 equivalent)."""
        tokens = self.extract_speech_tokens(wav, sample_rate)
        mel = self.extract_mel(wav, sample_rate)
        n = min(len(tokens), mel.shape[0] // 2)
        self.spk2info[spk_id] = SpeakerInfo(
            embedding=self.extract_spk_embedding(wav, sample_rate),
            prompt_text=(
                self.extract_text_tokens(prompt_text) if prompt_text else None
            ),
            prompt_speech_tokens=tokens[:n],
            prompt_mel=mel[: 2 * n],
        )

    def remove_speaker(self, spk_id: str) -> bool:
        return self.spk2info.pop(spk_id, None) is not None

    def compute_mean_embedding(self, wavs, sample_rate: int) -> np.ndarray:
        """Mean speaker embedding over several clips
        (speaker_manage.py:191 _compute_mean_embedding_from_dataset)."""
        embs = [self.extract_spk_embedding(w, sample_rate) for w in wavs]
        return np.mean(np.stack(embs), axis=0)

    def add_speaker_from_dataset(
        self, spk_id: str, dataset_dir: str,
        prompt_text: Optional[str] = None, max_rows: int = 5000,
    ) -> int:
        """Enroll a speaker as the MEAN embedding over an HF dataset
        (speaker_manage.py:191-259: prefers a precomputed 'embedding'
        column, falls back to per-row extraction from 'audio', 5000-row
        sample cap). Returns the number of rows averaged."""
        from datasets import load_from_disk

        ds = load_from_disk(dataset_dir)
        cols = ds.column_names
        embs = []
        if "embedding" in cols:
            for row in ds:
                e = row["embedding"]
                if e is None:
                    continue
                embs.append(np.asarray(e, np.float32).reshape(-1))
        elif "audio" in cols:
            if len(ds) > max_rows:
                ds = ds.shuffle(seed=42).select(range(max_rows))
            for row in ds:
                a = row["audio"]
                wav = np.asarray(a["array"], np.float32)
                embs.append(self.extract_spk_embedding(wav, int(a["sampling_rate"])))
        else:
            raise ValueError("dataset needs an 'embedding' or 'audio' column")
        if not embs:
            raise ValueError("no usable rows in dataset")
        self.spk2info[spk_id] = SpeakerInfo(
            embedding=np.mean(np.stack(embs), axis=0),
            prompt_text=(
                self.extract_text_tokens(prompt_text) if prompt_text else None
            ),
        )
        return len(embs)

    def save_spk2info(self, path: str):
        """Persist the registry as npz (spk2info.pt equivalent)."""
        flat = {}
        for spk, info in self.spk2info.items():
            flat[f"{spk}::embedding"] = info.embedding
            if info.prompt_speech_tokens is not None:
                flat[f"{spk}::prompt_speech_tokens"] = info.prompt_speech_tokens
            if info.prompt_mel is not None:
                flat[f"{spk}::prompt_mel"] = info.prompt_mel
        np.savez(path, **flat)

    def load_spk2info_npz(self, path: str):
        data = dict(np.load(path))
        by_spk: Dict[str, dict] = {}
        for key, val in data.items():
            spk, field = key.split("::", 1)
            by_spk.setdefault(spk, {})[field] = val
        for spk, fields in by_spk.items():
            self.spk2info[spk] = SpeakerInfo(
                embedding=fields["embedding"],
                prompt_speech_tokens=fields.get("prompt_speech_tokens"),
                prompt_mel=fields.get("prompt_mel"),
            )

    def load_spk2info(self, path: str):
        """Load a reference spk2info.pt registry (infer_speech_model.py:145-168)."""
        import torch

        data = torch.load(path, map_location="cpu", weights_only=False)
        for spk, entry in data.items():
            emb = entry.get("llm_embedding", entry.get("embedding"))
            self.spk2info[str(spk)] = SpeakerInfo(
                embedding=np.asarray(emb, np.float32).reshape(-1)[:192],
            )
