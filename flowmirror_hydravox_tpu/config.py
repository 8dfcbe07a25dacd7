"""Model/topology configuration for the TPU-native HydraVox rebuild.

The reference instantiates model topology from a hyperpyyaml file
(`hydravox.yaml`, shipped with the weights — see reference
`server/model_utils/infer_speech_model.py:59-62`).  We use plain dataclasses
instead: explicit, hashable (usable as jit static args), and trivially
serializable.  `load_config` accepts a plain-YAML/JSON dict with the same
parameter names so a reference topology file can be mapped onto these configs.

Reference parity notes (file:line refer to /root/reference):
  - LLM backbone: Qwen2-0.5B-class ("CosyVoice-BlankEN"), see README.md:250-252
    and server/model_utils/cosyvoice/llm/llm_multi_head_v3.py:232-260.
  - MTP head layout: llm_multi_head_v3.py:622-690 (head_num=5, mtp_head_num=14,
    vocab = speech_token_size + 200).
  - Flow: flow/flow.py:278-310 (CausalMaskedDiffWithDiT), DiT/dit.py:104-143.
  - HiFT: hifigan/generator.py:378-475.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class Qwen2Config:
    """Qwen2-style causal decoder backbone (RMSNorm, GQA, SwiGLU, RoPE)."""

    hidden_size: int = 896
    num_layers: int = 24
    num_heads: int = 14
    num_kv_heads: int = 2
    head_dim: int = 64
    intermediate_size: int = 4864
    vocab_size: int = 151936  # text vocab (Qwen2 tokenizer)
    rope_theta: float = 1_000_000.0
    rms_norm_eps: float = 1e-6
    tie_word_embeddings: bool = True
    max_position_embeddings: int = 32768


@dataclasses.dataclass(frozen=True)
class LLMConfig:
    """CosyVoice3-style multi-head (MTP) speech-token LM.

    Special ids (llm_multi_head_v3.py:643-646):
      sos = speech_token_size + 0, eos = +1, task = +2, fill = +3.
    Stop ids are speech_token_size + [0, 200) (llm_multi_head_v3.py:683).
    """

    backbone: Qwen2Config = Qwen2Config()
    speech_token_size: int = 6561
    extra_vocab: int = 200  # vocab = speech_token_size + extra_vocab
    head_num: int = 5
    inference_head_num: int = 5
    mtp_head_num: int = 14  # attention heads inside each MTP decoder layer
    lsm_weight: float = 0.0
    length_normalized_loss: bool = True
    mix_ratio: Tuple[int, int] = (5, 15)

    @property
    def vocab_size(self) -> int:
        return self.speech_token_size + self.extra_vocab

    @property
    def sos(self) -> int:
        return self.speech_token_size

    @property
    def eos_token(self) -> int:
        return self.speech_token_size + 1

    @property
    def task_id(self) -> int:
        return self.speech_token_size + 2

    @property
    def fill_token(self) -> int:
        return self.speech_token_size + 3


@dataclasses.dataclass(frozen=True)
class DiTConfig:
    """F5-TTS-style DiT estimator (DiT/dit.py:104-143, DiT/modules.py)."""

    dim: int = 1024
    depth: int = 22
    heads: int = 16
    dim_head: int = 64
    ff_mult: int = 2
    mel_dim: int = 80
    mu_dim: int = 512  # token-embedding stream dim fed as `mu`
    spk_dim: int = 80
    freq_embed_dim: int = 256
    static_chunk_size: int = 50  # mel frames per streaming chunk (decoder.py:306)
    num_decoding_left_chunks: int = 2
    rope_theta: float = 10000.0
    dropout_rate: float = 0.1  # train-time attn/FF dropout (DiT/modules.py)


@dataclasses.dataclass(frozen=True)
class FlowConfig:
    """CausalMaskedDiffWithDiT + CausalConditionalCFM (flow/flow.py:278-430)."""

    input_size: int = 512  # speech-token embedding dim
    output_size: int = 80  # mel bins
    spk_embed_dim: int = 192
    vocab_size: int = 6561
    input_frame_rate: int = 25  # speech tokens/sec
    token_mel_ratio: int = 2
    pre_lookahead_len: int = 3
    estimator: DiTConfig = DiTConfig()
    # CFM params (flow/flow.py:292-293)
    sigma_min: float = 1e-6
    t_scheduler: str = "cosine"
    training_cfg_rate: float = 0.2
    inference_cfg_rate: float = 0.7
    n_timesteps: int = 10
    # fixed noise buffer length in mel frames (flow_matching.py:201: 50*300)
    rand_noise_len: int = 15000


@dataclasses.dataclass(frozen=True)
class HiFTConfig:
    """HiFT-Net vocoder: NSF source + ISTFT head (hifigan/generator.py:378-475).

    Defaults are the 24 kHz configuration (prod(upsample_rates) * istft hop
    = 8*5*3*4 = 480 samples per mel frame, i.e. 50 Hz mel at 24 kHz).
    """

    in_channels: int = 80
    base_channels: int = 512
    nb_harmonics: int = 8
    sampling_rate: int = 24000
    nsf_alpha: float = 0.1
    nsf_sigma: float = 0.003
    nsf_voiced_threshold: float = 10.0
    upsample_rates: Tuple[int, ...] = (8, 5, 3)
    upsample_kernel_sizes: Tuple[int, ...] = (16, 11, 7)
    istft_n_fft: int = 16
    istft_hop_len: int = 4
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    source_resblock_kernel_sizes: Tuple[int, ...] = (7, 7, 11)
    source_resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    lrelu_slope: float = 0.1
    audio_limit: float = 0.99
    f0_cond_channels: int = 512

    @property
    def upsample_scale(self) -> int:
        s = self.istft_hop_len
        for r in self.upsample_rates:
            s *= r
        return s


@dataclasses.dataclass(frozen=True)
class MelConfig:
    """24 kHz mel features fed to flow/hift (scripts/preprocess/audio.py:45,
    train_speech_model.py:507: mel_spectrogram(wav, 1920, 80, 24000, 480, 1920, 0, None))."""

    sample_rate: int = 24000
    n_fft: int = 1920
    num_mels: int = 80
    hop_size: int = 480
    win_size: int = 1920
    fmin: float = 0.0
    fmax: Optional[float] = None


@dataclasses.dataclass(frozen=True)
class SamplingConfig:
    """RAS sampling defaults (utils/common.py:138, server/router.py:22-59)."""

    top_p: float = 0.8
    top_k: int = 25
    win_size: int = 10
    tau_r: float = 0.1
    # `sampling` int passed through to random fallback (unused by it) — kept
    # for interface parity with the reference Callable.
    sampling: int = 25


@dataclasses.dataclass(frozen=True)
class HydraVoxConfig:
    """Full three-model stack."""

    llm: LLMConfig = LLMConfig()
    flow: FlowConfig = FlowConfig()
    hift: HiFTConfig = HiFTConfig()
    mel: MelConfig = MelConfig()
    sample_rate: int = 24000
    # serving defaults (server/router.py:22-59)
    tts_sampling: SamplingConfig = SamplingConfig(top_p=0.9, top_k=10, win_size=24, tau_r=0.2)
    zero_shot_sampling: SamplingConfig = SamplingConfig(top_p=0.9, top_k=10, win_size=32, tau_r=0.2)


def _build(cls, data):
    """Recursively build a (possibly nested) dataclass from a plain dict."""
    fields = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    for key, value in data.items():
        if key not in fields:
            continue
        ftype = fields[key].type
        default = fields[key].default
        if dataclasses.is_dataclass(default) and isinstance(value, dict):
            kwargs[key] = _build(type(default), value)
        elif isinstance(value, list):
            kwargs[key] = tuple(tuple(v) if isinstance(v, list) else v for v in value)
        else:
            kwargs[key] = value
        del ftype
    return cls(**kwargs)


def load_config(path_or_dict) -> HydraVoxConfig:
    """Load a HydraVoxConfig from a JSON file path or a plain dict."""
    if isinstance(path_or_dict, dict):
        return _build(HydraVoxConfig, path_or_dict)
    with open(path_or_dict) as f:
        return _build(HydraVoxConfig, json.load(f))


def tiny_config() -> HydraVoxConfig:
    """A tiny config for tests: same topology, small dims."""
    return HydraVoxConfig(
        llm=LLMConfig(
            backbone=Qwen2Config(
                hidden_size=64, num_layers=2, num_heads=4, num_kv_heads=2,
                head_dim=16, intermediate_size=128, vocab_size=256,
            ),
            speech_token_size=50,
            extra_vocab=8,
            head_num=3,
            inference_head_num=2,
            mtp_head_num=4,
        ),
        flow=FlowConfig(
            input_size=32,
            vocab_size=50,
            estimator=DiTConfig(dim=64, depth=2, heads=4, dim_head=16, ff_mult=2,
                                mel_dim=80, mu_dim=32, spk_dim=80, freq_embed_dim=32),
            rand_noise_len=2048,
        ),
        hift=HiFTConfig(base_channels=32, f0_cond_channels=32),
    )
