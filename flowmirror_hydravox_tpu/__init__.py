"""FlowMirror-HydraVox TPU — a TPU-native (JAX/XLA/Pallas/pjit) rebuild of the
HydraVox CosyVoice-3-derived multi-head TTS stack.

Pipeline: text -> [Qwen2-0.5B + MTP heads LLM] -> speech tokens (25 Hz)
          -> [DiT conditional-flow-matching mel decoder, 10 Euler steps]
          -> 80-bin mel (50 Hz) -> [HiFT NSF+ISTFT vocoder] -> 24 kHz wav.
"""

__version__ = "0.1.0"

from .config import (  # noqa: F401
    DiTConfig,
    FlowConfig,
    HiFTConfig,
    HydraVoxConfig,
    LLMConfig,
    MelConfig,
    Qwen2Config,
    SamplingConfig,
    load_config,
    tiny_config,
)
