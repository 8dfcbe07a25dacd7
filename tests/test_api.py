"""Library API (api.HydraVox — reference cli/cosyvoice.py orchestrators)."""

import numpy as np
import pytest

from flowmirror_hydravox_tpu.api import CosyVoice3, HydraVox

# nightly tier: the module fixture compiles several tiny-config programs
# (~4 min on CPU); the underlying engine paths are in the quick tier already


@pytest.fixture(scope="module")
def hv():
    return HydraVox(tiny=True, max_tokens=64)


def test_alias():
    assert CosyVoice3 is HydraVox


def test_list_and_register_speakers(hv):
    assert "default" in hv.list_available_spks()
    wav = np.random.default_rng(0).standard_normal(16000).astype(np.float32) * 0.1
    assert hv.add_zero_shot_spk("hello there", wav, 16000, "alice")
    assert "alice" in hv.list_available_spks()


def test_inference_sft_offline(hv):
    outs = list(hv.inference_sft("hello world", "default"))
    assert len(outs) >= 1
    for out in outs:
        assert out["sample_rate"] == hv.sample_rate
        wav = out["tts_speech"]
        assert wav.dtype == np.float32 and wav.ndim == 1 and len(wav) > 0
        assert np.isfinite(wav).all()


def test_inference_zero_shot_registered_spk(hv):
    # registered zero-shot speaker id reuses stored prompt features
    outs = list(hv.inference_zero_shot("short test", "", None, 16000,
                                       zero_shot_spk_id="alice"))
    assert len(outs) == 1 and len(outs[0]["tts_speech"]) > 0


def test_registered_zero_shot_keeps_prompt_text(hv):
    """frontend_zero_shot_registered must prepend the stored prompt text
    tokens (reference cli/frontend.py:163-170), unlike plain sft."""
    feats = hv.frontend.frontend_zero_shot_registered("hi there", "alice")
    assert len(feats["text_tokens"]) > feats["tts_text_len"]
    sft = hv.frontend.frontend_sft("hi there", "alice")
    assert len(sft["text_tokens"]) == sft["tts_text_len"]


def test_text_frontend_false_skips_normalization(hv):
    """Reference API kwarg text_frontend=False must be accepted and skip TN."""
    outs = list(hv.inference_sft("raw 42 text", "default", text_frontend=False))
    assert len(outs) == 1 and len(outs[0]["tts_speech"]) > 0
