"""Trained spec-readout checkpoint: exact round-trip + channel augmentation.

The committed artifact (flowmirror_hydravox_tpu/assets/spec_readout.npz) is
a bf16 bit-pattern store of the trained llm_decoder; loading must be exact
(tools/train_spec_ckpt.py), and the frontend channel augmentation
(train/augment.py) must be label-preserving and bounded.
"""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

pytestmark = pytest.mark.quick


def test_spec_readout_roundtrip(tmp_path):
    from flowmirror_hydravox_tpu.tools.train_spec_ckpt import load_spec_readout

    dec = (np.random.default_rng(0).standard_normal((8, 16)) * 0.3
           ).astype(jnp.bfloat16)
    path = os.path.join(tmp_path, "ck.npz")
    np.savez_compressed(
        path, llm_decoder_bf16_bits=np.asarray(dec).view(np.uint16),
        meta=json.dumps({"train_acc": 0.9, "config": "test"}))
    params = {"llm_decoder": jnp.zeros((8, 16), jnp.bfloat16),
              "speech_embedding": jnp.ones((24, 16), jnp.bfloat16)}
    loaded, meta = load_spec_readout(params, path)
    assert meta["train_acc"] == 0.9
    # bit-exact round trip
    assert np.array_equal(np.asarray(loaded["llm_decoder"]).view(np.uint16),
                          np.asarray(dec).view(np.uint16))
    # decoder-only artifact leaves the embedding untouched
    assert np.array_equal(np.asarray(loaded["speech_embedding"]),
                          np.asarray(params["speech_embedding"]))

    # artifact with trained embedding rows: rows [0, M) replaced, rest kept
    rows = (np.random.default_rng(1).standard_normal((4, 16)) * 0.1
            ).astype(jnp.bfloat16)
    path2 = os.path.join(tmp_path, "ck2.npz")
    np.savez_compressed(
        path2, llm_decoder_bf16_bits=np.asarray(dec).view(np.uint16),
        speech_embedding_rows_bf16_bits=np.asarray(rows).view(np.uint16),
        meta=json.dumps({"train_acc": 0.8}))
    loaded2, _ = load_spec_readout(params, path2)
    emb2 = np.asarray(loaded2["speech_embedding"])
    assert np.array_equal(emb2[:4].view(np.uint16),
                          np.asarray(rows).view(np.uint16))
    assert np.array_equal(emb2[4:], np.asarray(params["speech_embedding"])[4:])
    # shape mismatch is a loud error, not silent reshaping
    bad = {"llm_decoder": jnp.zeros((4, 16), jnp.bfloat16)}
    with pytest.raises(AssertionError):
        load_spec_readout(bad, path)


def test_spec_readout_committed_asset_loads():
    """The committed flagship artifact parses and matches the flagship
    decoder shape (skipped until the asset ships)."""
    from flowmirror_hydravox_tpu.config import HydraVoxConfig
    from flowmirror_hydravox_tpu.tools.train_spec_ckpt import DEFAULT_ASSET

    if not os.path.exists(DEFAULT_ASSET):
        pytest.skip("spec_readout.npz not committed yet")
    cfg = HydraVoxConfig().llm
    with np.load(DEFAULT_ASSET) as z:
        bits = z["llm_decoder_bf16_bits"]
        meta = json.loads(str(z["meta"]))
    assert bits.shape == (cfg.backbone.hidden_size, cfg.vocab_size)
    assert meta["config"] == "flagship" and meta["train_acc"] > 0.5


def test_augment_label_preserving_and_bounded():
    from flowmirror_hydravox_tpu.train.augment import augment_batches, augment_wav

    rng = np.random.default_rng(0)
    t = np.arange(16000) / 16000.0
    w = (0.4 * np.sin(2 * np.pi * 200 * t)).astype(np.float32)
    outs = [augment_wav(np.random.default_rng(i), w) for i in range(6)]
    for o in outs:
        assert o.shape == w.shape and o.dtype == np.float32
        assert np.abs(o).max() <= 0.99 + 1e-6
    # distinct channel realizations (augmentation actually does something)
    assert any(not np.allclose(outs[0], o) for o in outs[1:])
    # deterministic per seed
    a = augment_wav(np.random.default_rng(5), w)
    b = augment_wav(np.random.default_rng(5), w)
    assert np.array_equal(a, b)

    wavs = np.stack([w, -w])
    labels = np.asarray([3, 7], np.int32)
    aug, lab = next(augment_batches(iter([(wavs, labels)]), seed=1))
    assert aug.shape == wavs.shape
    assert np.array_equal(lab, labels)
    del rng
