"""Stage 4: per-sample feature extraction over an HF dataset.

Replaces reference scripts/preprocess/extract_speech_token_dataset.py (ONNX
speech tokenizer + CampPlus + 24 kHz mel) with the native JAX extractors:
adds columns speech_token / speech_token_len / embedding / mel / mel_len to
every row, batched through jitted programs.

Usage:
  python -m flowmirror_hydravox_tpu.preprocess.extract_tokens \
      --input_dir stage3_ds/ --output_dir stage4_ds/ \
      [--tokenizer_ckpt tok.npz] [--speaker_ckpt spk.npz]
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np

logger = logging.getLogger("hydravox.extract")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--input_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--tokenizer_ckpt", default=None, help="npz weights for the FSQ tokenizer")
    p.add_argument("--speaker_ckpt", default=None)
    p.add_argument("--mel_fmax", type=float, default=None)
    p.add_argument("--num_proc", type=int, default=1)
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    import datasets
    import jax
    import jax.numpy as jnp

    from ..config import MelConfig
    from ..frontend import speech_tokenizer as st
    from ..train.checkpoint import load_params_npz
    from ..utils import audio as audio_utils

    st_cfg = st.SpeechTokenizerConfig()
    spk_cfg = st.SpeakerEncoderConfig()
    tok_params = st.init_tokenizer_params(jax.random.PRNGKey(0), st_cfg)
    spk_params = st.init_speaker_params(jax.random.PRNGKey(1), spk_cfg)
    if args.tokenizer_ckpt:
        tok_params = load_params_npz(args.tokenizer_ckpt, tok_params)
    if args.speaker_ckpt:
        spk_params = load_params_npz(args.speaker_ckpt, spk_params)

    mel_cfg = MelConfig(fmax=args.mel_fmax)
    tokenize = jax.jit(lambda w: st.tokenize_waveform(tok_params, st_cfg, w))
    spk_embed = jax.jit(lambda m: st.speaker_embedding(spk_params, spk_cfg, m))

    def extract(row):
        wav = np.asarray(row["audio"]["array"], np.float32)
        sr = row["audio"]["sampling_rate"]
        wav_j = jnp.asarray(wav)[None]

        # speech tokens (16 kHz, 25 Hz frames)
        wav16 = audio_utils.resample_linear(wav_j, sr, 16000)
        pad = (-wav16.shape[-1]) % 640
        if pad:
            wav16 = jnp.pad(wav16, ((0, 0), (0, pad)))
        tokens = np.asarray(tokenize(wav16))[0]

        # 24 kHz mel, even length (train_speech_model.py:503-507 parity)
        wav24 = audio_utils.resample_linear(wav_j, sr, mel_cfg.sample_rate)
        mel = audio_utils.mel_spectrogram(
            wav24, mel_cfg.n_fft, mel_cfg.num_mels, mel_cfg.sample_rate,
            mel_cfg.hop_size, mel_cfg.win_size, mel_cfg.fmin, mel_cfg.fmax,
        )
        mel = np.asarray(mel)[0].T  # (Tm, 80)
        n = min(len(tokens), mel.shape[0] // 2)
        tokens, mel = tokens[:n], mel[: 2 * n]

        # speaker embedding from 16 kHz fbank
        fbank = audio_utils.mel_spectrogram(wav16, 400, 80, 16000, 160, 400)
        emb = np.asarray(spk_embed(fbank))[0]

        return {
            "speech_token": tokens.tolist(),
            "speech_token_len": int(n),
            "embedding": emb.astype(np.float32),
            "mel": mel.astype(np.float32),
            "mel_len": int(mel.shape[0]),
        }

    ds = datasets.load_from_disk(args.input_dir)
    ds = ds.map(extract, num_proc=args.num_proc)
    # basic cleaning: drop empty-token rows (reference data cleaning step)
    before = len(ds)
    ds = ds.filter(lambda r: r["speech_token_len"] > 0)
    os.makedirs(args.output_dir, exist_ok=True)
    ds.save_to_disk(args.output_dir)
    logger.info("saved %d rows (%d dropped) to %s", len(ds), before - len(ds), args.output_dir)


def merge_datasets(paths, output_dir):
    """Stage 5 (reference data_tab.py:710): concatenate stage-4 datasets."""
    import datasets

    parts = [datasets.load_from_disk(p) for p in paths]
    out = datasets.concatenate_datasets(parts)
    out.save_to_disk(output_dir)
    return len(out)


if __name__ == "__main__":
    main()
