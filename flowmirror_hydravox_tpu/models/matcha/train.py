"""Matcha-TTS training (reference matcha/train.py + data/text_mel_datamodule.py).

Pipeline: filelist (wav_path|transcript per line, LJSpeech layout) ->
phoneme-id sequences (interspersed with blanks) + normalized 22.05 kHz mel
(n_fft 1024, hop 256, 80 bins, fmax 8000) -> per-batch MAS alignment on the
host (native C++ kernel) -> jitted dur/prior/CFM loss + optax step.

Usage:
  python -m flowmirror_hydravox_tpu.models.matcha.train \
      --filelist train.txt --output_dir ckpts/matcha --batch_size 8
"""

from __future__ import annotations

import argparse
import logging
import time
from typing import List, Tuple

import numpy as np

logger = logging.getLogger("hydravox.matcha.train")


def load_filelist(path: str) -> List[Tuple[str, str]]:
    rows = []
    with open(path) as f:
        for line in f:
            parts = line.strip().split("|")
            if len(parts) >= 2:
                rows.append((parts[0], parts[-1]))
    return rows


def mel_22k(wav: np.ndarray, sr: int) -> np.ndarray:
    """(T,) -> (80, frames) matcha mel (meldataset.py params)."""
    import jax.numpy as jnp

    from ...utils.audio import mel_spectrogram, resample_linear

    w = resample_linear(jnp.asarray(wav, jnp.float32)[None], sr, 22050)
    mel = mel_spectrogram(w, 1024, 80, 22050, 256, 1024, 0.0, 8000.0)
    return np.asarray(mel)[0]


def compute_data_statistics(mels: List[np.ndarray]) -> Tuple[float, float]:
    """Mel mean/std over the corpus (matcha/utils/generate_data_statistics.py)."""
    flat = np.concatenate([m.reshape(-1) for m in mels])
    return float(flat.mean()), float(flat.std())


def main(argv=None):
    p = argparse.ArgumentParser("matcha-train")
    p.add_argument("--filelist", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--max_steps", type=int, default=100_000)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--logging_steps", type=int, default=20)
    p.add_argument("--save_steps", type=int, default=2000)
    p.add_argument("--out_size_frames", type=int, default=256,
                   help="random mel segment length for the CFM loss "
                        "(Grad-TTS cut, matcha_tts.py:202-224; 0 = full)")
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    import jax
    import jax.numpy as jnp

    from ...train.checkpoint import save_params_npz
    from ...train.steps import OptimConfig, init_state, make_optimizer, _apply_grads
    from ...utils.wavio import decode_wav
    from . import model as matcha_model
    from . import text as matcha_text
    from .model import MatchaConfig

    rows = load_filelist(args.filelist)
    logger.info("%d utterances", len(rows))

    # preload + featurize (small-corpus path; large corpora should use the
    # HF-dataset pipeline in train/data.py)
    feats = []
    for path, text in rows:
        with open(path, "rb") as f:
            wav, sr = decode_wav(f.read())
        ids = matcha_text.intersperse(matcha_text.text_to_sequence(text))
        feats.append((np.asarray(ids, np.int32), mel_22k(wav, sr)))
    mean, std = compute_data_statistics([m for _, m in feats])
    logger.info("mel stats: mean %.3f std %.3f", mean, std)

    cfg = MatchaConfig(mel_mean=mean, mel_std=std)
    params = matcha_model.init_params(jax.random.PRNGKey(args.seed), cfg)
    optimizer = make_optimizer(OptimConfig(
        learning_rate=args.learning_rate, warmup_steps=1000, total_steps=args.max_steps,
    ))
    state = init_state(params, optimizer)

    def pad_batch(batch):
        tx = max(len(x) for x, _ in batch)
        ty = max(m.shape[1] for _, m in batch)
        x = np.zeros((len(batch), tx), np.int32)
        xl = np.zeros((len(batch),), np.int32)
        y = np.zeros((len(batch), 80, ty), np.float32)
        yl = np.zeros((len(batch),), np.int32)
        for i, (ids, mel) in enumerate(batch):
            x[i, : len(ids)] = ids
            xl[i] = len(ids)
            norm = (mel - mean) / std
            y[i, :, : mel.shape[1]] = norm
            yl[i] = mel.shape[1]
        return x, xl, y, yl

    @jax.jit
    def step(st, rng, x, xl, y, yl, attn):
        def loss_fn(pp):
            out = matcha_model.forward_loss(pp, cfg, rng, x, xl, y, yl, attn)
            return out["loss"], out

        (_, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(st.params)
        new_state, gnorm = _apply_grads(st, grads, optimizer)
        return new_state, {**out, "grad_norm": gnorm}

    rng = jax.random.PRNGKey(args.seed)
    order = np.arange(len(feats))
    nstep, epoch, t0 = 0, 0, time.time()
    while nstep < args.max_steps and (args.epochs is None or epoch < args.epochs):
        np.random.default_rng(args.seed + epoch).shuffle(order)
        for start in range(0, len(order) - args.batch_size + 1, args.batch_size):
            batch = [feats[i] for i in order[start : start + args.batch_size]]
            x, xl, y, yl = pad_batch(batch)
            if args.out_size_frames and y.shape[2] > args.out_size_frames:
                # MAS on the full mel, then cut a random segment (cut applied
                # to both mel and alignment columns)
                attn = matcha_model.compute_alignment(state.params, cfg, x, xl, y, yl)
                off = np.random.default_rng(nstep).integers(
                    0, max(y.shape[2] - args.out_size_frames, 1)
                )
                y = y[:, :, off : off + args.out_size_frames]
                attn = attn[:, :, off : off + args.out_size_frames]
                yl = np.minimum(np.maximum(yl - off, 1), args.out_size_frames)
            else:
                attn = matcha_model.compute_alignment(state.params, cfg, x, xl, y, yl)

            rng, srng = jax.random.split(rng)
            state, metrics = step(state, srng, jnp.asarray(x), jnp.asarray(xl),
                                  jnp.asarray(y), jnp.asarray(yl), jnp.asarray(attn))
            nstep = int(state.step)
            if nstep % args.logging_steps == 0:
                logger.info(
                    "step %d loss %.4f (dur %.4f prior %.4f diff %.4f) gnorm %.2f (%.2f s/it)",
                    nstep, float(metrics["loss"]), float(metrics["dur_loss"]),
                    float(metrics["prior_loss"]), float(metrics["diff_loss"]),
                    float(metrics["grad_norm"]), (time.time() - t0) / max(args.logging_steps, 1),
                )
                t0 = time.time()
            if nstep % args.save_steps == 0 and nstep > 0:
                save_params_npz(f"{args.output_dir}/matcha_step{nstep}.npz", state.params)
            if nstep >= args.max_steps:
                break
        epoch += 1

    save_params_npz(f"{args.output_dir}/matcha_final.npz", state.params)
    logger.info("done at step %d", nstep)


if __name__ == "__main__":
    main()
