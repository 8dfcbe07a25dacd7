"""Train the tiny native VAD (preprocess/vad_model.py) on synthetic
speech+noise mixtures with exact activity ground truth.

No external data or VAD weights exist in this image, so supervision comes
from the formant synthesizer (synth_speech.py), which knows exactly where it
placed speech vs pauses.  Each example mixes a synthetic utterance with one
of {white, pink, hum, babble} noise at a random SNR in [-5, 30] dB (or is
pure noise / clean speech), so the classifier must learn spectro-temporal
speech structure, not just energy — exactly where the energy VAD baseline
fails (tools/eval_vad.py quantifies the gap).

  python -m flowmirror_hydravox_tpu.train.train_vad \
      --output_dir ckpt/vad --max_steps 2000

The shipped checkpoint (preprocess/assets/vad.npz) comes from this recipe
with the default flags.
"""

from __future__ import annotations

import argparse
import logging
import os
import time

import numpy as np

logger = logging.getLogger("hydravox.train_vad")

SR = 16000
HOP = 160  # 10 ms


def mixture_batches(batch_size: int, seconds: float, seed: int,
                    speech_pool: int = 768, noise_pool: int = 48):
    """(wavs (B,T), frame_labels (B,F)) with F = T//HOP.

    Synthesis is the bottleneck on a weak host (babble noise alone costs
    ~0.5 s/clip), so speech+masks and noise clips are pre-generated into
    pools and batches sample random crops — same distribution family, ~100x
    cheaper per step after warmup."""
    from .synth_speech import synth_noise, synth_utterance_with_mask

    rng = np.random.default_rng(np.random.SeedSequence([seed, 0x7AD]))
    n = int(seconds * SR)
    pool_n = n + SR  # 1 s of crop slack
    kinds = ["white", "pink", "hum", "babble"]
    speech_wavs, speech_masks = [], []
    for u in range(speech_pool):
        w, m = synth_utterance_with_mask(u % 256, u, pool_n / SR, seed=1)
        speech_wavs.append(w[:pool_n])
        speech_masks.append(m[:pool_n])
    noises = [synth_noise(kinds[i % len(kinds)], pool_n, rng)
              for i in range(noise_pool)]

    while True:
        wavs, labels = [], []
        for _ in range(batch_size):
            mode = rng.random()
            start = int(rng.integers(0, pool_n - n))
            if mode < 0.15:  # pure noise — label all zero
                wav = noises[int(rng.integers(noise_pool))][start:start + n].copy()
                wav = wav * rng.uniform(0.01, 0.6)
                mask = np.zeros(n, np.uint8)
            else:
                i = int(rng.integers(speech_pool))
                speech = speech_wavs[i][start:start + n]
                mask = speech_masks[i][start:start + n]
                if mode < 0.85:  # noisy mixture at random SNR
                    j = int(rng.integers(noise_pool))
                    noise = noises[j][start:start + n]
                    snr_db = rng.uniform(-5.0, 30.0)
                    sp = np.sqrt(np.mean(speech**2) + 1e-9)
                    npow = np.sqrt(np.mean(noise**2) + 1e-9)
                    wav = speech + noise * (sp / npow) * (10.0 ** (-snr_db / 20.0))
                else:  # clean
                    wav = speech.copy()
                wav = wav * rng.uniform(0.05, 1.0)
                peak = np.abs(wav).max()
                if peak > 1.0:
                    wav = wav / peak
            # frame label = any speech sample in the frame's hop window
            f = n // HOP
            mlab = mask[: f * HOP].reshape(f, HOP).max(axis=1)
            wavs.append(wav.astype(np.float32))
            labels.append(mlab)
        yield np.stack(wavs), np.stack(labels)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--output_dir", required=True)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--seconds", type=float, default=4.0)
    p.add_argument("--learning_rate", type=float, default=1e-3)
    p.add_argument("--max_steps", type=int, default=2000)
    p.add_argument("--logging_steps", type=int, default=100)
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    import jax
    import jax.numpy as jnp
    import optax

    from ..preprocess import vad_model
    from .checkpoint import save_params_npz

    os.makedirs(args.output_dir, exist_ok=True)
    cfg = vad_model.VADModelConfig()
    params = vad_model.init_params(jax.random.PRNGKey(args.seed), cfg)
    warmup = min(100, max(args.max_steps // 10, 1))
    opt = optax.adamw(optax.warmup_cosine_decay_schedule(
        0.0, args.learning_rate, warmup, max(args.max_steps, warmup + 1)))
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, wavs, labels):
        (loss, acc), grads = jax.value_and_grad(
            lambda p: vad_model.bce_loss(p, cfg, wavs, labels), has_aux=True
        )(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, acc

    # prefetch mixture synthesis (host) behind the device step
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=4)
    gen = mixture_batches(args.batch_size, args.seconds, args.seed)
    threading.Thread(target=lambda: [q.put(b) for b in gen], daemon=True).start()

    t0 = time.time()
    for i in range(args.max_steps):
        wavs, labels = q.get()
        params, opt_state, loss, acc = step(
            params, opt_state, jnp.asarray(wavs), jnp.asarray(labels))
        if (i + 1) % args.logging_steps == 0 or i == 0:
            logger.info("step %d loss %.4f acc %.3f (%.1fs)",
                        i + 1, float(loss), float(acc), time.time() - t0)
    save_params_npz(os.path.join(args.output_dir, "vad.npz"),
                    jax.tree.map(lambda a: np.asarray(a, np.float16),
                                 jax.device_get(params)))
    logger.info("done: %s", args.output_dir)


if __name__ == "__main__":
    main()
