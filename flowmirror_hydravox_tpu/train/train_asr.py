"""Train the tiny native CTC ASR (preprocess/asr_model.py).

Two data paths:

  - default: the deterministic synthetic corpus (synth_speech.py).  Each
    utterance's transcription ground truth is its ordered phoneme-like
    segment symbols (synth_utterance_with_segments), with light noise
    augmentation so the recognizer keys on spectro-temporal structure.  The
    shipped demo checkpoint (preprocess/assets/asr.npz) comes from this
    recipe; metrics in preprocess/assets/README.md.

      python -m flowmirror_hydravox_tpu.train.train_asr \\
          --output_dir ckpt/asr --max_steps 3000

  - --dataset DIR: any HF dataset with {text, audio{array,sampling_rate}}
    rows (the stage-3 output schema).  A char vocabulary is built from the
    data (--sep " " for word/space-joined units).  This is the path to a
    real-language checkpoint when a corpus exists; the model itself is the
    same (reference stage-3 ASR role, transcribe_to_dataset.py:219-418).
"""

from __future__ import annotations

import argparse
import logging
import os
import time

import numpy as np

logger = logging.getLogger("hydravox.train_asr")

SR = 16000


def synthetic_pool(seconds: float, seed: int, vocab, n_speakers: int = 256,
                   pool: int = 768, noise_pool: int = 32, max_label: int = 48):
    """Finite synthetic corpus as dense int16 arrays, built host-side once:
    {speech (P,T) i16, labels (P,L) i32, label_len (P,) i32, noise (N,T) i16}.

    The training loop pushes this to the device ONCE and does batching +
    noise augmentation on-device (see main): on a tunneled TPU a per-step
    host->device transfer of raw audio stalls the whole run, and it is
    unnecessary — the pool fits HBM trivially.

    Clip synthesis is pinned to corpus seed=1 BY DESIGN (only the noise pool
    varies with `seed`): tools/eval_asr holds out by (speaker, utterance) id
    against this fixed seed-1 corpus, so varying the clip seed would silently
    break the held-out split contract."""
    from concurrent.futures import ThreadPoolExecutor

    from .synth_speech import synth_noise, synth_utterance_with_segments

    sym_to_id = {s: i + 1 for i, s in enumerate(vocab)}
    n = int(seconds * SR)
    with ThreadPoolExecutor(8) as ex:
        clips = list(ex.map(
            lambda u: synth_utterance_with_segments(u % n_speakers, u,
                                                    seconds, seed=1),
            range(pool)))
        noises = list(ex.map(
            lambda i: synth_noise(["white", "pink", "hum", "babble"][i % 4],
                                  n, np.random.default_rng(
                                      np.random.SeedSequence([seed, 0xA53, i]))),
            range(noise_pool)))
    speech, labels, label_len = [], [], []
    for w, segs in clips:
        if not segs or len(segs) > max_label:
            continue
        speech.append(np.clip(w[:n] * 32767.0, -32767, 32767).astype(np.int16))
        lab = np.zeros(max_label, np.int32)
        lab[:len(segs)] = [sym_to_id[s] for s in segs]
        labels.append(lab)
        label_len.append(len(segs))
    return {
        "speech": np.stack(speech),
        "labels": np.stack(labels),
        "label_len": np.asarray(label_len, np.int32),
        "noise": np.stack([np.clip(z * 32767.0, -32767, 32767).astype(np.int16)
                           for z in noises]),
    }


def synthetic_batches(batch_size: int, seconds: float, seed: int, vocab,
                      n_speakers: int = 256, pool: int = 768,
                      noise_pool: int = 32, max_label: int = 48):
    """Host-side generator over the synthetic pool — used by tests and CPU
    runs; (wavs (B,T) f32, wav_len, labels (B,L), label_len), labels 1-based
    (0 = CTC blank), mild noise augmentation (SNR 10-40 dB or clean)."""
    p = synthetic_pool(seconds, seed, vocab, n_speakers, pool, noise_pool,
                       max_label)
    rng = np.random.default_rng(np.random.SeedSequence([seed, 0xA52]))
    n = int(seconds * SR)
    n_pool, n_noise = len(p["speech"]), len(p["noise"])
    while True:
        idx = rng.integers(0, n_pool, batch_size)
        wavs = p["speech"][idx].astype(np.float32) / 32767.0
        for r in range(batch_size):
            if rng.random() < 0.5:
                noise = (p["noise"][int(rng.integers(n_noise))]
                         .astype(np.float32) / 32767.0)
                snr_db = rng.uniform(10.0, 40.0)
                sp = np.sqrt(np.mean(wavs[r] ** 2) + 1e-9)
                npow = np.sqrt(np.mean(noise ** 2) + 1e-9)
                wavs[r] += noise * (sp / npow) * (10.0 ** (-snr_db / 20.0))
            wavs[r] *= rng.uniform(0.3, 1.0)
        yield (wavs, np.full(batch_size, n, np.int32),
               p["labels"][idx], p["label_len"][idx])


def dataset_batches(dataset_dir: str, batch_size: int, seconds: float,
                    seed: int, sep: str, max_label: int):
    """HF-dataset path: builds (vocab, generator).  Rows longer than
    `seconds` or `max_label` units are dropped; audio is resampled to 16 kHz
    host-side."""
    import datasets

    from ..preprocess.transcribe import _resample_mono

    ds = datasets.load_from_disk(dataset_dir)
    units = sorted({u for row in ds
                    for u in (row["text"].split(sep) if sep else row["text"])
                    if u})
    sym_to_id = {s: i + 1 for i, s in enumerate(units)}
    n = int(seconds * SR)
    rows = []
    for row in ds:
        wav = _resample_mono(np.asarray(row["audio"]["array"], np.float32),
                             int(row["audio"]["sampling_rate"]))
        lab = [sym_to_id[u]
               for u in (row["text"].split(sep) if sep else row["text"]) if u]
        if 0 < len(lab) <= max_label and len(wav) <= n:
            rows.append((wav, lab))
    if not rows:
        raise SystemExit("no usable rows (check --seconds / --max_label)")
    logger.info("dataset: %d usable rows, vocab %d", len(rows), len(units))

    def gen():
        rng = np.random.default_rng(seed)
        while True:
            idx = rng.integers(0, len(rows), batch_size)
            wavs = np.zeros((batch_size, n), np.float32)
            wav_len = np.zeros(batch_size, np.int32)
            labels = np.zeros((batch_size, max_label), np.int32)
            label_len = np.zeros(batch_size, np.int32)
            for r, i in enumerate(idx):
                wav, lab = rows[i]
                wavs[r, :len(wav)] = wav
                wav_len[r] = len(wav)
                labels[r, :len(lab)] = lab
                label_len[r] = len(lab)
            yield wavs, wav_len, labels, label_len

    return units, gen()


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--output_dir", required=True)
    p.add_argument("--dataset", default=None,
                   help="HF dataset dir ({text, audio} rows); default = "
                        "synthetic segment corpus")
    p.add_argument("--sep", default="",
                   help="text unit separator for --dataset ('' = chars)")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--seconds", type=float, default=4.0)
    p.add_argument("--max_label", type=int, default=48)
    p.add_argument("--learning_rate", type=float, default=2e-3)
    p.add_argument("--max_steps", type=int, default=3000)
    p.add_argument("--logging_steps", type=int, default=100)
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    import jax
    import jax.numpy as jnp
    import optax

    from ..preprocess import asr_model
    from ..train.synth_speech import FRIC_SYMBOLS, VOWEL_SYMBOLS

    if args.dataset:
        vocab, gen = dataset_batches(args.dataset, args.batch_size,
                                     args.seconds, args.seed, args.sep,
                                     args.max_label)
        pool = None
    else:
        vocab = list(VOWEL_SYMBOLS) + list(FRIC_SYMBOLS)
        pool = synthetic_pool(args.seconds, args.seed, vocab,
                              max_label=args.max_label)
        logger.info("pool: %d clips, %d noise", len(pool["speech"]),
                    len(pool["noise"]))

    os.makedirs(args.output_dir, exist_ok=True)
    cfg = asr_model.ASRModelConfig(vocab_size=len(vocab) + 1)
    params = asr_model.init_params(jax.random.PRNGKey(args.seed), cfg)
    n_params = sum(a.size for a in jax.tree.leaves(params))
    logger.info("vocab %d, params %.2fM", len(vocab), n_params / 1e6)

    warmup = min(200, max(args.max_steps // 10, 1))
    opt = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(optax.warmup_cosine_decay_schedule(
            0.0, args.learning_rate, warmup, max(args.max_steps, warmup + 1))))
    opt_state = opt.init(params)

    def train_step(params, opt_state, wavs, wav_len, labels, label_len):
        (loss, emit), grads = jax.value_and_grad(
            lambda p: asr_model.ctc_loss(p, cfg, wavs, wav_len, labels,
                                         label_len), has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, emit

    t0 = time.time()
    if pool is not None:
        # Device-resident training: the whole pool ships to HBM once (int16)
        # and batching + noise augmentation happen INSIDE the jitted step —
        # per-dispatch host traffic is one PRNG key.  lax.scan chains
        # logging_steps steps per dispatch so a tunneled TPU pays its
        # dispatch latency once per log line, not once per step.
        dev = {k: jnp.asarray(v) for k, v in pool.items()}
        b, n = args.batch_size, int(args.seconds * SR)
        n_pool, n_noise = dev["speech"].shape[0], dev["noise"].shape[0]

        def device_batch(key):
            k1, k2, k3, k4, k5 = jax.random.split(key, 5)
            idx = jax.random.randint(k1, (b,), 0, n_pool)
            wav = dev["speech"][idx].astype(jnp.float32) / 32767.0
            noise = (dev["noise"][jax.random.randint(k2, (b,), 0, n_noise)]
                     .astype(jnp.float32) / 32767.0)
            snr_db = jax.random.uniform(k3, (b,), minval=10.0, maxval=40.0)
            use = (jax.random.uniform(k4, (b,)) < 0.5).astype(jnp.float32)
            sp = jnp.sqrt(jnp.mean(wav ** 2, axis=1) + 1e-9)
            npow = jnp.sqrt(jnp.mean(noise ** 2, axis=1) + 1e-9)
            gain = use * (sp / npow) * 10.0 ** (-snr_db / 20.0)
            wav = wav + noise * gain[:, None]
            wav = wav * jax.random.uniform(k5, (b,), minval=0.3,
                                           maxval=1.0)[:, None]
            return (wav, jnp.full((b,), n, jnp.int32),
                    dev["labels"][idx], dev["label_len"][idx])

        from functools import partial

        @partial(jax.jit, static_argnums=3)
        def step_chunk(params, opt_state, key, chunk_len):
            def body(carry, i):
                params, opt_state = carry
                wavs, wav_len, labels, label_len = device_batch(
                    jax.random.fold_in(key, i))
                params, opt_state, loss, emit = train_step(
                    params, opt_state, wavs, wav_len, labels, label_len)
                return (params, opt_state), (loss, emit)
            (params, opt_state), (losses, emits) = jax.lax.scan(
                body, (params, opt_state), jnp.arange(chunk_len))
            return params, opt_state, losses[-1], emits[-1]

        chunk = max(1, min(args.logging_steps, args.max_steps))
        base = jax.random.PRNGKey(args.seed + 1)
        done = 0
        while done < args.max_steps:
            this = min(chunk, args.max_steps - done)
            params, opt_state, loss, emit = step_chunk(
                params, opt_state, jax.random.fold_in(base, done), this)
            done += this
            logger.info("step %d loss %.4f emit-frac %.3f (%.1fs)",
                        done, float(loss), float(emit), time.time() - t0)
    else:
        # host-batch path (real datasets): prefetch assembly behind the step
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=4)

        def _feed():
            for x in gen:
                q.put(x)

        threading.Thread(target=_feed, daemon=True).start()
        step = jax.jit(train_step)
        for i in range(args.max_steps):
            wavs, wav_len, labels, label_len = q.get()
            params, opt_state, loss, emit = step(
                params, opt_state, jnp.asarray(wavs), jnp.asarray(wav_len),
                jnp.asarray(labels), jnp.asarray(label_len))
            if (i + 1) % args.logging_steps == 0 or i == 0:
                logger.info("step %d loss %.4f emit-frac %.3f (%.1fs)",
                            i + 1, float(loss), float(emit), time.time() - t0)

    out = os.path.join(args.output_dir, "asr.npz")
    asr_model.save_ckpt(
        out, jax.tree.map(lambda a: np.asarray(a, np.float16),
                          jax.device_get(params)), cfg, vocab)
    logger.info("done: %s", out)


if __name__ == "__main__":
    main()
