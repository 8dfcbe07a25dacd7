"""Frontend-model training: the native FSQ speech tokenizer and the speaker
encoder (the components the reference ships only as frozen ONNX blobs,
speech_tokenizer_v3.onnx / campplus.onnx — SURVEY.md §2.12 items 2-3).

The reference has NO training path for these; this CLI is the TPU-native way
to close the zero-shot-fidelity gap without the external weights: train the
stand-in architectures on your own data (stage-1/2 preprocessing output).

  # self-supervised FSQ tokenizer: mel autoencoding through the bottleneck
  python -m flowmirror_hydravox_tpu.train.train_frontend --model tokenizer \
      --wav_dir data/wavs --output_dir ckpt/tokenizer

  # speaker encoder: AAM-softmax speaker classification (dir per speaker)
  python -m flowmirror_hydravox_tpu.train.train_frontend --model speaker \
      --wav_dir data/speakers --output_dir ckpt/speaker

Trained weights plug into the serving frontend via
`Frontend(..., tokenizer_params=..., speaker_params=...)` or the
HYDRAVOX_TOKENIZER_NPZ / HYDRAVOX_SPEAKER_NPZ env vars.
"""

from __future__ import annotations

import argparse
import glob
import logging
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger("hydravox.train_frontend")


def iter_wavs(wav_dir: str):
    """Yield (path, wav float32 mono, sample_rate) for every .wav under dir."""
    from ..utils.wavio import decode_wav

    for path in sorted(glob.glob(os.path.join(wav_dir, "**", "*.wav"), recursive=True)):
        try:
            wav, sr = decode_wav(open(path, "rb").read())
            yield path, wav, sr
        except Exception as e:  # skip unreadable files, keep training
            logger.warning("skipping %s (%s)", path, e)


def _resample_16k(wav: np.ndarray, sr: int) -> np.ndarray:
    if sr == 16000:
        return wav
    n = int(len(wav) * 16000 / sr)
    src = np.linspace(0, len(wav) - 1, n)
    lo = np.floor(src).astype(int)
    hi = np.minimum(lo + 1, len(wav) - 1)
    w = (src - lo).astype(np.float32)
    return (wav[lo] * (1 - w) + wav[hi] * w).astype(np.float32)


def _synthetic_batches(batch_size: int, seconds: float, n_speakers: int, seed: int):
    """Random-audio batches for smoke runs (no data needed)."""
    rng = np.random.default_rng(seed)
    n = int(16000 * seconds)
    while True:
        spk = rng.integers(0, n_speakers, batch_size)
        # give each "speaker" a distinct spectral tilt so the classification
        # smoke objective is learnable
        t = np.arange(n) / 16000.0
        wavs = np.stack([
            0.1 * np.sin(2 * np.pi * (120 + 60 * s) * t)
            + 0.02 * rng.standard_normal(n)
            for s in spk
        ]).astype(np.float32)
        yield wavs, spk.astype(np.int32)


def _wav_batches(wav_dir: str, batch_size: int, seconds: float, seed: int, epochs=None):
    """Tokenizer data: fixed-length 16 kHz crops from a wav directory."""
    n = int(16000 * seconds)
    rng = np.random.default_rng(seed)
    epoch = 0
    while epochs is None or epoch < epochs:
        buf = []
        for _, wav, sr in iter_wavs(wav_dir):
            wav = _resample_16k(wav, sr)
            if len(wav) < n:
                wav = np.pad(wav, (0, n - len(wav)))
            start = rng.integers(0, max(len(wav) - n, 1))
            buf.append(wav[start:start + n])
            if len(buf) == batch_size:
                yield np.stack(buf), None
                buf = []
        epoch += 1
        if not buf and epoch == 1 and epochs is None:
            # empty dir: nothing to train on
            return


def _speaker_batches(wav_dir: str, batch_size: int, seconds: float, seed: int, epochs=None):
    """Speaker data: subdirectory name = speaker label."""
    n = int(16000 * seconds)
    rng = np.random.default_rng(seed)
    files = sorted(glob.glob(os.path.join(wav_dir, "*", "*.wav")))
    speakers = sorted({os.path.basename(os.path.dirname(f)) for f in files})
    spk_id = {s: i for i, s in enumerate(speakers)}
    if not files:
        return
    epoch = 0
    while epochs is None or epoch < epochs:
        order = rng.permutation(len(files))
        buf, labels = [], []
        for idx in order:
            from ..utils.wavio import decode_wav

            wav, sr = decode_wav(open(files[idx], "rb").read())
            wav = _resample_16k(wav, sr)
            if len(wav) < n:
                wav = np.pad(wav, (0, n - len(wav)))
            start = rng.integers(0, max(len(wav) - n, 1))
            buf.append(wav[start:start + n])
            labels.append(spk_id[os.path.basename(os.path.dirname(files[idx]))])
            if len(buf) == batch_size:
                yield np.stack(buf), np.asarray(labels, np.int32)
                buf, labels = [], []
        epoch += 1


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", choices=["tokenizer", "speaker"], required=True)
    p.add_argument("--wav_dir", default=None,
                   help="wav directory (speaker mode: one subdir per speaker)")
    p.add_argument("--synthetic", action="store_true",
                   help="random-audio smoke mode (no data needed)")
    p.add_argument("--synthetic_speech", action="store_true",
                   help="deterministic formant-synthesis corpus "
                        "(train/synth_speech.py) — speech-like structure, no "
                        "data needed; the shipped checkpoints' recipe")
    p.add_argument("--corpus_utts", type=int, default=0,
                   help="synthetic_speech: pre-generate this many cached "
                        "utterances and sample crops (0 = stream fresh ones)")
    p.add_argument("--preset", choices=["reference", "shipped"], default="reference",
                   help="'shipped' = the committable mid-size config used for "
                        "the in-repo default checkpoints (fp16 on disk)")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--seconds", type=float, default=4.0, help="crop length")
    p.add_argument("--n_speakers", type=int, default=8,
                   help="speaker-count cap (synthetic mode / classifier size)")
    p.add_argument("--learning_rate", type=float, default=3e-4)
    p.add_argument("--warmup_steps", type=int, default=500)
    p.add_argument("--max_steps", type=int, default=50_000)
    p.add_argument("--logging_steps", type=int, default=50)
    p.add_argument("--save_steps", type=int, default=2000)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--tiny", action="store_true", help="tiny config (smoke)")
    p.add_argument("--augment", action="store_true",
                   help="apply label-preserving recording-channel "
                        "augmentation (reverb/noise/EQ/level — "
                        "train/augment.py); closes part of the "
                        "synthetic-to-real gap for the speaker encoder")
    p.add_argument("--augment_prob", type=float, default=0.5,
                   help="per-crop probability of augmenting (the rest stay "
                        "clean views — augment-only training collapses "
                        "between-speaker spread)")
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    from ..frontend import speech_tokenizer as st
    from .checkpoint import save_params_npz
    from .steps import OptimConfig, init_state, make_optimizer

    os.makedirs(args.output_dir, exist_ok=True)
    rng = jax.random.PRNGKey(args.seed)

    if args.model == "tokenizer":
        if args.tiny:
            cfg = st.SpeechTokenizerConfig(dim=64, num_layers=2, num_heads=4)
        elif args.preset == "shipped":
            cfg = st.SpeechTokenizerConfig(dim=256, num_layers=4, num_heads=4)
        else:
            cfg = st.SpeechTokenizerConfig()
        k1, k2 = jax.random.split(rng)
        params = {
            "enc": st.init_tokenizer_params(k1, cfg),
            "dec": st.init_decoder_params(k2, cfg),
        }

        def loss_fn(params, wavs):
            mel = st.whisper_log_mel(wavs, n_mels=cfg.n_mels)
            loss = st.tokenizer_recon_loss(params["enc"], params["dec"], cfg, mel)
            return loss, {"loss": loss}

        if args.synthetic_speech:
            from .synth_speech import corpus_batches, synth_batches

            if args.corpus_utts:
                batches = corpus_batches(
                    args.batch_size, args.seconds, args.n_speakers, args.seed,
                    corpus_utts=args.corpus_utts)
            else:
                batches = synth_batches(
                    args.batch_size, args.seconds, args.n_speakers, args.seed)
        elif args.synthetic:
            batches = _synthetic_batches(args.batch_size, args.seconds, args.n_speakers, args.seed)
        else:
            batches = _wav_batches(args.wav_dir, args.batch_size, args.seconds, args.seed)
    else:
        cfg = (st.SpeakerEncoderConfig(dim=32, num_layers=2)
               if args.tiny else st.SpeakerEncoderConfig())
        k1, k2 = jax.random.split(rng)
        params = {
            "spk": st.init_speaker_params(k1, cfg),
            "classifier": jax.random.normal(k2, (args.n_speakers, cfg.embed_dim)) * 0.05,
        }

        def loss_fn(params, wavs, labels):
            from ..utils.audio import kaldi_fbank

            feats = jax.vmap(lambda w: kaldi_fbank(w, 16000, cfg.n_mels))(wavs)
            emb = st.speaker_embedding(params["spk"], cfg, jnp.swapaxes(feats, 1, 2))
            loss, acc = st.aam_softmax_loss(emb, params["classifier"], labels)
            return loss, {"loss": loss, "acc": acc}

        if args.synthetic_speech:
            from .synth_speech import corpus_batches, synth_batches

            if args.corpus_utts:
                batches = corpus_batches(
                    args.batch_size, args.seconds, args.n_speakers, args.seed,
                    corpus_utts=args.corpus_utts)
            else:
                batches = synth_batches(
                    args.batch_size, args.seconds, args.n_speakers, args.seed)
        elif args.synthetic:
            batches = _synthetic_batches(args.batch_size, args.seconds, args.n_speakers, args.seed)
        else:
            batches = _speaker_batches(args.wav_dir, args.batch_size, args.seconds, args.seed)

    if args.augment:
        from .augment import augment_batches

        batches = augment_batches(batches, seed=args.seed,
                                  prob=args.augment_prob)

    optimizer = make_optimizer(OptimConfig(
        learning_rate=args.learning_rate, warmup_steps=args.warmup_steps,
        total_steps=args.max_steps,
    ))
    state = init_state(params, optimizer)

    import optax

    @jax.jit
    def step_tok(state, wavs):
        (loss, metrics), grads = jax.value_and_grad(
            lambda p: loss_fn(p, wavs), has_aux=True
        )(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state._replace(params=params, opt_state=opt_state, step=state.step + 1), metrics

    @jax.jit
    def step_spk(state, wavs, labels):
        (loss, metrics), grads = jax.value_and_grad(
            lambda p: loss_fn(p, wavs, labels), has_aux=True
        )(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state._replace(params=params, opt_state=opt_state, step=state.step + 1), metrics

    # host-side prefetch: overlap corpus synthesis with the device step
    import queue as _queue
    import threading as _threading

    q: "_queue.Queue" = _queue.Queue(maxsize=4)

    def _feed():
        for item in batches:
            q.put(item)
        q.put(None)

    _threading.Thread(target=_feed, daemon=True).start()

    def _drain():
        while True:
            item = q.get()
            if item is None:
                return
            yield item

    t0 = time.time()
    for i, (wavs, labels) in enumerate(_drain()):
        if i >= args.max_steps:
            break
        if args.model == "tokenizer":
            state, metrics = step_tok(state, jnp.asarray(wavs))
        else:
            state, metrics = step_spk(state, jnp.asarray(wavs), jnp.asarray(labels))
        if (i + 1) % 8 == 0:
            # backpressure: bound the async-dispatch queue.  Each step ships
            # a raw-audio batch (batch x seconds x 16 kHz floats, ~12 MB at
            # the shipped-recipe shape); unbounded dispatch let ~50 steps
            # (~600 MB) queue ahead on a tunnel-attached host, saturating
            # the link for every other client for minutes.  On locally
            # attached devices the device is the bottleneck, so this sync
            # costs nothing.
            jax.block_until_ready(metrics)
        if (i + 1) % args.logging_steps == 0 or i == 0:
            m = {k: float(v) for k, v in metrics.items()}
            logger.info("step %d %s (%.1fs)", i + 1, m, time.time() - t0)
        if (i + 1) % args.save_steps == 0 or i + 1 >= args.max_steps:
            _save(args, state, cfg)
    _save(args, state, cfg)
    logger.info("done: %s", args.output_dir)


def _save(args, state, cfg):
    """`<model>.npz` = the subtree the serving Frontend consumes (encoder /
    speaker trunk) + `<model>.json` config sidecar so the Frontend can build
    a matching config; `<model>_full.npz` = the whole training tree (resume).
    The 'shipped' preset stores fp16 to halve the committed size (the loader
    casts to the template dtype, train/checkpoint.py:89)."""
    import dataclasses as _dc
    import json

    from .checkpoint import save_params_npz

    params = jax.device_get(state.params)
    frontend_tree = params["enc"] if args.model == "tokenizer" else params["spk"]
    if args.preset == "shipped":
        frontend_tree = jax.tree.map(
            lambda a: np.asarray(a, np.float16), frontend_tree)
    save_params_npz(os.path.join(args.output_dir, f"{args.model}.npz"), frontend_tree)
    save_params_npz(os.path.join(args.output_dir, f"{args.model}_full.npz"), params)
    cfg_dict = {k: (list(v) if isinstance(v, tuple) else v)
                for k, v in _dc.asdict(cfg).items()}
    with open(os.path.join(args.output_dir, f"{args.model}.json"), "w") as f:
        json.dump(cfg_dict, f, indent=1)


if __name__ == "__main__":
    main()
