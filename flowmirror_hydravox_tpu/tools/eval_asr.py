"""ASR quality evaluation for the shipped native CTC recognizer.

Measures token error rate (Levenshtein / ref-length) of the trained demo
checkpoint (preprocess/assets/asr.npz) on HELD-OUT synthetic utterances —
speakers and utterance ids outside the training pool (train/train_asr.py
trains on speakers 0-255, utterances 0-767) — clean and at a given SNR per
noise condition.  This is the measured-quality counterpart to tools/eval_vad:
the reference's stage-3 ASR models (Paraformer/SenseVoice,
scripts/preprocess/transcribe_to_dataset.py:219-418) are external weights;
the native recognizer's demo task is the synthetic segment alphabet, and
this tool quantifies how well it actually transcribes it.

  python -m flowmirror_hydravox_tpu.tools.eval_asr [--clips 24] [--snr 10]

Prints one JSON line per condition plus a human table.
"""

from __future__ import annotations

import argparse
import json

import numpy as np

SR = 16000


def evaluate(n_clips: int = 24, snr_db: float = 10.0, seconds: float = 4.0,
             seed: int = 11, ckpt: str = None):
    from ..preprocess.asr_model import NativeASR, token_error_rate
    from ..train.synth_speech import synth_noise, synth_utterance_with_segments

    asr = NativeASR(ckpt)
    rng = np.random.default_rng(seed)
    conditions = ["clean", "white", "pink", "hum", "babble"]
    results = {}
    for cond in conditions:
        ters = []
        for c in range(n_clips):
            spk = 300 + c          # speakers never seen in training
            utt = 10_000 + c       # utterance ids beyond the training pool
            wav, segs = synth_utterance_with_segments(spk, utt, seconds,
                                                      seed=1)
            if not segs:
                continue
            if cond != "clean":
                noise = synth_noise(cond, len(wav), rng)
                sp = np.sqrt(np.mean(wav ** 2) + 1e-9)
                npow = np.sqrt(np.mean(noise ** 2) + 1e-9)
                wav = wav + noise * (sp / npow) * (10.0 ** (-snr_db / 20.0))
            hyp = list(asr(wav, SR))
            ters.append(token_error_rate(segs, hyp))
        results[cond] = float(np.mean(ters))
    return results


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--clips", type=int, default=24)
    p.add_argument("--snr", type=float, default=10.0)
    p.add_argument("--seconds", type=float, default=4.0)
    p.add_argument("--ckpt", default=None)
    args = p.parse_args(argv)
    results = evaluate(args.clips, args.snr, args.seconds, ckpt=args.ckpt)
    print(json.dumps({"metric": "asr_token_error_rate", "snr_db": args.snr,
                      **results}))
    print(f"{'condition':<10} TER")
    for cond, ter in results.items():
        print(f"{cond:<10} {ter:.3f}")


if __name__ == "__main__":
    main()
