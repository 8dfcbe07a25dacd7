"""Real-speech evaluation of the shipped frontend extractors.

The shipped tokenizer/speaker checkpoints (frontend/assets/ckpt/) are
trained on the deterministic formant-synthesis corpus; their RECIPE numbers
were measured on that same synthetic distribution.  This tool measures what
the zero-shot pipeline actually needs from them ON REAL HUMAN SPEECH
(VERDICT r3 item 4 / reference role cli/frontend.py:92-116):

  - speaker separation: split each real recording into short segments,
    embed every segment, and compare within-speaker vs between-speaker
    cosine similarity (plus the fraction of between-speaker pairs that leak
    above the within-speaker median — an EER-style overlap number);
  - token content-tracking: tokens must be deterministic per input, differ
    across different segments (content-driven, not constant), and use a
    diverse code set.

Default corpus: the reference snapshot's demo recordings
(/root/reference/assets/samples — five distinct human speakers, 16 kHz),
read at eval time, never copied into this repo.  Point --samples_dir at any
directory tree of per-speaker wavs (speaker = parent directory name, or the
file stem when flat) to evaluate on other material.

  python -m flowmirror_hydravox_tpu.tools.eval_frontend_real [--samples_dir D]

Prints one JSON line; tests/test_frontend_ckpt.py pins the thresholds.
"""

from __future__ import annotations

import argparse
import glob
import itertools
import json
import os
import wave

import numpy as np

DEFAULT_SAMPLES = os.environ.get(
    "HYDRAVOX_REAL_SPEECH_DIR", "/root/reference/assets/samples")


def load_segments(samples_dir: str, seg_sec: float = 1.5, hop_sec: float = 0.75):
    """-> {speaker: [float32 wav segment]}, sample_rate. Speaker identity is
    the innermost directory name (falls back to the file stem)."""
    segs = {}
    sr_out = None
    for f in sorted(glob.glob(os.path.join(samples_dir, "**", "*.wav"),
                              recursive=True)):
        parent = os.path.basename(os.path.dirname(f))
        spk = parent if parent and parent != os.path.basename(
            samples_dir.rstrip("/")) else os.path.splitext(os.path.basename(f))[0]
        with wave.open(f) as w:
            sr = w.getframerate()
            if w.getsampwidth() != 2:
                continue
            pcm = np.frombuffer(w.readframes(w.getnframes()), np.int16)
            if w.getnchannels() > 1:
                pcm = pcm.reshape(-1, w.getnchannels()).mean(axis=1)
        wav = pcm.astype(np.float32) / 32768.0
        n, hop = int(seg_sec * sr), int(hop_sec * sr)
        pieces = [wav[i:i + n] for i in range(0, len(wav) - n + 1, hop)]
        if pieces:
            segs.setdefault(spk, []).extend(pieces)
            sr_out = sr
    return segs, sr_out


def _cos(a, b):
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-8))


def evaluate(samples_dir: str = DEFAULT_SAMPLES, frontend=None,
             seg_sec: float = 1.5, hop_sec: float = 0.75) -> dict:
    if frontend is None:
        from ..config import tiny_config
        from ..frontend.frontend import Frontend

        frontend = Frontend(tiny_config())
    segs, sr = load_segments(samples_dir, seg_sec, hop_sec)
    if len(segs) < 2:
        raise FileNotFoundError(
            f"need >=2 speakers under {samples_dir}, found {sorted(segs)}")

    embs = {s: [np.asarray(frontend.extract_spk_embedding(w, sr)).reshape(-1)
                for w in v] for s, v in segs.items()}
    within = [_cos(a, b) for v in embs.values()
              for a, b in itertools.combinations(v, 2)]
    between = [_cos(a, b) for s1, s2 in itertools.combinations(embs, 2)
               for a in embs[s1] for b in embs[s2]]
    thr = float(np.median(within))

    # token content metrics on the speaker with the most material
    spk0 = max(segs, key=lambda s: len(segs[s]))
    t0a = np.asarray(frontend.extract_speech_tokens(segs[spk0][0], sr)).reshape(-1)
    t0b = np.asarray(frontend.extract_speech_tokens(segs[spk0][0], sr)).reshape(-1)
    t1 = np.asarray(frontend.extract_speech_tokens(segs[spk0][1], sr)).reshape(-1)
    m = min(len(t0a), len(t1))

    return {
        "metric": "frontend_real_speech",
        "samples_dir": samples_dir,
        "speakers": len(segs),
        "segments": int(sum(len(v) for v in segs.values())),
        "within_cos_mean": round(float(np.mean(within)), 3),
        "between_cos_mean": round(float(np.mean(between)), 3),
        "separation_gap": round(float(np.mean(within) - np.mean(between)), 3),
        "between_above_within_median": round(
            float(np.mean([b > thr for b in between])), 3),
        "token_deterministic": bool(np.array_equal(t0a, t0b)),
        "token_content_diff_frac": round(float(np.mean(t0a[:m] != t1[:m])), 3),
        "token_unique_codes": int(len(set(t0a.tolist()))),
        "token_len": int(len(t0a)),
    }


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--samples_dir", default=DEFAULT_SAMPLES)
    p.add_argument("--seg_sec", type=float, default=1.5)
    p.add_argument("--hop_sec", type=float, default=0.75)
    args = p.parse_args(argv)
    out = evaluate(args.samples_dir, seg_sec=args.seg_sec, hop_sec=args.hop_sec)
    print(json.dumps(out, ensure_ascii=False))
    for k, v in out.items():
        print(f"{k:<32} {v}")


if __name__ == "__main__":
    main()
