"""Stage 2: voice-activity segmentation.

Replaces reference scripts/preprocess/vad_processor.py (Silero VAD torch
model).  Two detectors share the same post-rules (merge segments separated
by < min_gap 0.5 s, split > max_dur 10 s, drop < min_dur 0.5 s — the
reference's contract):

  - native (default when weights are shipped/trained): the tiny dilated-conv
    frame classifier in vad_model.py, trained on speech+noise mixtures —
    the Silero-role model.  `tools/eval_vad.py` measures its margin over the
    energy baseline on noisy clips.
  - energy: frame RMS with adaptive noise-floor threshold and hangover
    smoothing — dependency-free fallback (`--model energy`).

A pluggable `speech_prob_fn` hook also accepts any external VAD (e.g. a
Silero export) directly.
"""

from __future__ import annotations

import argparse
import dataclasses
import logging
import os
from pathlib import Path
from typing import Callable, List, Optional, Tuple

import numpy as np

logger = logging.getLogger("hydravox.vad")


@dataclasses.dataclass
class VADConfig:
    frame_ms: float = 30.0
    hop_ms: float = 10.0
    energy_offset_db: float = 9.0  # threshold above noise floor
    hangover_frames: int = 8  # keep speech active this many frames after drop
    onset_frames: int = 3  # frames above threshold to trigger speech
    min_gap_s: float = 0.5
    min_dur_s: float = 0.5
    max_dur_s: float = 10.0


def frame_energy_db(wav: np.ndarray, sr: int, cfg: VADConfig) -> Tuple[np.ndarray, int]:
    frame = int(sr * cfg.frame_ms / 1000)
    hop = int(sr * cfg.hop_ms / 1000)
    n = max(1 + (len(wav) - frame) // hop, 1)
    idx = np.arange(frame)[None, :] + hop * np.arange(n)[:, None]
    idx = np.minimum(idx, len(wav) - 1)
    frames = wav[idx]
    rms = np.sqrt(np.mean(frames ** 2, axis=1) + 1e-12)
    return 20 * np.log10(rms), hop


def detect_speech(
    wav: np.ndarray,
    sr: int,
    cfg: Optional[VADConfig] = None,
    speech_prob_fn: Optional[Callable] = None,
) -> List[Tuple[float, float]]:
    """Returns [(start_s, end_s), ...] speech segments."""
    cfg = cfg or VADConfig()
    if speech_prob_fn is not None:
        probs, hop = speech_prob_fn(wav, sr), int(sr * cfg.hop_ms / 1000)
        active = probs > 0.5
    else:
        e_db, hop = frame_energy_db(wav, sr, cfg)
        floor = np.percentile(e_db, 10)
        active = e_db > (floor + cfg.energy_offset_db)

    # onset/hangover smoothing
    segs, state, run, last_active = [], False, 0, -10 ** 9
    start = 0
    for i, a in enumerate(active):
        if not state:
            run = run + 1 if a else 0
            if run >= cfg.onset_frames:
                state, start = True, i - run + 1
        else:
            if a:
                last_active = i
            elif i - last_active > cfg.hangover_frames:
                segs.append((start, i))
                state, run = False, 0
        if a:
            last_active = i
    if state:
        segs.append((start, len(active)))

    hop_s = hop / sr
    out = [(s * hop_s, e * hop_s) for s, e in segs]

    # merge close segments (< min_gap)
    merged: List[Tuple[float, float]] = []
    for s, e in out:
        if merged and s - merged[-1][1] < cfg.min_gap_s:
            merged[-1] = (merged[-1][0], e)
        else:
            merged.append((s, e))

    # split long, drop short
    final = []
    for s, e in merged:
        while e - s > cfg.max_dur_s:
            final.append((s, s + cfg.max_dur_s))
            s += cfg.max_dur_s
        if e - s >= cfg.min_dur_s:
            final.append((s, e))
    return final


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--input_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--min_dur", type=float, default=0.5)
    p.add_argument("--max_dur", type=float, default=10.0)
    p.add_argument("--min_gap", type=float, default=0.5)
    p.add_argument("--model", choices=["auto", "native", "energy"], default="auto",
                   help="auto = trained native VAD when its weights exist, "
                        "else energy fallback")
    p.add_argument("--cpu", action="store_true", default=True,
                   help="run the native model on host CPU (data tool; keeps "
                        "the accelerator free for serving/training)")
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    if args.cpu and args.model != "energy":
        import jax

        jax.config.update("jax_platforms", "cpu")

    from ..utils.wavio import decode_wav, encode_wav

    speech_prob_fn = None
    if args.model in ("auto", "native"):
        from .vad_model import maybe_native_vad

        native = maybe_native_vad()
        if native is not None:
            speech_prob_fn = native
            logger.info("using trained native VAD")
        elif args.model == "native":
            raise SystemExit("no trained VAD weights (preprocess/assets/vad.npz "
                             "or HYDRAVOX_VAD_NPZ); train with train/train_vad.py")
        else:
            logger.info("no trained VAD weights; using energy VAD")

    cfg = VADConfig(min_dur_s=args.min_dur, max_dur_s=args.max_dur,
                    min_gap_s=args.min_gap)
    n_seg = n_bad = 0
    for path in Path(args.input_dir).rglob("*.wav"):
        try:
            with open(path, "rb") as f:
                wav, sr = decode_wav(f.read())
        except Exception as e:  # skip unreadable, keep segmenting the rest
            logger.warning("skipping unreadable %s (%s)", path, e)
            n_bad += 1
            continue
        for i, (s, e) in enumerate(
                detect_speech(wav, sr, cfg, speech_prob_fn=speech_prob_fn)):
            seg = wav[int(s * sr) : int(e * sr)]
            rel = path.relative_to(args.input_dir)
            dst = Path(args.output_dir) / rel.parent / f"{rel.stem}_{i:04d}.wav"
            os.makedirs(dst.parent, exist_ok=True)
            with open(dst, "wb") as f:
                f.write(encode_wav(seg, sr))
            n_seg += 1
    logger.info("emitted %d segments (%d unreadable files skipped)", n_seg, n_bad)


if __name__ == "__main__":
    main()
