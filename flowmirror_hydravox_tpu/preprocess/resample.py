"""Stage 1: convert/resample audio to mono wav at a target rate.

Replaces reference scripts/preprocess/{convert_to_wav.py,resample_mono.py}:
ffmpeg (when present) handles arbitrary containers; plain WAV files go
through the stdlib decoder + our resampler.  Multiprocess over files.

Usage:
  python -m flowmirror_hydravox_tpu.preprocess.resample \
      --input_dir raw/ --output_dir wav24k/ --sample_rate 24000
"""

from __future__ import annotations

import argparse
import logging
import os
import shutil
import subprocess
from concurrent.futures import ProcessPoolExecutor
from pathlib import Path

import numpy as np

logger = logging.getLogger("hydravox.resample")

AUDIO_EXTS = {".wav", ".mp3", ".flac", ".ogg", ".m4a", ".aac", ".opus", ".wma"}


def _ffmpeg_available() -> bool:
    return shutil.which("ffmpeg") is not None


def convert_one(src: str, dst: str, sample_rate: int) -> bool:
    """One file -> mono wav at sample_rate. Returns success."""
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    if _ffmpeg_available():
        r = subprocess.run(
            ["ffmpeg", "-y", "-v", "error", "-i", src, "-ac", "1",
             "-ar", str(sample_rate), "-acodec", "pcm_s16le", dst],
            capture_output=True,
        )
        if r.returncode == 0:
            return True
        logger.warning("ffmpeg failed on %s: %s", src, r.stderr.decode()[:200])
    if src.lower().endswith(".wav"):
        from ..utils.audio import resample_linear
        from ..utils.wavio import decode_wav, encode_wav

        import jax.numpy as jnp

        with open(src, "rb") as f:
            wav, sr = decode_wav(f.read())
        out = np.asarray(resample_linear(jnp.asarray(wav)[None], sr, sample_rate))[0]
        with open(dst, "wb") as f:
            f.write(encode_wav(out, sample_rate))
        return True
    logger.error("cannot convert %s (no ffmpeg, not wav)", src)
    return False


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--input_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--sample_rate", type=int, default=24000)
    p.add_argument("--num_workers", type=int, default=os.cpu_count())
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    files = [
        p_ for p_ in Path(args.input_dir).rglob("*")
        if p_.suffix.lower() in AUDIO_EXTS
    ]
    logger.info("converting %d files", len(files))
    jobs = []
    with ProcessPoolExecutor(args.num_workers) as ex:
        for src in files:
            rel = src.relative_to(args.input_dir).with_suffix(".wav")
            dst = Path(args.output_dir) / rel
            jobs.append(ex.submit(convert_one, str(src), str(dst), args.sample_rate))
        ok = sum(int(j.result()) for j in jobs)
    logger.info("done: %d/%d converted", ok, len(files))


if __name__ == "__main__":
    main()
