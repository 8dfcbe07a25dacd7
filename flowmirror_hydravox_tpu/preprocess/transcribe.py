"""Stage 3: transcripts -> HF dataset (text + audio).

The reference transcribes with modelscope Paraformer/SenseVoice
(scripts/preprocess/transcribe_to_dataset.py) — heavyweight external models
not present in this image.  This stage therefore supports:
  1. `--transcript_file`: a TSV/JSONL of (audio_path, text) — the common
     production case where transcripts already exist;
  2. `--asr_module`: a dotted path to a callable `fn(wav, sr) -> str` for
     plugging any ASR model;
  3. filename-as-text fallback for quick smoke datasets.

Output: a `datasets` directory with columns {text, audio{array,
sampling_rate}} — identical schema to the reference stage-3 output.
"""

from __future__ import annotations

import argparse
import importlib
import json
import logging
import os
from pathlib import Path

import numpy as np

logger = logging.getLogger("hydravox.transcribe")


def load_transcripts(path: str) -> dict:
    table = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if line.startswith("{"):
                row = json.loads(line)
                table[row["audio"]] = row["text"]
            else:
                parts = line.split("\t", 1)
                if len(parts) == 2:
                    table[parts[0]] = parts[1]
    return table


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--input_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--transcript_file", default=None)
    p.add_argument("--asr_module", default=None,
                   help="dotted path to `fn(wav: np.ndarray, sr: int) -> str`")
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    import datasets

    from ..utils.wavio import decode_wav

    transcripts = load_transcripts(args.transcript_file) if args.transcript_file else {}
    asr = None
    if args.asr_module:
        mod, fn = args.asr_module.rsplit(".", 1)
        asr = getattr(importlib.import_module(mod), fn)

    rows = {"text": [], "audio": []}
    for path in sorted(Path(args.input_dir).rglob("*.wav")):
        with open(path, "rb") as f:
            wav, sr = decode_wav(f.read())
        key_abs, key_rel = str(path), str(path.relative_to(args.input_dir))
        if key_abs in transcripts or key_rel in transcripts:
            text = transcripts.get(key_abs, transcripts.get(key_rel))
        elif asr is not None:
            text = asr(wav, sr)
        else:
            text = path.stem.replace("_", " ")
        rows["text"].append(text)
        rows["audio"].append({"array": wav.astype(np.float32), "sampling_rate": sr})

    ds = datasets.Dataset.from_dict(rows)
    os.makedirs(args.output_dir, exist_ok=True)
    ds.save_to_disk(args.output_dir)
    logger.info("saved %d rows to %s", len(ds), args.output_dir)


if __name__ == "__main__":
    main()
