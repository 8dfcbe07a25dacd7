"""Matcha-TTS CLI (reference matcha/cli.py:208-418): text -> wav via the
Matcha CFM stack + HiFi-GAN vocoder.

Usage:
  python -m flowmirror_hydravox_tpu.models.matcha.cli \
      --text "hello world" --output_dir out/ \
      [--checkpoint matcha.npz] [--vocoder hifigan.npz] \
      [--steps 10] [--temperature 0.667] [--speaking_rate 1.0]
"""

from __future__ import annotations

import argparse
import logging
import os
import time

import numpy as np

logger = logging.getLogger("hydravox.matcha.cli")


def main(argv=None):
    p = argparse.ArgumentParser("matcha-tts")
    p.add_argument("--text", required=True)
    p.add_argument("--output_dir", default="matcha_out")
    p.add_argument("--checkpoint", default=None, help="matcha params npz")
    p.add_argument("--vocoder", default=None, help="hifigan params npz")
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--temperature", type=float, default=0.667)
    p.add_argument("--speaking_rate", type=float, default=1.0)
    p.add_argument("--max_mel_len", type=int, default=1024)
    p.add_argument("--denoiser_strength", type=float, default=0.00025,
                   help="vocoder bias denoiser strength; 0 disables "
                        "(reference cli.py:252-255)")
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    import jax
    import jax.numpy as jnp

    from ...train.checkpoint import load_params_npz
    from ...utils.wavio import encode_wav
    from . import model as matcha_model
    from . import text as matcha_text
    from . import vocoder as hifigan
    from .model import MatchaConfig
    from .vocoder import HiFiGANConfig

    cfg = MatchaConfig()
    voc_cfg = HiFiGANConfig()
    params = matcha_model.init_params(jax.random.PRNGKey(0), cfg)
    voc_params = hifigan.init_params(jax.random.PRNGKey(1), voc_cfg)
    if args.checkpoint:
        params = load_params_npz(args.checkpoint, params)
    if args.vocoder:
        voc_params = load_params_npz(args.vocoder, voc_params)

    ids = matcha_text.intersperse(matcha_text.text_to_sequence(args.text))
    x = jnp.asarray(ids, jnp.int32)[None]

    t0 = time.time()
    out = matcha_model.synthesise(
        params, cfg, jax.random.PRNGKey(int(time.time())), x,
        jnp.asarray([len(ids)]), n_timesteps=args.steps,
        temperature=args.temperature, length_scale=1.0 / args.speaking_rate,
        max_mel_len=args.max_mel_len,
    )
    ml = int(out["mel_lengths"][0])
    mel = out["mel"][:, :, :ml]
    wav_j = hifigan.forward(voc_params, voc_cfg, mel)
    if args.denoiser_strength > 0:
        # reference cli.py:103,117-122: bias denoiser after the vocoder
        from . import denoiser as dn

        bias = dn.make_bias_spec(
            lambda m: hifigan.forward(voc_params, voc_cfg, m), mode="zeros")
        wav_j = dn.denoise(wav_j, bias, strength=args.denoiser_strength)
    wav = np.asarray(wav_j)[0]
    t = time.time() - t0
    rtf = t * cfg.sample_rate / max(len(wav), 1)  # matcha_tts.py:138-139 definition
    logger.info("synthesised %.2f s in %.2f s (rtf %.3f)", len(wav) / cfg.sample_rate, t, rtf)

    os.makedirs(args.output_dir, exist_ok=True)
    path = os.path.join(args.output_dir, "utterance_001.wav")
    with open(path, "wb") as f:
        f.write(encode_wav(wav, cfg.sample_rate))
    logger.info("wrote %s", path)


if __name__ == "__main__":
    main()
