"""End-to-end CV1/CV2 legacy synthesis CLI.

The flagship serving path is CosyVoice3 (models/llm.py); this CLI makes the
legacy generations runnable end-to-end, mirroring the reference's retained
upstream entry points (cli/cosyvoice.py:27-238 CosyVoice/CosyVoice2):

  CV1: TransformerLM (conformer text encoder + causal LM)
       -> MaskedDiffWithXvec (conformer encoder + InterpolateRegulator + CFM)
       -> HiFT
  CV2: Qwen2LM (single-token KV-cached decode)
       -> CausalMaskedDiffWithXvec (UpsampleConformerEncoder + CFM)
       -> HiFT

Usage:
  python -m flowmirror_hydravox_tpu.tools.legacy_tts --gen cv2 \
      --text "hello" --output out.wav [--tiny] \
      [--llm_ckpt llm.npz] [--flow_ckpt flow.npz] [--hift_ckpt hift.npz]
"""

from __future__ import annotations

import argparse
import logging
import time

import numpy as np

logger = logging.getLogger("hydravox.legacy_tts")


def tiny_stacks():
    """Small CV1+CV2 configs for smoke runs (mirrors the test fixtures)."""
    from ..config import Qwen2Config
    from ..models import flow_legacy, llm_legacy
    from ..models.conformer import ConformerConfig
    from ..models.matcha.decoder import MatchaDecoderConfig

    enc = ConformerConfig(input_size=32, output_size=32, attention_heads=4,
                          linear_units=64, num_blocks=2, num_up_blocks=1,
                          cnn_module_kernel=7, static_chunk_size=4)
    cv1_llm = llm_legacy.TransformerLMConfig(
        text_encoder_input_size=32, llm_input_size=32, llm_output_size=32,
        text_token_size=61000, speech_token_size=50,
        text_encoder=ConformerConfig(input_size=32, output_size=32,
                                     attention_heads=4, linear_units=64, num_blocks=2),
        llm=ConformerConfig(input_size=32, output_size=32, attention_heads=4,
                            linear_units=64, num_blocks=2,
                            use_cnn_module=False, macaron_style=False),
    )
    cv2_llm = llm_legacy.Qwen2LMConfig(
        backbone=Qwen2Config(hidden_size=64, num_layers=2, num_heads=4,
                             num_kv_heads=2, head_dim=16, intermediate_size=128,
                             vocab_size=61000),
        speech_token_size=50,
    )
    est = dict(in_feats=80, channels=(32, 32), attention_head_dim=8,
               num_heads=4, num_mid_blocks=1, spk_emb_dim=80, use_cond=True)
    cv1_flow = flow_legacy.LegacyFlowConfig(
        input_size=32, vocab_size=50, encoder=enc, causal=False,
        estimator=MatchaDecoderConfig(causal=False, **est),
    )
    cv2_flow = flow_legacy.LegacyFlowConfig(
        input_size=32, vocab_size=50, encoder=enc, causal=True,
        estimator=MatchaDecoderConfig(causal=True, static_chunk_size=8, **est),
    )
    return cv1_llm, cv2_llm, cv1_flow, cv2_flow


def main(argv=None):
    p = argparse.ArgumentParser("legacy-tts")
    p.add_argument("--gen", choices=["cv1", "cv2"], required=True)
    p.add_argument("--text", required=True)
    p.add_argument("--output", default="legacy_out.wav")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--llm_ckpt", default=None)
    p.add_argument("--flow_ckpt", default=None)
    p.add_argument("--hift_ckpt", default=None)
    p.add_argument("--max_tokens", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    import jax
    import jax.numpy as jnp

    from ..config import HiFTConfig
    from ..frontend.tokenizer import get_tokenizer
    from ..models import flow_legacy, hift as hift_model, llm_legacy
    from ..ops.sampling import SamplingParams
    from ..train.checkpoint import load_params_npz
    from ..utils.wavio import encode_wav

    if args.tiny:
        cv1_llm, cv2_llm, cv1_flow, cv2_flow = tiny_stacks()
        hift_cfg = HiFTConfig(base_channels=32, f0_cond_channels=32)
        max_tokens = args.max_tokens or 32
    else:
        cv1_llm = llm_legacy.TransformerLMConfig()
        cv2_llm = llm_legacy.Qwen2LMConfig()
        cv1_flow = flow_legacy.LegacyFlowConfig(causal=False,
                                                vocab_size=cv1_llm.speech_token_size)
        cv2_flow = flow_legacy.LegacyFlowConfig(causal=True)
        hift_cfg = HiFTConfig()
        max_tokens = args.max_tokens or 512

    rng = jax.random.PRNGKey(args.seed)
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    tokenizer = get_tokenizer()
    ids = np.asarray(tokenizer.encode(args.text), np.int32)
    emb = np.zeros((192,), np.float32)
    sampling = SamplingParams.make(top_p=0.8, top_k=25, win_size=10, tau_r=0.1)
    min_len = jnp.int32(max(2, len(ids) * 2))
    max_len = jnp.int32(min(len(ids) * 20, max_tokens))

    t0 = time.time()
    if args.gen == "cv1":
        lcfg, fcfg = cv1_llm, cv1_flow
        lparams = llm_legacy.init_transformerlm_params(k1, lcfg, jnp.float32)
        if args.llm_ckpt:
            lparams = load_params_npz(args.llm_ckpt, lparams)
        tokens, num = llm_legacy.transformerlm_generate(
            lparams, lcfg, k4, jnp.asarray(ids), jnp.int32(len(ids)),
            jnp.asarray(emb), min_len, max_len, sampling, max_tokens=max_tokens,
        )
    else:
        lcfg, fcfg = cv2_llm, cv2_flow
        lparams = llm_legacy.init_qwen2lm_params(k1, lcfg, jnp.float32)
        if args.llm_ckpt:
            lparams = load_params_npz(args.llm_ckpt, lparams)
        tokens, num = llm_legacy.qwen2lm_generate(
            lparams, lcfg, k4, jnp.asarray(ids), jnp.int32(len(ids)),
            jnp.zeros((0,), jnp.int32), jnp.int32(0),
            min_len, max_len, sampling, max_tokens=max_tokens,
        )
    n = int(num)
    llm_s = time.time() - t0
    logger.info("%s generated %d speech tokens in %.2fs", args.gen, n, llm_s)

    fparams = flow_legacy.init_params(k2, fcfg, jnp.float32)
    if args.flow_ckpt:
        fparams = load_params_npz(args.flow_ckpt, fparams)
    tok = tokens[None, :n] if n > 0 else jnp.zeros((1, 1), jnp.int32)
    mel = flow_legacy.inference(
        fparams, fcfg, k4, tok, jnp.asarray([max(n, 1)]),
        jnp.zeros((1, 0, 80), jnp.float32), jnp.int32(0),
        jnp.asarray(emb)[None],
    )  # (1, 80, T)

    hparams = hift_model.init_params(k3, hift_cfg, jnp.float32)
    if args.hift_ckpt:
        hparams = load_params_npz(args.hift_ckpt, hparams)
    wav = np.asarray(hift_model.inference(hparams, hift_cfg, mel, k4))[0]
    total = time.time() - t0
    dur = len(wav) / hift_cfg.sampling_rate
    logger.info("synthesised %.2fs audio in %.2fs (rtf %.3f)", dur, total,
                total / max(dur, 1e-9))
    with open(args.output, "wb") as f:
        f.write(encode_wav(wav.astype(np.float32), hift_cfg.sampling_rate))
    logger.info("wrote %s", args.output)
    return {"tokens": n, "duration_s": dur}


if __name__ == "__main__":
    main()
