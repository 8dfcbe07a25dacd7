"""Process launcher (reference main.py:5-69 equivalent).

The reference spawns separate uvicorn-API and Gradio-UI processes plus N
GPU worker processes; TPU-natively everything lives in one process — the
jitted Engine, the HTTP API, and the built-in web UI.

Usage:
  python -m flowmirror_hydravox_tpu --api-host 0.0.0.0 --api-port 8080 \
      [--with-ui] [--model-dir /path/to/weights] [--tiny]

--model-dir expects llm.pt/flow.pt/hift.pt (reference layout,
infer_speech_model.py:59-98) or llm.npz/flow.npz/hift.npz; absent weights
fall back to random init (serves structure/latency testing).
Env vars honored for parity with server/worker.py:18-42: TTS_MODEL_DIR.
"""

from __future__ import annotations

import argparse
import logging
import os

import jax
import jax.numpy as jnp
import numpy as np


def load_or_init(model_dir, name, init_fn, convert_fn, template_dtype):
    from .convert import torch_import
    from .train.checkpoint import load_params_npz

    params = init_fn()
    if model_dir:
        pt = os.path.join(model_dir, f"{name}.pt")
        npz = os.path.join(model_dir, f"{name}.npz")
        if os.path.exists(npz):
            params = load_params_npz(npz, params)
            logging.info("loaded %s", npz)
        elif os.path.exists(pt):
            loaded = convert_fn(torch_import.load_torch_pt(pt))
            params = jax.tree.map(
                lambda a, t: jnp.asarray(a, getattr(t, "dtype", template_dtype)),
                loaded, params,
            )
            logging.info("loaded %s", pt)
    return params


def main(argv=None):
    p = argparse.ArgumentParser("flowmirror_hydravox_tpu")
    p.add_argument("--api-host", default="0.0.0.0")
    p.add_argument("--api-port", type=int, default=8080)
    p.add_argument("--with-ui", action="store_true")
    p.add_argument("--model-dir", default=os.environ.get("TTS_MODEL_DIR"))
    p.add_argument("--tokenizer-path", default=None)
    p.add_argument("--spk2info", default=None, help="speaker registry .pt")
    p.add_argument("--tiny", action="store_true", help="tiny random config (smoke)")
    p.add_argument("--max-tokens", type=int, default=1024)
    p.add_argument("--compile-cache", default=".jax_cache")
    p.add_argument("--no-prewarm", action="store_true",
                   help="skip compiling hot bucket programs before serving")
    p.add_argument("--quantize", default=os.environ.get("HYDRAVOX_QUANTIZE"),
                   choices=[None, "none", "bf16", "int8"],
                   help="weight-only LLM quantization for decode (int8: ~1.3x "
                        "faster steps on v5e; flow/hift stay bf16/f32)")
    p.add_argument("--continuous-batching", type=int, default=4, metavar="SLOTS",
                   help="continuous (in-flight) batching: N persistent decode "
                        "slots; default-config SFT requests join a live batch "
                        "at chunk boundaries (runtime/continuous.py, the "
                        "vLLM-equivalent serving core). Default 4: the QoS "
                        "mode — bounded stream TTFT under load (one slot "
                        "reserved). 0 = window coalescing (max burst "
                        "throughput, but streams queue behind whole-utterance "
                        "decodes under load)")
    p.add_argument("--continuous-heads", type=int, default=2,
                   help="inference_head_num served by the continuous slots")
    p.add_argument("--continuous-reserve", type=int, default=1,
                   help="slots reserved for streaming requests (TTFT "
                        "isolation; 0 = none)")
    p.add_argument("--spec-decode", action="store_true",
                   help="self-speculative MTP decoding: heads 1..K-1 draft, "
                        "head 0 verifies — exact heads=1 output quality at "
                        "up-to-K tokens/step (throughput scales with draft "
                        "acceptance). Applies to every serving path, "
                        "including --continuous-batching slots")
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    if args.compile_cache:
        os.makedirs(args.compile_cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", args.compile_cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # faster counter-based PRNG for the per-step sampling draws (~7% decode
    # speedup vs threefry; HYDRAVOX_FAST_RNG=0 restores the JAX default)
    if os.environ.get("HYDRAVOX_FAST_RNG", "1") not in ("0", "false"):
        jax.config.update("jax_default_prng_impl", "rbg")

    from .config import HydraVoxConfig, tiny_config
    from .convert import torch_import
    from .frontend.frontend import Frontend, SpeakerInfo
    from .frontend.tokenizer import get_tokenizer
    from .models import flow as flow_model
    from .models import hift as hift_model
    from .models import llm as llm_model
    from .runtime.engine import Engine
    from .runtime.server import serve

    cfg = tiny_config() if args.tiny else HydraVoxConfig()
    tokenizer = get_tokenizer(args.tokenizer_path)

    # When initializing fresh LLM weights (no checkpoint), size the text
    # embedding to the tokenizer's vocab (padded to a multiple of 128 for MXU
    # tiling) instead of the Qwen2 default. Checkpoints keep their own shapes.
    have_llm_ckpt = args.model_dir and (
        os.path.exists(os.path.join(args.model_dir, "llm.pt"))
        or os.path.exists(os.path.join(args.model_dir, "llm.npz"))
    )
    if not args.tiny and not have_llm_ckpt:
        import dataclasses

        padded = -(-tokenizer.vocab_size // 128) * 128
        cfg = dataclasses.replace(
            cfg,
            llm=dataclasses.replace(
                cfg.llm,
                backbone=dataclasses.replace(cfg.llm.backbone, vocab_size=padded),
            ),
        )
        logging.info("fresh init: text vocab follows tokenizer (%d -> padded %d)",
                     tokenizer.vocab_size, padded)

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)

    llm_params = load_or_init(
        args.model_dir, "llm",
        lambda: jax.jit(lambda k: llm_model.init_params(k, cfg.llm, jnp.bfloat16))(k1),
        lambda sd: torch_import.llm_from_state_dict(sd, cfg.llm), jnp.bfloat16,
    )
    flow_params = load_or_init(
        args.model_dir, "flow",
        lambda: jax.jit(lambda k: flow_model.init_params(k, cfg.flow, jnp.bfloat16))(k2),
        lambda sd: torch_import.flow_from_state_dict(sd, cfg.flow), jnp.bfloat16,
    )
    hift_params = load_or_init(
        args.model_dir, "hift",
        lambda: jax.jit(lambda k: hift_model.init_params(k, cfg.hift, jnp.float32))(k3),
        lambda sd: torch_import.hift_from_state_dict(sd, cfg.hift), jnp.float32,
    )

    mesh = None
    if len(jax.devices()) > 1:
        from .parallel.mesh import make_mesh

        mesh = make_mesh(model=1)
        logging.info("multi-chip serving mesh: %s", dict(mesh.shape))
    engine = Engine(cfg, llm_params, flow_params, hift_params,
                    max_tokens=args.max_tokens, mesh=mesh, quantize=args.quantize,
                    spec_decode=args.spec_decode)
    frontend = Frontend(cfg, tokenizer=tokenizer)
    if args.spk2info and os.path.exists(args.spk2info):
        frontend.load_spk2info(args.spk2info)
    if not frontend.available_speakers():
        frontend.add_speaker(
            "default", SpeakerInfo(embedding=np.zeros(192, np.float32))
        )

    if not args.no_prewarm:
        logging.info("prewarming the serving program caches "
                     "(use --no-prewarm to skip)...")
    serve(args.api_host, args.api_port, engine, frontend, with_ui=args.with_ui,
          continuous_slots=args.continuous_batching,
          continuous_head_num=args.continuous_heads,
          prewarm=not args.no_prewarm,
          continuous_reserve_stream=args.continuous_reserve)


if __name__ == "__main__":
    main()
