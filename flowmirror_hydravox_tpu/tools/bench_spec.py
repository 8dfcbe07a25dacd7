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
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.cache_dir:
        jax.config.update("jax_compilation_cache_dir", args.cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

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
    print(json.dumps(summary), flush=True)
    return summary


if __name__ == "__main__":
    main()
