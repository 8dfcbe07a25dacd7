"""Quantify the bf16 -> weight-only-int8 quality delta on the LLM decode.

VERDICT r4 item 8: int8 is consistently ~1.4-1.7x bf16 on decode throughput;
before promoting it to the serving default the quality delta must be
quantified.  int8 mode (ops/quant.py, Engine(quantize="int8")) quantizes the
LLM ONLY — flow/HiFT stay bf16/f32 — so audio differences are entirely
token-stream differences.  Two measurements on fixed seeds:

  1. greedy token agreement: decode N utterances with deterministic sampling
     (top_k=1, tau_r>1) in both precisions; report exact-sequence match rate,
     token-level agreement, and the earliest divergence position.
  2. next-token distribution drift: on the bf16 greedy prefixes, compare the
     softmaxed head-0..3 logits between precisions — mean KL(bf16 || int8)
     and top-1 agreement per head.

Prints one JSON line (bench/docs consumption):
    python -m flowmirror_hydravox_tpu.tools.eval_int8 [--tiny --cpu]
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--utterances", type=int, default=6)
    p.add_argument("--tokens", type=int, default=125)
    p.add_argument("--text_len", type=int, default=63)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--cache_dir", default=".jax_cache")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.cache_dir:
        jax.config.update("jax_compilation_cache_dir", args.cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import os

    if os.environ.get("HYDRAVOX_FAST_RNG", "1") not in ("0", "false"):
        jax.config.update("jax_default_prng_impl", "rbg")

    import jax.numpy as jnp
    import numpy as np

    from ..config import HydraVoxConfig, SamplingConfig, tiny_config
    from ..models import flow as flow_model
    from ..models import hift as hift_model
    from ..models import llm as llm_model
    from ..runtime.engine import Engine

    cfg = tiny_config() if args.tiny else HydraVoxConfig()
    dt = jnp.float32 if args.tiny else jnp.bfloat16
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    llm_p = jax.jit(lambda k: llm_model.init_params(k, cfg.llm, dt))(k1)
    flow_p = jax.jit(lambda k: flow_model.init_params(k, cfg.flow, dt))(k2)
    hift_p = jax.jit(lambda k: hift_model.init_params(k, cfg.hift, jnp.float32))(k3)
    jax.block_until_ready(llm_p["llm_decoder"])

    n_tok = min(args.tokens, 32) if args.tiny else args.tokens
    tl = min(args.text_len, 16) if args.tiny else args.text_len
    max_gen = -(-n_tok // 64) * 64
    greedy = SamplingConfig(top_p=1.0, top_k=1, win_size=10, tau_r=10.0)
    engines = {
        "bf16": Engine(cfg, llm_p, flow_p, hift_p, max_tokens=max_gen, fused=False),
        "int8": Engine(cfg, llm_p, flow_p, hift_p, max_tokens=max_gen,
                       fused=False, quantize="int8"),
    }

    # ---- 1. greedy token agreement over N utterances -----------------------
    seqs = {"bf16": [], "int8": []}
    rng_np = np.random.default_rng(0)
    texts = [rng_np.integers(0, 1000, (tl,)).astype(np.int32)
             for _ in range(args.utterances)]
    for name, eng in engines.items():
        for i, text in enumerate(texts):
            r = eng.synthesize(
                text_tokens=text, tts_text_len=tl, inference_head_num=4,
                sampling=greedy, min_token_text_ratio=n_tok / tl,
                max_token_text_ratio=n_tok / tl, rng=jax.random.PRNGKey(i))
            seqs[name].append(np.asarray(r.speech_tokens))
    same_seq = 0
    agree = total = 0
    first_div = []
    for a, b in zip(seqs["bf16"], seqs["int8"]):
        n = min(len(a), len(b))
        eq = a[:n] == b[:n]
        agree += int(eq.sum())
        total += max(len(a), len(b))
        if len(a) == len(b) and eq.all():
            same_seq += 1
        else:
            div = int(np.argmin(eq)) if not eq.all() else n
            first_div.append(div)

    # ---- 2. next-token distribution drift on shared bf16 prefixes ----------
    heads = min(4, cfg.llm.head_num)
    tb = engines["bf16"]._bucket_prompt(tl)
    pb = engines["bf16"]._bucket_prompt(max(n_tok, 1))

    @jax.jit
    def head_dists(params, text_pad, text_len, prefix_pad, prefix_len):
        emb, plen = llm_model.build_inference_prompt(
            params, cfg.llm, text_pad, text_len, prefix_pad, prefix_len)
        state = llm_model.init_generate_state(
            params, cfg.llm, jax.random.PRNGKey(0), emb, plen,
            inference_head_num=heads, max_tokens=max_gen)
        logits = llm_model.mtp_logits(params, cfg.llm, state["last_hidden"], heads)
        return jax.nn.softmax(logits, axis=-1)  # (heads, V)

    kls, top1 = [], []
    for i, text in enumerate(texts[:3]):
        text_pad = np.zeros((tb,), np.int32)
        text_pad[: len(text)] = text
        for cut in (0, len(seqs["bf16"][i]) // 2):
            prefix = np.zeros((pb,), np.int32)
            prefix[:cut] = seqs["bf16"][i][:cut]
            probe = (jnp.asarray(text_pad), jnp.int32(len(text)),
                     jnp.asarray(prefix), jnp.int32(cut))
            d_b = np.asarray(head_dists(engines["bf16"].llm_params, *probe),
                             np.float64)
            d_q = np.asarray(head_dists(engines["int8"].llm_params, *probe),
                             np.float64)
            kls.append(np.sum(d_b * (np.log(d_b + 1e-12) - np.log(d_q + 1e-12)),
                              axis=-1))
            top1.append(d_b.argmax(-1) == d_q.argmax(-1))
    kls = np.stack(kls)  # (probes, heads)
    top1 = np.stack(top1)

    out = dict(
        metric="int8_quality_delta",
        greedy_seq_match=f"{same_seq}/{args.utterances}",
        greedy_token_agreement=round(agree / max(total, 1), 4),
        first_divergence_tokens=(int(np.median(first_div)) if first_div else None),
        kl_bf16_int8_mean=round(float(kls.mean()), 6),
        kl_bf16_int8_max=round(float(kls.max()), 6),
        top1_agreement=round(float(top1.mean()), 4),
        note="weight-only int8 LLM vs bf16, flow/HiFT unquantized; greedy "
             "sampling isolates the token stream; audio deltas are token "
             "deltas (synthesis stack is identical)",
    )
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    main()
