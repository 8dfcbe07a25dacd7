"""Standalone train-step benchmarks: flow-CFM, HiFT-GAN, DPO.

Round-2 review gap: only the LLM train step was measured on real hardware;
the GAN step in particular (multi-resolution STFT + MPD/MRD discriminators)
is the likeliest program to break XLA on TPU, and its compile once crashed
the axon remote compiler.  bench.py therefore runs each of these in a
SUBPROCESS (`python -m flowmirror_hydravox_tpu.tools.bench_train --which X`)
so a compiler OOM/SIGKILL degrades to a reported failure instead of killing
the whole benchmark.

Each invocation prints exactly one JSON line:
  {"metric": "train_step_<which>", "step_ms": ..., ...}   on success
  {"metric": "train_step_<which>", "error": "..."}         on failure

Timing per the axon tunnel rules (memory/axon-tpu-quirks): queue N steps
back-to-back and fetch the final loss — `block_until_ready` does not
actually wait on this backend, a data fetch does; N amortizes the ~30 ms
dispatch cost.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _flops_matmul_params(tree):
    import jax
    import numpy as np

    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(tree) if p.ndim >= 2)


def _time_steps(run_one, fetch, warm=1, iters=6):
    """run_one(i) queues step i; fetch() forces device sync. Returns s/step."""
    for i in range(warm):
        run_one(i)
    fetch()
    t0 = time.time()
    for i in range(iters):
        run_one(100 + i)
    fetch()
    return (time.time() - t0) / iters


def bench_llm(peak_flops: float, accum: int = 1):
    """Production-shape MTP train step: a batch of long utterances — the
    shape the frame-budget batcher actually feeds, vs bench.py's
    serving-scale B=8/Ls=256 point.  --accum K scales the GLOBAL batch to
    K x 16 while the compiled backward stays the B=16 micro program
    (train/steps.py _value_and_grad_accum), sidestepping the host's
    remote-compiler memory cap on bigger one-shot graphs."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..config import HydraVoxConfig
    from ..train.steps import OptimConfig, init_state, llm_train_step, make_optimizer
    from ..models import llm as llm_model

    cfg = HydraVoxConfig()
    # sequences past ~256 speech tokens crash this host's constrained remote
    # XLA service during the backward's compile (tpu_compile_helper exit 1,
    # like the fused GAN graph; tried B=16/750, B=8/750, B=16/375 — an infra
    # memory cap, not a framework limit); B=16 x 256 is the largest shape
    # that compiles there and doubles the bench.py point's batch
    b, lt, ls = 16 * accum, 64, 256
    params = jax.jit(lambda k: llm_model.init_params(k, cfg.llm, jnp.bfloat16))(
        jax.random.PRNGKey(0))
    opt = make_optimizer(OptimConfig(warmup_steps=10, total_steps=1000))
    state = init_state(params, opt)
    rng0 = np.random.default_rng(0)
    batch = {
        "text_token": jnp.zeros((b, lt), jnp.int32),
        "text_len": jnp.full((b,), lt, jnp.int32),
        "speech_token": jnp.asarray(
            rng0.integers(0, cfg.llm.speech_token_size, (b, ls)), jnp.int32),
        "speech_len": jnp.full((b,), ls, jnp.int32),
    }
    step = jax.jit(lambda s, bt: llm_train_step(s, bt, cfg.llm, opt,
                                                accum_steps=accum),
                   donate_argnums=(0,))

    holder = {"state": state, "m": None}

    def run_one(i):
        holder["state"], holder["m"] = step(holder["state"], batch)

    step_s = _time_steps(run_one, lambda: float(holder["m"]["loss"]))
    p_mm = _flops_matmul_params(params["backbone"]["layers"]) \
        + _flops_matmul_params(params["mtp_block"]) \
        + _flops_matmul_params(params["llm_decoder"])
    tok = b * (2 + lt + ls)
    flops = 6 * p_mm * tok
    name = "train_step_llm_batch" if accum == 1 else f"train_step_llm_accum{accum}"
    return {
        "metric": name, "step_ms": round(step_s * 1000, 1),
        "tokens_per_sec": round(tok / step_s, 1),
        "mfu_pct": round(flops / step_s / peak_flops * 100, 1),
        "batch": [b, lt, ls], "grad_accum": accum,
    }


def bench_flow(peak_flops: float):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..config import HydraVoxConfig
    from ..models import flow as flow_model
    from ..train.steps import OptimConfig, flow_train_step, init_state, make_optimizer

    cfg = HydraVoxConfig()
    b, lt = 16, 128  # realistic frame-budget batch (was 4 in round 3's first cut)
    tm = lt * cfg.flow.token_mel_ratio
    params = jax.jit(lambda k: flow_model.init_params(k, cfg.flow, jnp.bfloat16))(
        jax.random.PRNGKey(0))
    opt = make_optimizer(OptimConfig(warmup_steps=10, total_steps=1000))
    state = init_state(params, opt)
    rng0 = np.random.default_rng(0)
    batch = {
        "speech_token": jnp.asarray(rng0.integers(0, 1000, (b, lt)), jnp.int32),
        "token_len": jnp.full((b,), lt, jnp.int32),
        "speech_feat": jnp.asarray(rng0.standard_normal((b, tm, 80)), jnp.float32) - 4.0,
        "feat_len": jnp.full((b,), tm, jnp.int32),
        "embedding": jnp.asarray(rng0.standard_normal((b, 192)), jnp.float32),
    }
    step = jax.jit(lambda s, bt, r: flow_train_step(s, bt, r, cfg.flow, opt),
                   donate_argnums=(0,))

    holder = {"state": state, "m": None}

    def run_one(i):
        holder["state"], holder["m"] = step(holder["state"], batch,
                                            jax.random.PRNGKey(i))

    step_s = _time_steps(run_one, lambda: float(holder["m"]["loss"]))
    # rough FLOPs: 6 * matmul-params * positions over the CFM estimator
    # (one noised pass per step); attention cost excluded -> conservative MFU
    p_mm = _flops_matmul_params(params)
    flops = 6 * p_mm * b * tm
    return {
        "metric": "train_step_flow", "step_ms": round(step_s * 1000, 1),
        "frames_per_sec": round(b * tm / step_s, 1),
        "mfu_pct_approx": round(flops / step_s / peak_flops * 100, 1),
        "batch": [b, lt, tm],
    }


def bench_gan(peak_flops: float):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..config import HydraVoxConfig
    from ..models import discriminator as disc_model
    from ..models import hift as hift_model
    from ..train.gan import gan_train_step
    from ..train.steps import OptimConfig, init_state, make_optimizer

    cfg = HydraVoxConfig()
    b, frames = 4, 32  # train_hift.py default segment_frames
    t_audio = frames * cfg.hift.upsample_scale
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    gen_params = jax.jit(lambda k: hift_model.init_params(k, cfg.hift, jnp.float32))(k1)
    disc_params = jax.jit(disc_model.init_params)(k2)
    gen_opt = make_optimizer(OptimConfig(learning_rate=2e-4, warmup_steps=10,
                                         total_steps=1000))
    disc_opt = make_optimizer(OptimConfig(learning_rate=2e-4, warmup_steps=10,
                                          total_steps=1000))
    gen_state = init_state(gen_params, gen_opt)
    disc_state = init_state(disc_params, disc_opt)
    rng0 = np.random.default_rng(0)
    batch = {
        "speech_feat": jnp.asarray(rng0.standard_normal((b, frames, 80)),
                                   jnp.float32) - 4.0,
        "pitch_feat": jnp.abs(jnp.asarray(
            rng0.standard_normal((b, frames)), jnp.float32)) * 200.0,
        "speech": jnp.asarray(rng0.standard_normal((b, t_audio)),
                              jnp.float32) * 0.1,
    }
    # split G/D programs (train_hift.py --split_step): the fused G+D graph's
    # XLA compile has OOM-killed / hung the axon remote compiler; two smaller
    # programs compile reliably and are functionally the same update order
    from ..train.gan import gan_disc_step, gan_gen_step

    gen_fn = jax.jit(lambda gs, dp, bt, r: gan_gen_step(
        gs, dp, bt, r, cfg.hift, gen_opt), donate_argnums=(0,))
    disc_fn = jax.jit(lambda ds, real, fake: gan_disc_step(
        ds, real, fake, disc_opt), donate_argnums=(0,))

    holder = {"g": gen_state, "d": disc_state, "m": None}

    def run_one(i):
        holder["g"], fake_sg, gm = gen_fn(holder["g"], holder["d"].params,
                                          batch, jax.random.PRNGKey(i))
        holder["d"], dm = disc_fn(holder["d"], batch["speech"], fake_sg)
        holder["m"] = {**gm, **dm}

    t0 = time.time()
    run_one(0)
    loss0 = float(holder["m"]["gen_loss"])
    compile_s = time.time() - t0
    step_s = _time_steps(run_one, lambda: float(holder["m"]["gen_loss"]), warm=0)
    return {
        "metric": "train_step_gan", "step_ms": round(step_s * 1000, 1),
        "audio_sec_per_sec": round(b * t_audio / cfg.sample_rate / step_s, 2),
        "compile_s": round(compile_s, 1), "gen_loss0": round(loss0, 2),
        "batch": [b, frames, t_audio],
        "note": "split G/D programs (fused graph kills the remote compiler; "
                "train_hift.py --split_step)",
    }


def bench_dpo(peak_flops: float):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..config import HydraVoxConfig
    from ..models import llm as llm_model
    from ..train.steps import OptimConfig, dpo_train_step, init_state, make_optimizer

    cfg = HydraVoxConfig()
    b, lt, ls = 4, 64, 256
    params = jax.jit(lambda k: llm_model.init_params(k, cfg.llm, jnp.bfloat16))(
        jax.random.PRNGKey(0))
    # real device copy: the train state is donated each step, and aliased
    # ref buffers would be invalidated with it
    ref_params = jax.tree.map(jnp.copy, params)
    opt = make_optimizer(OptimConfig(learning_rate=1e-5, warmup_steps=10,
                                     total_steps=1000))
    state = init_state(params, opt)
    rng0 = np.random.default_rng(0)
    batch = {
        "text_token": jnp.zeros((b, lt), jnp.int32),
        "text_len": jnp.full((b,), lt, jnp.int32),
        "chosen_token": jnp.asarray(
            rng0.integers(0, cfg.llm.speech_token_size, (b, ls)), jnp.int32),
        "chosen_len": jnp.full((b,), ls, jnp.int32),
        "rejected_token": jnp.asarray(
            rng0.integers(0, cfg.llm.speech_token_size, (b, ls)), jnp.int32),
        "rejected_len": jnp.full((b,), ls, jnp.int32),
    }
    step = jax.jit(lambda s, rp, bt: dpo_train_step(s, rp, bt, cfg.llm, opt),
                   donate_argnums=(0,))

    holder = {"state": state, "m": None}

    def run_one(i):
        holder["state"], holder["m"] = step(holder["state"], ref_params, batch)

    step_s = _time_steps(run_one, lambda: float(holder["m"]["loss"]))
    # FLOPs: policy fwd+bwd on chosen+rejected (6x2) + frozen ref fwd (2x2)
    p_mm = _flops_matmul_params(params)
    tok = b * (2 + lt + ls)
    flops = (6 * 2 + 2 * 2) * p_mm * tok
    return {
        "metric": "train_step_dpo", "step_ms": round(step_s * 1000, 1),
        "pairs_per_sec": round(b / step_s, 2),
        "mfu_pct_approx": round(flops / step_s / peak_flops * 100, 1),
        "batch": [b, lt, ls],
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--which", choices=["llm", "flow", "gan", "dpo"], required=True)
    p.add_argument("--peak_tflops", type=float, default=197.0,
                   help="bf16 peak of the chip (v5e default)")
    p.add_argument("--cache_dir", default=None)
    p.add_argument("--accum", type=int, default=1,
                   help="gradient-accumulation factor (llm only): global "
                        "batch = 16*accum, backward compiled at micro B=16")
    args = p.parse_args(argv)

    import jax

    if args.cache_dir:
        jax.config.update("jax_compilation_cache_dir", args.cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if args.accum != 1 and args.which != "llm":
        p.error("--accum is implemented for --which llm only; the GAN/flow/"
                "dpo benches run at accum=1 (don't silently report a "
                "different configuration than requested)")
    fn = {"llm": bench_llm, "flow": bench_flow, "gan": bench_gan,
          "dpo": bench_dpo}[args.which]
    try:
        out = (fn(args.peak_tflops * 1e12, accum=args.accum)
               if args.which == "llm" else fn(args.peak_tflops * 1e12))
    except Exception as e:
        import traceback

        traceback.print_exc()
        out = {"metric": f"train_step_{args.which}",
               "error": f"{type(e).__name__}: {str(e)[:300]}"}
    print(json.dumps(out))
    sys.stdout.flush()
    return 0 if "error" not in out else 1


if __name__ == "__main__":
    sys.exit(main())
