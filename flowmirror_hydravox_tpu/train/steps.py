"""Jitted train steps for the LLM (MTP multi-head CE) and Flow (CFM MSE).

TPU-native replacement for the reference's HF-Trainer/Accelerate/DeepSpeed
stack (SURVEY.md §2.7, train_speech_model.py:753-907):

  - data parallelism = batch sharding over the mesh 'data' axis via pjit;
    XLA inserts the gradient all-reduce over ICI (replaces DDP/NCCL).
  - ZeRO-2 equivalent: optimizer moments sharded over 'data'
    (parallel/sharding.py zero_sharding; replaces DeepSpeed stage 2,
    configs/deepspeed_config.json).
  - bf16 params with f32 master-grad accumulation via optax; grad-clip 1.0
    matches the reference deepspeed config.
  - inf/nan grad skip mirrors reference train_utils.py:305-315.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import FlowConfig, LLMConfig
from ..models import flow as flow_model
from ..models import llm as llm_model


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    learning_rate: float = 1e-4
    warmup_steps: int = 2500
    weight_decay: float = 0.01
    grad_clip: float = 1.0
    b1: float = 0.9
    b2: float = 0.999
    schedule: str = "warmup_cosine"  # or "warmuplr" (WeNet WarmupLR)
    total_steps: int = 200_000


def make_schedule(cfg: OptimConfig):
    """LR schedule family (reference cosyvoice/utils/scheduler.py):
    warmuplr (WarmupLR:27), noam/noamhold (NoamHoldAnnealing:623),
    constant (ConstantLR:719), warmup_cosine (HF-Trainer default path)."""
    lr = cfg.learning_rate
    # clamp warmup so short runs (e.g. smoke trainings) stay valid
    warmup = max(min(cfg.warmup_steps, cfg.total_steps // 2), 1)
    w = float(warmup)

    if cfg.schedule == "warmup_cosine":
        return optax.warmup_cosine_decay_schedule(
            0.0, lr, warmup, max(cfg.total_steps, warmup + 1)
        )
    if cfg.schedule == "constant":
        return lambda step: jnp.full((), lr)
    if cfg.schedule == "warmuplr":
        # lr * warmup^0.5 * min(step^-0.5, step * warmup^-1.5)
        def warmuplr(step):
            s = jnp.maximum(step.astype(jnp.float32), 1.0)
            return lr * (w ** 0.5) * jnp.minimum(s ** -0.5, s * w ** -1.5)

        return warmuplr
    if cfg.schedule in ("noam", "noamhold"):
        # NoamHoldAnnealing with hold = 10% of total after warmup, decay 0.5
        hold = 0.1 * cfg.total_steps if cfg.schedule == "noamhold" else 0.0

        def noam(step):
            s = jnp.maximum(step.astype(jnp.float32), 1.0)
            warm = lr * s / w
            anneal_start = w + hold
            decay = lr * (jnp.maximum(s, anneal_start) / anneal_start) ** -0.5
            return jnp.where(s <= w, warm, jnp.where(s <= anneal_start, lr, decay))

        return noam
    raise ValueError(f"unknown schedule {cfg.schedule}")


def make_optimizer(cfg: OptimConfig) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(make_schedule(cfg), b1=cfg.b1, b2=cfg.b2, weight_decay=cfg.weight_decay),
    )


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def init_state(params: Any, optimizer: optax.GradientTransformation) -> TrainState:
    return TrainState(params=params, opt_state=optimizer.init(params), step=jnp.int32(0))


def _apply_grads(state: TrainState, grads, optimizer) -> Tuple[TrainState, jnp.ndarray]:
    """Skip the update on non-finite grad norm (train_utils.py:305-315).

    The skip is a `lax.cond`, not per-leaf `where` selects: the select form
    re-streamed every param + both Adam moments through three tree-wide
    selects (~28 ms of the 107 ms device step at the bench shape, xplane
    2026-08); cond executes only the taken branch."""
    gnorm = optax.global_norm(grads)
    finite = jnp.isfinite(gnorm)

    def do_update(operand):
        g, opt_state, params = operand
        updates, new_opt = optimizer.update(g, opt_state, params)
        return optax.apply_updates(params, updates), new_opt

    def skip_update(operand):
        _, opt_state, params = operand
        return params, opt_state

    new_params, new_opt = jax.lax.cond(
        finite, do_update, skip_update, (grads, state.opt_state, state.params)
    )
    return TrainState(new_params, new_opt, state.step + 1), gnorm


def _value_and_grad_accum(loss_fn, params, batch, accum_steps: int, rng=None):
    """Gradient accumulation over micro-batches inside ONE jitted step.

    TPU-native equivalent of the reference's grad accumulation (DDP
    `no_sync` + loss/accum scaling, train_utils.py:277-291; HF Trainer
    `gradient_accumulation_steps`): the global batch (leading dim B) is
    reshaped to (k, B//k, ...) and a `lax.scan` runs backward per
    micro-batch, summing grads in f32 — peak activation memory is that of
    one micro-batch, and XLA keeps the whole loop in one program (no k
    host dispatches).  Returned grads are the mean over micro-batches,
    cast back to the param dtype, so downstream (clip/adamw/moments) is
    bit-compatible with the accum_steps=1 path.

    loss_fn(params, micro_batch[, rng]) -> (loss, aux); loss must be a
    per-micro-batch mean (same convention as the reference, which divides
    each micro loss by accum_grad), so equal-size micro-batches average to
    the full-batch loss.  rng, when given, is split per micro-batch.
    """
    vg = jax.value_and_grad(loss_fn, has_aux=True)
    if accum_steps <= 1:
        return (vg(params, batch, rng) if rng is not None else vg(params, batch))

    k = int(accum_steps)

    def _split(x):
        if x.shape[0] % k:
            raise ValueError(
                f"batch dim {x.shape[0]} not divisible by accum_steps {k}")
        return x.reshape(k, x.shape[0] // k, *x.shape[1:])

    micro = jax.tree.map(_split, batch)
    xs = (micro, jax.random.split(rng, k)) if rng is not None else (micro,)

    def body_fn(carry, mb_rng):
        gsum, lsum, auxsum = carry
        (loss, aux), g = vg(params, *mb_rng)
        gsum = jax.tree.map(lambda a, b: a + b.astype(jnp.float32), gsum, g)
        auxsum = jax.tree.map(lambda a, b: a + b.astype(jnp.float32), auxsum, aux)
        return (gsum, lsum + loss.astype(jnp.float32), auxsum), None

    # probe aux structure on micro-batch 0 shapes without running compute:
    # eval_shape is free under tracing and keeps init zeros structurally right
    mb0 = jax.tree.map(lambda x: x[0], micro)
    aux_shape = jax.eval_shape(
        lambda p: vg(p, mb0, rng)[0][1] if rng is not None else vg(p, mb0)[0][1],
        params,
    )
    init = (
        jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32), params),
        jnp.float32(0.0),
        jax.tree.map(lambda s: jnp.zeros(s.shape, jnp.float32), aux_shape),
    )
    (gsum, lsum, auxsum), _ = jax.lax.scan(body_fn, init, xs)
    grads = jax.tree.map(lambda g, p: (g / k).astype(p.dtype), gsum, params)
    loss = lsum / k
    aux = jax.tree.map(lambda a: a / k, auxsum)
    return (loss, aux), grads


def llm_train_step(
    state: TrainState,
    batch: dict,
    cfg: LLMConfig,
    optimizer: optax.GradientTransformation,
    accum_steps: int = 1,
) -> Tuple[TrainState, dict]:
    """batch: text_token (B, Lt), text_len (B,), speech_token (B, Ls),
    speech_len (B,). Differentiable through forward_loss (MTP CE).
    accum_steps > 1 scans backward over B//accum_steps micro-batches
    (_value_and_grad_accum) before one optimizer update."""

    def loss_fn(params, mb):
        out = llm_model.forward_loss(
            params, cfg, mb["text_token"], mb["text_len"],
            mb["speech_token"], mb["speech_len"],
        )
        return out["loss"], out["acc"]

    (loss, acc), grads = _value_and_grad_accum(
        loss_fn, state.params, batch, accum_steps)
    new_state, gnorm = _apply_grads(state, grads, optimizer)
    return new_state, {"loss": loss, "acc": acc, "grad_norm": gnorm}


def dpo_train_step(
    state: TrainState,
    ref_params: Any,
    batch: dict,
    cfg: LLMConfig,
    optimizer: optax.GradientTransformation,
    beta: float = 0.01,
    label_smoothing: float = 0.0,
    ipo: bool = False,
    accum_steps: int = 1,
) -> Tuple[TrainState, dict]:
    """DPO step (reference bin/train.py:162-173 + train_utils.py:256-273):
    total loss = preference loss (beta=0.01) + SFT CE on the chosen sequence;
    the frozen ref model's logps are computed inside the same jitted step.

    batch: text_token (B, Lt), text_len, chosen_token (B, Ls), chosen_len,
    rejected_token (B, Lr), rejected_len."""
    from ..models.llm_extras import dpo_loss as _dpo_loss, forward_dpo

    def loss_fn(params, mb):
        args = (
            mb["text_token"], mb["text_len"],
            mb["chosen_token"], mb["chosen_len"],
            mb["rejected_token"], mb["rejected_len"],
        )
        # frozen-reference logps recomputed per micro-batch inside the same
        # program (the scan keeps only one micro-batch's activations live)
        ref_out = forward_dpo(ref_params, cfg, *args)
        ref_chosen = jax.lax.stop_gradient(ref_out["chosen_logps"])
        ref_rejected = jax.lax.stop_gradient(ref_out["rejected_logps"])
        out = forward_dpo(params, cfg, *args)
        pref, chosen_r, rejected_r = _dpo_loss(
            out["chosen_logps"], out["rejected_logps"], ref_chosen, ref_rejected,
            beta=beta, label_smoothing=label_smoothing, ipo=ipo,
        )
        total = pref + out["loss"]
        aux = {
            "sft_loss": out["loss"],
            "dpo_loss": pref,
            "acc": out["acc"],
            "dpo_acc": jnp.mean((chosen_r > rejected_r).astype(jnp.float32)),
            "chosen_reward": jnp.mean(chosen_r),
            "reject_reward": jnp.mean(rejected_r),
        }
        return total, aux

    (loss, aux), grads = _value_and_grad_accum(
        loss_fn, state.params, batch, accum_steps)
    new_state, gnorm = _apply_grads(state, grads, optimizer)
    return new_state, {"loss": loss, "grad_norm": gnorm, **aux}


def flow_train_step(
    state: TrainState,
    batch: dict,
    rng: jax.Array,
    cfg: FlowConfig,
    optimizer: optax.GradientTransformation,
    accum_steps: int = 1,
) -> Tuple[TrainState, dict]:
    """batch: speech_token (B, Lt), token_len, speech_feat (B, Tm, 80),
    feat_len, embedding (B, 192). accum_steps > 1 splits the rng per
    micro-batch (each gets its own CFM noise/t draws)."""

    def loss_fn(params, mb, r):
        loss = flow_model.compute_loss(
            params, cfg, r, mb["speech_token"], mb["token_len"],
            mb["speech_feat"], mb["feat_len"], mb["embedding"],
        )
        return loss, jnp.float32(0.0)

    (loss, _), grads = _value_and_grad_accum(
        loss_fn, state.params, batch, accum_steps, rng=rng)
    # rand_noise is a fixed buffer — zero its grad so it never trains
    grads = dict(grads)
    grads["rand_noise"] = jnp.zeros_like(grads["rand_noise"])
    new_state, gnorm = _apply_grads(state, grads, optimizer)
    return new_state, {"loss": loss, "grad_norm": gnorm}


def make_sharded_llm_step(mesh, cfg: LLMConfig, optimizer):
    """pjit-wrapped data-parallel LLM train step over the mesh.

    Params replicated (DP), batch sharded over 'data'. XLA inserts the
    gradient psum over ICI. For TP, constrain params with
    parallel/sharding.llm_param_specs instead of replication."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))

    step = partial(llm_train_step, cfg=cfg, optimizer=optimizer)
    return jax.jit(
        step,
        in_shardings=(
            None,  # state: let jit infer / keep as placed
            {"text_token": data, "text_len": data, "speech_token": data, "speech_len": data},
        ),
        donate_argnums=(0,),
    )
