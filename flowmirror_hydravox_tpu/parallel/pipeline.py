"""GPipe-style pipeline parallelism over the layer-stacked Qwen2 backbone.

Beyond-parity scaling feature: the reference scales training only by DDP
over GPU processes (SURVEY.md §2.13) — on a TPU pod, pipelining the layer
stack over the 'stage' mesh axis lets one model span more chips than TP
alone can feed (TP collectives ride every matmul; PP moves one (mb, T, H)
activation per microbatch per stage boundary, so it tolerates DCN between
slices where Megatron TP does not).

Design (SPMD, `jax.shard_map` over a ('data', 'stage') mesh):

  - Parameters stay in the stock layer-stacked layout (leading axis =
    layer, models/qwen2.py init_params); the leading axis is sharded over
    'stage', so each device owns a contiguous block of layers and NO
    resharding or weight surgery is needed to switch between pp and dp.
  - The global batch is split into M microbatches.  A static loop runs the
    classic GPipe schedule: at tick t, stage s runs microbatch (t - s);
    activations hop one stage per tick via `lax.ppermute`.  The loop is
    unrolled Python (M + S - 1 ticks): tick count is static and small, and
    the axon TPU backend miscompiles backward-of-scan in bf16
    (models/qwen2.py:127-131), which a pipelined TRAIN step would hit.
  - Autodiff just works: the VJP of ppermute is the inverse permute, so
    jax.grad of a pipelined loss runs the same schedule in reverse
    (backward flows last stage -> first), matching hand-written GPipe.
  - Each stage rematerializes its block with the same `dots_saveable`
    policy as the stock forward, so per-device activation memory is
    one microbatch x one stage.

Numerical contract: identical math to `qwen2.forward` (same blocks, same
order) — pipelined loss/grads match the single-program step to float
tolerance; tests/test_pipeline.py proves equality on the 8-device CPU mesh.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import LLMConfig, Qwen2Config
from ..models import qwen2
from ..models.qwen2 import _attention_block, _mlp_block, _rms_norm
from ..ops.rope import rope_cos_sin


def make_pp_mesh(stages: int, data: Optional[int] = None) -> Mesh:
    """('data', 'stage') mesh: DP outer so the gradient all-reduce stays
    within a stage's replica group."""
    import numpy as np

    devices = jax.devices()
    n = len(devices)
    if data is None:
        assert n % stages == 0, f"{n} devices not divisible by stages={stages}"
        data = n // stages
    assert data * stages == n, f"mesh {data}x{stages} != {n} devices"
    return Mesh(np.asarray(devices).reshape(data, stages), ("data", "stage"))


def _stage_block(layers, x, cfg: Qwen2Config, cos, sin, mask):
    """One stage's layer block (layers/S of them), same math as
    qwen2.forward's body, rematerialized per layer."""

    def body(x, layer):
        attn_in = _rms_norm(x, layer["input_layernorm"], cfg.rms_norm_eps)
        x = x + _attention_block(layer, attn_in, cfg, cos, sin, mask)
        mlp_in = _rms_norm(x, layer["post_attention_layernorm"], cfg.rms_norm_eps)
        return x + _mlp_block(layer, mlp_in)

    ckpt = jax.checkpoint(body, policy=jax.checkpoint_policies.dots_saveable)
    per = jax.tree.leaves(layers)[0].shape[0]
    for i in range(per):
        x = ckpt(x, jax.tree.map(lambda a: a[i], layers))
    return x


def pipeline_forward(
    params: dict,
    cfg: Qwen2Config,
    inputs_embeds: jnp.ndarray,  # (B, T, H) global batch
    lengths: Optional[jnp.ndarray],  # (B,) or None
    mesh: Mesh,
    microbatches: int,
    axis: str = "stage",
) -> jnp.ndarray:
    """Drop-in pipelined `qwen2.forward` (training/no-cache), differentiable.

    B must divide by `microbatches`; cfg.num_layers by mesh.shape[axis].
    Returns the post-final-norm hidden states (B, T, H), replicated over
    `axis` (each stage holds the full output — the loss afterwards is
    cheap relative to the stack and stays a single program).
    """
    s = mesh.shape[axis]
    m = int(microbatches)
    b, t, h = inputs_embeds.shape
    assert b % m == 0, f"batch {b} not divisible by microbatches={m}"
    assert cfg.num_layers % s == 0, (
        f"{cfg.num_layers} layers not divisible by stages={s}")
    mb = b // m

    # batch-dim 1: broadcasts over whatever the local (DP-sharded) microbatch
    # rows are inside the shard_map body
    positions = jnp.arange(t)[None, :]
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
    causal = jnp.arange(t)[:, None] >= jnp.arange(t)[None, :]
    mask = jnp.broadcast_to(causal[None], (b, t, t))
    if lengths is not None:
        valid = jnp.arange(t)[None, :] < lengths[:, None]
        mask = mask & valid[:, None, :]

    # (mb, M) layout — microbatch m is the strided rows {j*M + m} — so dim 0
    # lines up with the incoming P('data') batch sharding and entering the
    # pipeline needs NO resharding collective (the backbone is
    # row-independent, so which rows form a microbatch is irrelevant)
    x_mb = inputs_embeds.reshape(mb, m, t, h)
    mask_mb = mask.reshape(mb, m, t, t)

    layer_specs = jax.tree.map(lambda _: P(axis), params["layers"])
    # microbatch rows stay sharded over 'data' (each DP shard pipelines its
    # own rows); shard_map's transpose inserts the grad psum over 'data'
    # for the data-replicated layer params
    dspec = P("data") if "data" in mesh.axis_names else P()

    def spmd(local_layers, x_all, mask_all):
        # x_all: (mb_local, M, T, H); mask_all: (mb_local, M, T, T)
        sidx = jax.lax.axis_index(axis)
        recv = jnp.zeros_like(x_all[:, 0])
        outputs = jnp.zeros_like(x_all)
        for tick in range(m + s - 1):
            # stage s works on microbatch (tick - s); clip keeps the index
            # legal during fill/drain (those results are masked out below)
            mb_idx = jnp.clip(tick - sidx, 0, m - 1)
            cur = jnp.where(sidx == 0, x_all[:, min(tick, m - 1)], recv)
            msk = jax.lax.dynamic_index_in_dim(mask_all, mb_idx, 1, keepdims=False)
            out = _stage_block(local_layers, cur, cfg, cos, sin, msk)
            if tick >= s - 1:
                outputs = outputs.at[:, tick - (s - 1)].set(
                    jnp.where(sidx == s - 1, out, jnp.zeros_like(out)))
            if s > 1:
                recv = jax.lax.ppermute(
                    out, axis, [(i, i + 1) for i in range(s - 1)])
        # only the last stage wrote non-zeros: psum replicates it over stages
        return jax.lax.psum(outputs, axis)

    out = jax.shard_map(
        spmd,
        mesh=mesh,
        in_specs=(layer_specs, dspec, dspec),
        out_specs=dspec,
        check_vma=False,
    )(params["layers"], x_mb, mask_mb)
    out = out.reshape(b, t, h)
    return _rms_norm(out, params["norm"], cfg.rms_norm_eps)


def make_pp_llm_step(mesh: Mesh, cfg: LLMConfig, optimizer, microbatches: int):
    """Pipeline+data-parallel CosyVoice3LM train step over a
    ('data', 'stage') mesh.

    Backbone layers are stage-sharded and pipelined; embeddings, MTP block,
    and decoder stay replicated (they are <8% of the FLOPs); the batch is
    DP-sharded over 'data' and GPipe-microbatched over 'stage'.  Equal-loss
    vs the single-program `llm_train_step` is proven in
    tests/test_pipeline.py.
    """
    from ..models import llm as llm_model
    from ..train.steps import _apply_grads

    def loss_fn(params, mb):
        out = llm_model.forward_loss(
            params, cfg, mb["text_token"], mb["text_len"],
            mb["speech_token"], mb["speech_len"],
            backbone_forward=partial(
                pipeline_forward, mesh=mesh, microbatches=microbatches),
        )
        return out["loss"], out["acc"]

    def step(state, batch):
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch)
        new_state, gnorm = _apply_grads(state, grads, optimizer)
        return new_state, {"loss": loss, "acc": acc, "grad_norm": gnorm}

    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        step,
        in_shardings=(None, {"text_token": data, "text_len": data,
                             "speech_token": data, "speech_len": data}),
        donate_argnums=(0,),
    )


def pp_param_shardings(mesh: Mesh, params: dict, axis: str = "stage") -> dict:
    """NamedShardings placing the backbone layer stack over `axis` (leading
    = layer) and everything else replicated — apply with jax.device_put to
    the full CosyVoice3LM param tree (or any tree with backbone/layers)."""

    def place(tree, stage_sharded: bool):
        spec = P(axis) if stage_sharded else P()
        return jax.tree.map(lambda _: NamedSharding(mesh, spec), tree)

    out = {}
    for k, v in params.items():
        if k == "backbone":
            out[k] = {
                kk: place(vv, kk == "layers") for kk, vv in v.items()
            }
        else:
            out[k] = place(v, False)
    return out
