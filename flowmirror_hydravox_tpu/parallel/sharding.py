"""Parameter/activation sharding rules (PartitionSpecs) for the HydraVox stack.

Megatron-style TP layout for the Qwen2 backbone over the 'model' axis:
  - q/k/v projections: shard the head (output) dim -> column parallel
  - o projection: shard the input dim -> row parallel (psum inserted by XLA)
  - MLP gate/up: column parallel; down: row parallel
  - embeddings / norms / small heads: replicated

The MTP heads and DiT estimator follow the same pattern.  Optimizer-state
sharding (ZeRO-equivalent of the reference's DeepSpeed stage 2,
configs/deepspeed_config.json) shards optimizer moments over 'data' on the
largest axis — see `zero_sharding`.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def qwen2_param_specs() -> dict:
    """PartitionSpecs matching models/qwen2.py init_params tree (layer-stacked:
    leading axis = layer, never sharded)."""
    return {
        "embed_tokens": P(),
        "layers": {
            "input_layernorm": P(),
            "q_proj_w": P(None, None, "model"),
            "q_proj_b": P(None, "model"),
            "k_proj_w": P(None, None, "model"),
            "k_proj_b": P(None, "model"),
            "v_proj_w": P(None, None, "model"),
            "v_proj_b": P(None, "model"),
            "o_proj_w": P(None, "model", None),
            "post_attention_layernorm": P(),
            "gate_proj_w": P(None, None, "model"),
            "up_proj_w": P(None, None, "model"),
            "down_proj_w": P(None, "model", None),
        },
        "norm": P(),
    }


def llm_param_specs() -> dict:
    mtp = {
        "input_layernorm": P(),
        "q_proj_w": P(None, None, "model"),
        "q_proj_b": P(None, "model"),
        "k_proj_w": P(None, None, "model"),
        "k_proj_b": P(None, "model"),
        "v_proj_w": P(None, None, "model"),
        "v_proj_b": P(None, "model"),
        "o_proj_w": P(None, "model", None),
        "post_attention_layernorm": P(),
        "gate_proj_w": P(None, None, "model"),
        "up_proj_w": P(None, None, "model"),
        "down_proj_w": P(None, "model", None),
    }
    return {
        "backbone": qwen2_param_specs(),
        "llm_decoder": P(None, "model"),
        "speech_embedding": P(),
        "mtp_block": mtp,
    }


def dit_param_specs() -> dict:
    def lin(spec_w, spec_b=P()):
        return {"w": spec_w, "b": spec_b}

    return {
        "time_mlp_in": lin(P()),
        "time_mlp_out": lin(P()),
        "input_proj": lin(P()),
        "conv_pos1": lin(P()),
        "conv_pos2": lin(P()),
        "blocks": {
            "attn_norm_linear": lin(P(None, None, None), P(None, None)),
            "to_q": lin(P(None, None, "model"), P(None, "model")),
            "to_k": lin(P(None, None, "model"), P(None, "model")),
            "to_v": lin(P(None, None, "model"), P(None, "model")),
            "to_out": lin(P(None, "model", None), P(None, None)),
            "ff_in": lin(P(None, None, "model"), P(None, "model")),
            "ff_out": lin(P(None, "model", None), P(None, None)),
        },
        "norm_out_linear": lin(P()),
        "proj_out": lin(P()),
    }


def flow_param_specs() -> dict:
    return {
        "input_embedding": P(),
        "spk_embed_affine": {"w": P(), "b": P()},
        "pre_lookahead_conv1": {"w": P(), "b": P()},
        "pre_lookahead_conv2": {"w": P(), "b": P()},
        "estimator": dit_param_specs(),
        "rand_noise": P(),
    }


def hift_param_specs(params: Any) -> Any:
    """HiFT is small (~18M) — replicate everything. Specs mirror the tree."""
    return jax.tree.map(lambda _: P(), params)


def named(mesh: Mesh, specs: Any) -> Any:
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def _largest_axis_sharding(tree: Any, mesh: Mesh, axis: str) -> Any:
    """Shard each leaf's largest `axis`-divisible dimension over `axis`,
    replicate leaves with no divisible dimension."""
    n = mesh.shape[axis]

    def spec_for(leaf):
        shape = getattr(leaf, "shape", ())
        best, best_dim = None, 0
        for d, s in enumerate(shape):
            if s % n == 0 and s > best_dim:
                best, best_dim = d, s
        if best is None:
            return P()
        parts = [None] * len(shape)
        parts[best] = axis
        return P(*parts)

    return jax.tree.map(lambda leaf: NamedSharding(mesh, spec_for(leaf)), tree)


def zero_sharding(params: Any, mesh: Mesh, axis: str = "data") -> Any:
    """ZeRO-2-style optimizer-state sharding: shard each leaf's largest
    divisible axis over `axis`, replicate otherwise.  Applied to optax
    moment tensors (the reference's DeepSpeed stage-2 equivalent)."""
    return _largest_axis_sharding(params, mesh, axis)


def fsdp_sharding(params: Any, mesh: Mesh, axis: str = "data") -> Any:
    """FSDP / ZeRO-3-class *parameter* sharding over the 'data' axis.

    Each weight leaf lives sharded on its largest divisible dimension; under
    GSPMD the train step all-gathers a parameter right before its matmul and
    reduce-scatters its gradient, so peak per-chip memory is params/N + one
    gathered layer — one stage beyond the reference's DeepSpeed ZeRO-2
    ceiling (configs/deepspeed_config.json).  Optimizer moments created with
    zeros_like inherit this layout for free, which also subsumes
    `zero_sharding`.  Numerics are bit-comparable to replicated DP: the
    gradient math is unchanged, only its layout is."""
    return _largest_axis_sharding(params, mesh, axis)
