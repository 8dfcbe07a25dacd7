"""Reference PyTorch checkpoint -> JAX param-pytree conversion.

Maps the reference state dicts (llm.pt / flow.pt / hift.pt, key layout per
reference `CosyVoice3LM` / `CausalMaskedDiffWithDiT` / `HiFTGenerator`) onto
our functional parameter trees.  Key maps are derived from
SURVEY.md §2.9 and the module definitions cited in each converter.

All functions take a flat {name: np.ndarray} state dict (use `load_torch_pt`
to read a .pt file) and return numpy pytrees; callers cast to the serving
dtype policy (LLM bf16, flow bf16, hift f32 — reference
infer_speech_model.py:99-118 uses bf16/fp16/fp32 on GPU; bf16 is the TPU
equivalent of its fp16 choice).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from ..config import DiTConfig, FlowConfig, HiFTConfig, LLMConfig, Qwen2Config


def load_torch_pt(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .pt checkpoint into numpy arrays (CPU, no grad state)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj and isinstance(obj["state_dict"], dict):
        obj = obj["state_dict"]
    out = {}
    for k, v in obj.items():
        if hasattr(v, "detach"):
            out[k] = v.detach().to(torch.float32).numpy()
    return out


def _t(sd, key):
    return np.ascontiguousarray(sd[key].T)


def merge_weight_norm(sd: Dict[str, np.ndarray], base: str) -> np.ndarray:
    """Fold torch weight_norm into a plain weight.

    Handles both layouts: `<base>.weight_g`/`.weight_v` (legacy) and
    `<base>.parametrizations.weight.original0/original1` (torch >= 2.1)."""
    if base + ".weight" in sd:
        return sd[base + ".weight"]
    if base + ".weight_g" in sd:
        g, v = sd[base + ".weight_g"], sd[base + ".weight_v"]
    else:
        g = sd[base + ".parametrizations.weight.original0"]
        v = sd[base + ".parametrizations.weight.original1"]
    axes = tuple(range(1, v.ndim))
    norm = np.sqrt(np.sum(v * v, axis=axes, keepdims=True))
    return g * v / np.maximum(norm, 1e-12)


# ---------------------------------------------------------------------------
# Qwen2 backbone


def qwen2_from_state_dict(sd: Dict[str, np.ndarray], cfg: Qwen2Config, prefix: str = "") -> dict:
    """HF Qwen2ForCausalLM state dict -> models/qwen2.py param tree.

    `prefix` is '' for a bare HF model or 'llm.model.' inside a CosyVoice3LM
    checkpoint (Qwen2Encoder.model, llm_multi_head_v3.py:232-235)."""
    p = prefix + "model."

    def stack(fmt):
        return np.stack([sd[fmt.format(i)] for i in range(cfg.num_layers)])

    def stack_t(fmt):
        return np.stack([sd[fmt.format(i)].T for i in range(cfg.num_layers)])

    params = {
        "embed_tokens": sd[p + "embed_tokens.weight"],
        "layers": {
            "input_layernorm": stack(p + "layers.{}.input_layernorm.weight"),
            "q_proj_w": stack_t(p + "layers.{}.self_attn.q_proj.weight"),
            "q_proj_b": stack(p + "layers.{}.self_attn.q_proj.bias"),
            "k_proj_w": stack_t(p + "layers.{}.self_attn.k_proj.weight"),
            "k_proj_b": stack(p + "layers.{}.self_attn.k_proj.bias"),
            "v_proj_w": stack_t(p + "layers.{}.self_attn.v_proj.weight"),
            "v_proj_b": stack(p + "layers.{}.self_attn.v_proj.bias"),
            "o_proj_w": stack_t(p + "layers.{}.self_attn.o_proj.weight"),
            "post_attention_layernorm": stack(p + "layers.{}.post_attention_layernorm.weight"),
            "gate_proj_w": stack_t(p + "layers.{}.mlp.gate_proj.weight"),
            "up_proj_w": stack_t(p + "layers.{}.mlp.up_proj.weight"),
            "down_proj_w": stack_t(p + "layers.{}.mlp.down_proj.weight"),
        },
        "norm": sd[p + "norm.weight"],
    }
    if not cfg.tie_word_embeddings and prefix + "lm_head.weight" in sd:
        params["lm_head"] = sd[prefix + "lm_head.weight"].T
    return params


# ---------------------------------------------------------------------------
# CosyVoice3LM (MTP)


def llm_from_state_dict(sd: Dict[str, np.ndarray], cfg: LLMConfig) -> dict:
    """CosyVoice3LM state dict -> models/llm.py param tree
    (llm_multi_head_v3.py:622-690)."""
    nh = cfg.head_num

    def stack(fmt):
        return np.stack([sd[fmt.format(i)] for i in range(nh)])

    def stack_t(fmt):
        return np.stack([sd[fmt.format(i)].T for i in range(nh)])

    mtp = {
        "input_layernorm": stack("mtp_block.{}.input_layernorm.weight"),
        "q_proj_w": stack_t("mtp_block.{}.self_attn.q_proj.weight"),
        "q_proj_b": stack("mtp_block.{}.self_attn.q_proj.bias"),
        "k_proj_w": stack_t("mtp_block.{}.self_attn.k_proj.weight"),
        "k_proj_b": stack("mtp_block.{}.self_attn.k_proj.bias"),
        "v_proj_w": stack_t("mtp_block.{}.self_attn.v_proj.weight"),
        "v_proj_b": stack("mtp_block.{}.self_attn.v_proj.bias"),
        "o_proj_w": stack_t("mtp_block.{}.self_attn.o_proj.weight"),
        "post_attention_layernorm": stack("mtp_block.{}.post_attention_layernorm.weight"),
        "gate_proj_w": stack_t("mtp_block.{}.mlp.gate_proj.weight"),
        "up_proj_w": stack_t("mtp_block.{}.mlp.up_proj.weight"),
        "down_proj_w": stack_t("mtp_block.{}.mlp.down_proj.weight"),
    }
    return {
        "backbone": qwen2_from_state_dict(sd, cfg.backbone, prefix="llm.model."),
        "llm_decoder": sd["llm_decoder.weight"].T,
        "speech_embedding": sd["speech_embedding.weight"],
        "mtp_block": mtp,
    }


# ---------------------------------------------------------------------------
# Flow (DiT estimator)


def dit_from_state_dict(sd: Dict[str, np.ndarray], cfg: DiTConfig, prefix: str) -> dict:
    """DiT estimator keys (DiT/dit.py:104-143) -> models/dit.py param tree."""

    def lin(name):
        return {"w": sd[prefix + name + ".weight"].T, "b": sd[prefix + name + ".bias"]}

    def conv(name):
        return {"w": sd[prefix + name + ".weight"], "b": sd[prefix + name + ".bias"]}

    def stack_lin(fmt):
        ws = [sd[prefix + fmt.format(i) + ".weight"].T for i in range(cfg.depth)]
        bs = [sd[prefix + fmt.format(i) + ".bias"] for i in range(cfg.depth)]
        return {"w": np.stack(ws), "b": np.stack(bs)}

    return {
        "time_mlp_in": lin("time_embed.time_mlp.0"),
        "time_mlp_out": lin("time_embed.time_mlp.2"),
        "input_proj": lin("input_embed.proj"),
        "conv_pos1": conv("input_embed.conv_pos_embed.conv1.0"),
        "conv_pos2": conv("input_embed.conv_pos_embed.conv2.0"),
        "blocks": {
            "attn_norm_linear": stack_lin("transformer_blocks.{}.attn_norm.linear"),
            "to_q": stack_lin("transformer_blocks.{}.attn.to_q"),
            "to_k": stack_lin("transformer_blocks.{}.attn.to_k"),
            "to_v": stack_lin("transformer_blocks.{}.attn.to_v"),
            "to_out": stack_lin("transformer_blocks.{}.attn.to_out.0"),
            "ff_in": stack_lin("transformer_blocks.{}.ff.ff.0.0"),
            "ff_out": stack_lin("transformer_blocks.{}.ff.ff.2"),
        },
        "norm_out_linear": lin("norm_out.linear"),
        "proj_out": lin("proj_out"),
    }


def flow_from_state_dict(sd: Dict[str, np.ndarray], cfg: FlowConfig) -> dict:
    """CausalMaskedDiffWithDiT state dict -> models/flow.py param tree
    (flow.py:278-310)."""
    from ..models.flow import make_rand_noise

    return {
        "input_embedding": sd["input_embedding.weight"],
        "spk_embed_affine": {
            "w": sd["spk_embed_affine_layer.weight"].T,
            "b": sd["spk_embed_affine_layer.bias"],
        },
        "pre_lookahead_conv1": {
            "w": sd["pre_lookahead_layer.conv1.weight"],
            "b": sd["pre_lookahead_layer.conv1.bias"],
        },
        "pre_lookahead_conv2": {
            "w": sd["pre_lookahead_layer.conv2.weight"],
            "b": sd["pre_lookahead_layer.conv2.bias"],
        },
        "estimator": dit_from_state_dict(sd, cfg.estimator, "decoder.estimator."),
        "rand_noise": make_rand_noise(cfg),
    }


# ---------------------------------------------------------------------------
# HiFT vocoder


def hift_from_state_dict(sd: Dict[str, np.ndarray], cfg: HiFTConfig) -> dict:
    """HiFTGenerator state dict -> models/hift.py param tree
    (generator.py:378-475). Weight-norm params are folded."""
    n_up = len(cfg.upsample_rates)
    nk = len(cfg.resblock_kernel_sizes)

    def wn_conv(base):
        return {"w": merge_weight_norm(sd, base), "b": sd[base + ".bias"]}

    def resblock(base, n_dil):
        return {
            "convs1": [wn_conv(f"{base}.convs1.{j}") for j in range(n_dil)],
            "convs2": [wn_conv(f"{base}.convs2.{j}") for j in range(n_dil)],
            "alpha1": [sd[f"{base}.activations1.{j}.alpha"].reshape(-1) for j in range(n_dil)],
            "alpha2": [sd[f"{base}.activations2.{j}.alpha"].reshape(-1) for j in range(n_dil)],
        }

    downsample_rates = (1,) + tuple(reversed(cfg.upsample_rates))[:-1]
    down_cum = np.cumprod(downsample_rates)[::-1]
    source_downs = [
        {"w": merge_weight_norm(sd, f"source_downs.{i}"), "b": sd[f"source_downs.{i}.bias"]}
        for i in range(n_up)
    ]

    f0 = {
        "convs": [wn_conv(f"f0_predictor.condnet.{2 * i}") for i in range(5)],
        "classifier": {
            "w": sd["f0_predictor.classifier.weight"].T,
            "b": sd["f0_predictor.classifier.bias"],
        },
    }
    return {
        "f0_predictor": f0,
        "m_source_linear": {
            "w": sd["m_source.l_linear.weight"].T,
            "b": sd["m_source.l_linear.bias"],
        },
        "conv_pre": wn_conv("conv_pre"),
        "ups": [wn_conv(f"ups.{i}") for i in range(n_up)],
        "source_downs": source_downs,
        "source_resblocks": [
            resblock(f"source_resblocks.{i}", len(cfg.source_resblock_dilation_sizes[i]))
            for i in range(n_up)
        ],
        "resblocks": [
            resblock(f"resblocks.{i * nk + j}", len(cfg.resblock_dilation_sizes[j]))
            for i in range(n_up)
            for j in range(nk)
        ],
        "conv_post": wn_conv("conv_post"),
    }


# ---------------------------------------------------------------------------
# Matcha HiFi-GAN v1 vocoder (matcha/hifigan/models.py Generator:148-208)


def hifigan_from_state_dict(sd: Dict[str, np.ndarray], cfg) -> dict:
    """HiFi-GAN generator checkpoint -> models/matcha/vocoder.py params.
    Accepts both bare generator state dicts and {'generator': ...} wrappers."""
    if any(k.startswith("generator.") for k in sd):
        sd = {k[len("generator."):]: v for k, v in sd.items() if k.startswith("generator.")}
    n_up = len(cfg.upsample_rates)
    nk = len(cfg.resblock_kernel_sizes)

    def wn(base):
        return {"w": merge_weight_norm(sd, base), "b": sd[base + ".bias"]}

    return {
        "conv_pre": wn("conv_pre"),
        "ups": [wn(f"ups.{i}") for i in range(n_up)],
        "resblocks": [
            {
                "convs1": [wn(f"resblocks.{i * nk + j}.convs1.{m}")
                           for m in range(len(cfg.resblock_dilation_sizes[j]))],
                "convs2": [wn(f"resblocks.{i * nk + j}.convs2.{m}")
                           for m in range(len(cfg.resblock_dilation_sizes[j]))],
            }
            for i in range(n_up)
            for j in range(nk)
        ],
        "conv_post": wn("conv_post"),
    }


# ---------------------------------------------------------------------------
# Qwen2LM (CV2 single-head LM, llm_multi_head_v3.py:263-304)


def qwen2lm_from_state_dict(sd: Dict[str, np.ndarray], cfg) -> dict:
    """Qwen2LM checkpoint -> models/llm_legacy.py param tree."""
    return {
        "backbone": qwen2_from_state_dict(sd, cfg.backbone, prefix="llm.model."),
        "llm_embedding": sd["llm_embedding.weight"],
        "speech_embedding": sd["speech_embedding.weight"],
        "llm_decoder": {
            "w": sd["llm_decoder.weight"].T,
            "b": sd["llm_decoder.bias"],
        },
    }
