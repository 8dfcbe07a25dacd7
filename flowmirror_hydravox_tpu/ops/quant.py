"""Weight-only int8 quantization for the HBM-bound decode path.

The base-LLM decode step is HBM-bandwidth-bound: every step streams the
backbone + MTP-head weights (~1.3 GB in bf16) through a handful of GEMVs
(see ops/pallas_mlp.py measurements — the fused XLA step runs at ~50% of the
v5e 819 GB/s roofline).  Storing those weights as int8 with per-output-channel
scales halves the bytes per step; the dequant is a post-matmul columnwise
multiply, so XLA keeps the int8 buffer as the dot operand (convert fuses into
the MXU feed) and never materializes a bf16 copy.

This has no counterpart in the reference (CUDA/torch serves bf16,
infer_speech_model.py:99-118); it is a TPU-native serving optimization, OFF
by default and enabled with `Engine(quantize="int8")` /
`python -m flowmirror_hydravox_tpu --quantize int8`.

Scheme: symmetric per-output-channel.  For a weight w of shape (..., H, O)
used as `x @ w`:
    scale[..., o] = max_h |w[..., h, o]| / 127        (float32)
    w8 = round(w / scale)  in int8
    x @ w  ≈  (x @ w8.astype(x.dtype)) * scale
Relative weight error is ≤ 0.5/127 ≈ 0.4% per channel — in practice well
under bf16 activation noise for these layers (see tests/test_quant.py).
"""

from __future__ import annotations

from typing import Iterable

import jax
import jax.numpy as jnp

# Layer-stacked qwen2 backbone matrices (models/qwen2.py init_params) and the
# MTP-head decoder-layer matrices (models/llm.py) that are worth quantizing:
# everything that is streamed from HBM once per decode step.  Biases, norms
# and embeddings stay in bf16 (negligible bytes).
QWEN2_LAYER_MATS = (
    "q_proj_w",
    "k_proj_w",
    "v_proj_w",
    "o_proj_w",
    "gate_proj_w",
    "up_proj_w",
    "down_proj_w",
)

SCALE_SUFFIX = "@q8scale"


def quantize_weight_int8(w: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Quantize `w` (..., H, O) symmetric per-output-channel over axis -2.

    Returns (w8 int8 same shape, scale float32 (..., 1, O))."""
    w32 = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=-2, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    w8 = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return w8, scale


def matmul_q(x: jnp.ndarray, layer: dict, name: str) -> jnp.ndarray:
    """`x @ layer[name]`, transparently dequantizing if the leaf is int8.

    The scale multiply happens on the (small) matmul *output*, never on the
    weight, so the weight read stays int8.  (A W8A8 variant — dynamic per-row
    activation quantization + s8xs8->s32 MXU dot — measured identical step
    time on v5e, 2.39 vs 2.41 ms at heads=4, so weight-only is kept: the
    residual over the byte-roofline is not the s8->bf16 convert.)"""
    w = layer[name]
    if w.dtype == jnp.int8:
        y = jnp.dot(x, w.astype(x.dtype))
        return (y * layer[name + SCALE_SUFFIX].reshape(-1)).astype(x.dtype)
    return x @ w


def quantize_layer_dict(layers: dict, names: Iterable[str] = QWEN2_LAYER_MATS) -> dict:
    """Quantize the named matrices of a (possibly layer-stacked) param dict.

    Adds `<name>@q8scale` leaves next to the int8 weights; leaves everything
    else untouched.  Idempotent (already-int8 leaves are skipped)."""
    out = dict(layers)
    for name in names:
        w = out.get(name)
        if w is None or w.dtype == jnp.int8:
            continue
        w8, scale = quantize_weight_int8(w)
        out[name] = w8
        out[name + SCALE_SUFFIX] = scale
    return out


MTP_HEAD_MATS = ("v_proj_w", "o_proj_w", "gate_proj_w", "up_proj_w", "down_proj_w")


def quantize_llm_params(params: dict) -> dict:
    """Quantize the HBM-hot matrices of a CosyVoice3LM param tree
    (models/llm.py init_params): backbone decoder layers, MTP-head layers
    (their dead q/k projections stay bf16 — never multiplied), and the shared
    llm_decoder head.  Embeddings/norms/biases stay bf16."""
    out = dict(params)
    backbone = dict(out["backbone"])
    backbone["layers"] = quantize_layer_dict(backbone["layers"])
    out["backbone"] = backbone
    out["mtp_block"] = quantize_layer_dict(out["mtp_block"], MTP_HEAD_MATS)
    if out.get("llm_decoder") is not None and out["llm_decoder"].dtype != jnp.int8:
        w8, scale = quantize_weight_int8(out["llm_decoder"])
        out["llm_decoder"] = w8
        out["llm_decoder" + SCALE_SUFFIX] = scale
    return out


def quantized_fraction(params: dict) -> float:
    """Fraction of param bytes stored as int8 (diagnostic)."""
    int8_b = total_b = 0
    for leaf in jax.tree.leaves(params):
        if not hasattr(leaf, "dtype"):
            continue
        nbytes = leaf.size * leaf.dtype.itemsize
        total_b += nbytes
        if leaf.dtype == jnp.int8:
            int8_b += nbytes
    return int8_b / max(total_b, 1)


def dequantize_layer_dict(layers: dict) -> dict:
    """Inverse of quantize_layer_dict (returns bf16 weights; lossy)."""
    out = {}
    for name, w in layers.items():
        if name.endswith(SCALE_SUFFIX):
            continue
        if isinstance(w, (jnp.ndarray, jax.Array)) and w.dtype == jnp.int8:
            scale = layers[name + SCALE_SUFFIX]
            out[name] = (w.astype(jnp.float32) * scale).astype(jnp.bfloat16)
        else:
            out[name] = w
    return out
