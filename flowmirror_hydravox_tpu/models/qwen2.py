"""Qwen2-style causal decoder backbone, functional JAX implementation.

TPU-native replacement for the reference's HF `Qwen2ForCausalLM` wrapper
(`Qwen2Encoder`, llm_multi_head_v3.py:232-260).  Design choices:

  - Parameters are a plain pytree with layer-stacked leaves; the layer loop is
    a `lax.scan`, so 24 layers compile as one program regardless of depth.
  - The KV cache is preallocated at a static `max_len` and written with
    per-sequence `dynamic_update_slice`; attention masks are computed from a
    `cache_len` scalar, so the whole decode step is shape-static under jit.
    (The reference's served path recomputes the full prefix every step with
    no cache at all — llm_multi_head_v3.py:871-882; this module is the fix.)
  - Grouped-query attention (14 query / 2 KV heads for the 0.5B config) stays
    in bf16 on the MXU with f32 softmax.

Weight layout matches HF key-for-key after transposition (see
convert/torch_import.py).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import Qwen2Config
from ..ops.attention import decode_attention_dispatch, mha
from ..ops.quant import matmul_q
from ..ops.rope import apply_rope_halved, rope_cos_sin


class KVCache(NamedTuple):
    k: jnp.ndarray  # (n_layers, B, S_max, Hkv, D)
    v: jnp.ndarray  # (n_layers, B, S_max, Hkv, D)
    length: jnp.ndarray  # (B,) int32 committed prefix length


def init_kv_cache(cfg: Qwen2Config, batch: int, max_len: int, dtype=jnp.bfloat16) -> KVCache:
    shape = (cfg.num_layers, batch, max_len, cfg.num_kv_heads, cfg.head_dim)
    return KVCache(
        k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype), length=jnp.zeros(batch, jnp.int32)
    )


def _rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    dtype = x.dtype
    x = x.astype(jnp.float32)
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    x = x * jax.lax.rsqrt(var + eps)
    return (x * weight.astype(jnp.float32)).astype(dtype)


def init_params(rng: jax.Array, cfg: Qwen2Config, dtype=jnp.bfloat16) -> dict:
    """Random init (normal 0.02) with HF-compatible structure, layer-stacked."""
    keys = jax.random.split(rng, 12)
    h, nl = cfg.hidden_size, cfg.num_layers
    qd, kvd = cfg.num_heads * cfg.head_dim, cfg.num_kv_heads * cfg.head_dim
    inter = cfg.intermediate_size

    def w(key, *shape):
        return (jax.random.normal(key, shape, jnp.float32) * 0.02).astype(dtype)

    params = {
        "embed_tokens": w(keys[0], cfg.vocab_size, h),
        "layers": {
            "input_layernorm": jnp.ones((nl, h), dtype),
            "q_proj_w": w(keys[1], nl, h, qd),
            "q_proj_b": jnp.zeros((nl, qd), dtype),
            "k_proj_w": w(keys[2], nl, h, kvd),
            "k_proj_b": jnp.zeros((nl, kvd), dtype),
            "v_proj_w": w(keys[3], nl, h, kvd),
            "v_proj_b": jnp.zeros((nl, kvd), dtype),
            "o_proj_w": w(keys[4], nl, qd, h),
            "post_attention_layernorm": jnp.ones((nl, h), dtype),
            "gate_proj_w": w(keys[5], nl, h, inter),
            "up_proj_w": w(keys[6], nl, h, inter),
            "down_proj_w": w(keys[7], nl, inter, h),
        },
        "norm": jnp.ones((h,), dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = w(keys[8], h, cfg.vocab_size)
    return params


def embed_tokens(params: dict, token_ids: jnp.ndarray) -> jnp.ndarray:
    vocab = params["embed_tokens"].shape[0]
    return jnp.take(params["embed_tokens"], jnp.clip(token_ids, 0, vocab - 1), axis=0)


def _attention_block(layer, x, cfg: Qwen2Config, cos, sin, mask):
    """Full-sequence attention (no cache). x: (B, T, H)."""
    b, t, _ = x.shape
    q = (matmul_q(x, layer, "q_proj_w") + layer["q_proj_b"]).reshape(
        b, t, cfg.num_heads, cfg.head_dim
    )
    k = (matmul_q(x, layer, "k_proj_w") + layer["k_proj_b"]).reshape(
        b, t, cfg.num_kv_heads, cfg.head_dim
    )
    v = (matmul_q(x, layer, "v_proj_w") + layer["v_proj_b"]).reshape(
        b, t, cfg.num_kv_heads, cfg.head_dim
    )
    q = apply_rope_halved(q, cos, sin)
    k = apply_rope_halved(k, cos, sin)
    out = mha(q, k, v, mask)
    return matmul_q(out.reshape(b, t, -1), layer, "o_proj_w")


def _mlp_block(layer, x):
    gate = jax.nn.silu(matmul_q(x, layer, "gate_proj_w"))
    return matmul_q(gate * matmul_q(x, layer, "up_proj_w"), layer, "down_proj_w")


def forward(
    params: dict,
    cfg: Qwen2Config,
    inputs_embeds: jnp.ndarray,  # (B, T, H)
    lengths: Optional[jnp.ndarray] = None,  # (B,) valid lengths (right padding)
    unroll: Optional[bool] = None,
) -> jnp.ndarray:
    """Full causal forward (training / no-cache prefill). Returns final hidden
    states after the last-layer norm, (B, T, H) — the reference feeds
    `hidden_states[-1]` to its decoders (llm_multi_head_v3.py:246).

    `unroll`: run the layer stack as an unrolled Python loop instead of
    `lax.scan`.  Default: unrolled on TPU, scanned elsewhere — the axon TPU
    backend miscompiles the *backward* of bf16 scans (NaN grads with finite
    forward; verified scan-vs-identical-loop Aug 2026), and training paths go
    through this function.  The decode path (forward_block_with_cache) keeps
    its scan: it is forward-only and compile-time matters there."""
    if unroll is None:
        unroll = jax.default_backend() == "tpu"
    b, t, _ = inputs_embeds.shape
    positions = jnp.broadcast_to(jnp.arange(t)[None, :], (b, t))
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)

    causal = jnp.arange(t)[:, None] >= jnp.arange(t)[None, :]
    mask = jnp.broadcast_to(causal[None], (b, t, t))
    if lengths is not None:
        valid = jnp.arange(t)[None, :] < lengths[:, None]
        mask = mask & valid[:, None, :]

    def body(x, layer):
        attn_in = _rms_norm(x, layer["input_layernorm"], cfg.rms_norm_eps)
        x = x + _attention_block(layer, attn_in, cfg, cos, sin, mask)
        mlp_in = _rms_norm(x, layer["post_attention_layernorm"], cfg.rms_norm_eps)
        x = x + _mlp_block(layer, mlp_in)
        return x, None

    if unroll:
        # rematerialize only cheap elementwise ops in the backward
        # (dots_saveable keeps every matmul/attention output); full per-layer
        # remat recomputed the whole forward and capped train MFU at 75%
        # of peak — sequences here are short (<=~800 tokens) so activation
        # memory is not the constraint remat usually buys headroom for.
        ckpt = jax.checkpoint(body, policy=jax.checkpoint_policies.dots_saveable)
        x = inputs_embeds
        for i in range(cfg.num_layers):
            layer_i = jax.tree.map(lambda a: a[i], params["layers"])
            x, _ = ckpt(x, layer_i)
    else:
        x, _ = jax.lax.scan(body, inputs_embeds, params["layers"])
    return _rms_norm(x, params["norm"], cfg.rms_norm_eps)


def forward_block_with_cache(
    params: dict,
    cfg: Qwen2Config,
    inputs_embeds: jnp.ndarray,  # (B, K, H) new-token block
    cache: KVCache,
    advance: Optional[jnp.ndarray] = None,  # (B,) tokens to commit (default K)
) -> Tuple[jnp.ndarray, KVCache]:
    """Process a block of K new tokens against the KV cache.

    The block is written at positions [cache.length, cache.length + K);
    `advance` of them are committed (cache.length += advance).  Uncommitted
    slots are shadowed by the next block's write before they can ever be
    attended (query position never exceeds the freshly-written block end), so
    no cleanup is needed — this is what makes variable per-step MTP emission
    shape-static under jit.

    Returns (hidden (B, K, H) after final norm, new cache).
    """
    b, kblk, _ = inputs_embeds.shape
    positions = cache.length[:, None] + jnp.arange(kblk)[None, :]
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)

    def write(cache_layer, new_block, lengths):
        """cache_layer: (B, S, Hkv, D); new_block: (B, K, Hkv, D)."""

        def one(buf, blk, start):
            return jax.lax.dynamic_update_slice(buf, blk, (start, 0, 0))

        return jax.vmap(one)(cache_layer, new_block, lengths)

    def body(carry, scanned):
        x = carry
        layer, k_cache_l, v_cache_l = scanned
        attn_in = _rms_norm(x, layer["input_layernorm"], cfg.rms_norm_eps)
        q = (matmul_q(attn_in, layer, "q_proj_w") + layer["q_proj_b"]).reshape(
            b, kblk, cfg.num_heads, cfg.head_dim
        )
        k = (matmul_q(attn_in, layer, "k_proj_w") + layer["k_proj_b"]).reshape(
            b, kblk, cfg.num_kv_heads, cfg.head_dim
        )
        v = (matmul_q(attn_in, layer, "v_proj_w") + layer["v_proj_b"]).reshape(
            b, kblk, cfg.num_kv_heads, cfg.head_dim
        )
        q = apply_rope_halved(q, cos, sin)
        k = apply_rope_halved(k, cos, sin)
        k_cache_l = write(k_cache_l, k.astype(k_cache_l.dtype), cache.length)
        v_cache_l = write(v_cache_l, v.astype(v_cache_l.dtype), cache.length)
        attn = decode_attention_dispatch(q, k_cache_l, v_cache_l, cache.length)
        x = x + matmul_q(attn.reshape(b, kblk, -1), layer, "o_proj_w")
        mlp_in = _rms_norm(x, layer["post_attention_layernorm"], cfg.rms_norm_eps)
        x = x + _mlp_block(layer, mlp_in)
        return x, (k_cache_l, v_cache_l)

    # Fully-unrolled scan (unroll=num_layers): one body trace (fast host-side
    # tracing, unlike a Python layer loop which traced 24 bodies in ~80 s),
    # while XLA unrolls with constant layer indices — the per-iteration
    # dynamic-slice of the stacked weights becomes static reads that fuse
    # into the matmuls.  With a rolled scan those slices forced layout-fixup
    # copies (4 "data formatting" copies/layer/step ~ 10% of decode device
    # time; xplane, v5e, 2026-08 — same finding as mtp_logits' head stack).
    x, (new_k, new_v) = jax.lax.scan(
        body, inputs_embeds, (params["layers"], cache.k, cache.v),
        unroll=cfg.num_layers,
    )
    if advance is None:
        advance = jnp.full((b,), kblk, jnp.int32)
    new_cache = KVCache(k=new_k, v=new_v, length=cache.length + advance)
    return _rms_norm(x, params["norm"], cfg.rms_norm_eps), new_cache
