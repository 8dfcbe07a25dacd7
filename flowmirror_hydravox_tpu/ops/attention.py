"""Attention ops — XLA reference implementations.

The MXU-friendly path: single fused einsum chains with f32 softmax
accumulation, static shapes, boolean masks turned into additive bias.
The Pallas fused decode kernel (ops/pallas_attention.py) is a drop-in
replacement for `decode_attention` on TPU; these XLA versions are the
portable reference used in tests and as CPU fallback.

Replaces (TPU-natively) the reference's torch SDPA / vLLM paths
(DiT/modules.py:391, llm_multi_head_v3.py:232-260).
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1.0e10

logger = logging.getLogger(__name__)

# Pallas decode-kernel dispatch state. Tri-state override: None = auto
# (HYDRAVOX_PALLAS_ATTN env: "1"/"0"/"auto"; auto = on when backend is TPU).
_PALLAS_DECODE: Optional[bool] = None
_PALLAS_INTERPRET: bool = False


def set_pallas_decode(enabled: Optional[bool], interpret: bool = False) -> None:
    """Force the fused Pallas decode-attention kernel on/off (None = auto).

    Call before the first jit trace — already-compiled programs keep the
    path they were traced with. `interpret=True` runs the kernel in Pallas
    interpreter mode (CPU tests)."""
    global _PALLAS_DECODE, _PALLAS_INTERPRET
    _PALLAS_DECODE = enabled
    _PALLAS_INTERPRET = interpret


def pallas_decode_enabled() -> bool:
    if _PALLAS_DECODE is not None:
        return _PALLAS_DECODE
    env = os.environ.get("HYDRAVOX_PALLAS_ATTN", "auto").lower()
    if env in ("1", "true", "on"):
        return True
    if env in ("0", "false", "off"):
        return False
    return jax.default_backend() == "tpu"


def _pallas_decode_forced() -> bool:
    """True when the kernel is explicitly forced on (programmatic override or
    HYDRAVOX_PALLAS_ATTN=1) — bypasses the size-aware routing."""
    if _PALLAS_DECODE is True:
        return True
    return os.environ.get("HYDRAVOX_PALLAS_ATTN", "auto").lower() in ("1", "true", "on")


# below this static cache length the XLA decode path is faster than the
# Pallas kernel (see decode_attention_dispatch docstring for measurements);
# an explicit set_pallas_decode(True) override still forces the kernel.
_PALLAS_MIN_SMAX = 1536


def _pick_block(s_max: int) -> Optional[int]:
    for blk in (512, 256, 128, 64):
        if s_max % blk == 0:
            return blk
    return None


def mha(
    q: jnp.ndarray,  # (B, T, Hq, D)
    k: jnp.ndarray,  # (B, S, Hkv, D)
    v: jnp.ndarray,  # (B, S, Hkv, D)
    mask: jnp.ndarray | None = None,  # (B, T, S) or (B, 1, T, S) bool, True=attend
    scale: float | None = None,
) -> jnp.ndarray:
    """Grouped-query attention. Returns (B, T, Hq, D)."""
    b, t, hq, d = q.shape
    s, hkv = k.shape[1], k.shape[2]
    if scale is None:
        scale = d ** -0.5
    group = hq // hkv
    qg = q.reshape(b, t, hkv, group, d)
    # (B, Hkv, G, T, S)
    logits = jnp.einsum("bthgd,bshd->bhgts", qg, k).astype(jnp.float32) * scale
    if mask is not None:
        if mask.ndim == 3:
            bias = jnp.where(mask[:, None, None, :, :], 0.0, NEG_INF)
        else:  # (B, 1, T, S)
            bias = jnp.where(mask[:, :, None, :, :], 0.0, NEG_INF)
        logits = logits + bias
    probs = jnp.exp(logits - jnp.max(logits, axis=-1, keepdims=True))
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    out = jnp.einsum("bhgts,bshd->bthgd", probs.astype(v.dtype), v)
    return out.reshape(b, t, hq, d)


def decode_attention(
    q: jnp.ndarray,  # (B, T, Hq, D) — T = small new-token block
    k_cache: jnp.ndarray,  # (B, S_max, Hkv, D) — full preallocated cache
    v_cache: jnp.ndarray,  # (B, S_max, Hkv, D)
    cache_len: jnp.ndarray,  # (B,) int32 — valid prefix length (block written at cache_len)
    block_causal: bool = True,
) -> jnp.ndarray:
    """Attention for incremental decode against a preallocated KV cache.

    The new block of T tokens is assumed already written to the cache at
    positions [cache_len, cache_len + T).  Query i (absolute position
    cache_len + i) attends to cache positions < cache_len + i + 1.
    """
    b, t, hq, d = q.shape
    s_max = k_cache.shape[1]
    key_pos = jnp.arange(s_max)[None, None, :]  # (1, 1, S)
    q_pos = cache_len[:, None, None] + jnp.arange(t)[None, :, None]  # (B, T, 1)
    if block_causal:
        mask = key_pos <= q_pos
    else:
        mask = key_pos < (cache_len[:, None, None] + t)
    return mha(q, k_cache, v_cache, mask)


def decode_attention_dispatch(
    q: jnp.ndarray,  # (B, T, Hq, D)
    k_cache: jnp.ndarray,  # (B, S_max, Hkv, D)
    v_cache: jnp.ndarray,  # (B, S_max, Hkv, D)
    cache_len: jnp.ndarray,  # (B,) int32
) -> jnp.ndarray:
    """Decode attention, routed to the fused Pallas flash-decode kernel
    (ops/pallas_attention.py) when enabled and applicable, else the XLA path.

    Pallas path requirements: B == 1 (serving decode; flash batch stays on
    the batched XLA einsum, which already amortizes weight reads) and S_max
    divisible by a supported block size. The kernel is the TPU-native stand-in
    for the reference's vLLM fast path (llm_multi_head_v3.py:476-504).

    Size-aware routing: at short static cache lengths the whole-step XLA
    fusion wins (kernel-call overhead x n_layers dominates); the flash
    kernel's blockwise streaming pays off on long caches.  Measured on v5e
    @ heads=4 int8 ms/step by S_max: 256: 2.37 xla / 2.50 pallas;
    1024: 2.51 / 2.91; 2048: 4.07 / 3.52 — crossover ~1.5k."""
    b, t, hq, d = q.shape
    s_max = k_cache.shape[1]
    blk = _pick_block(s_max)
    if pallas_decode_enabled() and b == 1 and blk is not None and (
        s_max >= _PALLAS_MIN_SMAX or _pallas_decode_forced()
    ):
        from .pallas_attention import pallas_decode_attention

        out = pallas_decode_attention(
            q[0], k_cache[0], v_cache[0], cache_len[0].astype(jnp.int32),
            s_blk=blk, interpret=_PALLAS_INTERPRET,
        )
        return out[None]
    return decode_attention(q, k_cache, v_cache, cache_len)
