"""Rotary position embeddings.

Two layouts are needed for parity with the reference stack:
  - `apply_rope_halved`: HF-Qwen2 layout — rotate_half with the feature dim
    split as [first_half, second_half] (used by the LLM backbone;
    reference wraps transformers Qwen2, llm_multi_head_v3.py:232-260).
  - `apply_rope_interleaved`: x-transformers layout — pairs are interleaved
    (d0,d1),(d2,d3),... (used by the DiT estimator via
    x_transformers.RotaryEmbedding, DiT/dit.py:129,158).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def rope_freqs(head_dim: int, theta: float) -> np.ndarray:
    return (1.0 / (theta ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim))).astype(
        np.float32
    )


def rope_cos_sin(positions: jnp.ndarray, head_dim: int, theta: float):
    """positions: (...,) int -> cos/sin of shape (..., head_dim//2), f32."""
    freqs = jnp.asarray(rope_freqs(head_dim, theta))
    angles = positions.astype(jnp.float32)[..., None] * freqs
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope_halved(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """HF layout. x: (..., T, H, D); cos/sin: (..., T, D/2) broadcastable."""
    d2 = x.shape[-1] // 2
    x1, x2 = x[..., :d2], x[..., d2:]
    cos = cos[..., None, :]  # broadcast over head axis
    sin = sin[..., None, :]
    out1 = x1 * cos - x2 * sin
    out2 = x2 * cos + x1 * sin
    return jnp.concatenate([out1, out2], axis=-1).astype(x.dtype)


def apply_rope_interleaved(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x-transformers layout. x: (..., T, H, D); cos/sin: (..., T, D/2)."""
    shape = x.shape
    x_pairs = x.reshape(shape[:-1] + (shape[-1] // 2, 2))
    x1, x2 = x_pairs[..., 0], x_pairs[..., 1]
    cos = cos[..., None, :]
    sin = sin[..., None, :]
    out1 = x1 * cos - x2 * sin
    out2 = x2 * cos + x1 * sin
    return jnp.stack([out1, out2], axis=-1).reshape(shape).astype(x.dtype)
