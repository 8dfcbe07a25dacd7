"""Mask utilities (TPU-native equivalents of reference cosyvoice/utils/mask.py).

All masks are boolean with True = attend/valid, matching the reference's
convention after its `~make_pad_mask` inversions.  Everything here is
shape-static and jit-friendly.
"""

from __future__ import annotations

import jax.numpy as jnp


def make_pad_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """True at PADDED positions. (reference mask.py:239)

    lengths: (B,) int32; returns (B, max_len) bool.
    """
    pos = jnp.arange(max_len)[None, :]
    return pos >= lengths[:, None]


def make_valid_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """True at VALID positions: (B, max_len) bool."""
    return ~make_pad_mask(lengths, max_len)


def causal_mask(seq_len: int) -> jnp.ndarray:
    """(seq_len, seq_len) lower-triangular True mask."""
    i = jnp.arange(seq_len)
    return i[:, None] >= i[None, :]


def chunk_mask(seq_len: int, chunk_size: int, num_left_chunks: int = -1) -> jnp.ndarray:
    """Static chunk attention mask (reference mask.py:127 subsequent_chunk_mask).

    Position i may attend to all positions in its chunk and up to
    `num_left_chunks` previous chunks (all previous if -1).
    Returns (seq_len, seq_len) bool.
    """
    idx = jnp.arange(seq_len)
    q_chunk = idx[:, None] // chunk_size
    k_chunk = idx[None, :] // chunk_size
    mask = k_chunk <= q_chunk  # no future chunks
    if num_left_chunks >= 0:
        mask = mask & (k_chunk >= q_chunk - num_left_chunks)
    return mask


def add_optional_chunk_mask(
    valid_mask: jnp.ndarray,
    static_chunk_size: int,
    num_left_chunks: int = -1,
) -> jnp.ndarray:
    """Reference mask.py:161-238, restricted to the static-chunk/no-chunk cases
    the serving path uses (DiT/dit.py:163-166).

    valid_mask: (B, T) bool validity. Returns (B, T, T) bool attention mask.
    static_chunk_size == 0 -> full (non-causal) attention over valid positions.
    """
    b, t = valid_mask.shape
    kv = valid_mask[:, None, :] & valid_mask[:, :, None]  # (B, T, T)
    if static_chunk_size > 0:
        kv = kv & chunk_mask(t, static_chunk_size, num_left_chunks)[None]
    return kv


def mask_to_bias(mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Boolean mask -> additive attention bias (reference common.py:187)."""
    return (1.0 - mask.astype(dtype)) * jnp.asarray(-1.0e10, dtype)
