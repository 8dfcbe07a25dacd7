"""Pallas TPU kernel: fused GQA decode attention against a paged KV cache.

The north-star kernel (BASELINE.json): the multi-head AR decode's attention
reads the KV cache straight from HBM in S-blocks, computes the flash-style
online softmax in VMEM, and never materializes the (K, S_max) score matrix in
HBM.  Grid iterates over cache blocks; the query block (the K new MTP tokens)
stays resident.

Falls back to ops/attention.decode_attention (pure XLA) off-TPU; tests run
the kernel in interpreter mode on CPU for exact comparison.

Layout notes:
  - q: (K, Hq, D) for one sequence (serving decode is B=1; vmap for B>1).
  - k/v cache: (S_max, Hkv, D), written ahead of the call (the block at
    [cache_len, cache_len+K) holds the new tokens).
  - mask: query i attends cache positions <= cache_len + i.
  - Hq/Hkv grouping handled by reshaping q to (Hkv, G*K, D) so each KV head's
    queries hit the MXU as one (G*K, D) x (D, S_blk) matmul.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1.0e30


def _decode_attn_kernel(
    cache_len_ref,  # SMEM (1,) int32
    q_ref,  # VMEM (Hkv, GK, D)
    k_ref,  # VMEM (S_blk, Hkv, D) — current cache block
    v_ref,  # VMEM (S_blk, Hkv, D)
    o_ref,  # VMEM (Hkv, GK, D) output
    m_ref,  # VMEM (Hkv, GK, 128) running max (broadcast lanes)
    l_ref,  # VMEM (Hkv, GK, 128) running denom
    acc_ref,  # VMEM (Hkv, GK, D) accumulator
    *,
    s_blk: int,
    gk: int,
    group: int,
    scale: float,
):
    blk = pl.program_id(0)
    cache_len = cache_len_ref[0]

    @pl.when(blk == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # positions of this cache block
    base = blk * s_blk
    key_pos = base + jax.lax.broadcasted_iota(jnp.int32, (gk, s_blk), 1)
    # query row r in (Hkv, GK): its token index within the new block is r % K,
    # but with the (G, K) flattening we use r // group... we flatten as
    # (G, K) -> GK with token index = r % kblk (set up by caller reshape).
    q_token = jax.lax.broadcasted_iota(jnp.int32, (gk, s_blk), 0) % (gk // group)
    mask = key_pos <= (cache_len + q_token)

    k_blk = k_ref[:]  # (S_blk, Hkv, D)
    v_blk = v_ref[:]

    # static unrolled loop over KV heads (Mosaic cannot lower dynamic ref
    # indexing; Hkv is 2 for the flagship config so unrolling is free)
    for h in range(q_ref.shape[0]):
        q_h = q_ref[h]  # (GK, D)
        k_h = jnp.swapaxes(k_blk[:, h, :], 0, 1)  # (D, S_blk)
        scores = jnp.dot(
            q_h.astype(jnp.float32), k_h.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        ) * scale  # (GK, S_blk)
        scores = jnp.where(mask, scores, NEG_INF)

        m_prev = m_ref[h, :, 0:1]  # (GK, 1)
        m_cur = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_cur)  # (GK, 1)
        p = jnp.exp(scores - m_cur)  # (GK, S_blk)
        l_new = l_ref[h, :, 0:1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc_ref[h] * alpha + jnp.dot(
            p, v_blk[:, h, :].astype(jnp.float32), preferred_element_type=jnp.float32
        )
        m_ref[h] = jnp.broadcast_to(m_cur, m_ref[h].shape)
        l_ref[h] = jnp.broadcast_to(l_new, l_ref[h].shape)
        acc_ref[h] = acc

    @pl.when(blk == pl.num_programs(0) - 1)
    def _finish():
        o_ref[:] = (acc_ref[:] / jnp.maximum(l_ref[:, :, 0:1], 1e-30)).astype(o_ref.dtype)


def pallas_decode_attention(
    q: jnp.ndarray,  # (K, Hq, D)
    k_cache: jnp.ndarray,  # (S_max, Hkv, D)
    v_cache: jnp.ndarray,  # (S_max, Hkv, D)
    cache_len: jnp.ndarray,  # scalar int32
    *,
    s_blk: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused flash-decode for one sequence. Returns (K, Hq, D)."""
    kblk, hq, d = q.shape
    s_max, hkv, _ = k_cache.shape
    group = hq // hkv
    gk = group * kblk
    scale = d ** -0.5
    s_blk = min(s_blk, s_max)
    assert s_max % s_blk == 0, f"S_max {s_max} not divisible by block {s_blk}"

    # (K, Hq, D) -> (Hkv, G*K, D) with token index = row % K
    qr = q.reshape(kblk, hkv, group, d).transpose(1, 2, 0, 3).reshape(hkv, gk, d)

    kernel = functools.partial(
        _decode_attn_kernel, s_blk=s_blk, gk=gk, group=group, scale=scale
    )
    out = pl.pallas_call(
        kernel,
        grid=(s_max // s_blk,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((hkv, gk, d), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((s_blk, hkv, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((s_blk, hkv, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((hkv, gk, d), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hkv, gk, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((hkv, gk, 128), jnp.float32),
            pltpu.VMEM((hkv, gk, 128), jnp.float32),
            pltpu.VMEM((hkv, gk, d), jnp.float32),
        ],
        interpret=interpret,
    )(cache_len.reshape(1), qr, k_cache, v_cache)

    # (Hkv, G*K, D) -> (K, Hq, D)
    return out.reshape(hkv, group, kblk, d).transpose(2, 0, 1, 3).reshape(kblk, hq, d)
