"""Pallas TPU kernel: fused SwiGLU-MLP GEMV — EXPERIMENTAL, NOT WIRED.

Motivation: at batch-1 decode the MLP weights are ~1.1 GB of the ~1.27 GB
each base-LLM step streams from HBM; this kernel computes
    out = (silu(x @ gate) * (x @ up)) @ down
reading every weight byte once, intermediates staying in VMEM.

Measured on one v5e (2026-08-16, chained passes + host fetch):
  backbone shape 24 x (896, 4864), M=4:  XLA 2.01 ms (313 GB/s, 38% roofline)
                                         kernel 3.16 ms (199 GB/s)  -> 0.63x
  MTP shape 4 x (896, 22016), M=1:       XLA 1.69 ms (281 GB/s)
                                         kernel 2.81 ms (168 GB/s)  -> 0.60x
Why it loses: throughput is ~195 GB/s regardless of tile size (256/512/1024
all measured within noise on padded weights), i.e. Mosaic is not overlapping
the weight DMA with the tiny M<=8 GEMVs for this shape, and each layer is a
separate pallas_call. XLA's whole-step fusion already runs the full decode
at ~50% of the HBM roofline. Kept as a tested experiment
(tests/test_pallas_mlp.py); a future win needs manual double-buffered DMA
(make_async_copy ping-pong) or a monolithic decode-step kernel. The
production decode path stays on XLA for the MLP and on the Pallas
flash-decode kernel (ops/pallas_attention.py) for attention.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mlp_kernel(x_ref, g_ref, u_ref, d_ref, o_ref, acc_ref):
    ti = pl.program_id(0)

    @pl.when(ti == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]  # (M, H)
    a = jnp.dot(x, g_ref[:], preferred_element_type=jnp.float32)  # (M, TI)
    b = jnp.dot(x, u_ref[:], preferred_element_type=jnp.float32)
    h = (a * jax.nn.sigmoid(a) * b).astype(x.dtype)  # silu(x@g) * (x@u), bf16
    acc_ref[:] += jnp.dot(h, d_ref[:], preferred_element_type=jnp.float32)

    @pl.when(ti == pl.num_programs(0) - 1)
    def _finish():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def pallas_mlp_gemv(
    x: jnp.ndarray,  # (M, H) small-M decode rows
    gate_w: jnp.ndarray,  # (H, I)
    up_w: jnp.ndarray,  # (H, I)
    down_w: jnp.ndarray,  # (I, H)
    *,
    tile_i: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused silu(x@gate)*(x@up) @ down. Returns (M, H)."""
    m, h = x.shape
    i = gate_w.shape[1]
    assert i % tile_i == 0, f"I={i} not divisible by tile {tile_i}"
    # pad rows to the 8-sublane boundary
    m_pad = -(-m // 8) * 8
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))

    out = pl.pallas_call(
        _mlp_kernel,
        grid=(i // tile_i,),
        in_specs=[
            pl.BlockSpec((m_pad, h), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, tile_i), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, tile_i), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_i, h), lambda t: (t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m_pad, h), lambda t: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, h), x.dtype),
        scratch_shapes=[pltpu.VMEM((m_pad, h), jnp.float32)],
        interpret=interpret,
    )(x, gate_w, up_w, down_w)
    return out[:m]
