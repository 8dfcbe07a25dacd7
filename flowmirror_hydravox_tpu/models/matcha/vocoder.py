"""HiFi-GAN v1 generator — functional JAX (reference matcha/hifigan/models.py
Generator:148-208: conv_pre k7 -> 4x [leaky_relu, ConvTranspose upsample,
avg of ResBlock1] -> leaky_relu -> conv_post k7 -> tanh).

Default 22.05 kHz config: upsample_rates (8,8,2,2), kernel_sizes
(16,16,4,4), initial 512 channels, resblock kernels (3,7,11) with dilations
(1,3,5) — 256x hop."""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from ..dit import _conv_init
from ..hift import _conv_same, conv_transpose1d, _convtr_init

LRELU_SLOPE = 0.1


@dataclasses.dataclass(frozen=True)
class HiFiGANConfig:
    in_channels: int = 80
    upsample_initial_channel: int = 512
    upsample_rates: Tuple[int, ...] = (8, 8, 2, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (16, 16, 4, 4)
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))

    @property
    def hop_length(self) -> int:
        n = 1
        for r in self.upsample_rates:
            n *= r
        return n


def _resblock1_init(key, ch, kernel, dilations, dtype):
    keys = iter(jax.random.split(key, 2 * len(dilations)))
    return {
        "convs1": [_conv_init(next(keys), ch, ch, kernel, 1, dtype) for _ in dilations],
        "convs2": [_conv_init(next(keys), ch, ch, kernel, 1, dtype) for _ in dilations],
    }


def _resblock1(p, x, dilations):
    """HiFi-GAN ResBlock1 (models.py:33-63): lrelu->dilated conv->lrelu->conv."""
    for c1, c2, d in zip(p["convs1"], p["convs2"], dilations):
        xt = jax.nn.leaky_relu(x, LRELU_SLOPE)
        xt = _conv_same(c1, xt, dilation=d)
        xt = jax.nn.leaky_relu(xt, LRELU_SLOPE)
        xt = _conv_same(c2, xt, dilation=1)
        x = xt + x
    return x


def init_params(rng: jax.Array, cfg: HiFiGANConfig, dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(rng, 64))
    ups, resblocks = [], []
    ch = cfg.upsample_initial_channel
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        ups.append(_convtr_init(next(keys), ch // (2 ** i), ch // (2 ** (i + 1)), k, dtype))
        for kr, dr in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes):
            resblocks.append(_resblock1_init(next(keys), ch // (2 ** (i + 1)), kr, dr, dtype))
    return {
        "conv_pre": _conv_init(next(keys), cfg.in_channels, ch, 7, 1, dtype),
        "ups": ups,
        "resblocks": resblocks,
        "conv_post": _conv_init(next(keys), ch // (2 ** len(cfg.upsample_rates)), 1, 7, 1, dtype),
    }


def forward(params: dict, cfg: HiFiGANConfig, mel: jnp.ndarray) -> jnp.ndarray:
    """mel (B, 80, T) -> waveform (B, T * hop_length), f32.

    Computes in the parameter dtype and returns f32 audio, so bf16-loaded
    weights run bf16 end to end.  (Measured on one v5e at the bench shape
    — B=1, ~130 mel frames — bf16 and f32 are within noise of each other
    end-to-end, so f32 stays the default; the cast is for memory-constrained
    or large-batch deployments.)"""
    x = _conv_same(params["conv_pre"], mel.astype(params["conv_pre"]["w"].dtype))
    nk = len(cfg.resblock_kernel_sizes)
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        x = jax.nn.leaky_relu(x, LRELU_SLOPE)
        x = conv_transpose1d(params["ups"][i], x, u, (k - u) // 2)
        xs = None
        for j in range(nk):
            r = _resblock1(
                params["resblocks"][i * nk + j], x, cfg.resblock_dilation_sizes[j]
            )
            xs = r if xs is None else xs + r
        x = xs / nk
    x = jax.nn.leaky_relu(x)
    x = _conv_same(params["conv_post"], x)
    return jnp.tanh(x)[:, 0, :].astype(jnp.float32)
