"""Matcha conditional flow matching (reference matcha/models/components/
flow_matching.py BASECFM/CFM): plain Euler solve (no CFG), OT interpolant
loss, sigma_min=1e-4 default."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from . import decoder as unet


def solve_euler(
    params: dict,
    cfg,
    z: jnp.ndarray,
    mu: jnp.ndarray,
    mask: jnp.ndarray,
    n_timesteps: int,
    spks: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """(flow_matching.py:55-85) — lax.scan over fixed Euler steps."""
    t_span = jnp.linspace(0.0, 1.0, n_timesteps + 1)
    ts, dts = t_span[:-1], t_span[1:] - t_span[:-1]
    b = z.shape[0]

    def step(x, t_dt):
        t, dt = t_dt
        v = unet.forward(params, cfg, x, mask, mu, jnp.full((b,), t), spks)
        return x + dt * v.astype(jnp.float32), None

    x, _ = jax.lax.scan(step, z.astype(jnp.float32), (ts, dts))
    return x


def sample(params, cfg, rng, mu, mask, n_timesteps, temperature=1.0, spks=None):
    z = jax.random.normal(rng, mu.shape) * temperature
    return solve_euler(params, cfg, z, mu, mask, n_timesteps, spks)


def compute_loss(
    params: dict,
    cfg,
    rng: jax.Array,
    x1: jnp.ndarray,  # (B, n_feats, T) target mel
    mask: jnp.ndarray,  # (B, 1, T)
    mu: jnp.ndarray,
    spks: Optional[jnp.ndarray] = None,
    sigma_min: float = 1e-4,
) -> jnp.ndarray:
    """(flow_matching.py:87-119)."""
    rng_t, rng_z = jax.random.split(rng)
    b = x1.shape[0]
    t = jax.random.uniform(rng_t, (b, 1, 1))
    z = jax.random.normal(rng_z, x1.shape)
    y = (1.0 - (1.0 - sigma_min) * t) * z + t * x1
    u = x1 - (1.0 - sigma_min) * z
    pred = unet.forward(params, cfg, y.astype(x1.dtype), mask, mu, t[:, 0, 0], spks)
    num = jnp.sum(((pred.astype(jnp.float32) - u) * mask) ** 2)
    return num / (jnp.maximum(jnp.sum(mask), 1.0) * x1.shape[1])
