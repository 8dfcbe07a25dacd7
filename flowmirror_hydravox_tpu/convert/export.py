"""AOT export of serving programs (reference bin/export_jit.py /
export_onnx.py equivalents).

The reference exports TorchScript modules and an ONNX flow estimator (plus a
TRT engine built at deploy time, SURVEY §2.9/§2.12).  The TPU-native
equivalent is `jax.export`: StableHLO artifacts with static shapes that a
serving binary (or a later run) deserializes and executes without tracing
Python.  The persistent compilation cache (bench.py) covers the
same-machine case; these artifacts cover cross-binary handoff.
"""

from __future__ import annotations

import os
from typing import Sequence

import jax
import jax.numpy as jnp


def export_flow_estimator(
    flow_params, cfg, path: str, mel_lens: Sequence[int] = (256, 512, 1024)
):
    """Serialize the DiT velocity estimator at fixed CFG-batch shapes —
    the direct analogue of the reference's ONNX estimator export
    (bin/export_onnx.py:1-114, shape profile (2, 80, 4..3000))."""
    from ..models import dit
    from ..models.flow import FlowConfig  # noqa: F401

    os.makedirs(path, exist_ok=True)
    est_cfg = cfg.estimator
    dtype = flow_params["input_embedding"].dtype

    for t_mel in mel_lens:
        def fn(params, x, mask, mu, t, spks, cond):
            return dit.forward(params, est_cfg, x, mask, mu, t, spks, cond)

        args = (
            flow_params["estimator"],
            jnp.zeros((2, est_cfg.mel_dim, t_mel), dtype),
            jnp.zeros((2, 1, t_mel), jnp.float32),
            jnp.zeros((2, est_cfg.mu_dim, t_mel), dtype),
            jnp.zeros((2,), jnp.float32),
            jnp.zeros((2, est_cfg.spk_dim), dtype),
            jnp.zeros((2, est_cfg.mel_dim, t_mel), dtype),
        )
        exported = jax.export.export(jax.jit(fn))(*args)
        with open(os.path.join(path, f"flow_estimator_t{t_mel}.stablehlo"), "wb") as f:
            f.write(exported.serialize())
    return path


def export_hift(hift_params, cfg, path: str, mel_lens: Sequence[int] = (256, 512, 1024)):
    """Serialize the vocoder at fixed mel lengths (export_jit.py equivalent)."""
    from ..models import hift as hift_model

    os.makedirs(path, exist_ok=True)
    for t_mel in mel_lens:
        def fn(params, mel, rng):
            return hift_model.inference(params, cfg, mel, rng)

        args = (hift_params, jnp.zeros((1, cfg.in_channels, t_mel), jnp.float32),
                jax.random.PRNGKey(0))
        exported = jax.export.export(jax.jit(fn))(*args)
        with open(os.path.join(path, f"hift_t{t_mel}.stablehlo"), "wb") as f:
            f.write(exported.serialize())
    return path


def load_exported(path: str):
    """Deserialize a .stablehlo artifact back into a callable."""
    with open(path, "rb") as f:
        return jax.export.deserialize(f.read()).call
