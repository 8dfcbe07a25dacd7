"""Checkpoint I/O and post-processing tools.

Covers the reference's three checkpoint schemes (SURVEY.md §5):
  1. training save/restore — orbax (replaces HF Trainer + DeepSpeed state)
  2. weights-only import/export — numpy .npz and torch .pt conversion
  3. serving hot-reload — runtime/server.py /load_pt (uses convert/)

Plus the post-process tools of reference §2.9:
  - checkpoint averaging (bin/average_model.py)
  - MTP weight grafting: seed multi-head training from a single-head
    checkpoint (scripts/post_process/add_mtp_weights_to_cosyvoice3lm_ckpt.py)
"""

from __future__ import annotations

import os
from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# orbax train-state checkpointing


def save_train_state(path: str, state: Any, step: Optional[int] = None):
    """Save a TrainState (or any pytree) with orbax."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, f"step_{int(step) if step is not None else 0}"),
               jax.tree.map(np.asarray, state), force=True)
    ckptr.wait_until_finished()


def restore_train_state(path: str, template: Any, step: Optional[int] = None) -> Any:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if step is None:
        steps = [int(d.split("_")[1]) for d in os.listdir(path) if d.startswith("step_")]
        step = max(steps)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.join(path, f"step_{step}"), target=template)


# ---------------------------------------------------------------------------
# weights-only npz export/import (flat key format, torch-free interchange)


def _flatten(tree: Any, prefix: str = "") -> dict:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}."))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}."))
    else:
        arr = np.asarray(tree)
        # np.savez can't serialize ml_dtypes (bfloat16 etc.) — store as f32;
        # load_params_npz casts back to the template leaf dtype anyway
        if arr.dtype.kind == "V" or arr.dtype.name == "bfloat16":
            arr = arr.astype(np.float32)
        out[prefix[:-1]] = arr
    return out


def save_params_npz(path: str, params: Any):
    np.savez(path, **_flatten(params))


def load_params_npz(path: str, template: Any) -> Any:
    data = dict(np.load(path))
    flat_template = _flatten(template)
    missing = set(flat_template) - set(data)
    if missing:
        raise KeyError(f"checkpoint missing keys: {sorted(missing)[:5]}...")

    def rebuild(tree, prefix=""):
        if isinstance(tree, dict):
            return {k: rebuild(v, f"{prefix}{k}.") for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            return type(tree)(rebuild(v, f"{prefix}{i}.") for i, v in enumerate(tree))
        arr = data[prefix[:-1]]
        return jnp.asarray(arr, getattr(tree, "dtype", arr.dtype))

    return rebuild(template)


# ---------------------------------------------------------------------------
# checkpoint averaging (reference bin/average_model.py:1-93)


def average_checkpoints(paths: List[str], template: Any) -> Any:
    """Average N weights-only npz checkpoints (val-loss top-N selection is the
    caller's job, as in the reference)."""
    assert paths
    acc = None
    for p in paths:
        params = load_params_npz(p, template)
        fp32 = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), params)
        acc = fp32 if acc is None else jax.tree.map(jnp.add, acc, fp32)
    n = float(len(paths))
    avg = jax.tree.map(lambda a: a / n, acc)
    return jax.tree.map(
        lambda a, t: jnp.asarray(a, getattr(t, "dtype", a.dtype)), avg, template
    )


# ---------------------------------------------------------------------------
# MTP weight grafting (reference add_mtp_weights_to_cosyvoice3lm_ckpt.py:126)


def graft_mtp_weights(single_head_params: dict, cfg, rng: jax.Array, dtype=jnp.bfloat16) -> dict:
    """Take an LLM param tree missing (or with stale) mtp_block weights and
    install freshly initialized heads so multi-head training can start from
    single-head weights."""
    from ..models.llm import init_params

    fresh = init_params(rng, cfg, dtype)
    out = dict(single_head_params)
    out["mtp_block"] = fresh["mtp_block"]
    return out
