"""Model management (reference user_interface/tabs/training_tab.py:826-1070:
list / delete / convert checkpoints).

All paths are resolved under a models root (TTS_MODEL_ROOT env or
"checkpoints") and containment-checked, so the HTTP surface can never
delete outside it. Conversion shells out to tools/convert_ckpt as a managed
subprocess job (same registry as training jobs, pollable via
/api/v1/training/status/{id}).
"""

from __future__ import annotations

import os
import shutil
import time
from typing import List

MODEL_EXTS = (".pt", ".npz", ".safetensors")


def models_root() -> str:
    return os.environ.get("TTS_MODEL_ROOT", "checkpoints")


def _resolve(root: str, rel: str) -> str:
    path = os.path.realpath(os.path.join(root, rel))
    root_real = os.path.realpath(root)
    if not (path == root_real or path.startswith(root_real + os.sep)):
        raise ValueError(f"path escapes models root: {rel}")
    return path


def list_models(root: str | None = None) -> List[dict]:
    """Model files (.pt/.npz/.safetensors) and orbax train-state dirs under
    the root, newest first."""
    root = root or models_root()
    out: List[dict] = []
    if not os.path.isdir(root):
        return out
    for dirpath, dirnames, filenames in os.walk(root):
        # orbax train-state checkpoints are directories with a step marker
        for d in list(dirnames):
            full = os.path.join(dirpath, d)
            if os.path.exists(os.path.join(full, "_CHECKPOINT_METADATA")) or d.startswith("step_"):
                out.append(_entry(root, full, kind="orbax"))
                dirnames.remove(d)
        for f in filenames:
            if f.endswith(MODEL_EXTS):
                out.append(_entry(root, os.path.join(dirpath, f), kind="weights"))
    out.sort(key=lambda e: -e["mtime"])
    return out


def _entry(root: str, path: str, kind: str) -> dict:
    if os.path.isdir(path):
        size = sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _, fs in os.walk(path) for f in fs
        )
    else:
        size = os.path.getsize(path)
    return {
        "path": os.path.relpath(path, root),
        "kind": kind,
        "size_mb": round(size / 1e6, 2),
        "mtime": os.path.getmtime(path),
        "modified": time.strftime("%Y-%m-%d %H:%M", time.localtime(os.path.getmtime(path))),
    }


def delete_model(rel: str, root: str | None = None) -> dict:
    root = root or models_root()
    path = _resolve(root, rel)
    if not os.path.exists(path):
        return {"success": False, "error": f"not found: {rel}"}
    if os.path.isdir(path):
        shutil.rmtree(path)
    else:
        os.remove(path)
    return {"success": True, "deleted": rel}


def convert_model(req: dict) -> dict:
    """Start a convert job: {action: import|average|graft-mtp, model?, src,
    dst, tiny?}. Runs tools/convert_ckpt in a managed subprocess."""
    import sys

    from .training_manager import training_manager

    action = req.get("action", "import")
    if action not in ("import", "average", "graft-mtp"):
        return {"success": False, "error": f"unknown action {action}"}
    cmd = [sys.executable, "-m", "flowmirror_hydravox_tpu.tools.convert_ckpt", action]
    if action in ("import", "average"):
        cmd += ["--model", req.get("model", "llm")]
    if action == "average":
        inputs = req.get("inputs") or []
        if not inputs:
            return {"success": False, "error": "inputs required"}
        cmd += ["--inputs", *inputs]
    else:
        if not req.get("src"):
            return {"success": False, "error": "src required"}
        cmd += ["--src", req["src"]]
    if not req.get("dst"):
        return {"success": False, "error": "dst required"}
    cmd += ["--dst", req["dst"]]
    if req.get("tiny"):
        cmd.append("--tiny")
    out_dir = os.path.dirname(req["dst"]) or "."
    os.makedirs(out_dir, exist_ok=True)
    return training_manager._spawn(cmd, out_dir, label=f"convert-{action}")
