"""Checkpoint conversion + post-processing CLI.

Covers the reference post-process tooling (SURVEY §2.9):
  - torch .pt / safetensors -> our npz param files
    (convert_checkpoint_bin_to_pt.py / convert_safetensor_to_pt.py)
  - checkpoint averaging (bin/average_model.py)
  - MTP weight grafting (add_mtp_weights_to_cosyvoice3lm_ckpt.py)

Usage:
  python -m flowmirror_hydravox_tpu.tools.convert_ckpt import \
      --model llm --src llm.pt --dst llm.npz [--tiny]
  python -m flowmirror_hydravox_tpu.tools.convert_ckpt average \
      --inputs a.npz b.npz c.npz --dst avg.npz --model llm
  python -m flowmirror_hydravox_tpu.tools.convert_ckpt graft-mtp \
      --src single_head.npz --dst multi_head.npz [--seed 1986]
"""

from __future__ import annotations

import argparse
import logging

import numpy as np

logger = logging.getLogger("hydravox.convert_ckpt")


def _load_state_dict(path: str) -> dict:
    from ..convert.torch_import import load_torch_pt

    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return {k: np.asarray(v, np.float32) for k, v in load_file(path).items()}
    return load_torch_pt(path)


def _strip_prefixes(sd: dict) -> dict:
    """Strip HF-Trainer wrapper prefixes (convert_checkpoint_bin_to_pt.py:77:
    'core_model.' / 'module.' / epoch-step bookkeeping keys)."""
    out = {}
    for k, v in sd.items():
        for prefix in ("core_model.", "module.", "model_wrapper."):
            if k.startswith(prefix):
                k = k[len(prefix):]
        if k in ("epoch", "step"):
            continue
        out[k] = v
    return out


def _template(model: str, tiny: bool):
    import jax
    import jax.numpy as jnp

    from ..config import HydraVoxConfig, tiny_config
    from ..models import flow as flow_model
    from ..models import hift as hift_model
    from ..models import llm as llm_model

    cfg = tiny_config() if tiny else HydraVoxConfig()
    rng = jax.random.PRNGKey(0)
    if model == "llm":
        return llm_model.init_params(rng, cfg.llm, jnp.float32), cfg.llm
    if model == "flow":
        return flow_model.init_params(rng, cfg.flow, jnp.float32), cfg.flow
    if model == "hift":
        return hift_model.init_params(rng, cfg.hift, jnp.float32), cfg.hift
    raise ValueError(model)


def cmd_import(args):
    from ..convert import torch_import
    from ..train.checkpoint import save_params_npz

    sd = _strip_prefixes(_load_state_dict(args.src))
    _, cfg = _template(args.model, args.tiny)
    if args.model == "llm":
        params = torch_import.llm_from_state_dict(sd, cfg)
    elif args.model == "flow":
        params = torch_import.flow_from_state_dict(sd, cfg)
    else:
        params = torch_import.hift_from_state_dict(sd, cfg)
    save_params_npz(args.dst, params)
    logger.info("wrote %s", args.dst)


def cmd_average(args):
    from ..train.checkpoint import average_checkpoints, save_params_npz

    template, _ = _template(args.model, args.tiny)
    avg = average_checkpoints(args.inputs, template)
    save_params_npz(args.dst, avg)
    logger.info("averaged %d checkpoints -> %s", len(args.inputs), args.dst)


def cmd_graft_mtp(args):
    import jax

    from ..train.checkpoint import graft_mtp_weights, load_params_npz, save_params_npz

    template, cfg = _template("llm", args.tiny)
    params = load_params_npz(args.src, template)
    grafted = graft_mtp_weights(params, cfg, jax.random.PRNGKey(args.seed))
    save_params_npz(args.dst, grafted)
    logger.info("grafted fresh MTP heads (seed %d) -> %s", args.seed, args.dst)


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser("convert_ckpt")
    sub = p.add_subparsers(dest="cmd", required=True)

    pi = sub.add_parser("import")
    pi.add_argument("--model", choices=["llm", "flow", "hift"], required=True)
    pi.add_argument("--src", required=True)
    pi.add_argument("--dst", required=True)
    pi.add_argument("--tiny", action="store_true")
    pi.set_defaults(fn=cmd_import)

    pa = sub.add_parser("average")
    pa.add_argument("--model", choices=["llm", "flow", "hift"], required=True)
    pa.add_argument("--inputs", nargs="+", required=True)
    pa.add_argument("--dst", required=True)
    pa.add_argument("--tiny", action="store_true")
    pa.set_defaults(fn=cmd_average)

    pg = sub.add_parser("graft-mtp")
    pg.add_argument("--src", required=True)
    pg.add_argument("--dst", required=True)
    pg.add_argument("--seed", type=int, default=1986)
    pg.add_argument("--tiny", action="store_true")
    pg.set_defaults(fn=cmd_graft_mtp)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
