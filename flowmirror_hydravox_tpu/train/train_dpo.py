"""DPO training CLI for the MTP LLM — data-parallel pjit over the mesh.

Replaces the reference's `bin/train.py --dpo true --ref_model ...` path
(bin/train.py:131-173, train_utils.py:238-274): policy and frozen reference
models run inside one jitted step; total loss = preference loss (beta=0.01)
+ SFT CE on the chosen sequence.

Data rows need "text" (or "text_token"), "speech_token" (chosen) and
"reject_speech_token" (rejected), matching the reference dpo=True dataset
columns (dataset/processor.py:432-438).

Usage:
  python -m flowmirror_hydravox_tpu.train.train_dpo \
      --train_data /path/to/hf_dataset --output_dir ckpts/dpo \
      --model_ckpt ckpts/llm/final.npz [--ref_ckpt ckpts/sft.npz]
"""

from __future__ import annotations

import argparse
import logging
import time

import jax
import jax.numpy as jnp

logger = logging.getLogger("hydravox.train_dpo")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--train_data", default=None, help="HF dataset dir")
    p.add_argument("--shard_list", default=None, help="parquet shard-list file")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--model_ckpt", default=None, help="policy init (npz or torch .pt)")
    p.add_argument("--ref_ckpt", default=None,
                   help="frozen reference model (defaults to the policy init, "
                        "matching bin/train.py:163-169 deepcopy semantics)")
    p.add_argument("--tokenizer_path", default=None)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--learning_rate", type=float, default=1e-5)
    p.add_argument("--warmup_steps", type=int, default=100)
    p.add_argument("--max_steps", type=int, default=10_000)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--beta", type=float, default=0.01,
                   help="DPO beta (bin/train.py:166)")
    p.add_argument("--label_smoothing", type=float, default=0.0)
    p.add_argument("--ipo", action="store_true", help="IPO objective variant")
    p.add_argument("--logging_steps", type=int, default=20)
    p.add_argument("--save_steps", type=int, default=1000)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--tiny", action="store_true", help="tiny config (tests)")
    p.add_argument("--tensorboard_dir", default=None)
    p.add_argument("--shard_optimizer", action="store_true",
                   help="ZeRO-2-style optimizer-moment sharding over 'data'")
    p.add_argument("--fsdp", action="store_true",
                   help="FSDP / ZeRO-3-class full parameter sharding over "
                        "'data' for BOTH the policy and the frozen reference "
                        "(parallel/sharding.fsdp_sharding); subsumes "
                        "--shard_optimizer")
    p.add_argument("--grad_accum", type=int, default=1,
                   help="micro-batch gradient accumulation inside the jitted "
                        "step (lax.scan; reference train_utils.py:277-291)")
    args = p.parse_args(argv)

    logging.basicConfig(level=logging.INFO)

    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..config import HydraVoxConfig, tiny_config
    from ..frontend.tokenizer import get_tokenizer
    from ..models import llm as llm_model
    from ..parallel.mesh import host_local_batch_to_global, make_mesh
    from ..parallel.sharding import fsdp_sharding, zero_sharding
    from . import checkpoint as ckpt
    from .data import DPOCollator, make_batch_source
    from .steps import OptimConfig, dpo_train_step, init_state, make_optimizer

    cfg = (tiny_config() if args.tiny else HydraVoxConfig()).llm
    mesh = make_mesh(model=1)
    n_data = mesh.shape["data"]
    assert args.batch_size % n_data == 0, (
        f"batch_size {args.batch_size} not divisible by {n_data} data shards"
    )
    if args.grad_accum > 1:
        assert args.batch_size % args.grad_accum == 0, (
            f"batch_size {args.batch_size} not divisible by "
            f"grad_accum {args.grad_accum}")

    def load_weights(path, template):
        if path.endswith(".npz"):
            return ckpt.load_params_npz(path, template)
        from ..convert.torch_import import llm_from_state_dict, load_torch_pt

        sd = load_torch_pt(path)
        loaded = llm_from_state_dict(sd, cfg)
        return jax.tree.map(lambda a, t: jnp.asarray(a, t.dtype), loaded, template)

    rng = jax.random.PRNGKey(args.seed)
    params = llm_model.init_params(rng, cfg, jnp.bfloat16)
    if args.model_ckpt:
        params = load_weights(args.model_ckpt, params)
        logger.info("policy init from %s", args.model_ckpt)
    # Frozen reference: separate weights if given, else a copy of the policy
    # init (the reference deep-copies the model before training starts).
    # Must NOT alias the policy buffers: the jitted step donates the train
    # state, and a donated buffer shared with ref_params is invalid on TPU.
    if args.ref_ckpt:
        ref_params = load_weights(args.ref_ckpt, params)
    else:
        ref_params = jax.tree.map(jnp.copy, params)

    optimizer = make_optimizer(
        OptimConfig(
            learning_rate=args.learning_rate,
            warmup_steps=args.warmup_steps,
            total_steps=args.max_steps,
        )
    )
    repl = NamedSharding(mesh, P())
    param_sharding = fsdp_sharding(params, mesh) if args.fsdp else repl
    params = jax.device_put(params, param_sharding)
    ref_params = jax.device_put(ref_params, param_sharding)
    state = init_state(params, optimizer)
    if args.shard_optimizer and not args.fsdp:
        state = state._replace(
            opt_state=jax.device_put(state.opt_state, zero_sharding(state.opt_state, mesh))
        )
    logger.info("mesh %s  beta=%g  zero=%s  fsdp=%s", dict(mesh.shape), args.beta,
                args.shard_optimizer, args.fsdp)

    step_fn = jax.jit(
        lambda s, rp, b: dpo_train_step(
            s, rp, b, cfg, optimizer, beta=args.beta,
            label_smoothing=args.label_smoothing, ipo=args.ipo,
            accum_steps=args.grad_accum,
        ),
        donate_argnums=(0,),
    )

    assert args.train_data or args.shard_list, "--train_data or --shard_list required"
    tokenizer = get_tokenizer(args.tokenizer_path)
    collator = DPOCollator(tokenizer)
    it, _ = make_batch_source(
        collator, args.batch_size, train_data=args.train_data,
        shard_list=args.shard_list, seed=args.seed, epochs=args.epochs,
        min_batch_multiple=n_data,
        rank=jax.process_index(), world_size=jax.process_count(),
    )

    tb = None
    if args.tensorboard_dir:
        from tensorboardX import SummaryWriter

        tb = SummaryWriter(args.tensorboard_dir)

    t0 = time.time()
    metrics = {}
    for batch in it:
        sharded = host_local_batch_to_global(mesh, batch)
        state, metrics = step_fn(state, ref_params, sharded)
        step = int(state.step)
        if step % args.logging_steps == 0:
            m = {k: float(v) for k, v in metrics.items()}
            logger.info(
                "step %d loss %.4f sft %.4f dpo %.4f dpo_acc %.3f "
                "rewards %+.3f/%+.3f (%.2f s/it)",
                step, m["loss"], m["sft_loss"], m["dpo_loss"], m["dpo_acc"],
                m["chosen_reward"], m["reject_reward"],
                (time.time() - t0) / max(args.logging_steps, 1),
            )
            if tb is not None:
                for k, v in m.items():
                    tb.add_scalar(f"train/{k}", v, step)
            t0 = time.time()
        if step % args.save_steps == 0 and step > 0:
            ckpt.save_train_state(args.output_dir, jax.device_get(state), step)
            logger.info("saved step %d", step)
        if step >= args.max_steps:
            break

    ckpt.save_train_state(args.output_dir, jax.device_get(state), int(state.step))
    logger.info("done at step %d", int(state.step))
    return {"step": int(state.step),
            "metrics": {k: float(v) for k, v in metrics.items()}}


if __name__ == "__main__":
    main()
