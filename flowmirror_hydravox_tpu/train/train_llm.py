"""LLM (MTP) training CLI — data-parallel pjit over the device mesh.

Replaces the reference's `accelerate launch train_speech_model.py --model llm`
path (train_speech_model.py:753-907): one process drives all local devices;
DP gradients ride ICI via pjit instead of DeepSpeed/NCCL.

Usage:
  python -m flowmirror_hydravox_tpu.train.train_llm \
      --train_data /path/to/hf_dataset --output_dir ckpts/llm \
      --batch_size 8 --learning_rate 1e-4 --max_steps 10000
"""

from __future__ import annotations

import argparse
import logging
import time

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger("hydravox.train_llm")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--train_data", default=None, help="HF dataset dir")
    p.add_argument("--shard_list", default=None,
                   help="parquet/dataset shard-list file (reference "
                        "dataset/dataset.py:125 chain)")
    p.add_argument("--batch_type", choices=["static", "dynamic"], default="static")
    p.add_argument("--max_frames_in_batch", type=int, default=12000,
                   help="dynamic-batch token budget (processor.py:324)")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--model_ckpt", default=None, help="weights-only npz or torch .pt")
    p.add_argument("--tokenizer_path", default=None)
    p.add_argument("--batch_size", type=int, default=8, help="global batch size")
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--warmup_steps", type=int, default=2500)
    p.add_argument("--max_steps", type=int, default=100_000)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--logging_steps", type=int, default=50)
    p.add_argument("--save_steps", type=int, default=2000)
    p.add_argument("--eval_steps", type=int, default=1000)
    p.add_argument("--auto_val_split", action="store_true")
    p.add_argument("--val_split_ratio", type=float, default=0.05)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--tiny", action="store_true", help="tiny config (tests)")
    p.add_argument("--tensorboard_dir", default=None,
                   help="write TB scalars (reference train_utils.py:187-192)")
    p.add_argument("--resume", default=None, help="orbax train-state dir")
    p.add_argument("--phoneme_aug", action="store_true",
                   help="random CMU/pinyin phoneme substitution in the collator "
                        "(reference train_llm_pretrain.py:86-195)")
    p.add_argument("--tensor_parallel", type=int, default=1,
                   help="Megatron-style TP degree over the 'model' mesh axis "
                        "(parallel/sharding.llm_param_specs)")
    p.add_argument("--shard_optimizer", action="store_true",
                   help="ZeRO-2-style optimizer-moment sharding over 'data' "
                        "(reference DeepSpeed stage 2, deepspeed_config.json)")
    p.add_argument("--fsdp", action="store_true",
                   help="FSDP / ZeRO-3-class full parameter sharding over "
                        "'data' (parallel/sharding.fsdp_sharding): params + "
                        "moments live sharded, GSPMD all-gathers per-layer. "
                        "One stage beyond the reference's DeepSpeed ZeRO-2. "
                        "Subsumes --shard_optimizer; exclusive with TP/PP")
    p.add_argument("--multihost", action="store_true",
                   help="multi-host training: jax.distributed init + hybrid "
                        "ICI/DCN mesh (reference train_utils.py:39-50 NCCL "
                        "equivalent; set COORDINATOR_ADDRESS/NUM_PROCESSES/"
                        "PROCESS_ID or run on Cloud TPU)")
    p.add_argument("--pipeline_parallel", type=int, default=1,
                   help="GPipe pipeline stages over the 'stage' mesh axis: "
                        "backbone layers are stage-sharded and microbatches "
                        "flow via ppermute (parallel/pipeline.py). Exclusive "
                        "with --tensor_parallel")
    p.add_argument("--pp_microbatches", type=int, default=0,
                   help="GPipe microbatches per step (0 = number of stages). "
                        "Each DP shard's rows must divide by this")
    p.add_argument("--grad_accum", type=int, default=1,
                   help="micro-batch gradient accumulation inside the jitted "
                        "step (lax.scan; reference train_utils.py:277-291 / "
                        "HF gradient_accumulation_steps). batch_size is the "
                        "GLOBAL batch; backward runs on batch_size/grad_accum "
                        "rows at a time")
    args = p.parse_args(argv)

    logging.basicConfig(level=logging.INFO)

    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..config import HydraVoxConfig, tiny_config
    from ..frontend.tokenizer import get_tokenizer
    from ..models import llm as llm_model
    from ..parallel.mesh import make_mesh
    from ..parallel.sharding import (
        fsdp_sharding, llm_param_specs, named, zero_sharding,
    )
    from . import checkpoint as ckpt
    from .data import LLMCollator, batch_iterator, load_hf_dataset
    from .steps import OptimConfig, init_state, llm_train_step, make_optimizer

    cfg = (tiny_config() if args.tiny else HydraVoxConfig()).llm
    pp = args.pipeline_parallel
    if pp > 1:
        assert args.tensor_parallel == 1, "--pipeline_parallel is exclusive with --tensor_parallel"
        assert not args.multihost, "--pipeline_parallel: single-controller meshes only for now"
        assert args.grad_accum == 1, "GPipe microbatching replaces --grad_accum (use --pp_microbatches)"
        assert args.batch_type == "static", (
            "--pipeline_parallel needs static batches: dynamic frame-budget "
            "batches vary in row count and break the microbatch divisibility")
        from ..parallel.pipeline import make_pp_mesh

        mesh = make_pp_mesh(stages=pp)
    elif args.multihost:
        from ..parallel.mesh import init_distributed, make_multihost_mesh

        init_distributed()
        mesh = make_multihost_mesh(model=args.tensor_parallel)
    else:
        mesh = make_mesh(model=args.tensor_parallel)
    n_data = mesh.shape["data"]
    assert args.batch_size % n_data == 0, (
        f"batch_size {args.batch_size} not divisible by {n_data} data shards"
    )
    if args.grad_accum > 1:
        assert args.batch_type == "static", "--grad_accum needs static batches"
        assert args.batch_size % args.grad_accum == 0, (
            f"batch_size {args.batch_size} not divisible by "
            f"grad_accum {args.grad_accum}")

    rng = jax.random.PRNGKey(args.seed)
    params = llm_model.init_params(rng, cfg, jnp.bfloat16)
    if args.model_ckpt:
        if args.model_ckpt.endswith(".npz"):
            params = ckpt.load_params_npz(args.model_ckpt, params)
        else:
            from ..convert.torch_import import llm_from_state_dict, load_torch_pt

            sd = load_torch_pt(args.model_ckpt)
            loaded = llm_from_state_dict(sd, cfg)
            params = jax.tree.map(lambda a, t: jnp.asarray(a, t.dtype), loaded, params)
        logger.info("loaded weights from %s", args.model_ckpt)

    optimizer = make_optimizer(
        OptimConfig(
            learning_rate=args.learning_rate,
            warmup_steps=args.warmup_steps,
            total_steps=args.max_steps,
        )
    )
    repl = NamedSharding(mesh, P())
    dsh = NamedSharding(mesh, P("data"))
    if args.fsdp:
        assert args.tensor_parallel == 1 and pp == 1, (
            "--fsdp shards params over 'data'; combine with neither "
            "--tensor_parallel nor --pipeline_parallel")
    if pp > 1:
        from ..parallel.pipeline import pp_param_shardings

        param_sharding = pp_param_shardings(mesh, params)
    elif args.tensor_parallel > 1:
        param_sharding = named(mesh, llm_param_specs())
    elif args.fsdp:
        param_sharding = fsdp_sharding(params, mesh)
    else:
        param_sharding = repl

    # Place params first: optimizer.init builds moments with zeros_like, so
    # they inherit the param layout (TP-sharded or replicated).
    params = jax.device_put(params, param_sharding)
    state = init_state(params, optimizer)
    if args.resume:
        state = ckpt.restore_train_state(args.resume, state)
        # restored leaves live on one device: re-place the full state on the
        # mesh (params per their layout, moments/step replicated; the ZeRO
        # re-placement below overrides moments when requested)
        state = state._replace(
            params=jax.device_put(state.params, param_sharding),
            opt_state=jax.device_put(
                state.opt_state,
                fsdp_sharding(state.opt_state, mesh) if args.fsdp else repl),
            step=jax.device_put(state.step, repl),
        )
        logger.info("resumed at step %d", int(state.step))
    if args.shard_optimizer and not args.fsdp:
        # ZeRO-2 layout: moments sharded over 'data' on each leaf's largest
        # divisible axis (reference DeepSpeed stage-2 equivalent)
        state = state._replace(
            opt_state=jax.device_put(state.opt_state, zero_sharding(state.opt_state, mesh))
        )
    logger.info("mesh %s  tp=%d  pp=%d  zero=%s  fsdp=%s", dict(mesh.shape),
                args.tensor_parallel, pp, args.shard_optimizer, args.fsdp)

    if pp > 1:
        from ..parallel.pipeline import make_pp_llm_step

        micro = args.pp_microbatches or pp
        assert (args.batch_size // n_data) % micro == 0, (
            f"per-DP-shard batch {args.batch_size // n_data} not divisible "
            f"by pp_microbatches {micro}")
        step_fn = make_pp_llm_step(mesh, cfg, optimizer, microbatches=micro)
    else:
        step_fn = jax.jit(
            lambda s, b: llm_train_step(s, b, cfg, optimizer,
                                        accum_steps=args.grad_accum),
            donate_argnums=(0,),
        )

    assert args.train_data or args.shard_list, "--train_data or --shard_list required"
    tokenizer = get_tokenizer(args.tokenizer_path)
    aug = None
    if args.phoneme_aug:
        from ..frontend.tokenizer import SPECIAL_TOKENS
        from .phoneme_aug import PhonemeAugmenter

        aug = PhonemeAugmenter(SPECIAL_TOKENS, seed=args.seed)
    collator = LLMCollator(tokenizer, phoneme_aug=aug)
    from .data import make_batch_source

    it, val_ds = make_batch_source(
        collator, args.batch_size, train_data=args.train_data,
        shard_list=args.shard_list, batch_type=args.batch_type,
        max_frames_in_batch=args.max_frames_in_batch, seed=args.seed,
        epochs=args.epochs,
        val_split=args.val_split_ratio if args.auto_val_split else 0.0,
        min_batch_multiple=n_data,
        rank=jax.process_index(), world_size=jax.process_count(),
    )

    tb = None
    if args.tensorboard_dir:
        from tensorboardX import SummaryWriter

        tb = SummaryWriter(args.tensorboard_dir)

    from ..parallel.mesh import host_local_batch_to_global

    t0 = time.time()
    metrics = {}
    for batch in it:
        sharded = host_local_batch_to_global(mesh, batch)
        state, metrics = step_fn(state, sharded)
        step = int(state.step)
        if step % args.logging_steps == 0:
            m = {k: float(v) for k, v in metrics.items()}
            logger.info(
                "step %d loss %.4f acc %.4f gnorm %.3f (%.2f s/it)",
                step, m["loss"], m["acc"], m["grad_norm"],
                (time.time() - t0) / max(args.logging_steps, 1),
            )
            if tb is not None:
                for k, v in m.items():
                    tb.add_scalar(f"train/{k}", v, step)
            t0 = time.time()
        if step % args.save_steps == 0 and step > 0:
            ckpt.save_train_state(args.output_dir, jax.device_get(state), step)
            logger.info("saved step %d", step)
        if val_ds is not None and step % args.eval_steps == 0 and step > 0:
            eval_losses = []
            for vb in batch_iterator(val_ds, collator, args.batch_size, shuffle=False, epochs=1):
                out = llm_model.forward_loss(
                    state.params, cfg,
                    jnp.asarray(vb["text_token"]), jnp.asarray(vb["text_len"]),
                    jnp.asarray(vb["speech_token"]), jnp.asarray(vb["speech_len"]),
                )
                eval_losses.append(float(out["loss"]))
            logger.info("eval step %d loss %.4f", step, float(np.mean(eval_losses)))
        if step >= args.max_steps:
            break

    ckpt.save_train_state(args.output_dir, jax.device_get(state), int(state.step))
    logger.info("done at step %d", int(state.step))
    return {"step": int(state.step),
            "metrics": {k: float(v) for k, v in metrics.items()},
            "opt_state_shardings": jax.tree.map(
                lambda x: getattr(x, "sharding", None), state.opt_state),
            "param_shardings": jax.tree.map(
                lambda x: getattr(x, "sharding", None), state.params)}


if __name__ == "__main__":
    main()
