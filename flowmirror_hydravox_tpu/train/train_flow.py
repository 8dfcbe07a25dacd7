"""Flow (CFM) training CLI — data-parallel pjit over the device mesh.

Replaces the reference's `accelerate launch train_speech_model.py --model
flow` path; same structure as train_llm.py with the CFM MSE objective."""

from __future__ import annotations

import argparse
import logging
import time

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger("hydravox.train_flow")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--train_data", default=None, help="HF dataset dir")
    p.add_argument("--shard_list", default=None,
                   help="parquet/dataset shard-list file")
    p.add_argument("--batch_type", choices=["static", "dynamic"], default="static")
    p.add_argument("--max_frames_in_batch", type=int, default=12000)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--model_ckpt", default=None)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--warmup_steps", type=int, default=2500)
    p.add_argument("--max_steps", type=int, default=100_000)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--logging_steps", type=int, default=50)
    p.add_argument("--save_steps", type=int, default=2000)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--tensorboard_dir", default=None,
                   help="write TB scalars (reference train_utils.py:187-192)")
    p.add_argument("--resume", default=None)
    p.add_argument("--tensor_parallel", type=int, default=1,
                   help="TP degree over the 'model' mesh axis (DiT estimator "
                        "attention/FF sharding, parallel/sharding.flow_param_specs)")
    p.add_argument("--shard_optimizer", action="store_true",
                   help="ZeRO-2-style optimizer-moment sharding over 'data'")
    p.add_argument("--fsdp", action="store_true",
                   help="FSDP / ZeRO-3-class full parameter sharding over "
                        "'data' (parallel/sharding.fsdp_sharding); subsumes "
                        "--shard_optimizer; exclusive with --tensor_parallel")
    p.add_argument("--multihost", action="store_true",
                   help="jax.distributed init + hybrid ICI/DCN mesh")
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
    from ..models import flow as flow_model
    from ..parallel.mesh import make_mesh
    from ..parallel.sharding import (
        flow_param_specs, fsdp_sharding, named, zero_sharding,
    )
    from ..utils import audio as audio_utils
    from . import checkpoint as ckpt
    from .data import FlowCollator, batch_iterator, load_hf_dataset
    from .steps import OptimConfig, flow_train_step, init_state, make_optimizer

    full_cfg = tiny_config() if args.tiny else HydraVoxConfig()
    cfg = full_cfg.flow
    if args.multihost:
        from ..parallel.mesh import init_distributed, make_multihost_mesh

        init_distributed()
        mesh = make_multihost_mesh(model=args.tensor_parallel)
    else:
        mesh = make_mesh(model=args.tensor_parallel)
    assert args.batch_size % mesh.shape["data"] == 0
    if args.grad_accum > 1:
        assert args.batch_type == "static", "--grad_accum needs static batches"
        assert args.batch_size % args.grad_accum == 0, (
            f"batch_size {args.batch_size} not divisible by "
            f"grad_accum {args.grad_accum}")

    rng = jax.random.PRNGKey(args.seed)
    params = flow_model.init_params(rng, cfg, jnp.bfloat16)
    if args.model_ckpt:
        if args.model_ckpt.endswith(".npz"):
            params = ckpt.load_params_npz(args.model_ckpt, params)
        else:
            from ..convert.torch_import import flow_from_state_dict, load_torch_pt

            loaded = flow_from_state_dict(load_torch_pt(args.model_ckpt), cfg)
            params = jax.tree.map(lambda a, t: jnp.asarray(a, t.dtype), loaded, params)

    optimizer = make_optimizer(
        OptimConfig(
            learning_rate=args.learning_rate, warmup_steps=args.warmup_steps,
            total_steps=args.max_steps,
        )
    )
    repl = NamedSharding(mesh, P())
    dsh = NamedSharding(mesh, P("data"))
    if args.fsdp:
        assert args.tensor_parallel == 1, (
            "--fsdp shards params over 'data'; exclusive with --tensor_parallel")
        param_sharding = fsdp_sharding(params, mesh)
    elif args.tensor_parallel > 1:
        param_sharding = named(mesh, flow_param_specs())
    else:
        param_sharding = repl
    params = jax.device_put(params, param_sharding)
    state = init_state(params, optimizer)
    if args.resume:
        state = ckpt.restore_train_state(args.resume, state)
        state = state._replace(
            params=jax.device_put(state.params, param_sharding),
            opt_state=jax.device_put(
                state.opt_state,
                fsdp_sharding(state.opt_state, mesh) if args.fsdp else repl),
            step=jax.device_put(state.step, repl),
        )
    if args.shard_optimizer and not args.fsdp:
        state = state._replace(
            opt_state=jax.device_put(state.opt_state, zero_sharding(state.opt_state, mesh))
        )
    logger.info("mesh %s  tp=%d  zero=%s  fsdp=%s", dict(mesh.shape),
                args.tensor_parallel, args.shard_optimizer, args.fsdp)
    step_fn = jax.jit(
        lambda s, b, r: flow_train_step(s, b, r, cfg, optimizer,
                                        accum_steps=args.grad_accum),
        donate_argnums=(0,),
    )

    m = full_cfg.mel

    def mel_extract(wav, sr):
        wav24 = np.asarray(
            audio_utils.resample_linear(jnp.asarray(wav, jnp.float32)[None], sr, m.sample_rate)
        )
        mel = audio_utils.mel_spectrogram(
            jnp.asarray(wav24), m.n_fft, m.num_mels, m.sample_rate, m.hop_size, m.win_size,
            m.fmin, m.fmax,
        )
        return np.asarray(mel)[0].T

    assert args.train_data or args.shard_list, "--train_data or --shard_list required"
    collator = FlowCollator(mel_extract_fn=mel_extract, token_mel_ratio=cfg.token_mel_ratio)
    from .data import make_batch_source

    it, _ = make_batch_source(
        collator, args.batch_size, train_data=args.train_data,
        shard_list=args.shard_list, batch_type=args.batch_type,
        max_frames_in_batch=args.max_frames_in_batch, seed=args.seed,
        epochs=args.epochs, min_batch_multiple=mesh.shape["data"],
    )

    tb = None
    if args.tensorboard_dir:
        from tensorboardX import SummaryWriter

        tb = SummaryWriter(args.tensorboard_dir)

    from ..parallel.mesh import host_local_batch_to_global

    t0 = time.time()
    metrics = {}
    for batch in it:
        rng, step_rng = jax.random.split(rng)
        sharded = host_local_batch_to_global(mesh, batch)
        state, metrics = step_fn(state, sharded, step_rng)
        step = int(state.step)
        if step % args.logging_steps == 0:
            logger.info(
                "step %d loss %.5f gnorm %.3f (%.2f s/it)",
                step, float(metrics["loss"]), float(metrics["grad_norm"]),
                (time.time() - t0) / max(args.logging_steps, 1),
            )
            if tb is not None:
                tb.add_scalar("train/loss", float(metrics["loss"]), step)
                tb.add_scalar("train/grad_norm", float(metrics["grad_norm"]), step)
            t0 = time.time()
        if step % args.save_steps == 0 and step > 0:
            ckpt.save_train_state(args.output_dir, jax.device_get(state), step)
        if step >= args.max_steps:
            break

    ckpt.save_train_state(args.output_dir, jax.device_get(state), int(state.step))
    return {"step": int(state.step),
            "metrics": {k: float(v) for k, v in metrics.items()}}


if __name__ == "__main__":
    main()
