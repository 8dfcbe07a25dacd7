"""HiFT vocoder GAN training CLI (reference WeNet GAN path:
bin/train.py + executor.train_one_epoc_gan, hifigan/hifigan.py objective).

Dataset rows need {audio{array,sampling_rate}} or precomputed
{speech (T,), speech_feat (Tm, 80), pitch_feat (Tm,)}.

Usage:
  python -m flowmirror_hydravox_tpu.train.train_hift \
      --train_data ds/ --output_dir ckpts/hift --batch_size 4 --segment_frames 32
"""

from __future__ import annotations

import argparse
import logging
import time

import numpy as np

logger = logging.getLogger("hydravox.train_hift")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--train_data", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--learning_rate", type=float, default=2e-4)
    p.add_argument("--max_steps", type=int, default=100_000)
    p.add_argument("--logging_steps", type=int, default=20)
    p.add_argument("--save_steps", type=int, default=2000)
    p.add_argument("--segment_frames", type=int, default=32,
                   help="random mel segment per sample (GAN training crops)")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--split_step", action="store_true",
                   help="compile generator and discriminator updates as two "
                        "programs (workaround for remote-compiler OOM on the "
                        "fused G+D graph)")
    p.add_argument("--shard_optimizer", action="store_true",
                   help="ZeRO-2-style moment sharding over 'data' for both "
                        "the generator and discriminator optimizers")
    p.add_argument("--fsdp", action="store_true",
                   help="FSDP / ZeRO-3-class full parameter sharding over "
                        "'data' for generator + discriminator "
                        "(parallel/sharding.fsdp_sharding); subsumes "
                        "--shard_optimizer")
    p.add_argument("--grad_accum", type=int, default=1,
                   help="micro-batch gradient accumulation inside each "
                        "jitted GAN step (lax.scan; reference executor "
                        "train_one_epoc_gan + train_utils.py:277-291). The "
                        "gen half hands per-micro fakes to the disc half")
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    import os

    os.makedirs(args.output_dir, exist_ok=True)

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..config import HydraVoxConfig, tiny_config
    from ..models import discriminator as disc_model
    from ..models import hift as hift_model
    from ..parallel.mesh import host_local_batch_to_global, make_mesh
    from ..parallel.sharding import fsdp_sharding, zero_sharding
    from ..utils import audio as audio_utils
    from . import checkpoint as ckpt
    from .data import load_hf_dataset
    from .gan import gan_train_step
    from .steps import OptimConfig, init_state, make_optimizer

    full_cfg = tiny_config() if args.tiny else HydraVoxConfig()
    cfg = full_cfg.hift
    m = full_cfg.mel
    up = cfg.upsample_scale

    rng = jax.random.PRNGKey(args.seed)
    k1, k2 = jax.random.split(rng)
    gen_params = hift_model.init_params(k1, cfg, jnp.float32)
    disc_params = disc_model.init_params(k2, jnp.float32)
    gen_opt = make_optimizer(OptimConfig(
        learning_rate=args.learning_rate, warmup_steps=100, total_steps=args.max_steps,
        weight_decay=0.0, b1=0.8, b2=0.99,
    ))
    disc_opt = make_optimizer(OptimConfig(
        learning_rate=args.learning_rate, warmup_steps=100, total_steps=args.max_steps,
        weight_decay=0.0, b1=0.8, b2=0.99,
    ))
    # data-parallel over the mesh 'data' axis (the reference's DDP GAN path,
    # utils/executor.py train_one_epoc_gan): params replicated, batch rows
    # sharded, gradient psum inserted by XLA over ICI
    mesh = make_mesh(model=1)
    n_data = mesh.shape["data"]
    assert args.batch_size % n_data == 0, (
        f"batch_size {args.batch_size} not divisible by {n_data} data shards"
    )
    assert args.batch_size % (args.grad_accum * n_data) == 0, (
        f"batch_size {args.batch_size} must divide evenly into "
        f"grad_accum {args.grad_accum} micro-batches of whole "
        f"{n_data}-way data shards (micro rows stay shardable over 'data')")
    repl = NamedSharding(mesh, P())
    if args.fsdp:
        gen_params = jax.device_put(gen_params, fsdp_sharding(gen_params, mesh))
        disc_params = jax.device_put(disc_params, fsdp_sharding(disc_params, mesh))
    else:
        gen_params = jax.device_put(gen_params, repl)
        disc_params = jax.device_put(disc_params, repl)
    gen_state = init_state(gen_params, gen_opt)
    disc_state = init_state(disc_params, disc_opt)
    if args.shard_optimizer and not args.fsdp:
        gen_state = gen_state._replace(
            opt_state=jax.device_put(gen_state.opt_state,
                                     zero_sharding(gen_state.opt_state, mesh)))
        disc_state = disc_state._replace(
            opt_state=jax.device_put(disc_state.opt_state,
                                     zero_sharding(disc_state.opt_state, mesh)))
    logger.info("mesh %s  zero=%s  fsdp=%s", dict(mesh.shape),
                args.shard_optimizer, args.fsdp)

    if args.split_step:
        # two smaller programs instead of one fused G+D step: the fused
        # graph's XLA compile can OOM/kill a constrained remote compiler
        # (observed on the axon service); functionally identical update order
        from .gan import gan_disc_step, gan_gen_step

        gen_fn = jax.jit(lambda gs, dp, batch, r: gan_gen_step(
            gs, dp, batch, r, cfg, gen_opt, accum_steps=args.grad_accum))
        disc_fn = jax.jit(lambda ds, real, fake: gan_disc_step(
            ds, real, fake, disc_opt, accum_steps=args.grad_accum))

        def step_fn(gs, ds, batch, r):
            gs, fake_sg, gm = gen_fn(gs, ds.params, batch, r)
            ds, dm = disc_fn(ds, batch["speech"], fake_sg)
            return gs, ds, {**gm, **dm}
    else:
        step_fn = jax.jit(
            lambda gs, ds, batch, r: gan_train_step(
                gs, ds, batch, r, cfg, gen_opt, disc_opt,
                accum_steps=args.grad_accum)
        )

    train_ds, _ = load_hf_dataset(args.train_data)

    def featurize(row, seg_rng):
        if "speech_feat" in row and row.get("speech_feat") is not None:
            mel = np.asarray(row["speech_feat"], np.float32)
            wav = np.asarray(row["speech"], np.float32)
        else:
            audio = row["audio"]
            wav = np.asarray(
                audio_utils.resample_linear(
                    jnp.asarray(np.asarray(audio["array"], np.float32))[None],
                    audio["sampling_rate"], m.sample_rate,
                )
            )[0]
            mel = np.asarray(audio_utils.mel_spectrogram(
                jnp.asarray(wav)[None], m.n_fft, m.num_mels, m.sample_rate,
                m.hop_size, m.win_size, m.fmin, m.fmax,
            ))[0].T
        tm = min(mel.shape[0], len(wav) // up)
        seg = args.segment_frames
        if tm <= seg:
            start = 0
            mel_seg = np.pad(mel[:tm], ((0, seg - tm), (0, 0)))
            wav_seg = np.pad(wav[: tm * up], (0, (seg - tm) * up))
        else:
            start = int(seg_rng.integers(0, tm - seg))
            mel_seg = mel[start : start + seg]
            wav_seg = wav[start * up : (start + seg) * up]
        # crude per-frame pitch proxy when no pitch column: autocorr-free
        # energy-weighted placeholder (real pitch comes from stage-4 data)
        pitch = np.asarray(row.get("pitch_feat", np.zeros(mel.shape[0], np.float32)))
        pitch_seg = pitch[start : start + seg]
        if len(pitch_seg) < seg:
            pitch_seg = np.pad(pitch_seg, (0, seg - len(pitch_seg)))
        return mel_seg, wav_seg, pitch_seg

    seg_rng = np.random.default_rng(args.seed)
    order = np.arange(len(train_ds))
    nstep, t0, metrics = 0, time.time(), {}
    while nstep < args.max_steps:
        np.random.default_rng(args.seed + nstep).shuffle(order)
        for start in range(0, len(order) - args.batch_size + 1, args.batch_size):
            rows = [train_ds[int(i)] for i in order[start : start + args.batch_size]]
            mels, wavs, pitches = zip(*[featurize(r, seg_rng) for r in rows])
            batch = host_local_batch_to_global(mesh, {
                "speech_feat": np.stack(mels),
                "speech": np.stack(wavs),
                "pitch_feat": np.stack(pitches),
            })
            rng, srng = jax.random.split(rng)
            gen_state, disc_state, metrics = step_fn(gen_state, disc_state, batch, srng)
            nstep = int(gen_state.step)
            if nstep % args.logging_steps == 0:
                logger.info(
                    "step %d gen %.3f (adv %.3f fm %.3f mel %.3f) disc %.3f (%.2f s/it)",
                    nstep, float(metrics["gen_loss"]), float(metrics["adv"]),
                    float(metrics["fm"]), float(metrics["mel"]),
                    float(metrics["disc_loss"]), (time.time() - t0) / max(args.logging_steps, 1),
                )
                t0 = time.time()
            if nstep % args.save_steps == 0 and nstep > 0:
                ckpt.save_params_npz(f"{args.output_dir}/hift_step{nstep}.npz", gen_state.params)
            if nstep >= args.max_steps:
                break

    ckpt.save_params_npz(f"{args.output_dir}/hift_final.npz", gen_state.params)
    return {"step": int(gen_state.step),
            "metrics": {k: float(v) for k, v in metrics.items()}}


if __name__ == "__main__":
    main()
