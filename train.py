#!/usr/bin/env python
"""Training driver: teacher-forcing (CausalDiffusion) and distillation.

The reference never released its trainer (`README.md:20`) — only the
objectives. This driver completes the stack: mesh-sharded training with the
fps-forcing mask (the objective that produced the released checkpoints),
EMA, periodic orbax checkpoints, and export back to the reference's .pt
format.  `--objective dmd|sid` runs the self-forcing distillation losses
with alternating generator/critic updates
(dfake_gen_update_ratio, configs/self_forcing_dmd.yaml).

Smoke mode (no --data-dir) trains on synthetic latents to validate the loop:

  python train.py --objective teacher_forcing --steps 3 --smoke
"""

import argparse
import os
import sys
import time
from functools import partial

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--objective", default="teacher_forcing",
                   choices=["teacher_forcing", "flow", "dmd", "sid", "gan",
                            "causvid", "ode"])
    p.add_argument("--data-dir", default=None,
                   help="TensorDictDataset shard dir (precomputed latents)")
    p.add_argument("--smoke", action="store_true",
                   help="tiny model + synthetic data")
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--lr-critic", type=float, default=None,
                   help="fake-score/discriminator learning rate (configs "
                        "lr_critic; defaults to --lr)")
    p.add_argument("--ema-decay", type=float, default=0.999)
    p.add_argument("--ema-start-step", type=int, default=0,
                   help="start EMA accumulation at this step (configs "
                        "ema_start_step)")
    p.add_argument("--timestep-shift", type=float, default=8.0)
    p.add_argument("--num-frames", type=int, default=21)
    p.add_argument("--num-frame-per-block", type=int, default=3,
                   help="AR block size (3 for t2v, 4 for the i2v "
                        "[1,4,4,...] plan — configs num_frame_per_block)")
    p.add_argument("--num-training-frames", type=int, default=None,
                   help="distillation: max rollout length; each step "
                        "samples a length in [--num-frames, this] in whole "
                        "blocks and the losses see the last --num-frames "
                        "window (base.py:131-167)")
    p.add_argument("--rolling", action="store_true",
                   help="run rollout blocks past the attention window as "
                        "one scanned recency-ordered block (constant "
                        "compile time/cache memory in video length)")
    p.add_argument("--remat-offload", action="store_true",
                   help="park per-layer boundary activations in pinned "
                        "host memory during backward (full-depth "
                        "single-chip training; demo_utils/memory.py role)")
    p.add_argument("--offload-opt", action="store_true",
                   help="keep optimizer states + the EMA shadow in pinned "
                        "host memory, streamed per-leaf through HBM at "
                        "update time (ZeRO-Offload placement; with "
                        "--remat-offload this is what fits full-depth "
                        "three-model distillation on one 16 GB chip — "
                        "FSDP cpu_offload role, utils/distributed.py:23-68)")
    p.add_argument("--noise-aug-max", type=int, default=100)
    p.add_argument("--dfake-gen-update-ratio", type=int, default=5)
    p.add_argument("--fake-guidance-scale", type=float, default=0.0,
                   help="CFG on the fake score (the CausVid knob, "
                        "causvid.py:30-45)")
    p.add_argument("--denoising-step-list", default="1000,750,500,250",
                   help="few-step list for ODE regression and the "
                        "self-forcing rollout (configs/*.yaml)")
    p.add_argument("--warp-denoising-step", action="store_true",
                   help="map the step list through the shifted schedule "
                        "(base.py:22-24; self_forcing_dmd.yaml)")
    p.add_argument("--independent-first-frame", action="store_true",
                   help="i2v [1, nb, nb, ...] rollout plan: the first "
                        "generated frame is its own block "
                        "(self_forcing_training.py:68-74)")
    p.add_argument("--same-step-across-blocks", type=int, choices=[0, 1],
                   default=1,
                   help="one shared exit flag for every rollout block "
                        "(configs same_step_across_blocks)")
    p.add_argument("--last-step-only", action="store_true",
                   help="always exit the rollout at the final denoising "
                        "step (configs last_step_only)")
    p.add_argument("--ts-schedule", type=int, choices=[0, 1], default=1,
                   help="sample score timesteps from [t_to, max] "
                        "(dmd.py ts_schedule; the reference's dmd config "
                        "sets false)")
    p.add_argument("--real-guidance-scale", type=float, default=5.0,
                   help="CFG on the frozen real score "
                        "(configs guidance_scale)")
    p.add_argument("--context-noise", type=int, default=0,
                   help="timestep at which clean context is committed to "
                        "the rollout cache (default_config.yaml)")
    p.add_argument("--generator-ckpt", default=None,
                   help="init the generator from an MMPL .pt "
                        "({'generator','generator_ema'} — e.g. the "
                        "ODE-init or TF checkpoint; configs "
                        "generator_ckpt)")
    p.add_argument("--wan-dir", default=None,
                   help="base Wan weights (diffusers dir / state-dict "
                        "file) for the frozen real_score and the "
                        "fake_score init (wan_wrapper.py:25-31,128-133)")
    p.add_argument("--vae-path", default=None,
                   help="Wan2.1_VAE.pth for the long-rollout last-window "
                        "pixel re-encode (base.py:155-165)")
    p.add_argument("--config", default=None,
                   help="YAML run config (the reference's OmegaConf style, "
                        "configs/*.yaml) merged over flag defaults; "
                        "explicitly-passed CLI flags win")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ckpt-dir", default="checkpoints")
    p.add_argument("--log-dir", default="runs",
                   help="JSONL metrics directory (utils/metrics.py)")
    p.add_argument("--run-name", default=None)
    p.add_argument("--ckpt-every", type=int, default=500)
    p.add_argument("--resume", default=None,
                   help="orbax checkpoint dir (a --ckpt-dir stepN) to "
                        "resume models/optimizers/EMA/step from; the RNG "
                        "streams are fast-forwarded so a resumed run "
                        "matches an uninterrupted one")
    p.add_argument("--export-pt", default=None,
                   help="also export generator to the reference .pt format")
    p.add_argument("--mesh", default=None,
                   help="explicit mesh layout 'dp=A,fsdp=B,tp=C' (sizes "
                        "multiply to #devices); default folds all devices "
                        "fsdp-major (parallel.mesh.make_mesh)")
    p.add_argument("--coordinator", default=None,
                   help="multi-host: coordinator address host:port "
                        "(jax.distributed; the launch_distributed_job "
                        "analogue, utils/distributed.py:75-89)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    return p.parse_args(argv)


#: YAML key -> (CLI flag, args attribute, cast).  `trainer`/
#: `distribution_loss` -> --objective is handled separately.
_CONFIG_KEYS = {
    "timestep_shift": ("--timestep-shift", "timestep_shift", float),
    "lr": ("--lr", "lr", float),
    "seed": ("--seed", "seed", int),
    "batch_size": ("--batch-size", "batch_size", int),
    "ema_weight": ("--ema-decay", "ema_decay", float),
    "dfake_gen_update_ratio": ("--dfake-gen-update-ratio",
                               "dfake_gen_update_ratio", int),
    "num_training_frames": ("--num-training-frames",
                            "num_training_frames", int),
    "context_noise": ("--context-noise", "context_noise", int),
    "guidance_scale": ("--real-guidance-scale", "real_guidance_scale",
                       float),
    "ts_schedule": ("--ts-schedule", "ts_schedule",
                    lambda v: int(bool(v))),
    "same_step_across_blocks": ("--same-step-across-blocks",
                                "same_step_across_blocks",
                                lambda v: int(bool(v))),
    "last_step_only": ("--last-step-only", "last_step_only", bool),
    "lr_critic": ("--lr-critic", "lr_critic", float),
    "ema_start_step": ("--ema-start-step", "ema_start_step", int),
    "num_frame_per_block": ("--num-frame-per-block",
                            "num_frame_per_block", int),
    "fake_guidance_scale": ("--fake-guidance-scale",
                            "fake_guidance_scale", float),
    "independent_first_frame": ("--independent-first-frame",
                                "independent_first_frame", bool),
    "warp_denoising_step": ("--warp-denoising-step",
                            "warp_denoising_step", bool),
    "generator_ckpt": ("--generator-ckpt", "generator_ckpt", str),
}


def apply_run_config(args, argv=None):
    """Merge a reference-style YAML run config (`--config`) into parsed
    args: config values override flag DEFAULTS, explicitly-passed CLI
    flags override the config (the OmegaConf-merge role of
    Wan_fps_inference_1gpu.py:54-56 for the training driver)."""
    if not args.config:
        return args
    from mmpl_tpu.core.config import load_config
    default = os.path.join(os.path.dirname(args.config),
                           "default_config.yaml")
    run_cfg = load_config(args.config,
                          default if os.path.exists(default) else None)
    given = list(argv if argv is not None else sys.argv[1:])

    def explicit(flag):
        return any(a == flag or a.startswith(flag + "=") for a in given)

    for key, (flag, attr, cast) in _CONFIG_KEYS.items():
        if key in run_cfg and not explicit(flag):
            setattr(args, attr, cast(run_cfg[key]))
    if "denoising_step_list" in run_cfg \
            and not explicit("--denoising-step-list"):
        args.denoising_step_list = ",".join(
            str(int(t)) for t in run_cfg["denoising_step_list"])
    # image_or_video_shape: [B, F_latent, C, H, W]
    # (default_config.yaml: [1, 21, 16, 60, 104])
    shp = run_cfg.get("image_or_video_shape")
    if shp and len(shp) >= 2:
        if not explicit("--batch-size"):
            args.batch_size = int(shp[0])
        if not explicit("--num-frames"):
            args.num_frames = int(shp[1])
    # objective: `trainer: diffusion` -> teacher_forcing;
    # `trainer: score_distillation` -> distribution_loss (dmd/sid/...);
    # our own configs may name the objective directly (`trainer: dmd`)
    tr = run_cfg.get("trainer")
    obj = {"diffusion": "teacher_forcing",
           "score_distillation": run_cfg.get("distribution_loss", "dmd"),
           }.get(tr, tr)
    if obj and not explicit("--objective"):
        args.objective = obj
    return args


def main(argv=None):
    args = apply_run_config(parse_args(argv), argv)
    import jax
    from mmpl_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp
    from mmpl_tpu.parallel.mesh import init_distributed
    if init_distributed(args.coordinator, args.num_processes,
                        args.process_id):
        print(f"distributed: process {jax.process_index()}/"
              f"{jax.process_count()}, {len(jax.devices())} global devices",
              file=sys.stderr)
    from mmpl_tpu.core.config import T2V_1_3B, tiny_test_config
    from mmpl_tpu.core.geometry import T2V_CLEAN_STEPS
    from mmpl_tpu.models import dit
    from mmpl_tpu.training import masks
    from mmpl_tpu.training.diffusion import (DiffusionTrainer,
                                             make_teacher_forcing_loss_fn)
    from mmpl_tpu.utils.ema import EmaParams
    from mmpl_tpu.utils.misc import set_seed

    cfg = tiny_test_config() if args.smoke else T2V_1_3B
    F = args.num_frames
    lat_hw = (4, 4) if args.smoke else (60, 104)

    key = set_seed(args.seed)
    # generator init order: MMPL fine-tune .pt > base Wan weights > random
    # (teacher forcing / ODE regression start from the base model,
    # distillation from the ODE-init or TF checkpoint)
    if args.generator_ckpt:
        from mmpl_tpu.utils.checkpoint import load_mmpl_generator
        params = load_mmpl_generator(args.generator_ckpt, cfg)
        print(f"generator <- {args.generator_ckpt}", file=sys.stderr)
    elif args.wan_dir:
        from mmpl_tpu.utils.checkpoint import load_wan_dit
        params = load_wan_dit(args.wan_dir, cfg)
        print(f"generator <- {args.wan_dir}", file=sys.stderr)
    else:
        params = dit.init_dit_params(key, cfg, jnp.float32)
    from mmpl_tpu.utils.metrics import MetricsLogger
    metrics = MetricsLogger(args.log_dir, args.run_name, config=vars(args))

    if args.objective in ("teacher_forcing", "flow"):
        loss_fn = None
        if args.objective == "teacher_forcing":
            from mmpl_tpu.schedulers.flow_match import FlowMatchScheduler
            sch = FlowMatchScheduler(shift=args.timestep_shift,
                                     sigma_min=0.0, extra_one_step=True)
            sch.set_timesteps(1000, training=True)
            fm = masks.fps_forcing_frame_mask(T2V_CLEAN_STEPS[:F])
            loss_fn = make_teacher_forcing_loss_fn(
                cfg, sch, fm,
                num_frame_per_block=args.num_frame_per_block,
                noise_aug_max_timestep=args.noise_aug_max,
                remat_offload=args.remat_offload)
        mesh = None
        if args.mesh:
            from mmpl_tpu.parallel.mesh import make_mesh
            shape = {k: int(v) for k, v in
                     (kv.split("=") for kv in args.mesh.split(","))}
            mesh = make_mesh(shape)
            print(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}",
                  file=sys.stderr)
        trainer = DiffusionTrainer(cfg, params, mesh=mesh,
                                   learning_rate=args.lr,
                                   timestep_shift=args.timestep_shift,
                                   loss_fn=loss_fn)
        ema = EmaParams(trainer.params, decay=args.ema_decay)

        if args.data_dir:
            from mmpl_tpu.data.datasets import (TensorDictDataset,
                                                batch_iterator)
            it = batch_iterator(TensorDictDataset(args.data_dir),
                                args.batch_size, seed=args.seed)
            def next_batch(step):
                b = next(it)
                return {
                    "latents": jnp.asarray(b["latents"]),
                    "context": jnp.asarray(b["prompt_embeds"]),
                    "uncond_context": jnp.zeros_like(
                        jnp.asarray(b["prompt_embeds"])),
                }
        else:
            def next_batch(step):
                k = jax.random.fold_in(jax.random.PRNGKey(args.seed), step)
                k1, k2 = jax.random.split(k)
                return {
                    "latents": jax.random.normal(
                        k1, (args.batch_size, F, 16, *lat_hw)),
                    "context": jax.random.normal(
                        k2, (args.batch_size, cfg.text_len, cfg.text_dim)),
                    "uncond_context": jnp.zeros(
                        (args.batch_size, cfg.text_len, cfg.text_dim)),
                }

        start_step = 0
        if args.resume:
            from mmpl_tpu.utils.train_state_io import restore_checkpoint
            st = restore_checkpoint(args.resume, {
                "params": trainer.params, "opt_state": trainer.opt_state,
                "ema": ema.shadow, "step": jnp.asarray(0)})
            like = lambda v, r: jax.tree.map(
                lambda a, b: jax.device_put(a, b.sharding), v, r)
            trainer.params = like(st["params"], trainer.params)
            trainer.opt_state = like(st["opt_state"], trainer.opt_state)
            ema.shadow = like(st["ema"], ema.shadow)
            start_step = int(st["step"])
            print(f"resumed at step {start_step} <- {args.resume}",
                  file=sys.stderr)

        rng = jax.random.PRNGKey(args.seed + 1)
        for _ in range(start_step):       # replay the per-step rng splits
            rng, _ = jax.random.split(rng)
        for step in range(start_step, args.steps):
            rng, sub = jax.random.split(rng)
            t0 = time.time()
            loss = trainer.train_step(next_batch(step), sub)
            ema.update(trainer.params)
            dt = time.time() - t0
            metrics.log(step, loss=float(loss), step_s=dt)
            print(f"step {step}: loss={float(loss):.5f} "
                  f"({dt:.2f}s)", file=sys.stderr, flush=True)
            if args.ckpt_every and (step + 1) % args.ckpt_every == 0:
                from mmpl_tpu.utils.train_state_io import save_checkpoint
                save_checkpoint(os.path.join(args.ckpt_dir, f"step{step+1}"),
                                {"params": trainer.params,
                                 "opt_state": trainer.opt_state,
                                 "ema": ema.shadow,
                                 "step": jnp.asarray(step + 1)})
        if args.export_pt:
            from mmpl_tpu.utils.train_state_io import export_generator_pt
            export_generator_pt(args.export_pt, trainer.params, ema.shadow,
                                cfg)
            print(f"exported {args.export_pt}", file=sys.stderr)
        return 0

    import optax
    from mmpl_tpu.schedulers.flow_match import FlowMatchScheduler

    sch = FlowMatchScheduler(shift=args.timestep_shift, sigma_min=0.0,
                             extra_one_step=True)
    sch.set_timesteps(1000, training=True)

    if args.objective == "ode":
        # ODE regression (model/ode_regression.py:9-138): regress the
        # causal generator onto precomputed teacher trajectories
        from mmpl_tpu.training.distillation import (
            ode_regression_loss, prepare_ode_generator_input)
        step_list = tuple(
            int(s) for s in args.denoising_step_list.split(","))
        tx = optax.adamw(args.lr)
        opt = tx.init(params)

        if args.data_dir:
            from mmpl_tpu.data.datasets import batch_iterator
            from mmpl_tpu.data.ode_gen import ODERegressionNpzDataset
            it = batch_iterator(ODERegressionNpzDataset(args.data_dir),
                                args.batch_size, seed=args.seed)

            def next_ode(step):
                b = next(it)
                if "prompt_embeds" not in b:
                    raise SystemExit(
                        "ODE shards lack prompt_embeds — regenerate with "
                        "write_ode_shard(..., prompt_embeds=...) or run "
                        "data_process to encode prompts offline")
                return (jnp.asarray(b["ode_latent"]),
                        jnp.asarray(b["prompt_embeds"]))
        else:
            S1 = len(step_list) + 1

            def next_ode(step):
                k = jax.random.fold_in(jax.random.PRNGKey(args.seed), step)
                k1, k2 = jax.random.split(k)
                return (jax.random.normal(
                            k1, (args.batch_size, S1, F, 16, *lat_hw)),
                        jax.random.normal(
                            k2, (args.batch_size, cfg.text_len,
                                 cfg.text_dim)))

        @jax.jit
        def ode_step(params, opt, ode_latent, ctx, rng):
            emb = dit.embed_text(params, ctx)
            ctx_kv = dit.precompute_context_kv(params, cfg, emb)
            r1, r2 = jax.random.split(rng)
            noisy, t = prepare_ode_generator_input(ode_latent, step_list,
                                                   r1)
            batch = {"noisy_input": noisy,
                     "clean_latent": ode_latent[:, -1],
                     "timestep": t, "ctx_kv": ctx_kv}

            def lf(p):
                return ode_regression_loss(
                    p, cfg, sch, batch, r2,
                    remat_offload=args.remat_offload)
            (loss, _), grads = jax.value_and_grad(lf, has_aux=True)(params)
            upd, opt = tx.update(grads, opt, params)
            return optax.apply_updates(params, upd), opt, loss

        start_step = 0
        if args.resume:
            from mmpl_tpu.utils.train_state_io import restore_checkpoint
            st = restore_checkpoint(args.resume, {
                "params": params, "opt_state": opt, "step": jnp.asarray(0)})
            like = lambda v, r: jax.tree.map(
                lambda a, b: jax.device_put(a, b.sharding), v, r)
            params, opt = like(st["params"], params), \
                like(st["opt_state"], opt)
            start_step = int(st["step"])
            print(f"resumed at step {start_step} <- {args.resume}",
                  file=sys.stderr)
        rng = jax.random.PRNGKey(args.seed + 1)
        for _ in range(start_step):
            rng = jax.random.split(rng)[0]
        for step in range(start_step, args.steps):
            rng, sub = jax.random.split(rng)
            ode_latent, ctx = next_ode(step)
            t0 = time.time()
            params, opt, loss = ode_step(params, opt, ode_latent, ctx, sub)
            dt = time.time() - t0
            metrics.log(step, loss=float(loss), step_s=dt)
            print(f"step {step}: loss={float(loss):.5f} ({dt:.2f}s)",
                  file=sys.stderr, flush=True)
            if args.ckpt_every and (step + 1) % args.ckpt_every == 0:
                from mmpl_tpu.utils.train_state_io import save_checkpoint
                save_checkpoint(
                    os.path.join(args.ckpt_dir, f"step{step+1}"),
                    {"params": params, "opt_state": opt,
                     "step": jnp.asarray(step + 1)})
        if args.export_pt:
            from mmpl_tpu.utils.train_state_io import export_generator_pt
            export_generator_pt(args.export_pt, params, params, cfg)
        return 0

    # distillation (dmd / sid / causvid / gan): generator + fake_score
    # (+ gan head, + frozen real_score for dmd/sid/causvid)
    from mmpl_tpu.training.distillation import (DistillationConfig,
                                                Distiller)
    from mmpl_tpu.training.self_forcing import (SelfForcingRollout,
                                                sample_num_frames)
    max_F = args.num_training_frames or F
    iff = args.independent_first_frame
    nb = args.num_frame_per_block
    off = 1 if iff else 0
    assert max_F >= F and (max_F - off) % nb == 0 and (F - off) % nb == 0, \
        (F, max_F, off, nb)
    ro = SelfForcingRollout(cfg, sch,
                            denoising_step_list=tuple(
                                int(s) for s in
                                args.denoising_step_list.split(",")),
                            context_noise=args.context_noise,
                            num_frame_per_block=nb,
                            same_step_across_blocks=bool(
                                args.same_step_across_blocks),
                            last_step_only=args.last_step_only,
                            num_max_frames=F, grad_frame_window=F,
                            rolling=args.rolling,
                            remat_offload=args.remat_offload,
                            warp_denoising_step=args.warp_denoising_step,
                            independent_first_frame=iff)
    vae_params = None
    if args.vae_path:
        from mmpl_tpu.utils.checkpoint import load_vae
        vae_params = load_vae(args.vae_path)
        print(f"vae <- {args.vae_path}", file=sys.stderr)
    dist = Distiller(cfg, DistillationConfig(
        timestep_shift=args.timestep_shift,
        real_guidance_scale=args.real_guidance_scale,
        fake_guidance_scale=args.fake_guidance_scale,
        ts_schedule=bool(args.ts_schedule),
        window_frames=F if max_F > F else None,
        remat_offload=args.remat_offload), ro, sch,
        vae_params=vae_params)
    # the reference initialises BOTH scores from the base Wan weights
    # and freezes real_score (base.py:26-46, wan_wrapper.py:128-133)
    if args.wan_dir:
        from mmpl_tpu.utils.checkpoint import load_wan_dit
        base = load_wan_dit(args.wan_dir, cfg)
        print(f"scores <- {args.wan_dir}", file=sys.stderr)
        fake0 = base
    else:
        base = None
        fake0 = dit.init_dit_params(jax.random.PRNGKey(10), cfg,
                                    jnp.float32)
    models = {
        "generator": params,
        "fake_score": fake0,
    }
    if args.objective == "gan":
        # classify-mode head on the fake score (model/gan.py:28-29,
        # wan_wrapper.py:150-170); the GAN objective needs no real_score
        from mmpl_tpu.training.gan import init_gan_head_params
        models["gan_head"] = init_gan_head_params(
            jax.random.PRNGKey(12), atten_dim=cfg.dim,
            ffn_dim=cfg.ffn_dim, num_heads=cfg.num_heads)
        gen_loss = dist.gan_generator_loss
        critic_loss = dist.gan_critic_loss
        critic_keys = ("fake_score", "gan_head")
    else:
        models["real_score"] = base if base is not None else \
            dit.init_dit_params(jax.random.PRNGKey(11), cfg, jnp.float32)
        gen_loss = getattr(dist, f"{args.objective}_generator_loss")
        critic_loss = dist.critic_loss
        critic_keys = ("fake_score",)

    mesh = None
    if args.mesh:
        from mmpl_tpu.parallel.mesh import (batch_sharding,
                                            dit_param_shardings, make_mesh,
                                            replicate)
        shape = {k: int(v) for k, v in
                 (kv.split("=") for kv in args.mesh.split(","))}
        mesh = make_mesh(shape)
        print(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}",
              file=sys.stderr)
        # (dp, fsdp, tp)-shard all models (the full-depth path: sharded
        # DMD == replicated, tests/test_parallel.py); optimizer states
        # inherit the shardings through init
        models = {k: jax.device_put(v, dit_param_shardings(mesh, v))
                  for k, v in models.items()}

    lr_c = args.lr_critic if args.lr_critic is not None else args.lr
    if args.offload_opt:
        # per-LEAF streaming AdamW (utils/memory.host_adamw_*): moments
        # live in pinned host memory and only one leaf's moments ever
        # exist in HBM.  The earlier whole-tree recipe (stream the full
        # state inside one jitted step) was measured broken at 30L: XLA
        # issues every host->HBM copy-start up front, so the full
        # moments are resident again at the update point (PERF.md r4).
        from mmpl_tpu.utils.memory import host_adamw_init, host_adamw_update
        opt_g = host_adamw_init(models["generator"])
        opt_c = host_adamw_init({k: models[k] for k in critic_keys})
        print("optimizer states + EMA shadow: pinned_host "
              "(per-leaf streaming AdamW)", file=sys.stderr)

        @jax.jit
        def _gen_grads(models, batch, rng):
            (loss, _), grads = jax.value_and_grad(
                lambda g: gen_loss({**models, "generator": g}, batch, rng),
                has_aux=True)(models["generator"])
            return loss, grads

        @jax.jit
        def _critic_grads(models, batch, rng):
            cparams = {k: models[k] for k in critic_keys}
            (loss, _), grads = jax.value_and_grad(
                lambda c: critic_loss({**models, **c}, batch, rng),
                has_aux=True)(cparams)
            return loss, grads

        def gen_step(models, opt_g, batch, rng):
            loss, grads = _gen_grads(models, batch, rng)
            float(loss)              # sync before the per-leaf updates
            new_g, opt_g = host_adamw_update(models["generator"], grads,
                                             opt_g, args.lr)
            return new_g, opt_g, loss

        def critic_step(models, opt_c, batch, rng):
            loss, grads = _critic_grads(models, batch, rng)
            float(loss)
            cparams = {k: models[k] for k in critic_keys}
            new_c, opt_c = host_adamw_update(cparams, grads, opt_c, lr_c)
            return new_c, opt_c, loss
    else:
        tx = optax.adamw(args.lr)
        tx_c = optax.adamw(lr_c)
        opt_g = tx.init(models["generator"])
        opt_c = tx_c.init({k: models[k] for k in critic_keys})

        @partial(jax.jit, donate_argnums=(1,))
        def gen_step(models, opt_g, batch, rng):
            (loss, _), grads = jax.value_and_grad(
                lambda g: gen_loss({**models, "generator": g}, batch, rng),
                has_aux=True)(models["generator"])
            upd, opt_g = tx.update(grads, opt_g, models["generator"])
            return optax.apply_updates(models["generator"], upd), opt_g, loss

        @partial(jax.jit, donate_argnums=(1,))
        def critic_step(models, opt_c, batch, rng):
            cparams = {k: models[k] for k in critic_keys}
            (loss, _), grads = jax.value_and_grad(
                lambda c: critic_loss({**models, **c}, batch, rng),
                has_aux=True)(cparams)
            upd, opt_c = tx_c.update(grads, opt_c, cparams)
            return optax.apply_updates(cparams, upd), opt_c, loss
    # generator EMA — the released checkpoints carry 'generator_ema'
    # (Wan_fps_inference_1gpu.py:66-68, configs/self_forcing_dmd.yaml ema)
    ema = EmaParams(models["generator"], decay=args.ema_decay,
                    offload=args.offload_opt)

    start_step = 0
    if args.resume:
        from mmpl_tpu.utils.train_state_io import restore_checkpoint
        st = restore_checkpoint(args.resume, {
            "models": models, "opt_g": opt_g, "opt_c": opt_c,
            "ema": ema.shadow, "step": jnp.asarray(0)})
        like = lambda v, r: jax.tree.map(
            lambda a, b: jax.device_put(a, b.sharding), v, r)
        models = like(st["models"], models)
        opt_g = like(st["opt_g"], opt_g)
        opt_c = like(st["opt_c"], opt_c)
        ema.shadow = like(st["ema"], ema.shadow)
        start_step = int(st["step"])
        print(f"resumed at step {start_step} <- {args.resume}",
              file=sys.stderr)

    rng = jax.random.PRNGKey(args.seed + 1)
    # host-side length sampler, seeded identically on every dp host (the
    # dist.broadcast analogue — self_forcing.sample_num_frames)
    len_rng = np.random.default_rng(args.seed + 2)
    for _ in range(start_step):           # replay the per-step rng draws
        rng = jax.random.split(rng, 5)[0]
        if max_F > F:
            sample_num_frames(len_rng, F, max_F, num_frame_per_block=nb,
                              independent_first_frame=iff)
    for step in range(start_step, args.steps):
        rng, k1, k2, k3, k4 = jax.random.split(rng, 5)
        F_roll = sample_num_frames(
            len_rng, F, max_F, num_frame_per_block=nb,
            independent_first_frame=iff) if max_F > F else F
        ctx = jax.random.normal(k1, (args.batch_size, cfg.text_len,
                                     cfg.text_dim))
        emb = dit.embed_text(models["generator"], ctx)
        batch = {
            "noise": jax.random.normal(k2, (args.batch_size, F_roll, 16,
                                            *lat_hw)),
            "ctx_kv": dit.precompute_context_kv(models["generator"], cfg,
                                                emb),
            "context": ctx,
            "uncond_context": jnp.zeros_like(ctx),
        }
        if args.objective == "gan":
            # real samples: dataset latents, or synthetic in smoke mode
            batch["real_latents"] = jax.random.normal(
                k4, (args.batch_size, F, 16, *lat_hw))
        if mesh is not None:
            dp = mesh.shape.get("dp", 1)
            batch = {k: jax.device_put(
                v, batch_sharding(mesh, v.ndim)
                if (isinstance(v, jnp.ndarray) and v.ndim >= 2
                    and v.shape[0] == args.batch_size
                    and args.batch_size % dp == 0) else replicate(mesh))
                for k, v in batch.items()}
        t0 = time.time()
        new_c, opt_c, closs = critic_step(models, opt_c, batch, k3)
        models.update(new_c)
        line = f"step {step}: critic={float(closs):.5f}"
        scalars = {"critic_loss": float(closs)}
        if (step + 1) % args.dfake_gen_update_ratio == 0:
            models["generator"], opt_g, gloss = gen_step(models, opt_g,
                                                         batch, k3)
            if step >= args.ema_start_step:
                ema.update(models["generator"])
            line += f" gen={float(gloss):.5f}"
            scalars["gen_loss"] = float(gloss)
        scalars["step_s"] = time.time() - t0
        metrics.log(step, **scalars)
        print(line + f" ({scalars['step_s']:.2f}s)", file=sys.stderr,
              flush=True)
        if args.ckpt_every and (step + 1) % args.ckpt_every == 0:
            from mmpl_tpu.utils.train_state_io import save_checkpoint
            save_checkpoint(os.path.join(args.ckpt_dir, f"step{step+1}"),
                            {"models": models, "opt_g": opt_g,
                             "opt_c": opt_c, "ema": ema.shadow,
                             "step": jnp.asarray(step + 1)})
    if args.export_pt:
        from mmpl_tpu.utils.train_state_io import export_generator_pt
        export_generator_pt(args.export_pt, models["generator"],
                            ema.shadow, cfg)
        print(f"exported {args.export_pt}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
