"""CLI driver: rolling long-video T2V/I2V generation.

Re-design of `MMPL_t2v/Wan_fps_inference_1gpu.py` (+ the bash entry points):
`--duration` windows are generated sequentially, bridged through the causal
pixel re-encode (…_1gpu.py:160-205), and written as mp4 @16fps.  With
`--checkpoint-dir` absent it runs in smoke mode (random weights, synthetic
text embeddings) so the full pipeline can be driven end-to-end on any chip
without the 14B/1.3B weight bundle.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="mmpl_tpu video generation")
    p.add_argument("--config", default=None, help="run-config yaml")
    p.add_argument("--model", default="t2v-1.3B",
                   choices=["t2v-14B", "t2v-1.3B", "i2v-14B", "smoke"],
                   help="model config ('smoke' = tiny random-weight)")
    p.add_argument("--prompt", default="a cat surfing a wave at sunset")
    p.add_argument("--negative-prompt", default=None)
    p.add_argument("--image", default=None,
                   help="conditioning image (file path) -> i2v plan: the "
                        "image is VAE-encoded as the first latent frame")
    p.add_argument("--checkpoint-path", default=None,
                   help="MMPL generator .pt (t2v_14B_8k.pt style)")
    p.add_argument("--wan-dir", default=None,
                   help="Wan2.1 base dir (T5/VAE/DiT weights)")
    p.add_argument("--use-ema", action="store_true")
    p.add_argument("--duration", type=int, default=1,
                   help="number of 21-frame windows (~5s each)")
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=832)
    p.add_argument("--sampling-steps", type=int, default=50)
    p.add_argument("--guidance-scale", type=float, default=5.0)
    p.add_argument("--timestep-shift", type=float, default=8.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--output", default="output.mp4")
    p.add_argument("--save-latents", default=None)
    p.add_argument("--quantize", default=None, choices=["int8", "int8wo", "auto"],
                   help="int8 projection gemms (ops/quant.py): int8=W8A8 "
                        "(~-7%% step time measured on v5e, PERF.md), "
                        "int8wo=weight-only W8A16 (better numerics, "
                        "memory-bound wins only)")
    p.add_argument("--quantize-cache", action="store_true",
                   help="int8 KV cache with per-token scales (halves the "
                        "dominant HBM resident of the 50-step CFG "
                        "pipelines; models/fps_dit.init_kv_cache)")
    p.add_argument("--quantize-vae", action="store_true",
                   help="int8 W8A8 VAE decoder convs (the reference's "
                        "TensorRT int8 VAE engine analogue, "
                        "vae_torch2trt.py; models/vae."
                        "quantize_vae_decoder) — keep-or-revert numbers "
                        "in tools/vae_decode_probe.py / PERF.md")
    p.add_argument("--mesh", default=None,
                   help="multi-chip mesh 'dp=A,fsdp=B,tp=C' (sizes "
                        "multiply to #devices) — shards params/KV cache/"
                        "batch through either pipeline (the 14B path)")
    p.add_argument("--profile", action="store_true",
                   help="per-phase timing report (init / per-block "
                        "diffusion / VAE), reference causal_inference.py"
                        ":237-271 format; few-step pipeline only")
    p.add_argument("--preview", default=None, metavar="PATH",
                   help="write a fast TAEHV preview video, decoded "
                        "block-by-block DURING generation (few-step "
                        "pipeline; utils/preview.py)")
    p.add_argument("--taehv-path", default=None,
                   help="taew2_1.pth weights for --preview (random "
                        "weights in smoke mode when absent)")
    return p.parse_args(argv)


def main(argv=None):
    # tunneled-TPU worker watchdog workaround (see pipelines/fps_inference):
    # bound each solver program to ~10 steps; bit-identical to one program
    os.environ.setdefault("MMPL_STEPS_PER_PROGRAM", "10")
    args = parse_args(argv)
    if args.duration < 1:
        print("error: --duration must be >= 1", file=sys.stderr)
        return 2
    import jax
    from .utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp
    from .core.config import WAN_CONFIGS, tiny_test_config
    from .core.geometry import i2v_plan
    from .models import dit, vae
    from .pipelines.fps_inference import CausalFPSInferencePipeline

    # run-config merge + pipeline selection by `denoising_step_list`
    # presence (Wan_fps_inference_1gpu.py:54-64)
    run_cfg = {}
    if args.config:
        from .core.config import load_config
        default = os.path.join(os.path.dirname(args.config),
                               "default_config.yaml")
        run_cfg = load_config(args.config,
                              default if os.path.exists(default) else None)
        if args.model != "smoke":      # explicit smoke wins over the config
            args.model = run_cfg.get("model_name", args.model)
        args.timestep_shift = run_cfg.get("timestep_shift",
                                          args.timestep_shift)
        args.guidance_scale = run_cfg.get("guidance_scale",
                                          args.guidance_scale)
        if run_cfg.get("negative_prompt") and not args.negative_prompt:
            args.negative_prompt = run_cfg["negative_prompt"]
    denoising_step_list = run_cfg.get("denoising_step_list")

    smoke = args.model == "smoke" or args.checkpoint_path is None
    if args.model == "smoke":
        cfg = tiny_test_config()
        H = W = 64                      # pixels
    else:
        cfg = WAN_CONFIGS[args.model]
        H, W = args.height, args.width
    lat_h, lat_w = H // 8, W // 8

    key = jax.random.PRNGKey(args.seed)
    t0 = time.time()
    if smoke:
        print(f"[smoke mode] random weights, config={cfg.name}",
              file=sys.stderr)
        params = dit.init_dit_params(key, cfg, jnp.bfloat16)
        vae_params = vae.init_vae_params(jax.random.PRNGKey(1), jnp.float32)
        text_encoder = None
    else:
        from .utils import checkpoint as ckpt
        from .utils.tokenizer import WanTextEncoder
        from .models.t5 import UMT5_XXL
        params = ckpt.load_mmpl_generator(args.checkpoint_path, cfg,
                                          use_ema=args.use_ema,
                                          dtype=np.float32)
        params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, params)
        vae_params = ckpt.load_vae(
            os.path.join(args.wan_dir, cfg.vae_checkpoint))
        t5_params = ckpt.load_t5(
            os.path.join(args.wan_dir, cfg.t5_checkpoint), UMT5_XXL)
        text_encoder = WanTextEncoder(
            t5_params, UMT5_XXL,
            os.path.join(args.wan_dir, "google/umt5-xxl"))
    if args.quantize_vae:
        vae_params = vae.quantize_vae_decoder(vae_params)
    print(f"model init: {time.time()-t0:.1f}s", file=sys.stderr)

    if text_encoder is not None:
        cond = text_encoder([args.prompt])["prompt_embeds"]
        neg = args.negative_prompt or cfg.sample_neg_prompt
        uncond = text_encoder([neg])["prompt_embeds"]
    else:
        cond = jax.random.normal(jax.random.PRNGKey(2),
                                 (1, cfg.text_len, cfg.text_dim))
        uncond = jax.random.normal(jax.random.PRNGKey(3),
                                   (1, cfg.text_len, cfg.text_dim))

    mesh = None
    if args.mesh:
        # multi-chip single-program inference (the 14B path): params
        # (fsdp, tp)-sharded, KV cache created sharded, batch over dp
        from .parallel.mesh import make_mesh
        shape = {k: int(v) for k, v in
                 (kv.split("=") for kv in args.mesh.split(","))}
        mesh = make_mesh(shape)
        print(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}",
              file=sys.stderr)

    if denoising_step_list:
        # few-step distilled pipeline (no CFG)
        from .pipelines.causal_inference import CausalInferencePipeline
        pipe = CausalInferencePipeline(
            cfg, params, denoising_step_list=denoising_step_list,
            num_frame_per_block=int(run_cfg.get("num_frame_per_block", 3)),
            context_noise=int(run_cfg.get("context_noise", 0)),
            timestep_shift=args.timestep_shift,
            warp_denoising_step=bool(run_cfg.get("warp_denoising_step",
                                                 False)),
            independent_first_frame=bool(
                run_cfg.get("independent_first_frame", False)),
            quantize=args.quantize,
            quantize_cache=args.quantize_cache,
            mesh=mesh,
            dtype=jnp.bfloat16 if not smoke else jnp.float32)
    else:
        pipe = CausalFPSInferencePipeline(
            cfg, params, plan=i2v_plan() if args.image else None,
            sampling_steps=args.sampling_steps,
            timestep_shift=args.timestep_shift,
            guidance_scale=args.guidance_scale,
            quantize=args.quantize,
            quantize_cache=args.quantize_cache,
            mesh=mesh,
            dtype=jnp.bfloat16 if not smoke else jnp.float32)

    previewer = None
    preview_frames = []
    if args.preview:
        if not denoising_step_list:
            print("--preview requires the few-step pipeline "
                  "(a config with denoising_step_list)", file=sys.stderr)
            return 2
        from .models.taehv import convert_taehv, init_taehv_params
        from .utils.preview import TaehvPreviewer
        if args.taehv_path:
            from .utils.checkpoint import load_torch_state_dict
            taehv_params = convert_taehv(
                load_torch_state_dict(args.taehv_path))
        else:
            taehv_params = init_taehv_params(jax.random.PRNGKey(7))
            print("[preview] no --taehv-path: random TAEHV weights",
                  file=sys.stderr)
        previewer = TaehvPreviewer(taehv_params)

        def on_block(start_frame, latents_block):
            t0 = time.time()
            frames = previewer(latents_block)[0]       # [T, H, W, 3] u8
            preview_frames.append(frames)
            print(f"[preview] frames {start_frame}..: {frames.shape[0]} "
                  f"px frames in {time.time()-t0:.2f}s", file=sys.stderr)
    else:
        on_block = None

    rng = jax.random.PRNGKey(args.seed + 100)
    videos = []
    decode_fn = jax.jit(vae.decode_to_frames)
    initial_latent = None
    if args.image:
        # i2v: VAE-encode the image as the first committed latent frame
        # (MMPL_i2v server path, fastapi_parallel_i2v_server.py:740-747)
        from .utils.media import load_image
        img = load_image(args.image, H, W)
        initial_latent = vae.encode(
            vae_params, jnp.asarray(img)[None, None])   # [1, 1, 16, h, w]
    all_latents = []
    # JAX dispatch is async: enqueue every window's denoise->decode->bridge
    # chain first and fetch the big uint8 frame buffers LAST, so the ~97 MB
    # per-window host transfer over the tunneled link overlaps the next
    # window's device compute instead of stalling the dispatch thread.
    # --profile keeps the per-window sync (real phase timings need it).
    sync_each = bool(args.profile or args.save_latents)
    pending = []                             # device-resident uint8 frames
    for win in range(args.duration):
        rng, kn, ki = jax.random.split(rng, 3)
        noise = jax.random.normal(kn, (1, 21, 16, lat_h, lat_w))
        t0 = time.time()
        if denoising_step_list:
            n_init = 0 if initial_latent is None else initial_latent.shape[1]
            nb = int(run_cfg.get("num_frame_per_block", 3))
            F_new = ((21 - n_init) // nb) * nb
            latents = pipe.inference(noise[:, :F_new], cond,
                                     initial_latent=initial_latent, rng=ki,
                                     profile=args.profile,
                                     on_block=on_block)
        else:
            latents = pipe.inference(noise, cond, uncond,
                                     initial_latent=initial_latent, rng=ki)
        if sync_each:
            latents_np = np.asarray(latents)
            all_latents.append(latents_np)
            print(f"window {win}: denoise {time.time()-t0:.1f}s",
                  file=sys.stderr)
        else:
            print(f"window {win}: denoise enqueued {time.time()-t0:.1f}s",
                  file=sys.stderr)

        t0 = time.time()
        # bf16 decode + clip/uint8/NTHWC on device: only the uint8 buffer
        # crosses the tunneled link (vae.decode_to_frames docstring)
        frames_u8, tail = decode_fn(vae_params, latents)
        if sync_each:
            frames_u8 = np.asarray(frames_u8)    # [B, T, H, W, 3] uint8
            print(f"window {win}: vae decode {time.time()-t0:.1f}s",
                  file=sys.stderr)
        if args.profile and getattr(pipe, "last_profile", None):
            # complete the reference-format report with the VAE phase
            pipe.last_profile.phases["VAE decoding"] = time.time() - t0
            pipe.last_profile.report()
        pending.append(frames_u8)

        # rolling bridge (…_1gpu.py:160-205): re-encode the last 5 pixel
        # frames of this window as the next window's 2 context latents
        # (tail is the device-resident f32 [-1,1] suffix — full precision,
        # no host round-trip)
        if win + 1 < args.duration:
            initial_latent = vae.encode(vae_params, tail)[:, :2]

        if not sync_each and len(pending) >= 2:
            # fetch the PREVIOUS window's frames now that this window's
            # work is enqueued: the transfer overlaps the queued device
            # compute, and HBM holds at most two ~97MB uint8 frame
            # buffers instead of one per window (unbounded growth in
            # --duration would OOM the 16GB v5e on long runs)
            pending[-2] = np.asarray(pending[-2])

    for win, frames_u8 in enumerate(pending):
        frames_u8 = np.asarray(frames_u8)        # host fetch (no-op if done)
        if win > 0:
            # trim the bridged overlap: (2-1)*4+1 = 5 pixel frames
            frames_u8 = frames_u8[:, 5:]
        videos.append(frames_u8)

    if previewer is not None and preview_frames:
        from .utils.video_io import write_video
        ppath = write_video(args.preview,
                            np.concatenate(preview_frames, axis=0), fps=16)
        print(f"wrote preview {ppath}", file=sys.stderr)

    full = np.concatenate(videos, axis=1)    # [B, T, H, W, 3] uint8
    if args.save_latents:
        np.save(args.save_latents, np.stack(all_latents, axis=1))
    frames = full[0]
    from .utils.video_io import write_video
    path = write_video(args.output, frames, fps=16)
    print(f"wrote {path}: {frames.shape[0]} frames "
          f"{frames.shape[2]}x{frames.shape[1]} @16fps", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
