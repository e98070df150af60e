#!/usr/bin/env python
"""Chunk-parallel long-video generation across TPU devices.

Equivalent of the reference's multi-GPU drivers
(`Wan_fps_inference_parallel_4gpu_{20s,30s,5-60s}.py`): N chunks pipelined
over the available devices (round-robin reuse beyond the device count, the
5-60s pattern), anchors handed device-to-device instead of through
`latents_chunk*.pt` files.  Smoke mode runs with random weights.

  python generate_parallel.py --num-chunks 4 --model smoke --output-dir out/
"""

import argparse
import os
import sys
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="smoke",
                   choices=["t2v-14B", "t2v-1.3B", "smoke"])
    p.add_argument("--prompt", default="a red panda climbing a tree")
    p.add_argument("--num-chunks", type=int, default=4,
                   help="number of 5s chunks (4=20s ... 12=60s)")
    p.add_argument("--checkpoint-path", default=None)
    p.add_argument("--wan-dir", default=None)
    p.add_argument("--sampling-steps", type=int, default=50)
    p.add_argument("--guidance-scale", type=float, default=5.0)
    p.add_argument("--timestep-shift", type=float, default=8.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--quantize", default=None, choices=["int8", "int8wo", "auto"],
                   help="int8 projection gemms per stage (ops/quant.py)")
    p.add_argument("--quantize-cache", action="store_true",
                   help="int8 KV cache per stage (halves cache HBM)")
    p.add_argument("--output-dir", default="videos/parallel_fps")
    p.add_argument("--coordinator", default=None,
                   help="multi-host coordinator host:port "
                        "(jax.distributed init; see parallel/mesh.py)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--config", default=None,
                   help="YAML run config (reference OmegaConf style): "
                        "merges model_name / timestep_shift / "
                        "guidance_scale over flag defaults")
    args = p.parse_args(argv)
    if args.config:
        from mmpl_tpu.core.config import load_config
        default = os.path.join(os.path.dirname(args.config),
                               "default_config.yaml")
        run_cfg = load_config(args.config,
                              default if os.path.exists(default) else None)
        if args.model != "smoke":      # explicit smoke wins over config
            args.model = run_cfg.get("model_name", args.model)
        args.timestep_shift = run_cfg.get("timestep_shift",
                                          args.timestep_shift)
        args.guidance_scale = run_cfg.get("guidance_scale",
                                          args.guidance_scale)
    if not 1 <= args.num_chunks <= 12:
        print("error: --num-chunks must be in [1, 12] "
              "(Wan_fps_inference_parallel_4gpu_5-60s.py:276-394)",
              file=sys.stderr)
        return 2

    import jax
    from mmpl_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    from mmpl_tpu.parallel.mesh import init_distributed
    if init_distributed(args.coordinator, args.num_processes,
                        args.process_id):
        print(f"distributed: process {jax.process_index()}/"
              f"{jax.process_count()}, {len(jax.devices())} global devices",
              file=sys.stderr)
    import jax.numpy as jnp
    from mmpl_tpu.core.config import WAN_CONFIGS, tiny_test_config
    from mmpl_tpu.models import dit, vae
    from mmpl_tpu.parallel.chunk_pipeline import ChunkParallelPipeline
    from mmpl_tpu.utils.video_io import write_video

    smoke = args.model == "smoke" or args.checkpoint_path is None
    if smoke:
        cfg = tiny_test_config()
        lat_h = lat_w = 8
        steps = min(args.sampling_steps, 4)
        params = dit.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.float32)
        vae_params = vae.init_vae_params(jax.random.PRNGKey(1))
        cond = jax.random.normal(jax.random.PRNGKey(2),
                                 (1, cfg.text_len, cfg.text_dim))
        uncond = jax.random.normal(jax.random.PRNGKey(3),
                                   (1, cfg.text_len, cfg.text_dim))
        dtype = jnp.float32
    else:
        from mmpl_tpu.models.t5 import UMT5_XXL
        from mmpl_tpu.utils import checkpoint as ckpt
        from mmpl_tpu.utils.tokenizer import WanTextEncoder
        cfg = WAN_CONFIGS[args.model]
        lat_h, lat_w = 60, 104
        steps = args.sampling_steps
        params = ckpt.load_mmpl_generator(args.checkpoint_path, cfg)
        vae_params = ckpt.load_vae(
            os.path.join(args.wan_dir, cfg.vae_checkpoint))
        t5 = ckpt.load_t5(os.path.join(args.wan_dir, cfg.t5_checkpoint),
                          UMT5_XXL)
        enc = WanTextEncoder(t5, UMT5_XXL,
                             os.path.join(args.wan_dir, "google/umt5-xxl"))
        cond = enc([args.prompt])["prompt_embeds"]
        uncond = enc([cfg.sample_neg_prompt])["prompt_embeds"]
        dtype = jnp.bfloat16

    devices = jax.devices()
    print(f"{len(devices)} device(s); {args.num_chunks} chunks "
          f"(round-robin reuse beyond {len(devices)})", file=sys.stderr)
    pipe = ChunkParallelPipeline(
        cfg, params, vae_params, devices=devices,
        sampling_steps=steps, guidance_scale=args.guidance_scale,
        timestep_shift=args.timestep_shift, quantize=args.quantize,
        quantize_cache=args.quantize_cache, dtype=dtype)

    rng = jax.random.PRNGKey(args.seed)
    noises = [jax.random.normal(jax.random.fold_in(rng, i),
                                (1, 21, 16, lat_h, lat_w))
              for i in range(args.num_chunks)]
    t0 = time.time()
    chunks = pipe.generate(noises, cond, uncond, rng=rng)
    vids = pipe.decode_chunks(chunks, uint8=True)
    os.makedirs(args.output_dir, exist_ok=True)
    for i, v in enumerate(vids):
        # display-ready uint8 NTHWC straight off the producing device
        frames = np.asarray(v[0])
        out = os.path.join(args.output_dir,
                           f"{args.prompt[:60]}-chunk{i + 1}.mp4")
        path = write_video(out, frames, fps=16)
        print(f"chunk {i + 1}: {path} ({frames.shape[0]} frames)",
              file=sys.stderr)
    dt = time.time() - t0
    secs = args.num_chunks * 5
    print(f"generated ~{secs}s of video in {dt:.1f}s wall-clock",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
