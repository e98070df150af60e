"""Few-step distilled pipeline: bf16 vs int8-auto block latency on chip.

The r4 bench gave the few-step AR path (the production-latency path,
reference pipeline/causal_inference.py:47-276) its first measured numbers:
steady p50 2.335 s per 3-frame block at 1.3B/480x832, bf16.  int8-auto is
promoted on the 50-step window (-6.9%); per-step the few-step path runs
the same DiT forward, so the same weight-HBM halving should show here —
this probe measures it (keep-or-extend evidence for quantize= on the
few-step CLI path).

Run: python tools/fewstep_int8_probe.py [frames=33] [variants=bf16,auto]
"""
import gc
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from mmpl_tpu.core.config import T2V_1_3B
from mmpl_tpu.models import dit
from mmpl_tpu.pipelines.causal_inference import CausalInferencePipeline
from mmpl_tpu.utils.compile_cache import enable_compilation_cache

def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def main() -> None:
    F = int(sys.argv[1]) if len(sys.argv) > 1 else 33
    variants = (sys.argv[2].split(",") if len(sys.argv) > 2
                else ["bf16", "auto"])
    enable_compilation_cache()
    cfg = T2V_1_3B
    B, C, H, W = 1, 16, 60, 104
    nb, cap = 3, 21
    print(f"devices: {jax.devices()}  F={F} variants={variants}",
          flush=True)
    noise = jax.random.normal(jax.random.PRNGKey(30), (B, F, C, H, W),
                              jnp.float32)
    cond = jax.random.normal(jax.random.PRNGKey(31),
                             (B, cfg.text_len, cfg.text_dim), jnp.float32)

    results = {}
    for variant in variants:
        params = dit.init_dit_params(jax.random.PRNGKey(0), cfg,
                                     jnp.bfloat16)
        pipe = CausalInferencePipeline(
            cfg, params, denoising_step_list=(1000, 750, 500, 250),
            num_frame_per_block=nb, max_attention_frames=cap,
            quantize=None if variant == "bf16" else variant,
            dtype=jnp.bfloat16)
        del params
        t0 = time.perf_counter()
        out = pipe.inference(noise, cond, rng=jax.random.PRNGKey(0))
        sync(out)
        w0 = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = pipe.inference(noise, cond, rng=jax.random.PRNGKey(1))
        sync(out)
        window_s = time.perf_counter() - t0
        out = pipe.inference(noise, cond, rng=jax.random.PRNGKey(2),
                             profile=True)
        sync(out)
        blocks = list(pipe.last_profile.blocks)
        steady = blocks[cap // nb:]
        results[variant] = {
            "window0_s": round(w0, 1), "window_s": round(window_s, 2),
            "frames_per_s": round(F / window_s, 4),
            "block_p50_steady_s": round(float(np.median(steady)), 3),
            "block_p50_warmup_s": round(float(np.median(
                blocks[:cap // nb])), 3),
        }
        print(f"{variant}: {results[variant]}", flush=True)
        del pipe, out
        gc.collect()

    os.makedirs("/root/repo/runs", exist_ok=True)
    path = "/root/repo/runs/fewstep_int8_probe.json"
    with open(path, "w") as f:
        json.dump({"date": time.strftime("%Y-%m-%d %H:%M"),
                   "geometry": {"B": B, "F": F, "latents": [H, W],
                                "nb": nb, "cap": cap},
                   "results": results}, f, indent=1)
    print(f"recorded -> {path}", flush=True)


if __name__ == "__main__":
    main()
