"""Causal-diffusion pipeline block probe on the real chip (1.3B, CFG).

The 21-slot batched-CFG KV cache is this pipeline's dominant HBM
resident (12.06 GB bf16) — with bf16 params (2.6 GB) it OOMs one v5e.
Knobs (VERDICT r3 item 2 follow-ups + the int8 cache):

  python tools/cd_probe.py MODE   with MODE in
    int8        int8 W8A8 params, bf16 cache   (the r3 baseline: 12.1 s)
    int8+qkv    int8 params AND int8 cache
    bf16+qkv    bf16 params, int8 cache        (fits only with the cache halved)

Runs 2 blocks (3 frames each, 50 segmented UniPC steps per block) and
reports per-block wall-clock; run each mode in its own process.
"""

import os
import sys
import time

os.environ.setdefault("MMPL_STEPS_PER_PROGRAM", "10")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from mmpl_tpu.core.config import WAN_CONFIGS                     # noqa: E402
from mmpl_tpu.models import dit                                  # noqa: E402
from mmpl_tpu.pipelines.causal_diffusion_inference import (      # noqa: E402
    CausalDiffusionInferencePipeline)
from mmpl_tpu.utils.compile_cache import enable_compilation_cache    # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(mode: str):
    enable_compilation_cache()
    quantize = "int8" if mode.startswith("int8") else None
    quantize_cache = mode.endswith("+qkv")
    log(f"backend={jax.default_backend()} quantize={quantize} "
        f"quantize_cache={quantize_cache}")

    cfg = WAN_CONFIGS["t2v-1.3B"]
    params = dit.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    pipe = CausalDiffusionInferencePipeline(
        cfg, params, sampling_steps=50, guidance_scale=5.0,
        num_frame_per_block=3, quantize=quantize,
        quantize_cache=quantize_cache)
    del params

    F = 6                                     # 2 blocks
    noise = jax.random.normal(jax.random.PRNGKey(1), (1, F, 16, 60, 104))
    cond = jax.random.normal(jax.random.PRNGKey(2),
                             (1, cfg.text_len, cfg.text_dim))
    uncond = jax.random.normal(jax.random.PRNGKey(3),
                               (1, cfg.text_len, cfg.text_dim))

    t0 = time.perf_counter()
    out = pipe.inference(noise, cond, uncond)
    total = time.perf_counter() - t0
    arr = np.asarray(out)
    log(f"2 blocks in {total:.1f}s (incl. compile); "
        f"finite={np.isfinite(arr).all()} shape={arr.shape}")

    # warm re-run (programs cached): per-block steady-state
    t0 = time.perf_counter()
    out = pipe.inference(noise, cond, uncond)
    float(jnp.sum(out))
    warm = time.perf_counter() - t0
    log(f"warm 2 blocks: {warm:.1f}s = {warm / 2:.1f} s/block")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "int8")
