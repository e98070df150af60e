"""Batch-2 FPS window probe: can one v5e denoise TWO videos at once?

With bf16 everywhere the B=2 window cannot fit (CFG-pair cache alone is
8.6 GB + 2.6 GB params + activations > 16 GB).  int8 params (1.4 GB) +
the int8 KV cache (4.3 GB for both videos' CFG pairs) change the
budget.  If it fits, per-chip THROUGHPUT (latent-frames/s/chip) scales
by 2x the window-time ratio — the serving-capacity lever.

Run: python tools/batch2_probe.py [B] [mode]
  mode: int8+qkv (default) | int8 | bf16
Measures one full 21-frame window (50-step UniPC, 4 plan groups).
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
from mmpl_tpu.pipelines.fps_inference import (                   # noqa: E402
    CausalFPSInferencePipeline)
from mmpl_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(B: int, mode: str):
    enable_compilation_cache()
    quantize = "int8" if mode.startswith("int8") else None
    quantize_cache = mode.endswith("+qkv")
    log(f"B={B} quantize={quantize} quantize_cache={quantize_cache}")

    cfg = WAN_CONFIGS["t2v-1.3B"]
    params = dit.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    pipe = CausalFPSInferencePipeline(
        cfg, params, sampling_steps=50, guidance_scale=5.0,
        quantize=quantize, quantize_cache=quantize_cache)
    del params

    noise = jax.random.normal(jax.random.PRNGKey(1),
                              (B, 21, 16, 60, 104))
    cond = jax.random.normal(jax.random.PRNGKey(2),
                             (B, cfg.text_len, cfg.text_dim))
    uncond = jax.random.normal(jax.random.PRNGKey(3),
                               (B, cfg.text_len, cfg.text_dim))

    t0 = time.perf_counter()
    out = pipe.inference(noise, cond, uncond, rng=jax.random.PRNGKey(4))
    arr = np.asarray(out)
    cold = time.perf_counter() - t0
    log(f"cold window (incl. compile): {cold:.1f}s finite="
        f"{np.isfinite(arr).all()} shape={arr.shape}")

    t0 = time.perf_counter()
    out = pipe.inference(noise, cond, uncond, rng=jax.random.PRNGKey(5))
    float(jnp.sum(out))
    warm = time.perf_counter() - t0
    tput = B * 21 / warm
    log(f"warm window: {warm:.1f}s -> throughput {tput:.4f} "
        f"latent-frames/s/chip (B={B})")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2,
         sys.argv[2] if len(sys.argv) > 2 else "int8+qkv")
