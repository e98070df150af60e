"""Bidirectional-diffusion (teacher-path) full-window probe on the chip.

1.3B, 21-frame window = 32760 tokens of FULL self-attention, batched CFG,
50 UniPC steps.  A single 50-step program would run ~4-5 min — far past
this image's ~70 s worker watchdog — so this exercises the segmented
path (MMPL_STEPS_PER_PROGRAM).  Run:

  python tools/bidir_probe.py [frames] [steps]
"""

import os
import sys
import time

os.environ.setdefault("MMPL_STEPS_PER_PROGRAM", "8")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from mmpl_tpu.core.config import WAN_CONFIGS                     # noqa: E402
from mmpl_tpu.models import dit                                  # noqa: E402
from mmpl_tpu.pipelines.bidirectional_inference import (         # noqa: E402
    BidirectionalDiffusionInferencePipeline)
from mmpl_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(F: int, steps: int):
    enable_compilation_cache()
    log(f"frames={F} steps={steps} "
        f"spp={os.environ['MMPL_STEPS_PER_PROGRAM']}")
    cfg = WAN_CONFIGS["t2v-1.3B"]
    params = dit.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    pipe = BidirectionalDiffusionInferencePipeline(
        cfg, params, sampling_steps=steps, guidance_scale=5.0)
    del params

    noise = jax.random.normal(jax.random.PRNGKey(1), (1, F, 16, 60, 104))
    cond = jax.random.normal(jax.random.PRNGKey(2),
                             (1, cfg.text_len, cfg.text_dim))
    uncond = jax.random.normal(jax.random.PRNGKey(3),
                               (1, cfg.text_len, cfg.text_dim))

    t0 = time.perf_counter()
    out = pipe.inference(noise, cond, uncond)
    arr = np.asarray(out)
    total = time.perf_counter() - t0
    log(f"window (incl. compile): {total:.1f}s  "
        f"{total / steps:.2f} s/step-amortised  "
        f"finite={np.isfinite(arr).all()} shape={arr.shape}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 21,
         int(sys.argv[2]) if len(sys.argv) > 2 else 50)
