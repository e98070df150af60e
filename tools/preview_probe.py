"""Measure TaehvPreviewer per-block cost on the real chip at 1.3B geometry.

The r4 bench measured the live-preview marginal cost at +21.45 s per
3-frame block (BENCH fewstep_preview_overhead_s) — pathological, because
the previewer transferred f32 NTCHW frames over the tunneled link
(~57 MB/block) and cast/transposed them on the 1-core host.  The fix
moves clip->uint8->NTHWC onto the device (utils/preview.py); this probe
times the fixed previewer standalone: first block (compile), then warm
blocks, at the exact latent shape the few-step pipeline hands it.

Usage: python tools/preview_probe.py [n_blocks=8]
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from mmpl_tpu.models import taehv
from mmpl_tpu.utils.preview import TaehvPreviewer


def main() -> None:
    n_blocks = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    B, nb, C, h, w = 1, 3, 16, 60, 104          # 1.3B @ 480x832
    print(f"devices: {jax.devices()}")
    params = taehv.init_taehv_params(jax.random.PRNGKey(0), jnp.float32)
    prev = TaehvPreviewer(params)

    blocks = [jax.random.normal(jax.random.PRNGKey(i), (B, nb, C, h, w),
                                jnp.float32) for i in range(n_blocks)]
    # device-resident inputs (as in the pipeline: latents live on device)
    blocks = [jax.device_put(b) for b in blocks]
    jax.block_until_ready(blocks[-1])

    t0 = time.perf_counter()
    f0 = prev(blocks[0])
    t_first = time.perf_counter() - t0
    print(f"block0 (compile+run): {t_first:.2f}s  frames {f0.shape} "
          f"{f0.dtype}  ({f0.nbytes / 1e6:.1f} MB transferred)")

    warm = []
    for i in range(1, n_blocks):
        t0 = time.perf_counter()
        fi = prev(blocks[i])
        warm.append(time.perf_counter() - t0)
    print(f"warm per-block: p50 {np.median(warm) * 1e3:.0f} ms  "
          f"min {min(warm) * 1e3:.0f} ms  max {max(warm) * 1e3:.0f} ms")
    print(json.dumps({"probe": "preview_block",
                      "block0_s": round(t_first, 3),
                      "warm_p50_s": round(float(np.median(warm)), 3),
                      "warm_n": len(warm),
                      "frame_bytes_mb": round(fi.nbytes / 1e6, 1)}))


if __name__ == "__main__":
    main()
