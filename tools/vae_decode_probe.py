"""VAE decode acceleration probe: f32 vs bf16 vs int8 on the real chip.

The reference's production VAE decoder is a TensorRT int8 engine
(demo_utils/vae_torch2trt.py + demo_utils/vae.py:318-389).  Our decode is
XLA; the candidate levers at the canonical 21-latent-frame 480x832 window:

  f32   — the r1-r3 bench baseline (params + activations f32)
  bf16  — params + latents bf16: halves every activation HBM transfer
          (the decode is memory-bound: big activations, tiny weights)
  int8  — quantize_vae_decoder W8A8 convs (per-tensor dynamic act scales)

Reports wall time (dispatch-amortised: one jitted program per variant,
median of N runs with a forced host transfer) and decode-space PSNR vs
the f32 reference on identical synthetic weights/latents — the
keep-or-revert evidence for VERDICT r3 item 7.

Run: python tools/vae_decode_probe.py [T] [runs]
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from mmpl_tpu.models import vae                                 # noqa: E402
from mmpl_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def psnr(a, b, peak=2.0):
    mse = float(np.mean((np.asarray(a, np.float32)
                         - np.asarray(b, np.float32)) ** 2))
    return 10.0 * np.log10(peak * peak / max(mse, 1e-12))


def main(T: int = 21, runs: int = 3):
    enable_compilation_cache()
    log(f"backend={jax.default_backend()} T={T}")
    H, W = 60, 104
    params = vae.init_vae_params(jax.random.PRNGKey(20), jnp.float32)
    z = jax.random.normal(jax.random.PRNGKey(1), (1, T, 16, H, W),
                          jnp.float32)

    dec = jax.jit(vae.decode_streaming)
    results = {}
    ref_pixels = None

    def variant(name, p, zz):
        nonlocal ref_pixels
        t0 = time.perf_counter()
        out = dec(p, zz)
        sync(out)
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(runs):
            t0 = time.perf_counter()
            out = dec(p, zz)
            sync(out)
            times.append(time.perf_counter() - t0)
        t = float(np.median(times))
        if name == "f32":
            ref_pixels = np.asarray(out, np.float32)
            q = None
        else:
            q = psnr(out, ref_pixels)
        log(f"{name}: {t:.2f}s (compile+run {compile_s:.1f}s)"
            + (f" psnr_vs_f32={q:.1f}dB" if q is not None else ""))
        results[name] = {"decode_s": round(t, 3),
                         "psnr_vs_f32_db": None if q is None
                         else round(q, 2)}
        del out

    variant("f32", params, z)
    p16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    variant("bf16", p16, z.astype(jnp.bfloat16))
    variant("int8", vae.quantize_vae_decoder(params), z)
    # int8 convs + bf16 activations between them (params dtype is
    # irrelevant: non-kernel leaves cast to x.dtype at use; the int8
    # dequant scales stay f32 inside the conv)
    variant("int8_bf16", vae.quantize_vae_decoder(params),
            z.astype(jnp.bfloat16))

    os.makedirs("/root/repo/runs", exist_ok=True)
    path = "/root/repo/runs/vae_decode_probe.json"
    with open(path, "w") as f:
        json.dump({"date": time.strftime("%Y-%m-%d %H:%M"),
                   "backend": jax.default_backend(),
                   "latent_frames": T, "runs": runs,
                   "variants": results}, f, indent=1)
    log(f"recorded -> {path}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 21,
         int(sys.argv[2]) if len(sys.argv) > 2 else 3)
