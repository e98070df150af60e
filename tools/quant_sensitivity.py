"""Per-projection int8 sensitivity audit for the quantized DiT.

For each quantizable projection (self_attn.qkv/o, cross_attn.q/o,
ffn.fc1/fc2) quantize ONLY that target and measure the full-forward
output error vs fp32 — the attribution that decides which projections
(if any) fall back to bf16 when real Wan checkpoints are validated
(PERF.md int8 quality plan; the reference calibrates its TRT engine the
same way, vae_torch2trt.py:139).

Run: python tools/quant_sensitivity.py [--model smoke|t2v-1.3B]
(1.3B on the chip; smoke anywhere).  Also audits the int8 KV cache and
the all-targets W8A8/W8A16 combinations.
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax                                   # noqa: E402

if "--cpu" in sys.argv:                      # before first backend use
    sys.argv.remove("--cpu")
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp                      # noqa: E402

from mmpl_tpu.core.config import WAN_CONFIGS, tiny_test_config  # noqa: E402
from mmpl_tpu.models import dit              # noqa: E402

TARGETS = ("self_attn.qkv", "self_attn.o", "cross_attn.q", "cross_attn.o",
           "ffn.fc1", "ffn.fc2")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="smoke")
    ap.add_argument("--frames", type=int, default=3)
    args = ap.parse_args()

    cfg = (tiny_test_config() if args.model == "smoke"
           else WAN_CONFIGS[args.model])
    dtype = jnp.float32 if args.model == "smoke" else jnp.bfloat16
    params = dit.init_dit_params(jax.random.PRNGKey(0), cfg, dtype)
    # the Wan head is zero-init: randomize so output error propagates
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))
    from helpers import randomize_head
    params = randomize_head(params)
    fused = dit.fuse_qkv_params(params, num_heads=cfg.num_heads)

    F = args.frames
    hw = 4 if args.model == "smoke" else 60
    ww = 4 if args.model == "smoke" else 104
    x = jax.random.normal(jax.random.PRNGKey(6), (1, F, 16, hw, ww), dtype)
    t = jnp.full((1, F), 500.0)
    ctx = jax.random.normal(jax.random.PRNGKey(7),
                            (1, cfg.text_len, cfg.text_dim), dtype)

    fwd = jax.jit(lambda p: dit.dit_forward(p, cfg, x, t, ctx))
    ref = np.asarray(fwd(fused)).astype(np.float64)
    nrm = np.linalg.norm(ref)

    def err(p):
        got = np.asarray(fwd(p)).astype(np.float64)
        return np.linalg.norm(got - ref) / nrm

    log(f"model={cfg.name}  ({F} frames, {hw}x{ww} latent)")
    log(f"{'target':22s} {'W8A8 rel':>10s} {'W8A16 rel':>10s}")
    rows = []
    for tgt in TARGETS:
        e8 = err(dit.quantize_params(fused, targets=(tgt,)))
        ew = err(dit.quantize_params(fused, targets=(tgt,),
                                     weight_only=True))
        rows.append((tgt, e8, ew))
        log(f"{tgt:22s} {e8:10.4f} {ew:10.4f}")
    log("-" * 44)
    log(f"{'ALL (pipeline int8)':22s} {err(dit.quantize_params(fused)):10.4f}"
        f" {err(dit.quantize_params(fused, weight_only=True)):10.4f}")
    worst = max(rows, key=lambda r: r[1])
    log(f"most sensitive target: {worst[0]} (rel {worst[1]:.4f}) — "
        f"first candidate for a bf16 fallback via quantize_params(targets=)")


if __name__ == "__main__":
    main()
