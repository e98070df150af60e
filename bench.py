"""Benchmark: MMPL window denoise throughput on one TPU chip.

Measures the hot path of the framework — the CausalFPS Wan DiT group
forward with planned KV cache and batched CFG — for the Wan 1.3B
configuration at the canonical 480x832 / 21-latent-frame window geometry,
and extrapolates one full window (4 chunk-groups x 50 UniPC steps x CFG pair
+ clean-KV commits, casual_fps_inference.py:250-403).

Prints ONE JSON line:
  {"metric": "latent_frames_per_sec_per_chip", "value": ..., "unit": "frames/s",
   "vs_baseline": ...}

vs_baseline: ratio of our measured per-chip throughput to an analytic
estimate of the reference stack on one H100 for the same model/workload
(dense-bf16 989 TFLOP/s at 45% achieved MFU — a generous flash-attn torch
estimate; the reference publishes no numbers, BASELINE.md).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def model_config(quick: bool):
    from mmpl_tpu.core.config import T2V_1_3B, DotDict, _SHARED
    if quick:
        return DotDict(_SHARED, name="bench-quick", model_type="t2v",
                       dim=384, ffn_dim=1024, num_heads=6, num_layers=4,
                       text_dim=512, text_len=64, freq_dim=64)
    return T2V_1_3B


def flops_per_group_forward(cfg, q_tokens: int, kv_tokens: int,
                            text_len: int = 512) -> float:
    """Analytic matmul FLOPs of one DiT forward over a group (batch 1)."""
    D, Ff, L = cfg.dim, cfg.ffn_dim, cfg.num_layers
    per_layer = (
        2 * q_tokens * D * D * 4          # self qkv + o
        + 2 * q_tokens * kv_tokens * D * 2  # scores + values
        + 2 * q_tokens * D * D * 2        # cross q + o
        + 2 * q_tokens * text_len * D * 2   # cross attn
        + 2 * q_tokens * D * Ff * 2       # ffn
    )
    return L * per_layer


def main():
    quick = os.environ.get("BENCH_QUICK", "0") == "1"
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))
    backend = jax.default_backend()
    log(f"backend={backend} devices={jax.devices()} quick={quick}")

    from mmpl_tpu.core.geometry import t2v_plan
    from mmpl_tpu.models import dit
    from mmpl_tpu.models.fps_dit import fps_forward_group, init_kv_cache

    cfg = model_config(quick)
    plan = t2v_plan()
    # model batch 1; CFG = 2 sequential forwards exactly like the reference
    # (casual_fps_inference.py:346-364) -> window cost uses 2x step time.
    # (A v5p-class chip fits the batched-pair layout; v5e 16GB does not.)
    B = 1
    CFG_FORWARDS = 2
    C, H, W = 16, 60, 104        # 480x832 latent geometry -> 1560 tok/frame
    if quick:
        H, W = 20, 20
    S = (H // 2) * (W // 2)
    dtype = jnp.bfloat16

    log(f"init {cfg.name}: dim={cfg.dim} layers={cfg.num_layers} "
        f"tokens/frame={S}")
    key = jax.random.PRNGKey(0)
    params = dit.init_dit_params(key, cfg, dtype)
    ctx = jax.random.normal(jax.random.PRNGKey(1),
                            (B, cfg.text_len, cfg.text_dim), dtype)
    emb = dit.embed_text(params, ctx)
    ctx_kv = dit.precompute_context_kv(params, cfg, emb)
    cache = init_kv_cache(cfg, B, S, dtype=dtype)

    group_times = {}
    total_flops = 0.0
    for group in plan.groups:
        G = group.num_frames
        lat = jax.random.normal(jax.random.PRNGKey(2 + group.index),
                                (B, G, C, H, W), dtype)
        t = jnp.full((B, G), 500.0, jnp.float32)

        # donate the KV cache so only one copy is ever live (the pipeline
        # threads the cache through the scan the same way)
        fwd = jax.jit(lambda p, l, tt, ck, ca, g=group:
                      fps_forward_group(p, cfg, l, tt, ck, ca, g),
                      donate_argnums=(4,))

        def run_once(cache):
            flow, cache = fwd(params, lat, t, ctx_kv, cache)
            # force full device->host sync (block_until_ready is unreliable
            # on the experimental axon platform)
            float(jnp.sum(flow.astype(jnp.float32)))
            return cache

        t0 = time.perf_counter()
        cache = run_once(cache)
        compile_s = time.perf_counter() - t0

        inner = 3
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            for _ in range(inner):
                cache = run_once(cache)
            times.append((time.perf_counter() - t0) / inner)
        step_s = float(np.median(times))
        group_times[group.index] = step_s
        kv_tok = (group.num_visible + (G if group.append_mode else 0)) * S
        total_flops += flops_per_group_forward(cfg, G * S, kv_tok)
        log(f"group{group.index}: frames={G} kv_frames={group.num_visible} "
            f"step={step_s*1e3:.1f}ms (compile {compile_s:.1f}s)")

    steps = 50
    window_s = CFG_FORWARDS * sum(steps * t for t in group_times.values())
    # clean-KV commit reruns: one extra forward pair per non-append group
    window_s += CFG_FORWARDS * sum(t for g, t in group_times.items()
                                   if not plan.groups[g].append_mode)
    frames_per_s = plan.num_frames / window_s

    achieved_tflops = (CFG_FORWARDS * total_flops * steps / window_s) / 1e12
    log(f"window={window_s:.1f}s  frames/s/chip={frames_per_s:.4f}  "
        f"achieved~{achieved_tflops:.1f} TFLOP/s")

    # analytic single-H100 reference estimate for the same workload
    h100_flops = 989e12 * 0.45
    ref_window_s = (CFG_FORWARDS * total_flops * steps) / h100_flops
    ref_frames_per_s = plan.num_frames / ref_window_s
    vs = frames_per_s / ref_frames_per_s

    print(json.dumps({
        "metric": "latent_frames_per_sec_per_chip",
        "value": round(frames_per_s, 4),
        "unit": "frames/s",
        "vs_baseline": round(vs, 4),
    }))


if __name__ == "__main__":
    main()
