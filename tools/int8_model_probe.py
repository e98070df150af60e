"""In-model int8 measurement: one 1.3B group-1 denoise-step forward,
bf16 vs int8-quantized projections, dispatch-amortised (K dependent steps
inside one program — the same structure as the solver scan).

Run each mode in its own process (both pytrees + the CFG cache would
crowd 16 GB):  python tools/int8_model_probe.py bf16|int8|int8wo
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(mode: str):
    from mmpl_tpu.core.config import T2V_1_3B as cfg
    from mmpl_tpu.core.geometry import t2v_plan
    from mmpl_tpu.models import dit
    from mmpl_tpu.models.fps_dit import fps_forward_group, init_kv_cache

    B, C, H, W = 2, 16, 60, 104        # batched CFG pair, 480x832
    S = (H // 2) * (W // 2)
    dtype = jnp.bfloat16
    plan = t2v_plan()
    group = plan.groups[1]             # 7-frame anchor group
    G = group.num_frames

    params = dit.init_dit_params(jax.random.PRNGKey(0), cfg, dtype)
    params = dit.fuse_qkv_params(params, num_heads=cfg.num_heads)
    if mode in ("int8", "int8wo"):
        params = dit.quantize_params(params,
                                     weight_only=(mode == "int8wo"))
        params = jax.device_put(params)    # drop the bf16 originals
    ctx = jax.random.normal(jax.random.PRNGKey(1),
                            (B, cfg.text_len, cfg.text_dim), dtype)
    emb = dit.embed_text(params, ctx)
    ctx_kv = dit.precompute_context_kv(params, cfg, emb)
    cache = init_kv_cache(cfg, B, S, dtype=dtype)
    lat = jax.random.normal(jax.random.PRNGKey(2), (B, G, C, H, W), dtype)
    t = jnp.full((B, G), 500.0, jnp.float32)

    K = 10

    @jax.jit
    def chain(params, lat, t, ctx_kv, cache):
        def body(lat, _):
            flow, _ = fps_forward_group(params, cfg, lat, t, ctx_kv,
                                        cache, group)
            return flow.astype(dtype)[:, :, :C], None
        out, _ = jax.lax.scan(body, lat, None, length=K)
        return out

    out = chain(params, lat, t, ctx_kv, cache)
    float(jnp.sum(out.astype(jnp.float32)))          # compile + sync
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = chain(params, lat, t, ctx_kv, cache)
        float(jnp.sum(out.astype(jnp.float32)))
        times.append((time.perf_counter() - t0) / K)
    step = float(np.median(times))
    log(f"{mode}: group1 fwd step (B=2 CFG, {K}-step chain) = "
        f"{step*1e3:.1f} ms")
    print(step)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "bf16")
