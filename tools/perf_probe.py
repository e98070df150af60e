"""Per-op perf probe on the real chip: locates the group-forward headroom.

Times, at the 1.3B group-1 (anchor) shape with batched CFG (B=2):
  1. raw matmul MFU ceiling for the layer's gemms,
  2. flash-attention block-size grid at the concat-KV shape,
  3. fps_forward_group baseline vs fused-QKV variant,
  4. elementwise/norm overhead (matmul-only synthetic layer vs full block).

Run: python tools/perf_probe.py [--quick]
"""

import argparse
import math
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

PEAK = 197e12  # v5e bf16


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(fn, *args, inner=5, repeats=3):
    fn(*args)                      # compile
    out = fn(*args)
    sync(out if not isinstance(out, tuple) else out[0])
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn(*args)
        sync(out if not isinstance(out, tuple) else out[0])
        times.append((time.perf_counter() - t0) / inner)
    return float(np.median(times))


def probe_matmuls(B, L, D, Ff, iters=30):
    """MFU ceiling of the layer's gemm shapes.  K dependent iterations run
    inside ONE program so the ~5-8ms per-dispatch tunnel overhead amortises
    away (single bare calls measure dispatch, not the MXU)."""
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, L, D), jnp.bfloat16)

    def chain(name, ws, fl_per_iter):
        def f(x, ws):
            def body(x, _):
                y = x
                for w in ws:
                    y = y @ w
                return y * 0.5 + x * 0.5, None
            return jax.lax.scan(body, x, None, length=iters)[0]
        dt = timeit(jax.jit(f), x, ws, inner=2) / iters
        fl = fl_per_iter
        log(f"matmul {name:12s}: {dt*1e3:7.3f}ms/iter  {fl/dt/1e12:6.1f}"
            f" TF/s ({fl/dt/PEAK*100:4.1f}%)")

    w_qkv = jax.random.normal(key, (D, 3 * D), jnp.bfloat16)
    w_down = jax.random.normal(key, (3 * D, D), jnp.bfloat16)
    chain("qkv+down", [w_qkv, w_down], 2 * B * L * D * 3 * D * 2)
    w1 = jax.random.normal(key, (D, Ff), jnp.bfloat16)
    w2 = jax.random.normal(key, (Ff, D), jnp.bfloat16)
    chain("ffn_fc1+fc2", [w1, w2], 2 * B * L * D * Ff * 2)
    wq = jax.random.normal(key, (D, D), jnp.bfloat16)
    chain("square_x4", [wq, wq, wq, wq], 2 * B * L * D * D * 4)


def probe_flash(B, N, d, Lq, Lk):
    from mmpl_tpu.ops.attention import flash_attention
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, Lq, N, d), jnp.bfloat16)
    k = jax.random.normal(key, (B, Lk, N, d), jnp.bfloat16)
    v = jax.random.normal(key, (B, Lk, N, d), jnp.bfloat16)
    fl = 4 * B * N * Lq * Lk * d
    for bq in (256, 512, 1024):
        for bk in (512, 1024, 2048, 4096):
            if bk > Lk * 2 or bq > Lq:
                continue
            try:
                f = jax.jit(lambda q, k, v, bq=bq, bk=bk: flash_attention(
                    q, k, v, block_q=bq, block_k=bk))
                dt = timeit(f, q, k, v)
                log(f"flash Lq={Lq} Lk={Lk} bq={bq:4d} bk={bk:4d}: "
                    f"{dt*1e3:7.2f}ms  {fl/dt/1e12:6.1f} TF/s")
            except Exception as e:
                log(f"flash bq={bq} bk={bk}: FAIL {str(e)[:80]}")


def probe_group_forward(fused: bool):
    from mmpl_tpu.core.config import T2V_1_3B
    from mmpl_tpu.core.geometry import t2v_plan
    from mmpl_tpu.models import dit
    from mmpl_tpu.models.fps_dit import fps_forward_group, init_kv_cache
    cfg = T2V_1_3B
    plan = t2v_plan()
    B, C, H, W = 2, 16, 60, 104
    S = (H // 2) * (W // 2)
    params = dit.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    if fused:
        from mmpl_tpu.models.dit import fuse_qkv_params
        params = fuse_qkv_params(params)
    ctx = jax.random.normal(jax.random.PRNGKey(1),
                            (B, cfg.text_len, cfg.text_dim), jnp.bfloat16)
    emb = dit.embed_text(params, ctx)
    ctx_kv = dit.precompute_context_kv(params, cfg, emb)
    cache = init_kv_cache(cfg, B, S, dtype=jnp.bfloat16)
    tag = "fused" if fused else "base "
    for gi in (1, 2):
        group = plan.groups[gi]
        G = group.num_frames
        lat = jax.random.normal(jax.random.PRNGKey(2), (B, G, C, H, W),
                                jnp.bfloat16)
        t = jnp.full((B, G), 500.0, jnp.float32)
        fwd = jax.jit(lambda p, l, tt, ck, ca, g=group:
                      fps_forward_group(p, cfg, l, tt, ck, ca, g)[0])
        dt = timeit(fwd, params, lat, t, ctx_kv, cache, inner=3)
        log(f"group{gi} {tag}: {dt*1e3:7.1f}ms")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--skip-flash", action="store_true")
    ap.add_argument("--skip-matmul", action="store_true")
    ap.add_argument("--skip-group", action="store_true")
    ap.add_argument("--fused-only", action="store_true")
    args = ap.parse_args()
    log(f"backend={jax.default_backend()} devices={jax.devices()}")

    B, L, D, Ff = 2, 10920, 1536, 8960
    if not args.skip_matmul:
        probe_matmuls(B, L, D, Ff)
    if not args.skip_flash:
        # group1: Lq = 7*1560, Lk = 2*1560 ctx + own = 14040
        probe_flash(2, 12, 128, 10920, 14040)
        # group2/3: Lq = 6*1560=9360, Lk = 15*1560=23400
        probe_flash(2, 12, 128, 9360, 23400)
    if not args.skip_group:
        if not args.fused_only:
            probe_group_forward(fused=False)
        probe_group_forward(fused=True)


if __name__ == "__main__":
    main()


def probe_official_flash(B, N, d, Lq, Lk):
    """Compare our kernel vs jax's reference TPU flash attention."""
    from jax.experimental.pallas.ops.tpu import flash_attention as fa
    key = jax.random.PRNGKey(0)
    # official kernel takes [B, N, L, D]
    q = jax.random.normal(key, (B, N, Lq, d), jnp.bfloat16)
    k = jax.random.normal(key, (B, N, Lk, d), jnp.bfloat16)
    v = jax.random.normal(key, (B, N, Lk, d), jnp.bfloat16)
    fl = 4 * B * N * Lq * Lk * d
    for bq, bkmaj, bk in ((512, 2048, 2048), (1024, 2048, 2048),
                          (512, 1024, 1024), (2048, 4096, 2048)):
        try:
            bs = fa.BlockSizes(block_q=bq, block_k_major=bkmaj, block_k=bk,
                               block_b=1,
                               block_q_major_dkv=bq, block_k_major_dkv=bkmaj,
                               block_k_dkv=bk, block_q_dkv=bq,
                               block_k_major_dq=bkmaj, block_k_dq=bk,
                               block_q_dq=bq)
            f = jax.jit(lambda q, k, v, bs=bs: fa.flash_attention(
                q, k, v, causal=False, sm_scale=1.0 / math.sqrt(d),
                block_sizes=bs))
            dt = timeit(f, q, k, v)
            log(f"official bq={bq} bkm={bkmaj} bk={bk}: {dt*1e3:7.2f}ms "
                f"{fl/dt/1e12:6.1f} TF/s")
        except Exception as e:
            log(f"official bq={bq} bk={bk}: FAIL {str(e)[:100]}")
