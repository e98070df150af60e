"""Ablation probe: attribute the group-forward time to components.

Monkeypatches one component at a time (attention, RoPE, norms, modulation,
cache write) and re-times the 1.3B group-1 forward (B=2 batched CFG).  The
difference vs baseline attributes the cost.  Run on the real chip:

  python tools/perf_ablate.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from mmpl_tpu.core.config import T2V_1_3B
from mmpl_tpu.core.geometry import t2v_plan
from mmpl_tpu.models import dit, fps_dit
from mmpl_tpu.ops import attention as attn_mod


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def setup(gi=1):
    cfg = T2V_1_3B
    plan = t2v_plan()
    B, C, H, W = 2, 16, 60, 104
    S = (H // 2) * (W // 2)
    params = dit.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    ctx = jax.random.normal(jax.random.PRNGKey(1),
                            (B, cfg.text_len, cfg.text_dim), jnp.bfloat16)
    emb = dit.embed_text(params, ctx)
    ctx_kv = dit.precompute_context_kv(params, cfg, emb)
    cache = fps_dit.init_kv_cache(cfg, B, S, dtype=jnp.bfloat16)
    group = plan.groups[gi]
    lat = jax.random.normal(jax.random.PRNGKey(2),
                            (B, group.num_frames, C, H, W), jnp.bfloat16)
    t = jnp.full((B, group.num_frames), 500.0, jnp.float32)
    return cfg, group, params, lat, t, ctx_kv, cache


def timed(cfg, group, params, lat, t, ctx_kv, cache, label):
    fwd = jax.jit(lambda p, l, tt, ck, ca: fps_dit.fps_forward_group(
        p, cfg, l, tt, ck, ca, group)[0])
    out = fwd(params, lat, t, ctx_kv, cache)   # compile
    sync(out)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(3):
            out = fwd(params, lat, t, ctx_kv, cache)
        sync(out)
        times.append((time.perf_counter() - t0) / 3)
    dt = float(np.median(times))
    log(f"{label:28s}: {dt*1e3:7.1f}ms")
    return dt


def main():
    log(f"backend={jax.default_backend()}")
    args = setup(gi=1)
    cfg = args[0]

    base = timed(*args, "baseline")

    # --- attention -> identity (q passthrough) ---------------------------
    orig_attention = attn_mod.attention
    ident = lambda q, k, v, mask=None, scale=None: q
    for m in (dit, fps_dit):
        m.attention = ident
    t_noattn = timed(*args, "no attention (self+cross)")
    for m in (dit, fps_dit):
        m.attention = orig_attention

    # --- RoPE -> identity --------------------------------------------------
    orig_rope = dit.apply_rope
    dit.apply_rope = lambda x, c, s, out_dtype=None: x.astype(out_dtype
                                                              or x.dtype)
    t_norope = timed(*args, "no rope")
    dit.apply_rope = orig_rope

    # --- norms in bf16 ------------------------------------------------------
    orig_ln, orig_rms = dit.layer_norm, dit.rms_norm

    def ln_bf16(x, eps=1e-6, weight=None, bias=None):
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
        y = (x - mu) * jax.lax.rsqrt(var + eps)
        if weight is not None:
            y = y * weight.astype(x.dtype)
        if bias is not None:
            y = y + bias.astype(x.dtype)
        return y

    def rms_bf16(x, weight, eps=1e-6):
        y = x * jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + eps)
        return y * weight.astype(x.dtype)

    dit.layer_norm = ln_bf16
    dit.rms_norm = rms_bf16
    t_bf16norm = timed(*args, "bf16 norms")
    dit.layer_norm, dit.rms_norm = orig_ln, orig_rms

    # --- no modulation (AdaLN mults off) ------------------------------------
    orig_mod, orig_gate = dit.modulate, dit.gate
    dit.modulate = lambda x, sh, sc, nf: x
    dit.gate = lambda x, g, nf: x
    t_nomod = timed(*args, "no AdaLN modulate/gate")
    dit.modulate, dit.gate = orig_mod, orig_gate

    # --- cross-attention off -------------------------------------------------
    orig_cross = dit.cross_attention
    dit.cross_attention = lambda p, x, k, v, n, ik=None, iv=None: \
        jnp.zeros_like(x)
    t_nocross = timed(*args, "no cross-attn")
    dit.cross_attention = orig_cross

    # --- fp32 scan carry? time embed fp32 paths — skip; print summary -------
    log("--- attribution (baseline minus ablated) ---")
    log(f"attention total : {1e3*(base - t_noattn):7.1f}ms")
    log(f"rope            : {1e3*(base - t_norope):7.1f}ms")
    log(f"fp32 norms extra: {1e3*(base - t_bf16norm):7.1f}ms")
    log(f"modulate/gate   : {1e3*(base - t_nomod):7.1f}ms")
    log(f"cross-attn      : {1e3*(base - t_nocross):7.1f}ms")


if __name__ == "__main__":
    main()
