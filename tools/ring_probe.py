"""Ring-attention kernel cost at the 32760-token teacher shape, on chip.

One ring rank's per-step work is a flash fwd (+bwd when training) over
its local Q against a rotating KV chunk.  This measures the Pallas
flash_attention fwd+bwd (custom VJP) at the full teacher shape and the
dense-lse path at growing shapes until it stops fitting — the measured
basis for `ring_attention(impl="flash")` being the training default on
TPU (VERDICT r3 item 4).

Run: python tools/ring_probe.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench(fn, *args, reps=3):
    out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    from mmpl_tpu.ops.attention import (dense_attention_lse,
                                        flash_attention)
    B, N, D = 1, 12, 128          # 1.3B heads
    log(f"backend: {jax.default_backend()}")

    def qkv(L, key=0):
        ks = jax.random.split(jax.random.PRNGKey(key), 3)
        mk = lambda k: jax.random.normal(k, (B, L, N, D), jnp.bfloat16)
        return mk(ks[0]), mk(ks[1]), mk(ks[2])

    def run(name, attn_fn, L):
        q, k, v = qkv(L)
        fwd = jax.jit(lambda q, k, v: attn_fn(q, k, v))
        try:
            t_f = bench(fwd, q, k, v)
        except Exception as e:
            log(f"  {name} L={L}: fwd FAILED ({type(e).__name__})")
            return
        grad = jax.jit(jax.grad(
            lambda q, k, v: jnp.sum(attn_fn(q, k, v).astype(jnp.float32)
                                    ** 2), argnums=(0, 1, 2)))
        try:
            t_b = bench(grad, q, k, v)
        except Exception as e:
            log(f"  {name} L={L}: fwd {t_f*1e3:7.1f}ms, fwd+bwd FAILED "
                f"({type(e).__name__})")
            return
        log(f"  {name} L={L}: fwd {t_f*1e3:7.1f}ms  fwd+bwd "
            f"{t_b*1e3:7.1f}ms")

    # the teacher window: 21 frames x 1560 tokens
    log("flash (Pallas custom VJP) — the per-ring-step kernel:")
    for L in (8192, 16384, 32760):
        run("flash", lambda q, k, v: flash_attention(q, k, v), L)
    log("dense-lse (the pre-r3 differentiable ring path):")
    for L in (4096, 8192, 16384, 32760):
        run("dense", lambda q, k, v: dense_attention_lse(q, k, v)[0], L)


if __name__ == "__main__":
    main()
