"""Does exp2 (folding log2(e) into the scale) beat exp in the flash fwd?

Also tests: (a) skipping the kv-padding valid-mask when Lk is already a
block multiple, (b) rope folded into the kernel via split-half layout.
"""

import functools
import math
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from mmpl_tpu.ops.attention import NEG_INF, flash_attention


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(fn, *args, inner=5, repeats=3):
    out = fn(*args); sync(out)
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn(*args)
        sync(out)
        ts.append((time.perf_counter() - t0) / inner)
    return float(np.median(ts))


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *,
                scale: float, use_exp2: bool, mask_pad: bool,
                kv_len: int, block_k: int):
    ki = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ki == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    sc = scale * (1.4426950408889634 if use_exp2 else 1.0)
    s = jax.lax.dot_general(q_ref[0, 0], k_ref[0, 0],
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * sc
    if mask_pad:
        valid = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                 < (kv_len - ki * block_k))
        s = jnp.where(valid, s, NEG_INF)
    m_prev = m_scr[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    if use_exp2:
        alpha = jnp.exp2(m_prev - m_new)
        p = jnp.exp2(s - m_new)
    else:
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
    l_new = alpha * l_scr[:, :1] + jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[0, 0],
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    acc_scr[:] = acc_scr[:] * alpha + pv
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ki == nk - 1)
    def _():
        l = l_scr[:, :1]
        lsafe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_scr[:] / lsafe).astype(o_ref.dtype)


def variant(q, k, v, block_q, block_k, use_exp2, mask_pad):
    B, Lq, N, D = q.shape
    Lk = k.shape[1]
    sc = 1.0 / math.sqrt(D)
    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    grid = (B, N, Lq // block_q, Lk // block_k)
    kern = functools.partial(_fwd_kernel, scale=sc, use_exp2=use_exp2,
                             mask_pad=mask_pad, kv_len=Lk, block_k=block_k)
    o = pl.pallas_call(
        kern, grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, D), lambda b, n, qi, ki: (b, n, qi, 0)),
            pl.BlockSpec((1, 1, block_k, D), lambda b, n, qi, ki: (b, n, ki, 0)),
            pl.BlockSpec((1, 1, block_k, D), lambda b, n, qi, ki: (b, n, ki, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, D),
                               lambda b, n, qi, ki: (b, n, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((B, N, Lq, D), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, 128), jnp.float32),
                        pltpu.VMEM((block_q, 128), jnp.float32),
                        pltpu.VMEM((block_q, D), jnp.float32)],
    )(qt, kt, vt)
    return jnp.swapaxes(o, 1, 2)


def main():
    B, N, d = 2, 12, 128
    Lq, Lk = 11264, 14336
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, Lq, N, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, Lk, N, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, Lk, N, d), jnp.bfloat16)
    fl = 4 * B * N * Lq * Lk * d

    ref = None
    for use_exp2 in (False, True):
        for mask_pad in (True, False):
            f = jax.jit(functools.partial(variant, block_q=512, block_k=2048,
                                          use_exp2=use_exp2,
                                          mask_pad=mask_pad))
            try:
                out = f(q, k, v)
                if ref is None:
                    ref = np.asarray(out, np.float32)
                err = np.abs(np.asarray(out, np.float32) - ref).max()
                dt = timeit(f, q, k, v)
                log(f"exp2={use_exp2} mask={mask_pad}: {dt*1e3:7.2f}ms "
                    f"{fl/dt/1e12:6.1f} TF/s  maxdiff={err:.2e}")
            except Exception as e:
                log(f"exp2={use_exp2} mask={mask_pad}: FAIL {str(e)[:90]}")

    # current production kernel for reference
    f0 = jax.jit(lambda q, k, v: flash_attention(q, k, v, block_q=512,
                                                 block_k=2048))
    dt = timeit(f0, q, k, v)
    log(f"production        : {dt*1e3:7.2f}ms {fl/dt/1e12:6.1f} TF/s")


if __name__ == "__main__":
    main()
