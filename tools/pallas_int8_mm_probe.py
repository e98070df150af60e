"""Can a Pallas kernel beat XLA's s8xs8->s32 convolution on v5e?

tools/int8_probe.py established that XLA's native s8 gemm runs at
~26-30% of the 394-TOPS int8 peak (roughly the bf16 MXU rate), so W8A8
wins only via halved weight HBM traffic.  This probe hand-writes the
int8 matmul in Pallas (full-K blocks, s32 accumulation, in-kernel
rescale to bf16) and measures it in the same dependent-chain,
consumption-matched harness to see whether Mosaic reaches the int8 MXU
rate XLA leaves on the table.

Run: python tools/pallas_int8_mm_probe.py [bm] [bn]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

PEAK_INT8 = 394e12
PEAK_BF16 = 197e12


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def _mm_s8_kernel(x_ref, w_ref, o_ref, *, out_scale):
    acc = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    o_ref[...] = (acc.astype(jnp.float32) * out_scale).astype(o_ref.dtype)


def pallas_s8_matmul(xq, wq, bm, bn, out_scale=1e-4):
    M, K = xq.shape
    K2, N = wq.shape
    assert K == K2 and M % bm == 0 and N % bn == 0
    return pl.pallas_call(
        functools.partial(_mm_s8_kernel, out_scale=out_scale),
        grid=(M // bm, N // bn),
        in_specs=[
            pl.BlockSpec((bm, K), lambda i, j: (i, 0)),
            pl.BlockSpec((K, bn), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
    )(xq, wq)


def _mm_s8_kloop_kernel(x_ref, w_ref, o_ref, acc_ref, *, out_scale,
                        k_steps):
    @pl.when(pl.program_id(2) == 0)
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(pl.program_id(2) == k_steps - 1)
    def _flush():
        o_ref[...] = (acc_ref[...].astype(jnp.float32)
                      * out_scale).astype(o_ref.dtype)


def pallas_s8_matmul_kloop(xq, wq, bm, bn, bk, out_scale=1e-4):
    M, K = xq.shape
    _, N = wq.shape
    assert M % bm == 0 and N % bn == 0 and K % bk == 0
    k_steps = K // bk
    return pl.pallas_call(
        functools.partial(_mm_s8_kloop_kernel, out_scale=out_scale,
                          k_steps=k_steps),
        grid=(M // bm, N // bn, k_steps),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
    )(xq, wq)


def _feed(y, D):
    T, N = y.shape
    if N >= D:
        pad = (-N) % D
        t = jnp.pad(y, ((0, 0), (0, pad))) if pad else y
        return t.reshape(T, -1, D).sum(axis=1)
    return jnp.tile(y, (1, -(-D // N)))[:, :D]


def timeit(fn, *args, inner=2, repeats=3):
    out = fn(*args)
    sync(out)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn(*args)
        sync(out)
        times.append((time.perf_counter() - t0) / inner)
    return float(np.median(times))


def probe(name, B, L, D, N, mm, iters=30):
    M = B * L
    x = jax.random.normal(jax.random.PRNGKey(0), (M, D), jnp.bfloat16)
    wq = jnp.clip(
        jnp.round(jax.random.normal(jax.random.PRNGKey(1), (D, N),
                                    jnp.float32) * 64),
        -127, 127).astype(jnp.int8)
    flops = 2 * M * D * N

    def chain(x, wq):
        def body(x, _):
            xq = jnp.clip(jnp.round(x.astype(jnp.float32)), -127, 127
                          ).astype(jnp.int8)
            y = mm(xq, wq)
            return (_feed(y, D) * 0.5 + x * 0.5).astype(jnp.bfloat16), None
        return jax.lax.scan(body, x, None, length=iters)[0]

    dt = timeit(jax.jit(chain), x, wq) / iters
    log(f"  {name:34s}: {dt*1e3:7.3f} ms/iter  {flops/dt/1e12:6.1f} TF/s "
        f"({flops/dt/PEAK_INT8*100:5.1f}% int8 peak, "
        f"{flops/dt/PEAK_BF16*100:5.1f}% bf16 peak)")


def main():
    log(f"backend: {jax.default_backend()}, device: {jax.devices()[0]}")
    # pad M to block multiples: 2*10920 = 21840 -> 21 * 1040... use 21504?
    # keep it simple: M = 2 * 11264 (the padded group-1 length)
    M_B, M_L = 2, 11264
    shapes = [
        ("qkv  [Mx1536 @ 1536x4608]", 1536, 4608),
        ("ffn1 [Mx1536 @ 1536x8960]", 1536, 8960),
        ("ffn2 [Mx8960 @ 8960x1536]", 8960, 1536),
        ("o    [Mx1536 @ 1536x1536]", 1536, 1536),
    ]
    for (name, D, N) in shapes:
        log(name)
        # XLA baseline
        probe("xla s8 dot", M_B, M_L, D, N,
              lambda xq, wq: (jax.lax.dot_general(
                  xq, wq, (((1,), (0,)), ((), ())),
                  preferred_element_type=jnp.int32
              ).astype(jnp.float32) * 1e-4).astype(jnp.bfloat16))
        for bm, bn in ((256, 512), (512, 512), (512, 1024), (1024, 512)):
            if (M_B * M_L) % bm or N % bn:
                continue
            if D <= 2048:
                try:
                    probe(f"pallas fullK bm={bm} bn={bn}", M_B, M_L, D, N,
                          lambda xq, wq, bm=bm, bn=bn:
                          pallas_s8_matmul(xq, wq, bm, bn))
                except Exception as e:
                    log(f"  pallas fullK bm={bm} bn={bn}: FAILED "
                        f"{type(e).__name__}: {str(e)[:200]}")
            else:
                try:
                    probe(f"pallas kloop bm={bm} bn={bn} bk=2240",
                          M_B, M_L, D, N,
                          lambda xq, wq, bm=bm, bn=bn:
                          pallas_s8_matmul_kloop(xq, wq, bm, bn, 2240))
                except Exception as e:
                    log(f"  pallas kloop bm={bm} bn={bn}: FAILED "
                        f"{type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
