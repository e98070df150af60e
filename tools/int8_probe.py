"""int8 gemm probe on the real chip: is the v5e int8 MXU path (2x bf16
peak) reachable from XLA, and what does dynamic per-token activation
quantisation cost at the 1.3B hot shapes?

Compares, dispatch-amortised (K dependent iterations inside one program):
  1. bf16 gemm (the current path),
  2. pure int8 x int8 -> int32 gemm (upper bound; excludes quant overhead),
  3. the full W8A8 dynamic-quant matmul (quantise activations per token,
     int8 dot, rescale) — what inference would actually run,
  4. weight-only int8 (dequantise W to bf16 then bf16 gemm) for reference.

Run: python tools/int8_probe.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

PEAK_BF16 = 197e12
PEAK_INT8 = 394e12


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


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


def _feed(y, D):
    """Fold a [T, N] result into a [T, D] carry CONSUMING every output
    column — a plain slice lets XLA compute only a [T, D] slab of the
    gemm (the first probe version reported impossible >peak numbers)."""
    T, N = y.shape
    if N >= D:
        pad = (-N) % D
        t = jnp.pad(y, ((0, 0), (0, pad))) if pad else y
        return t.reshape(T, -1, D).sum(axis=1)
    # N < D: tile — every source column appears in a full copy, so none
    # of the gemm is sliceable away
    return jnp.tile(y, (1, -(-D // N)))[:, :D]


def probe(B, L, D, N, iters=30):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B * L, D), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (D, N), jnp.bfloat16)
    flops = 2 * B * L * D * N

    def report(name, dt, peak):
        log(f"  {name:28s}: {dt*1e3:7.3f} ms/iter  "
            f"{flops/dt/1e12:6.1f} TF/s ({flops/dt/peak*100:5.1f}% of "
            f"{'int8' if peak == PEAK_INT8 else 'bf16'} peak)")

    # 1. bf16 baseline
    def bf16_chain(x, w):
        def body(x, _):
            y = x @ w
            return _feed(y, D) * 0.5 + x * 0.5, None
        return jax.lax.scan(body, x, None, length=iters)[0]
    dt = timeit(jax.jit(bf16_chain), x, w) / iters
    report("bf16", dt, PEAK_BF16)

    # 2. int8 dot, bf16 output (act quant outside the loop body is not
    # possible in a dependent chain, so quantise with a FIXED scale —
    # round+clip only; the bf16 convert fuses into the conv output so the
    # downstream consumption is byte-identical to the bf16 chain)
    wq8 = jnp.clip(jnp.round(w.astype(jnp.float32) * 64), -127, 127
                   ).astype(jnp.int8)

    def int8_chain(x, wq):
        def body(x, _):
            xq = jnp.clip(jnp.round(x.astype(jnp.float32)), -127, 127
                          ).astype(jnp.int8)
            y = jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            yb = (y.astype(jnp.float32) * 1e-4).astype(jnp.bfloat16)
            return (_feed(yb, D) * 0.5 + x * 0.5).astype(jnp.bfloat16), None
        return jax.lax.scan(body, x, None, length=iters)[0]
    dt = timeit(jax.jit(int8_chain), x, wq8) / iters
    report("int8 dot (fixed scale)", dt, PEAK_INT8)

    # 3. full W8A8 dynamic-quant matmul (the real inference op)
    wscale = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0) / 127.0
    wq = jnp.clip(jnp.round(w.astype(jnp.float32) / wscale), -127, 127
                  ).astype(jnp.int8)

    def w8a8_chain(x, wq, wscale):
        def body(x, _):
            xf = x.astype(jnp.float32)
            xs = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
            xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
            acc = jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            y = (acc.astype(jnp.float32) * xs * wscale
                 ).astype(jnp.bfloat16)
            return (_feed(y, D) * 0.5 + x * 0.5).astype(jnp.bfloat16), None
        return jax.lax.scan(body, x, None, length=iters)[0]
    dt = timeit(jax.jit(w8a8_chain), x, wq, wscale) / iters
    report("W8A8 dynamic quant", dt, PEAK_INT8)

    # 4. weight-only int8 (dequant to bf16, bf16 gemm)
    def wonly_chain(x, wq, wscale):
        wd = (wq.astype(jnp.float32) * wscale).astype(jnp.bfloat16)
        def body(x, _):
            y = x @ wd
            return _feed(y, D) * 0.5 + x * 0.5, None
        return jax.lax.scan(body, x, None, length=iters)[0]
    dt = timeit(jax.jit(wonly_chain), x, wq, wscale) / iters
    report("weight-only int8 (bf16 mm)", dt, PEAK_BF16)


def main():
    log(f"backend: {jax.default_backend()}, device: {jax.devices()[0]}")
    # 1.3B hot shapes, batched CFG group-1 (B=2, L=10920 padded 11264)
    for (name, B, L, D, N) in [
        ("qkv  [2x10920x1536 @ 1536x4608]", 2, 10920, 1536, 4608),
        ("ffn1 [2x10920x1536 @ 1536x8960]", 2, 10920, 1536, 8960),
        ("ffn2 [2x10920x8960 @ 8960x1536]", 2, 10920, 8960, 1536),
        ("o    [2x10920x1536 @ 1536x1536]", 2, 10920, 1536, 1536),
    ]:
        log(name)
        probe(B, L, D, N)


if __name__ == "__main__":
    main()
