"""int8 quantized gemms for inference (W8A8, dynamic activation scales).

The TPU-native analogue of the reference's TensorRT INT8 engine path
(`MMPL_t2v/demo_utils/vae_torch2trt.py:139` VAECalibrator + the int8
engine build): v5e's int8 MXU peak is 2x bf16 (394 vs 197 TOPS), so the
DiT's projection gemms (~30% of a denoise step) can run int8 while
attention and everything numerically delicate stays bf16.

Scheme (per-channel symmetric weights, per-token dynamic activations —
the standard W8A8 recipe, no calibration data needed):

  W_q[k, n] = round(W[k, n] / s_w[n]),   s_w[n] = max_k |W[k, n]| / 127
  x_q[t, k] = round(x[t, k] / s_x[t]),   s_x[t] = max_k |x[t, k]| / 127
  y[t, n]   = (x_q @ W_q)_int32 * s_x[t] * s_w[n]

The int32 accumulation is exact; the only error sources are the two
rounding steps.  Weights are quantized once at load
(`models.dit.quantize_params`); activations are quantized inside the
jitted step (amax + round fuse into the surrounding elementwise work).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_weight(w: jnp.ndarray, clip: float = 127.0):
    """Per-output-channel symmetric int8 quantisation.

    w: [..., K, N] (a trailing matmul kernel; leading dims, e.g. the
    stacked-layers axis, are preserved).  Returns (w_q int8 same shape,
    scale f32 [..., N])."""
    wf = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(wf), axis=-2) / clip          # [..., N]
    scale = jnp.maximum(scale, 1e-12)
    wq = jnp.clip(jnp.round(wf / scale[..., None, :]), -clip, clip)
    return wq.astype(jnp.int8), scale


def w8a8_matmul(x: jnp.ndarray, wq: jnp.ndarray, wscale: jnp.ndarray,
                out_dtype=None) -> jnp.ndarray:
    """y = x @ dequant(wq) with the contraction on the int8 MXU.

    x: [..., K] float; wq: [K, N] int8; wscale: [N] f32.
    Activations get per-token dynamic scales (amax over the K axis).
    """
    out_dtype = out_dtype if out_dtype is not None else x.dtype
    xf = x.astype(jnp.float32)
    xs = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0  # [..., 1]
    xs = jnp.maximum(xs, 1e-12)
    xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq, (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)                     # [..., N]
    y = acc.astype(jnp.float32) * xs * wscale
    return y.astype(out_dtype)


def w8a16_matmul(x: jnp.ndarray, wq: jnp.ndarray, wscale: jnp.ndarray,
                 out_dtype=None) -> jnp.ndarray:
    """Weight-only variant: y = (x @ wq_bf16) * s_w — activations stay
    bf16 (no rounding error, no dynamic-quant overhead), weights stay int8
    in HBM (halved weight traffic; XLA fuses the s8->bf16 convert into the
    gemm operand read).  int8 values <= 127 are exact in bf16, so the only
    error source is the weight rounding — strictly more accurate than
    W8A8.  Runs at the bf16 MXU rate: the right choice for memory-bound
    projections or when W8A8's activation rounding is out of budget."""
    out_dtype = out_dtype if out_dtype is not None else x.dtype
    y = jax.lax.dot_general(
        x, wq.astype(x.dtype), (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    y = y * wscale
    return y.astype(out_dtype)


def quantize_linear_params(p: dict, weight_only: bool = False) -> dict:
    """{"kernel", ["bias"]} -> int8 params.  W8A8 stores {"kernel_q",
    "scale"}; weight-only (W8A16) stores {"kernel_w8", "scale"} —
    `models.dit.linear` dispatches on the key name."""
    wq, scale = quantize_weight(p["kernel"])
    out = {("kernel_w8" if weight_only else "kernel_q"): wq,
           "scale": scale}
    if "bias" in p:
        out["bias"] = p["bias"]
    return out
