"""Attention primitives: Pallas TPU flash attention + XLA fallback.

Replaces the reference's attention dispatch
(`MMPL_t2v/wan/modules/attention.py:32-185`: FlashAttention-3 → -2 → torch
SDPA).  On TPU the hot path is a Pallas online-softmax flash kernel; small /
debug shapes use a dense XLA path.  The MMPL inference attention needs **no
mask at all** — the planned visibility is realised by gathering whole frames
from the KV cache before the call (see `models/fps_dit.py`) — so the kernel
only has to mask key-side padding.

Layout convention matches the reference ([B, L, N, D], flash-attn style).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU-enabled builds
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

NEG_INF = -1e30


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


# ---------------------------------------------------------------------------
# Dense (XLA) reference path
# ---------------------------------------------------------------------------

def dense_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    mask: Optional[jnp.ndarray] = None,
                    scale: Optional[float] = None) -> jnp.ndarray:
    """Plain attention; q [B, Lq, N, D], k/v [B, Lk, N, D]; fp32 softmax.

    `mask` is boolean, broadcastable to [B, N, Lq, Lk]; True = attend.
    """
    d = q.shape[-1]
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    qf = q.astype(jnp.float32) * scale
    kf = k.astype(jnp.float32)
    scores = jnp.einsum("bqnd,bknd->bnqk", qf, kf)
    if mask is not None:
        scores = jnp.where(mask, scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bnqk,bknd->bqnd", probs.astype(v.dtype), v)
    return out


# ---------------------------------------------------------------------------
# Pallas TPU flash attention
# ---------------------------------------------------------------------------

def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *,
                  kv_len: int, block_k: int, scale: float):
    """Online-softmax flash attention; grid (B, N, Qblocks, Kblocks).

    TPU grids iterate sequentially with the last dim fastest, so the scratch
    accumulators carry state across the Kblock dim and flush at the last one.
    """
    ki = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ki == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0]                                # [BQ, D]
    k = k_ref[0, 0]                                # [BK, D]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # [BQ, BK]

    # mask key-side padding in the (only) partial block
    valid = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
             < (kv_len - ki * block_k))
    s = jnp.where(valid, s, NEG_INF)

    m_prev = m_scr[:, :1]                          # [BQ, 1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)     # [BQ, 1]
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)                # [BQ, 1]
    p = jnp.exp(s - m_new)                         # [BQ, BK]

    l_new = alpha * l_scr[:, :1] + jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0, 0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)        # [BQ, D]
    acc_scr[:] = acc_scr[:] * alpha + pv
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ki == nk - 1)
    def _():
        l = l_scr[:, :1]
        l = jnp.where(l == 0.0, 1.0, l)            # fully-masked (padded q) rows
        o_ref[0, 0] = (acc_scr[:] / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("kv_len", "block_q", "block_k",
                                             "scale", "interpret"))
def _flash_padded(q, k, v, *, kv_len: int, block_q: int, block_k: int,
                  scale: float, interpret: bool):
    """q [B,N,Lq,D] (Lq % block_q == 0), k/v [B,N,Lkp,D] (Lkp % block_k == 0)."""
    B, N, Lq, D = q.shape
    Lkp = k.shape[2]
    grid = (B, N, Lq // block_q, Lkp // block_k)
    kernel = functools.partial(_flash_kernel, kv_len=kv_len,
                               block_k=block_k, scale=scale)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, D), lambda b, n, qi, ki: (b, n, qi, 0)),
            pl.BlockSpec((1, 1, block_k, D), lambda b, n, qi, ki: (b, n, ki, 0)),
            pl.BlockSpec((1, 1, block_k, D), lambda b, n, qi, ki: (b, n, ki, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, D),
                               lambda b, n, qi, ki: (b, n, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((B, N, Lq, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, D), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v)


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    scale: Optional[float] = None,
                    block_q: int = 512, block_k: int = 2048,
                    interpret: bool = False) -> jnp.ndarray:
    """Pallas flash attention. q [B, Lq, N, D], k/v [B, Lk, N, D].

    Pads both sequence dims to block multiples (padding keys are masked,
    padding queries sliced off).  All shapes in the MMPL plan are static so
    each (group, phase) compiles exactly once.
    """
    B, Lq, N, D = q.shape
    Lk = k.shape[1]
    scale = scale if scale is not None else 1.0 / math.sqrt(D)
    block_q = min(block_q, max(128, 1 << (Lq - 1).bit_length()))
    block_k = min(block_k, max(128, 1 << (Lk - 1).bit_length()))

    qt = jnp.swapaxes(q, 1, 2)                    # [B, N, Lq, D]
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)

    pq = _cdiv(Lq, block_q) * block_q - Lq
    pk = _cdiv(Lk, block_k) * block_k - Lk
    if pq:
        qt = jnp.pad(qt, ((0, 0), (0, 0), (0, pq), (0, 0)))
    if pk:
        kt = jnp.pad(kt, ((0, 0), (0, 0), (0, pk), (0, 0)))
        vt = jnp.pad(vt, ((0, 0), (0, 0), (0, pk), (0, 0)))

    out = _flash_padded(qt, kt, vt, kv_len=Lk, block_q=block_q,
                        block_k=block_k, scale=scale, interpret=interpret)
    if pq:
        out = out[:, :, :Lq]
    return jnp.swapaxes(out, 1, 2)


# ---------------------------------------------------------------------------
# Dispatch
# ---------------------------------------------------------------------------

#: flip to force a backend in tests ("dense" | "flash" | None=auto)
_FORCE_BACKEND: Optional[str] = None


def set_attention_backend(name: Optional[str]) -> None:
    global _FORCE_BACKEND
    assert name in (None, "dense", "flash")
    _FORCE_BACKEND = name


def attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
              mask: Optional[jnp.ndarray] = None,
              scale: Optional[float] = None) -> jnp.ndarray:
    """Main dispatch, mirroring `wan/modules/attention.py:139`'s role.

    Masked attention always uses the dense path for now (the training masks
    get a dedicated block-sparse kernel); unmasked attention uses the Pallas
    flash kernel on TPU and dense XLA elsewhere.
    """
    if mask is not None or _FORCE_BACKEND == "dense":
        return dense_attention(q, k, v, mask=mask, scale=scale)
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if _FORCE_BACKEND == "flash" or on_tpu:
        return flash_attention(q, k, v, scale=scale,
                               interpret=not on_tpu)
    return dense_attention(q, k, v, scale=scale)
