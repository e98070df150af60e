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

#: per-(Lq, Lk) tuned block sizes, measured on v5e with the bias-row
#: kernel (tools/perf_probe.py + /tmp/b1_blocks harness, 2026-08-16).
#: With padding handled by the bias row, (256, 2048) wins at both hot
#: shapes for B=1 and B=2 (within ~1.5% of every alternative tried,
#: incl. exact divisors like (520, 2600)); larger bq is never better and
#: bk=4096 crashes Mosaic at bq>=1024.
_BLOCK_TABLE = {
    (10920, 14040): (256, 2048),   # group1/anchor: 16.2ms/layer @ B=2
    # i2v group3 (non-append 6-own/15-visible fill — a shape the t2v plan
    # never runs): step 1194.4 -> 1162.1 ms (-2.7%) over the old r1
    # (256, 2048) entry (tools/fps_blocks_probe.py MMPL_PROBE_PLAN=i2v,
    # runs/onchip_r5c.log 2026-08-20).  4680 divides 23400 exactly.
    (9360, 23400): (256, 4680),
    # 50-step group0 (context group, Lq = Lk = 2 frames x 1560): one
    # full-width K block: step 171.6 -> 156.2 ms (-9.0%); 1560 and 1040
    # divisors lose (161.5 / 167.9).  tools/fps_blocks_probe.py group0,
    # runs/onchip_r5c.log 2026-08-20.
    (3120, 3120): (256, 3120),
    # few-step steady block (3 own frames x 21-frame ring cache): in-model
    # p50 2.322 -> 2.178 s/block (-6.2%), window 19.28 -> 18.56 s
    # (tools/fewstep_tune_probe.py blocks, runs/onchip_r5.log 2026-08-20).
    # 2520 divides 32760 exactly, so no key-padding bias row is needed.
    (4680, 32760): (256, 2520),
    # 50-step group2 fill (6 own frames, 13-frame visibility): in-model
    # step 1079.5 -> 1038.8 ms (-3.8%, tools/fps_blocks_probe.py,
    # runs/onchip_r5b.log 2026-08-20).  4056 divides 20280 exactly.  The
    # anchor group's exact divisors all LOST to the padded (256, 2048)
    # baseline (1016.8 ms) despite +16.7% padded-K work — padding cost is
    # not linear in wasted K; keep measured entries only.
    (9360, 20280): (256, 4056),
    # 50-step group3 (APPEND-mode: 15 gathered slots + 6 own appended —
    # the hot Lk is 32760, not 23400): step 1487.1 -> 1428.2 ms (-4.0%,
    # tools/fps_blocks_probe.py group3b, runs/onchip_r5b.log 2026-08-20).
    # Same (256, 2520) exact divisor that wins the few-step steady shape.
    (9360, 32760): (256, 2520),
    # few-step WARMUP blocks (growing ring cache before steady state):
    # exact divisors take warmup p50 1.607 -> 1.545 s, window 18.56 ->
    # 18.50 s (tools/fewstep_tune_probe.py blocks, runs/onchip_r5b.log).
    (4680, 18720): (520, 1560),
    (4680, 23400): (520, 1560),
    (4680, 28080): (256, 2160),
}


def _legalize_blocks(Lq: int, Lk: int, block_q: int, block_k: int):
    """Clamp block sizes to values the Mosaic lowering accepts.

    block_q / block_k are second-minor tile dims of the q/k blocks, so both
    must be multiples of 8.  When Lk is not a multiple of block_k the fwd
    kernel adds a [1, Lkp] key-padding bias row whose (1, block_k) tile puts
    block_k in the LANE dim, which must be a multiple of 128 (measured
    on-chip: (256, 2520) at Lk=28080 fails lowering while the same entry at
    Lk=32760 divides exactly and is legal — runs/onchip_r5.log).
    """
    block_q = max(128, block_q - block_q % 8)
    block_k = max(128, block_k - block_k % 8)
    if Lk % block_k != 0 and block_k % 128 != 0:
        block_k = max(128, block_k - block_k % 128)
    return block_q, block_k


def _pick_blocks(Lq: int, Lk: int, block_q: int, block_k: int):
    if (Lq, Lk) in _BLOCK_TABLE:
        return _BLOCK_TABLE[(Lq, Lk)]
    block_q = min(block_q, max(128, 1 << (Lq - 1).bit_length()))
    block_k = min(block_k, max(128, 1 << (Lk - 1).bit_length()))
    return block_q, block_k


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    scale: Optional[float] = None,
                    block_q: Optional[int] = None,
                    block_k: Optional[int] = None,
                    interpret: bool = False) -> jnp.ndarray:
    """Pallas flash attention. q [B, Lq, N, D], k/v [B, Lk, N, D].

    Pads both sequence dims to block multiples (padding keys get a -inf
    bias row, padding queries sliced off); differentiable (custom VJP with
    Pallas backward kernels), so the same path serves inference and the
    self-forcing training rollouts.  Block sizes default to the measured
    per-shape table with a pow2 fallback.
    """
    B, Lq, N, D = q.shape
    Lk = k.shape[1]
    if block_q is None or block_k is None:
        bq, bk = _pick_blocks(Lq, Lk, block_q or 512, block_k or 2048)
        block_q = block_q or bq
        block_k = block_k or bk
    else:
        block_q = min(block_q, max(128, 1 << (Lq - 1).bit_length()))
        block_k = min(block_k, max(128, 1 << (Lk - 1).bit_length()))
    return flash_attention_vjp(q, k, v, scale, block_q, block_k, interpret)


def dense_attention_lse(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                        scale: Optional[float] = None
                        ) -> tuple:
    """Attention + per-query logsumexp, for online-softmax merging across
    KV chunks (ring attention).  Differentiable (pure jnp).

    Returns (out [B, Lq, N, D], lse [B, N, Lq] fp32).
    """
    d = q.shape[-1]
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    qf = q.astype(jnp.float32) * scale
    kf = k.astype(jnp.float32)
    scores = jnp.einsum("bqnd,bknd->bnqk", qf, kf)
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.einsum("bnqk,bknd->bqnd", (p / l).astype(v.dtype), v)
    lse = (m + jnp.log(l))[..., 0]
    return out, lse


def flash_attention_lse(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                        scale: Optional[float] = None,
                        block_q: int = 512, block_k: int = 2048,
                        interpret: bool = False) -> tuple:
    """Pallas flash attention that also returns the logsumexp.

    Inference-only fast path for ring attention on TPU (no custom VJP —
    the ring's training path uses `dense_attention_lse`).
    Returns (out [B, Lq, N, D], lse [B, N, Lq] fp32).
    """
    B, Lq, N, D = q.shape
    Lk = k.shape[1]
    block_q = min(max(block_q, 128), max(128, 1 << (Lq - 1).bit_length()))
    block_k = min(max(block_k, 128), max(128, 1 << (Lk - 1).bit_length()))
    out, (_, _, _, _, lse) = _flash_vjp_fwd_impl(
        q, k, v, scale, block_q, block_k, interpret)
    return out, lse[:, :, :Lq, 0]


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
    # the Pallas kernels need a lane-aligned head dim (128); tiny test
    # configs (e.g. head_dim 24) use the dense path
    if q.shape[-1] % 128 != 0:
        return dense_attention(q, k, v, scale=scale)
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if _FORCE_BACKEND == "flash" or on_tpu:
        return flash_attention(q, k, v, scale=scale,
                               interpret=not on_tpu)
    return dense_attention(q, k, v, scale=scale)


# ---------------------------------------------------------------------------
# Frame-masked Pallas flash attention (training masks)
# ---------------------------------------------------------------------------
#
# The reference runs its training masks through torch FlexAttention
# block-sparse kernels (causal_fps_model.py:24-25,155-191).  Our training
# masks are *frame-granular* (training/masks.py): every token carries a
# frame id and admissibility is a small [F, F] boolean table.  Inside the
# kernel the per-tile mask is reconstructed with two tiny MXU matmuls:
#     allowed = onehot(qf) @ frame_mask @ onehot(kf)^T
# which avoids unsupported vector gathers and costs O(BQ*F*BK) MACs with
# F <= ~64.

def frame_masked_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                           q_frame_ids, kv_frame_ids, frame_mask,
                           scale: Optional[float] = None,
                           block_q: int = 512, block_k: int = 1024,
                           interpret: Optional[bool] = None) -> jnp.ndarray:
    """Differentiable flash attention under a frame-granular boolean mask.

    q [B, Lq, N, D]; frame ids are per-token int arrays; frame_mask [F, F]
    bool (True = attend).  Padding tokens get a dedicated padding frame
    whose mask row/column is all-False.  Custom VJP with Pallas backward
    kernels, so the teacher-forcing losses can train on this path.
    """
    import numpy as np
    B, Lq, N, D = q.shape
    Lk = k.shape[1]
    scale = scale if scale is not None else 1.0 / math.sqrt(D)
    block_q = max(128, block_q)
    block_k = max(128, block_k)
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")

    fm = np.asarray(frame_mask)
    F = fm.shape[0]
    Fp = max(128, -(-F // 128) * 128)      # lane-pad the tiny table
    fm_p = np.zeros((Fp, Fp), np.float32)
    fm_p[:F, :F] = fm.astype(np.float32)   # padding frame rows stay 0

    qf_ids = np.full(-(-Lq // block_q) * block_q, F, np.int32)
    qf_ids[:Lq] = np.asarray(q_frame_ids, np.int32)
    kf_ids = np.full(-(-Lk // block_k) * block_k, F, np.int32)
    kf_ids[:Lk] = np.asarray(kv_frame_ids, np.int32)
    Lqp, Lkp = len(qf_ids), len(kf_ids)
    # host-built one-hot matrices (padding frame F maps to the zero row)
    qf = np.zeros((Lqp, Fp), np.float32)
    qf[np.arange(Lqp), np.minimum(qf_ids, Fp - 1)] = (qf_ids < F)
    kf = np.zeros((Lkp, Fp), np.float32)
    kf[np.arange(Lkp), np.minimum(kf_ids, Fp - 1)] = (kf_ids < F)

    # Block-level admissibility: tiles whose frame pairs are ALL masked are
    # skipped inside the kernels (the FlexAttention block-sparsity the
    # reference relies on, causal_fps_model.py:24-25).  The fps-forcing
    # mask admits only ~37% of (512, 2048) tiles at the 42-frame TF shape,
    # so skipping is a ~2.7x compute cut on the training attention.
    fmb = np.zeros((F + 1, F + 1), bool)
    fmb[:F, :F] = fm.astype(bool)
    nq_b, nk_b = Lqp // block_q, Lkp // block_k
    adm = np.zeros((nq_b, nk_b), np.int32)
    for qi in range(nq_b):
        qs = np.unique(qf_ids[qi * block_q:(qi + 1) * block_q])
        for ki in range(nk_b):
            ks = np.unique(kf_ids[ki * block_k:(ki + 1) * block_k])
            adm[qi, ki] = int(fmb[np.ix_(qs, ks)].any())

    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    if Lqp != Lq:
        qt = jnp.pad(qt, ((0, 0), (0, 0), (0, Lqp - Lq), (0, 0)))
    if Lkp != Lk:
        kt = jnp.pad(kt, ((0, 0), (0, 0), (0, Lkp - Lk), (0, 0)))
        vt = jnp.pad(vt, ((0, 0), (0, 0), (0, Lkp - Lk), (0, 0)))

    meta = _MaskedMeta(qf, kf, fm_p, Fp, scale, block_q, block_k,
                       interpret, Lq, Lk, adm)
    out = _masked_flash_vjp(qt, kt, vt, meta)
    if Lqp != Lq:
        out = out[:, :, :Lq]
    return jnp.swapaxes(out, 1, 2)


# ---------------------------------------------------------------------------
# Differentiable flash attention (custom VJP, Pallas fwd + bwd kernels)
# ---------------------------------------------------------------------------
#
# Standard flash backward: the forward additionally emits the per-query
# logsumexp; the backward reconstructs p tile-by-tile from (q, k, lse) and
# accumulates dv/dk over query blocks and dq over key blocks.

def _flash_fwd_kernel(*refs, scale: float, padded: bool):
    """Key padding is handled by a precomputed bias row (leading input when
    `padded`): one fused add instead of the iota + compare + select
    triple-pass over the s tile; unpadded shapes pay nothing."""
    if padded:
        (bias_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
         m_scr, l_scr, acc_scr) = refs
    else:
        (q_ref, k_ref, v_ref, o_ref, lse_ref,
         m_scr, l_scr, acc_scr) = refs
    ki = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ki == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    if padded:
        s = s + bias_ref[...]          # [1, BK] broadcasts over rows

    m_prev = m_scr[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
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
        # lse is stored [B, N, Lqp, 1]: the kernels consume a native 2-D
        # [BQ, 1] tile (1-D vectors and lane-shaped reshapes both crash
        # Mosaic's layout inference)
        lse_ref[0, 0] = m_scr[:, :1] + jnp.log(lsafe)    # [BQ, 1]


def _flash_bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                          dk_ref, dv_ref, dk_scr, dv_scr, *,
                          scale: float):
    """grid (B, N, Kb, Qb): accumulate dk/dv for one key block.

    No padding masks needed: padded q rows are zero AND their do/delta are
    zero, so their contributions to dv (p^T @ do) and dk (ds^T @ q, with
    ds = p * (do@v^T - delta) = 0) vanish identically.
    """
    qi = pl.program_id(3)
    nq = pl.num_programs(3)

    @pl.when(qi == 0)
    def _():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q = q_ref[0, 0]                                 # [BQ, D]
    k = k_ref[0, 0]                                 # [BK, D]
    v = v_ref[0, 0]
    do = do_ref[0, 0].astype(jnp.float32)           # [BQ, D]
    lse2 = lse_ref[0, 0]                            # [BQ, 1]
    delta2 = delta_ref[0, 0]                        # [BQ, 1]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    p = jnp.exp(s - lse2)                           # [BQ, BK]

    dv_scr[:] += jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v.astype(jnp.float32),
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # [BQ, BK]
    ds = p * (dp - delta2)
    dk_scr[:] += scale * jax.lax.dot_general(
        ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(qi == nq - 1)
    def _():
        dk_ref[0, 0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[:].astype(dv_ref.dtype)


def _flash_bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                         dq_ref, dq_scr, *, scale: float):
    """grid (B, N, Qb, Kb): accumulate dq for one query block.

    No key-padding mask needed: padded k/v rows are zero, so their spurious
    p entries contribute ds@k = ds * 0 to dq and dp = do @ 0 to ds exactly
    as if masked.
    """
    ki = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ki == 0)
    def _():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0].astype(jnp.float32)
    lse2 = lse_ref[0, 0]
    delta2 = delta_ref[0, 0]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    p = jnp.exp(s - lse2)
    dp = jax.lax.dot_general(do, v.astype(jnp.float32),
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta2)
    dq_scr[:] += scale * jax.lax.dot_general(
        ds, k.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(ki == nk - 1)
    def _():
        dq_ref[0, 0] = dq_scr[:].astype(dq_ref.dtype)


def _pad_lnd(x, block):
    L = x.shape[2]
    p = _cdiv(L, block) * block - L
    return (jnp.pad(x, ((0, 0), (0, 0), (0, p), (0, 0))) if p else x), L


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def flash_attention_vjp(q, k, v, scale=None, block_q=512, block_k=1024,
                        interpret=False):
    """Differentiable Pallas flash attention; layout [B, L, N, D]."""
    o, _ = _flash_vjp_fwd_impl(q, k, v, scale, block_q, block_k, interpret)
    return o


def _flash_vjp_fwd_impl(q, k, v, scale, block_q, block_k, interpret):
    B, Lq, N, D = q.shape
    Lk = k.shape[1]
    block_q, block_k = _legalize_blocks(Lq, Lk, block_q, block_k)
    sc = scale if scale is not None else 1.0 / math.sqrt(D)
    qt, _ = _pad_lnd(jnp.swapaxes(q, 1, 2), block_q)
    kt, _ = _pad_lnd(jnp.swapaxes(k, 1, 2), block_k)
    vt, _ = _pad_lnd(jnp.swapaxes(v, 1, 2), block_k)
    Lqp, Lkp = qt.shape[2], kt.shape[2]
    grid = (B, N, Lqp // block_q, Lkp // block_k)
    padded = Lkp != Lk
    kernel = functools.partial(_flash_fwd_kernel, scale=sc, padded=padded)
    in_specs = [
        pl.BlockSpec((1, 1, block_q, D), lambda b, n, qi, ki: (b, n, qi, 0)),
        pl.BlockSpec((1, 1, block_k, D), lambda b, n, qi, ki: (b, n, ki, 0)),
        pl.BlockSpec((1, 1, block_k, D), lambda b, n, qi, ki: (b, n, ki, 0)),
    ]
    operands = [qt, kt, vt]
    if padded:
        bias = jnp.full((1, Lkp), NEG_INF, jnp.float32).at[:, :Lk].set(0.0)
        in_specs.insert(0, pl.BlockSpec((1, block_k),
                                        lambda b, n, qi, ki: (0, ki)))
        operands.insert(0, bias)
    o, lse = pl.pallas_call(
        kernel, grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, 1, block_q, D), lambda b, n, qi, ki: (b, n, qi, 0)),
            pl.BlockSpec((1, 1, block_q, 1),
                         lambda b, n, qi, ki: (b, n, qi, 0)),
        ),
        out_shape=(jax.ShapeDtypeStruct((B, N, Lqp, D), q.dtype),
                   jax.ShapeDtypeStruct((B, N, Lqp, 1), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((block_q, 128), jnp.float32),
                        pltpu.VMEM((block_q, 128), jnp.float32),
                        pltpu.VMEM((block_q, D), jnp.float32)],
        interpret=interpret,
    )(*operands)
    return jnp.swapaxes(o[:, :, :Lq], 1, 2), (q, k, v, o, lse)


def _flash_vjp_fwd(q, k, v, scale, block_q, block_k, interpret):
    out, res = _flash_vjp_fwd_impl(q, k, v, scale, block_q, block_k,
                                   interpret)
    return out, res


def _flash_vjp_bwd(scale, block_q, block_k, interpret, res, g):
    q, k, v, o_p, lse = res           # o_p/lse are padded [B,N,Lqp(,D)]
    # same deterministic legalization as the fwd, so the do padding below
    # matches the Lqp the saved o_p/lse were padded to
    block_q, block_k = _legalize_blocks(q.shape[1], k.shape[1],
                                        block_q, block_k)
    D = q.shape[-1]
    sc = scale if scale is not None else 1.0 / math.sqrt(D)

    do = jnp.swapaxes(g, 1, 2)                       # [B,N,Lq,D]
    do_p, _ = _pad_lnd(do, block_q)
    delta = jnp.sum(do_p.astype(jnp.float32) * o_p.astype(jnp.float32),
                    axis=-1, keepdims=True)               # [B,N,Lqp,1]
    return _flash_bwd_impl(q, k, v, do_p, lse, delta, sc, block_q, block_k,
                           interpret)


def _flash_bwd_impl(q, k, v, do_p, lse_p, delta_p, sc, block_q, block_k,
                    interpret):
    """Pallas flash backward with externally-supplied (padded) lse/delta.

    Shared by the plain VJP and the ring VJP — the ring backward feeds the
    GLOBAL logsumexp/delta to each rotating KV chunk (each chunk's
    contribution to the full-softmax gradient uses p = exp(s - lse_global),
    delta = rowsum(do * out_global)).

    q [B,Lq,N,D]; k/v [B,Lk,N,D]; do_p/lse_p/delta_p padded [B,N,Lqp,*].
    Returns (dq [B,Lq,N,D], dk, dv [B,Lk,N,D]).
    """
    B, Lq, N, D = q.shape
    Lk = k.shape[1]

    qt, _ = _pad_lnd(jnp.swapaxes(q, 1, 2), block_q)
    kt, _ = _pad_lnd(jnp.swapaxes(k, 1, 2), block_k)
    vt, _ = _pad_lnd(jnp.swapaxes(v, 1, 2), block_k)
    Lqp, Lkp = qt.shape[2], kt.shape[2]
    gridkv = (B, N, Lkp // block_k, Lqp // block_q)
    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, scale=sc),
        grid=gridkv,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, D), lambda b, n, ki, qi: (b, n, qi, 0)),
            pl.BlockSpec((1, 1, block_k, D), lambda b, n, ki, qi: (b, n, ki, 0)),
            pl.BlockSpec((1, 1, block_k, D), lambda b, n, ki, qi: (b, n, ki, 0)),
            pl.BlockSpec((1, 1, block_q, D), lambda b, n, ki, qi: (b, n, qi, 0)),
            pl.BlockSpec((1, 1, block_q, 1),
                         lambda b, n, ki, qi: (b, n, qi, 0)),
            pl.BlockSpec((1, 1, block_q, 1),
                         lambda b, n, ki, qi: (b, n, qi, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block_k, D), lambda b, n, ki, qi: (b, n, ki, 0)),
            pl.BlockSpec((1, 1, block_k, D), lambda b, n, ki, qi: (b, n, ki, 0)),
        ),
        out_shape=(jax.ShapeDtypeStruct((B, N, Lkp, D), k.dtype),
                   jax.ShapeDtypeStruct((B, N, Lkp, D), v.dtype)),
        scratch_shapes=[pltpu.VMEM((block_k, D), jnp.float32),
                        pltpu.VMEM((block_k, D), jnp.float32)],
        interpret=interpret,
    )(qt, kt, vt, do_p, lse_p, delta_p)

    gridq = (B, N, Lqp // block_q, Lkp // block_k)
    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=sc),
        grid=gridq,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, D), lambda b, n, qi, ki: (b, n, qi, 0)),
            pl.BlockSpec((1, 1, block_k, D), lambda b, n, qi, ki: (b, n, ki, 0)),
            pl.BlockSpec((1, 1, block_k, D), lambda b, n, qi, ki: (b, n, ki, 0)),
            pl.BlockSpec((1, 1, block_q, D), lambda b, n, qi, ki: (b, n, qi, 0)),
            pl.BlockSpec((1, 1, block_q, 1),
                         lambda b, n, qi, ki: (b, n, qi, 0)),
            pl.BlockSpec((1, 1, block_q, 1),
                         lambda b, n, qi, ki: (b, n, qi, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, D),
                               lambda b, n, qi, ki: (b, n, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((B, N, Lqp, D), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, D), jnp.float32)],
        interpret=interpret,
    )(qt, kt, vt, do_p, lse_p, delta_p)

    dq = jnp.swapaxes(dq[:, :, :Lq], 1, 2)
    dk = jnp.swapaxes(dk[:, :, :Lk], 1, 2)
    dv = jnp.swapaxes(dv[:, :, :Lk], 1, 2)
    return dq, dk, dv


flash_attention_vjp.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


# ---------------------------------------------------------------------------
# Differentiable RING flash attention (custom VJP at the ring level)
# ---------------------------------------------------------------------------
#
# The ring's online-softmax merge makes per-chunk lse a live intermediate,
# so instead of differentiating through the merge, the VJP is defined over
# the WHOLE ring (the xFuser fused-long-context-attention role,
# xdit_context_parallel.py:179-184): forward is the rotating flash-lse
# merge; backward re-rotates the KV chunks and runs the plain flash
# backward kernels per chunk with the GLOBAL logsumexp and delta — each
# chunk's contribution to the full-softmax gradient is exactly
# p = exp(s - lse_global), delta = rowsum(do * out_global).  dk/dv
# accumulators travel around the ring with their chunk and arrive home
# after `ring` permutes.

def _ring_flash_fwd_impl(q, k, v, axis_name, scale, block_q, block_k,
                         interpret):
    ring = jax.lax.axis_size(axis_name)
    perm = [(i, (i + 1) % ring) for i in range(ring)]
    out, lse = flash_attention_lse(q, k, v, scale, block_q, block_k,
                                   interpret)
    kr, vr = k, v
    for _ in range(ring - 1):
        kr = jax.lax.ppermute(kr, axis_name, perm)
        vr = jax.lax.ppermute(vr, axis_name, perm)
        o_c, lse_c = flash_attention_lse(q, kr, vr, scale, block_q,
                                         block_k, interpret)
        m = jnp.maximum(lse, lse_c)
        w, w_c = jnp.exp(lse - m), jnp.exp(lse_c - m)
        tot = w + w_c
        wq = jnp.swapaxes(w / tot, 1, 2)[..., None]
        wc = jnp.swapaxes(w_c / tot, 1, 2)[..., None]
        out = (out.astype(jnp.float32) * wq
               + o_c.astype(jnp.float32) * wc).astype(out.dtype)
        lse = m + jnp.log(tot)
    return out, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def ring_flash_attention(q, k, v, axis_name, scale=None, block_q=512,
                         block_k=2048, interpret=False):
    """Differentiable Pallas ring attention.  Call inside a `shard_map`
    with q/k/v [B, L/ring, N, D] local shards; `axis_name` is the ring
    mesh axis.  Head dim must be lane-aligned (128) on TPU."""
    out, _ = _ring_flash_fwd_impl(q, k, v, axis_name, scale, block_q,
                                  block_k, interpret)
    return out


def _ring_flash_vjp_fwd(q, k, v, axis_name, scale, block_q, block_k,
                        interpret):
    out, lse = _ring_flash_fwd_impl(q, k, v, axis_name, scale, block_q,
                                    block_k, interpret)
    return out, (q, k, v, out, lse)


def _ring_flash_vjp_bwd(axis_name, scale, block_q, block_k, interpret,
                        res, g):
    q, k, v, out, lse = res
    B, Lq, N, D = q.shape
    Lk = k.shape[1]
    sc = scale if scale is not None else 1.0 / math.sqrt(D)
    bq = min(max(block_q, 128), max(128, 1 << (Lq - 1).bit_length()))
    bk = min(max(block_k, 128), max(128, 1 << (Lk - 1).bit_length()))
    # same legalization the per-chunk fwd applies (flash_attention_lse ->
    # _flash_vjp_fwd_impl), so a non-%8 / non-dividing block_k request
    # that works forward cannot crash Mosaic only when differentiated
    bq, bk = _legalize_blocks(Lq, Lk, bq, bk)
    ring = jax.lax.axis_size(axis_name)
    perm = [(i, (i + 1) % ring) for i in range(ring)]

    do_p, _ = _pad_lnd(jnp.swapaxes(g, 1, 2), bq)          # [B,N,Lqp,D]
    o_p, _ = _pad_lnd(jnp.swapaxes(out, 1, 2), bq)
    # global delta; padded query rows have do == 0 so every padded
    # contribution (delta, ds, dk, dv) vanishes and dq pad rows slice off
    delta_p = jnp.sum(do_p.astype(jnp.float32) * o_p.astype(jnp.float32),
                      axis=-1, keepdims=True)              # [B,N,Lqp,1]
    Lqp = do_p.shape[2]
    lse_p = jnp.pad(lse, ((0, 0), (0, 0), (0, Lqp - Lq)))[..., None]

    dq = jnp.zeros(q.shape, jnp.float32)
    dk = jnp.zeros(k.shape, jnp.float32)
    dv = jnp.zeros(v.shape, jnp.float32)
    kr, vr = k, v
    for _ in range(ring):
        dq_c, dk_c, dv_c = _flash_bwd_impl(q, kr, vr, do_p, lse_p, delta_p,
                                           sc, bq, bk, interpret)
        dq = dq + dq_c.astype(jnp.float32)
        dk = dk + dk_c.astype(jnp.float32)
        dv = dv + dv_c.astype(jnp.float32)
        if ring > 1:
            kr = jax.lax.ppermute(kr, axis_name, perm)
            vr = jax.lax.ppermute(vr, axis_name, perm)
            dk = jax.lax.ppermute(dk, axis_name, perm)
            dv = jax.lax.ppermute(dv, axis_name, perm)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


ring_flash_attention.defvjp(_ring_flash_vjp_fwd, _ring_flash_vjp_bwd)


# ---------------------------------------------------------------------------
# Differentiable frame-masked flash attention (custom VJP)
# ---------------------------------------------------------------------------
#
# Same structure as the unmasked VJP; every kernel rebuilds the per-tile
# admissibility with the onehot @ frame_mask @ onehot^T trick, making the
# teacher-forcing losses trainable on the Pallas path.

def _mask_tile(oh_q, oh_k, fm_ref, Fp):
    """allowed = onehot(qf) @ fm @ onehot(kf)^T from prebuilt one-hot tiles
    ([BQ, Fp] / [BK, Fp] f32 inputs; avoids in-kernel iota-compare)."""
    qrow = jax.lax.dot_general(oh_q, fm_ref[:, :], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    return jax.lax.dot_general(qrow, oh_k, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _masked_fwd_kernel(adm_ref, qf_ref, kf_ref, fm_ref, q_ref, k_ref,
                       v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr, *,
                       scale: float, num_frames_padded: int):
    ki = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ki == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # block skip (FlexAttention-style): fully-masked tiles contribute
    # nothing — leave the running state untouched and pay no MXU/VPU
    @pl.when(adm_ref[pl.program_id(2), ki] > 0)
    def _():
        s = jax.lax.dot_general(q_ref[0, 0], k_ref[0, 0],
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        allowed = _mask_tile(qf_ref[:, :], kf_ref[:, :], fm_ref,
                             num_frames_padded)
        s = jnp.where(allowed > 0.5, s, NEG_INF)

        m_prev = m_scr[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        shift = jnp.where(m_new == NEG_INF, 0.0, m_new)
        alpha = jnp.where(m_prev == NEG_INF, 0.0, jnp.exp(m_prev - shift))
        p = jnp.where(allowed > 0.5, jnp.exp(s - shift), 0.0)
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
        m = m_scr[:, :1]
        lse_ref[0, 0] = jnp.where(m == NEG_INF, NEG_INF,
                                  m + jnp.log(lsafe))   # [BQ, 1]


def _masked_p(q, k, lse2, oh_q, oh_k, fm_ref, Fp, scale):
    """Reconstruct p tile from (q, k, lse) under the frame mask.
    lse2: [BQ, 1] (kept 2-D — 1-D vector ops crash the Mosaic compiler at
    large grids)."""
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    allowed = _mask_tile(oh_q, oh_k, fm_ref, Fp)
    safe_lse = jnp.where(lse2 == NEG_INF, 0.0, lse2)
    p = jnp.exp(s - safe_lse)
    return jnp.where((allowed > 0.5) & (lse2 != NEG_INF), p, 0.0)


def _masked_bwd_dkv_kernel(adm_ref, qf_ref, kf_ref, fm_ref, q_ref, k_ref,
                           v_ref, do_ref, lse_ref, delta_ref, dk_ref,
                           dv_ref, dk_scr, dv_scr, *, scale: float,
                           num_frames_padded: int):
    qi = pl.program_id(3)
    nq = pl.num_programs(3)

    @pl.when(qi == 0)
    def _():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    @pl.when(adm_ref[qi, pl.program_id(2)] > 0)
    def _():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0].astype(jnp.float32)
        lse2 = lse_ref[0, 0]                            # [BQ, 1]
        delta2 = delta_ref[0, 0]
        p = _masked_p(q, k, lse2, qf_ref[:, :], kf_ref[:, :], fm_ref,
                      num_frames_padded, scale)
        dv_scr[:] += jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v.astype(jnp.float32),
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta2)
        dk_scr[:] += scale * jax.lax.dot_general(
            ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(qi == nq - 1)
    def _():
        dk_ref[0, 0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[:].astype(dv_ref.dtype)


def _masked_bwd_dq_kernel(adm_ref, qf_ref, kf_ref, fm_ref, q_ref, k_ref,
                          v_ref, do_ref, lse_ref, delta_ref, dq_ref,
                          dq_scr, *, scale: float, num_frames_padded: int):
    ki = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ki == 0)
    def _():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    @pl.when(adm_ref[pl.program_id(2), ki] > 0)
    def _():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0].astype(jnp.float32)
        lse2 = lse_ref[0, 0]                            # [BQ, 1]
        delta2 = delta_ref[0, 0]
        p = _masked_p(q, k, lse2, qf_ref[:, :], kf_ref[:, :], fm_ref,
                      num_frames_padded, scale)
        dp = jax.lax.dot_general(do, v.astype(jnp.float32),
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta2)
        dq_scr[:] += scale * jax.lax.dot_general(
            ds, k.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(ki == nk - 1)
    def _():
        dq_ref[0, 0] = dq_scr[:].astype(dq_ref.dtype)


class _MaskedMeta:
    """Static (non-differentiable) metadata for the masked VJP."""

    def __init__(self, qf, kf, fm_p, Fp, scale, block_q, block_k,
                 interpret, Lq, Lk, adm):
        import numpy as np
        self.qf = qf
        self.kf = kf
        self.fm_p = fm_p
        self.Fp = Fp
        self.scale = scale
        self.block_q = block_q
        self.block_k = block_k
        self.interpret = interpret
        self.Lq = Lq
        self.Lk = Lk
        self.adm = adm          # [nQ, nK] int32 block admissibility

    def __hash__(self):
        import numpy as np
        return hash((self.qf.tobytes(), self.kf.tobytes(),
                     self.fm_p.tobytes(), self.Fp, self.scale,
                     self.block_q, self.block_k, self.interpret,
                     self.Lq, self.Lk, self.adm.tobytes()))

    def __eq__(self, other):
        import numpy as np
        # real equality, not hash-equality: a hash collision between two
        # different masks must not silently reuse the wrong compiled kernel
        return (isinstance(other, _MaskedMeta)
                and (self.Fp, self.scale, self.block_q, self.block_k,
                     self.interpret, self.Lq, self.Lk)
                == (other.Fp, other.scale, other.block_q, other.block_k,
                    other.interpret, other.Lq, other.Lk)
                and self.qf.shape == other.qf.shape
                and self.kf.shape == other.kf.shape
                and np.array_equal(self.qf, other.qf)
                and np.array_equal(self.kf, other.kf)
                and np.array_equal(self.fm_p, other.fm_p)
                and np.array_equal(self.adm, other.adm))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _masked_flash_vjp(qt, kt, vt, meta):
    o, _ = _masked_vjp_fwd_impl(qt, kt, vt, meta)
    return o


def _masked_common_specs(meta, D):
    bq, bk = meta.block_q, meta.block_k
    return [
        pl.BlockSpec(memory_space=pltpu.SMEM),                 # adm
        pl.BlockSpec((bq, meta.Fp), lambda b, n, qi, ki: (qi, 0)),
        pl.BlockSpec((bk, meta.Fp), lambda b, n, qi, ki: (ki, 0)),
        pl.BlockSpec((meta.Fp, meta.Fp), lambda b, n, qi, ki: (0, 0)),
        pl.BlockSpec((1, 1, bq, D), lambda b, n, qi, ki: (b, n, qi, 0)),
        pl.BlockSpec((1, 1, bk, D), lambda b, n, qi, ki: (b, n, ki, 0)),
        pl.BlockSpec((1, 1, bk, D), lambda b, n, qi, ki: (b, n, ki, 0)),
    ]


def _masked_vjp_fwd_impl(qt, kt, vt, meta):
    """qt/kt/vt are pre-padded [B, N, Lp, D]."""
    B, N, Lqp, D = qt.shape
    Lkp = kt.shape[2]
    bq, bk = meta.block_q, meta.block_k
    grid = (B, N, Lqp // bq, Lkp // bk)
    qf2 = meta.qf
    kf2 = meta.kf
    kernel = functools.partial(_masked_fwd_kernel, scale=meta.scale,
                               num_frames_padded=meta.Fp)
    o, lse = pl.pallas_call(
        kernel, grid=grid,
        in_specs=_masked_common_specs(meta, D),
        out_specs=(
            pl.BlockSpec((1, 1, bq, D), lambda b, n, qi, ki: (b, n, qi, 0)),
            pl.BlockSpec((1, 1, bq, 1), lambda b, n, qi, ki: (b, n, qi, 0)),
        ),
        out_shape=(jax.ShapeDtypeStruct((B, N, Lqp, D), qt.dtype),
                   jax.ShapeDtypeStruct((B, N, Lqp, 1), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((bq, 128), jnp.float32),
                        pltpu.VMEM((bq, 128), jnp.float32),
                        pltpu.VMEM((bq, D), jnp.float32)],
        interpret=meta.interpret,
    )(jnp.asarray(meta.adm), jnp.asarray(qf2), jnp.asarray(kf2),
      jnp.asarray(meta.fm_p), qt, kt, vt)
    return o, (qt, kt, vt, o, lse)


def _masked_vjp_fwd(qt, kt, vt, meta):
    return _masked_vjp_fwd_impl(qt, kt, vt, meta)


def _masked_vjp_bwd(meta, res, g):
    qt, kt, vt, o, lse = res
    B, N, Lqp, D = qt.shape
    Lkp = kt.shape[2]
    bq, bk = meta.block_q, meta.block_k
    qf2 = jnp.asarray(meta.qf)
    kf2 = jnp.asarray(meta.kf)
    fm = jnp.asarray(meta.fm_p)

    do = g
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1, keepdims=True)              # [B,N,Lqp,1]

    lse_spec = pl.BlockSpec((1, 1, bq, 1),
                            lambda b, n, ki, qi: (b, n, qi, 0))
    adm_j = jnp.asarray(meta.adm)
    dk, dv = pl.pallas_call(
        functools.partial(_masked_bwd_dkv_kernel, scale=meta.scale,
                          num_frames_padded=meta.Fp),
        grid=(B, N, Lkp // bk, Lqp // bq),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),             # adm
            pl.BlockSpec((bq, meta.Fp), lambda b, n, ki, qi: (qi, 0)),
            pl.BlockSpec((bk, meta.Fp), lambda b, n, ki, qi: (ki, 0)),
            pl.BlockSpec((meta.Fp, meta.Fp), lambda b, n, ki, qi: (0, 0)),
            pl.BlockSpec((1, 1, bq, D), lambda b, n, ki, qi: (b, n, qi, 0)),
            pl.BlockSpec((1, 1, bk, D), lambda b, n, ki, qi: (b, n, ki, 0)),
            pl.BlockSpec((1, 1, bk, D), lambda b, n, ki, qi: (b, n, ki, 0)),
            pl.BlockSpec((1, 1, bq, D), lambda b, n, ki, qi: (b, n, qi, 0)),
            lse_spec,
            lse_spec,
        ],
        out_specs=(
            pl.BlockSpec((1, 1, bk, D), lambda b, n, ki, qi: (b, n, ki, 0)),
            pl.BlockSpec((1, 1, bk, D), lambda b, n, ki, qi: (b, n, ki, 0)),
        ),
        out_shape=(jax.ShapeDtypeStruct((B, N, Lkp, D), kt.dtype),
                   jax.ShapeDtypeStruct((B, N, Lkp, D), vt.dtype)),
        scratch_shapes=[pltpu.VMEM((bk, D), jnp.float32),
                        pltpu.VMEM((bk, D), jnp.float32)],
        interpret=meta.interpret,
    )(adm_j, qf2, kf2, fm, qt, kt, vt, do, lse, delta)

    lse_spec_q = pl.BlockSpec((1, 1, bq, 1),
                              lambda b, n, qi, ki: (b, n, qi, 0))
    dq = pl.pallas_call(
        functools.partial(_masked_bwd_dq_kernel, scale=meta.scale,
                          num_frames_padded=meta.Fp),
        grid=(B, N, Lqp // bq, Lkp // bk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),             # adm
            pl.BlockSpec((bq, meta.Fp), lambda b, n, qi, ki: (qi, 0)),
            pl.BlockSpec((bk, meta.Fp), lambda b, n, qi, ki: (ki, 0)),
            pl.BlockSpec((meta.Fp, meta.Fp), lambda b, n, qi, ki: (0, 0)),
            pl.BlockSpec((1, 1, bq, D), lambda b, n, qi, ki: (b, n, qi, 0)),
            pl.BlockSpec((1, 1, bk, D), lambda b, n, qi, ki: (b, n, ki, 0)),
            pl.BlockSpec((1, 1, bk, D), lambda b, n, qi, ki: (b, n, ki, 0)),
            pl.BlockSpec((1, 1, bq, D), lambda b, n, qi, ki: (b, n, qi, 0)),
            lse_spec_q,
            lse_spec_q,
        ],
        out_specs=pl.BlockSpec((1, 1, bq, D),
                               lambda b, n, qi, ki: (b, n, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((B, N, Lqp, D), qt.dtype),
        scratch_shapes=[pltpu.VMEM((bq, D), jnp.float32)],
        interpret=meta.interpret,
    )(adm_j, qf2, kf2, fm, qt, kt, vt, do, lse, delta)
    return dq, dk, dv


_masked_flash_vjp.defvjp(_masked_vjp_fwd, _masked_vjp_bwd)
