"""3D rotary position embeddings for the Wan DiT, TPU-style.

The reference implements RoPE with complex multiplication in fp64/fp32
(`MMPL_t2v/wan/modules/model.py:29-67`, `causal_fps_model.py:27-55`): the
per-head channel dim d is split into a temporal band of d - 4*(d//6)
channels and two spatial bands of 2*(d//6) channels each, rotated by the
frame / row / column position respectively.  Here we precompute real-valued
cos/sin tables on the host (fp32) — the frame positions of every MMPL
chunk-group are static, so each group's table is a compile-time constant —
and apply the rotation with two fused multiplies on device.

Complex pair convention: channel pair (2i, 2i+1) is (re, im), i.e.
  out[2i]   = x[2i] * cos - x[2i+1] * sin
  out[2i+1] = x[2i] * sin + x[2i+1] * cos
which matches torch.view_as_complex on the last dim.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax.numpy as jnp
import numpy as np


def band_dims(head_dim: int) -> Tuple[int, int, int]:
    """(temporal, row, col) channel counts; each even, summing to head_dim."""
    s = 2 * (head_dim // 6)
    t = head_dim - 4 * (head_dim // 6)
    return t, s, s


def _inv_freqs(dim: int, theta: float = 10000.0) -> np.ndarray:
    """rope_params' frequency vector for a band of `dim` channels (dim/2 freqs)."""
    return 1.0 / np.power(theta, np.arange(0, dim, 2, dtype=np.float64) / dim)


@lru_cache(maxsize=64)
def rope_table(frame_positions: Tuple[int, ...], grid_h: int, grid_w: int,
               head_dim: int) -> Tuple[np.ndarray, np.ndarray]:
    """cos/sin tables [L, head_dim//2] (fp32) for tokens of the given frames.

    Token order matches the DiT patchify: ((frame, row, col)) row-major.
    `frame_positions` are *absolute* window-frame indices — the FPS model
    applies RoPE at each frame's true temporal position regardless of where
    it sits in the packed query (causal_fps_model.py:27-55, `start_frame`).
    """
    dt, dh, dw = band_dims(head_dim)
    ft = _inv_freqs(dt)
    fh = _inv_freqs(dh)
    fw = _inv_freqs(dw)

    f = np.asarray(frame_positions, dtype=np.float64)       # [F]
    h = np.arange(grid_h, dtype=np.float64)                 # [H]
    w = np.arange(grid_w, dtype=np.float64)                 # [W]

    ang_t = np.einsum("f,c->fc", f, ft)                     # [F, dt/2]
    ang_h = np.einsum("h,c->hc", h, fh)                     # [H, dh/2]
    ang_w = np.einsum("w,c->wc", w, fw)                     # [W, dw/2]

    F, H, W = len(f), grid_h, grid_w
    angles = np.concatenate([
        np.broadcast_to(ang_t[:, None, None, :], (F, H, W, dt // 2)),
        np.broadcast_to(ang_h[None, :, None, :], (F, H, W, dh // 2)),
        np.broadcast_to(ang_w[None, None, :, :], (F, H, W, dw // 2)),
    ], axis=-1).reshape(F * H * W, head_dim // 2)
    return (np.cos(angles).astype(np.float32),
            np.sin(angles).astype(np.float32))


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray,
               out_dtype=None) -> jnp.ndarray:
    """Rotate x [B, L, N, D] by per-token tables cos/sin [L, D//2].

    Computation in fp32 (the reference upcasts before the complex multiply),
    result cast to `out_dtype` (default: x.dtype).
    """
    out_dtype = out_dtype or x.dtype
    B, L, N, D = x.shape
    xf = x.astype(jnp.float32).reshape(B, L, N, D // 2, 2)
    re, im = xf[..., 0], xf[..., 1]
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    out = jnp.stack([re * c - im * s, re * s + im * c], axis=-1)
    return out.reshape(B, L, N, D).astype(out_dtype)


def apply_rope_split(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray,
                     out_dtype=None) -> jnp.ndarray:
    """Rotate x [B, L, N, D] whose per-head channels are in SPLIT-HALF
    layout ([re_0..re_{D/2-1} | im_0..im_{D/2-1}]).

    Equivalent to `apply_rope` on interleaved channels after permuting the
    q/k projection weights at load time (`dit.fuse_qkv_params`) — the q.k^T
    dot is invariant under a shared channel permutation of q and k.  The
    win: lane-aligned halves fuse into the surrounding elementwise ops,
    where the interleaved version's stride-2 pair reshapes materialise fp32
    copies (~45 ms/step on the 1.3B group forward, tools/perf_ablate.py).
    """
    out_dtype = out_dtype or x.dtype
    half = x.shape[-1] // 2
    re = x[..., :half].astype(jnp.float32)
    im = x[..., half:].astype(jnp.float32)
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    return jnp.concatenate([re * c - im * s, re * s + im * c],
                           axis=-1).astype(out_dtype)


def split_rope_permutation(num_heads: int, head_dim: int) -> np.ndarray:
    """Channel permutation taking interleaved (re, im) pairs to split-half
    layout, per head: new[i] = old[2i], new[D/2 + i] = old[2i + 1]."""
    per_head = np.concatenate([np.arange(0, head_dim, 2),
                               np.arange(1, head_dim, 2)])
    return np.concatenate([h * head_dim + per_head
                           for h in range(num_heads)])


def window_rope_table(num_frames: int, grid_h: int, grid_w: int,
                      head_dim: int) -> Tuple[np.ndarray, np.ndarray]:
    """Dense table for a contiguous [0, num_frames) window (bidirectional DiT)."""
    return rope_table(tuple(range(num_frames)), grid_h, grid_w, head_dim)


def dynamic_rope_table(start_frame: jnp.ndarray, num_frames: int,
                       grid_h: int, grid_w: int, head_dim: int
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin [F*H*W, head_dim//2] for frames [start, start+F) where
    `start_frame` is a *traced* scalar — the rolling-KV path's equivalent of
    `causal_rope_apply(..., start_frame=...)` (causal_model.py:27-55,193-199).

    Only the temporal band depends on the frame position; the spatial bands
    are compile-time constants.  Device trig on [F, dt/2] is negligible.
    """
    dt, dh, dw = band_dims(head_dim)
    ft = jnp.asarray(_inv_freqs(dt), jnp.float32)                # [dt/2]
    f = start_frame.astype(jnp.float32) + jnp.arange(num_frames,
                                                     dtype=jnp.float32)
    ang_t = f[:, None] * ft[None, :]                             # [F, dt/2]

    h = np.arange(grid_h, dtype=np.float64)
    w = np.arange(grid_w, dtype=np.float64)
    ang_h = np.einsum("h,c->hc", h, _inv_freqs(dh))              # [H, dh/2]
    ang_w = np.einsum("w,c->wc", w, _inv_freqs(dw))              # [W, dw/2]
    H, W = grid_h, grid_w
    ang_s = np.concatenate([
        np.broadcast_to(ang_h[:, None, :], (H, W, dh // 2)),
        np.broadcast_to(ang_w[None, :, :], (H, W, dw // 2)),
    ], axis=-1).reshape(H * W, (dh + dw) // 2).astype(np.float32)
    ang_s = jnp.asarray(ang_s)                                   # [S, ds/2]

    F, S = num_frames, H * W
    ang = jnp.concatenate([
        jnp.broadcast_to(ang_t[:, None, :], (F, S, dt // 2)),
        jnp.broadcast_to(ang_s[None, :, :], (F, S, (dh + dw) // 2)),
    ], axis=-1).reshape(F * S, head_dim // 2)
    return jnp.cos(ang), jnp.sin(ang)
