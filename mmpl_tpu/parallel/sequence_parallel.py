"""Sequence parallelism for the bidirectional teacher DiT (USP equivalent).

Re-design of `MMPL_t2v/wan/distributed/xdit_context_parallel.py`
(usp_dit_forward / usp_attn_forward): the reference monkey-patches the Wan
teacher to chunk tokens across sequence-parallel ranks and runs
xFuser's Ulysses all-to-all + ring attention over NCCL.  Here the same
Ulysses data movement is explicit `lax.all_to_all` inside a `shard_map`
over an `sp` mesh axis riding ICI:

  tokens [B, L/sp, N, D] --all_to_all--> heads [B, L, N/sp, D]
  -> full-sequence attention per device on its head shard
  --all_to_all--> tokens [B, L/sp, N, D]

RoPE is applied rank-locally by slicing the precomputed table at the
rank's token offset (the reference's SP-rank-aware rope slicing, :52-57).
The sequence length must be a multiple of sp (the reference pads to this,
text2video.py:160-162).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..models.dit import (Params, cross_attention, embed_text, layer_norm,
                          linear, mlp, patchify, precompute_context_kv,
                          rms_norm, time_embed, unpatchify)
from ..ops.attention import attention
from ..ops.rope import apply_rope, window_rope_table


def ulysses_attention(q, k, v, axis_name: str):
    """All-to-all head/sequence reshuffle + local full-seq attention
    (xdit_context_parallel.py:149-192)."""
    # [B, L/sp, N, D] -> [B, L, N/sp, D]
    qg = jax.lax.all_to_all(q, axis_name, split_axis=2, concat_axis=1,
                            tiled=True)
    kg = jax.lax.all_to_all(k, axis_name, split_axis=2, concat_axis=1,
                            tiled=True)
    vg = jax.lax.all_to_all(v, axis_name, split_axis=2, concat_axis=1,
                            tiled=True)
    out = attention(qg, kg, vg)
    # back to [B, L/sp, N, D]
    return jax.lax.all_to_all(out, axis_name, split_axis=1, concat_axis=2,
                              tiled=True)


def usp_dit_forward(params: Params, cfg, latents: jnp.ndarray,
                    t: jnp.ndarray, context: jnp.ndarray, mesh: Mesh,
                    sp_axis: str = "sp") -> jnp.ndarray:
    """Sequence-parallel bidirectional Wan DiT forward (teacher path).

    latents [B, F, C, H, W]; t [B] (uniform timestep — the teacher's case,
    so AdaLN modulation broadcasts over tokens and frame boundaries need
    not align with shards); context [B, T, text_dim].
    """
    sp = mesh.shape[sp_axis]
    B, F, C, H, W = latents.shape
    grid = (H // cfg.patch_size[1], W // cfg.patch_size[2])
    S = grid[0] * grid[1]
    L = F * S
    assert L % sp == 0, f"seq len {L} must be a multiple of sp={sp}"
    n, d = cfg.num_heads, cfg.dim // cfg.num_heads
    assert n % sp == 0, f"heads {n} must be a multiple of sp={sp}"

    x = patchify(params["patch_embedding"], latents, cfg.patch_size)
    e, e0 = time_embed(params, cfg, t[:, None])     # [B,1,D], [B,1,6,D]
    ctx = embed_text(params, context.astype(x.dtype))
    ctx_kv = precompute_context_kv(params, cfg, ctx)
    cos_np, sin_np = window_rope_table(F, grid[0], grid[1], d)
    cos, sin = jnp.asarray(cos_np), jnp.asarray(sin_np)

    chunk = L // sp

    def local_forward(x_loc, e, e0, cos_loc, sin_loc, blocks, ctx_kv,
                      head_p):
        """Runs on each sp shard; x_loc [B, L/sp, D]."""
        e6_base = e0.astype(jnp.float32)            # [B,1,6,D]

        def self_attn(sp_p, xm):
            Ll = xm.shape[1]
            q = rms_norm(linear(sp_p["q"], xm),
                         sp_p["norm_q"]["weight"]).reshape(B, Ll, n, d)
            k = rms_norm(linear(sp_p["k"], xm),
                         sp_p["norm_k"]["weight"]).reshape(B, Ll, n, d)
            v = linear(sp_p["v"], xm).reshape(B, Ll, n, d)
            q = apply_rope(q, cos_loc, sin_loc, out_dtype=v.dtype)
            k = apply_rope(k, cos_loc, sin_loc, out_dtype=v.dtype)
            out = ulysses_attention(q, k, v, sp_axis)
            return linear(sp_p["o"], out.reshape(B, Ll, -1))

        def block_fwd(x, layer_in):
            bp, ckv = layer_in
            mod = bp["modulation"].astype(jnp.float32)[None]
            e6 = mod + e6_base                     # [B,1,6,D]
            sh = [e6[:, :, i] for i in range(6)]
            y = self_attn(bp["self_attn"],
                          layer_norm(x, cfg.eps)
                          * (1 + sh[1].astype(x.dtype))
                          + sh[0].astype(x.dtype))
            x = x + y * sh[2].astype(x.dtype)
            norm3 = bp.get("norm3")
            xc = layer_norm(x, cfg.eps, norm3["weight"], norm3["bias"]) \
                if norm3 is not None else x
            x = x + cross_attention(bp["cross_attn"], xc, ckv["k"],
                                    ckv["v"], cfg.num_heads)
            y = mlp(bp["ffn"], layer_norm(x, cfg.eps)
                    * (1 + sh[4].astype(x.dtype)) + sh[3].astype(x.dtype))
            return x + y * sh[5].astype(x.dtype), None

        x_loc, _ = jax.lax.scan(block_fwd, x_loc, (blocks, ctx_kv))

        hmod = head_p["modulation"].astype(jnp.float32)[None]
        he = hmod + e.astype(jnp.float32)[:, :, None]   # [B,1,2,D]
        x_loc = linear(head_p["head"],
                       layer_norm(x_loc, cfg.eps)
                       * (1 + he[:, 0, 1].astype(x_loc.dtype)[:, None])
                       + he[:, 0, 0].astype(x_loc.dtype)[:, None])
        return x_loc

    sharded = shard_map(
        local_forward, mesh=mesh,
        in_specs=(P(None, sp_axis, None), P(), P(), P(sp_axis), P(sp_axis),
                  P(), P(), P()),
        out_specs=P(None, sp_axis, None),
    )
    out_tokens = sharded(x, e, e0, cos, sin, params["blocks"], ctx_kv,
                         params["head"])
    return unpatchify(out_tokens, F, grid, cfg.patch_size, cfg.out_dim)
