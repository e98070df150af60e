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

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..models.dit import (Params, cross_attention, embed_text, layer_norm,
                          linear, mlp, patchify, precompute_context_kv,
                          qkv_project, time_embed, unpatchify)
from ..ops.attention import attention
from ..ops.rope import window_rope_table


def ring_attention(q, k, v, axis_name: str, impl: str = "dense"):
    """Ring attention over a sequence-sharded KV (the ring half of USP,
    xdit_context_parallel.py:179-184 / xFuserLongContextAttention).

    q/k/v: [B, L/ring, N, D] local shards inside a `shard_map`.  K/V rotate
    around the ring via `ppermute`; each step's partial attention merges
    into the running output by logsumexp reweighting (online softmax across
    chunks).  Unlike Ulysses, heads are NOT split, so sp can exceed
    num_heads; attention here is unmasked (the bidirectional teacher path),
    making KV chunk order irrelevant.

    impl: "dense" (pure jnp, differentiable — the small-shape / non-128
    head-dim fallback) or "flash" (Pallas, ALSO differentiable: the ring
    has its own custom VJP — see ops.attention.ring_flash_attention — so
    big-teacher training runs the kernel fwd+bwd).
    """
    from ..ops.attention import dense_attention_lse, ring_flash_attention
    if impl == "flash":
        on_tpu = jax.default_backend() in ("tpu", "axon")
        return ring_flash_attention(q, k, v, axis_name,
                                    interpret=not on_tpu)
    ring = jax.lax.axis_size(axis_name)
    perm = [(i, (i + 1) % ring) for i in range(ring)]
    chunk_fn = dense_attention_lse

    out, lse = chunk_fn(q, k, v)          # lse [B, N, Lq]
    kr, vr = k, v
    for _ in range(ring - 1):
        kr = jax.lax.ppermute(kr, axis_name, perm)
        vr = jax.lax.ppermute(vr, axis_name, perm)
        o_c, lse_c = chunk_fn(q, kr, vr)
        m = jnp.maximum(lse, lse_c)
        w = jnp.exp(lse - m)
        w_c = jnp.exp(lse_c - m)
        tot = w + w_c
        # weights ride [B, N, Lq] -> broadcast to [B, Lq, N, D]
        wq = jnp.swapaxes(w / tot, 1, 2)[..., None]
        wc = jnp.swapaxes(w_c / tot, 1, 2)[..., None]
        out = (out.astype(jnp.float32) * wq
               + o_c.astype(jnp.float32) * wc).astype(out.dtype)
        lse = m + jnp.log(tot)
    return out


def ulysses_attention(q, k, v, axis_name: str,
                      ring_axis: Optional[str] = None,
                      ring_impl: str = "dense"):
    """All-to-all head/sequence reshuffle + local full-seq attention
    (xdit_context_parallel.py:149-192).  With `ring_axis`, composes with
    ring attention (full USP): heads split over `axis_name`, the remaining
    sequence shards rotate over `ring_axis` — total sp = ulysses * ring can
    then exceed the head count."""
    # [B, L/sp, N, D] -> [B, L/ring, N/sp_u, D]
    qg = jax.lax.all_to_all(q, axis_name, split_axis=2, concat_axis=1,
                            tiled=True)
    kg = jax.lax.all_to_all(k, axis_name, split_axis=2, concat_axis=1,
                            tiled=True)
    vg = jax.lax.all_to_all(v, axis_name, split_axis=2, concat_axis=1,
                            tiled=True)
    if ring_axis is None:
        out = attention(qg, kg, vg)
    else:
        out = ring_attention(qg, kg, vg, ring_axis, impl=ring_impl)
    # back to [B, L/sp, N, D]
    return jax.lax.all_to_all(out, axis_name, split_axis=1, concat_axis=2,
                              tiled=True)


def usp_dit_forward(params: Params, cfg, latents: jnp.ndarray,
                    t: jnp.ndarray, context: jnp.ndarray, mesh: Mesh,
                    sp_axis: str = "sp",
                    ring_axis: Optional[str] = None,
                    ring_impl: str = "dense") -> jnp.ndarray:
    """Sequence-parallel bidirectional Wan DiT forward (teacher path).

    latents [B, F, C, H, W]; t [B] (uniform timestep — the teacher's case,
    so AdaLN modulation broadcasts over tokens and frame boundaries need
    not align with shards); context [B, T, text_dim].

    With `ring_axis` the token dim shards over sp_axis x ring_axis (full
    USP): Ulysses all-to-alls heads over sp_axis, ring attention rotates KV
    over ring_axis — total sequence parallelism beyond num_heads.
    """
    sp = mesh.shape[sp_axis]
    ring = mesh.shape[ring_axis] if ring_axis else 1
    B, F, C, H, W = latents.shape
    grid = (H // cfg.patch_size[1], W // cfg.patch_size[2])
    S = grid[0] * grid[1]
    L = F * S
    assert L % (sp * ring) == 0, \
        f"seq len {L} must be a multiple of sp*ring={sp * ring}"
    n, d = cfg.num_heads, cfg.dim // cfg.num_heads
    assert n % sp == 0, f"heads {n} must be a multiple of ulysses sp={sp}"

    x = patchify(params["patch_embedding"], latents, cfg.patch_size)
    e, e0 = time_embed(params, cfg, t[:, None])     # [B,1,D], [B,1,6,D]
    ctx = embed_text(params, context.astype(x.dtype))
    ctx_kv = precompute_context_kv(params, cfg, ctx)
    cos_np, sin_np = window_rope_table(F, grid[0], grid[1], d)
    cos, sin = jnp.asarray(cos_np), jnp.asarray(sin_np)

    def local_forward(x_loc, e, e0, cos_loc, sin_loc, blocks, ctx_kv,
                      head_p):
        """Runs on each sp shard; x_loc [B, L/sp, D]."""
        e6_base = e0.astype(jnp.float32)            # [B,1,6,D]

        def self_attn(sp_p, xm):
            Ll = xm.shape[1]
            q, k, v = qkv_project(sp_p, xm, n, d, cos_loc, sin_loc)
            out = ulysses_attention(q, k, v, sp_axis, ring_axis=ring_axis,
                                    ring_impl=ring_impl)
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

    seq_axes = (sp_axis, ring_axis) if ring_axis else sp_axis
    sharded = shard_map(
        local_forward, mesh=mesh,
        in_specs=(P(None, seq_axes, None), P(), P(), P(seq_axes),
                  P(seq_axes), P(), P(), P()),
        out_specs=P(None, seq_axes, None),
        check_vma=False,     # pallas_call (ring flash) can't declare vma
    )
    out_tokens = sharded(x, e, e0, cos, sin, params["blocks"], ctx_kv,
                         params["head"])
    return unpatchify(out_tokens, F, grid, cfg.patch_size, cfg.out_dim)
