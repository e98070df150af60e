"""Causal FPS Wan DiT: the MMPL planned-KV-cache model, TPU-native.

Re-design of `MMPL_t2v/wan/modules/causal_fps_model.py` (CausalFPSWanModel).
The reference addresses its KV cache with runtime Python lists
(`current_start`, `attention_vis_index`, the `slot-6` remap and the
`15*1560` append branch, causal_fps_model.py:193-264).  All of that is a
pure function of the static chunk plan, so here every chunk-group runs as a
single XLA program:

  * the KV cache is an explicit pytree of [num_layers, B, SLOTS, S, N, d]
    arrays (SLOTS = 15 frame slots, S = tokens/frame) threaded through the
    group loop;
  * cache writes are static `.at[slot].set` updates at the group's
    precomputed `write_slots`;
  * visibility is a static gather of `visible_slots` — **no attention mask
    at all**, the gathered set *is* the mask (attention is dense over it);
  * RoPE is applied at each frame's absolute window position via
    compile-time cos/sin tables (causal_fps_rope_apply semantics,
    causal_fps_model.py:27-55).

Queries in append-mode groups (the group containing frame 15) attend to the
gathered cache plus their own in-flight keys and never write the cache
(causal_fps_model.py:254-264).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.geometry import GroupSchedule, KV_CACHE_SLOTS
from ..ops.attention import attention
from ..ops.rope import rope_table
from .dit import (Params, block_forward, head_forward, linear, patchify,
                  remat_layer,
                  precompute_context_kv, embed_text, qkv_project,
                  time_embed, unpatchify)


def init_kv_cache(cfg, batch_size: int, tokens_per_frame: int,
                  num_slots: int = KV_CACHE_SLOTS,
                  dtype=jnp.bfloat16, quantize: bool = False) -> Params:
    """Zeroed planned KV cache (casual_fps_inference.py:453-480).

    Layout [L, B, SLOTS, S, N*d]: frame-slot granular so plan writes and
    visibility gathers are single static slices.  Heads are MERGED into
    the minor dim on purpose: TPU tiles the two minor dims as (8, 128), so
    a trailing (N=12, d=128) would pad 12 -> 16 sublanes — +33% HBM on
    every cache buffer plus layout-conversion copies (the 1.3B batched-CFG
    cache measured 10.7 GB instead of 8.0).  (S, N*d) = (1560, 1536) tiles
    exactly, and the (n, d) split/merge at the attention boundary is a
    free minor-dim reshape.

    quantize=True stores K/V as int8 with per-token f32 scales
    ([L, B, SLOTS, S] — one scale across the merged head dim; K is
    per-head RMS-normalised by the QK-norm so head magnitudes are
    comparable): the cache — the dominant HBM resident at 50-step CFG
    scale (12.06 GB for the 1.3B causal-diffusion config) — halves.
    `fps_forward_group` dequantises after the visibility gather and
    quantises at the commit write; attention itself stays bf16.
    """
    n, d = cfg.num_heads, cfg.dim // cfg.num_heads
    shape = (cfg.num_layers, batch_size, num_slots, tokens_per_frame, n * d)
    if not quantize:
        return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}
    return {"k": jnp.zeros(shape, jnp.int8),
            "v": jnp.zeros(shape, jnp.int8),
            "k_scale": jnp.zeros(shape[:-1], jnp.float32),
            "v_scale": jnp.zeros(shape[:-1], jnp.float32)}


def _quantize_cache_tokens(x: jnp.ndarray):
    """[..., C] float -> (int8 [..., C], f32 scale [...]) per-token."""
    xf = x.astype(jnp.float32)
    s = jnp.max(jnp.abs(xf), axis=-1) / 127.0
    s = jnp.maximum(s, 1e-12)
    xq = jnp.clip(jnp.round(xf / s[..., None]), -127, 127)
    return xq.astype(jnp.int8), s


def fps_forward_group(params: Params, cfg, latents: jnp.ndarray,
                      t: jnp.ndarray, ctx_kv: Params, kv_cache: Params,
                      schedule: GroupSchedule,
                      y: Optional[jnp.ndarray] = None,
                      rope_cs: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
                      remat: bool = False,
                      remat_offload: bool = False,
                      stop_cache_grad: bool = False,
                      ) -> Tuple[jnp.ndarray, Params]:
    """One forward of the group's frames through the whole trunk.

    Args:
      latents: [B, G, C, H, W] noisy latents of the group's frames (ascending
        frame order, matching `schedule.frames`).
      t: [B, G] timesteps (the FPS pipeline passes a shared scalar per step;
        the clean-commit pass passes zeros).
      ctx_kv: per-layer cross-attention K/V from
        `dit.precompute_context_kv` (leaves [L, B, T, N, d]).
      kv_cache: pytree from `init_kv_cache`; updated copy is returned.
      schedule: static GroupSchedule for this group.
      y: optional i2v channel-concat conditioning [B, G, C', H, W].
      rope_cs: optional (cos, sin) [G*S, d//2] tables overriding the static
        per-schedule tables — the rolling-KV path computes them on device
        from a *traced* start frame so one program serves every AR step
        (causal_rope_apply's dynamic `start_frame`, causal_model.py:193-199).

    Returns (flow_pred [B, G, C_out, H, W], new_kv_cache).
    """
    if y is not None:
        latents = jnp.concatenate([latents, y], axis=2)
    B, G, C, H, W = latents.shape
    assert G == schedule.num_frames, (G, schedule)
    grid = (H // cfg.patch_size[1], W // cfg.patch_size[2])
    S = grid[0] * grid[1]
    n, d = cfg.num_heads, cfg.dim // cfg.num_heads

    x = patchify(params["patch_embedding"], latents, cfg.patch_size)
    e, e0 = time_embed(params, cfg, t)

    if rope_cs is not None:
        cos, sin = rope_cs
    else:
        cos_np, sin_np = rope_table(schedule.frames, grid[0], grid[1], d)
        cos, sin = jnp.asarray(cos_np), jnp.asarray(sin_np)

    # Attention over the visible set = cached *other* frames + the group's
    # own in-flight K/V.  Attention is permutation-invariant over KV, so we
    # never materialise an updated cache inside the layer scan (which would
    # copy the full 15-slot cache per step); the tiny per-layer own-frame
    # K/V is emitted as scan ys and written into the (donated) cache once at
    # the end — O(group) HBM traffic instead of O(cache).
    own = set(schedule.frames) if not schedule.append_mode else set()
    other_slots = tuple(s for f, s in zip(schedule.visible_frames,
                                          schedule.visible_slots)
                        if f not in own)
    vis_other = jnp.asarray(other_slots, dtype=jnp.int32)

    quantized_cache = "k_scale" in kv_cache

    def self_attn(sp, ck, cv, cks, cvs, xm):
        """Planned-cache attention; returns (out, own_k, own_v)."""
        L = xm.shape[1]
        q, k, v = qkv_project(sp, xm, n, d, cos, sin)

        if other_slots:
            ck_g = ck[:, vis_other]
            cv_g = cv[:, vis_other]
            if cks is not None:
                # int8 cache: dequantise the gathered visible set only
                # (per-token scales; attention itself stays bf16)
                ck_g = ck_g.astype(k.dtype) * cks[:, vis_other][
                    ..., None].astype(k.dtype)
                cv_g = cv_g.astype(v.dtype) * cvs[:, vis_other][
                    ..., None].astype(v.dtype)
            kv_k = jnp.concatenate([ck_g.reshape(B, -1, n, d), k], axis=1)
            kv_v = jnp.concatenate([cv_g.reshape(B, -1, n, d), v], axis=1)
        else:
            kv_k, kv_v = k, v
        out = attention(q, kv_k, kv_v)
        return (linear(sp["o"], out.reshape(B, L, -1)),
                k.reshape(B, G, S, n * d), v.reshape(B, G, S, n * d))

    def layer_apply(x, layer_in):
        bp, ckv, ck, cv = layer_in[:4]
        cks, cvs = layer_in[4:] if quantized_cache else (None, None)
        own_kv = {}

        def self_attn_fn(xm):
            out, own_kv["k"], own_kv["v"] = self_attn(
                bp["self_attn"], ck, cv, cks, cvs, xm)
            return out

        x = block_forward(bp, cfg, x, e0, self_attn_fn, ckv, G)
        return x, (own_kv["k"], own_kv["v"])

    if remat:
        # per-layer rematerialisation for paths that TRAIN THROUGH this
        # forward (the self-forcing rollout's graded step): the backward
        # then stores only the per-layer boundary x instead of every
        # layer's attention/ffn intermediates (the [L, tokens, ffn_dim]
        # stack alone is ~1 GB/block at 1.3B geometry).  remat_offload
        # additionally parks that boundary in pinned host memory
        # (dit.remat_layer) — the full-depth distillation lever.
        layer_apply = remat_layer(layer_apply, remat_offload)

    def scan_body(x, layer_in):
        return layer_apply(x, layer_in)

    xs = (params["blocks"], ctx_kv, kv_cache["k"], kv_cache["v"])
    if quantized_cache:
        xs = xs + (kv_cache["k_scale"], kv_cache["v_scale"])
    x, (own_k, own_v) = jax.lax.scan(scan_body, x, xs)

    if stop_cache_grad:
        # Differentiated callers whose cache output is (eventually)
        # stop-gradded anyway: sever AD AT the scatter.  Otherwise the
        # linearisation of `.at[slots].set` materialises full-cache-shaped
        # u32 index/JVP temps PER LAYER ([L, G, S, N*d] ~ 0.8 GB each at
        # 30L 1.3B) even though their cotangent is zero — measured as the
        # difference between a 489 MB OOM and fitting at 30L
        # (tools/distill_probe.py, runs/distill_probe.json).  Gradient
        # equality is exact: the graded rollout step already discards
        # cache grads (self_forcing.py:214).
        own_k = jax.lax.stop_gradient(own_k)
        own_v = jax.lax.stop_gradient(own_v)
        kv_cache = jax.tree.map(jax.lax.stop_gradient, kv_cache)

    if schedule.append_mode:
        new_cache = kv_cache
    elif quantized_cache:
        slots = jnp.asarray(schedule.write_slots, dtype=jnp.int32)
        kq, ks = _quantize_cache_tokens(own_k)
        vq, vs = _quantize_cache_tokens(own_v)
        new_cache = {
            "k": kv_cache["k"].at[:, :, slots].set(kq),
            "v": kv_cache["v"].at[:, :, slots].set(vq),
            "k_scale": kv_cache["k_scale"].at[:, :, slots].set(ks),
            "v_scale": kv_cache["v_scale"].at[:, :, slots].set(vs),
        }
    else:
        slots = jnp.asarray(schedule.write_slots, dtype=jnp.int32)
        new_cache = {
            "k": kv_cache["k"].at[:, :, slots].set(own_k),
            "v": kv_cache["v"].at[:, :, slots].set(own_v),
        }

    x = head_forward(params["head"], cfg, x, e, G)
    flow = unpatchify(x, G, grid, cfg.patch_size, cfg.out_dim)
    return flow, new_cache


def fps_forward_train(params: Params, cfg, noisy: jnp.ndarray,
                      t: jnp.ndarray, context: jnp.ndarray,
                      frame_mask: jnp.ndarray,
                      clean_x: Optional[jnp.ndarray] = None,
                      aug_t: Optional[jnp.ndarray] = None,
                      remat: bool = True,
                      remat_group: int = 1,
                      remat_offload: bool = False,
                      use_flash_kernel: bool = True) -> jnp.ndarray:
    """Training forward with teacher forcing (no KV cache).

    Re-design of CausalWanModel._forward_train / CausalFPSWanModel
    (_forward_train, causal_fps_model.py:839-995): with `clean_x`, the token
    sequence is [clean | noisy] with separate per-frame time embeddings
    (aug_t for the noise-augmented clean context, causal_model.py:943-960);
    RoPE positions repeat per half; attention is dense under the frame-level
    boolean mask from `training.masks` (blockwise-causal, teacher-forcing or
    fps-forcing); the head sees only the noisy half.

    noisy: [B, F, C, H, W]; t/aug_t: [B, F]; context: [B, T, text_dim];
    frame_mask: [F, F] or [2F, 2F] bool.  Returns flow [B, F, C_out, H, W].
    """
    B, F, C, H, W = noisy.shape
    grid = (H // cfg.patch_size[1], W // cfg.patch_size[2])
    S = grid[0] * grid[1]
    n, d = cfg.num_heads, cfg.dim // cfg.num_heads

    x = patchify(params["patch_embedding"], noisy, cfg.patch_size)
    e_noisy, e0_noisy = time_embed(params, cfg, t)
    num_seq_frames = F

    if clean_x is not None:
        xc = patchify(params["patch_embedding"], clean_x, cfg.patch_size)
        if aug_t is None:
            aug_t = jnp.zeros_like(t)
        _, e0_clean = time_embed(params, cfg, aug_t)
        x = jnp.concatenate([xc, x], axis=1)
        e0 = jnp.concatenate([e0_clean, e0_noisy], axis=1)
        num_seq_frames = 2 * F
    else:
        e0 = e0_noisy

    assert frame_mask.shape == (num_seq_frames, num_seq_frames), (
        frame_mask.shape, num_seq_frames)

    cos_np, sin_np = rope_table(tuple(range(F)), grid[0], grid[1], d)
    cos = jnp.asarray(cos_np)
    sin = jnp.asarray(sin_np)
    if clean_x is not None:
        # RoPE positions repeat per half (causal_model.py:120-133)
        cos = jnp.concatenate([cos, cos], axis=0)
        sin = jnp.concatenate([sin, sin], axis=0)

    # frame-masked Pallas flash path (differentiable — custom VJP); dense
    # fallback for small shapes / non-lane-aligned head dims / CPU
    L_tok = num_seq_frames * S
    use_kernel = (use_flash_kernel
                  and jax.default_backend() in ("tpu", "axon")
                  and d % 128 == 0
                  and L_tok >= 4096)
    if use_kernel:
        # frame-masked Pallas flash path (training-scale sequences)
        import numpy as _np
        frame_ids = _np.repeat(_np.arange(num_seq_frames), S)
        fm_np = _np.asarray(frame_mask)
        tok_mask = None
    else:
        # dense fallback: token-level mask [1, 1, L, L]
        tok_mask = jnp.repeat(jnp.repeat(jnp.asarray(frame_mask), S,
                                         axis=0), S, axis=1)[None, None]

    ctx = embed_text(params, context.astype(x.dtype))
    ctx_kv = precompute_context_kv(params, cfg, ctx)

    def self_attn(sp, xm):
        L = xm.shape[1]
        q, k, v = qkv_project(sp, xm, n, d, cos, sin)
        if use_kernel:
            from ..ops.attention import frame_masked_attention
            out = frame_masked_attention(q, k, v, frame_ids, frame_ids,
                                         fm_np)
        else:
            out = attention(q, k, v, mask=tok_mask)
        return linear(sp["o"], out.reshape(B, L, -1))

    def block_apply(x, bp, ckv):
        return block_forward(bp, cfg, x, e0,
                             lambda xm: self_attn(bp["self_attn"], xm), ckv,
                             num_seq_frames)

    if remat and remat_offload:
        # full-depth single-chip training: the per-layer boundary
        # activation ([B, 2F*S, D] — 201 MB/layer at the 42x1560 TF
        # shape, ~6 GB for 30 layers) is the scan's saved residual that
        # does not fit 16 GB HBM at full depth.  Tag it and offload to
        # pinned host memory; everything else rematerialises as before.
        # The role of the reference's layer-wise CPU offload
        # (demo_utils/memory.py:13-59, FSDP cpu_offload
        # utils/distributed.py:23-68), done the XLA way (dit.remat_layer).
        block_apply = remat_layer(block_apply, offload=True)
    elif remat:
        # per-block rematerialisation (the reference's per-block
        # torch.utils.checkpoint, causal_fps_model.py:817-821)
        block_apply = remat_layer(block_apply)

    if remat and remat_group > 1:
        # grouped remat: checkpoint a g-layer segment so the scan stores
        # the inter-layer activation only every g layers — 1/g of the
        # 201 MB/layer saved-x at the 42x1560 TF shape (the full-depth
        # 1.3B backward does not fit 16 GB with per-layer boundaries).
        Lyr = cfg.num_layers
        assert Lyr % remat_group == 0, (Lyr, remat_group)
        g = remat_group
        grouped = jax.tree.map(
            lambda a: a.reshape((Lyr // g, g) + a.shape[1:]),
            (params["blocks"], ctx_kv))

        @partial(jax.checkpoint, prevent_cse=False)
        def seg_apply(x, seg_in):
            bps, ckvs = seg_in
            for i in range(g):
                bp = jax.tree.map(lambda a: a[i], bps)
                ckv = jax.tree.map(lambda a: a[i], ckvs)
                x = block_forward(bp, cfg, x, e0,
                                  lambda xm: self_attn(bp["self_attn"],
                                                       xm), ckv,
                                  num_seq_frames)
            return x

        def seg_body(x, seg_in):
            return seg_apply(x, seg_in), None

        x, _ = jax.lax.scan(seg_body, x, grouped)
    else:
        def scan_body(x, layer_in):
            bp, ckv = layer_in
            return block_apply(x, bp, ckv), None

        x, _ = jax.lax.scan(scan_body, x, (params["blocks"], ctx_kv))

    if clean_x is not None:
        x = x[:, x.shape[1] // 2:]

    x = head_forward(params["head"], cfg, x, e_noisy, F)
    return unpatchify(x, F, grid, cfg.patch_size, cfg.out_dim)
