"""R3GAN-style GAN objective on DiT features.

Re-design of `MMPL_t2v/model/gan.py` + the classify-mode machinery in
`wan/modules/model.py:357-496,728-760` and its attachment at
`utils/wan_wrapper.py:150-170`: the fake-score DiT runs in classify mode,
tapping hidden states after blocks {13, 21, 29}; each tap feeds a
GanAttentionBlock whose query is a learned register token; the three pooled
tokens (optionally concatenated with 10x the time embedding) pass through a
small classification branch; generator/critic losses are relativistic
softplus (R3GAN).

JAX design: the layer scan is split into static segments at the tap
indices, so no per-layer outputs are materialised.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..models.dit import (Params, block_forward, embed_text,
                          init_linear, layer_norm, linear, mlp, patchify,
                          precompute_context_kv, qkv_project, remat_layer,
                          rms_norm, time_embed)
from ..ops.attention import attention
from ..ops.rope import window_rope_table

GAN_TAP_LAYERS = (13, 21, 29)   # model.py:750


def init_gan_head_params(key, atten_dim: int = 1536, num_class: int = 1,
                         time_embed_dim: int = 0, num_registers: int = 3,
                         ffn_dim: int = 8192, num_heads: int = 12,
                         dtype=jnp.float32) -> Params:
    """RegisterTokens + GanAttentionBlocks + cls branch
    (model.py:357-496, wan_wrapper.py:150-170)."""
    ks = jax.random.split(key, 4 + num_registers)
    d = atten_dim

    def gan_block(k):
        kk = jax.random.split(k, 6)
        return {
            "norm3": {"weight": jnp.ones((d,), dtype),
                      "bias": jnp.zeros((d,), dtype)},
            "cross_attn": {
                "q": init_linear(kk[0], d, d, dtype),
                "k": init_linear(kk[1], d, d, dtype),
                "v": init_linear(kk[2], d, d, dtype),
                "o": init_linear(kk[3], d, d, dtype),
                "norm_q": {"weight": jnp.ones((d,), dtype)},
                "norm_k": {"weight": jnp.ones((d,), dtype)},
            },
            "norm2": {"weight": jnp.ones((d,), dtype),
                      "bias": jnp.zeros((d,), dtype)},
            "ffn": {"fc1": init_linear(kk[4], d, ffn_dim, dtype),
                    "fc2": init_linear(kk[5], ffn_dim, d, dtype)},
        }

    in_dim = d * num_registers + time_embed_dim
    return {
        "register_tokens": (jax.random.normal(
            ks[0], (num_registers, d), jnp.float32) * 0.02).astype(dtype),
        "register_norm": {"weight": jnp.ones((d,), dtype)},
        "gan_blocks": [gan_block(k) for k in ks[1:1 + num_registers]],
        "cls_branch": {
            "norm": {"weight": jnp.ones((in_dim,), dtype),
                     "bias": jnp.zeros((in_dim,), dtype)},
            "fc1": init_linear(ks[-2], in_dim, 1536, dtype),
            "fc2": init_linear(ks[-1], 1536, num_class, dtype),
        },
    }


def _gan_cross_attn(bp: Params, x: jnp.ndarray, token: jnp.ndarray,
                    num_heads: int) -> jnp.ndarray:
    """WanGanCrossAttention (model.py:197-221): query = register token,
    keys/values = the tapped hidden states; then token + FFN residual
    (GanAttentionBlock.forward, model.py:427-436)."""
    B, L, D = x.shape
    n = num_heads
    d = D // n
    ca = bp["cross_attn"]
    xn = layer_norm(x, 1e-6, bp["norm3"]["weight"], bp["norm3"]["bias"])
    q = rms_norm(linear(ca["q"], token), ca["norm_q"]["weight"]).reshape(
        B, -1, n, d)
    k = rms_norm(linear(ca["k"], xn), ca["norm_k"]["weight"]).reshape(
        B, L, n, d)
    v = linear(ca["v"], xn).reshape(B, L, n, d)
    out = attention(q, k, v).reshape(B, -1, D)
    tok = token + linear(ca["o"], out)
    y = mlp(bp["ffn"], layer_norm(tok, 1e-6, bp["norm2"]["weight"],
                                  bp["norm2"]["bias"])) + tok
    return y


def dit_forward_classify(params: Params, gan_params: Params, cfg,
                         latents: jnp.ndarray, t: jnp.ndarray,
                         context: jnp.ndarray,
                         concat_time_embeddings: bool = False,
                         gan_num_heads: Optional[int] = None,
                         remat: bool = False,
                         remat_offload: bool = False) -> jnp.ndarray:
    """Bidirectional DiT feature extraction -> GAN logits
    (model.py:637-771 classify_mode branch)."""
    B, F, C, H, W = latents.shape
    grid = (H // cfg.patch_size[1], W // cfg.patch_size[2])
    x = patchify(params["patch_embedding"], latents, cfg.patch_size)
    if t.ndim == 1:
        t = t[:, None]
    t_full = jnp.broadcast_to(t, (B, F))
    e, e0 = time_embed(params, cfg, t_full)
    ctx = embed_text(params, context.astype(x.dtype))
    ctx_kv = precompute_context_kv(params, cfg, ctx)
    head_dim = cfg.dim // cfg.num_heads
    cos_np, sin_np = window_rope_table(F, grid[0], grid[1], head_dim)
    cos, sin = jnp.asarray(cos_np), jnp.asarray(sin_np)
    n, d = cfg.num_heads, head_dim

    def self_attn(sp, xm):
        L = xm.shape[1]
        q, k, v = qkv_project(sp, xm, n, d, cos, sin)
        return linear(sp["o"], attention(q, k, v).reshape(B, L, -1))

    def scan_seg(x, seg):
        def body_apply(x, bp, ckv):
            return block_forward(bp, cfg, x, e0,
                                 lambda xm: self_attn(bp["self_attn"], xm),
                                 ckv, F)

        if remat:
            # per-layer remat when trained through at scale (see
            # dit_forward; DistillationConfig.remat); remat_offload parks
            # the layer boundary in pinned host memory (dit.remat_layer)
            body_apply = remat_layer(body_apply, remat_offload)

        def body(x, layer_in):
            bp, ckv = layer_in
            return body_apply(x, bp, ckv), None
        return jax.lax.scan(body, x, seg)[0]

    R = gan_params["register_tokens"].shape[0]
    taps = [i for i in GAN_TAP_LAYERS if i < cfg.num_layers]
    if len(taps) != R:     # small configs: R evenly spaced taps so the
        # cls-branch input width (R * dim) always matches
        taps = sorted(min(cfg.num_layers - 1,
                          max(0, round((j + 1) * cfg.num_layers / R) - 1))
                      for j in range(R))
    registers = rms_norm(gan_params["register_tokens"],
                         gan_params["register_norm"]["weight"])[None]
    registers = jnp.broadcast_to(
        registers, (B,) + registers.shape[1:]).astype(x.dtype)

    feats = []
    prev = 0
    for gi, tap in enumerate(taps):
        seg = jax.tree.map(lambda a: a[prev:tap + 1],
                           (params["blocks"], ctx_kv))
        x = scan_seg(x, seg)
        prev = tap + 1
        gp = gan_params["gan_blocks"][gi % len(gan_params["gan_blocks"])]
        feats.append(_gan_cross_attn(gp, x, registers[:, gi:gi + 1],
                                     gan_num_heads or cfg.num_heads))
    # (remaining layers are not needed for the logits)

    final = jnp.concatenate(feats, axis=1)          # [B, n_taps, D]
    cb = gan_params["cls_branch"]
    if concat_time_embeddings:
        final = jnp.concatenate([final, 10.0 * e[:, :1].astype(final.dtype)],
                                axis=1)
    flatf = final.reshape(B, -1)
    h = layer_norm(flatf, 1e-5, cb["norm"]["weight"], cb["norm"]["bias"])
    h = jax.nn.silu(linear(cb["fc1"], h))
    return linear(cb["fc2"], h)


def r3gan_generator_loss(logits_fake: jnp.ndarray) -> jnp.ndarray:
    """Softplus relativistic generator loss (model/gan.py:90-172)."""
    return jnp.mean(jax.nn.softplus(-logits_fake))


def r3gan_critic_loss(logits_real: jnp.ndarray,
                      logits_fake: jnp.ndarray) -> jnp.ndarray:
    """Softplus critic loss (model/gan.py:174-295)."""
    return jnp.mean(jax.nn.softplus(-logits_real)) + \
        jnp.mean(jax.nn.softplus(logits_fake))
