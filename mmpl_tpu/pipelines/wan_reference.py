"""Upstream Wan2.1 reference pipelines: whole-clip T2V / I2V generation.

Re-design of `MMPL_t2v/wan/text2video.py` (WanT2V.generate) and
`wan/image2video.py` (WanI2V.generate) — the teacher / comparison paths
kept intact by the reference.  50-step UniPC with CFG over the bidirectional
Wan DiT, optional sequence parallelism over an `sp` mesh axis (replacing the
xDiT/xfuser USP monkey-patch, text2video.py:87-99), i2v conditioning via
CLIP visual tokens + the channel-concat mask/latent `y`
(image2video.py:200-246).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..models import vae as vae_mod
from ..models.clip import (VIT_H_14, clip_visual_forward, preprocess_image)
from ..models.dit import dit_forward
from ..schedulers.unipc import FlowUniPC


def build_i2v_conditioning(vae_params, image: jnp.ndarray,
                           num_frames: int = 21) -> jnp.ndarray:
    """The i2v `y` tensor (image2video.py:207-246): a 4-channel first-frame
    mask (frame 0 replicated 4x in the temporal packing) concatenated with
    the VAE latents of [image, 80 zero frames].

    image: [B, 3, H, W] in [-1, 1].  Returns [B, F, 20, H/8, W/8].
    """
    B, _, H, W = image.shape
    lat_h, lat_w = H // 8, W // 8
    T_pix = (num_frames - 1) * 4 + 1

    msk = jnp.zeros((B, T_pix, lat_h, lat_w), jnp.float32).at[:, 0].set(1.0)
    msk = jnp.concatenate([jnp.repeat(msk[:, 0:1], 4, axis=1), msk[:, 1:]],
                          axis=1)
    msk = msk.reshape(B, num_frames, 4, lat_h, lat_w)

    clip_vid = jnp.concatenate(
        [image[:, None], jnp.zeros((B, T_pix - 1, 3, H, W), image.dtype)],
        axis=1)
    lat = vae_mod.encode(vae_params, clip_vid)        # [B, F, 16, h, w]
    return jnp.concatenate([msk, lat], axis=2)


class WanT2V:
    """Whole-clip text-to-video (text2video.py:26-266)."""

    def __init__(self, cfg, params, vae_params, text_encoder=None,
                 sampling_steps: int = 50, timestep_shift: float = 5.0,
                 guidance_scale: float = 5.0, mesh=None,
                 dtype=jnp.bfloat16):
        self.cfg = cfg
        if "qkv" not in params["blocks"]["self_attn"]:
            from ..models.dit import fuse_qkv_params
            params = fuse_qkv_params(params, num_heads=cfg.num_heads)
        self.params = params
        self.vae_params = vae_params
        self.text_encoder = text_encoder
        self.guidance_scale = float(guidance_scale)
        self.mesh = mesh
        self.dtype = dtype
        self.sampler = FlowUniPC(sampling_steps, shift=timestep_shift)
        self._fn = None

    def _forward(self, params, lat2, t2, ctx2, clip_fea=None, y2=None):
        if self.mesh is not None and "sp" in self.mesh.shape \
                and self.mesh.shape["sp"] > 1 and clip_fea is None:
            from ..parallel.sequence_parallel import usp_dit_forward
            return usp_dit_forward(params, self.cfg, lat2, t2, ctx2,
                                   self.mesh)
        return dit_forward(params, self.cfg, lat2, t2, ctx2,
                           clip_fea=clip_fea, y=y2)

    def generate(self, noise: jnp.ndarray, cond_context: jnp.ndarray,
                 uncond_context: jnp.ndarray,
                 clip_fea: Optional[jnp.ndarray] = None,
                 y: Optional[jnp.ndarray] = None,
                 decode: bool = True) -> jnp.ndarray:
        B = noise.shape[0]
        sampler = self.sampler
        ctx2 = jnp.concatenate([cond_context, uncond_context], 0).astype(
            self.dtype)
        clip2 = None if clip_fea is None else jnp.concatenate(
            [clip_fea, clip_fea], 0).astype(self.dtype)
        y2 = None if y is None else jnp.concatenate([y, y], 0).astype(
            self.dtype)

        @jax.jit
        def seg(params, state, coefs, ts):
            def body(state, step_in):
                coef, t = step_in
                lat2 = jnp.concatenate([state["sample"], state["sample"]], 0)
                t2 = jnp.broadcast_to(t, (2 * B,))
                flow2 = self._forward(params, lat2.astype(self.dtype), t2,
                                      ctx2, clip2, y2)
                c, u = flow2[:B], flow2[B:]
                flow = (u.astype(jnp.float32)
                        + self.guidance_scale * (c - u).astype(jnp.float32))
                return FlowUniPC.step(coef, state, flow), None

            state, _ = jax.lax.scan(body, state, (coefs, ts))
            return state

        # segmented like the MMPL pipelines (MMPL_STEPS_PER_PROGRAM):
        # bit-identical to one 50-step scan, needed where the worker kills
        # long programs (a 1.3B full-clip CFG step is seconds)
        import os
        state = jax.jit(sampler.init_state)(noise.astype(jnp.float32))
        ts = sampler.timesteps
        n = len(ts)
        spp = int(os.environ.get("MMPL_STEPS_PER_PROGRAM", "0"))
        step = spp if spp > 0 else n
        for s in range(0, n, step):
            e = min(s + step, n)
            state = seg(self.params, state,
                        jax.tree.map(lambda a: a[s:e], sampler.table),
                        ts[s:e])
        latents = state["sample"]
        if not decode:
            return latents
        return vae_mod.decode_streaming(self.vae_params,
                                        latents.astype(jnp.float32))


class WanI2V(WanT2V):
    """Whole-clip image-to-video (image2video.py): adds CLIP visual context
    and the y-concat conditioning; requires an i2v-config DiT (in_dim 36)."""

    def __init__(self, *args, clip_params=None, **kwargs):
        super().__init__(*args, **kwargs)
        self.clip_params = clip_params

    def generate_from_image(self, noise: jnp.ndarray, image: jnp.ndarray,
                            cond_context: jnp.ndarray,
                            uncond_context: jnp.ndarray,
                            decode: bool = True) -> jnp.ndarray:
        """image [B, 3, H, W] in [-1, 1]; noise [B, F, 16, H/8, W/8]."""
        assert self.clip_params is not None
        clip_in = preprocess_image(image.astype(jnp.float32))
        clip_tokens = clip_visual_forward(self.clip_params, clip_in,
                                          VIT_H_14, use_31_block=True)
        y = build_i2v_conditioning(self.vae_params,
                                   image.astype(jnp.float32),
                                   noise.shape[1])
        return self.generate(noise, cond_context, uncond_context,
                             clip_fea=clip_tokens, y=y, decode=decode)
