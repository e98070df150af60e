"""Sequential block-causal AR sampling with 50-step UniPC + CFG.

Re-design of `MMPL_t2v/pipeline/causal_diffusion_inference.py`
(CausalDiffusionInferencePipeline): plain next-block-prediction —
`num_frame_per_block=3` frames at a time, each block denoised by a full
50-step UniPC loop with classifier-free guidance (separate pos/neg caches,
here the batched cache halves), then committed clean at t=0
(:144-208,:272-290).  This is the non-planned baseline the MMPL FPS
pipeline improves on; per-block programs are jitted with the denoising loop
as one `lax.scan`.

Memory model (same as fps_inference.py): the KV cache is a loop INVARIANT
of the solver scan, not a carry — a block never reads its own slots
(`fps_forward_group` filters own frames out of the visibility gather), so
the per-step cache writes are dead until the final clean commit.  Keeping
the cache out of the carry halves its footprint (no double-buffer through
the scan) and lets XLA DCE the dead writes.  `MMPL_STEPS_PER_PROGRAM`
optionally splits the solver loop into bounded-runtime segments (this
image's tunneled TPU worker kills programs running >~70 s) — bit-identical
outputs.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp

from ..core.geometry import GroupSchedule
from ..models.dit import embed_text, precompute_context_kv
from ..models.fps_dit import fps_forward_group, init_kv_cache
from ..schedulers.unipc import FlowUniPC
from .causal_inference import block_schedule


class CausalDiffusionInferencePipeline:
    def __init__(self, cfg, params, sampling_steps: int = 50,
                 timestep_shift: float = 8.0, guidance_scale: float = 5.0,
                 num_frame_per_block: int = 3,
                 local_attn_frames: int = 21,
                 quantize: Optional[str] = None,
                 quantize_cache: bool = False,
                 dtype=jnp.bfloat16):
        """quantize_cache=True stores the KV cache int8 with per-token
        scales (models.fps_dit.init_kv_cache) — the cache is the dominant
        HBM resident of this pipeline (12.06 GB at 1.3B batched-CFG,
        21 slots), so this halves it; K/V dequantise after the visibility
        gather, attention stays bf16."""
        self.cfg = cfg
        if "qkv" not in params["blocks"]["self_attn"]:
            from ..models.dit import fuse_qkv_params
            params = fuse_qkv_params(params, num_heads=cfg.num_heads)
        from ..models.dit import apply_quantize
        params = apply_quantize(params, quantize, cfg)
        self.params = params
        self.guidance_scale = float(guidance_scale)
        self.num_frame_per_block = num_frame_per_block
        self.local_attn_frames = local_attn_frames
        self.quantize_cache = bool(quantize_cache)
        self.dtype = dtype
        self.sampler = FlowUniPC(sampling_steps, shift=timestep_shift)
        self.steps_per_program = int(
            os.environ.get("MMPL_STEPS_PER_PROGRAM", "0"))
        self._fns = {}
        self._seg_fns = {}
        self._commit_fns = {}

    def _solver_body(self, schedule: GroupSchedule, params, ctx_kv2, cache):
        """One CFG UniPC step closure over the (invariant) cache."""
        def body(state, step_in):
            coef, t = step_in
            B = state["sample"].shape[0]
            lat2 = jnp.concatenate([state["sample"], state["sample"]], 0)
            tt = jnp.broadcast_to(t, (2 * B, schedule.num_frames))
            flow2, _ = fps_forward_group(
                params, self.cfg, lat2.astype(self.dtype), tt, ctx_kv2,
                cache, schedule)
            cond, uncond = flow2[:B], flow2[B:]
            flow = (uncond.astype(jnp.float32) + self.guidance_scale
                    * (cond.astype(jnp.float32)
                       - uncond.astype(jnp.float32)))
            return FlowUniPC.step(coef, state, flow), None
        return body

    def _denoise_block(self, schedule: GroupSchedule, params, ctx_kv2,
                       cache, noisy):
        B, G = noisy.shape[0], schedule.num_frames
        state = self.sampler.init_state(noisy.astype(jnp.float32))
        # cache is a loop invariant (see module docstring) — only the
        # clean commit below writes it
        state, _ = jax.lax.scan(
            self._solver_body(schedule, params, ctx_kv2, cache), state,
            (self.sampler.table, self.sampler.timesteps))
        final = state["sample"]
        lat2 = jnp.concatenate([final, final], 0)
        tt = jnp.zeros((2 * B, G), jnp.float32)
        _, cache = fps_forward_group(params, self.cfg,
                                     lat2.astype(self.dtype), tt, ctx_kv2,
                                     cache, schedule)
        return final, cache

    def _denoise_segment(self, schedule: GroupSchedule, params, ctx_kv2,
                         cache, state, coefs, ts):
        """A slice of the solver loop (table slice passed as inputs so ONE
        compiled program serves every same-length segment)."""
        state, _ = jax.lax.scan(
            self._solver_body(schedule, params, ctx_kv2, cache), state,
            (coefs, ts))
        return state

    def _run_block_segmented(self, start: int, G: int, ctx_kv2, cache,
                             noisy):
        key = (start, G)
        if key not in self._seg_fns:
            sched = block_schedule(start, G, self.local_attn_frames)
            self._seg_fns[key] = jax.jit(functools.partial(
                self._denoise_segment, sched), donate_argnums=(3,))
        seg = self._seg_fns[key]
        if "init" not in self._seg_fns:
            # jitted so the state leaves are DISTINCT buffers — eager
            # init_state aliases one zeros array into m0/m1/last_sample,
            # which the donating segment call would double-donate
            self._seg_fns["init"] = jax.jit(
                lambda x: self.sampler.init_state(x.astype(jnp.float32)))
        state = self._seg_fns["init"](noisy)
        table, ts = self.sampler.table, self.sampler.timesteps
        n, K = int(ts.shape[0]), self.steps_per_program
        for s in range(0, n, K):
            e = min(s + K, n)
            coefs = jax.tree.map(lambda a: a[s:e], table)
            state = seg(self.params, ctx_kv2, cache, state, coefs, ts[s:e])
        final = state["sample"]
        fn = self._get(self._commit_fns, self._commit_block, start, G)
        cache = fn(self.params, ctx_kv2, cache, final)
        return final, cache

    def _commit_block(self, schedule, params, ctx_kv2, cache, clean):
        B, G = clean.shape[0], schedule.num_frames
        lat2 = jnp.concatenate([clean, clean], 0).astype(self.dtype)
        tt = jnp.zeros((2 * B, G), jnp.float32)
        _, cache = fps_forward_group(params, self.cfg, lat2, tt, ctx_kv2,
                                     cache, schedule)
        return cache

    def _get(self, fns, fn, start, G):
        key = (start, G)
        if key not in fns:
            sched = block_schedule(start, G, self.local_attn_frames)
            fns[key] = jax.jit(functools.partial(fn, sched),
                               donate_argnums=(2,))
        return fns[key]

    def inference(self, noise: jnp.ndarray, cond_context: jnp.ndarray,
                  uncond_context: jnp.ndarray,
                  initial_latent: Optional[jnp.ndarray] = None
                  ) -> jnp.ndarray:
        B, F, C, H, W = noise.shape
        nb = self.num_frame_per_block
        n_init = 0 if initial_latent is None else initial_latent.shape[1]
        ctx = jnp.concatenate([cond_context, uncond_context], 0)
        emb = embed_text(self.params, ctx.astype(self.dtype))
        ctx_kv2 = precompute_context_kv(self.params, self.cfg, emb)
        cache = init_kv_cache(self.cfg, 2 * B, H * W // 4,
                              num_slots=max(n_init + F,
                                            self.local_attn_frames),
                              dtype=self.dtype,
                              quantize=self.quantize_cache)
        outputs = []
        start = 0
        if initial_latent is not None:
            for s in range(0, n_init, nb):
                g = min(nb, n_init - s)
                fn = self._get(self._commit_fns, self._commit_block, start, g)
                clean = initial_latent[:, s:s + g].astype(jnp.float32)
                cache = fn(self.params, ctx_kv2, cache, clean)
                outputs.append(clean)
                start += g
        for s in range(0, F, nb):
            g = min(nb, F - s)
            if self.steps_per_program > 0:
                x, cache = self._run_block_segmented(
                    start, g, ctx_kv2, cache, noise[:, s:s + g])
            else:
                fn = self._get(self._fns, self._denoise_block, start, g)
                x, cache = fn(self.params, ctx_kv2, cache,
                              noise[:, s:s + g])
            outputs.append(x)
            start += g
        return jnp.concatenate(outputs, axis=1)
