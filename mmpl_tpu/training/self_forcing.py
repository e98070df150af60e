"""Self-forcing generator rollout for distillation training.

Re-design of `MMPL_t2v/pipeline/self_forcing_training.py`
(SelfForcingTrainingPipeline.inference_with_trajectory): the causal
generator unrolls its own few-step sampling loop block by block, but
gradients flow through exactly ONE randomly-chosen denoising step per block
(the `exit_flags` trick, :136-194) and only for blocks inside the last 21
frames (:137,:174-193); after each block the KV cache is committed from the
context-noised prediction (:199-216).

JAX design: the no-grad chain runs fully with `stop_gradient`, collecting
the per-step noisy inputs; the selected step is then recomputed once *with*
gradient (`jnp.where` selection keeps the graph static).  The reference's
rank-0 `dist.broadcast` of the random indices (:41-58) is replaced by
deriving `exit_flags` from a PRNG key that is identical on all data-parallel
shards — same synchronisation, no collective.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.fps_dit import fps_forward_group, init_kv_cache
from ..pipelines.causal_inference import block_schedule
from ..schedulers.flow_match import FlowMatchScheduler


class SelfForcingRollout:
    def __init__(self, cfg, scheduler: FlowMatchScheduler,
                 denoising_step_list: Sequence[int] = (1000, 750, 500, 250),
                 num_frame_per_block: int = 3,
                 context_noise: int = 0,
                 same_step_across_blocks: bool = True,
                 last_step_only: bool = False,
                 num_max_frames: int = 21,
                 grad_frame_window: int = 21,
                 dtype=jnp.float32):
        steps = [int(t) for t in denoising_step_list]
        if steps[-1] == 0:
            steps = steps[:-1]
        self.steps = tuple(steps)
        self.cfg = cfg
        self.scheduler = scheduler
        self.num_frame_per_block = num_frame_per_block
        self.context_noise = context_noise
        self.same_step_across_blocks = same_step_across_blocks
        self.last_step_only = last_step_only
        self.num_max_frames = num_max_frames
        self.grad_frame_window = grad_frame_window
        self.dtype = dtype

    def sample_exit_flags(self, rng, num_blocks: int) -> jnp.ndarray:
        """[num_blocks] int32; use a dp-replicated key for cross-shard sync."""
        if self.last_step_only:
            return jnp.full((num_blocks,), len(self.steps) - 1, jnp.int32)
        return jax.random.randint(rng, (num_blocks,), 0, len(self.steps))

    def rollout(self, params, ctx_kv, noise: jnp.ndarray,
                exit_flags: jnp.ndarray, rng,
                initial_latent: Optional[jnp.ndarray] = None):
        """Returns (output [B, F_total, C, H, W] with grad at selected steps,
        denoised_timestep_from, denoised_timestep_to) — the latter two are
        None unless same_step_across_blocks (reference :224-236)."""
        cfg = self.cfg
        sch = self.scheduler
        B, F, C, H, W = noise.shape
        nb = self.num_frame_per_block
        num_blocks = F // nb
        n_init = 0 if initial_latent is None else initial_latent.shape[1]
        total = F + n_init
        grad_start_frame = total - self.grad_frame_window

        cache = init_kv_cache(cfg, B, H * W // 4,
                              num_slots=max(total, self.num_max_frames),
                              dtype=self.dtype)
        outputs: List[jnp.ndarray] = []
        start = 0
        flat = lambda a: a.reshape((-1,) + a.shape[2:])

        def fwd(x, t_scalar, schedule, cache, grad: bool):
            tt = jnp.full((B, schedule.num_frames), t_scalar, jnp.float32)
            p = params if grad else jax.lax.stop_gradient(params)
            flow, cache = fps_forward_group(
                p, cfg, x.astype(self.dtype), tt, ctx_kv, cache, schedule)
            x0 = sch.convert_flow_pred_to_x0(
                flat(flow).astype(jnp.float32), flat(x), tt.reshape(-1)
            ).reshape(x.shape)
            return x0, cache

        if initial_latent is not None:
            sched0 = block_schedule(0, n_init, self.num_max_frames)
            _, cache = fwd(jax.lax.stop_gradient(
                initial_latent.astype(jnp.float32)), 0.0, sched0, cache,
                grad=False)
            outputs.append(initial_latent.astype(jnp.float32))
            start = n_init

        for b in range(num_blocks):
            sched = block_schedule(start, nb, self.num_max_frames)
            x = noise[:, b * nb:(b + 1) * nb].astype(jnp.float32)
            flag = exit_flags[0] if self.same_step_across_blocks \
                else exit_flags[b]

            # no-grad chain, collecting each step's noisy input
            noisy_inputs = [x]
            xi = x
            for i, t_int in enumerate(self.steps[:-1]):
                x0, cache = fwd(jax.lax.stop_gradient(xi), float(t_int),
                                sched, cache, grad=False)
                rng, k = jax.random.split(rng)
                nz = jax.random.normal(k, xi.shape, jnp.float32)
                nt = jnp.full((B * nb,), float(self.steps[i + 1]))
                xi = sch.add_noise(flat(jax.lax.stop_gradient(x0)),
                                   flat(nz), nt).reshape(xi.shape)
                noisy_inputs.append(xi)

            # graded recompute at the selected step only
            stacked = jnp.stack(noisy_inputs)          # [S, B, nb, C, H, W]
            sel = jax.lax.stop_gradient(
                stacked[jnp.clip(flag, 0, len(self.steps) - 1)])
            t_sel = jnp.asarray(self.steps, jnp.float32)[flag]
            tt = jnp.full((B, nb), 1.0, jnp.float32) * t_sel
            use_grad = start >= grad_start_frame
            p = params if use_grad else jax.lax.stop_gradient(params)
            flow, cache = fps_forward_group(
                p, cfg, sel.astype(self.dtype), tt, ctx_kv, cache, sched)
            x0 = sch.convert_flow_pred_to_x0(
                flat(flow).astype(jnp.float32), flat(sel),
                tt.reshape(-1)).reshape(sel.shape)
            outputs.append(x0)

            # context-noise commit (:199-216)
            rng, k = jax.random.split(rng)
            ct = jnp.full((B * nb,), float(self.context_noise))
            committed = sch.add_noise(
                flat(jax.lax.stop_gradient(x0)),
                flat(jax.random.normal(k, x0.shape, jnp.float32)),
                ct).reshape(x0.shape)
            _, cache = fwd(committed, float(self.context_noise), sched,
                           cache, grad=False)
            start += nb

        output = jnp.concatenate(outputs, axis=1)

        if not self.same_step_across_blocks:
            return output, None, None
        # denoised timestep range (:224-236): 1000 - index of the step's
        # nearest schedule entry
        ts = sch.timesteps
        flag0 = exit_flags[0]
        step_vals = jnp.asarray(self.steps, jnp.float32)

        def t_idx(v):
            return 1000 - jnp.argmin(jnp.abs(ts - v))

        t_from = t_idx(step_vals[flag0])
        is_last = flag0 == len(self.steps) - 1
        t_to = jnp.where(
            is_last, 0,
            t_idx(step_vals[jnp.minimum(flag0 + 1, len(self.steps) - 1)]))
        return output, t_from, t_to
