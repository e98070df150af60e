"""Self-forcing generator rollout for distillation training.

Re-design of `MMPL_t2v/pipeline/self_forcing_training.py`
(SelfForcingTrainingPipeline.inference_with_trajectory): the causal
generator unrolls its own few-step sampling loop block by block, but
gradients flow through exactly ONE randomly-chosen denoising step per block
(the `exit_flags` trick, :136-194) and only for blocks inside the last 21
frames (:137,:174-193); after each block the KV cache is committed from the
context-noised prediction (:199-216).

JAX design: the no-grad chain early-exits at the sampled flag — a
`lax.fori_loop` whose body is gated by `lax.cond(i < flag)`, so skipped
steps cost nothing at runtime while shapes stay static — then the selected
step runs once *with* gradient (matching the reference's `break` at
exit_flag, :147-156).  The reference's
rank-0 `dist.broadcast` of the random indices (:41-58) is replaced by
deriving `exit_flags` from a PRNG key that is identical on all data-parallel
shards — same synchronisation, no collective.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

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
                 remat: bool = True,
                 quantize_cache: bool = False,
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
        #: rematerialise the graded per-block forward on backward (the
        #: reference's torch.utils.checkpoint per block): without it every
        #: block's per-layer residuals (incl. [tokens, ffn] intermediates)
        #: stay live across the whole rollout — 12 layers x 3 blocks at
        #: 1.3B geometry wants >100 GB (measured, tools/distill_probe.py)
        self.remat = remat
        #: int8 rollout KV cache (models.fps_dit.init_kv_cache): valid in
        #: training because cache gradients are severed below anyway (the
        #: reference's no_grad cache); frees ~half the rollout cache HBM
        self.quantize_cache = bool(quantize_cache)
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
                              dtype=self.dtype,
                              quantize=self.quantize_cache)
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

        step_vals = jnp.asarray(self.steps, jnp.float32)

        for b in range(num_blocks):
            sched = block_schedule(start, nb, self.num_max_frames)
            x = noise[:, b * nb:(b + 1) * nb].astype(jnp.float32)
            flag = exit_flags[0] if self.same_step_across_blocks \
                else exit_flags[b]
            flag = jnp.clip(flag, 0, len(self.steps) - 1)

            # Early-exit no-grad chain (the reference breaks at exit_flag,
            # self_forcing_training.py:136-194): only the `flag` steps
            # before the graded one execute — `lax.cond` skips the rest at
            # runtime, so the expected per-block cost is (S-1)/2 + 2
            # forwards instead of S + 1.
            def _nograd_step(i, carry, sched=sched):
                xi, cache, key = carry
                key, k = jax.random.split(key)

                def run(c):
                    xi, cache = c
                    tt = jnp.broadcast_to(step_vals[i], (B, nb))
                    flow, cache = fps_forward_group(
                        jax.lax.stop_gradient(params), cfg,
                        jax.lax.stop_gradient(xi).astype(self.dtype), tt,
                        ctx_kv, cache, sched)
                    x0 = sch.convert_flow_pred_to_x0(
                        flat(flow).astype(jnp.float32), flat(xi),
                        tt.reshape(-1)).reshape(xi.shape)
                    nz = jax.random.normal(k, xi.shape, jnp.float32)
                    nt = jnp.broadcast_to(step_vals[i + 1], (B * nb,))
                    xi = sch.add_noise(flat(jax.lax.stop_gradient(x0)),
                                       flat(nz), nt).reshape(xi.shape)
                    return xi, cache

                xi, cache = jax.lax.cond(i < flag, run, lambda c: c,
                                         (xi, cache))
                return xi, cache, key

            xi, cache, rng = jax.lax.fori_loop(
                0, len(self.steps) - 1, _nograd_step, (x, cache, rng))

            # graded forward at the selected step only
            sel = jax.lax.stop_gradient(xi)
            t_sel = step_vals[flag]
            tt = jnp.full((B, nb), 1.0, jnp.float32) * t_sel
            use_grad = start >= grad_start_frame
            p = params if use_grad else jax.lax.stop_gradient(params)

            # per-LAYER remat inside the group forward (not an outer
            # whole-group checkpoint: that still lets the inner layer
            # scan's linearisation save every layer's ffn intermediates
            # during the recompute — measured 35 GB at 12L/3-block 1.3B)
            flow, cache = fps_forward_group(
                p, cfg, sel.astype(self.dtype), tt, ctx_kv, cache, sched,
                remat=self.remat)
            # Sever gradient flow through the cache: the reference's cache
            # writes all happen under no_grad (self_forcing_training.py),
            # and the clean commit below overwrites this block's slots
            # anyway — without this, the graded write threads params-grads
            # through every later block's fori_loop, which AD converts to
            # a scan that saves each no-grad step's layer residuals
            # ([steps, layers, tokens, ffn] ~ 100 GB at 1.3B geometry;
            # measured, tools/distill_probe.py).
            cache = jax.tree.map(jax.lax.stop_gradient, cache)
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
