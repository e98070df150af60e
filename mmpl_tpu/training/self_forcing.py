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

from ..core.geometry import GroupSchedule
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
                 remat_offload: bool = False,
                 quantize_cache: bool = False,
                 rolling: bool = False,
                 warp_denoising_step: bool = False,
                 independent_first_frame: bool = False,
                 dtype=jnp.float32):
        steps = [float(t) for t in denoising_step_list]
        if steps[-1] == 0:
            steps = steps[:-1]
        if warp_denoising_step:
            # map the nominal step list through the shifted schedule:
            # step -> timesteps[1000-step] (base.py:22-24;
            # configs/self_forcing_dmd.yaml warp_denoising_step: true) —
            # the same warp the few-step inference pipeline applies
            ts = np.concatenate([np.asarray(scheduler.timesteps), [0.0]])
            steps = [float(ts[1000 - int(s)]) for s in steps]
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
        #: park the graded forward's per-layer boundary activations in
        #: pinned host memory (dit.remat_layer) — full-depth single-chip
        self.remat_offload = remat_offload
        if remat_offload and rolling:
            # XLA compiler bug (measured 2026-08-19, libtpu v5e): offloaded
            # remat boundaries INSIDE the rolling steady-state scan fail
            # post-optimization with "async-start expects the shape of
            # operand 0 to match the async shape" (device layout vs S(5)
            # host-space copy of the stacked boundary activations).  Plain
            # per-layer remat compiles and runs (runs/distill_probe.json);
            # offload still applies to the absolute-slot warmup blocks
            # outside the scan if ever split, so just demote globally.
            import warnings
            warnings.warn("rolling=True: demoting remat_offload to plain "
                          "remat (XLA async-copy layout bug inside the "
                          "steady-state scan)", stacklevel=2)
            self.remat_offload = False
            self.remat = True
        #: int8 rollout KV cache (models.fps_dit.init_kv_cache): valid in
        #: training because cache gradients are severed below anyway (the
        #: reference's no_grad cache); frees ~half the rollout cache HBM
        self.quantize_cache = bool(quantize_cache)
        #: rolling=True: once the video exceeds `num_max_frames`, later
        #: blocks run as ONE lax.scan over a recency-ordered fixed cache
        #: (evict-rotate + traced-start RoPE — the rolling-KV machinery of
        #: pipelines/causal_inference applied to training).  Bounds both
        #: compile time and cache memory for arbitrarily long rollouts
        #: (the unrolled graph at 7 blocks exceeded 25 min of XLA
        #: compile).  The reference's rolling truncation:
        #: causal_model.py:203-226 + self_forcing_training.py:239-253.
        self.rolling = bool(rolling)
        #: i2v-style [1, nb, nb, ...] block plan: without an initial
        #: latent, the FIRST generated frame is its own 1-frame block
        #: (self_forcing_training.py:68-74,133-135); with one, the noise
        #: is plain nb-blocks as in t2v
        self.independent_first_frame = bool(independent_first_frame)
        self.dtype = dtype

    def num_blocks(self, num_noise_frames: int,
                   has_initial_latent: bool = False) -> int:
        """Number of denoise blocks (== required exit_flags length) for a
        noise tensor of `num_noise_frames` frames."""
        first = 1 if (self.independent_first_frame
                      and not has_initial_latent) else 0
        assert (num_noise_frames - first) % self.num_frame_per_block == 0, \
            (num_noise_frames, first, self.num_frame_per_block)
        return first + (num_noise_frames - first) // self.num_frame_per_block

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
        n_init = 0 if initial_latent is None else initial_latent.shape[1]
        # i2v [1, nb, nb, ...] plan when generating from scratch
        # (self_forcing_training.py:68-74,133-135)
        first = 1 if (self.independent_first_frame and n_init == 0) else 0
        assert (F - first) % nb == 0, (F, first, nb)
        all_sizes = [1] * first + [nb] * ((F - first) // nb)
        total = F + n_init
        grad_start_frame = total - self.grad_frame_window

        cap = self.num_max_frames
        rolling = self.rolling and total > cap
        # rolling needs the cache EXACTLY full when the steady-state scan
        # takes over: the absolute-slot prefix (n_init initial frames,
        # optional 1-frame i2v first block, then nb-blocks) must land on
        # cap, after which each scanned block slides the window by nb
        assert not rolling or (
            cap >= n_init + first
            and (cap - n_init - first) % nb == 0), (cap, nb, n_init, first)
        cache = init_kv_cache(cfg, B, H * W // 4,
                              num_slots=cap if rolling
                              else max(total, cap),
                              dtype=self.dtype,
                              quantize=self.quantize_cache)
        outputs: List[jnp.ndarray] = []
        start = 0
        flat = lambda a: a.reshape((-1,) + a.shape[2:])
        d_head = cfg.dim // cfg.num_heads
        step_vals = jnp.asarray(self.steps, jnp.float32)

        def one_block(cache, x, flag, key, sched, rope_cs, graded):
            """Per-block denoise: early-exit no-grad chain -> graded
            forward at the selected step -> context-noise clean commit.
            Returns (x0 [B, nb, ...], cache, key).  Static `sched` /
            rope_cs=None for absolute-slot blocks; the rolling steady
            state passes the recency schedule + a traced-start rope.

            The no-grad chain is the reference's break at exit_flag
            (self_forcing_training.py:136-194): `lax.cond` skips steps
            past `flag` at runtime, so the expected per-block cost is
            (S-1)/2 + 2 forwards instead of S + 1."""
            def _nograd_step(i, carry):
                xi, cache, k2 = carry
                k2, k = jax.random.split(k2)

                def run(c):
                    xi, cache = c
                    tt = jnp.broadcast_to(step_vals[i], (B, xi.shape[1]))
                    flow, cache = fps_forward_group(
                        jax.lax.stop_gradient(params), cfg,
                        jax.lax.stop_gradient(xi).astype(self.dtype), tt,
                        ctx_kv, cache, sched, rope_cs=rope_cs)
                    x0 = sch.convert_flow_pred_to_x0(
                        flat(flow).astype(jnp.float32), flat(xi),
                        tt.reshape(-1)).reshape(xi.shape)
                    nz = jax.random.normal(k, xi.shape, jnp.float32)
                    nt = jnp.broadcast_to(step_vals[i + 1],
                                          (B * xi.shape[1],))
                    xi = sch.add_noise(flat(jax.lax.stop_gradient(x0)),
                                       flat(nz), nt).reshape(xi.shape)
                    return xi, cache

                xi, cache = jax.lax.cond(i < flag, run, lambda c: c,
                                         (xi, cache))
                return xi, cache, k2

            xi, cache, key = jax.lax.fori_loop(
                0, len(self.steps) - 1, _nograd_step, (x, cache, key))

            # graded forward at the selected step only; per-LAYER remat
            # inside the group forward (an outer whole-group checkpoint
            # still lets the inner layer scan's linearisation save every
            # layer's ffn intermediates during the recompute — measured
            # 35 GB at 12L/3-block 1.3B, tools/distill_probe.py)
            sel = jax.lax.stop_gradient(xi)
            G = sel.shape[1]
            tt = jnp.full((B, G), 1.0, jnp.float32) * step_vals[flag]
            p = params if graded else jax.lax.stop_gradient(params)
            flow, cache = fps_forward_group(
                p, cfg, sel.astype(self.dtype), tt, ctx_kv, cache, sched,
                rope_cs=rope_cs, remat=self.remat,
                remat_offload=self.remat_offload, stop_cache_grad=True)
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

            # context-noise commit (:199-216)
            key, k = jax.random.split(key)
            ct = jnp.full((B * G,), float(self.context_noise))
            committed = sch.add_noise(
                flat(jax.lax.stop_gradient(x0)),
                flat(jax.random.normal(k, x0.shape, jnp.float32)),
                ct).reshape(x0.shape)
            tt0 = jnp.full((B, G), float(self.context_noise), jnp.float32)
            _, cache = fps_forward_group(
                jax.lax.stop_gradient(params), cfg,
                committed.astype(self.dtype), tt0, ctx_kv, cache, sched,
                rope_cs=rope_cs)
            return x0, cache, key

        if initial_latent is not None:
            sched0 = block_schedule(0, n_init, cap)
            tt0 = jnp.zeros((B, n_init), jnp.float32)
            _, cache = fps_forward_group(
                jax.lax.stop_gradient(params), cfg,
                jax.lax.stop_gradient(
                    initial_latent.astype(jnp.float32)).astype(self.dtype),
                tt0, ctx_kv, cache, sched0)
            outputs.append(initial_latent.astype(jnp.float32))
            start = n_init

        def block_flag(b):
            f = exit_flags[0] if self.same_step_across_blocks \
                else exit_flags[b]
            return jnp.clip(f, 0, len(self.steps) - 1)

        # absolute-slot blocks: every block while the window still fits
        # the cache (all of them when not rolling)
        b = 0
        noff = 0
        while b < len(all_sizes) and (not rolling
                                      or start + all_sizes[b] <= cap):
            g = all_sizes[b]
            sched = block_schedule(start, g, cap if rolling
                                   else self.num_max_frames)
            x = noise[:, noff:noff + g].astype(jnp.float32)
            x0, cache, rng = one_block(cache, x, block_flag(b), rng, sched,
                                       None, start >= grad_start_frame)
            outputs.append(x0)
            start += g
            noff += g
            b += 1

        if b < len(all_sizes):
            # ROLLING STEADY STATE: one lax.scan whose body is a single
            # recency-ordered block (evict-rotate + traced-start RoPE) —
            # compile time and cache memory stay CONSTANT in video length
            # (the unrolled graph at 7 blocks already exceeded 25 min of
            # XLA compile; the reference's rolling truncation is
            # causal_model.py:203-226).  All steady blocks run graded;
            # the gradient window is applied on the assembled output
            # below (blocks outside it get zero cotangents).
            from ..ops.rope import dynamic_rope_table
            nsteady = len(all_sizes) - b
            other = tuple(range(cap - nb))
            sched_r = GroupSchedule(
                index=-1, frames=tuple(range(10 ** 6, 10 ** 6 + nb)),
                append_mode=False,
                write_slots=tuple(range(cap - nb, cap)),
                visible_frames=other, visible_slots=other,
                anchor_group=False)
            xs_noise = jnp.moveaxis(
                noise[:, noff:].reshape(B, nsteady, nb, C, H, W), 1, 0)
            flags = jnp.stack([block_flag(b + i) for i in range(nsteady)])
            keys = jax.random.split(rng, nsteady + 1)
            rng = keys[0]
            starts = start + nb * jnp.arange(nsteady)

            def steady_body(cache, xs):
                xblk, flag, key, startf = xs
                cache = {name: jnp.concatenate(
                    [leaf[:, :, nb:], leaf[:, :, :nb]], axis=2)
                    for name, leaf in cache.items()}
                rope_cs = dynamic_rope_table(startf, nb, H // 2, W // 2,
                                             d_head)
                x0, cache, _ = one_block(cache, xblk.astype(jnp.float32),
                                         flag, key, sched_r, rope_cs, True)
                return cache, x0

            _, ys = jax.lax.scan(steady_body, cache,
                                 (xs_noise, flags, keys[1:], starts))
            outputs.append(jnp.moveaxis(ys, 0, 1).reshape(
                B, nsteady * nb, C, H, W))

        output = jnp.concatenate(outputs, axis=1)
        if rolling and grad_start_frame > 0:
            # the reference's gradient mask over the last
            # grad_frame_window frames (base.py:169-177) — scanned steady
            # blocks all run graded, so restrict here
            output = jnp.concatenate(
                [jax.lax.stop_gradient(output[:, :grad_start_frame]),
                 output[:, grad_start_frame:]], axis=1)

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


def sample_num_frames(rng: np.random.Generator, min_frames: int,
                      max_frames: int, num_frame_per_block: int = 3,
                      independent_first_frame: bool = False) -> int:
    """Uniform random rollout length in whole blocks (base.py:131-147).

    `rng` is a host-side numpy Generator; seed it identically on every
    data-parallel host — that replaces the reference's
    `dist.broadcast(num_generated_blocks, src=0)` sync.  The result is a
    static Python int, so each distinct length compiles its own program
    (bounded: (max-min)/block + 1 programs).

    independent_first_frame: the i2v [1, nb, ...] plan — blocks are
    sampled over [min-1, max-1] and the standalone image frame is added
    back (base.py:133-146)."""
    off = 1 if independent_first_frame else 0
    assert (min_frames - off) % num_frame_per_block == 0, (
        min_frames, off, num_frame_per_block)
    assert (max_frames - off) % num_frame_per_block == 0, (
        max_frames, off, num_frame_per_block)
    lo = (min_frames - off) // num_frame_per_block
    hi = (max_frames - off) // num_frame_per_block
    return int(rng.integers(lo, hi + 1)) * num_frame_per_block + off


def slice_last_window(x0: jnp.ndarray, window: int,
                      num_frame_per_block: int = 3, vae_params=None,
                      independent_first_frame: bool = False):
    """The reference's keep-last-21 trick for longer rollouts
    (base.py:153-177): when the rollout exceeds `window` frames, decode the
    prefix, re-encode its last pixel frame as a fresh image latent (under
    stop_gradient), and return [image_latent, last window-1 latents] so the
    score models always see a `window`-frame video whose first latent is a
    true single-frame encode.  Also returns the per-frame gradient mask
    (base.py:169-177): the first block of the window carries no gradient.

    Without VAE params (e.g. latent-only smoke training) the prefix is
    simply dropped — the first latent is then a mid-video frame rather than
    an image latent, but it is masked out of the loss either way.

    Returns (x_win [B, window, C, H, W], mask [B, window] bool or None).
    """
    B, F = x0.shape[:2]
    if F <= window:
        return x0, None
    if vae_params is not None:
        from ..models import vae as vae_mod
        prefix = jax.lax.stop_gradient(
            x0[:, :F - (window - 1)].astype(jnp.float32))
        pixels = vae_mod.decode(vae_params, prefix)
        img_lat = vae_mod.encode(vae_params, pixels[:, -1:])
        x_win = jnp.concatenate(
            [jax.lax.stop_gradient(img_lat.astype(x0.dtype)),
             x0[:, -(window - 1):]], axis=1)
    else:
        x_win = x0[:, -window:]
    # gradient mask (base.py:169-177): no gradient on the window's first
    # block — just the standalone image frame under the i2v plan
    nomask = 1 if independent_first_frame else num_frame_per_block
    mask = jnp.ones((B, window), bool).at[:, :nomask].set(False)
    return x_win, mask
