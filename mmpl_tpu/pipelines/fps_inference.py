"""CausalFPSInferencePipeline: macro-from-micro planned window denoising.

TPU re-design of `MMPL_t2v/pipeline/casual_fps_inference.py`.  Differences
from the reference, all behavior-preserving:

  * CFG runs as a batched pair (cond/uncond stacked on the batch axis with
    separate cache halves) instead of two GPUs with `.to()` copies
    (casual_fps_inference.py:41-51,346-374).
  * Each chunk-group's 50-step UniPC loop is ONE `lax.scan` inside ONE jitted
    program; the KV cache is an explicit carry instead of mutated module
    state.  The per-group programs compile once (static plan).
  * The solver history lives in the UniPC scan state; a fresh state per group
    reproduces the reference's per-group scheduler re-init
    (casual_fps_inference.py:337).
  * The clean-KV commit rerun (casual_fps_inference.py:385-403) is a t=0
    forward fused into the same program.  For append-mode groups the
    reference's commit writes nothing (causal_fps_model.py:254-264), so we
    skip it there.
  * The anchor-group boundary re-seed (casual_fps_inference.py:283-318) uses
    the FlowMatch `add_noise` at `ddpm_timestep = timesteps[~990] + 1000`,
    which resolves to sigma == 1.0 — i.e. fresh noise; we reproduce the
    formula faithfully via the same lookup.

The pipeline consumes precomputed text embeddings (see models/t5.py for the
encoder); VAE decode is a separate stage.
"""

from __future__ import annotations

import functools
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.geometry import (ChunkPlan, GroupSchedule, KV_CACHE_SLOTS,
                             t2v_plan)
from ..models.dit import precompute_context_kv, embed_text, embed_image_clip
from ..models.fps_dit import fps_forward_group, init_kv_cache
from ..schedulers.flow_match import FlowMatchScheduler
from ..schedulers.unipc import FlowUniPC


class CausalFPSInferencePipeline:
    """Planned chunk-order denoising of one 21-frame window."""

    def __init__(self, cfg, params, plan: Optional[ChunkPlan] = None,
                 sampling_steps: int = 50, timestep_shift: float = 8.0,
                 guidance_scale: float = 5.0,
                 num_train_timesteps: int = 1000,
                 reseed_seed: int = 0,
                 sample_solver: str = "unipc",
                 mesh=None, shard_params: bool = True,
                 fuse_qkv: bool = True,
                 quantize: Optional[str] = None,
                 quantize_cache: bool = False,
                 dtype=jnp.bfloat16):
        """mesh: optional jax.sharding.Mesh with (dp, fsdp, tp) axes.  When
        given, params are placed with (fsdp, tp) NamedShardings (unless
        `shard_params=False` because the caller pre-sharded them), the KV
        cache is *created* sharded (dp over the CFG pair batch, tp over
        heads) and the batched CFG pair is constrained to the dp axis — the
        14B path: 40 layers x 5120 dim does not fit one 16 GB v5e
        (wan/configs/wan_t2v_14B.py:21-25, README.md:29)."""
        self.cfg = cfg
        self.mesh = mesh
        if fuse_qkv and "qkv" not in params["blocks"]["self_attn"]:
            from ..models.dit import fuse_qkv_params
            # one [D,3D] gemm per layer + split-half rope layout
            params = fuse_qkv_params(params, num_heads=cfg.num_heads)
        # int8 projection gemms (ops/quant.py) — the TPU-native analogue
        # of the reference's TensorRT INT8 engines ("int8" W8A8 /
        # "int8wo" weight-only)
        from ..models.dit import apply_quantize
        params = apply_quantize(params, quantize, cfg)
        if mesh is not None and shard_params:
            from ..parallel.mesh import shard_params_for_inference
            params = shard_params_for_inference(params, mesh)
        self.params = params
        self.plan = plan or t2v_plan()
        # int8 KV cache (per-token scales; models.fps_dit.init_kv_cache)
        self.quantize_cache = bool(quantize_cache)
        self.guidance_scale = float(guidance_scale)
        self.dtype = dtype
        # 'unipc' | 'dpm++' (casual_fps_inference.py:503-524); both samplers
        # share the scan-table interface so they are drop-in interchangeable
        if sample_solver == "unipc":
            self.sampler = FlowUniPC(sampling_steps, shift=timestep_shift,
                                     num_train_timesteps=num_train_timesteps)
        elif sample_solver == "dpm++":
            from ..schedulers.dpm_solver import FlowDPMSolver
            self.sampler = FlowDPMSolver(
                sampling_steps, shift=timestep_shift,
                num_train_timesteps=num_train_timesteps)
        else:
            raise NotImplementedError(f"Unsupported solver {sample_solver}")

        # the re-seed scheduler: FlowMatchScheduler in training mode with the
        # run shift (casual_fps_inference.py:93-109); the fixed random index
        # in [980, 1000) is drawn once at pipeline construction.
        self.ddpm = FlowMatchScheduler(shift=timestep_shift, sigma_min=0.0,
                                       extra_one_step=True)
        self.ddpm.set_timesteps(num_train_timesteps, training=True)
        idx = int(np.random.default_rng(reseed_seed).integers(980, 1000))
        self.ddpm_timestep = float(np.asarray(self.ddpm.timesteps)[idx]) + 1000.0

        self._group_fns: Dict[int, callable] = {}
        self._commit_fns: Dict[int, callable] = {}
        self._ctx_fn = None
        self._assemble_fn = None
        #: sync after each group dispatch — workaround for tunneled-TPU
        #: environments whose worker drops executions queued behind >~60 s
        #: of work (MMPL_SYNC_GROUPS=1; bench.py sets this). Off by
        #: default: async dispatch is what overlaps the chunk pipeline.
        import os as _os
        self.block_per_group = _os.environ.get("MMPL_SYNC_GROUPS") == "1"
        #: >0: run the solver loop as ceil(steps/K) shorter programs (same
        #: math, one reusable compiled segment) — required on runtimes
        #: that bound per-program execution time (MMPL_STEPS_PER_PROGRAM)
        self.steps_per_program = int(
            _os.environ.get("MMPL_STEPS_PER_PROGRAM", "0"))
        #: host-side dispatch time per group of the last inference() call
        self.phase_times: Dict[str, float] = {}

    # ------------------------------------------------------------------
    # sharding helpers (no-ops when mesh is None)
    # ------------------------------------------------------------------

    def _constrain_pair(self, lat2: jnp.ndarray) -> jnp.ndarray:
        """Pin the stacked [cond; uncond] batch to the dp axis — the TPU
        form of the reference's cond/uncond two-GPU split
        (casual_fps_inference.py:41-51,346-374)."""
        if self.mesh is None or "dp" not in self.mesh.shape:
            return lat2
        from jax.sharding import NamedSharding, PartitionSpec as P
        if lat2.shape[0] % self.mesh.shape["dp"] != 0:
            return lat2
        spec = P("dp", *([None] * (lat2.ndim - 1)))
        return jax.lax.with_sharding_constraint(
            lat2, NamedSharding(self.mesh, spec))

    def _replicate(self, x):
        if self.mesh is None or x is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P
        return jax.device_put(x, NamedSharding(self.mesh, P()))

    def _make_cache(self, batch2: int, tokens_per_frame: int):
        """Create the KV cache; under a mesh it is created already sharded
        (out_shardings) so a 14B cache never materialises replicated."""
        mk = functools.partial(init_kv_cache, self.cfg, batch2,
                               tokens_per_frame, KV_CACHE_SLOTS, self.dtype,
                               quantize=self.quantize_cache)
        if self.mesh is None:
            return mk()
        from ..parallel.mesh import kv_cache_shardings
        sh = kv_cache_shardings(self.mesh, jax.eval_shape(mk))
        return jax.jit(mk, out_shardings=sh)()

    # ------------------------------------------------------------------
    # per-group programs
    # ------------------------------------------------------------------

    def _apply_reseed(self, schedule: GroupSchedule, latents, reseed_src,
                      rng):
        """Re-noise the group's re-seeded positions from source latents.

        Generalises the reference's two hard-coded boundary re-seeds
        (casual_fps_inference.py:283-318) to the group's full static
        `schedule.reseed` tuple: entry i of `reseed_src` [B, R, C, H, W]
        is written at position `schedule.reseed[i][0]` after fresh-noise
        blending at `ddpm_timestep`.
        """
        R = len(schedule.reseed)
        assert len(reseed_src) == R, (
            f"group expects {R} reseed sources (positions "
            f"{[p for p, _ in schedule.reseed]}), got {len(reseed_src)}")
        B = latents.shape[0]
        ts = jnp.full((B,), self.ddpm_timestep, jnp.float32)
        keys = jax.random.split(rng, R)
        for i, (pos, _src_frame) in enumerate(schedule.reseed):
            n = jax.random.normal(keys[i], latents[:, pos:pos + 1].shape,
                                  jnp.float32)
            latents = latents.at[:, pos:pos + 1].set(
                self.ddpm.add_noise(
                    reseed_src[i].astype(jnp.float32), n, ts))
        return latents

    def _denoise_group(self, schedule: GroupSchedule, params, ctx_kv2,
                       cache, noisy, reseed_src, rng):
        """Jit-compiled: full 50-step denoise + clean commit of one group.

        noisy: [B, G, C, H, W]; ctx_kv2 covers the stacked [cond; uncond]
        batch (2B).  reseed_src: TUPLE of R [B, 1, C, H, W] source latents
        (R = len(schedule.reseed)) — kept as separate pytree leaves so the
        driver passes lazy output slices without an eager concat (an eager
        op between groups stalls chunk-pipeline dispatch) — or a 1-tuple
        zeros placeholder when the group has no reseeds (gated by static
        schedule.reseed).
        """
        B = noisy.shape[0]
        G = schedule.num_frames
        latents = noisy.astype(jnp.float32)

        if schedule.reseed:
            latents = self._apply_reseed(schedule, latents, reseed_src, rng)

        state = self.sampler.init_state(latents)

        # The cache is a loop INVARIANT, not a carry: a group never reads
        # its own slots (visibility gathers exclude own frames — fps_dit),
        # so the per-step own-KV writes are dead until the final commit.
        # Discarding them (a) lets XLA DCE ~4 GB/step of dead cache writes
        # and (b) halves the program's cache footprint — the batched-CFG
        # 1.3B window did not fit 16 GB with the cache double-buffered
        # through the 50-step scan.
        def body(state, step_in):
            coef, t = step_in
            lat2 = jnp.concatenate([state["sample"], state["sample"]], 0)
            lat2 = self._constrain_pair(lat2)
            tt = jnp.broadcast_to(t, (2 * B, G))
            flow2, _ = fps_forward_group(
                params, self.cfg, lat2.astype(self.dtype), tt, ctx_kv2,
                cache, schedule)
            cond, uncond = flow2[:B], flow2[B:]
            flow = (uncond.astype(jnp.float32)
                    + self.guidance_scale
                    * (cond.astype(jnp.float32) - uncond.astype(jnp.float32)))
            state = type(self.sampler).step(coef, state, flow)
            return state, None

        state, _ = jax.lax.scan(
            body, state, (self.sampler.table, self.sampler.timesteps))
        final = state["sample"]

        if not schedule.append_mode:
            # clean-KV commit (t = 0 rerun) — the only surviving cache write
            lat2 = self._constrain_pair(jnp.concatenate([final, final], 0))
            tt = jnp.zeros((2 * B, G), jnp.float32)
            _, cache = fps_forward_group(
                params, self.cfg, lat2.astype(self.dtype), tt, ctx_kv2,
                cache, schedule)
        return final, cache

    # -- segmented execution (bounded per-program runtime) ---------------

    def _init_group_state(self, schedule: GroupSchedule, noisy,
                          reseed_src, rng):
        """Reseed + solver-state init, jitted separately for segmenting."""
        latents = noisy.astype(jnp.float32)
        if schedule.reseed:
            latents = self._apply_reseed(schedule, latents, reseed_src, rng)
        return self.sampler.init_state(latents)

    def _denoise_segment(self, schedule: GroupSchedule, params, ctx_kv2,
                         cache, state, coefs, ts):
        """A slice of the solver loop: same step body, table slice passed
        as inputs so ONE compiled program serves every segment."""
        B = state["sample"].shape[0]
        G = schedule.num_frames

        def body(state, step_in):
            coef, t = step_in
            lat2 = jnp.concatenate([state["sample"], state["sample"]], 0)
            lat2 = self._constrain_pair(lat2)
            tt = jnp.broadcast_to(t, (2 * B, G))
            flow2, _ = fps_forward_group(
                params, self.cfg, lat2.astype(self.dtype), tt, ctx_kv2,
                cache, schedule)
            cond, uncond = flow2[:B], flow2[B:]
            flow = (uncond.astype(jnp.float32)
                    + self.guidance_scale
                    * (cond.astype(jnp.float32)
                       - uncond.astype(jnp.float32)))
            return type(self.sampler).step(coef, state, flow), None

        state, _ = jax.lax.scan(body, state, (coefs, ts))
        return state

    def _run_group_segmented(self, gi: int, ctx_kv2, cache, noisy,
                             reseed_src, rng):
        """Dispatch one group as ceil(steps / steps_per_program) programs
        plus the commit — each bounded in runtime (this image's tunneled
        TPU worker kills executions running longer than ~70 s, which the
        1.3B fill groups exceed in one 50-step program).  A ragged tail
        segment just traces a second program variant."""
        group = self.plan.groups[gi]
        K = self.steps_per_program
        if f"init{gi}" not in self._group_fns:
            self._group_fns[f"init{gi}"] = jax.jit(functools.partial(
                self._init_group_state, group))
            self._group_fns[f"seg{gi}"] = jax.jit(functools.partial(
                self._denoise_segment, group), donate_argnums=(3,))
        state = self._group_fns[f"init{gi}"](noisy, reseed_src, rng)
        table = self.sampler.table
        ts = self.sampler.timesteps
        n = int(ts.shape[0])
        seg = self._group_fns[f"seg{gi}"]
        for s in range(0, n, K):
            e = min(s + K, n)
            coefs = jax.tree.map(lambda a: a[s:e], table)
            state = seg(self.params, ctx_kv2, cache, state, coefs,
                        ts[s:e])
            if self.block_per_group:
                jax.block_until_ready(state["sample"])
        final = state["sample"]
        if not group.append_mode:
            cache = self._get_commit_fn(gi)(self.params, ctx_kv2, cache,
                                            final)
        return final, cache

    def _commit_group(self, schedule: GroupSchedule, params, ctx_kv2,
                      cache, clean):
        """t=0 context commit only (initial-latent group0 path,
        casual_fps_inference.py:407-439)."""
        B, G = clean.shape[0], schedule.num_frames
        lat2 = self._constrain_pair(
            jnp.concatenate([clean, clean], 0).astype(self.dtype))
        tt = jnp.zeros((2 * B, G), jnp.float32)
        _, cache = fps_forward_group(params, self.cfg, lat2, tt, ctx_kv2,
                                     cache, schedule)
        return cache

    def _get_group_fn(self, gi: int):
        if gi not in self._group_fns:
            self._group_fns[gi] = jax.jit(functools.partial(
                self._denoise_group, self.plan.groups[gi]),
                donate_argnums=(2,))
        return self._group_fns[gi]

    def _get_commit_fn(self, gi: int):
        if gi not in self._commit_fns:
            self._commit_fns[gi] = jax.jit(functools.partial(
                self._commit_group, self.plan.groups[gi]),
                donate_argnums=(2,))
        return self._commit_fns[gi]

    # ------------------------------------------------------------------
    # window inference
    # ------------------------------------------------------------------

    def prepare_context(self, cond_context: jnp.ndarray,
                        uncond_context: jnp.ndarray,
                        clip_fea: Optional[jnp.ndarray] = None):
        """Precompute stacked per-layer cross-attn K/V for [cond; uncond].

        Jitted (eager ops compile per-op on TPU); under a mesh the K/V
        leaves come out dp-batch / tp-head sharded.
        """
        if self._ctx_fn is None:
            def impl(params, cond, uncond, clip):
                ctx = jnp.concatenate([cond, uncond], 0)
                emb = embed_text(params, ctx.astype(self.dtype))
                img = None
                if clip is not None:
                    img = embed_image_clip(
                        params, jnp.concatenate([clip, clip], 0).astype(
                            self.dtype))
                ckv = precompute_context_kv(params, self.cfg, emb, img)
                if self.mesh is not None:
                    from ..parallel.mesh import context_kv_shardings
                    ckv = jax.lax.with_sharding_constraint(
                        ckv, context_kv_shardings(self.mesh, ckv))
                return ckv
            self._ctx_fn = jax.jit(impl)

        return self._ctx_fn(
            self.params, self._replicate(cond_context),
            self._replicate(uncond_context), self._replicate(clip_fea))

    def inference(self, noise: jnp.ndarray, cond_context: jnp.ndarray,
                  uncond_context: jnp.ndarray,
                  initial_latent: Optional[jnp.ndarray] = None,
                  rng: Optional[jax.Array] = None,
                  clip_fea: Optional[jnp.ndarray] = None,
                  on_anchor=None) -> jnp.ndarray:
        """Denoise one window.

        noise: [B, 21, C, H, W]; contexts: [B, 512, text_dim];
        initial_latent: [B, n0, C, H, W] context frames (video extension).
        on_anchor: optional callback fired with the handoff latents right
        after the anchor group completes (the reference's torch.save point,
        casual_fps_inference.py:380-383).
        Returns the full denoised latent window [B, 21, C, H, W] (fp32).
        """
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        B, F, C, H, W = noise.shape
        assert F == self.plan.num_frames
        noise = self._replicate(noise)
        initial_latent = self._replicate(initial_latent)
        ctx_kv2 = self.prepare_context(cond_context, uncond_context,
                                       clip_fea=clip_fea)
        cache = self._make_cache(2 * B, H * W // 4)
        zeros1 = jnp.zeros((B, 1, C, H, W), jnp.float32)

        n_init = 0 if initial_latent is None else initial_latent.shape[1]

        # frame -> (group index, position within the group's output)
        frame_pos = {f: (gi, pi)
                     for gi, g in enumerate(self.plan.groups)
                     for pi, f in enumerate(g.frames)}
        # Per-group outputs are kept separate and assembled once at the end
        # under jit — scattering into a full-window buffer between groups
        # would compile ~12 eager one-off TPU programs and round-trip the
        # window through HBM per group.
        group_out: List[Optional[jnp.ndarray]] = [None] * len(self.plan.groups)

        def frame_latent(f: int) -> jnp.ndarray:
            gi, pi = frame_pos[f]
            return group_out[gi][:, pi:pi + 1]

        consumed = 0
        self.phase_times = {}
        for gi, group in enumerate(self.plan.groups):
            t0 = time.perf_counter()
            if n_init > 0 and consumed < n_init:
                # context frames are committed clean, group by group
                # (t2v group0 = 2 frames; i2v groups 0/1 = 1 frame each)
                take = group.num_frames
                clean = initial_latent[:, consumed:consumed + take]
                cache = self._get_commit_fn(gi)(
                    self.params, ctx_kv2, cache, clean.astype(jnp.float32))
                group_out[gi] = clean.astype(jnp.float32)
                consumed += take
                self.phase_times[f"group{gi}_dispatch_s"] = (
                    time.perf_counter() - t0)
                continue

            rng, sub = jax.random.split(rng)
            if group.reseed:
                rs = tuple(frame_latent(s) for _pos, s in group.reseed)
            else:
                rs = (zeros1,)
            if self.steps_per_program > 0:
                latents, cache = self._run_group_segmented(
                    gi, ctx_kv2, cache, noise[:, list(group.frames)],
                    rs, sub)
            else:
                latents, cache = self._get_group_fn(gi)(
                    self.params, ctx_kv2, cache,
                    noise[:, list(group.frames)], rs, sub)
            if self.block_per_group:
                jax.block_until_ready(latents)
            group_out[gi] = latents
            self.phase_times[f"group{gi}_dispatch_s"] = (
                time.perf_counter() - t0)

            if group.anchor_group and on_anchor is not None:
                on_anchor(jnp.concatenate(
                    [frame_latent(f) for f in self.plan.handoff_frames],
                    axis=1))

        if self._assemble_fn is None:
            order = tuple(frame_pos[f] for f in range(F))

            def assemble(outs):
                return jnp.concatenate(
                    [outs[gi][:, pi:pi + 1] for gi, pi in order], axis=1)

            self._assemble_fn = jax.jit(assemble)
        return self._assemble_fn(tuple(group_out))
