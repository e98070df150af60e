"""Few-step distilled causal AR pipeline (DMD/SiD/CausVid checkpoints).

Re-design of `MMPL_t2v/pipeline/causal_inference.py` (CausalInferencePipeline)
+ the rolling-KV CausalWanModel attention (causal_model.py:193-226): blocks
of `num_frame_per_block` frames are denoised through a short
`denoising_step_list` (e.g. [1000, 750, 500, 250]) with re-noising between
steps, no CFG, then committed to the KV cache at `context_noise`.

TPU design: the KV cache is the same frame-slot pytree as the FPS model's
(21 slots for a full window); each block index yields a *static* schedule
(write slots = the block's frames, visible slots = the causal window
[max(0, end - local_attn_size), end)), so every block compiles to one XLA
program with the whole denoising step list unrolled inside it — the
reference's per-step Python loop and `.item()` index bookkeeping disappear.
"""

from __future__ import annotations

import contextlib
import functools
import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..core.geometry import GroupSchedule
from ..models.dit import embed_text, precompute_context_kv
from ..models.fps_dit import fps_forward_group, init_kv_cache
from ..schedulers.flow_match import FlowMatchScheduler
from ..utils.profiling import PhaseTimer, _sync


def block_schedule(start_frame: int, num_frames: int,
                   local_attn_frames: int = 21) -> GroupSchedule:
    """Static causal-attention schedule for one AR block."""
    end = start_frame + num_frames
    attn_start = max(0, end - local_attn_frames)
    frames = tuple(range(start_frame, end))
    return GroupSchedule(
        index=start_frame, frames=frames, append_mode=False,
        write_slots=frames,
        visible_frames=tuple(range(attn_start, end)),
        visible_slots=tuple(range(attn_start, end)),
        anchor_group=False)


class CausalInferencePipeline:
    """Block-causal few-step sampling with rolling KV cache."""

    def __init__(self, cfg, params,
                 denoising_step_list: Sequence[int] = (1000, 750, 500, 250),
                 num_frame_per_block: int = 3,
                 context_noise: int = 0,
                 timestep_shift: float = 8.0,
                 independent_first_frame: bool = False,
                 local_attn_frames: int = 21,
                 max_attention_frames: Optional[int] = None,
                 sink_frames: int = 0,
                 warp_denoising_step: bool = False,
                 fuse_qkv: bool = True,
                 quantize: Optional[str] = None,
                 quantize_cache: bool = False,
                 mesh=None, shard_params: bool = True,
                 dtype=jnp.bfloat16):
        """max_attention_frames: enables the ROLLING KV cache — a fixed
        `max_attention_frames`-slot buffer in recency order with the first
        `sink_frames` pinned (the reference's max_attention_size truncation
        + sink tokens, causal_model.py:203-226, :417-418).  Memory and
        compile count stay constant for arbitrarily long AR generation:
        every steady-state block reuses ONE compiled program (write slots
        are static, RoPE comes from a traced start frame).  When None, the
        cache grows with the video (one program per (start, size) pair) —
        attention is still truncated to the last `local_attn_frames`.

        mesh: optional jax.sharding.Mesh with (dp, fsdp, tp) axes — the
        14B few-step path.  Params placed (fsdp, tp)-sharded (unless the
        caller pre-sharded them: shard_params=False), the KV cache is
        *created* sharded (dp over batch, tp over merged heads), cross-
        attn K/V constrained likewise; batch shards over dp when it
        divides.  Same design as CausalFPSInferencePipeline(mesh=...).
        """
        self.cfg = cfg
        self.mesh = mesh
        if fuse_qkv and "qkv" not in params["blocks"]["self_attn"]:
            from ..models.dit import fuse_qkv_params
            params = fuse_qkv_params(params, num_heads=cfg.num_heads)
        from ..models.dit import apply_quantize
        params = apply_quantize(params, quantize, cfg)
        if mesh is not None and shard_params:
            from ..parallel.mesh import shard_params_for_inference
            params = shard_params_for_inference(params, mesh)
        self.params = params
        self.num_frame_per_block = num_frame_per_block
        self.quantize_cache = bool(quantize_cache)
        self.context_noise = context_noise
        self.independent_first_frame = independent_first_frame
        self.local_attn_frames = (max_attention_frames
                                  if max_attention_frames is not None
                                  else local_attn_frames)
        self.max_attention_frames = max_attention_frames
        self.sink_frames = sink_frames
        if max_attention_frames is not None:
            assert sink_frames < max_attention_frames
        self.dtype = dtype
        self.scheduler = FlowMatchScheduler(shift=timestep_shift,
                                            sigma_min=0.0,
                                            extra_one_step=True)
        self.scheduler.set_timesteps(1000, training=True)
        steps = [int(t) for t in denoising_step_list]
        if warp_denoising_step:
            # map through the shifted schedule: step -> timesteps[1000-step]
            # (causal_inference.py:29-31; configs/self_forcing_dmd.yaml)
            import numpy as np
            ts = np.concatenate([np.asarray(self.scheduler.timesteps),
                                 [0.0]])
            steps = [float(ts[1000 - s]) for s in steps]
        self.denoising_step_list = tuple(steps)
        self._block_fns = {}
        self._commit_fns = {}
        self._rolling_fn = None
        self._ctx_fn = None

    # ------------------------------------------------------------------
    # sharding helpers (no-ops when mesh is None)
    # ------------------------------------------------------------------

    def _replicate(self, x):
        if self.mesh is None or x is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P
        return jax.device_put(x, NamedSharding(self.mesh, P()))

    def _constrain_batch(self, x):
        """Shard the block batch over dp when it divides (no CFG pair
        here — dp carries plain batch parallelism)."""
        if (self.mesh is None or "dp" not in self.mesh.shape
                or x.shape[0] % self.mesh.shape["dp"] != 0):
            return self._replicate(x)
        from ..parallel.mesh import batch_sharding
        return jax.device_put(x, batch_sharding(self.mesh, x.ndim))

    def _make_cache(self, B: int, tokens_per_frame: int, num_slots: int):
        """Create the KV cache; under a mesh it is created already sharded
        (out_shardings) so a 14B cache never materialises replicated."""
        mk = functools.partial(init_kv_cache, self.cfg, B, tokens_per_frame,
                               num_slots=num_slots, dtype=self.dtype,
                               quantize=self.quantize_cache)
        if self.mesh is None:
            return mk()
        from ..parallel.mesh import kv_cache_shardings
        sh = kv_cache_shardings(self.mesh, jax.eval_shape(mk))
        return jax.jit(mk, out_shardings=sh)()

    def _context_kv(self, cond_context):
        """Jitted text-embed + cross-attn K/V precompute (eager ops compile
        per-op on TPU); under a mesh the K/V come out tp-head sharded."""
        if self._ctx_fn is None:
            def impl(params, cond):
                emb = embed_text(params, cond.astype(self.dtype))
                ckv = precompute_context_kv(params, self.cfg, emb)
                if self.mesh is not None:
                    from ..parallel.mesh import context_kv_shardings
                    ckv = jax.lax.with_sharding_constraint(
                        ckv, context_kv_shardings(self.mesh, ckv))
                return ckv
            self._ctx_fn = jax.jit(impl)
        return self._ctx_fn(self.params, self._replicate(cond_context))

    # ------------------------------------------------------------------

    def _denoise_block(self, schedule: GroupSchedule, params, ctx_kv, cache,
                       noisy, rng):
        """All few-step denoising + clean commit for one block, one program."""
        B, G = noisy.shape[0], schedule.num_frames
        x = noisy.astype(jnp.float32)
        steps = self.denoising_step_list
        # per-step cache writes are dead (a block never reads its own
        # slots) — discard them; only the commit below writes the cache
        for i, t_int in enumerate(steps):
            tt = jnp.full((B, G), float(t_int), jnp.float32)
            flow, _ = fps_forward_group(
                params, self.cfg, x.astype(self.dtype), tt, ctx_kv, cache,
                schedule)
            x0 = self.scheduler.convert_flow_pred_to_x0(
                flow.reshape((-1,) + flow.shape[2:]).astype(jnp.float32),
                x.reshape((-1,) + x.shape[2:]),
                tt.reshape(-1)).reshape(x.shape)
            if i < len(steps) - 1:
                rng, k = jax.random.split(rng)
                noise = jax.random.normal(k, x.shape, jnp.float32)
                nt = jnp.full((B * G,), float(steps[i + 1]), jnp.float32)
                x = self.scheduler.add_noise(
                    x0.reshape((-1,) + x.shape[2:]),
                    noise.reshape((-1,) + x.shape[2:]), nt).reshape(x.shape)
            else:
                x = x0
        # clean-context commit at context_noise
        tt = jnp.full((B, G), float(self.context_noise), jnp.float32)
        _, cache = fps_forward_group(
            params, self.cfg, x.astype(self.dtype), tt, ctx_kv, cache,
            schedule)
        return x, cache

    # -- rolling steady state: ONE program for every block past capacity --

    def _rolling_schedule(self, G: int) -> GroupSchedule:
        """Static schedule for the recency-ordered rolling cache: write at
        the last G slots, attend to every other slot + own in-flight K/V.
        (Dummy frame ids — RoPE comes from the traced start frame.)"""
        cap, s0 = self.max_attention_frames, self.sink_frames
        other = tuple(range(cap - G))
        return GroupSchedule(
            index=-1, frames=tuple(range(10 ** 6, 10 ** 6 + G)),
            append_mode=False,
            write_slots=tuple(range(cap - G, cap)),
            visible_frames=other, visible_slots=other,
            anchor_group=False)

    def _denoise_block_rolling(self, params, ctx_kv, cache, noisy,
                               start_frame, rng):
        """Steady-state AR block: evict the oldest non-sink block (static
        slot rotation into recency order), then denoise + commit exactly
        like the static path.  `start_frame` is traced, so this compiles
        once regardless of video length (causal_model.py:203-226)."""
        from ..ops.rope import dynamic_rope_table
        B, G = noisy.shape[0], noisy.shape[1]
        H, W = noisy.shape[3], noisy.shape[4]
        d = self.cfg.dim // self.cfg.num_heads
        s0 = self.sink_frames
        sched = self._rolling_schedule(G)

        def evict(x):
            # [L, B, SLOTS, S, n, d]: rotate the evicted block to the end
            # (it is overwritten by this block's commit)
            return jnp.concatenate(
                [x[:, :, :s0], x[:, :, s0 + G:], x[:, :, s0:s0 + G]], axis=2)

        # slot rotation applies uniformly to every cache leaf (including
        # the int8 per-token scale planes when quantize_cache is on)
        cache = {name: evict(leaf) for name, leaf in cache.items()}
        rope_cs = dynamic_rope_table(start_frame, G, H // 2, W // 2, d)

        x = noisy.astype(jnp.float32)
        steps = self.denoising_step_list
        # per-step cache writes are dead here too (own slots never read)
        for i, t_int in enumerate(steps):
            tt = jnp.full((B, G), float(t_int), jnp.float32)
            flow, _ = fps_forward_group(
                params, self.cfg, x.astype(self.dtype), tt, ctx_kv, cache,
                sched, rope_cs=rope_cs)
            x0 = self.scheduler.convert_flow_pred_to_x0(
                flow.reshape((-1,) + flow.shape[2:]).astype(jnp.float32),
                x.reshape((-1,) + x.shape[2:]),
                tt.reshape(-1)).reshape(x.shape)
            if i < len(steps) - 1:
                rng, k = jax.random.split(rng)
                noise = jax.random.normal(k, x.shape, jnp.float32)
                nt = jnp.full((B * G,), float(steps[i + 1]), jnp.float32)
                x = self.scheduler.add_noise(
                    x0.reshape((-1,) + x.shape[2:]),
                    noise.reshape((-1,) + x.shape[2:]), nt).reshape(x.shape)
            else:
                x = x0
        tt = jnp.full((B, G), float(self.context_noise), jnp.float32)
        _, cache = fps_forward_group(
            params, self.cfg, x.astype(self.dtype), tt, ctx_kv, cache,
            sched, rope_cs=rope_cs)
        return x, cache

    def _get_rolling_fn(self):
        if self._rolling_fn is None:
            self._rolling_fn = jax.jit(self._denoise_block_rolling,
                                       donate_argnums=(2,))
        return self._rolling_fn

    def _commit_block(self, schedule: GroupSchedule, params, ctx_kv, cache,
                      clean):
        B, G = clean.shape[0], schedule.num_frames
        tt = jnp.zeros((B, G), jnp.float32)
        _, cache = fps_forward_group(params, self.cfg,
                                     clean.astype(self.dtype), tt, ctx_kv,
                                     cache, schedule)
        return cache

    def _get(self, cache_dict, fn, start: int, G: int):
        key = (start, G)
        if key not in cache_dict:
            sched = block_schedule(start, G, self.local_attn_frames)
            cache_dict[key] = jax.jit(functools.partial(fn, sched),
                                      donate_argnums=(2,))
        return cache_dict[key]

    # ------------------------------------------------------------------

    def inference(self, noise: jnp.ndarray, cond_context: jnp.ndarray,
                  initial_latent: Optional[jnp.ndarray] = None,
                  rng: Optional[jax.Array] = None,
                  return_latents: bool = True,
                  profile: bool = False,
                  on_block=None) -> jnp.ndarray:
        """noise [B, F, C, H, W] -> denoised latents [B, F_in + F, C, H, W].

        Unlike the CFG pipeline there is no negative branch (the distilled
        model needs none, causal_inference.py:186-221).

        on_block: optional `callback(start_frame, latents_block)` invoked
        after each denoised block (and each committed context block) in
        generation order — the hook for streaming preview decode
        (`utils.preview.TaehvPreviewer`) or progressive delivery.  The
        callback runs on the host between block dispatches; keep it cheap
        or the AR chain stalls.

        profile=True reproduces the reference's per-phase report
        (causal_inference.py:237-271): init/caching, per-block diffusion,
        total — printed at the end and kept on `self.last_profile` so the
        caller can add a "VAE decoding" phase before re-reporting (decode
        is a separate stage in this design).
        """
        timer = PhaseTimer() if profile else None
        self.last_profile = timer
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        B, F, C, H, W = noise.shape
        nb = self.num_frame_per_block
        n_init = 0 if initial_latent is None else initial_latent.shape[1]

        with (timer.phase("Initialization/caching") if timer
              else contextlib.nullcontext()):
            ctx_kv = self._context_kv(cond_context)
            total = n_init + F
            cap = self.max_attention_frames
            num_slots = cap if cap is not None else max(
                total, self.local_attn_frames)
            cache = self._make_cache(B, H * W // 4, num_slots)
            if timer:
                _sync(ctx_kv)
        outputs = []
        t_diff0 = time.perf_counter()

        start = 0
        # commit context blocks (causal_inference.py:137-172)
        if initial_latent is not None:
            sizes = []
            rem = n_init
            if self.independent_first_frame:
                sizes.append(1)
                rem -= 1
            sizes += [nb] * (rem // nb)
            consumed = 0
            for g in sizes:
                clean = self._constrain_batch(
                    initial_latent[:, consumed:consumed + g])
                fn = self._get(self._commit_fns, self._commit_block, start, g)
                cache = fn(self.params, ctx_kv, cache,
                           clean.astype(jnp.float32))
                outputs.append(clean.astype(jnp.float32))
                if on_block is not None:
                    on_block(start, outputs[-1])
                consumed += g
                start += g

        # denoise blocks
        sizes = []
        rem = F
        if self.independent_first_frame and initial_latent is None:
            sizes.append(1)
            rem -= 1
        sizes += [nb] * (rem // nb)
        consumed = 0
        for g in sizes:
            t_blk0 = time.perf_counter()
            rng, sub = jax.random.split(rng)
            noisy = self._constrain_batch(noise[:, consumed:consumed + g])
            if cap is not None and start + g > cap:
                # steady state: fixed cache, ONE compiled program
                assert start >= cap and (start - cap) % g == 0, (
                    f"rolling KV: block [{start},{start + g}) straddles the "
                    f"{cap}-frame cache boundary; pick max_attention_frames "
                    f"with cap % block == n_warmup_frames % block "
                    f"(here block={g})")
                x, cache = self._get_rolling_fn()(
                    self.params, ctx_kv, cache, noisy,
                    jnp.asarray(start, jnp.int32), sub)
            else:
                fn = self._get(self._block_fns, self._denoise_block, start,
                               g)
                x, cache = fn(self.params, ctx_kv, cache, noisy, sub)
            if timer:
                _sync(x)
                timer.record_block(time.perf_counter() - t_blk0)
            outputs.append(x)
            if on_block is not None:
                on_block(start, x)
            consumed += g
            start += g

        out = jnp.concatenate(outputs, axis=1)
        if timer:
            _sync(out)
            timer.phases["Diffusion generation"] = (
                time.perf_counter() - t_diff0)
            timer.report()
        return out
