"""Distillation objectives: DMD, SiD, CausVid, ODE regression.

Re-design of `MMPL_t2v/model/{dmd,sid,causvid,ode_regression}.py` as pure
jittable loss functions over a model bundle:

  models = {"generator": causal-DiT params,
            "fake_score": bidirectional-DiT params,
            "real_score": bidirectional-DiT params (frozen teacher)}

The generator rollout comes from `SelfForcingRollout`; the scores are the
bidirectional Wan DiT (model/base.py:26-46 instantiates them non-causal).
All losses take (models, batch, rng) and return (loss, log_dict).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.dit import dit_forward
from ..schedulers.flow_match import FlowMatchScheduler
from .self_forcing import SelfForcingRollout, slice_last_window


def shift_timestep(t: jnp.ndarray, shift: float) -> jnp.ndarray:
    """The score-timestep warp (dmd.py:167-171): t' = s*t/(1+(s-1)*t/1000)."""
    if shift <= 1:
        return t
    tn = t / 1000.0
    return shift * tn / (1 + (shift - 1) * tn) * 1000.0


def _flat(a):
    return a.reshape((-1,) + a.shape[2:])


class DistillationConfig:
    def __init__(self, real_guidance_scale: float = 5.0,
                 fake_guidance_scale: float = 0.0,
                 timestep_shift: float = 8.0,
                 min_step: float = 20.0, max_step: float = 980.0,
                 min_score_timestep: int = 0,
                 num_train_timestep: int = 1000,
                 ts_schedule: bool = True, ts_schedule_max: bool = False,
                 sid_alpha: float = 1.0,
                 gan_g_weight: float = 1e-2, gan_d_weight: float = 1e-2,
                 r1_weight: float = 0.0, r2_weight: float = 0.0,
                 r1_sigma: float = 0.01, r2_sigma: float = 0.01,
                 relativistic_discriminator: bool = False,
                 concat_time_embeddings: bool = False,
                 critic_timestep_shift: Optional[float] = None,
                 window_frames: Optional[int] = None,
                 remat: bool = True,
                 remat_offload: bool = False,
                 dtype=jnp.float32):
        self.real_guidance_scale = real_guidance_scale
        self.fake_guidance_scale = fake_guidance_scale
        self.timestep_shift = timestep_shift
        self.min_step = min_step
        self.max_step = max_step
        self.min_score_timestep = min_score_timestep
        self.num_train_timestep = num_train_timestep
        self.ts_schedule = ts_schedule
        self.ts_schedule_max = ts_schedule_max
        self.sid_alpha = sid_alpha
        self.gan_g_weight = gan_g_weight
        self.gan_d_weight = gan_d_weight
        self.r1_weight = r1_weight
        self.r2_weight = r2_weight
        self.r1_sigma = r1_sigma
        self.r2_sigma = r2_sigma
        self.relativistic_discriminator = relativistic_discriminator
        self.concat_time_embeddings = concat_time_embeddings
        self.critic_timestep_shift = (timestep_shift
                                      if critic_timestep_shift is None
                                      else critic_timestep_shift)
        #: score-model window: rollouts longer than this are sliced to
        #: their last `window_frames` frames before the losses, with the
        #: prefix re-encoded through the VAE when available (the
        #: reference's last-21 trick, base.py:153-177)
        self.window_frames = window_frames
        #: rematerialise score-model blocks on backward (the reference's
        #: per-block gradient checkpointing); required at 1.3B scale
        self.remat = remat
        #: additionally park the per-layer boundary activations in pinned
        #: host memory (dit.remat_layer) — the full-depth single-chip
        #: lever, same as fps_forward_train(remat_offload=True)
        self.remat_offload = remat_offload
        self.dtype = dtype


class Distiller:
    """Shared machinery for the DMD/SiD/CausVid family."""

    def __init__(self, model_cfg, dcfg: DistillationConfig,
                 rollout: SelfForcingRollout,
                 scheduler: FlowMatchScheduler,
                 vae_params=None):
        self.model_cfg = model_cfg
        self.dcfg = dcfg
        self.rollout = rollout
        self.scheduler = scheduler
        #: VAE pytree for the last-window prefix re-encode (optional; the
        #: latent-only fallback in slice_last_window applies without it)
        self.vae_params = vae_params

    # -- score model helpers ------------------------------------------------

    def score_x0(self, params, xt, t, ctx):
        """Bidirectional score forward -> x0 prediction ([B,F,...], t [B,F])."""
        flow = dit_forward(params, self.model_cfg,
                           xt.astype(self.dcfg.dtype), t, ctx,
                           remat=self.dcfg.remat,
                           remat_offload=self.dcfg.remat_offload)
        x0 = self.scheduler.convert_flow_pred_to_x0(
            _flat(flow).astype(jnp.float32), _flat(xt.astype(jnp.float32)),
            t.reshape(-1)).reshape(xt.shape)
        return x0

    def _score_timestep(self, rng, B, F, t_from, t_to,
                        shift: Optional[float] = None):
        d = self.dcfg
        min_t = jnp.asarray(
            t_to if (d.ts_schedule and t_to is not None)
            else d.min_score_timestep, jnp.float32)
        max_t = jnp.asarray(
            t_from if (d.ts_schedule_max and t_from is not None)
            else d.num_train_timestep, jnp.float32)
        u = jax.random.uniform(rng, (B, 1))
        t = min_t + u * jnp.maximum(max_t - min_t, 1.0)
        t = jnp.broadcast_to(t, (B, F))          # uniform across frames
        t = shift_timestep(t, d.timestep_shift if shift is None else shift)
        return jnp.clip(t, d.min_step, d.max_step)

    def kl_grad(self, models, noisy, x0_est, t, ctx, uncond_ctx,
                normalization: bool = True):
        """DMD KL gradient (dmd.py:47-126 / causvid.py:47-120)."""
        d = self.dcfg
        fake = self.score_x0(models["fake_score"], noisy, t, ctx)
        if d.fake_guidance_scale != 0.0:
            fake_u = self.score_x0(models["fake_score"], noisy, t,
                                   uncond_ctx)
            fake = fake + (fake - fake_u) * d.fake_guidance_scale
        real_c = self.score_x0(models["real_score"], noisy, t, ctx)
        real_u = self.score_x0(models["real_score"], noisy, t, uncond_ctx)
        real = real_c + (real_c - real_u) * d.real_guidance_scale

        grad = fake - real
        if normalization:
            p_real = x0_est - real
            normalizer = jnp.mean(jnp.abs(p_real), axis=(1, 2, 3, 4),
                                  keepdims=True)
            grad = grad / normalizer
        grad = jnp.nan_to_num(grad)
        return grad, real

    def _rollout(self, models, batch, rng):
        """Rollout + the reference's last-window slice (base.py:103-180).
        Returns (x0, t_from, t_to, gradient_mask-or-None)."""
        r1, r2 = jax.random.split(rng)
        nblocks = self.rollout.num_blocks(
            batch["noise"].shape[1],
            batch.get("initial_latent") is not None)
        flags = self.rollout.sample_exit_flags(r1, nblocks)
        x0, t_from, t_to = self.rollout.rollout(
            models["generator"], batch["ctx_kv"], batch["noise"], flags, r2,
            initial_latent=batch.get("initial_latent"))
        mask = None
        if self.dcfg.window_frames is not None:
            x0, mask = slice_last_window(
                x0, self.dcfg.window_frames,
                self.rollout.num_frame_per_block, self.vae_params,
                independent_first_frame=(
                    self.rollout.independent_first_frame))
        return x0, t_from, t_to, mask

    # -- losses -------------------------------------------------------------

    def dmd_generator_loss(self, models, batch, rng):
        """model/dmd.py:128-235."""
        r1, r2, r3 = jax.random.split(rng, 3)
        x0, t_from, t_to, mask = self._rollout(models, batch, r1)
        B, F = x0.shape[:2]
        t = self._score_timestep(r2, B, F, t_from, t_to)
        noise = jax.random.normal(r3, x0.shape, jnp.float32)
        sg = jax.lax.stop_gradient
        noisy = self.scheduler.add_noise(_flat(sg(x0)), _flat(noise),
                                         t.reshape(-1)).reshape(x0.shape)
        grad, _ = self.kl_grad(models, sg(noisy), sg(x0), t,
                               batch["context"], batch["uncond_context"])
        target = sg(x0 - grad)
        if mask is None:
            loss = 0.5 * jnp.mean((x0 - target) ** 2)
        else:
            # masked mean over in-window frames (dmd.py:188-190): the first
            # block of a sliced window carries image latents, no gradient
            m = mask.astype(jnp.float32)[..., None, None, None]
            loss = 0.5 * jnp.sum((x0 - target) ** 2 * m) / (
                jnp.maximum(jnp.sum(m), 1.0) * float(np.prod(x0.shape[2:])))
        return loss, {"dmd_grad_norm": jnp.mean(jnp.abs(grad))}

    def sid_generator_loss(self, models, batch, rng):
        """model/sid.py:47-145 (Score identity Distillation)."""
        d = self.dcfg
        r1, r2, r3 = jax.random.split(rng, 3)
        # the reference's SiD accepts the gradient mask but never applies
        # it (sid.py:52,125-145) — match that
        x0, t_from, t_to, _ = self._rollout(models, batch, r1)
        B, F = x0.shape[:2]
        t = self._score_timestep(r2, B, F, t_from, t_to)
        noise = jax.random.normal(r3, x0.shape, jnp.float32)
        noisy = self.scheduler.add_noise(_flat(x0), _flat(noise),
                                         t.reshape(-1)).reshape(x0.shape)
        fake = self.score_x0(models["fake_score"], noisy, t,
                             batch["context"])
        real_c = self.score_x0(models["real_score"], noisy, t,
                               batch["context"])
        real_u = self.score_x0(models["real_score"], noisy, t,
                               batch["uncond_context"])
        real = real_c + (real_c - real_u) * d.real_guidance_scale
        sid = (real - fake) * ((real - x0) - d.sid_alpha * (real - fake))
        normalizer = jax.lax.stop_gradient(
            jnp.mean(jnp.abs(x0 - real), axis=(1, 2, 3, 4), keepdims=True))
        loss = jnp.mean(jnp.nan_to_num(sid / normalizer))
        return loss, {"timestep": jnp.mean(t)}

    # CausVid shares the DMD generator loss shape with optional fake-score
    # CFG (causvid.py:47-119); expose it by name for config parity.
    causvid_generator_loss = dmd_generator_loss

    def critic_loss(self, models, batch, rng):
        """Fake-score denoising loss on generator rollouts (dmd.py:237-332),
        flow variant (`denoising_loss_type: flow`, utils/loss.py:61-78)."""
        r1, r2, r3 = jax.random.split(rng, 3)
        x0, t_from, t_to, _ = self._rollout(models, batch, r1)
        x0 = jax.lax.stop_gradient(x0)
        B, F = x0.shape[:2]
        t = self._score_timestep(r2, B, F, t_from, t_to)
        noise = jax.random.normal(r3, x0.shape, jnp.float32)
        noisy = self.scheduler.add_noise(_flat(x0), _flat(noise),
                                         t.reshape(-1)).reshape(x0.shape)
        pred_x0 = self.score_x0(models["fake_score"], noisy, t,
                                batch["context"])
        flow_pred = self.scheduler.convert_x0_to_flow_pred(
            _flat(pred_x0), _flat(noisy), t.reshape(-1))
        flow_target = _flat(noise - x0)
        loss = jnp.mean((flow_pred - flow_target) ** 2)
        return loss, {"critic_timestep": jnp.mean(t)}


    # -- GAN objective (model/gan.py:69-295) --------------------------------

    def _gan_logits(self, models, noisy, t, ctx):
        """Classify-mode fake_score forward (gan.py:69-89)."""
        from .gan import dit_forward_classify
        return dit_forward_classify(
            models["fake_score"], models["gan_head"], self.model_cfg,
            noisy.astype(self.dcfg.dtype), t, ctx,
            concat_time_embeddings=self.dcfg.concat_time_embeddings,
            remat=self.dcfg.remat,
            remat_offload=self.dcfg.remat_offload)

    def _gan_noisy_pair(self, models, batch, rng, stop_grad_rollout: bool):
        """Shared rollout + noising for both GAN losses.

        Returns (noisy_fake, noisy_real, t).  Noise handling mirrors the
        reference's asymmetry: the generator loss draws fresh noise for the
        real branch (gan.py:138-151) while the critic reuses the fake
        branch's noise (gan.py:226-239)."""
        d = self.dcfg
        r1, r2, r3, r4 = jax.random.split(rng, 4)
        x0, t_from, t_to, _ = self._rollout(models, batch, r1)
        if stop_grad_rollout:
            x0 = jax.lax.stop_gradient(x0)
        B, F = x0.shape[:2]
        t = self._score_timestep(r2, B, F, t_from, t_to,
                                 shift=d.critic_timestep_shift)
        noise_f = jax.random.normal(r3, x0.shape, jnp.float32)
        noisy_fake = self.scheduler.add_noise(
            _flat(x0), _flat(noise_f), t.reshape(-1)).reshape(x0.shape)
        real = jax.lax.stop_gradient(
            batch["real_latents"].astype(jnp.float32))
        if real.shape[1] > x0.shape[1]:
            # windowed rollout vs full-length reals: compare the last
            # window (the reference's dataloader serves 21-frame reals)
            real = real[:, -x0.shape[1]:]
        noise_r = noise_f if stop_grad_rollout else \
            jax.random.normal(r4, real.shape, jnp.float32)
        noisy_real = self.scheduler.add_noise(
            _flat(real), _flat(noise_r), t.reshape(-1)).reshape(real.shape)
        return noisy_fake, noisy_real, t

    def gan_generator_loss(self, models, batch, rng):
        """R3GAN generator loss on rolled-out videos (gan.py:92-172).
        batch additionally carries `real_latents` [B, F, C, H, W]."""
        d = self.dcfg
        noisy_fake, noisy_real, t = self._gan_noisy_pair(
            models, batch, rng, stop_grad_rollout=False)
        # one batched critic pass over [fake; real] (gan.py:153-164)
        both = jnp.concatenate([noisy_fake,
                                jax.lax.stop_gradient(noisy_real)], axis=0)
        ctx2 = jnp.concatenate([batch["context"], batch["context"]], axis=0)
        t2 = jnp.concatenate([t, t], axis=0)
        logits = self._gan_logits(jax.lax.stop_gradient(models), both, t2,
                                  ctx2)
        lf, lr = jnp.split(logits.astype(jnp.float32), 2, axis=0)
        if d.relativistic_discriminator:
            loss = jnp.mean(jax.nn.softplus(-(lf - lr)))
        else:
            loss = jnp.mean(jax.nn.softplus(-lf))
        return loss * d.gan_g_weight, {"gan_fake_logit": jnp.mean(lf)}

    def gan_critic_loss(self, models, batch, rng):
        """R3GAN critic loss + R1/R2 finite-difference regularisation
        (gan.py:174-295).  Trains `fake_score` + `gan_head`."""
        d = self.dcfg
        r_main, r_r1, r_r2 = jax.random.split(rng, 3)
        noisy_fake, noisy_real, t = self._gan_noisy_pair(
            models, batch, r_main, stop_grad_rollout=True)
        both = jnp.concatenate([noisy_fake, noisy_real], axis=0)
        ctx2 = jnp.concatenate([batch["context"], batch["context"]], axis=0)
        t2 = jnp.concatenate([t, t], axis=0)
        logits = self._gan_logits(models, both, t2, ctx2)
        lf, lr = jnp.split(logits.astype(jnp.float32), 2, axis=0)
        if d.relativistic_discriminator:
            loss = jnp.mean(jax.nn.softplus(-(lr - lf)))
        else:
            loss = jnp.mean(jax.nn.softplus(-lr)) + \
                jnp.mean(jax.nn.softplus(lf))
        loss = loss * d.gan_d_weight

        # R1/R2: finite-difference gradient penalties (gan.py:259-288)
        def fd_penalty(noisy, base_logit, sigma, key):
            eps = sigma * jax.random.normal(key, noisy.shape, jnp.float32)
            pert = self._gan_logits(models, noisy + eps, t, batch["context"])
            g = (pert.astype(jnp.float32) - base_logit) / sigma
            return jnp.mean(g ** 2)

        log = {"gan_real_logit": jnp.mean(lr), "gan_fake_logit": jnp.mean(lf)}
        if d.r1_weight > 0.0:
            loss = loss + d.r1_weight * fd_penalty(noisy_real, lr,
                                                   d.r1_sigma, r_r1)
        if d.r2_weight > 0.0:
            loss = loss + d.r2_weight * fd_penalty(noisy_fake, lf,
                                                   d.r2_sigma, r_r2)
        return loss, log


def prepare_ode_generator_input(ode_latent, denoising_step_list, rng,
                                num_frame_per_block: int = 3):
    """The `_prepare_generator_input` analogue (ode_regression.py:57-99):
    pick a random step index PER BLOCK (uniform_timestep=False), gather the
    solver state at that index for each frame, and return the per-frame
    timesteps from the step list.

    ode_latent: [B, S+1, F, C, H, W] (entry j = solver input at step j,
    entry S = clean endpoint).  Returns (noisy_input [B,F,C,H,W],
    timestep [B,F]).
    """
    B, S1, F = ode_latent.shape[:3]
    S = len(denoising_step_list)
    nb = num_frame_per_block
    assert F % nb == 0, (F, nb)
    idx = jnp.repeat(jax.random.randint(rng, (B, F // nb), 0, S),
                     nb, axis=1)                               # [B, F]
    onehot = jax.nn.one_hot(idx, S1, dtype=ode_latent.dtype)   # [B, F, S+1]
    noisy = jnp.einsum("bfs,bsfchw->bfchw", onehot, ode_latent)
    t = jnp.asarray(denoising_step_list, jnp.float32)[idx]
    return noisy, t


def ode_regression_loss(generator_params, cfg, scheduler: FlowMatchScheduler,
                        batch, rng, dtype=jnp.float32, remat: bool = True,
                        remat_offload: bool = False):
    """model/ode_regression.py:9-138: regress the causal generator onto
    precomputed ODE-solver trajectories (CausVid §4.3).

    batch: {"noisy_input" [B,F,C,H,W] (a solver state at `timestep`),
            "clean_latent" [B,F,C,H,W] (the trajectory endpoint),
            "timestep" [B,F], "ctx_kv"}.
    """
    from ..models.fps_dit import fps_forward_group, init_kv_cache
    from ..pipelines.causal_inference import block_schedule

    noisy = batch["noisy_input"].astype(jnp.float32)
    target = batch["clean_latent"].astype(jnp.float32)
    t = batch["timestep"].astype(jnp.float32)
    B, F = noisy.shape[:2]
    nb = 3
    cache = init_kv_cache(cfg, B, noisy.shape[3] * noisy.shape[4] // 4,
                          num_slots=max(F, 21), dtype=dtype)
    preds = []
    for b in range(F // nb):
        sched = block_schedule(b * nb, nb, 21)
        x = noisy[:, b * nb:(b + 1) * nb]
        tt = t[:, b * nb:(b + 1) * nb]
        flow, cache = fps_forward_group(
            generator_params, cfg, x.astype(dtype), tt, batch["ctx_kv"],
            cache, sched, remat=remat, remat_offload=remat_offload)
        x0 = scheduler.convert_flow_pred_to_x0(
            _flat(flow).astype(jnp.float32), _flat(x),
            tt.reshape(-1)).reshape(x.shape)
        preds.append(x0)
        # commit the *target* clean frames as context (ode_regression.py)
        clean = target[:, b * nb:(b + 1) * nb]
        # unlike the rollout, gradients legitimately flow through this
        # cache (the reference trains through its kv writes) — per-layer
        # remat bounds the memory instead of severing
        _, cache = fps_forward_group(
            generator_params, cfg, clean.astype(dtype),
            jnp.zeros_like(tt), batch["ctx_kv"], cache, sched,
            remat=remat, remat_offload=remat_offload)
    pred = jnp.concatenate(preds, axis=1)
    # frames whose sampled timestep is 0 are excluded (the reference's
    # `mask = timestep != 0`, ode_regression.py:125-128); for step lists
    # without 0 this is the plain mean
    mask = (t != 0.0).astype(jnp.float32)[..., None, None, None]
    se = (pred - target) ** 2 * mask
    denom = jnp.maximum(jnp.sum(mask), 1.0) * float(np.prod(pred.shape[2:]))
    loss = jnp.sum(se) / denom
    unnorm = jnp.mean((pred - target) ** 2, axis=(1, 2, 3, 4))
    return loss, {"pred": pred, "unnormalized_loss": unnorm,
                  "timestep": jnp.mean(t, axis=1)}
