"""Flow-matching diffusion training (teacher-forcing family), sharded.

First slice of the reference training stack (`model/diffusion.py`
CausalDiffusion + `model/base.py` timestep sampling + `utils/loss.py`
FlowPredLoss): a jittable, mesh-sharded train step with
  * blockwise random timesteps (base.py:48-95 — same timestep within each
    num_frame_per_block group),
  * flow target v = noise - x0 and per-timestep loss weighting
    (scheduler.py:178-194, diffusion.py:193-198),
  * 10% CFG context dropout (diffusion.py:174-191),
  * FSDP/TP parameter sharding + DP batch sharding via GSPMD (replacing
    torch FSDP, wan/distributed/fsdp.py).

The causal teacher-forcing variant with the fps-forcing block mask
(causal_model.py:620-709) layers on top of this via `attn_mask`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

from ..models.dit import dit_forward
from ..schedulers.flow_match import FlowMatchScheduler
from ..parallel.mesh import (batch_sharding, dit_param_shardings, make_mesh,
                             replicate)


def sample_block_timesteps(key, batch: int, num_frames: int,
                           num_frame_per_block: int,
                           min_t: int = 0, max_t: int = 1000) -> jnp.ndarray:
    """[B, F] timesteps, equal within each block (base.py:48-95)."""
    nb = num_frames // num_frame_per_block
    t = jax.random.randint(key, (batch, nb), min_t, max_t).astype(jnp.float32)
    return jnp.repeat(t, num_frame_per_block, axis=1)


def make_loss_fn(cfg, scheduler: FlowMatchScheduler,
                 cfg_dropout: float = 0.1, compute_dtype=None):
    """Flow-matching MSE with timestep weighting on the Wan DiT.

    compute_dtype: trunk precision (default bf16 mixed precision; loss
    math stays fp32 — see make_teacher_forcing_loss_fn)."""
    cdtype = compute_dtype if compute_dtype is not None else jnp.bfloat16

    def loss_fn(params, batch, rng):
        params = jax.tree.map(
            lambda a: a.astype(cdtype)
            if (hasattr(a, "dtype") and a.dtype == jnp.float32) else a,
            params)
        x0 = batch["latents"]               # [B, F, C, H, W]
        context = batch["context"]          # [B, 512, text_dim]
        B, F = x0.shape[:2]
        k1, k2, k3 = jax.random.split(rng, 3)

        t = sample_block_timesteps(k1, B, F, num_frame_per_block=3)
        # map integer train-step t to the shifted schedule's timestep value
        t_sched = scheduler.timesteps[jnp.clip(
            t.astype(jnp.int32), 0, scheduler.timesteps.shape[0] - 1)]
        noise = jax.random.normal(k2, x0.shape, jnp.float32)
        flat = lambda a: a.reshape((-1,) + a.shape[2:])
        xt = scheduler.add_noise(flat(x0.astype(jnp.float32)), flat(noise),
                                 t_sched.reshape(-1)).reshape(x0.shape)

        # 10% unconditional dropout (diffusion.py:174-191)
        drop = jax.random.bernoulli(k3, cfg_dropout, (B, 1, 1))
        context = jnp.where(drop, jnp.zeros_like(context), context)

        flow_pred = dit_forward(params, cfg, xt.astype(cdtype), t_sched,
                                context)
        target = noise - x0.astype(jnp.float32)
        err = (flow_pred.astype(jnp.float32) - target) ** 2
        w = scheduler.training_weight(t_sched).reshape(B, F, 1, 1, 1)
        return jnp.mean(err * w)

    return loss_fn


def make_teacher_forcing_loss_fn(cfg, scheduler: FlowMatchScheduler,
                                 frame_mask,
                                 num_frame_per_block: int = 3,
                                 noise_aug_max_timestep: int = 0,
                                 cfg_dropout: float = 0.1,
                                 remat_group: int = 1,
                                 remat_offload: bool = False,
                                 compute_dtype=None):
    """CausalDiffusion generator loss (model/diffusion.py:111-204).

    Teacher forcing: the [clean | noisy] sequence runs under `frame_mask`
    (typically `masks.fps_forcing_frame_mask(T2V_CLEAN_STEPS)` — the mask
    that trained the released checkpoints, causal_model.py:959-974), the
    clean context optionally noise-augmented (diffusion.py:153-171), with
     10% unconditional-context dropout (diffusion.py:174-191).

    batch: {"latents" [B,F,C,H,W], "context", "uncond_context"}.

    compute_dtype: trunk precision (mixed precision — the torch reference
    trains under bf16 autocast with fp32 master weights).  Default
    bfloat16: an fp32 trunk at the 42x1560 teacher-forcing shape doubles
    every activation (the full-depth 1.3B backward cannot fit 16 GB) and
    halves the MXU rate.  The noising/weighting math stays fp32; grads
    flow through the cast back to the fp32 masters.
    """
    import jax.numpy as jnp
    from ..models.fps_dit import fps_forward_train

    mask = jnp.asarray(frame_mask)
    cdtype = compute_dtype if compute_dtype is not None else jnp.bfloat16

    def loss_fn(params, batch, rng):
        cparams = jax.tree.map(
            lambda a: a.astype(cdtype)
            if (hasattr(a, "dtype") and a.dtype == jnp.float32) else a,
            params)
        x0 = batch["latents"].astype(jnp.float32)
        B, F = x0.shape[:2]
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        flat = lambda a: a.reshape((-1,) + a.shape[2:])

        idx = jax.random.randint(
            k1, (B, F // num_frame_per_block), 0,
            scheduler.timesteps.shape[0])
        idx = jnp.repeat(idx, num_frame_per_block, axis=1)
        t = scheduler.timesteps[idx]
        noise = jax.random.normal(k2, x0.shape, jnp.float32)
        noisy = scheduler.add_noise(flat(x0), flat(noise),
                                    t.reshape(-1)).reshape(x0.shape)
        target = noise - x0

        if noise_aug_max_timestep > 0:
            idx_aug = jax.random.randint(
                k3, (B, F // num_frame_per_block), 0,
                noise_aug_max_timestep)
            idx_aug = jnp.repeat(idx_aug, num_frame_per_block, axis=1)
            aug_t = scheduler.timesteps[idx_aug]
            clean_aug = scheduler.add_noise(
                flat(x0), flat(noise), aug_t.reshape(-1)).reshape(x0.shape)
        else:
            clean_aug, aug_t = x0, jnp.zeros_like(t)

        # single-coin CFG dropout per step (diffusion.py:176)
        drop = jax.random.uniform(k4, ()) <= cfg_dropout
        ctx = jnp.where(drop, batch["uncond_context"], batch["context"])

        flow = fps_forward_train(cparams, cfg, noisy.astype(cdtype), t,
                                 ctx, mask,
                                 clean_x=clean_aug.astype(cdtype),
                                 aug_t=aug_t, remat_group=remat_group,
                                 remat_offload=remat_offload)
        err = jnp.mean((flow.astype(jnp.float32) - target) ** 2,
                       axis=(2, 3, 4))
        w = scheduler.training_weight(t).reshape(B, F)
        return jnp.mean(err * w)

    return loss_fn


class DiffusionTrainer:
    """Sharded trainer: params over (fsdp, tp), batch over dp."""

    def __init__(self, cfg, params, mesh=None, learning_rate: float = 1e-5,
                 weight_decay: float = 0.01, timestep_shift: float = 8.0,
                 loss_fn=None):
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_mesh()
        self.scheduler = FlowMatchScheduler(
            shift=timestep_shift, sigma_min=0.0, extra_one_step=True)
        self.scheduler.set_timesteps(1000, training=True)
        self.tx = optax.adamw(learning_rate, weight_decay=weight_decay)

        self.param_shardings = dit_param_shardings(self.mesh, params)
        self.params = jax.device_put(params, self.param_shardings)
        self.opt_state = jax.jit(
            self.tx.init,
            out_shardings=self._opt_shardings(params))(self.params)
        self._loss_fn = loss_fn if loss_fn is not None else make_loss_fn(
            cfg, self.scheduler)
        self._step = self._build_step()

    def _opt_shardings(self, params):
        shapes = jax.eval_shape(self.tx.init, params)
        # any optimizer leaf whose shape mirrors a param gets that param's
        # sharding; scalars (step count) replicate.
        flat_params, _ = jax.tree_util.tree_flatten(params)
        shard_by_shape = {}
        flat_shard, _ = jax.tree_util.tree_flatten(self.param_shardings)
        for p, s in zip(flat_params, flat_shard):
            shard_by_shape.setdefault(p.shape, s)
        def pick(leaf):
            return shard_by_shape.get(leaf.shape, replicate(self.mesh))
        return jax.tree.map(pick, shapes)

    def _build_step(self):
        tx = self.tx
        loss_fn = self._loss_fn

        @functools.partial(
            jax.jit,
            donate_argnums=(0, 1),
        )
        def step(params, opt_state, batch, rng):
            loss, grads = jax.value_and_grad(loss_fn)(params, batch, rng)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return step

    def shard_batch(self, batch):
        return {
            k: jax.device_put(v, batch_sharding(self.mesh, v.ndim))
            for k, v in batch.items()
        }

    def train_step(self, batch, rng):
        batch = self.shard_batch(batch)
        self.params, self.opt_state, loss = self._step(
            self.params, self.opt_state, batch, rng)
        return loss
