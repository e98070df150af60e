"""ODE-trajectory dataset generation (the producer for ODERegression).

The reference trains `model/ode_regression.py` (CausVid §4.3) from
precomputed teacher ODE trajectories stored in LMDB
(`utils/dataset.py:37-70`: `ode_latent` [N, num_steps, F, C, H, W] +
prompts), but never released the generator.  This module completes the
loop: run the bidirectional teacher's UniPC CFG sampling, record the
solver state at the distillation step list's timesteps plus the final
clean latent, and write shards the trainer consumes
(`ODERegressionNpzDataset` below mirrors the LMDB dataset's item schema).

    from mmpl_tpu.data.ode_gen import record_trajectories, write_ode_shard
    traj = record_trajectories(cfg, params, noise, cond, uncond)
    write_ode_shard("shards/ode_00000.npz", traj, prompts)
"""

from __future__ import annotations

import os
from typing import List, Sequence

import numpy as np


def record_trajectories(cfg, params, noise, cond_ctx, uncond_ctx,
                        denoising_step_list: Sequence[int] = (1000, 750,
                                                              500, 250),
                        sampling_steps: int = 50,
                        guidance_scale: float = 5.0,
                        timestep_shift: float = 8.0,
                        dtype=None) -> np.ndarray:
    """Teacher UniPC rollout -> [B, len(step_list)+1, F, C, H, W].

    Entry j is the solver state fed into the step whose timestep is
    closest to `denoising_step_list[j]` (entry 0 is the initial noise);
    the final entry is the fully denoised latent — exactly the
    (noisy_input@t, clean) pairs `ode_regression_loss` regresses on.
    """
    import jax
    import jax.numpy as jnp
    from ..models.dit import dit_forward, fuse_qkv_params
    from ..schedulers.unipc import FlowUniPC

    dtype = dtype if dtype is not None else jnp.bfloat16
    if "qkv" not in params["blocks"]["self_attn"]:
        params = fuse_qkv_params(params, num_heads=cfg.num_heads)
    sampler = FlowUniPC(sampling_steps, shift=timestep_shift)
    g = float(guidance_scale)

    @jax.jit
    def run(params, noise, cond, uncond):
        B = noise.shape[0]
        ctx2 = jnp.concatenate([cond, uncond], 0)
        state = sampler.init_state(noise.astype(jnp.float32))

        def body(state, step_in):
            coef, t = step_in
            lat2 = jnp.concatenate([state["sample"], state["sample"]], 0)
            tt = jnp.broadcast_to(t, (2 * B,))
            flow2 = dit_forward(params, cfg, lat2.astype(dtype), tt,
                                ctx2.astype(dtype))
            c, u = flow2[:B], flow2[B:]
            flow = (u.astype(jnp.float32)
                    + g * (c - u).astype(jnp.float32))
            new = FlowUniPC.step(coef, state, flow)
            return new, new["sample"]

        _, samples = jax.lax.scan(body, state,
                                  (sampler.table, sampler.timesteps))
        return samples                      # [steps, B, F, C, H, W]

    samples = np.asarray(run(params, noise, cond_ctx, uncond_ctx))
    ts = np.asarray(sampler.timesteps)
    noise_np = np.asarray(noise, np.float32)
    # input to step i is the sample AFTER step i-1 (noise for i = 0)
    inputs = np.concatenate([noise_np[None], samples[:-1]], axis=0)
    idx = [int(np.argmin(np.abs(ts - s))) for s in denoising_step_list]
    picks = [inputs[i] for i in idx] + [samples[-1]]
    return np.stack(picks, axis=1)          # [B, S+1, F, C, H, W]


def write_ode_shard(path: str, trajectories: np.ndarray,
                    prompts: Sequence[str],
                    prompt_embeds: np.ndarray = None) -> str:
    """One npz shard: `ode_latent` [N, S+1, F, C, H, W] (fp16, matching
    the reference LMDB's dtype) + `prompts` (+ optional precomputed
    `prompt_embeds` [N, L, D] so `train.py --objective ode` needs no text
    encoder at train time)."""
    assert trajectories.shape[0] == len(prompts), (
        trajectories.shape, len(prompts))
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    extra = {}
    if prompt_embeds is not None:
        assert prompt_embeds.shape[0] == trajectories.shape[0]
        extra["prompt_embeds"] = prompt_embeds.astype(np.float16)
    np.savez(path, ode_latent=trajectories.astype(np.float16),
             prompts=np.asarray(list(prompts), dtype=object), **extra)
    return path


class ODERegressionNpzDataset:
    """npz twin of the reference's ODERegressionLMDBDataset
    (utils/dataset.py:37-70): items {"ode_latent" fp32 [S+1, F, C, H, W],
    "prompts" str}."""

    def __init__(self, shard_dir: str):
        self.files = sorted(
            os.path.join(shard_dir, f) for f in os.listdir(shard_dir)
            if f.endswith(".npz"))
        self._index: List[tuple] = []
        for f in self.files:
            with np.load(f, allow_pickle=True) as z:
                n = z["ode_latent"].shape[0]
            self._index.extend((f, i) for i in range(n))
        self._cache = {}

    def __len__(self):
        return len(self._index)

    def __getitem__(self, idx: int):
        path, i = self._index[idx]
        if path not in self._cache:
            self._cache.clear()
            self._cache[path] = dict(np.load(path, allow_pickle=True))
        z = self._cache[path]
        item = {"ode_latent": z["ode_latent"][i].astype(np.float32),
                "prompts": str(z["prompts"][i])}
        if "prompt_embeds" in z:
            item["prompt_embeds"] = z["prompt_embeds"][i].astype(np.float32)
        return item
