"""Flow-matching Euler scheduler (training + few-step distilled sampling).

JAX re-design of `MMPL_t2v/utils/scheduler.py:106-194` (FlowMatchScheduler):
the sigma/timestep tables are precomputed fp64 numpy on the host; `step`,
`add_noise`, the x0/flow conversions and the training weight are stateless
jittable functions that look sigmas up by nearest timestep — exactly the
reference's `argmin(|timesteps - t|)` semantics (scheduler.py:148-150).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np


class FlowMatchScheduler:
    """Shifted-sigma linear flow schedule.

    sigma(t) tables follow scheduler.py:118-133:
      sigmas = linspace(sigma_start, sigma_min, N [+1])[:N]
      sigmas = shift * sigmas / (1 + (shift - 1) * sigmas)
      timesteps = sigmas * num_train_timesteps
    """

    def __init__(self, num_inference_steps: int = 100,
                 num_train_timesteps: int = 1000, shift: float = 3.0,
                 sigma_max: float = 1.0, sigma_min: float = 0.003 / 1.002,
                 inverse_timesteps: bool = False, extra_one_step: bool = False,
                 reverse_sigmas: bool = False):
        self.num_train_timesteps = num_train_timesteps
        self.shift = shift
        self.sigma_max = sigma_max
        self.sigma_min = sigma_min
        self.inverse_timesteps = inverse_timesteps
        self.extra_one_step = extra_one_step
        self.reverse_sigmas = reverse_sigmas
        self.linear_timesteps_weights: Optional[jnp.ndarray] = None
        self.set_timesteps(num_inference_steps)

    def set_timesteps(self, num_inference_steps: int = 100,
                      denoising_strength: float = 1.0,
                      training: bool = False) -> None:
        sigma_start = self.sigma_min + \
            (self.sigma_max - self.sigma_min) * denoising_strength
        if self.extra_one_step:
            sigmas = np.linspace(sigma_start, self.sigma_min,
                                 num_inference_steps + 1,
                                 dtype=np.float64)[:-1]
        else:
            sigmas = np.linspace(sigma_start, self.sigma_min,
                                 num_inference_steps, dtype=np.float64)
        if self.inverse_timesteps:
            sigmas = sigmas[::-1].copy()
        sigmas = self.shift * sigmas / (1 + (self.shift - 1) * sigmas)
        if self.reverse_sigmas:
            sigmas = 1 - sigmas
        self.sigmas = jnp.asarray(sigmas, dtype=jnp.float32)
        self.timesteps = jnp.asarray(sigmas * self.num_train_timesteps,
                                     dtype=jnp.float32)
        if training:
            x = np.asarray(self.timesteps, dtype=np.float64)
            y = np.exp(-2 * ((x - num_inference_steps / 2)
                             / num_inference_steps) ** 2)
            y_shifted = y - y.min()
            self.linear_timesteps_weights = jnp.asarray(
                y_shifted * (num_inference_steps / y_shifted.sum()),
                dtype=jnp.float32)

    # -- lookups ------------------------------------------------------------

    def _timestep_id(self, timestep: jnp.ndarray) -> jnp.ndarray:
        t = timestep.reshape(-1).astype(jnp.float32)
        return jnp.argmin(jnp.abs(self.timesteps[None, :] - t[:, None]),
                          axis=1)

    def _sigma_of(self, timestep: jnp.ndarray, ndim: int) -> jnp.ndarray:
        sig = self.sigmas[self._timestep_id(timestep)]
        return sig.reshape(sig.shape + (1,) * (ndim - 1))

    # -- core ops (scheduler.py:143-194) ------------------------------------

    def step(self, model_output: jnp.ndarray, timestep: jnp.ndarray,
             sample: jnp.ndarray, to_final: bool = False) -> jnp.ndarray:
        """Euler step: x_prev = x + v * (sigma_next - sigma)."""
        tid = self._timestep_id(timestep)
        sigma = self.sigmas[tid].reshape((-1,) + (1,) * (sample.ndim - 1))
        last = tid + 1 >= self.timesteps.shape[0]
        final_sigma = 1.0 if (self.inverse_timesteps or
                              self.reverse_sigmas) else 0.0
        sigma_next = jnp.where(
            last, final_sigma,
            self.sigmas[jnp.minimum(tid + 1, self.timesteps.shape[0] - 1)]
        ).reshape((-1,) + (1,) * (sample.ndim - 1))
        if to_final:
            sigma_next = jnp.full_like(sigma_next, final_sigma)
        out = (sample.astype(jnp.float32)
               + model_output.astype(jnp.float32) * (sigma_next - sigma))
        return out.astype(sample.dtype)

    def add_noise(self, original_samples: jnp.ndarray, noise: jnp.ndarray,
                  timestep: jnp.ndarray) -> jnp.ndarray:
        sigma = self._sigma_of(timestep, original_samples.ndim)
        out = ((1 - sigma) * original_samples.astype(jnp.float32)
               + sigma * noise.astype(jnp.float32))
        return out.astype(noise.dtype)

    def convert_flow_pred_to_x0(self, flow_pred: jnp.ndarray,
                                xt: jnp.ndarray,
                                timestep: jnp.ndarray) -> jnp.ndarray:
        """x0 = x_t - sigma_t * v  (wan_wrapper.py:172-196)."""
        sigma = self._sigma_of(timestep, xt.ndim)
        out = xt.astype(jnp.float32) - sigma * flow_pred.astype(jnp.float32)
        return out.astype(flow_pred.dtype)

    def convert_x0_to_flow_pred(self, x0_pred: jnp.ndarray, xt: jnp.ndarray,
                                timestep: jnp.ndarray) -> jnp.ndarray:
        """v = (x_t - x0) / sigma_t (wan_wrapper.py:198-219)."""
        sigma = self._sigma_of(timestep, xt.ndim)
        out = (xt.astype(jnp.float32)
               - x0_pred.astype(jnp.float32)) / sigma
        return out.astype(x0_pred.dtype)

    def training_target(self, sample, noise, timestep):
        return noise - sample

    def training_weight(self, timestep: jnp.ndarray) -> jnp.ndarray:
        """Per-timestep loss weight (scheduler.py:182-194)."""
        assert self.linear_timesteps_weights is not None, \
            "set_timesteps(training=True) first"
        t = timestep.reshape(-1).astype(jnp.float32)
        tid = jnp.argmin(jnp.abs(self.timesteps[:, None] - t[None, :]),
                         axis=0)
        return self.linear_timesteps_weights[tid]
