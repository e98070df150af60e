"""Denoising-loss registry (x0 / v / noise / flow prediction MSE).

Re-design of `MMPL_t2v/utils/loss.py:1-81`: each loss takes the generated
clean sample, noise, the network prediction in its native parameterisation,
and the timestep, and returns a scalar MSE.  `get_denoising_loss` mirrors
the reference registry keyed by the config's `denoising_loss_type`.
"""

from __future__ import annotations

import jax.numpy as jnp


def x0_pred_loss(x, x_pred, **_):
    """X0PredLoss (utils/loss.py:27-36)."""
    return jnp.mean((x.astype(jnp.float32) - x_pred.astype(jnp.float32)) ** 2)


def v_pred_loss(x, noise, v_pred, alphas_cumprod, timestep, **_):
    """VPredLoss (utils/loss.py:38-48): target v = sqrt(a) n - sqrt(1-a) x."""
    a = alphas_cumprod[timestep.astype(jnp.int32)].reshape(
        (-1,) + (1,) * (x.ndim - 1))
    target = jnp.sqrt(a) * noise - jnp.sqrt(1 - a) * x
    return jnp.mean((target - v_pred.astype(jnp.float32)) ** 2)


def noise_pred_loss(noise, noise_pred, **_):
    """NoisePredLoss (utils/loss.py:50-59)."""
    return jnp.mean(
        (noise.astype(jnp.float32) - noise_pred.astype(jnp.float32)) ** 2)


def flow_pred_loss(x, noise, flow_pred, **_):
    """FlowPredLoss (utils/loss.py:61-78): target = noise - x."""
    target = noise.astype(jnp.float32) - x.astype(jnp.float32)
    return jnp.mean((target - flow_pred.astype(jnp.float32)) ** 2)


_REGISTRY = {
    "x0": x0_pred_loss,
    "v": v_pred_loss,
    "noise": noise_pred_loss,
    "flow": flow_pred_loss,
}


def get_denoising_loss(loss_type: str):
    """utils/loss.py:80."""
    return _REGISTRY[loss_type]
