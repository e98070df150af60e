"""Flow-matching DPM-Solver++ multistep, precomputed for `lax.scan`.

Re-design of `MMPL_t2v/wan/utils/fm_solvers.py`
(FlowDPMSolverMultistepScheduler, dpmsolver++ / midpoint / solver_order 2 —
the configuration the pipelines use, casual_fps_inference.py:512-521) in the
same scan-table style as `schedulers/unipc.py`: per-step update
    x0     = sample - sigma[i] * flow_pred
    next   = p_ax[i]*sample + p_m0[i]*x0 + p_m1[i]*m_prev
with all scalar coefficients precomputed fp64 host-side.

Update rules (fm_solvers.py:527-556, dpmsolver++/midpoint):
  order1: x_t = (s_t/s_s0) x - a_t(e^{-h}-1) m0
  order2: x_t = (s_t/s_s0) x - a_t(e^{-h}-1) (m0 + 0.5 D1),
          D1 = (m0 - m1)/r0,  r0 = (lam_s0 - lam_s1)/h
Sigma schedule: `get_sampling_sigmas` (fm_solvers.py:22-27) —
linspace(1, 0, N+1)[:N] with the shift warp, final sigma 0.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np


def get_sampling_sigmas(sampling_steps: int, shift: float) -> np.ndarray:
    sigma = np.linspace(1, 0, sampling_steps + 1,
                        dtype=np.float64)[:sampling_steps]
    return shift * sigma / (1 + (shift - 1) * sigma)


def _lambda(sigma: float) -> float:
    """Guarded log-SNR.  The schedule endpoints (sigma == 1 at the first
    warped sigma, sigma == 0 at the appended final one) have well-defined
    infinite limits that the update rules handle (h -> inf => expm1(-h)
    -> -1; 1/r0 -> 0) — return them explicitly rather than tripping
    log(0) RuntimeWarnings."""
    if sigma >= 1.0:
        return -np.inf
    if sigma <= 0.0:
        return np.inf
    return np.log(1.0 - sigma) - np.log(sigma)


def compute_dpm_coeffs(num_inference_steps: int, shift: float = 8.0,
                       num_train_timesteps: int = 1000,
                       lower_order_final: bool = True):
    N = num_inference_steps
    sig = get_sampling_sigmas(N, shift)
    sigmas = np.concatenate([sig, [0.0]])
    timesteps = (sig * num_train_timesteps).astype(np.int64).astype(
        np.float64)

    p_ax = np.zeros(N)
    p_m0 = np.zeros(N)
    p_m1 = np.zeros(N)
    lower = 0
    for i in range(N):
        order = min(2, N - i) if lower_order_final else 2
        order = min(order, lower + 1)
        lower = min(lower + 1, 2)
        s_t, s_s0 = sigmas[i + 1], sigmas[i]
        if s_t == 0.0:
            p_ax[i], p_m0[i], p_m1[i] = 0.0, 1.0, 0.0
            continue
        a_t = 1.0 - s_t
        h = _lambda(s_t) - _lambda(s_s0)
        em = np.expm1(-h)
        p_ax[i] = s_t / s_s0
        p_m0[i] = -a_t * em
        if order >= 2:
            h0 = _lambda(s_s0) - _lambda(sigmas[i - 1])
            r0 = h0 / h
            p_m0[i] += -a_t * em * 0.5 / r0
            p_m1[i] = a_t * em * 0.5 / r0
    f32 = lambda a: a.astype(np.float32)
    return (f32(sigmas), f32(timesteps), f32(sig.copy()),
            f32(p_ax), f32(p_m0), f32(p_m1))


class FlowDPMSolver:
    """Scan-friendly DPM-Solver++ (order 2, midpoint)."""

    def __init__(self, num_inference_steps: int = 50, shift: float = 8.0,
                 num_train_timesteps: int = 1000):
        self.num_steps = num_inference_steps
        (sigmas, timesteps, sigma_cur, p_ax, p_m0, p_m1) = \
            compute_dpm_coeffs(num_inference_steps, shift,
                               num_train_timesteps)
        self.timesteps = jnp.asarray(timesteps)
        self.table = {"sigma_cur": jnp.asarray(sigma_cur),
                      "p_ax": jnp.asarray(p_ax),
                      "p_m0": jnp.asarray(p_m0),
                      "p_m1": jnp.asarray(p_m1)}

    def init_state(self, sample: jnp.ndarray) -> dict:
        return {"sample": sample.astype(jnp.float32),
                "m0": jnp.zeros_like(sample, dtype=jnp.float32)}

    @staticmethod
    def step(coef: dict, state: dict, flow_pred: jnp.ndarray) -> dict:
        x0 = state["sample"] - coef["sigma_cur"] * flow_pred.astype(
            jnp.float32)
        nxt = (coef["p_ax"] * state["sample"] + coef["p_m0"] * x0
               + coef["p_m1"] * state["m0"])
        return {"sample": nxt, "m0": x0}
