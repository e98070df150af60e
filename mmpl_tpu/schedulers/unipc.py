"""Flow-matching UniPC multistep sampler, precomputed for `lax.scan`.

JAX re-design of `MMPL_t2v/wan/utils/fm_solvers_unipc.py`
(FlowUniPCMultistepScheduler, solver_order=2, predict_x0=True, bh2).  The
reference mutates Python state (model-output history, step counter, per-step
`torch.linalg.solve` of a 2x2 system) inside the sampling loop.  Here the
whole schedule — per-step predictor/corrector orders and every scalar
coefficient, including the 2x2 solve — is precomputed in fp64 numpy at
sampler construction, so the on-device step is four fused multiply-adds and
the full 50-step loop runs inside one `lax.scan`.

Per-step update (predict_x0 branch, fm_solvers_unipc.py:340-485,585-615):
  x0     = sample - sigma[i] * flow_pred
  # corrector (refines the current sample using the *previous* step's data)
  sample = c_ax*last_sample + c_m0*m0 + c_m1*m1 + c_mt*x0     (i >= 1)
  # predictor
  next   = p_ax*sample + p_m0*x0 + p_m1*m0
where m0/m1 are the converted outputs of the previous one/two steps.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class UniPCCoeffs:
    """Per-step coefficient tables, each [num_steps] fp32 (computed fp64)."""
    sigmas: np.ndarray          # [N+1] (with appended final sigma)
    timesteps: np.ndarray       # [N] model-facing timesteps (int-truncated)
    sigma_cur: np.ndarray       # sigma[i]
    c_ax: np.ndarray
    c_m0: np.ndarray
    c_m1: np.ndarray
    c_mt: np.ndarray
    use_corr: np.ndarray        # {0,1}
    p_ax: np.ndarray
    p_m0: np.ndarray
    p_m1: np.ndarray


def _lambda(sigma: float) -> float:
    alpha = 1.0 - sigma
    return np.log(alpha) - np.log(sigma)


def compute_unipc_coeffs(num_inference_steps: int,
                         num_train_timesteps: int = 1000,
                         shift: float = 8.0,
                         solver_order: int = 2,
                         solver_type: str = "bh2",
                         lower_order_final: bool = True,
                         disable_corrector: Tuple[int, ...] = (),
                         ) -> UniPCCoeffs:
    assert solver_order == 2, "reference uses solver_order=2"
    N = num_inference_steps
    # sigma schedule (fm_solvers_unipc.py:108-121,161-210): init table with
    # shift=1, then linspace over [sigma_max, sigma_min] and apply the run
    # shift; final sigma 0 appended ("zero" final_sigmas_type).
    alphas = np.linspace(1, 1 / num_train_timesteps,
                         num_train_timesteps)[::-1].copy()
    base = 1.0 - alphas          # descending from 1-1/T to 0
    sigma_max, sigma_min = float(base[0]), float(base[-1])
    sig = np.linspace(sigma_max, sigma_min, N + 1, dtype=np.float64)[:-1]
    sig = shift * sig / (1 + (shift - 1) * sig)
    timesteps = (sig * num_train_timesteps).astype(np.int64).astype(
        np.float64)  # torch casts to int64 (fm_solvers_unipc.py:208)
    sigmas = np.concatenate([sig, [0.0]])

    def orders() -> list:
        out = []
        lower = 0
        for i in range(N):
            this = min(solver_order, N - i) if lower_order_final \
                else solver_order
            this = min(this, lower + 1)
            out.append(this)
            lower = min(lower + 1, solver_order)
        return out

    pred_order = orders()

    def bh_terms(s_t: float, s_s0: float):
        a_t = 1.0 - s_t
        h = _lambda(s_t) - _lambda(s_s0)
        hh = -h                      # predict_x0
        h_phi_1 = np.expm1(hh)
        B_h = np.expm1(hh) if solver_type == "bh2" else hh
        return a_t, h, hh, h_phi_1, B_h

    c_ax = np.zeros(N)
    c_m0 = np.zeros(N)
    c_m1 = np.zeros(N)
    c_mt = np.zeros(N)
    use_corr = np.zeros(N)
    p_ax = np.zeros(N)
    p_m0 = np.zeros(N)
    p_m1 = np.zeros(N)

    for i in range(N):
        # ---- predictor at i (order pred_order[i]) ----
        s_t, s_s0 = sigmas[i + 1], sigmas[i]
        order = pred_order[i]
        if s_t == 0.0:
            # h -> inf; closed-form limit: x_t = x0 (alpha_t=1, h_phi_1=-1)
            p_ax[i], p_m0[i], p_m1[i] = 0.0, 1.0, 0.0
        else:
            a_t, h, hh, h_phi_1, B_h = bh_terms(s_t, s_s0)
            p_ax[i] = s_t / s_s0
            p_m0[i] = -a_t * h_phi_1
            if order >= 2:
                r0 = (_lambda(sigmas[i - 1]) - _lambda(s_s0)) / h
                P = a_t * B_h * 0.5 / r0
                p_m0[i] += P
                p_m1[i] = -P

        # ---- corrector at i (order = predictor order at i-1) ----
        if i >= 1 and (i - 1) not in disable_corrector:
            q = pred_order[i - 1]
            s_t, s_s0 = sigmas[i], sigmas[i - 1]
            a_t, h, hh, h_phi_1, B_h = bh_terms(s_t, s_s0)
            use_corr[i] = 1.0
            c_ax[i] = s_t / s_s0
            c_m0[i] = -a_t * h_phi_1
            if q == 1:
                rho_last = 0.5
                c_mt[i] = -a_t * B_h * rho_last
                c_m0[i] += a_t * B_h * rho_last
            else:
                r0 = (_lambda(sigmas[i - 2]) - _lambda(s_s0)) / h
                # R = [[1,1],[r0,1]], b from the bh recurrence
                b1 = (h_phi_1 / hh - 1.0) / B_h
                b2 = 2.0 * ((h_phi_1 / hh - 1.0) / hh - 0.5) / B_h
                rho0 = (b1 - b2) / (1.0 - r0)
                rho1 = (b2 - r0 * b1) / (1.0 - r0)
                c_m0[i] += a_t * B_h * (rho0 / r0 + rho1)
                c_m1[i] = -a_t * B_h * rho0 / r0
                c_mt[i] = -a_t * B_h * rho1

    f32 = lambda a: a.astype(np.float32)
    return UniPCCoeffs(
        sigmas=f32(sigmas), timesteps=f32(timesteps),
        sigma_cur=f32(sigmas[:N].copy()),
        c_ax=f32(c_ax), c_m0=f32(c_m0), c_m1=f32(c_m1), c_mt=f32(c_mt),
        use_corr=f32(use_corr),
        p_ax=f32(p_ax), p_m0=f32(p_m0), p_m1=f32(p_m1))


class FlowUniPC:
    """Scan-friendly UniPC sampler.

    Usage inside jit:
        state = sampler.init_state(sample)
        for i (lax.scan over sampler.num_steps):
            flow = model(state.sample, t=sampler.timesteps[i])
            state = sampler.step(i_coeffs, state, flow)
    """

    def __init__(self, num_inference_steps: int = 50, shift: float = 8.0,
                 num_train_timesteps: int = 1000,
                 disable_corrector: Tuple[int, ...] = ()):
        self.num_steps = num_inference_steps
        self.coeffs = compute_unipc_coeffs(
            num_inference_steps, num_train_timesteps, shift,
            disable_corrector=disable_corrector)
        self.timesteps = jnp.asarray(self.coeffs.timesteps)
        # per-step coefficient pytree, scan-ready ([N] leaves)
        self.table = {
            k: jnp.asarray(getattr(self.coeffs, k))
            for k in ("sigma_cur", "c_ax", "c_m0", "c_m1", "c_mt",
                      "use_corr", "p_ax", "p_m0", "p_m1")
        }

    def init_state(self, sample: jnp.ndarray) -> dict:
        z = jnp.zeros_like(sample, dtype=jnp.float32)
        return {"sample": sample.astype(jnp.float32), "m0": z, "m1": z,
                "last_sample": z}

    @staticmethod
    def step(coef: dict, state: dict, flow_pred: jnp.ndarray) -> dict:
        """One predictor(+corrector) update; all inputs fp32."""
        flow = flow_pred.astype(jnp.float32)
        sample = state["sample"]
        x0 = sample - coef["sigma_cur"] * flow
        corrected = (coef["c_ax"] * state["last_sample"]
                     + coef["c_m0"] * state["m0"]
                     + coef["c_m1"] * state["m1"]
                     + coef["c_mt"] * x0)
        sample = jnp.where(coef["use_corr"] > 0, corrected, sample)
        nxt = coef["p_ax"] * sample + coef["p_m0"] * x0 + coef["p_m1"] * state["m0"]
        return {"sample": nxt, "m0": x0, "m1": state["m0"],
                "last_sample": sample}


class FlowUniPCReference:
    """Stateful host-side twin of the reference scheduler (for tests).

    Implements fm_solvers_unipc.py step-by-step with numpy fp64 so the
    scan-table sampler can be verified against an independent realisation of
    the same algorithm.
    """

    def __init__(self, num_inference_steps: int = 50, shift: float = 8.0,
                 num_train_timesteps: int = 1000, solver_order: int = 2):
        self.order = solver_order
        c = compute_unipc_coeffs(num_inference_steps, num_train_timesteps,
                                 shift)
        self.sigmas = c.sigmas.astype(np.float64)
        self.timesteps = c.timesteps
        self.N = num_inference_steps
        self.model_outputs = [None] * solver_order
        self.lower_order_nums = 0
        self.last_sample = None
        self.this_order = None
        self.i = 0

    def step(self, flow_pred: np.ndarray, sample: np.ndarray) -> np.ndarray:
        i = self.i
        s = self.sigmas
        x0 = sample - s[i] * flow_pred
        use_corr = i > 0 and self.last_sample is not None
        if use_corr:
            sample = self._uni_c(x0, sample)
        self.model_outputs = self.model_outputs[1:] + [x0]
        this_order = min(self.order, self.N - i, self.lower_order_nums + 1)
        self.this_order = this_order
        self.last_sample = sample
        out = self._uni_p(sample, this_order)
        self.lower_order_nums = min(self.lower_order_nums + 1, self.order)
        self.i += 1
        return out

    def _bh(self, s_t, s_s0):
        a_t = 1 - s_t
        h = _lambda(s_t) - _lambda(s_s0)
        hh = -h
        return a_t, h, hh, np.expm1(hh), np.expm1(hh)

    def _uni_p(self, x, order):
        i = self.i
        s_t, s_s0 = self.sigmas[i + 1], self.sigmas[i]
        m0 = self.model_outputs[-1]
        if s_t == 0.0:
            return m0.copy()
        a_t, h, hh, h_phi_1, B_h = self._bh(s_t, s_s0)
        x_t = s_t / s_s0 * x - a_t * h_phi_1 * m0
        if order == 2:
            m1 = self.model_outputs[-2]
            r0 = (_lambda(self.sigmas[i - 1]) - _lambda(s_s0)) / h
            x_t = x_t - a_t * B_h * 0.5 * (m1 - m0) / r0
        return x_t

    def _uni_c(self, model_t, this_sample):
        i = self.i
        order = self.this_order
        s_t, s_s0 = self.sigmas[i], self.sigmas[i - 1]
        a_t, h, hh, h_phi_1, B_h = self._bh(s_t, s_s0)
        m0 = self.model_outputs[-1]
        x = self.last_sample
        x_t_ = s_t / s_s0 * x - a_t * h_phi_1 * m0
        D1_t = model_t - m0
        if order == 1:
            return x_t_ - a_t * B_h * 0.5 * D1_t
        m1 = self.model_outputs[-2]
        r0 = (_lambda(self.sigmas[i - 2]) - _lambda(s_s0)) / h
        b1 = (h_phi_1 / hh - 1.0) / B_h
        b2 = 2.0 * ((h_phi_1 / hh - 1.0) / hh - 0.5) / B_h
        rho0 = (b1 - b2) / (1.0 - r0)
        rho1 = (b2 - r0 * b1) / (1.0 - r0)
        corr = rho0 * (m1 - m0) / r0
        return x_t_ - a_t * B_h * (corr + rho1 * D1_t)
