"""Scheduler numerics: FlowMatch tables and UniPC scan-table vs reference.

FlowMatch golden values computed independently with the closed-form
shifted-sigma formula (utils/scheduler.py:118-133); UniPC scan tables are
cross-checked against `FlowUniPCReference`, an independent stateful fp64
realisation of fm_solvers_unipc.py's algorithm.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmpl_tpu.schedulers.flow_match import FlowMatchScheduler
from mmpl_tpu.schedulers.unipc import (FlowUniPC, FlowUniPCReference,
                                       compute_unipc_coeffs)


class TestFlowMatch:
    def test_training_sigma_table(self):
        # shift=8, sigma_min=0, extra_one_step, 1000 steps (wan_wrapper.py:139-142)
        s = FlowMatchScheduler(shift=8.0, sigma_min=0.0, extra_one_step=True)
        s.set_timesteps(1000, training=True)
        sig = np.asarray(s.sigmas)
        assert sig.shape == (1000,)
        # closed form: sigma_i = 8*l/(1+7*l), l = linspace(1,0,1001)[:-1]
        lin = np.linspace(1.0, 0.0, 1001)[:-1]
        expect = 8 * lin / (1 + 7 * lin)
        np.testing.assert_allclose(sig, expect, rtol=1e-6)
        assert sig[0] == pytest.approx(1.0)
        assert np.asarray(s.timesteps)[0] == pytest.approx(1000.0)

    def test_step_euler(self):
        s = FlowMatchScheduler(shift=3.0, num_inference_steps=10)
        x = jnp.ones((2, 4))
        v = jnp.full((2, 4), 0.5)
        t = jnp.asarray(s.timesteps)[jnp.array([3, 3])]
        out = s.step(v, t, x)
        sig, sig_next = np.asarray(s.sigmas)[3], np.asarray(s.sigmas)[4]
        np.testing.assert_allclose(np.asarray(out),
                                   1 + 0.5 * (sig_next - sig), rtol=1e-5)

    def test_add_noise_roundtrip(self):
        s = FlowMatchScheduler(shift=8.0, sigma_min=0.0, extra_one_step=True)
        s.set_timesteps(1000, training=True)
        key = jax.random.PRNGKey(0)
        x0 = jax.random.normal(key, (3, 4, 4))
        noise = jax.random.normal(jax.random.PRNGKey(1), (3, 4, 4))
        t = jnp.asarray([500.0, 500.0, 500.0])
        xt = s.add_noise(x0, noise, t)
        # flow target = noise - x0; x0 = xt - sigma*flow must invert exactly
        flow = noise - x0
        rec = s.convert_flow_pred_to_x0(flow, xt, t)
        np.testing.assert_allclose(np.asarray(rec), np.asarray(x0),
                                   atol=1e-5)
        back = s.convert_x0_to_flow_pred(rec, xt, t)
        np.testing.assert_allclose(np.asarray(back), np.asarray(flow),
                                   atol=1e-4)

    def test_reseed_timestep_is_pure_noise(self):
        """ddpm_timestep = timesteps[~990] + 1000 resolves to sigma == 1
        (the reference's anchor re-seed is effectively fresh noise,
        casual_fps_inference.py:96-108 + scheduler.py:172-175)."""
        s = FlowMatchScheduler(shift=8.0, sigma_min=0.0, extra_one_step=True)
        s.set_timesteps(1000, training=True)
        t_re = float(np.asarray(s.timesteps)[990]) + 1000.0
        x0 = jnp.full((1, 2), 7.0)
        noise = jnp.full((1, 2), -3.0)
        out = s.add_noise(x0, noise, jnp.asarray([t_re]))
        np.testing.assert_allclose(np.asarray(out), -3.0, atol=1e-5)


class TestUniPC:
    def test_sigma_schedule(self):
        c = compute_unipc_coeffs(50, shift=8.0)
        assert c.sigmas.shape == (51,)
        assert c.sigmas[-1] == 0.0
        # first sigma: shift applied to (1 - 1/1000)
        s0 = 0.999
        assert c.sigmas[0] == pytest.approx(8 * s0 / (1 + 7 * s0), rel=1e-6)
        # timesteps are int64-truncated (fm_solvers_unipc.py:208)
        assert np.all(c.timesteps == np.floor(c.timesteps))
        assert c.timesteps[0] == pytest.approx(999.0)

    @pytest.mark.parametrize("steps", [4, 10, 50])
    def test_scan_table_matches_reference_impl(self, steps):
        """Drive both samplers with the same pseudo-model and compare."""
        rng = np.random.default_rng(0)
        shape = (1, 3, 4, 4)
        x0_np = rng.standard_normal(shape)

        def fake_model(x, sigma):
            # a fake flow field pointing from x toward x0_np
            return (x - x0_np) / max(sigma, 1e-3) * 0.9

        ref = FlowUniPCReference(steps, shift=8.0)
        sampler = FlowUniPC(steps, shift=8.0)

        x_ref = rng.standard_normal(shape)
        x_scan = jnp.asarray(x_ref)
        state = sampler.init_state(x_scan)
        table = jax.tree.map(np.asarray, sampler.table)

        for i in range(steps):
            sigma = float(ref.sigmas[i])
            flow_ref = fake_model(x_ref, sigma)
            x_ref = ref.step(flow_ref, x_ref)

            flow_scan = fake_model(np.asarray(state["sample"]), sigma)
            coef = {k: jnp.asarray(v[i]) for k, v in table.items()}
            state = FlowUniPC.step(coef, state, jnp.asarray(flow_scan))

            np.testing.assert_allclose(np.asarray(state["sample"]), x_ref,
                                       rtol=2e-4, atol=2e-4,
                                       err_msg=f"step {i}")

    def test_converges_to_x0_for_exact_flow(self):
        """With the exact constant flow v = noise - x0, UniPC must land on x0."""
        steps = 50
        sampler = FlowUniPC(steps, shift=8.0)
        rng = np.random.default_rng(1)
        x0 = rng.standard_normal((2, 4))
        noise = rng.standard_normal((2, 4))
        flow = jnp.asarray(noise - x0)

        state = sampler.init_state(jnp.asarray(noise))
        for i in range(steps):
            coef = {k: v[i] for k, v in sampler.table.items()}
            state = FlowUniPC.step(coef, state, flow)
        # fp32 accumulation over 50 steps; the update is exact in exact math
        np.testing.assert_allclose(np.asarray(state["sample"]), x0,
                                   rtol=2e-3, atol=2e-3)

    def test_scan_loop_equals_python_loop(self):
        steps = 10
        sampler = FlowUniPC(steps, shift=8.0)
        x = jnp.asarray(np.random.default_rng(2).standard_normal((1, 4)))
        flow = jnp.ones_like(x) * 0.3

        state = sampler.init_state(x)
        for i in range(steps):
            coef = {k: v[i] for k, v in sampler.table.items()}
            state = FlowUniPC.step(coef, state, flow)
        want = state["sample"]

        def body(st, coef):
            return FlowUniPC.step(coef, st, flow), None

        got, _ = jax.lax.scan(body, sampler.init_state(x), sampler.table)
        np.testing.assert_allclose(np.asarray(got["sample"]),
                                   np.asarray(want), rtol=1e-6)
