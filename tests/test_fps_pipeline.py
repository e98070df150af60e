"""End-to-end window inference smoke + behavior tests (tiny config, CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from mmpl_tpu.core.config import tiny_test_config
from mmpl_tpu.core.geometry import i2v_plan, t2v_plan
from mmpl_tpu.models import dit
from mmpl_tpu.pipelines.fps_inference import CausalFPSInferencePipeline
from helpers import randomize_head


def _make_pipeline(plan=None, steps=4):
    cfg = tiny_test_config()
    params = randomize_head(
        dit.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.float32))
    return CausalFPSInferencePipeline(
        cfg, params, plan=plan, sampling_steps=steps, timestep_shift=8.0,
        guidance_scale=5.0, dtype=jnp.float32), cfg


def _ctx(cfg, B=1, seed=1):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    return (jax.random.normal(k1, (B, cfg.text_len, cfg.text_dim)),
            jax.random.normal(k2, (B, cfg.text_len, cfg.text_dim)))


def test_t2v_window_inference():
    pipe, cfg = _make_pipeline()
    B, C, H, W = 1, 16, 4, 4
    noise = jax.random.normal(jax.random.PRNGKey(2), (B, 21, C, H, W))
    cond, uncond = _ctx(cfg)
    anchors = []
    out = pipe.inference(noise, cond, uncond,
                         on_anchor=lambda a: anchors.append(np.asarray(a)))
    assert out.shape == (B, 21, C, H, W)
    assert np.isfinite(np.asarray(out)).all()
    # the denoised output must differ from the input noise everywhere
    assert np.abs(np.asarray(out) - np.asarray(noise)).mean() > 1e-3
    # anchor handoff fired once with frame0 + the 7 anchor frames
    assert len(anchors) == 1
    assert anchors[0].shape == (B, 8, C, H, W)
    plan = t2v_plan()
    np.testing.assert_allclose(
        anchors[0], np.asarray(out)[:, list(plan.handoff_frames)])


def test_t2v_inference_deterministic():
    pipe, cfg = _make_pipeline()
    noise = jax.random.normal(jax.random.PRNGKey(3), (1, 21, 16, 4, 4))
    cond, uncond = _ctx(cfg)
    a = np.asarray(pipe.inference(noise, cond, uncond,
                                  rng=jax.random.PRNGKey(7)))
    b = np.asarray(pipe.inference(noise, cond, uncond,
                                  rng=jax.random.PRNGKey(7)))
    np.testing.assert_array_equal(a, b)


def test_t2v_video_extension_initial_latent():
    """With an initial latent, group0 is committed clean and copied through
    (casual_fps_inference.py:407-439)."""
    pipe, cfg = _make_pipeline()
    B, C, H, W = 1, 16, 4, 4
    noise = jax.random.normal(jax.random.PRNGKey(4), (B, 21, C, H, W))
    init = jax.random.normal(jax.random.PRNGKey(5), (B, 2, C, H, W))
    cond, uncond = _ctx(cfg)
    out = np.asarray(pipe.inference(noise, cond, uncond,
                                    initial_latent=init))
    np.testing.assert_allclose(out[:, :2], np.asarray(init), atol=1e-6)


def test_i2v_plan_inference():
    pipe, cfg = _make_pipeline(plan=i2v_plan())
    B, C, H, W = 1, 16, 4, 4
    noise = jax.random.normal(jax.random.PRNGKey(6), (B, 21, C, H, W))
    init = jax.random.normal(jax.random.PRNGKey(7), (B, 1, C, H, W))
    cond, uncond = _ctx(cfg)
    anchors = []
    out = pipe.inference(noise, cond, uncond, initial_latent=init,
                         on_anchor=lambda a: anchors.append(np.asarray(a)))
    assert out.shape == (B, 21, C, H, W)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out)[:, :1], np.asarray(init),
                               atol=1e-6)
    # i2v handoff: [frame0, frame19, frame20]
    assert anchors[0].shape == (B, 3, C, H, W)


def test_context_frames_influence_later_groups():
    """Causality check: changing the committed context must change the
    denoised frames (they attend to its KV)."""
    pipe, cfg = _make_pipeline(steps=2)
    B, C, H, W = 1, 16, 4, 4
    noise = jax.random.normal(jax.random.PRNGKey(8), (B, 21, C, H, W))
    cond, uncond = _ctx(cfg)
    init_a = jnp.zeros((B, 2, C, H, W))
    init_b = jnp.ones((B, 2, C, H, W))
    out_a = np.asarray(pipe.inference(noise, cond, uncond,
                                      initial_latent=init_a))
    out_b = np.asarray(pipe.inference(noise, cond, uncond,
                                      initial_latent=init_b))
    assert np.abs(out_a[:, 2:] - out_b[:, 2:]).mean() > 1e-5


def test_causal_few_step_pipeline():
    """Few-step distilled AR sampling (CausalInferencePipeline)."""
    from mmpl_tpu.pipelines.causal_inference import CausalInferencePipeline
    cfg = tiny_test_config()
    params = randomize_head(
        dit.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.float32))
    pipe = CausalInferencePipeline(cfg, params,
                                   denoising_step_list=(1000, 500),
                                   num_frame_per_block=3,
                                   dtype=jnp.float32)
    noise = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 16, 4, 4))
    cond = jax.random.normal(jax.random.PRNGKey(2),
                             (1, cfg.text_len, cfg.text_dim))
    out = pipe.inference(noise, cond)
    assert out.shape == (1, 6, 16, 4, 4)
    assert np.isfinite(np.asarray(out)).all()
    # context priming path (video extension)
    init = jax.random.normal(jax.random.PRNGKey(3), (1, 3, 16, 4, 4))
    out2 = pipe.inference(noise, cond, initial_latent=init)
    assert out2.shape == (1, 9, 16, 4, 4)
    np.testing.assert_allclose(np.asarray(out2[:, :3]), np.asarray(init),
                               atol=1e-6)


def test_causal_diffusion_pipeline():
    """Block-causal 50-step UniPC+CFG (CausalDiffusionInferencePipeline)."""
    from mmpl_tpu.pipelines.causal_diffusion_inference import \
        CausalDiffusionInferencePipeline
    cfg = tiny_test_config()
    params = randomize_head(
        dit.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.float32))
    pipe = CausalDiffusionInferencePipeline(cfg, params, sampling_steps=2,
                                            num_frame_per_block=3,
                                            dtype=jnp.float32)
    noise = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 16, 4, 4))
    cond, uncond = _ctx(cfg)
    out = pipe.inference(noise, cond, uncond)
    assert out.shape == (1, 6, 16, 4, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_bidirectional_pipelines():
    from mmpl_tpu.pipelines.bidirectional_inference import (
        BidirectionalDiffusionInferencePipeline,
        BidirectionalInferencePipeline)
    cfg = tiny_test_config()
    params = randomize_head(
        dit.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.float32))
    noise = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 16, 4, 4))
    cond, uncond = _ctx(cfg)

    p50 = BidirectionalDiffusionInferencePipeline(cfg, params,
                                                  sampling_steps=2,
                                                  dtype=jnp.float32)
    out = p50.inference(noise, cond, uncond)
    assert out.shape == noise.shape and np.isfinite(np.asarray(out)).all()

    pfew = BidirectionalInferencePipeline(cfg, params,
                                          denoising_step_list=(1000, 500),
                                          dtype=jnp.float32)
    out2 = pfew.inference(noise, cond)
    assert out2.shape == noise.shape
    assert np.isfinite(np.asarray(out2)).all()


def test_wan_reference_t2v():
    from mmpl_tpu.models import vae as vae_mod
    from mmpl_tpu.pipelines.wan_reference import WanT2V
    cfg = tiny_test_config()
    params = randomize_head(
        dit.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.float32))
    vae_params = vae_mod.init_vae_params(jax.random.PRNGKey(1))
    pipe = WanT2V(cfg, params, vae_params, sampling_steps=2,
                  dtype=jnp.float32)
    noise = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 16, 4, 4))
    cond, uncond = _ctx(cfg)
    lat = pipe.generate(noise, cond, uncond, decode=False)
    assert lat.shape == noise.shape
    video = pipe.generate(noise, cond, uncond, decode=True)
    assert video.shape == (1, 9, 3, 32, 32)   # 1+4*(3-1) pixel frames
    assert np.isfinite(np.asarray(video)).all()


def test_fps_pipeline_dpm_solver():
    """sample_solver='dpm++' (casual_fps_inference.py:512-521 parity)."""
    cfg = tiny_test_config()
    params = randomize_head(
        dit.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.float32))
    pipe = CausalFPSInferencePipeline(cfg, params, sampling_steps=2,
                                      sample_solver="dpm++",
                                      dtype=jnp.float32)
    noise = jax.random.normal(jax.random.PRNGKey(1), (1, 21, 16, 4, 4))
    cond, uncond = _ctx(cfg)
    out = pipe.inference(noise, cond, uncond)
    assert out.shape == (1, 21, 16, 4, 4)
    assert np.isfinite(np.asarray(out)).all()
