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

    # quantize knob parity with the other pipelines
    pq = BidirectionalInferencePipeline(cfg, params,
                                        denoising_step_list=(1000, 500),
                                        quantize="int8wo",
                                        dtype=jnp.float32)
    outq = np.asarray(pq.inference(noise, cond))
    rel = np.linalg.norm(outq - np.asarray(out2)) / np.linalg.norm(
        np.asarray(out2))
    assert np.isfinite(outq).all() and rel < 0.1, rel


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


def test_arbitrary_reseed_plans():
    """The reseed path handles any (count, position) static reseed list,
    not just the canonical 2-pair (pos 0 / last) layout (VERDICT r2 #6)."""
    from mmpl_tpu.core.geometry import _build_plan, T2V_CLEAN_STEPS
    plan = _build_plan(
        "t2v-custom-reseed", T2V_CLEAN_STEPS, anchor_group=1,
        handoff_frames=(0, 2, 3, 10, 11, 12, 19, 20),
        vis_toggles={2: ("remove", (19, 20)), 3: ("add", (19, 20))},
        # group 2: ONE reseed; group 3: THREE, incl. an interior position
        reseeds={2: ((0, 3),), 3: ((0, 12), (2, 11), (5, 19))},
    )
    pipe, cfg = _make_pipeline(plan=plan)
    noise = jax.random.normal(jax.random.PRNGKey(5), (1, 21, 16, 4, 4))
    cond, uncond = _ctx(cfg)
    out = pipe.inference(noise, cond, uncond, rng=jax.random.PRNGKey(9))
    assert out.shape == (1, 21, 16, 4, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_causal_pipeline_profile_report(capfd):
    """profile=True emits the reference's per-phase report format
    (causal_inference.py:237-271) with init / per-block / total lines."""
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
    out = pipe.inference(noise, cond, profile=True)
    assert np.isfinite(np.asarray(out)).all()
    err = capfd.readouterr().err
    assert "Profiling results:" in err
    assert "Initialization/caching time:" in err
    assert "Diffusion generation time:" in err
    assert "Block 0 generation time:" in err
    assert "Block 1 generation time:" in err
    assert "Total time:" in err
    # timer retained for the caller to append the VAE phase (cli.py)
    assert pipe.last_profile is not None
    assert len(pipe.last_profile.blocks) == 2


def test_causal_diffusion_invariant_cache_bit_identity(monkeypatch):
    """r2 memory fixes ported (VERDICT r3 item 2): the loop-invariant-cache
    solver scan and the segmented execution path are both bit-identical to
    an explicit cache-carry scan (the pre-fix implementation)."""
    import functools
    from mmpl_tpu.models.fps_dit import fps_forward_group, init_kv_cache
    from mmpl_tpu.pipelines.causal_diffusion_inference import \
        CausalDiffusionInferencePipeline
    from mmpl_tpu.pipelines.causal_inference import block_schedule
    from mmpl_tpu.schedulers.unipc import FlowUniPC

    cfg = tiny_test_config()
    params = randomize_head(
        dit.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.float32))
    noise = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 16, 4, 4))
    cond, uncond = _ctx(cfg)

    pipe = CausalDiffusionInferencePipeline(cfg, params, sampling_steps=4,
                                            num_frame_per_block=3,
                                            dtype=jnp.float32)
    out_new = np.asarray(pipe.inference(noise, cond, uncond))

    # segmented execution (2 steps/program) must be bit-identical
    monkeypatch.setenv("MMPL_STEPS_PER_PROGRAM", "2")
    pipe_seg = CausalDiffusionInferencePipeline(
        cfg, params, sampling_steps=4, num_frame_per_block=3,
        dtype=jnp.float32)
    assert pipe_seg.steps_per_program == 2
    out_seg = np.asarray(pipe_seg.inference(noise, cond, uncond))
    np.testing.assert_array_equal(out_new, out_seg)

    # reference: the old cache-as-scan-carry implementation, inline
    sampler = FlowUniPC(4, shift=8.0)
    g_scale = 5.0

    def denoise_block_carry(schedule, params, ctx_kv2, cache, noisy):
        B, G = noisy.shape[0], schedule.num_frames
        state = sampler.init_state(noisy.astype(jnp.float32))

        def body(carry, step_in):
            cache, state = carry
            coef, t = step_in
            lat2 = jnp.concatenate([state["sample"], state["sample"]], 0)
            tt = jnp.broadcast_to(t, (2 * B, G))
            flow2, cache = fps_forward_group(
                params, cfg, lat2, tt, ctx_kv2, cache, schedule)
            c, u = flow2[:B], flow2[B:]
            flow = u + g_scale * (c - u)
            return (cache, FlowUniPC.step(coef, state, flow)), None

        (cache, state), _ = jax.lax.scan(
            body, (cache, state), (sampler.table, sampler.timesteps))
        final = state["sample"]
        lat2 = jnp.concatenate([final, final], 0)
        tt = jnp.zeros((2 * B, G), jnp.float32)
        _, cache = fps_forward_group(params, cfg, lat2, tt, ctx_kv2,
                                     cache, schedule)
        return final, cache

    from mmpl_tpu.models.dit import (embed_text, precompute_context_kv,
                                     fuse_qkv_params)
    fused = fuse_qkv_params(params, num_heads=cfg.num_heads)
    ctx = jnp.concatenate([cond, uncond], 0)
    emb = embed_text(fused, ctx)
    ctx_kv2 = precompute_context_kv(fused, cfg, emb)
    cache = init_kv_cache(cfg, 2, 4, num_slots=21, dtype=jnp.float32)
    outs = []
    for s in (0, 3):
        sched = block_schedule(s, 3, 21)
        fn = jax.jit(functools.partial(denoise_block_carry, sched))
        x, cache = fn(fused, ctx_kv2, cache, noise[:, s:s + 3])
        outs.append(x)
    out_carry = np.asarray(jnp.concatenate(outs, axis=1))
    np.testing.assert_array_equal(out_new, out_carry)


def test_causal_diffusion_cache_not_double_buffered():
    """Compiled-memory assertion (VERDICT r3 item 2): the loop-invariant
    solver program must NOT carry a second cache buffer through the scan —
    its temp footprint stays below the carry version's by about the cache
    size."""
    import functools
    from mmpl_tpu.models.dit import (embed_text, fuse_qkv_params,
                                     precompute_context_kv)
    from mmpl_tpu.models.fps_dit import fps_forward_group, init_kv_cache
    from mmpl_tpu.pipelines.causal_diffusion_inference import \
        CausalDiffusionInferencePipeline
    from mmpl_tpu.pipelines.causal_inference import block_schedule
    from mmpl_tpu.schedulers.unipc import FlowUniPC

    cfg = tiny_test_config()
    params = randomize_head(
        dit.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.float32))
    B, C, H, W = 1, 16, 16, 16
    pipe = CausalDiffusionInferencePipeline(cfg, params, sampling_steps=8,
                                            num_frame_per_block=3,
                                            dtype=jnp.float32)
    fused = pipe.params
    cond, uncond = _ctx(cfg)
    ctx = jnp.concatenate([cond, uncond], 0)
    ctx_kv2 = precompute_context_kv(fused, cfg, embed_text(fused, ctx))
    cache = init_kv_cache(cfg, 2 * B, H * W // 4, num_slots=21,
                          dtype=jnp.float32)
    cache_bytes = sum(v.size * v.dtype.itemsize for v in cache.values())
    noisy = jax.random.normal(jax.random.PRNGKey(1), (B, 3, C, H, W))
    sched = block_schedule(0, 3, 21)

    inv = jax.jit(functools.partial(pipe._denoise_block, sched))
    ma_inv = inv.lower(fused, ctx_kv2, cache, noisy).compile()\
        .memory_analysis()

    sampler = FlowUniPC(8, shift=8.0)

    def carry_block(params, ctx_kv2, cache, noisy):
        state = sampler.init_state(noisy.astype(jnp.float32))

        def body(carry, step_in):
            cache, state = carry
            coef, t = step_in
            lat2 = jnp.concatenate([state["sample"], state["sample"]], 0)
            tt = jnp.broadcast_to(t, (2 * B, 3))
            flow2, cache = fps_forward_group(params, cfg, lat2, tt,
                                             ctx_kv2, cache, sched)
            c, u = flow2[:B], flow2[B:]
            return (cache, FlowUniPC.step(coef, state,
                                          u + 5.0 * (c - u))), None

        (cache, state), _ = jax.lax.scan(
            body, (cache, state), (sampler.table, sampler.timesteps))
        return state["sample"], cache

    ma_car = jax.jit(carry_block).lower(fused, ctx_kv2, cache, noisy)\
        .compile().memory_analysis()

    # the invariant program must hold NO cache-sized temp at all (the
    # cache lives only in its argument buffer) and never exceed the
    # carry version.  (On CPU XLA aliases the carry in place, so the two
    # are close; the TPU compile of the carry version double-buffered —
    # that blowup is what the 1.3B pipeline OOM'd on pre-r2.)
    assert ma_inv.temp_size_in_bytes < cache_bytes, (
        ma_inv.temp_size_in_bytes, cache_bytes)
    assert ma_inv.temp_size_in_bytes <= ma_car.temp_size_in_bytes, (
        ma_inv.temp_size_in_bytes, ma_car.temp_size_in_bytes)


def test_bidirectional_diffusion_segmented_bit_identical(monkeypatch):
    """MMPL_STEPS_PER_PROGRAM segmentation of the bidirectional 50-step
    solver loop (required on hosts with a program-runtime watchdog) is
    bit-identical to the single-program scan."""
    from mmpl_tpu.pipelines.bidirectional_inference import (
        BidirectionalDiffusionInferencePipeline)
    cfg = tiny_test_config()
    params = randomize_head(
        dit.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.float32))
    noise = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 16, 4, 4))
    cond, uncond = _ctx(cfg)

    def run(spp):
        if spp:
            monkeypatch.setenv("MMPL_STEPS_PER_PROGRAM", str(spp))
        else:
            monkeypatch.delenv("MMPL_STEPS_PER_PROGRAM", raising=False)
        pipe = BidirectionalDiffusionInferencePipeline(
            cfg, params, sampling_steps=5, dtype=jnp.float32)
        return np.asarray(pipe.inference(noise, cond, uncond))

    whole = run(0)
    np.testing.assert_array_equal(run(2), whole)   # ragged final segment
    np.testing.assert_array_equal(run(5), whole)


def test_wan_reference_segmented_bit_identical(monkeypatch):
    """WanT2V's solver loop under MMPL_STEPS_PER_PROGRAM == one program."""
    from mmpl_tpu.models import vae as vae_mod
    from mmpl_tpu.pipelines.wan_reference import WanT2V
    cfg = tiny_test_config()
    params = randomize_head(
        dit.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.float32))
    vae_params = vae_mod.init_vae_params(jax.random.PRNGKey(1))
    noise = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 16, 4, 4))
    cond, uncond = _ctx(cfg)

    def run(spp):
        if spp:
            monkeypatch.setenv("MMPL_STEPS_PER_PROGRAM", str(spp))
        else:
            monkeypatch.delenv("MMPL_STEPS_PER_PROGRAM", raising=False)
        pipe = WanT2V(cfg, params, vae_params, sampling_steps=5,
                      dtype=jnp.float32)
        return np.asarray(pipe.generate(noise, cond, uncond, decode=False))

    whole = run(0)
    np.testing.assert_array_equal(run(2), whole)
