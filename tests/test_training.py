"""Training stack: masks vs reference rules, TF forward causality,
self-forcing rollout, and distillation loss smoke."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmpl_tpu.core.config import tiny_test_config
from mmpl_tpu.core.geometry import T2V_CLEAN_STEPS
from mmpl_tpu.models import dit
from mmpl_tpu.models.fps_dit import fps_forward_train
from mmpl_tpu.schedulers.flow_match import FlowMatchScheduler
from mmpl_tpu.training import masks
from mmpl_tpu.training.diffusion import make_teacher_forcing_loss_fn
from mmpl_tpu.training.self_forcing import SelfForcingRollout
from helpers import randomize_head


# ---------------------------------------------------------------------------
# Masks
# ---------------------------------------------------------------------------

def reference_fps_forcing_token_mask(clean_steps, frame_seqlen):
    """Direct transcription of causal_model.py:620-709's token-level rules."""
    F = len(clean_steps)
    L = 2 * F * frame_seqlen
    step_id = np.zeros(L, np.int64)
    region_id = np.zeros(L, np.int64)
    for f in range(F):
        s, e = f * frame_seqlen, (f + 1) * frame_seqlen
        step_id[s:e] = clean_steps[f]
        region_id[s:e] = 0
        off = F * frame_seqlen
        step_id[off + s:off + e] = clean_steps[f]
        region_id[off + s:off + e] = 1
    q = np.arange(L)[:, None]
    kv = np.arange(L)[None, :]
    qs, ks = step_id[:, None], step_id[None, :]
    qr, kr = region_id[:, None], region_id[None, :]
    eye = q == kv
    clean_rule = (qr == 0) & (kr == 0) & (ks <= qs)
    noise_rule = (qr == 1) & (((kr == 1) & (ks == qs)) |
                              ((kr == 0) & (ks < qs)))
    last_two = (kv >= 19 * frame_seqlen) & (kv < 21 * frame_seqlen)
    blocking = (qs == 2) & last_two
    return (eye | clean_rule | noise_rule) & ~blocking


def test_fps_forcing_mask_matches_reference_rules():
    S = 2
    frame = masks.fps_forcing_frame_mask(T2V_CLEAN_STEPS)
    got = masks.expand_frame_mask(frame, S)
    want = reference_fps_forcing_token_mask(list(T2V_CLEAN_STEPS), S)
    np.testing.assert_array_equal(got, want)


def test_blockwise_causal_mask():
    m = masks.blockwise_causal_frame_mask(6, num_frame_per_block=3)
    # frame 0 sees its whole block (0..2), not block 2
    assert m[0, :3].all() and not m[0, 3:].any()
    assert m[5].all()
    m_loc = masks.blockwise_causal_frame_mask(9, 3, local_attn_frames=3)
    assert not m_loc[8, 0]      # outside the local window
    assert m_loc[8, 6:9].all()
    m_i2v = masks.blockwise_causal_frame_mask(7, 3,
                                              independent_first_frame=True)
    assert m_i2v[0, 0] and not m_i2v[0, 1:].any()
    assert m_i2v[1, :4].all() and not m_i2v[1, 4:].any()


def test_teacher_forcing_mask():
    F = 6
    m = masks.teacher_forcing_frame_mask(F, 3)
    # clean block-causal
    assert m[0, :3].all() and not m[0, 3:F].any()
    # noisy sees own noisy block + previous clean blocks only
    q = F + 3  # noisy frame 3 (block 1)
    assert m[q, F + 3:F + 6].all()       # own noisy block
    assert m[q, :3].all()                # previous clean block
    assert not m[q, 3:6].any()           # own clean block blocked
    assert not m[q, F:F + 3].any()       # earlier noisy block blocked


# ---------------------------------------------------------------------------
# Teacher-forcing forward
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def tf_setup():
    cfg = tiny_test_config()
    params = randomize_head(
        dit.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.float32))
    ctx = jax.random.normal(jax.random.PRNGKey(1),
                            (1, cfg.text_len, cfg.text_dim))
    return cfg, params, ctx


def test_fps_forward_train_anchor_blinding(tf_setup):
    """With ONE transformer layer (no indirect mixing through other clean
    frames — the multi-layer leakage via step-1 clean frames exists in the
    reference too), perturbing clean frame 19 must not change step-2 noisy
    outputs (frames 4..9, the anchor-blinding rule) but must change step-3
    outputs (frames 13..18)."""
    cfg, params, ctx = tf_setup
    import copy
    cfg1 = copy.deepcopy(cfg)
    cfg1.num_layers = 1
    params1 = jax.tree.map(lambda a: a, params)
    params1["blocks"] = jax.tree.map(lambda a: a[:1], params["blocks"])

    F, C, H, W = 21, 16, 4, 4
    fm = jnp.asarray(masks.fps_forcing_frame_mask(T2V_CLEAN_STEPS))
    key = jax.random.PRNGKey(2)
    noisy = jax.random.normal(key, (1, F, C, H, W))
    clean = jax.random.normal(jax.random.PRNGKey(3), (1, F, C, H, W))
    t = jnp.full((1, F), 400.0)
    aug = jnp.zeros((1, F))

    out_a = np.asarray(fps_forward_train(params1, cfg1, noisy, t, ctx, fm,
                                         clean_x=clean, aug_t=aug))
    clean_b = clean.at[:, 19].add(3.0)
    out_b = np.asarray(fps_forward_train(params1, cfg1, noisy, t, ctx, fm,
                                         clean_x=clean_b, aug_t=aug))
    step2 = [4, 5, 6, 7, 8, 9]
    step3 = [13, 14, 15, 16, 17, 18]
    np.testing.assert_allclose(out_a[:, step2], out_b[:, step2], atol=2e-5)
    assert np.abs(out_a[:, step3] - out_b[:, step3]).max() > 1e-4
    # clean frames 0/1 (steps 0/1 with step < 2) likewise cannot be blinded:
    # step-2 queries still see them
    clean_c = clean.at[:, 0].add(3.0)
    out_c = np.asarray(fps_forward_train(params1, cfg1, noisy, t, ctx, fm,
                                         clean_x=clean_c, aug_t=aug))
    assert np.abs(out_a[:, step2] - out_c[:, step2]).max() > 1e-4


def test_teacher_forcing_loss(tf_setup):
    cfg, params, ctx = tf_setup
    sch = FlowMatchScheduler(shift=8.0, sigma_min=0.0, extra_one_step=True)
    sch.set_timesteps(1000, training=True)
    fm = masks.fps_forcing_frame_mask(T2V_CLEAN_STEPS)
    loss_fn = make_teacher_forcing_loss_fn(cfg, sch, fm,
                                           num_frame_per_block=3,
                                           noise_aug_max_timestep=100)
    batch = {
        "latents": jax.random.normal(jax.random.PRNGKey(4),
                                     (1, 21, 16, 4, 4)),
        "context": ctx,
        "uncond_context": jnp.zeros_like(ctx),
    }
    loss, grads = jax.value_and_grad(loss_fn)(params, batch,
                                              jax.random.PRNGKey(5))
    assert np.isfinite(float(loss))
    gnorm = jax.tree.reduce(
        lambda a, b: a + float(jnp.sum(jnp.abs(b))), grads, 0.0)
    assert np.isfinite(gnorm) and gnorm > 0


# ---------------------------------------------------------------------------
# Self-forcing rollout
# ---------------------------------------------------------------------------

def test_self_forcing_rollout(tf_setup):
    cfg, params, ctx = tf_setup
    sch = FlowMatchScheduler(shift=8.0, sigma_min=0.0, extra_one_step=True)
    sch.set_timesteps(1000, training=True)
    ro = SelfForcingRollout(cfg, sch, denoising_step_list=(1000, 500),
                            num_frame_per_block=3, num_max_frames=6,
                            grad_frame_window=6)
    emb = dit.embed_text(params, ctx)
    ctx_kv = dit.precompute_context_kv(params, cfg, emb)
    noise = jax.random.normal(jax.random.PRNGKey(6), (1, 6, 16, 4, 4))
    flags = jnp.asarray([1, 1], jnp.int32)

    out, t_from, t_to = ro.rollout(params, ctx_kv, noise, flags,
                                   jax.random.PRNGKey(7))
    assert out.shape == (1, 6, 16, 4, 4)
    assert np.isfinite(np.asarray(out)).all()
    # exit flag changes the result (different step's x0 selected)
    out0, _, _ = ro.rollout(params, ctx_kv, noise,
                            jnp.asarray([0, 0], jnp.int32),
                            jax.random.PRNGKey(7))
    assert np.abs(np.asarray(out) - np.asarray(out0)).max() > 1e-5

    # gradient flows from the rollout into the generator params
    def loss(p):
        o, _, _ = ro.rollout(p, ctx_kv, noise, flags, jax.random.PRNGKey(7))
        return jnp.mean(o ** 2)

    g = jax.grad(loss)(params)
    gnorm = jax.tree.reduce(lambda a, b: a + float(jnp.sum(jnp.abs(b))),
                            g, 0.0)
    assert np.isfinite(gnorm) and gnorm > 0


def test_dmd_losses_smoke(tf_setup):
    from mmpl_tpu.training.distillation import (DistillationConfig,
                                                Distiller)
    cfg, params, ctx = tf_setup
    sch = FlowMatchScheduler(shift=8.0, sigma_min=0.0, extra_one_step=True)
    sch.set_timesteps(1000, training=True)
    ro = SelfForcingRollout(cfg, sch, denoising_step_list=(1000, 500),
                            num_frame_per_block=3, num_max_frames=6,
                            grad_frame_window=6)
    dc = DistillationConfig(dtype=jnp.float32)
    dist = Distiller(cfg, dc, ro, sch)
    emb = dit.embed_text(params, ctx)
    ctx_kv = dit.precompute_context_kv(params, cfg, emb)
    models = {"generator": params,
              "fake_score": randomize_head(dit.init_dit_params(
                  jax.random.PRNGKey(10), cfg, jnp.float32)),
              "real_score": randomize_head(dit.init_dit_params(
                  jax.random.PRNGKey(11), cfg, jnp.float32))}
    batch = {"noise": jax.random.normal(jax.random.PRNGKey(8),
                                        (1, 6, 16, 4, 4)),
             "ctx_kv": ctx_kv, "context": ctx,
             "uncond_context": jnp.zeros_like(ctx)}
    for name in ("dmd_generator_loss", "sid_generator_loss", "critic_loss"):
        loss, logd = getattr(dist, name)(models, batch,
                                         jax.random.PRNGKey(9))
        assert np.isfinite(float(loss)), name


def test_gan_losses(tf_setup):
    """GAN objective wiring (model/gan.py:69-295): generator + critic losses
    finite, generator grads flow from the G loss, head+score grads from the
    D loss (VERDICT r1 item 10)."""
    from mmpl_tpu.training.distillation import (DistillationConfig,
                                                Distiller)
    from mmpl_tpu.training.gan import init_gan_head_params
    cfg, params, ctx = tf_setup
    sch = FlowMatchScheduler(shift=8.0, sigma_min=0.0, extra_one_step=True)
    sch.set_timesteps(1000, training=True)
    ro = SelfForcingRollout(cfg, sch, denoising_step_list=(1000, 500),
                            num_frame_per_block=3, num_max_frames=6,
                            grad_frame_window=6)
    dc = DistillationConfig(dtype=jnp.float32, r1_weight=0.01,
                            r2_weight=0.01)
    dist = Distiller(cfg, dc, ro, sch)
    emb = dit.embed_text(params, ctx)
    ctx_kv = dit.precompute_context_kv(params, cfg, emb)
    models = {"generator": params,
              "fake_score": randomize_head(dit.init_dit_params(
                  jax.random.PRNGKey(10), cfg, jnp.float32)),
              "gan_head": init_gan_head_params(
                  jax.random.PRNGKey(12), atten_dim=cfg.dim,
                  ffn_dim=cfg.ffn_dim, num_heads=cfg.num_heads)}
    batch = {"noise": jax.random.normal(jax.random.PRNGKey(8),
                                        (1, 6, 16, 4, 4)),
             "real_latents": jax.random.normal(jax.random.PRNGKey(13),
                                               (1, 6, 16, 4, 4)),
             "ctx_kv": ctx_kv, "context": ctx,
             "uncond_context": jnp.zeros_like(ctx)}

    def gsum(tree):
        return jax.tree.reduce(
            lambda a, b: a + float(jnp.sum(jnp.abs(b))), tree, 0.0)

    (gl, _), ggrads = jax.value_and_grad(
        lambda g: dist.gan_generator_loss({**models, "generator": g},
                                          batch, jax.random.PRNGKey(9)),
        has_aux=True)(models["generator"])
    assert np.isfinite(float(gl)) and gsum(ggrads) > 0

    (dl, logd), cgrads = jax.value_and_grad(
        lambda c: dist.gan_critic_loss({**models, **c}, batch,
                                       jax.random.PRNGKey(9)),
        has_aux=True)({"fake_score": models["fake_score"],
                       "gan_head": models["gan_head"]})
    assert np.isfinite(float(dl))
    assert gsum(cgrads["fake_score"]) > 0
    assert gsum(cgrads["gan_head"]) > 0
    assert np.isfinite(float(logd["gan_real_logit"]))


def test_self_forcing_early_exit_flag0(tf_setup):
    """Early exit (VERDICT r1 item 6): with exit flag 0 the rollout must be
    exactly one graded forward + commit per block — verified by replicating
    that minimal chain by hand, matching PRNG splits."""
    from mmpl_tpu.models.fps_dit import fps_forward_group, init_kv_cache
    from mmpl_tpu.pipelines.causal_inference import block_schedule
    cfg, params, ctx = tf_setup
    sch = FlowMatchScheduler(shift=8.0, sigma_min=0.0, extra_one_step=True)
    sch.set_timesteps(1000, training=True)
    steps = (1000, 750, 500)
    ro = SelfForcingRollout(cfg, sch, denoising_step_list=steps,
                            num_frame_per_block=3, num_max_frames=6,
                            grad_frame_window=6)
    emb = dit.embed_text(params, ctx)
    ctx_kv = dit.precompute_context_kv(params, cfg, emb)
    noise = jax.random.normal(jax.random.PRNGKey(6), (1, 6, 16, 4, 4))
    rng0 = jax.random.PRNGKey(7)
    out, _, _ = ro.rollout(params, ctx_kv, noise,
                           jnp.asarray([0, 0], jnp.int32), rng0)

    # manual flag-0 chain
    flat = lambda a: a.reshape((-1,) + a.shape[2:])
    cache = init_kv_cache(cfg, 1, 4, num_slots=6, dtype=jnp.float32)
    rng = rng0
    outs = []
    for b in range(2):
        sched = block_schedule(b * 3, 3, 6)
        for _ in range(len(steps) - 1):     # unconditional splits
            rng, _ = jax.random.split(rng)
        x = noise[:, b * 3:(b + 1) * 3]
        tt = jnp.full((1, 3), 1000.0)
        flow, cache = fps_forward_group(params, cfg, x, tt, ctx_kv, cache,
                                        sched)
        x0 = sch.convert_flow_pred_to_x0(
            flat(flow), flat(x), tt.reshape(-1)).reshape(x.shape)
        outs.append(x0)
        rng, k = jax.random.split(rng)
        ct = jnp.zeros((3,))
        committed = sch.add_noise(
            flat(x0), flat(jax.random.normal(k, x0.shape)), ct
        ).reshape(x0.shape)
        _, cache = fps_forward_group(params, cfg, committed,
                                     jnp.zeros((1, 3)), ctx_kv, cache, sched)
    manual = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(manual),
                               atol=1e-5)


def test_self_forcing_early_exit_is_faster(tf_setup):
    """flag=0 must execute fewer forwards than flag=S-1 at runtime (the
    lax.cond skips, not masks, the pre-exit steps)."""
    import time
    cfg, params, ctx = tf_setup
    sch = FlowMatchScheduler(shift=8.0, sigma_min=0.0, extra_one_step=True)
    sch.set_timesteps(1000, training=True)
    steps = (1000, 900, 800, 700, 600, 500)
    ro = SelfForcingRollout(cfg, sch, denoising_step_list=steps,
                            num_frame_per_block=3, num_max_frames=6,
                            grad_frame_window=6)
    emb = dit.embed_text(params, ctx)
    ctx_kv = dit.precompute_context_kv(params, cfg, emb)
    noise = jax.random.normal(jax.random.PRNGKey(6), (1, 6, 16, 16, 16))

    roll = jax.jit(lambda flags, rng: ro.rollout(params, ctx_kv, noise,
                                                 flags, rng)[0])
    f_lo = jnp.zeros((2,), jnp.int32)
    f_hi = jnp.full((2,), len(steps) - 1, jnp.int32)
    rng = jax.random.PRNGKey(7)
    jax.block_until_ready(roll(f_lo, rng))      # compile
    jax.block_until_ready(roll(f_hi, rng))

    def timed(flags):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(roll(flags, rng))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t_lo, t_hi = timed(f_lo), timed(f_hi)
    # theoretical forward ratio: (0+2)/(5+2) per block; require a safe gap
    assert t_hi > 1.3 * t_lo, (t_lo, t_hi)


def test_ode_regression_objective_trains(tf_setup):
    """ODE regression (model/ode_regression.py): loss is finite and
    decreases on a fixed synthetic trajectory batch."""
    import optax
    from mmpl_tpu.training.distillation import (ode_regression_loss,
                                                prepare_ode_generator_input)
    cfg, params, ctx = tf_setup
    sch = FlowMatchScheduler(shift=8.0, sigma_min=0.0, extra_one_step=True)
    sch.set_timesteps(1000, training=True)
    step_list = (1000, 750, 500, 250)
    ode_latent = jax.random.normal(jax.random.PRNGKey(5),
                                   (1, len(step_list) + 1, 6, 16, 4, 4))
    emb = dit.embed_text(params, ctx)
    ctx_kv = dit.precompute_context_kv(params, cfg, emb)

    noisy, t = prepare_ode_generator_input(ode_latent, step_list,
                                           jax.random.PRNGKey(6))
    assert noisy.shape == (1, 6, 16, 4, 4) and t.shape == (1, 6)
    # per-block uniform: each 3-frame block shares one timestep
    tn = np.asarray(t)
    assert (tn[:, :3] == tn[:, :1]).all() and (tn[:, 3:] == tn[:, 3:4]).all()
    assert set(np.unique(tn)) <= set(float(s) for s in step_list)

    batch = {"noisy_input": noisy, "clean_latent": ode_latent[:, -1],
             "timestep": t, "ctx_kv": ctx_kv}
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        (loss, _), g = jax.value_and_grad(
            lambda p: ode_regression_loss(p, cfg, sch, batch,
                                          jax.random.PRNGKey(7)),
            has_aux=True)(params)
        upd, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, upd), opt, loss

    losses = []
    for _ in range(5):
        params, opt, loss = step(params, opt)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_ode_loss_masks_zero_timesteps(tf_setup):
    """Frames with t == 0 are excluded (ode_regression.py:125-128)."""
    from mmpl_tpu.training.distillation import ode_regression_loss
    cfg, params, ctx = tf_setup
    sch = FlowMatchScheduler(shift=8.0, sigma_min=0.0, extra_one_step=True)
    sch.set_timesteps(1000, training=True)
    emb = dit.embed_text(params, ctx)
    ctx_kv = dit.precompute_context_kv(params, cfg, emb)
    k = jax.random.PRNGKey(3)
    noisy = jax.random.normal(k, (1, 6, 16, 4, 4))
    clean = jax.random.normal(jax.random.fold_in(k, 1), (1, 6, 16, 4, 4))
    t_a = jnp.full((1, 6), 500.0)
    batch = {"noisy_input": noisy, "clean_latent": clean,
             "timestep": t_a, "ctx_kv": ctx_kv}
    loss_a, aux = ode_regression_loss(params, cfg, sch, batch,
                                      jax.random.PRNGKey(4))
    # zero out the second block's timesteps: its (pred-target) errors must
    # drop out of the loss; manual masked mean over aux["pred"] agrees
    t_b = t_a.at[:, 3:].set(0.0)
    loss_b, aux_b = ode_regression_loss(
        params, cfg, sch, {**batch, "timestep": t_b},
        jax.random.PRNGKey(4))
    pred = np.asarray(aux_b["pred"])
    manual = np.mean((pred[:, :3] - np.asarray(clean)[:, :3]) ** 2)
    np.testing.assert_allclose(float(loss_b), manual, rtol=1e-5)


def test_train_cli_ode_and_causvid_smoke():
    """train.py --objective ode|causvid run end-to-end (synthetic data)."""
    import importlib, sys as _sys, os as _os
    _sys.path.insert(0, _os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))))
    train = importlib.import_module("train")
    assert train.main(["--objective", "ode", "--steps", "2", "--smoke",
                       "--num-frames", "6",
                       "--log-dir", "/tmp/test_runs_ode"]) == 0
    assert train.main(["--objective", "causvid", "--steps", "2", "--smoke",
                       "--num-frames", "6", "--dfake-gen-update-ratio", "2",
                       "--fake-guidance-scale", "0.5",
                       "--log-dir", "/tmp/test_runs_cv"]) == 0


def test_remat_offload_grads_match(tf_setup):
    """remat_offload=True (per-layer boundary activations offloaded to
    pinned host memory — the full-depth single-chip path) is a pure
    memory-placement change: loss and grads match the plain remat path."""
    from mmpl_tpu.training.diffusion import make_teacher_forcing_loss_fn
    cfg, params, ctx = tf_setup
    sch = FlowMatchScheduler(shift=8.0, sigma_min=0.0, extra_one_step=True)
    sch.set_timesteps(1000, training=True)
    fm = masks.fps_forcing_frame_mask(T2V_CLEAN_STEPS[:6])
    batch = {
        "latents": jax.random.normal(jax.random.PRNGKey(5),
                                     (1, 6, 16, 4, 4)),
        "context": ctx, "uncond_context": jnp.zeros_like(ctx),
    }
    rng = jax.random.PRNGKey(6)
    mk = lambda off: make_teacher_forcing_loss_fn(
        cfg, sch, fm, num_frame_per_block=3, noise_aug_max_timestep=100,
        remat_offload=off, compute_dtype=jnp.float32)
    l_a, g_a = jax.jit(jax.value_and_grad(mk(False)))(params, batch, rng)
    l_b, g_b = jax.jit(jax.value_and_grad(mk(True)))(params, batch, rng)
    assert float(l_a) == float(l_b)
    for pa, pb in zip(jax.tree.leaves(g_a), jax.tree.leaves(g_b)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   atol=1e-6, rtol=1e-5)


def test_distillation_remat_grads_match():
    """Rollout per-layer remat + the cache-gradient severance (the graded
    write is overwritten by the clean commit before any later read, so
    severing is semantically free) must not change DMD generator grads."""
    from mmpl_tpu.schedulers.flow_match import FlowMatchScheduler
    from mmpl_tpu.training.distillation import (DistillationConfig,
                                                Distiller)
    from mmpl_tpu.training.self_forcing import SelfForcingRollout
    cfg = tiny_test_config()
    sch = FlowMatchScheduler(shift=8.0, sigma_min=0.0, extra_one_step=True)
    sch.set_timesteps(1000, training=True)
    models = {
        "generator": randomize_head(
            dit.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.float32)),
        "fake_score": randomize_head(
            dit.init_dit_params(jax.random.PRNGKey(1), cfg, jnp.float32)),
        "real_score": randomize_head(
            dit.init_dit_params(jax.random.PRNGKey(2), cfg, jnp.float32)),
    }
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(5), 3)
    ctx = jax.random.normal(k1, (1, cfg.text_len, cfg.text_dim))
    batch = {
        "noise": jax.random.normal(k2, (1, 6, 16, 8, 8)),
        "ctx_kv": dit.precompute_context_kv(
            models["generator"], cfg,
            dit.embed_text(models["generator"], ctx)),
        "context": ctx,
        "uncond_context": jnp.zeros_like(ctx),
    }

    def grads(remat):
        ro = SelfForcingRollout(cfg, sch, num_frame_per_block=3,
                                num_max_frames=6, grad_frame_window=6,
                                remat=remat)
        dist = Distiller(cfg, DistillationConfig(timestep_shift=8.0,
                                                 remat=remat), ro, sch)
        return jax.grad(lambda g: dist.dmd_generator_loss(
            {**models, "generator": g}, batch, k3)[0])(models["generator"])

    g_plain, g_remat = grads(False), grads(True)
    flat_p, _ = jax.tree_util.tree_flatten(g_plain)
    flat_r, _ = jax.tree_util.tree_flatten(g_remat)
    total = sum(float(jnp.sum(jnp.abs(a))) for a in flat_p)
    assert total > 0.0                      # grads actually flow
    for a, b in zip(flat_p, flat_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_rollout_quantized_cache_close_and_grads_flow():
    """SelfForcingRollout(quantize_cache=True): int8 rollout KV cache is
    grad-compatible (cache grads are severed regardless) and stays close
    to the bf16-cache rollout."""
    from mmpl_tpu.schedulers.flow_match import FlowMatchScheduler
    from mmpl_tpu.training.self_forcing import SelfForcingRollout
    cfg = tiny_test_config()
    sch = FlowMatchScheduler(shift=8.0, sigma_min=0.0, extra_one_step=True)
    sch.set_timesteps(1000, training=True)
    params = randomize_head(
        dit.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.float32))
    ctx = jax.random.normal(jax.random.PRNGKey(1),
                            (1, cfg.text_len, cfg.text_dim))
    ctx_kv = dit.precompute_context_kv(params, cfg,
                                       dit.embed_text(params, ctx))
    noise = jax.random.normal(jax.random.PRNGKey(2), (1, 6, 16, 8, 8))

    def run(qc):
        ro = SelfForcingRollout(cfg, sch, num_frame_per_block=3,
                                num_max_frames=6, grad_frame_window=6,
                                quantize_cache=qc)
        flags = ro.sample_exit_flags(jax.random.PRNGKey(3), 2)
        out, _, _ = ro.rollout(params, ctx_kv, noise, flags,
                               jax.random.PRNGKey(4))
        return ro, flags, out

    _, _, ref = run(False)
    ro_q, flags, got = run(True)
    rel = (np.linalg.norm(np.asarray(got) - np.asarray(ref))
           / np.linalg.norm(np.asarray(ref)))
    assert np.isfinite(np.asarray(got)).all() and rel < 0.05, rel

    g = jax.grad(lambda p: jnp.sum(ro_q.rollout(
        p, ctx_kv, noise, flags, jax.random.PRNGKey(4))[0] ** 2))(params)
    total = sum(float(jnp.sum(jnp.abs(a)))
                for a in jax.tree_util.tree_flatten(g)[0])
    assert np.isfinite(total) and total > 0.0


class TestRollingRollout:
    """SelfForcingRollout(rolling=True): scanned steady-state blocks over
    a fixed recency-ordered cache — compile time and cache memory constant
    in video length (reference truncation: causal_model.py:203-226)."""

    def _setup(self):
        from mmpl_tpu.schedulers.flow_match import FlowMatchScheduler
        cfg = tiny_test_config()
        sch = FlowMatchScheduler(shift=8.0, sigma_min=0.0,
                                 extra_one_step=True)
        sch.set_timesteps(1000, training=True)
        params = randomize_head(
            dit.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.float32))
        ctx = jax.random.normal(jax.random.PRNGKey(1),
                                (1, cfg.text_len, cfg.text_dim))
        ctx_kv = dit.precompute_context_kv(params, cfg,
                                           dit.embed_text(params, ctx))
        noise = jax.random.normal(jax.random.PRNGKey(2),
                                  (1, 12, 16, 8, 8))
        return cfg, sch, params, ctx_kv, noise

    def _ro(self, cfg, sch, rolling, steps=(1000,), grad_window=12):
        from mmpl_tpu.training.self_forcing import SelfForcingRollout
        return SelfForcingRollout(cfg, sch, denoising_step_list=steps,
                                  num_frame_per_block=3,
                                  context_noise=0, num_max_frames=6,
                                  grad_frame_window=grad_window,
                                  rolling=rolling)

    def test_truncation_equivalence(self):
        """With a single denoising step and zero context noise the rollout
        is rng-free, so the scanned rolling path must match the unrolled
        truncated path (same visibility set, recency vs absolute slots)."""
        cfg, sch, params, ctx_kv, noise = self._setup()
        outs = {}
        for rolling in (False, True):
            ro = self._ro(cfg, sch, rolling)
            flags = ro.sample_exit_flags(jax.random.PRNGKey(3), 4)
            outs[rolling], _, _ = ro.rollout(params, ctx_kv, noise, flags,
                                             jax.random.PRNGKey(4))
        # tolerance: the rolling path computes RoPE trig on device in f32
        # (traced start) vs the static path's host fp64 tables; the tiny
        # angle differences compound through the 4-block AR feedback
        # (measured max |diff| 6e-4)
        np.testing.assert_allclose(np.asarray(outs[True]),
                                   np.asarray(outs[False]),
                                   atol=2e-3, rtol=2e-3)

    def test_gradient_window_and_flow(self):
        """Gradients flow through the steady scan for in-window frames and
        are exactly zero for frames before the window."""
        cfg, sch, params, ctx_kv, noise = self._setup()
        ro = self._ro(cfg, sch, True, steps=(1000, 500), grad_window=6)
        flags = ro.sample_exit_flags(jax.random.PRNGKey(3), 4)

        def loss(p, sl):
            out, _, _ = ro.rollout(p, ctx_kv, noise, flags,
                                   jax.random.PRNGKey(4))
            return jnp.sum(out[:, sl] ** 2)

        g_in = jax.grad(lambda p: loss(p, slice(6, 12)))(params)
        total_in = sum(float(jnp.sum(jnp.abs(a)))
                       for a in jax.tree_util.tree_flatten(g_in)[0])
        assert np.isfinite(total_in) and total_in > 0.0

        g_out = jax.grad(lambda p: loss(p, slice(0, 6)))(params)
        total_out = sum(float(jnp.sum(jnp.abs(a)))
                        for a in jax.tree_util.tree_flatten(g_out)[0])
        assert total_out == 0.0, total_out


class TestRunGeneratorWindow:
    """The reference's _run_generator extras (base.py:103-180): host-synced
    random rollout length, last-window slice with VAE re-encode, and the
    gradient mask on the window's first block."""

    def test_sample_num_frames_bounds_and_sync(self):
        from mmpl_tpu.training.self_forcing import sample_num_frames
        rng = np.random.default_rng(0)
        vals = {sample_num_frames(rng, 21, 33, 3) for _ in range(200)}
        assert vals == {21, 24, 27, 30, 33}
        # identical seeds -> identical sequences (the dist.broadcast
        # analogue across dp hosts)
        a = np.random.default_rng(7)
        b = np.random.default_rng(7)
        assert [sample_num_frames(a, 21, 33, 3) for _ in range(10)] == \
               [sample_num_frames(b, 21, 33, 3) for _ in range(10)]

    def test_slice_fallback_and_mask(self):
        from mmpl_tpu.training.self_forcing import slice_last_window
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 12, 16, 4, 4))
        w, m = slice_last_window(x, 6, 3)
        assert w.shape == (2, 6, 16, 4, 4)
        np.testing.assert_array_equal(np.asarray(w), np.asarray(x[:, -6:]))
        m = np.asarray(m)
        assert not m[:, :3].any() and m[:, 3:].all()
        # at-window rollouts pass through unmasked (base.py:176-177)
        w2, m2 = slice_last_window(x[:, :6], 6, 3)
        assert m2 is None and w2.shape == (2, 6, 16, 4, 4)

    def test_slice_vae_reencode(self):
        from mmpl_tpu.models import vae
        from mmpl_tpu.training.self_forcing import slice_last_window
        vp = vae.init_vae_params(jax.random.PRNGKey(0), jnp.float32)
        x = jax.random.normal(jax.random.PRNGKey(1),
                              (1, 9, 16, 4, 4)) * 0.1
        w, m = slice_last_window(x, 6, 3, vae_params=vp)
        assert w.shape == (1, 6, 16, 4, 4)
        # first latent == encode(last pixel frame of the decoded prefix)
        # (base.py:155-165)
        pixels = vae.decode(vp, x[:, :4].astype(jnp.float32))
        expect = vae.encode(vp, pixels[:, -1:])
        np.testing.assert_allclose(np.asarray(w[:, :1]), np.asarray(expect),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(w[:, 1:]),
                                      np.asarray(x[:, -5:]))
        # the re-encoded frame carries no gradient back into the rollout
        g = jax.grad(lambda xx: jnp.sum(
            slice_last_window(xx, 6, 3, vae_params=vp)[0][:, 0] ** 2))(x)
        assert float(jnp.abs(g).max()) == 0.0

    def test_distiller_windowed_rolling_dmd(self):
        """End-to-end: a 12-frame rolling rollout sliced to a 6-frame score
        window; DMD generator loss finite with flowing grads."""
        from mmpl_tpu.training.distillation import (DistillationConfig,
                                                    Distiller)
        cfg = tiny_test_config()
        sch = FlowMatchScheduler(shift=8.0, sigma_min=0.0,
                                 extra_one_step=True)
        sch.set_timesteps(1000, training=True)
        params = randomize_head(
            dit.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.float32))
        ctx = jax.random.normal(jax.random.PRNGKey(1),
                                (1, cfg.text_len, cfg.text_dim))
        ctx_kv = dit.precompute_context_kv(params, cfg,
                                           dit.embed_text(params, ctx))
        ro = SelfForcingRollout(cfg, sch, denoising_step_list=(1000, 500),
                                num_frame_per_block=3, num_max_frames=6,
                                grad_frame_window=6, rolling=True)
        dist = Distiller(cfg, DistillationConfig(
            dtype=jnp.float32, window_frames=6), ro, sch)
        models = {"generator": params,
                  "fake_score": randomize_head(dit.init_dit_params(
                      jax.random.PRNGKey(10), cfg, jnp.float32)),
                  "real_score": randomize_head(dit.init_dit_params(
                      jax.random.PRNGKey(11), cfg, jnp.float32))}
        batch = {"noise": jax.random.normal(jax.random.PRNGKey(8),
                                            (1, 12, 16, 4, 4)),
                 "ctx_kv": ctx_kv, "context": ctx,
                 "uncond_context": jnp.zeros_like(ctx)}

        def lf(g):
            loss, _ = dist.dmd_generator_loss(
                {**models, "generator": g}, batch, jax.random.PRNGKey(9))
            return loss

        loss, grads = jax.value_and_grad(lf)(params)
        assert np.isfinite(float(loss))
        total = sum(float(jnp.sum(jnp.abs(a)))
                    for a in jax.tree_util.tree_flatten(grads)[0])
        assert np.isfinite(total) and total > 0.0


def test_train_cli_rolling_distill_smoke(tmp_path):
    """train.py --objective dmd with a rolling windowed rollout, plus the
    distillation-loop extras: generator EMA, periodic checkpoint, and .pt
    export in the reference's {'generator','generator_ema'} format
    (Wan_fps_inference_1gpu.py:66-68)."""
    import importlib
    import os as _os
    import sys as _sys
    _sys.path.insert(0, _os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))))
    train = importlib.import_module("train")
    pt = str(tmp_path / "gen.pt")
    assert train.main(["--objective", "dmd", "--steps", "2", "--smoke",
                       "--num-frames", "6", "--num-training-frames", "12",
                       "--rolling", "--dfake-gen-update-ratio", "2",
                       "--ckpt-every", "2",
                       "--ckpt-dir", str(tmp_path / "ck"),
                       "--export-pt", pt,
                       "--log-dir", str(tmp_path / "runs")]) == 0
    assert _os.path.exists(pt)
    ck = [d for d in _os.listdir(tmp_path / "ck") if d.startswith("step")]
    assert ck, "periodic checkpoint missing"
    # the export round-trips through the MMPL checkpoint loader for both
    # the generator and generator_ema entries, onto the right pytree shapes
    from mmpl_tpu.core.config import tiny_test_config
    from mmpl_tpu.utils.checkpoint import load_mmpl_generator
    cfg = tiny_test_config()
    ref = dit.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    for use_ema in (False, True):
        loaded = load_mmpl_generator(pt, cfg, use_ema=use_ema)
        assert jax.tree_util.tree_structure(loaded) == \
            jax.tree_util.tree_structure(ref)
        jax.tree.map(lambda a, b: None if a.shape == b.shape else
                     (_ for _ in ()).throw(AssertionError((a.shape,
                                                           b.shape))),
                     loaded, ref)


def test_distillation_remat_offload_grads_match():
    """remat_offload=True on the distillation path (rollout graded forward
    + score models in pinned host memory — full-depth single-chip) is a
    pure memory-placement change: DMD generator grads match plain remat."""
    from mmpl_tpu.schedulers.flow_match import FlowMatchScheduler
    from mmpl_tpu.training.distillation import (DistillationConfig,
                                                Distiller)
    from mmpl_tpu.training.self_forcing import SelfForcingRollout
    cfg = tiny_test_config()
    sch = FlowMatchScheduler(shift=8.0, sigma_min=0.0, extra_one_step=True)
    sch.set_timesteps(1000, training=True)
    models = {
        "generator": randomize_head(
            dit.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.float32)),
        "fake_score": randomize_head(
            dit.init_dit_params(jax.random.PRNGKey(1), cfg, jnp.float32)),
        "real_score": randomize_head(
            dit.init_dit_params(jax.random.PRNGKey(2), cfg, jnp.float32)),
    }
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(5), 3)
    ctx = jax.random.normal(k1, (1, cfg.text_len, cfg.text_dim))
    batch = {
        "noise": jax.random.normal(k2, (1, 6, 16, 8, 8)),
        "ctx_kv": dit.precompute_context_kv(
            models["generator"], cfg,
            dit.embed_text(models["generator"], ctx)),
        "context": ctx,
        "uncond_context": jnp.zeros_like(ctx),
    }

    def grads(off):
        ro = SelfForcingRollout(cfg, sch, num_frame_per_block=3,
                                num_max_frames=6, grad_frame_window=6,
                                remat_offload=off)
        dist = Distiller(cfg, DistillationConfig(timestep_shift=8.0,
                                                 remat_offload=off),
                         ro, sch)
        return jax.jit(jax.grad(lambda g: dist.dmd_generator_loss(
            {**models, "generator": g}, batch, k3)[0]))(models["generator"])

    g_plain, g_off = grads(False), grads(True)
    flat_p, _ = jax.tree_util.tree_flatten(g_plain)
    flat_o, _ = jax.tree_util.tree_flatten(g_off)
    total = sum(float(jnp.sum(jnp.abs(a))) for a in flat_p)
    assert total > 0.0
    for a, b in zip(flat_p, flat_o):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-5)


def test_rollout_warp_denoising_step_matches_pipeline():
    """warp_denoising_step on the training rollout maps the nominal step
    list through the shifted schedule exactly as BaseModel does
    (base.py:22-24) and as the few-step inference pipeline does — the two
    sides must train and sample at the SAME warped timesteps."""
    from mmpl_tpu.pipelines.causal_inference import CausalInferencePipeline
    cfg = tiny_test_config()
    sch = FlowMatchScheduler(shift=8.0, sigma_min=0.0, extra_one_step=True)
    sch.set_timesteps(1000, training=True)
    nominal = (1000, 750, 500, 250)
    ro = SelfForcingRollout(cfg, sch, denoising_step_list=nominal,
                            warp_denoising_step=True)
    ts = np.concatenate([np.asarray(sch.timesteps), [0.0]])
    expect = tuple(float(ts[1000 - s]) for s in nominal)
    assert ro.steps == expect
    # warped values differ from nominal (shift=8 pushes them up) except
    # the first (timesteps[0] == 1000 under extra_one_step)
    assert ro.steps[0] == pytest.approx(1000.0, abs=1e-3)
    assert all(w > n for w, n in zip(ro.steps[1:], nominal[1:]))

    params = dit.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    pipe = CausalInferencePipeline(cfg, params,
                                   denoising_step_list=nominal,
                                   timestep_shift=8.0,
                                   warp_denoising_step=True,
                                   dtype=jnp.float32)
    assert tuple(pipe.denoising_step_list) == expect


class TestIndependentFirstFrame:
    """The i2v [1, nb, nb, ...] rollout plan
    (self_forcing_training.py:68-74,133-135; base.py:133-147,169-177)."""

    def test_sample_num_frames_iff(self):
        from mmpl_tpu.training.self_forcing import sample_num_frames
        rng = np.random.default_rng(0)
        vals = {sample_num_frames(rng, 10, 22, 3,
                                  independent_first_frame=True)
                for _ in range(300)}
        assert vals == {10, 13, 16, 19, 22}

    def test_slice_mask_iff(self):
        from mmpl_tpu.training.self_forcing import slice_last_window
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 16, 4, 4))
        w, m = slice_last_window(x, 7, 3, independent_first_frame=True)
        assert w.shape == (2, 7, 16, 4, 4)
        m = np.asarray(m)
        # only the standalone image frame is masked (base.py:172-174)
        assert not m[:, 0].any() and m[:, 1:].all()

    def test_rollout_iff_plan(self):
        cfg = tiny_test_config()
        sch = FlowMatchScheduler(shift=8.0, sigma_min=0.0,
                                 extra_one_step=True)
        sch.set_timesteps(1000, training=True)
        params = randomize_head(
            dit.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.float32))
        ctx = jax.random.normal(jax.random.PRNGKey(1),
                                (1, cfg.text_len, cfg.text_dim))
        ctx_kv = dit.precompute_context_kv(params, cfg,
                                           dit.embed_text(params, ctx))
        ro = SelfForcingRollout(cfg, sch, denoising_step_list=(1000, 500),
                                num_frame_per_block=3, num_max_frames=7,
                                grad_frame_window=7,
                                independent_first_frame=True)
        # 7 noise frames -> [1, 3, 3] plan
        assert ro.num_blocks(7) == 3
        # with an initial latent the noise is plain nb-blocks again
        assert ro.num_blocks(6, has_initial_latent=True) == 2
        noise = jax.random.normal(jax.random.PRNGKey(2), (1, 7, 16, 4, 4))
        flags = ro.sample_exit_flags(jax.random.PRNGKey(3), 3)
        out, t_from, t_to = ro.rollout(params, ctx_kv, noise, flags,
                                       jax.random.PRNGKey(4))
        assert out.shape == (1, 7, 16, 4, 4)
        assert np.isfinite(np.asarray(out)).all()
        g = jax.grad(lambda p: jnp.sum(ro.rollout(
            p, ctx_kv, noise, flags, jax.random.PRNGKey(4))[0] ** 2))(params)
        total = sum(float(jnp.sum(jnp.abs(a)))
                    for a in jax.tree_util.tree_flatten(g)[0])
        assert np.isfinite(total) and total > 0.0


def test_train_config_yaml_merge():
    """train.py --config: reference-style YAML run configs merge over flag
    defaults with explicit CLI flags winning (the OmegaConf-merge role of
    Wan_fps_inference_1gpu.py:54-56 for training)."""
    import importlib
    import os as _os
    import sys as _sys
    _sys.path.insert(0, _os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))))
    train = importlib.import_module("train")
    argv = ["--config", "configs/self_forcing_dmd.yaml", "--smoke",
            "--lr", "9e-9"]
    args = train.apply_run_config(train.parse_args(argv), argv)
    assert args.objective == "dmd"
    assert args.warp_denoising_step is True
    assert args.timestep_shift == 5.0
    assert args.denoising_step_list == "1000,750,500,250"
    assert args.ema_decay == 0.99
    assert args.lr == 9e-9                     # explicit CLI wins
    # the reference's own config file parses too (trainer:
    # score_distillation + distribution_loss: dmd spelling)
    ref = "/root/reference/MMPL_t2v/configs/self_forcing_dmd.yaml"
    if _os.path.exists(ref):
        argv2 = ["--config", ref, "--smoke"]
        a2 = train.apply_run_config(train.parse_args(argv2), argv2)
        assert a2.objective == "dmd" and a2.warp_denoising_step is True
        assert a2.lr == 2.0e-06 and a2.real_guidance_scale == 3.0
        assert a2.lr_critic == 4.0e-07 and a2.ema_start_step == 200
        assert a2.ts_schedule == 0 and a2.num_frame_per_block == 3
        assert a2.num_frames == 21 and a2.batch_size == 1
        assert a2.same_step_across_blocks == 1
        assert a2.last_step_only is False


def test_train_cli_generator_ckpt_init(tmp_path):
    """train.py --generator-ckpt: distillation starts from an exported
    MMPL .pt (the reference's generator_ckpt: ode_init.pt flow,
    configs/self_forcing_dmd.yaml) instead of random init."""
    import importlib
    import os as _os
    import sys as _sys
    _sys.path.insert(0, _os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))))
    train = importlib.import_module("train")
    pt = str(tmp_path / "init.pt")
    assert train.main(["--objective", "dmd", "--steps", "1", "--smoke",
                       "--num-frames", "6", "--dfake-gen-update-ratio",
                       "1", "--export-pt", pt,
                       "--log-dir", str(tmp_path / "r1")]) == 0
    assert train.main(["--objective", "dmd", "--steps", "1", "--smoke",
                       "--num-frames", "6", "--dfake-gen-update-ratio",
                       "1", "--generator-ckpt", pt,
                       "--log-dir", str(tmp_path / "r2")]) == 0


def test_train_cli_resume_matches_uninterrupted(tmp_path):
    """train.py --resume: a run checkpointed at step 2 and resumed to
    step 4 produces the SAME exported generator as the uninterrupted
    4-step run (state + RNG streams both restored)."""
    import importlib
    import os as _os
    import sys as _sys
    import torch
    _sys.path.insert(0, _os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))))
    train = importlib.import_module("train")
    pt_full = str(tmp_path / "full.pt")
    pt_res = str(tmp_path / "resumed.pt")
    base = ["--objective", "teacher_forcing", "--smoke",
            "--num-frames", "6", "--lr", "1e-3"]
    assert train.main(base + ["--steps", "4", "--ckpt-every", "2",
                              "--ckpt-dir", str(tmp_path / "ck"),
                              "--export-pt", pt_full,
                              "--log-dir", str(tmp_path / "r1")]) == 0
    assert train.main(base + ["--steps", "4",
                              "--resume", str(tmp_path / "ck" / "step2"),
                              "--export-pt", pt_res,
                              "--log-dir", str(tmp_path / "r2")]) == 0
    a = torch.load(pt_full, map_location="cpu", weights_only=False)
    b = torch.load(pt_res, map_location="cpu", weights_only=False)
    for key in ("generator", "generator_ema"):
        for name, ta in a[key].items():
            np.testing.assert_allclose(ta.numpy(), b[key][name].numpy(),
                                       atol=0, rtol=0,
                                       err_msg=f"{key}.{name}")


def test_rolling_iff_truncation_equivalence():
    """Rolling + independent_first_frame: the scanned sliding-window path
    must match the unrolled truncated path for the i2v [1, nb, ...] plan
    (single step, zero context noise -> rng-free)."""
    from mmpl_tpu.training.self_forcing import SelfForcingRollout
    cfg = tiny_test_config()
    sch = FlowMatchScheduler(shift=8.0, sigma_min=0.0, extra_one_step=True)
    sch.set_timesteps(1000, training=True)
    params = randomize_head(
        dit.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.float32))
    ctx = jax.random.normal(jax.random.PRNGKey(1),
                            (1, cfg.text_len, cfg.text_dim))
    ctx_kv = dit.precompute_context_kv(params, cfg,
                                       dit.embed_text(params, ctx))
    noise = jax.random.normal(jax.random.PRNGKey(2), (1, 13, 16, 8, 8))
    outs = {}
    for rolling in (False, True):
        ro = SelfForcingRollout(cfg, sch, denoising_step_list=(1000,),
                                num_frame_per_block=3, context_noise=0,
                                num_max_frames=7, grad_frame_window=13,
                                rolling=rolling,
                                independent_first_frame=True)
        flags = ro.sample_exit_flags(jax.random.PRNGKey(3),
                                     ro.num_blocks(13))
        outs[rolling], _, _ = ro.rollout(params, ctx_kv, noise, flags,
                                         jax.random.PRNGKey(4))
    np.testing.assert_allclose(np.asarray(outs[True]),
                               np.asarray(outs[False]),
                               atol=2e-3, rtol=2e-3)


def test_train_cli_offload_opt_matches_plain(tmp_path):
    """--offload-opt (per-leaf streaming AdamW, utils/memory.host_adamw_*)
    must be a pure PLACEMENT change: a 2-step smoke DMD run produces the
    same losses as the on-device optax path (on CPU the host placement is
    a no-op, so equality isolates the optimizer math + step plumbing)."""
    import importlib
    import os as _os
    import sys as _sys
    _sys.path.insert(0, _os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))))
    train = importlib.import_module("train")
    logs = {}
    for tag, extra in (("plain", []), ("offload", ["--offload-opt"])):
        d = tmp_path / tag
        assert train.main(["--objective", "dmd", "--steps", "2", "--smoke",
                           "--num-frames", "6",
                           "--dfake-gen-update-ratio", "1",
                           "--log-dir", str(d)] + extra) == 0
        runs = sorted((d).rglob("metrics.jsonl"))
        assert runs, f"metrics.jsonl missing under {d}"
        import json as _json
        logs[tag] = [_json.loads(line) for line in
                     runs[-1].read_text().splitlines()]
    assert len(logs["plain"]) == len(logs["offload"]) == 2
    for a, b in zip(logs["plain"], logs["offload"]):
        assert abs(a["critic_loss"] - b["critic_loss"]) < 5e-5, (a, b)
        assert abs(a["gen_loss"] - b["gen_loss"]) < 5e-5, (a, b)
