"""Distillation (DMD / GAN) train step on the real chip at truncated-1.3B scale.

The distillation stack (self-forcing rollout -> DMD generator loss;
fake-score critic step) has CPU smoke coverage via `train.py --smoke`;
this measures it on hardware with the real 60x104 latent grid.  Three
1.3B-geometry models (generator, fake_score, frozen real_score) at a
reduced layer count so all three + two optimizer states fit 16 GB.

Run: python tools/distill_probe.py [layers] [frames] [steps] [dmd|gan]
                                   [num_training_frames]

With num_training_frames > frames the rollout runs LONGER than the score
window (the reference's base.py:131-167 regime): blocks past the attention
window execute as ONE scanned recency-ordered block (rolling=True) and the
losses see the last `frames` frames — compile time stays constant in video
length.
"""

import os
import sys
import time
from functools import partial

os.environ.setdefault("MMPL_STEPS_PER_PROGRAM", "10")

import jax
import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, "/root/repo")

from mmpl_tpu.core.config import DotDict, T2V_1_3B                # noqa: E402
from mmpl_tpu.models import dit                                   # noqa: E402
from mmpl_tpu.schedulers.flow_match import FlowMatchScheduler     # noqa: E402
from mmpl_tpu.training.distillation import (DistillationConfig,   # noqa: E402
                                            Distiller)
from mmpl_tpu.training.self_forcing import SelfForcingRollout     # noqa: E402
from mmpl_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

sys.path.insert(0, "/root/repo/tests")
from helpers import randomize_head                                # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(layers: int, F: int, steps: int, objective: str = "dmd",
         max_F: int = None):
    enable_compilation_cache()
    max_F = max_F or F
    cfg = DotDict(T2V_1_3B, name=f"t2v-1.3B/{layers}L",
                  num_layers=layers)
    log(f"backend={jax.default_backend()} cfg={cfg.name} frames={F}"
        + (f" rollout={max_F} (rolling)" if max_F > F else ""))
    lat_hw = (60, 104)
    B = 1
    dtype = jnp.bfloat16  # bf16 throughout: f32 flash-bwd tiles overflow
    # the 16M scoped VMEM at this Lk (measured)

    sch = FlowMatchScheduler(shift=8.0, sigma_min=0.0, extra_one_step=True)
    sch.set_timesteps(1000, training=True)
    qc = os.environ.get("DISTILL_QC", "0") == "1"
    off = os.environ.get("DISTILL_OFFLOAD", "0") == "1"
    ro = SelfForcingRollout(cfg, sch, num_frame_per_block=3,
                            num_max_frames=F, grad_frame_window=F,
                            quantize_cache=qc, rolling=max_F > F,
                            remat_offload=off, dtype=dtype)
    if qc:
        log("rollout cache: int8")
    if off:
        log("remat boundaries: pinned_host offload")
    dist = Distiller(cfg, DistillationConfig(
        timestep_shift=8.0, dtype=dtype,
        window_frames=F if max_F > F else None,
        remat_offload=off), ro, sch)

    models = {
        "generator": randomize_head(
            dit.init_dit_params(jax.random.PRNGKey(0), cfg, dtype)),
        "fake_score": randomize_head(
            dit.init_dit_params(jax.random.PRNGKey(1), cfg, dtype)),
    }
    if objective == "gan":
        from mmpl_tpu.training.gan import init_gan_head_params
        models["gan_head"] = init_gan_head_params(
            jax.random.PRNGKey(12), atten_dim=cfg.dim,
            ffn_dim=cfg.ffn_dim, num_heads=cfg.num_heads)
        models["gan_head"] = jax.tree.map(
            lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a,
            models["gan_head"])
        gen_loss = dist.gan_generator_loss
        crit_loss = dist.gan_critic_loss
        critic_keys = ("fake_score", "gan_head")
    else:
        models["real_score"] = randomize_head(
            dit.init_dit_params(jax.random.PRNGKey(2), cfg, dtype))
        gen_loss = dist.dmd_generator_loss
        crit_loss = dist.critic_loss
        critic_keys = ("fake_score",)
    LR = 1e-5
    tx = optax.adamw(LR)
    opt_host = os.environ.get("DISTILL_OPT_HOST", "0") == "1"
    if opt_host:
        # per-LEAF streaming AdamW: the whole-tree host_opt_init +
        # stream_to_device recipe parks the moments but XLA issues every
        # host->HBM copy-start up front, so the full moments are resident
        # again at the update point (measured OOM at 30L).  host_adamw_*
        # dispatches one small program per leaf instead.
        from mmpl_tpu.utils.memory import host_adamw_init, host_adamw_update
        opt_g = host_adamw_init(models["generator"])
        opt_c = host_adamw_init({k: models[k] for k in critic_keys})
        log("optimizer states: pinned_host (per-leaf streaming AdamW)")
    else:
        opt_g = tx.init(models["generator"])
        opt_c = tx.init({k: models[k] for k in critic_keys})

    @partial(jax.jit, donate_argnums=(1,))
    def gen_step(models, opt_g, batch, rng):
        (loss, _), grads = jax.value_and_grad(
            lambda g: gen_loss(
                {**models, "generator": g}, batch, rng),
            has_aux=True)(models["generator"])
        upd, opt_g = tx.update(grads, opt_g, models["generator"])
        return optax.apply_updates(models["generator"], upd), opt_g, loss

    @partial(jax.jit, donate_argnums=(1,))
    def critic_step(models, opt_c, batch, rng):
        c = {k: models[k] for k in critic_keys}
        (loss, _), grads = jax.value_and_grad(
            lambda cc: crit_loss({**models, **cc}, batch, rng),
            has_aux=True)(c)
        upd, opt_c = tx.update(grads, opt_c, c)
        return {k: v for k, v in optax.apply_updates(c, upd).items()}, \
            opt_c, loss

    @jax.jit
    def gen_grads(models, batch, rng):
        (loss, _), grads = jax.value_and_grad(
            lambda g: gen_loss({**models, "generator": g}, batch, rng),
            has_aux=True)(models["generator"])
        return loss, grads

    @jax.jit
    def critic_grads(models, batch, rng):
        c = {k: models[k] for k in critic_keys}
        (loss, _), grads = jax.value_and_grad(
            lambda cc: crit_loss({**models, **cc}, batch, rng),
            has_aux=True)(c)
        return loss, grads

    rng = jax.random.PRNGKey(7)
    records = []
    memstats = {}
    oom = None
    for step in range(steps):
        rng, k1, k2, k3, k4 = jax.random.split(rng, 5)
        ctx = jax.random.normal(k1, (B, cfg.text_len, cfg.text_dim), dtype)
        emb = dit.embed_text(models["generator"], ctx)
        batch = {
            "noise": jax.random.normal(k2, (B, max_F, 16, *lat_hw)),
            "ctx_kv": dit.precompute_context_kv(models["generator"], cfg,
                                                emb),
            "context": ctx,
            "uncond_context": jnp.zeros_like(ctx),
        }
        t0 = time.perf_counter()
        if objective == "gan":
            batch["real_latents"] = jax.random.normal(
                jax.random.fold_in(k3, 99), (B, F, 16, *lat_hw))
        if step == 0 and os.environ.get("DISTILL_MEMSTATS", "0") == "1":
            pairs = ((("critic", critic_grads), ("gen", gen_grads))
                     if opt_host else
                     (("critic", lambda m, b, k: critic_step(m, opt_c, b,
                                                             k)),
                      ("gen", lambda m, b, k: gen_step(m, opt_g, b, k))))
            for name, fn in pairs:
                m = jax.jit(fn).lower(models, batch, k3).compile() \
                    .memory_analysis()
                log(f"{name} memory: args={m.argument_size_in_bytes/2**30:.2f}G "
                    f"out={m.output_size_in_bytes/2**30:.2f}G "
                    f"temp={m.temp_size_in_bytes/2**30:.2f}G "
                    f"gen={m.generated_code_size_in_bytes/2**20:.0f}M "
                    f"alias={m.alias_size_in_bytes/2**30:.2f}G")
                memstats[name] = {
                    "args_gb": round(m.argument_size_in_bytes / 2**30, 2),
                    "out_gb": round(m.output_size_in_bytes / 2**30, 2),
                    "temp_gb": round(m.temp_size_in_bytes / 2**30, 2),
                }
        phase = "critic"
        t_c = None
        try:
            if opt_host:
                closs, cgrads = critic_grads(models, batch, k3)
                closs = float(closs)     # sync before the per-leaf updates
                c = {k: models[k] for k in critic_keys}
                new_c, opt_c = host_adamw_update(c, cgrads, opt_c, LR)
                del cgrads
                t_c = time.perf_counter() - t0
                models.update(new_c)
                phase = "gen"
                t0 = time.perf_counter()
                gloss, ggrads = gen_grads(models, batch, k4)
                gloss = float(gloss)
                models["generator"], opt_g = host_adamw_update(
                    models["generator"], ggrads, opt_g, LR)
                del ggrads
                t_g = time.perf_counter() - t0
            else:
                new_c, opt_c, closs = critic_step(models, opt_c, batch, k3)
                closs = float(closs)
                t_c = time.perf_counter() - t0
                models.update(new_c)
                phase = "gen"
                t0 = time.perf_counter()
                g, opt_g, gloss = gen_step(models, opt_g, batch, k4)
                gloss = float(gloss)
                t_g = time.perf_counter() - t0
                models["generator"] = g
        except jax.errors.JaxRuntimeError as e:
            if "RESOURCE_EXHAUSTED" not in str(e):
                raise
            # record the partial outcome (e.g. the critic fits but the
            # gen step's memory demand exceeds HBM) instead of losing
            # the measurements already made
            oom = {"step": step, "phase": phase,
                   "error": str(e).splitlines()[0][:200]}
            log(f"OOM at step {step} ({phase}): stopping, recording "
                f"partial results")
            if phase == "gen":
                records.append({"step": step, "critic_loss": float(closs),
                                "critic_s": round(t_c, 2),
                                "gen_loss": None, "gen_s": None})
            break
        log(f"step {step}: critic={closs:.5f} ({t_c:.1f}s) "
            f"gen={gloss:.5f} ({t_g:.1f}s)")
        assert np.isfinite(closs) and np.isfinite(gloss)
        records.append({"step": step, "critic_loss": closs, "critic_s":
                        round(t_c, 2), "gen_loss": gloss,
                        "gen_s": round(t_g, 2)})
    if oom is None:
        log("distillation steps finite and timed on chip")

    import json
    os.makedirs("/root/repo/runs", exist_ok=True)
    path = "/root/repo/runs/distill_probe.json"
    try:
        with open(path) as f:
            history = json.load(f)
    except (OSError, ValueError):
        history = []
    history.append({
        "date": time.strftime("%Y-%m-%d %H:%M"),
        "backend": jax.default_backend(),
        "layers": layers, "frames": F, "rollout_frames": max_F,
        "objective": objective, "offload": off, "quantize_cache": qc,
        "opt_host": opt_host, "steps": records,
        **({"memory_analysis": memstats} if memstats else {}),
        **({"oom": oom} if oom else {}),
    })
    with open(path, "w") as f:
        json.dump(history, f, indent=1)
    log(f"recorded -> {path}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 12,
         int(sys.argv[2]) if len(sys.argv) > 2 else 9,
         int(sys.argv[3]) if len(sys.argv) > 3 else 3,
         sys.argv[4] if len(sys.argv) > 4 else "dmd",
         int(sys.argv[5]) if len(sys.argv) > 5 else None)
