"""AOT memory analysis of the FPS pipeline's per-group programs (1.3B).

Compiles each group's denoise program with abstract inputs and prints the
compiler's memory breakdown — no HBM needed.  Flags isolate suspects:
  python tools/mem_analyze.py [--no-fuse] [--groups 0,1,2,3]
"""

import argparse
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-fuse", action="store_true")
    ap.add_argument("--groups", default="0,1")
    args = ap.parse_args()

    from mmpl_tpu.core.config import T2V_1_3B
    from mmpl_tpu.core.geometry import t2v_plan
    from mmpl_tpu.models import dit
    from mmpl_tpu.models.fps_dit import init_kv_cache
    from mmpl_tpu.pipelines.fps_inference import CausalFPSInferencePipeline

    cfg = T2V_1_3B
    B, C, H, W = 1, 16, 60, 104
    plan = t2v_plan()
    S = (H // 2) * (W // 2)

    sds = lambda sh, dt: jax.ShapeDtypeStruct(sh, dt)
    params_s = jax.eval_shape(
        lambda k: dit.init_dit_params(k, cfg, jnp.bfloat16),
        jax.random.PRNGKey(0))
    # build the pipeline machinery around ABSTRACT params (no HBM touched):
    # bypass __init__ and set only what _get_group_fn needs
    pipe = CausalFPSInferencePipeline.__new__(CausalFPSInferencePipeline)
    pipe.cfg = cfg
    pipe.mesh = None
    if not args.no_fuse:
        params_s = jax.eval_shape(
            lambda p: dit.fuse_qkv_params(p, num_heads=cfg.num_heads),
            params_s)
    pipe.params = params_s
    pipe.plan = plan
    pipe.guidance_scale = 5.0
    pipe.dtype = jnp.bfloat16
    from mmpl_tpu.schedulers.unipc import FlowUniPC
    from mmpl_tpu.schedulers.flow_match import FlowMatchScheduler
    pipe.sampler = FlowUniPC(50, shift=8.0, num_train_timesteps=1000)
    pipe.ddpm = FlowMatchScheduler(shift=8.0, sigma_min=0.0,
                                   extra_one_step=True)
    pipe.ddpm.set_timesteps(1000, training=True)
    pipe.ddpm_timestep = 1991.5
    pipe._group_fns, pipe._commit_fns = {}, {}
    pipe._ctx_fn = pipe._assemble_fn = None
    pipe.phase_times = {}

    n, d = cfg.num_heads, cfg.dim // cfg.num_heads
    cache_s = jax.eval_shape(
        lambda: init_kv_cache(cfg, 2 * B, S, dtype=jnp.bfloat16))
    ctx_s = {"k": sds((cfg.num_layers, 2 * B, cfg.text_len, n, d),
                      jnp.bfloat16),
             "v": sds((cfg.num_layers, 2 * B, cfg.text_len, n, d),
                      jnp.bfloat16)}
    key_s = sds((2,), jnp.uint32)

    for gi in [int(g) for g in args.groups.split(",")]:
        group = plan.groups[gi]
        G = group.num_frames
        noise_s = sds((B, G, C, H, W), jnp.float32)
        r_s = sds((B, 1, C, H, W), jnp.float32)
        fn = pipe._get_group_fn(gi)
        try:
            lowered = fn.lower(pipe.params, ctx_s, cache_s, noise_s,
                               r_s, r_s, key_s)
            compiled = lowered.compile()
            ma = compiled.memory_analysis()
            log(f"group{gi}: args={ma.argument_size_in_bytes/2**30:.2f}G "
                f"out={ma.output_size_in_bytes/2**30:.2f}G "
                f"temp={ma.temp_size_in_bytes/2**30:.2f}G "
                f"alias={ma.alias_size_in_bytes/2**30:.2f}G "
                f"total={(ma.argument_size_in_bytes + ma.output_size_in_bytes + ma.temp_size_in_bytes - ma.alias_size_in_bytes)/2**30:.2f}G")
        except Exception as e:
            log(f"group{gi}: FAIL {str(e)[:300]}")


if __name__ == "__main__":
    main()
