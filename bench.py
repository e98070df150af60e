"""Benchmark: MMPL end-to-end window denoise throughput on TPU.

Measures the REAL pipeline — `CausalFPSInferencePipeline.inference` (batched
CFG pair, 50-step UniPC lax.scan per chunk-group, boundary re-seeds,
clean-KV commits) plus the streaming VAE decode — for the Wan 1.3B
configuration at the canonical 480x832 / 21-latent-frame window geometry
(casual_fps_inference.py:155-451).  Also reports the per-group step-time
breakdown (the r1 proxy) for regression tracking.

Prints ONE JSON line:
  {"metric": "latent_frames_per_sec_per_chip", "value": ..., "unit": "frames/s",
   "vs_baseline": ..., "window_s_measured": ..., "p50_chunk_latency_s": ...,
   "vae_decode_s": ..., "pixel_frames_per_sec_per_chip": ...}

vs_baseline: ratio of our measured per-chip throughput to an analytic
estimate of the reference stack on one H100 for the same model/workload
(dense-bf16 989 TFLOP/s at 45% achieved MFU — a generous flash-attn torch
estimate; the reference publishes no numbers, BASELINE.md).

Env knobs:
  BENCH_QUICK=1    tiny config smoke pass
  BENCH_WINDOWS=N  measured windows after the compile window (default 1)
  BENCH_SKIP_VAE=1 skip the VAE decode timing
  BENCH_MODEL=14b  14B-shape path: measures real per-layer 14B block cost on
                   this chip with BENCH_LAYERS layers (default 4) and
                   extrapolates to 40 layers — the full 14B needs a
                   multi-chip mesh (see tests/test_sharded_pipeline.py and
                   __graft_entry__.dryrun_multichip for the sharded path).
"""

import json
import os
import sys
import time

import jax
from mmpl_tpu.utils.compile_cache import enable_compilation_cache
enable_compilation_cache()
import jax.numpy as jnp
import numpy as np

# this image's tunneled TPU worker kills single programs running >~70 s;
# the 1.3B fill groups exceed that in one 50-step program.  Segmented
# execution is bit-identical (tests) and adds ~8 ms dispatch per segment.
os.environ.setdefault("MMPL_STEPS_PER_PROGRAM", "10")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(x) -> float:
    """Force a device->host transfer (block_until_ready can return early on
    the experimental axon platform)."""
    return float(jnp.sum(x.astype(jnp.float32)))


def model_config(quick: bool, model: str):
    from mmpl_tpu.core.config import T2V_1_3B, T2V_14B, DotDict, _SHARED
    if quick:
        return DotDict(_SHARED, name="bench-quick", model_type="t2v",
                       dim=384, ffn_dim=1024, num_heads=6, num_layers=4,
                       text_dim=512, text_len=64, freq_dim=64)
    if model == "14b":
        layers = int(os.environ.get("BENCH_LAYERS", "4"))
        return DotDict(T2V_14B, name=f"t2v-14B/{layers}L",
                       num_layers=layers), T2V_14B.num_layers
    return T2V_1_3B


def flops_per_group_forward(cfg, q_tokens: int, kv_tokens: int,
                            text_len: int = 512) -> float:
    """Analytic matmul FLOPs of one DiT forward over a group (batch 1)."""
    D, Ff, L = cfg.dim, cfg.ffn_dim, cfg.num_layers
    per_layer = (
        2 * q_tokens * D * D * 4          # self qkv + o
        + 2 * q_tokens * kv_tokens * D * 2  # scores + values
        + 2 * q_tokens * D * D * 2        # cross q + o
        + 2 * q_tokens * text_len * D * 2   # cross attn
        + 2 * q_tokens * D * Ff * 2       # ffn
    )
    return L * per_layer


def window_flops(cfg, plan, S: int, steps: int = 50,
                 cfg_forwards: int = 2) -> float:
    """Matmul FLOPs of one full denoised window (incl. clean commits)."""
    total = 0.0
    for group in plan.groups:
        G = group.num_frames
        kv_tok = (group.num_visible + (G if group.append_mode else 0)) * S
        per_fwd = flops_per_group_forward(cfg, G * S, kv_tok)
        n_fwd = steps + (0 if group.append_mode else 1)
        total += per_fwd * n_fwd
    return cfg_forwards * total


def bench_group_proxy(cfg, plan, B, C, H, W, dtype, repeats):
    """r1 proxy: bare fps_forward_group step times (regression tracking)."""
    from mmpl_tpu.models import dit
    from mmpl_tpu.models.fps_dit import fps_forward_group, init_kv_cache

    S = (H // 2) * (W // 2)
    params = dit.init_dit_params(jax.random.PRNGKey(0), cfg, dtype)
    ctx = jax.random.normal(jax.random.PRNGKey(1),
                            (B, cfg.text_len, cfg.text_dim), dtype)
    emb = dit.embed_text(params, ctx)
    ctx_kv = dit.precompute_context_kv(params, cfg, emb)
    cache = init_kv_cache(cfg, B, S, dtype=dtype)

    group_times = {}
    for group in plan.groups:
        G = group.num_frames
        lat = jax.random.normal(jax.random.PRNGKey(2 + group.index),
                                (B, G, C, H, W), dtype)
        t = jnp.full((B, G), 500.0, jnp.float32)
        fwd = jax.jit(lambda p, l, tt, ck, ca, g=group:
                      fps_forward_group(p, cfg, l, tt, ck, ca, g),
                      donate_argnums=(4,))

        def run_once(cache):
            flow, cache = fwd(params, lat, t, ctx_kv, cache)
            sync(flow)
            return cache

        t0 = time.perf_counter()
        cache = run_once(cache)
        compile_s = time.perf_counter() - t0
        inner = 3
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            for _ in range(inner):
                cache = run_once(cache)
            times.append((time.perf_counter() - t0) / inner)
        step_s = float(np.median(times))
        group_times[group.index] = step_s
        log(f"group{group.index}: frames={G} kv_frames={group.num_visible} "
            f"step={step_s*1e3:.1f}ms (compile {compile_s:.1f}s)")
    return group_times


def bench_real_pipeline(cfg, plan, B, C, H, W, dtype, steps, n_windows,
                        quantize=None):
    """Measured end-to-end windows through CausalFPSInferencePipeline."""
    from mmpl_tpu.models import dit
    from mmpl_tpu.pipelines.fps_inference import CausalFPSInferencePipeline

    params = dit.init_dit_params(jax.random.PRNGKey(0), cfg, dtype)
    # the Wan head is zero-init (model.py:923): randomize it (same seed
    # on every variant) so the outputs carry signal — the int8-vs-bf16
    # decode-space PSNR quality gate below needs non-vacuous latents
    k = params["head"]["head"]["kernel"]
    params["head"]["head"]["kernel"] = (jax.random.normal(
        jax.random.PRNGKey(99), k.shape, jnp.float32) * 0.05).astype(k.dtype)
    pipe = CausalFPSInferencePipeline(cfg, params, plan=plan,
                                      sampling_steps=steps, dtype=dtype,
                                      quantize=quantize)
    # the pipeline holds the fused copy; free the original (HBM headroom:
    # 1.3B B=1 runs ~22 GB peak against 15.75 GB with both copies alive)
    del params
    noise = jax.random.normal(jax.random.PRNGKey(10),
                              (B, plan.num_frames, C, H, W), jnp.float32)
    cond = jax.random.normal(jax.random.PRNGKey(11),
                             (B, cfg.text_len, cfg.text_dim), jnp.float32)
    uncond = jax.random.normal(jax.random.PRNGKey(12),
                               (B, cfg.text_len, cfg.text_dim), jnp.float32)

    # window 0: compiles all group programs (fast when the persistent
    # compile cache hits — see cache_stats in the JSON line)
    t0 = time.perf_counter()
    out = pipe.inference(noise, cond, uncond, rng=jax.random.PRNGKey(0))
    sync(out)
    window0_s = time.perf_counter() - t0
    log(f"window0 (compile+run): {window0_s:.1f}s "
        f"dispatch={ {k: round(v, 2) for k, v in pipe.phase_times.items()} }")

    window_times = []
    out_key1 = out      # fallback: BENCH_WINDOWS=0 still yields latents
    for wi in range(n_windows):
        t0 = time.perf_counter()
        out = pipe.inference(noise, cond, uncond,
                             rng=jax.random.PRNGKey(1 + wi))
        sync(out)
        dt = time.perf_counter() - t0
        window_times.append(dt)
        log(f"window{wi + 1}: {dt:.1f}s")
        if wi == 0:
            # keep the PRNGKey(1) window's latents: the int8 quality gate
            # compares against an int8 pass that always runs PRNGKey(1),
            # and rng drives the reseed noise — comparing different-rng
            # windows would measure rng variance, not quantization error
            out_key1 = out
    return out_key1, window_times, window0_s


def bench_fewstep(cfg, B, C, H, W, dtype, quick: bool):
    """Few-step distilled AR pipeline — the production-latency path
    (reference: pipeline/causal_inference.py:47-276; its CUDA-event profile
    :237-271 is the reference's whole latency story).

    Measures: steady-state per-3-frame-block latency on the rolling ring
    cache (ONE compiled program per steady block), end-to-end frames/s at
    4 denoising steps, the reference-format phase breakdown, and the
    marginal cost of live TAEHV preview decode per block.
    """
    import gc

    from mmpl_tpu.models import dit, taehv
    from mmpl_tpu.pipelines.causal_inference import CausalInferencePipeline
    from mmpl_tpu.utils.preview import TaehvPreviewer

    nb = 3
    cap = 6 if quick else 21
    F = 12 if quick else 33            # cap warmup + >=2 rolling blocks

    def _init_params():
        # same head randomization as bench_real_pipeline (the Wan head is
        # zero-init): the int8-vs-bf16 decode-space PSNR gate below needs
        # latents that actually carry weight signal — with a zero head the
        # flow prediction is 0 in BOTH variants and the PSNR is vacuous
        p = dit.init_dit_params(jax.random.PRNGKey(0), cfg, dtype)
        k = p["head"]["head"]["kernel"]
        p["head"]["head"]["kernel"] = (jax.random.normal(
            jax.random.PRNGKey(99), k.shape, jnp.float32) * 0.05).astype(
                k.dtype)
        return p

    params = _init_params()
    pipe = CausalInferencePipeline(
        cfg, params, denoising_step_list=(1000, 750, 500, 250),
        num_frame_per_block=nb, max_attention_frames=cap, dtype=dtype)
    del params
    noise = jax.random.normal(jax.random.PRNGKey(30), (B, F, C, H, W),
                              jnp.float32)
    cond = jax.random.normal(jax.random.PRNGKey(31),
                             (B, cfg.text_len, cfg.text_dim), jnp.float32)

    t0 = time.perf_counter()
    out = pipe.inference(noise, cond, rng=jax.random.PRNGKey(0))
    sync(out)
    log(f"fewstep window0 (compile+run): {time.perf_counter() - t0:.1f}s")

    # measured pass: async block chain, one sync (dispatch amortised)
    t0 = time.perf_counter()
    out = pipe.inference(noise, cond, rng=jax.random.PRNGKey(1))
    sync(out)
    window_s = time.perf_counter() - t0
    out_bf16 = out                     # PRNGKey(1) latents for the PSNR gate

    # profiled pass: reference-format per-block/per-phase breakdown
    out = pipe.inference(noise, cond, rng=jax.random.PRNGKey(2),
                         profile=True)
    sync(out)
    blocks = list(pipe.last_profile.blocks)
    n_warm = cap // nb
    steady = blocks[n_warm:]
    p50_steady = float(np.median(steady))
    log(f"fewstep: window={window_s:.1f}s frames/s={F / window_s:.3f} "
        f"steady p50 block={p50_steady * 1e3:.0f}ms "
        f"(warmup p50 {np.median(blocks[:n_warm]) * 1e3:.0f}ms)")

    # live TAEHV preview marginal cost (warm: compile the two streaming
    # programs — state=None and carried-state — outside the measurement;
    # they are one-time and persistent-cache-eligible)
    previewer = TaehvPreviewer(taehv.init_taehv_params(jax.random.PRNGKey(40),
                                                       jnp.float32))
    t0 = time.perf_counter()
    dummy = jnp.zeros((B, nb, C, H, W), jnp.float32)
    previewer(dummy)
    previewer(dummy)
    previewer.reset()
    log(f"fewstep preview compile (one-time): {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    out = pipe.inference(noise, cond, rng=jax.random.PRNGKey(1),
                         on_block=lambda s, x: previewer(x))
    sync(out)
    preview_s = time.perf_counter() - t0
    overhead = preview_s - window_s
    log(f"fewstep + TAEHV preview: {preview_s:.1f}s "
        f"(preview overhead {overhead:+.1f}s, "
        f"{overhead / (F / nb):+.2f}s per preview block)")
    del pipe, previewer
    gc.collect()

    # int8-auto on the few-step path (probe-measured +6.9% throughput,
    # tools/fewstep_int8_probe.py; recorded here so the round artifact
    # carries it)
    int8_window_s = int8_p50 = None
    out_int8 = None
    if os.environ.get("BENCH_SKIP_FEWSTEP_INT8", "0") != "1":
        params = _init_params()
        pipe8 = CausalInferencePipeline(
            cfg, params, denoising_step_list=(1000, 750, 500, 250),
            num_frame_per_block=nb, max_attention_frames=cap,
            quantize="auto", dtype=dtype)
        del params
        t0 = time.perf_counter()
        out = pipe8.inference(noise, cond, rng=jax.random.PRNGKey(0))
        sync(out)
        log(f"fewstep int8 window0 (compile+run): "
            f"{time.perf_counter() - t0:.1f}s")
        # amortised window (async block chain, one sync — same protocol
        # as the bf16 pass) and a separate profiled pass for block p50
        t0 = time.perf_counter()
        out_int8 = pipe8.inference(noise, cond, rng=jax.random.PRNGKey(1))
        sync(out_int8)
        int8_window_s = time.perf_counter() - t0
        out = pipe8.inference(noise, cond, rng=jax.random.PRNGKey(2),
                              profile=True)
        sync(out)
        int8_p50 = float(np.median(pipe8.last_profile.blocks[n_warm:]))
        log(f"fewstep int8-auto: window={int8_window_s:.1f}s "
            f"({window_s / int8_window_s - 1:+.1%}) "
            f"steady p50 block={int8_p50 * 1e3:.0f}ms")
        del pipe8, out
        gc.collect()

    metrics = {
        "fewstep_window_s": round(window_s, 2),
        "fewstep_frames_per_s": round(F / window_s, 4),
        "fewstep_block_p50_s": round(p50_steady, 3),
        "fewstep_frames": F,
        "fewstep_preview_overhead_s": round(overhead, 2),
        "fewstep_int8_window_s": (None if int8_window_s is None
                                  else round(int8_window_s, 2)),
        "fewstep_int8_block_p50_s": (None if int8_p50 is None
                                     else round(int8_p50, 3)),
    }
    return metrics, out_bf16, out_int8


def _device_preflight(timeout_s: int = 300, attempts: int = None,
                      retry_wait_s: int = None) -> bool:
    """Prove the accelerator answers a trivial program before committing
    to the long bench.  This image's tunneled worker can wedge for >1 h
    when a previous client died mid-compile (the remote compile helper
    keeps grinding and serializes everything behind it — CLAUDE.md); a
    hung bench is worse than an error row, so probe in a subprocess with
    a hard timeout.  The wedge drains on its own (observed 2026-08-18/19),
    so retry with waits before declaring the device down — round 4's
    recorded bench was a 0.0 error row from a single-shot preflight that
    would likely have passed 20 minutes later."""
    import subprocess
    attempts = attempts or int(os.environ.get("BENCH_PREFLIGHT_ATTEMPTS",
                                              "3"))
    retry_wait_s = retry_wait_s or int(
        os.environ.get("BENCH_PREFLIGHT_RETRY_WAIT_S", "300"))
    code = ("import jax, jax.numpy as jnp;"
            "print(float(jnp.sum(jnp.ones((128,128)))))")
    for i in range(attempts):
        if i:
            log(f"preflight attempt {i} failed; waiting {retry_wait_s}s "
                f"for the tunnel to drain ({attempts - i} attempts left)")
            time.sleep(retry_wait_s)
        try:
            proc = subprocess.run([sys.executable, "-c", code],
                                  capture_output=True, timeout=timeout_s)
            if proc.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
    return False


def main():
    quick = os.environ.get("BENCH_QUICK", "0") == "1"
    model = os.environ.get("BENCH_MODEL", "1.3b").lower()
    if os.environ.get("BENCH_SKIP_PREFLIGHT", "0") != "1" \
            and not _device_preflight():
        log("DEVICE PREFLIGHT FAILED: accelerator unreachable/wedged")
        row = {
            "metric": "latent_frames_per_sec_per_chip", "value": 0.0,
            "unit": "frames/s", "vs_baseline": 0.0,
            "error": "device preflight failed: accelerator unreachable "
                     "(wedged tunnel/compile helper); rerun when the "
                     "worker recovers.",
        }
        try:  # quote the most recent successful full run (written below)
            with open("runs/last_good_bench.json") as f:
                row["last_good"] = json.load(f)
        except (OSError, ValueError):   # missing OR truncated/corrupt file
            row["error"] += (" Last good full run (2026-08-17): 0.1131 "
                             "frames/s/chip bf16 (window 185.7s), 0.1209 "
                             "int8 (173.7s), vs_baseline 0.253")
        print(json.dumps(row))
        return
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))
    n_windows = int(os.environ.get("BENCH_WINDOWS", "1"))
    backend = jax.default_backend()
    log(f"backend={backend} devices={jax.devices()} quick={quick} "
        f"model={model}")

    from mmpl_tpu.core.geometry import t2v_plan

    plan = t2v_plan()
    B = 1
    CFG_FORWARDS = 2   # batched pair costs ~2 forwards of compute
    C, H, W = 16, 60, 104        # 480x832 latent geometry -> 1560 tok/frame
    steps = 50
    dtype = jnp.bfloat16
    extrapolate_layers = None

    if model == "14b" and not quick:
        cfg, full_layers = model_config(quick, model)
        extrapolate_layers = full_layers
    else:
        cfg = model_config(quick, model)
    if quick:
        H, W = 20, 20
        steps = 4
        n_windows = 1
    S = (H // 2) * (W // 2)

    log(f"init {cfg.name}: dim={cfg.dim} layers={cfg.num_layers} "
        f"tokens/frame={S}")

    # --- per-group proxy (r1 metric continuity + per-op regression) -------
    if os.environ.get("BENCH_SKIP_PROXY", "0") != "1":
        group_times = bench_group_proxy(cfg, plan, B, C, H, W, dtype,
                                        repeats)
        import gc
        gc.collect()   # drop the proxy's buffers before the real pipeline
        extrap_window_s = CFG_FORWARDS * sum(steps * t
                                             for t in group_times.values())
        extrap_window_s += CFG_FORWARDS * sum(
            t for g, t in group_times.items()
            if not plan.groups[g].append_mode)
    else:
        group_times, extrap_window_s = {}, 0.0

    if extrapolate_layers is not None:
        # 14B path: scale the measured few-layer cost to the full depth.
        # (The full 40-layer model does not fit one 16 GB v5e chip —
        # BASELINE.md "Min GPU memory, 14B: >=80GB"; the sharded multi-chip
        # path is exercised by dryrun_multichip / tests.)
        scale = extrapolate_layers / cfg.num_layers
        window_s = extrap_window_s * scale
        frames_per_s = plan.num_frames / window_s
        full_cfg = dict(cfg, num_layers=extrapolate_layers)
        from mmpl_tpu.core.config import DotDict
        total = window_flops(DotDict(full_cfg), plan, S, steps, CFG_FORWARDS)
        achieved = total / window_s / 1e12
        h100 = 989e12 * 0.45
        vs = frames_per_s / (plan.num_frames / (total / h100))
        log(f"14B extrapolated ({cfg.num_layers}L measured -> "
            f"{extrapolate_layers}L): window={window_s:.1f}s "
            f"frames/s/chip={frames_per_s:.4f} ~{achieved:.1f} TFLOP/s")
        print(json.dumps({
            "metric": "latent_frames_per_sec_per_chip_14B",
            "value": round(frames_per_s, 4),
            "unit": "frames/s",
            "vs_baseline": round(vs, 4),
            "14b_extrapolated": True,
            "extrapolated_from_layers": cfg.num_layers,
        }))
        return

    # --- measured end-to-end windows (VERDICT r1 item 3) ------------------
    out, window_times, window0_s = bench_real_pipeline(
        cfg, plan, B, C, H, W, dtype, steps, n_windows)
    window_s_measured = float(np.median(window_times))
    p50_chunk = window_s_measured   # one window == one pipeline chunk

    # --- int8 quantized window + quality gate (VERDICT r3 items 1 & r4 4) --
    # quantize="auto" runs the load-time per-projection sensitivity audit
    # (models.dit.auto_quantize: W8A8 where the probe error passes, W8A16
    # fallback elsewhere) and the decode-space PSNR below decides whether
    # the int8 number becomes the HEADLINE: both windows denoise the same
    # noise with the same weights, both decode through the same VAE, and
    # int8 is accepted at PSNR >= BENCH_INT8_PSNR_GATE (35 dB default —
    # transfers to real weights: the procedure, not the synthetic number,
    # is the artifact).
    int8_window_s = None
    int8_window_first_s = None
    int8_out = None
    int8_policy = None
    if (os.environ.get("BENCH_SKIP_INT8", "0") != "1" and not quick):
        import gc
        gc.collect()
        int8_out, int8_times, _ = bench_real_pipeline(
            cfg, plan, B, C, H, W, dtype, steps, 1, quantize="auto")
        from mmpl_tpu.models.dit import last_auto_quantize_report
        int8_policy = dict(last_auto_quantize_report)
        int8_window_s = float(np.median(int8_times))
        log(f"int8 window: {int8_window_s:.1f}s "
            f"({window_s_measured / int8_window_s - 1:+.1%} vs bf16)")
        if int8_window_s > 1.15 * window_s_measured:
            # Quantization only swaps gemm kernels; the worst honest int8
            # delta ever measured is -7% vs bf16 (PERF.md r3).  A >15%
            # slowdown means the tunnel/compile-helper degraded mid-run
            # (2026-08-20: a warm int8 window read 1480s vs 174s the day
            # before, same code).  Re-measure once and keep BOTH numbers.
            log("int8 window anomalously slow (environment flake?) — "
                "re-measuring once")
            int8_window_first_s = int8_window_s
            gc.collect()
            int8_out, int8_times, _ = bench_real_pipeline(
                cfg, plan, B, C, H, W, dtype, steps, 1, quantize="auto")
            int8_window_s = float(np.median(int8_times))
            log(f"int8 window (retry): {int8_window_s:.1f}s "
                f"({window_s_measured / int8_window_s - 1:+.1%} vs bf16)")
        gc.collect()

    # --- few-step distilled AR path (VERDICT r3 item 2) ---------------------
    fewstep = {}
    fs_out_bf16 = fs_out_int8 = None
    if os.environ.get("BENCH_SKIP_FEWSTEP", "0") != "1":
        fewstep, fs_out_bf16, fs_out_int8 = bench_fewstep(
            cfg, B, C, H, W, dtype, quick)

    # --- streaming VAE decode + int8 quality gate ---------------------------
    vae_decode_s = None
    int8_psnr = None
    if os.environ.get("BENCH_SKIP_VAE", "0") != "1":
        from mmpl_tpu.models import vae as vae_mod
        vae_params = vae_mod.init_vae_params(jax.random.PRNGKey(20),
                                             jnp.float32)
        # the production decode (cli.py/serving): bf16 streaming decode +
        # device-side uint8/NTHWC — measured 9% faster than the r1-r3 f32
        # path at 50.8 dB (tools/vae_decode_probe.py, PERF.md)
        dec_u8 = jax.jit(vae_mod.decode_to_frames)
        t0 = time.perf_counter()
        frames, _ = dec_u8(vae_params, out)
        sync(frames)
        compile_s = time.perf_counter() - t0
        # time the on-device decode and the uint8 host fetch SEPARATELY:
        # the ~97MB fetch rides the tunnel, whose throughput varied 3x
        # across otherwise-identical runs (5.5/9.5/14.9s combined readings
        # for unchanged decode code) — the device number is the stable
        # production metric, the fetch is link-dependent.
        t0 = time.perf_counter()
        frames, _ = dec_u8(vae_params, out)
        sync(frames)                       # device-complete, ~KB fetched
        vae_decode_device_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(frames)                 # the uint8 host transfer
        vae_fetch_s = time.perf_counter() - t0
        vae_decode_s = vae_decode_device_s + vae_fetch_s
        log(f"vae decode (bf16->uint8): {vae_decode_s:.1f}s "
            f"(device {vae_decode_device_s:.1f}s + fetch {vae_fetch_s:.1f}s"
            f"; compile+run {compile_s:.1f}s) video={frames.shape}")
        def _decode_psnr(lat_a, lat_b, label):
            # decode-space PSNR int8-vs-bf16: same noise, same weights,
            # same VAE — the quantization error as a user would see it
            dec = jax.jit(vae_mod.decode_streaming)
            vid = dec(vae_params, lat_a.astype(jnp.float32))
            vid8 = dec(vae_params, lat_b.astype(jnp.float32))
            a = np.asarray(vid, np.float32)
            b = np.asarray(vid8, np.float32)
            mse = float(np.mean((a - b) ** 2))
            psnr = 10.0 * np.log10(4.0 / max(mse, 1e-12))
            log(f"{label} decode-space PSNR vs bf16: {psnr:.1f} dB")
            return psnr

        if int8_out is not None:
            int8_psnr = _decode_psnr(out, int8_out, "int8")
        if fs_out_int8 is not None:
            fewstep["fewstep_int8_psnr_db"] = round(
                _decode_psnr(fs_out_bf16, fs_out_int8, "fewstep int8"), 1)

    # --- headline promotion (VERDICT r4 item 4) -----------------------------
    # int8 becomes the HEADLINE iff it is faster AND passes the decode-space
    # PSNR gate; otherwise the bf16 number stands and the int8 row records
    # why (psnr/speed).  The gate default (35 dB on [-1,1] pixels) is the
    # documented accept threshold; it transfers to real weights because the
    # whole procedure (auto policy + same-noise decode comparison) reruns at
    # load time with whatever weights are given.
    psnr_gate = float(os.environ.get("BENCH_INT8_PSNR_GATE", "35"))
    int8_promoted = bool(int8_window_s is not None and int8_psnr is not None
                         and int8_psnr >= psnr_gate
                         and int8_window_s < window_s_measured)
    headline_window_s = int8_window_s if int8_promoted else window_s_measured
    if int8_promoted:
        log(f"int8 PROMOTED to headline: PSNR {int8_psnr:.1f} >= "
            f"{psnr_gate} dB and {int8_window_s:.1f}s < "
            f"{window_s_measured:.1f}s")
    # same accept/reject procedure for the few-step production path
    fs_psnr = fewstep.get("fewstep_int8_psnr_db")
    fs_int8_s = fewstep.get("fewstep_int8_window_s")
    if fs_int8_s is not None:
        fewstep["fewstep_int8_promoted"] = bool(
            fs_psnr is not None and fs_psnr >= psnr_gate
            and fs_int8_s < fewstep["fewstep_window_s"])
        if fewstep["fewstep_int8_promoted"]:
            log(f"fewstep int8 PROMOTED: PSNR {fs_psnr:.1f} >= {psnr_gate} "
                f"dB and {fs_int8_s:.1f}s < {fewstep['fewstep_window_s']:.1f}s")

    frames_per_s = plan.num_frames / headline_window_s
    total = window_flops(cfg, plan, S, steps, CFG_FORWARDS)
    achieved_tflops = total / headline_window_s / 1e12

    h100_flops = 989e12 * 0.45
    ref_window_s = total / h100_flops
    vs = frames_per_s / (plan.num_frames / ref_window_s)

    wall = headline_window_s + (vae_decode_s or 0.0)
    from mmpl_tpu.core.geometry import pixel_frames
    px_per_s = pixel_frames(plan.num_frames) / wall

    from mmpl_tpu.utils.compile_cache import cache_stats
    cstats = cache_stats()

    log(f"window_measured={window_s_measured:.1f}s (extrap {extrap_window_s:.1f}s)"
        f"  frames/s/chip={frames_per_s:.4f}  achieved~{achieved_tflops:.1f}"
        f" TFLOP/s  pixel-frames/s={px_per_s:.3f}  compile-cache={cstats}")

    result = {
        "metric": "latent_frames_per_sec_per_chip",
        "value": round(frames_per_s, 4),
        "unit": "frames/s",
        "vs_baseline": round(vs, 4),
        "headline_quantize": "int8-auto" if int8_promoted else "bf16",
        "window_s_measured": round(window_s_measured, 2),
        "window_s_extrapolated": round(extrap_window_s, 2),
        "window0_s": round(window0_s, 2),
        "p50_chunk_latency_s": round(p50_chunk, 2),
        "vae_decode_s": None if vae_decode_s is None else round(vae_decode_s,
                                                                2),
        **({} if vae_decode_s is None else
           {"vae_decode_device_s": round(vae_decode_device_s, 2),
            "vae_fetch_s": round(vae_fetch_s, 2)}),
        "pixel_frames_per_sec_per_chip": round(px_per_s, 4),
        "achieved_tflops": round(achieved_tflops, 1),
        "int8_window_s": None if int8_window_s is None
        else round(int8_window_s, 2),
        **({} if int8_window_first_s is None else
           {"int8_window_first_s": round(int8_window_first_s, 2)}),
        "int8_frames_per_s": None if int8_window_s is None
        else round(plan.num_frames / int8_window_s, 4),
        "int8_psnr_db": None if int8_psnr is None else round(int8_psnr, 1),
        "int8_psnr_gate_db": psnr_gate,
        "int8_promoted": int8_promoted,
        "int8_policy": None if not int8_policy else int8_policy.get("policy"),
        "compile_cache": cstats,
        **fewstep,
    }
    print(json.dumps(result))
    if not quick:
        # remembered for the preflight-failure row of a later wedged run;
        # quick (smoke-geometry) runs must not clobber the record — their
        # numbers are not comparable to the headline metric.  Write via
        # temp+rename so a mid-write kill can't leave truncated JSON.
        try:
            os.makedirs("runs", exist_ok=True)
            tmp = "runs/last_good_bench.json.tmp"
            with open(tmp, "w") as f:
                json.dump({"measured_at": time.strftime("%Y-%m-%d %H:%M"),
                           "quick": quick, **result}, f, indent=1)
            os.replace(tmp, "runs/last_good_bench.json")
        except OSError:
            pass


if __name__ == "__main__":
    try:
        main()
    except jax.errors.JaxRuntimeError as e:
        # The tunneled compile helper intermittently drops a response body
        # mid-read ("remote_compile: response body closed before all bytes
        # were read" — twice on 2026-08-20, minutes apart from clean runs).
        # Re-exec the whole process (fresh HBM/compile state; the persistent
        # compile cache makes the retry cheap) at most twice.
        tries = int(os.environ.get("MMPL_BENCH_RETRY", "0"))
        if "remote_compile" in str(e) and tries < 2:
            log(f"transient remote-compile fault: {e}; "
                f"re-exec attempt {tries + 1}/2 in 30s")
            time.sleep(30)
            os.environ["MMPL_BENCH_RETRY"] = str(tries + 1)
            os.execv(sys.executable, [sys.executable] + sys.argv)
        raise
