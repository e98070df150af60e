"""Few-step pipeline round-5 tuning probes (on-chip).

Three questions left open by the r4 measurements of the production-latency
path (reference pipeline/causal_inference.py:47-276; our
pipelines/causal_inference.py):

  phases  — what the "Initialization/caching" profile phase actually spends
            (PERF.md r4 reports 40.7% of a profiled window; ctx-KV + cache
            alloc should be ~ms, so either the report double-counts or an
            allocation/dispatch stall hides there).  Times ctx_kv, cache
            creation and the first block dispatch with independent syncs.
  blocks  — IN-MODEL A/B of flash block sizes at the few-step shapes.  The
            standalone sweep (runs/fewstep_attn_probe.json) says
            (4680, 32760) -> (256, 2520) beats the (512, 2048) fallback by
            ~8%; the r2 lesson says standalone wins can invert in-model
            (dispatch artifacts), so this runs the real pipeline with and
            without the candidate _BLOCK_TABLE entries and compares steady
            p50.
  batch   — B=2 few-step feasibility: the few-step path has NO CFG pair, so
            two video streams per chip only need 2x cache (int8 cache
            halves it back).  If it fits, serving throughput ~doubles.
            (The 50-step window's B=2 measured NOT to fit, batch2_probe.)

Run: python tools/fewstep_tune_probe.py [phases|blocks|batch|all] [frames]
Writes runs/fewstep_tune_probe.json (merging previous sections).
"""
import gc
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from mmpl_tpu.core.config import T2V_1_3B
from mmpl_tpu.models import dit
from mmpl_tpu.pipelines.causal_inference import CausalInferencePipeline
from mmpl_tpu.utils.compile_cache import enable_compilation_cache

OUT = "runs/fewstep_tune_probe.json"
# MMPL_PROBE_TINY=1: CPU smoke of the probe logic (tiny model + latents);
# numbers are meaningless, only the control flow is exercised.
TINY = os.environ.get("MMPL_PROBE_TINY", "0") == "1"


def sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]
                         .astype(jnp.float32)))


def _make_pipe(cfg, B=1, quantize=None, quantize_cache=False):
    params = dit.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    pipe = CausalInferencePipeline(
        cfg, params, denoising_step_list=(1000, 750, 500, 250),
        num_frame_per_block=3, max_attention_frames=21,
        quantize=quantize, quantize_cache=quantize_cache,
        dtype=jnp.bfloat16)
    del params
    return pipe


def _inputs(cfg, B, F, C=16, H=60, W=104):
    if TINY:
        H, W = 8, 8
    noise = jax.random.normal(jax.random.PRNGKey(30), (B, F, C, H, W),
                              jnp.float32)
    cond = jax.random.normal(jax.random.PRNGKey(31),
                             (B, cfg.text_len, cfg.text_dim), jnp.float32)
    return noise, cond


def probe_phases(cfg, F):
    """Break the init/caching phase into synced sub-steps, warm."""
    pipe = _make_pipe(cfg)
    noise, cond = _inputs(cfg, 1, F)
    out = pipe.inference(noise, cond, rng=jax.random.PRNGKey(0))
    sync(out)                               # warm: all programs compiled

    res = {}
    # (a) everything synced individually, nothing else in flight
    t0 = time.perf_counter()
    ctx = pipe._context_kv(cond)
    res["ctx_kv_dispatch_s"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    sync(ctx)
    res["ctx_kv_sync_s"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    cache = pipe._make_cache(1, 16 if TINY else 60 * 104 // 4, 21)
    res["make_cache_dispatch_s"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    sync(cache["k"])
    res["make_cache_sync_s"] = time.perf_counter() - t0
    del ctx, cache
    # (b) the init phase as the profiled pass sees it: run a full window
    # unprofiled (async chain, sync only the output), then immediately a
    # profiled one — if the phase report shows seconds here while (a)
    # shows ms, the cost is inherited in-flight work / allocation stalls.
    out = pipe.inference(noise, cond, rng=jax.random.PRNGKey(1))
    sync(out)
    out = pipe.inference(noise, cond, rng=jax.random.PRNGKey(2),
                         profile=True)
    sync(out)
    res["profiled_phases"] = {k: round(v, 3)
                              for k, v in pipe.last_profile.phases.items()}
    res["profiled_blocks_s"] = [round(b, 3) for b in pipe.last_profile.blocks]
    # (c) profiled pass from a COLD queue (gc + sync barrier first)
    del out
    gc.collect()
    sync(pipe.params["head"]["head"]["kernel"])
    out = pipe.inference(noise, cond, rng=jax.random.PRNGKey(3),
                         profile=True)
    sync(out)
    res["profiled_phases_cold_queue"] = {
        k: round(v, 3) for k, v in pipe.last_profile.phases.items()}
    del pipe, out
    gc.collect()
    for k, v in res.items():
        print(f"  {k}: {v}", flush=True)
    return res


def probe_blocks(cfg, F):
    """In-model A/B: candidate _BLOCK_TABLE entries for few-step shapes."""
    from mmpl_tpu.ops import attention as attn
    noise, cond = _inputs(cfg, 1, F)
    # ALL few-step winners are in _BLOCK_TABLE now ("baseline"); the
    # other candidates DELETE entries (None) to reproduce the earlier
    # configurations for regression reference — don't re-list the winning
    # values here or a rerun compares identical configs.
    fewstep_keys = ((4680, 32760), (4680, 18720),
                    (4680, 23400), (4680, 28080))
    candidates = {
        "baseline": {},
        "no_warmup_entries": {k: None for k in fewstep_keys[1:]},
        "pre_r5_pow2": {k: None for k in fewstep_keys},
    }
    saved = dict(attn._BLOCK_TABLE)
    res = {}
    try:
        for name, entries in candidates.items():
            attn._BLOCK_TABLE.clear()
            attn._BLOCK_TABLE.update(saved)
            for key, val in entries.items():
                if val is None:
                    attn._BLOCK_TABLE.pop(key, None)
                else:
                    attn._BLOCK_TABLE[key] = val
            pipe = _make_pipe(cfg)
            out = pipe.inference(noise, cond, rng=jax.random.PRNGKey(0))
            sync(out)                       # compile
            t0 = time.perf_counter()
            out = pipe.inference(noise, cond, rng=jax.random.PRNGKey(1))
            sync(out)
            window_s = time.perf_counter() - t0
            out = pipe.inference(noise, cond, rng=jax.random.PRNGKey(2),
                                 profile=True)
            sync(out)
            blocks = list(pipe.last_profile.blocks)
            # steady state begins once the ring cache is full (cap frames
            # = 21); before that the growing-cache warmup shapes run
            nwarm = min(len(blocks) - 1, 21 // 3)
            res[name] = {
                "window_s": round(window_s, 2),
                "p50_steady_s": round(float(np.median(blocks[nwarm:])), 3),
                "p50_warmup_s": round(float(np.median(blocks[:nwarm])), 3)
                if nwarm else None,
            }
            print(f"  {name}: {res[name]}", flush=True)
            del pipe, out
            gc.collect()
    finally:
        attn._BLOCK_TABLE.clear()
        attn._BLOCK_TABLE.update(saved)
    return res


def probe_batch(cfg, F):
    """B=2 few-step feasibility/throughput (int8-auto + int8 cache first —
    the config most likely to fit; bf16 cache second if HBM allows)."""
    res = {}
    for name, kw in [("int8auto_int8cache",
                      dict(quantize="auto", quantize_cache=True)),
                     ("int8auto_bf16cache", dict(quantize="auto")),
                     ("bf16_int8cache", dict(quantize_cache=True))]:
        try:
            pipe = _make_pipe(cfg, B=2, **kw)
            noise, cond = _inputs(cfg, 2, F)
            t0 = time.perf_counter()
            out = pipe.inference(noise, cond, rng=jax.random.PRNGKey(0))
            sync(out)
            w0 = time.perf_counter() - t0
            t0 = time.perf_counter()
            out = pipe.inference(noise, cond, rng=jax.random.PRNGKey(1))
            sync(out)
            window_s = time.perf_counter() - t0
            res[name] = {
                "fits": True, "window0_s": round(w0, 1),
                "window_s": round(window_s, 2),
                # 2 streams: frames/s/chip counts BOTH videos
                "stream_frames_per_s_per_chip": round(2 * F / window_s, 3),
            }
            del pipe, out
            gc.collect()
        except Exception as e:  # noqa: BLE001 — record OOMs as data
            res[name] = {"fits": False, "error": str(e)[:300]}
            gc.collect()
        print(f"  B=2 {name}: {res[name]}", flush=True)
        if res[name].get("fits"):
            break                          # first fitting config is enough
    return res


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    F = int(sys.argv[2]) if len(sys.argv) > 2 else 33
    enable_compilation_cache()
    cfg = T2V_1_3B
    if TINY:
        jax.config.update("jax_platforms", "cpu")
        cfg = type(cfg)({**cfg, "dim": 64, "ffn_dim": 128, "num_heads": 2,
                         "num_layers": 2, "text_len": 16, "text_dim": 32})
    print(f"devices: {jax.devices()}  mode={mode} F={F}", flush=True)
    data = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            data = json.load(f)
    data["date"] = time.strftime("%Y-%m-%d %H:%M")
    if mode in ("phases", "all"):
        print("== phases ==", flush=True)
        data["phases"] = probe_phases(cfg, F)
    if mode in ("blocks", "all"):
        print("== blocks ==", flush=True)
        data["blocks"] = probe_blocks(cfg, F)
    if mode in ("batch", "all"):
        print("== batch ==", flush=True)
        data["batch"] = probe_batch(cfg, F)
    os.makedirs("runs", exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(data, f, indent=1)
    print(f"wrote {OUT}", flush=True)


if __name__ == "__main__":
    main()
