"""In-model flash block-size A/B at the 50-step FPS window's hot shapes.

Round-5 follow-up to the few-step finding (runs/fewstep_tune_probe.json):
at (4680, 32760) the exact-divisor entry (256, 2520) beat the padded
(512, 2048) fallback by 6.2% — almost exactly the 6.3% of attention work
the 2048-padding wastes (32760 -> 34816).  The 50-step window's anchor
group pads much worse: Lk=14040 -> 16384 with bk=2048 is +16.7% wasted
K work, and 14040's exact divisors (1560/2808/4680) were never tried
(PERF.md r1 sweep note only lists (520, 2600) at the 23400 shape).

This probe times the REAL group forward (fps_forward_group, B=2 batched
CFG, dispatch-amortised 3x3 like tools/perf_ablate.py) per candidate
_BLOCK_TABLE override, for each denoise group, and records every
attention (Lq, Lk) the group actually runs.

Run on chip:  python tools/fps_blocks_probe.py [group_indices...]
Writes runs/fps_blocks_probe.json.  MMPL_PROBE_TINY=1 for a CPU smoke of
the control flow only.
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from mmpl_tpu.core.config import T2V_1_3B
from mmpl_tpu.core.geometry import i2v_plan, t2v_plan
from mmpl_tpu.models import dit, fps_dit
from mmpl_tpu.ops import attention as attn

TINY = os.environ.get("MMPL_PROBE_TINY", "0") == "1"
# TINY smokes must never merge CPU control-flow timings into the on-chip
# record (one did, 2026-08-20 — group0's chip numbers had to be restored
# from the run log).
OUT = ("runs/fps_blocks_probe_tiny.json" if TINY
       else "runs/fps_blocks_probe.json")

#: per-group candidate table overrides; keys are the *steady* self-attn
#: shapes at B=2 CFG (Lq = own frames x 1560, Lk = visible-cache + own).
CANDIDATES = {
    0: {  # context group: recorder says the hot shape is (3120, 3120)
        # (not append-mode).  (256, 3120) WON -9.0% (156.2 vs 171.6 ms,
        # runs/onchip_r5c.log) and is now the table default ("baseline");
        # candidates are deletions/alternatives of the landed entry.
        "baseline": {},
        "pow2_fallback": {(3120, 3120): None},
        "exact1560": {(3120, 3120): (256, 1560)},
    },
    1: {  # anchor group: Lq 10920, Lk 14040 (2048 pads +16.7%)
        "baseline": {},
        "exact2808": {(10920, 14040): (256, 2808)},
        "exact4680": {(10920, 14040): (256, 4680)},
        "exact1560": {(10920, 14040): (256, 1560)},
        "exact2808_bq512": {(10920, 14040): (512, 2808)},
    },
    2: {  # fill group 2: Lq 9360, Lk 20280.  (256, 4056) won -3.8% and
        # is now the table default ("baseline"); bq-520 variant pending.
        "baseline": {},
        # bq520 measured a wash (1040.0 vs 1039.4 ms, runs/onchip_r5c.log)
        "bq520": {(9360, 20280): (520, 4056)},
    },
    3: {  # fill group 3 is APPEND-mode: it gathers all 15 visible slots
        # AND appends its own 6 frames -> the hot shape is (9360, 32760),
        # not (9360, 23400) (fps_dit.py:135-138; the first A/B keyed 23400
        # and measured baseline four times — runs/onchip_r5b.log).
        # 32760's %8 divisors near the sweet spot: 2520 (x13, the few-step
        # winner at Lq=4680), 2184 (x15), 4680 (x7).
        # (256, 2520) won -4.0% (1428.2 ms) and is now the table default
        # ("baseline"); 2184/4680/1560-bq520 lost (1519.8/1464.9/1545.6).
        "baseline": {},
        # bq520 LOST (1437.8 vs 1428.1 ms, runs/onchip_r5c.log)
        "bq520": {(9360, 32760): (520, 2520)},
    },
}

#: MMPL_PROBE_PLAN=i2v probes the i2v 5-group plan instead.  Only its g3
#: runs a shape t2v never does — (9360, 23400), the non-append 6-own /
#: 15-visible fill (this is the shape the first t2v-group3 A/B keyed by
#: mistake; its r1 table entry (256, 2048) was never A/B'd in-model).
I2V_CANDIDATES = {
    3: {
        # (256, 4680) WON -2.7% (1162.1 vs 1194.4 ms, runs/onchip_r5c.log)
        # and is now the table default ("baseline").
        "baseline": {},
        "old_r1_2048": {(9360, 23400): (256, 2048)},
        "exact2600": {(9360, 23400): (256, 2600)},
    },
}


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def setup(cfg, gi, i2v=False):
    plan = i2v_plan() if i2v else t2v_plan()
    B, C, H, W = 2, 16, 60, 104
    if TINY:
        H, W = 8, 8
    S = (H // 2) * (W // 2)
    params = dit.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    ctx = jax.random.normal(jax.random.PRNGKey(1),
                            (B, cfg.text_len, cfg.text_dim), jnp.bfloat16)
    emb = dit.embed_text(params, ctx)
    ctx_kv = dit.precompute_context_kv(params, cfg, emb)
    cache = fps_dit.init_kv_cache(cfg, B, S, dtype=jnp.bfloat16)
    group = plan.groups[gi]
    lat = jax.random.normal(jax.random.PRNGKey(2),
                            (B, group.num_frames, C, H, W), jnp.bfloat16)
    t = jnp.full((B, group.num_frames), 500.0, jnp.float32)
    return cfg, group, params, lat, t, ctx_kv, cache


def timed(cfg, group, params, lat, t, ctx_kv, cache):
    fwd = jax.jit(lambda p, l, tt, ck, ca: fps_dit.fps_forward_group(
        p, cfg, l, tt, ck, ca, group)[0])
    out = fwd(params, lat, t, ctx_kv, cache)   # compile
    sync(out)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(3):
            out = fwd(params, lat, t, ctx_kv, cache)
        sync(out)
        times.append((time.perf_counter() - t0) / 3)
    return float(np.median(times))


def main():
    i2v = os.environ.get("MMPL_PROBE_PLAN", "t2v") == "i2v"
    cand = I2V_CANDIDATES if i2v else CANDIDATES
    gis = [int(a) for a in sys.argv[1:]] or sorted(cand)
    cfg = T2V_1_3B
    if TINY:
        jax.config.update("jax_platforms", "cpu")
        cfg = type(cfg)({**cfg, "dim": 64, "ffn_dim": 128, "num_heads": 2,
                         "num_layers": 2, "text_len": 16, "text_dim": 32})
    print(f"devices: {jax.devices()} groups={gis}", flush=True)

    # record the attention shapes each group really runs
    seen = set()
    orig = attn.flash_attention

    def recorder(q, k, v, *a, **kw):
        seen.add((q.shape[1], k.shape[1]))
        return orig(q, k, v, *a, **kw)

    attn.flash_attention = recorder
    saved = dict(attn._BLOCK_TABLE)
    res = {"date": time.strftime("%Y-%m-%d %H:%M")}
    if os.path.exists(OUT):
        with open(OUT) as f:
            res = {**json.load(f), "date": res["date"]}
    try:
        for gi in gis:
            # drop the previous group's buffers AND compiled executables
            # before allocating the next (group2+group3 in one process
            # OOM'd 16G HBM on leftover executables — runs/onchip_r5b.log)
            args = None
            jax.clear_caches()
            args = setup(cfg, gi, i2v)
            gres = {}
            for name, entries in cand[gi].items():
                attn._BLOCK_TABLE.clear()
                attn._BLOCK_TABLE.update(saved)
                for key, blocks in entries.items():  # None = delete entry
                    if blocks is None:
                        attn._BLOCK_TABLE.pop(key, None)
                    else:
                        attn._BLOCK_TABLE[key] = blocks
                seen.clear()
                ms = timed(*args) * 1e3
                gres[name] = {"step_ms": round(ms, 1),
                              "shapes": sorted(seen)}
                print(f"  {'i2v-' if i2v else ''}group{gi} {name}: "
                      f"{ms:.1f} ms  shapes={sorted(seen)}", flush=True)
            res[f"{'i2v-' if i2v else ''}group{gi}"] = gres
    finally:
        attn.flash_attention = orig
        attn._BLOCK_TABLE.clear()
        attn._BLOCK_TABLE.update(saved)
    os.makedirs("runs", exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(res, f, indent=1)
    print(f"wrote {OUT}", flush=True)


if __name__ == "__main__":
    main()
