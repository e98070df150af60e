"""Real-checkpoint parity harness (runs when Wan weights are available).

This image ships no Wan checkpoints, so output parity (the BASELINE.json
PSNR >= 40 dB target) is validated today only at code level
(tests/test_reference_parity.py: our model vs the reference torch model
with identical SYNTHETIC weights, <2e-3 at real geometry).  This tool
closes the remaining gap the moment real weights exist:

  python tools/parity_real_weights.py \
      --wan-dir /path/to/Wan2.1-T2V-1.3B \
      --checkpoint /path/to/t2v_1.3B.pt [--ema] [--hw 60 104]

It loads the SAME weights into the reference's torch CausalFPSWanModel
(imported straight from /root/reference with the diffusers stub) and into
our fps_dit pytree, runs the context + anchor groups on identical inputs
(mirroring tests/test_reference_parity.py), and reports max-abs-err + PSNR
of the flow predictions.
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    peak = float(np.abs(b).max())
    return 10.0 * np.log10(peak * peak / mse)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--wan-dir", required=True,
                    help="diffusers-style Wan model directory")
    ap.add_argument("--checkpoint", default=None,
                    help="MMPL fine-tune .pt ({'generator': ...})")
    ap.add_argument("--ema", action="store_true")
    ap.add_argument("--model", default="t2v-1.3B",
                    choices=["t2v-1.3B", "t2v-14B"])
    ap.add_argument("--hw", type=int, nargs=2, default=(60, 104))
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import torch
    import jax
    jax.config.update("jax_platforms", "cpu")   # fp32 parity on host
    import jax.numpy as jnp

    from test_reference_parity import (_install_diffusers_stub,
                                       _load_ref_module)
    import types
    _install_diffusers_stub()
    REF = "/root/reference/MMPL_t2v"
    for pkg in ("wan", "wan.modules"):
        if pkg not in sys.modules:
            m = types.ModuleType(pkg)
            m.__path__ = []
            sys.modules[pkg] = m
    _load_ref_module("wan.modules.attention", f"{REF}/wan/modules/attention.py")
    _load_ref_module("wan.modules.model", f"{REF}/wan/modules/model.py")
    ref_fps = _load_ref_module("wan.modules.causal_fps_model",
                               f"{REF}/wan/modules/causal_fps_model.py")

    from mmpl_tpu.core.config import T2V_1_3B, T2V_14B
    from mmpl_tpu.core.geometry import t2v_plan
    from mmpl_tpu.models import dit as dit_mod
    from mmpl_tpu.models.fps_dit import fps_forward_group, init_kv_cache
    from mmpl_tpu.utils import checkpoint as ckpt

    cfg = T2V_1_3B if args.model == "t2v-1.3B" else T2V_14B

    # ---- our side: load weights -----------------------------------------
    params = ckpt.load_wan_dit(args.wan_dir, cfg, dtype=np.float32)
    if args.checkpoint:
        params = ckpt.load_mmpl_generator(args.checkpoint, cfg,
                                          use_ema=args.ema,
                                          dtype=np.float32)

    # ---- reference side: same weights into the torch model --------------
    tmodel = ref_fps.CausalFPSWanModel(
        model_type="t2v", patch_size=(1, 2, 2), text_len=cfg.text_len,
        in_dim=cfg.in_dim, dim=cfg.dim, ffn_dim=cfg.ffn_dim,
        freq_dim=cfg.freq_dim, text_dim=cfg.text_dim, out_dim=cfg.out_dim,
        num_heads=cfg.num_heads, num_layers=cfg.num_layers).float().eval()
    if args.checkpoint:
        sd = ckpt.load_torch_state_dict(args.checkpoint)
        key = "generator_ema" if args.ema else "generator"
        sd = sd.get(key, sd)
        sd = ckpt.strip_prefix(sd, "model.")
    else:
        sd = ckpt.load_torch_state_dict(args.wan_dir)
    missing, unexpected = tmodel.load_state_dict(
        {k: torch.tensor(np.asarray(v)) for k, v in sd.items()},
        strict=False)
    print(f"torch load: missing={len(missing)} unexpected={len(unexpected)}",
          file=sys.stderr)

    # ---- identical inputs, groups 0 (context) + 1 (anchors) -------------
    # mirrors tests/test_reference_parity.py::test_fps_inference_parity
    import torch as _t
    plan = t2v_plan()
    H, W = args.hw
    S = (H // 2) * (W // 2)
    n, d = cfg.num_heads, cfg.dim // cfg.num_heads
    rng = np.random.default_rng(args.seed)
    ctx_np = rng.standard_normal((1, cfg.text_len,
                                  cfg.text_dim)).astype(np.float32)

    emb = dit_mod.embed_text(params, jnp.asarray(ctx_np))
    ctx_kv = dit_mod.precompute_context_kv(params, cfg, emb)
    cache = init_kv_cache(cfg, 1, S, dtype=jnp.float32)

    tcache = [{"k": _t.zeros(1, 15 * S, n, d),
               "v": _t.zeros(1, 15 * S, n, d),
               "global_end_index": _t.tensor([0]),
               "local_end_index": _t.tensor([0]),
               "attention_vis_index": []} for _ in range(cfg.num_layers)]
    tcross = [{"k": _t.zeros(1, cfg.text_len, n, d),
               "v": _t.zeros(1, cfg.text_len, n, d), "is_init": False}
              for _ in range(cfg.num_layers)]

    for gi in (0, 1):
        group = plan.groups[gi]
        G = group.num_frames
        lat = rng.standard_normal((1, G, cfg.in_dim, H, W)).astype(
            np.float32) * 0.7
        t_val = [0.0, 500.0][gi]
        with _t.no_grad():
            tflow = tmodel(
                _t.tensor(lat).permute(0, 2, 1, 3, 4),
                t=_t.full((1, G), t_val),
                context=[_t.tensor(ctx_np[0])], seq_len=21 * S,
                kv_cache=tcache, crossattn_cache=tcross,
                current_start=[f * S for f in group.frames],
                cache_start=[f * S for f in group.frames],
            ).permute(0, 2, 1, 3, 4).numpy()
        flow, cache = fps_forward_group(
            params, cfg, jnp.asarray(lat), jnp.full((1, G), t_val),
            ctx_kv, cache, group)
        ours = np.asarray(flow)
        err = float(np.abs(ours - tflow).max())
        print(f"group{gi} flow: max_abs_err={err:.3e} "
              f"psnr={psnr(ours, tflow):.2f} dB "
              f"(target >= 40 dB, BASELINE.json)")


if __name__ == "__main__":
    main()
