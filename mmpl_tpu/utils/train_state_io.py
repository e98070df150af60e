"""Training checkpoint save/restore.

The reference extracts torch-FSDP full state dicts and saves
`{'generator': ..., 'generator_ema': ...}` monoliths
(utils/distributed.py:11-21, Wan_fps_inference_1gpu.py:66-68); the training
driver itself (unreleased upstream) has no resume logic.  Here the full
trainer state — params, optimizer state, EMA shadow, step counter — is one
pytree checkpointed with orbax (sharding-aware, async-capable), plus an
export path to the reference's inference `.pt` layout so trained weights
remain loadable by the torch stack.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def save_checkpoint(path: str, state: Dict[str, Any]) -> None:
    """state: arbitrary pytree (params/opt_state/ema/step)."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()


def restore_checkpoint(path: str,
                       template: Optional[Dict[str, Any]] = None
                       ) -> Dict[str, Any]:
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        # carry the template's shardings: orbax then restores without
        # consulting the checkpoint's _sharding file, which this orbax
        # version writes INCOMPLETELY for some pytrees (observed: q/k
        # bias + q/k norm leaves absent -> NOT_FOUND on restore)
        shapes = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(
                x.shape, x.dtype, sharding=getattr(x, "sharding", None)),
            template)
        return ckptr.restore(path, shapes)
    return ckptr.restore(path)


# ---------------------------------------------------------------------------
# Export to the reference's torch .pt inference format
# ---------------------------------------------------------------------------

def _unstack_blocks(blocks, num_layers):
    return [jax.tree.map(lambda a: np.asarray(a[i]), blocks)
            for i in range(num_layers)]


def export_generator_pt(path: str, params, ema_params, cfg) -> None:
    """Write `{'generator': ..., 'generator_ema': ...}` with `model.`-prefixed
    torch-layout tensors — the t2v_14B_8k.pt format the reference loads
    (Wan_fps_inference_1gpu.py:66-68)."""
    import torch

    def to_sd(p) -> Dict[str, Any]:
        sd = {}

        def lin(name, leaf):
            sd[f"{name}.weight"] = torch.tensor(
                np.asarray(leaf["kernel"], np.float32).T)
            if "bias" in leaf:
                sd[f"{name}.bias"] = torch.tensor(
                    np.asarray(leaf["bias"], np.float32))

        pe = p["patch_embedding"]
        d = cfg.dim
        k = np.asarray(pe["kernel"], np.float32).T.reshape(
            d, cfg.in_dim, *cfg.patch_size)
        sd["patch_embedding.weight"] = torch.tensor(k)
        sd["patch_embedding.bias"] = torch.tensor(
            np.asarray(pe["bias"], np.float32))
        lin("text_embedding.0", p["text_embedding"]["fc1"])
        lin("text_embedding.2", p["text_embedding"]["fc2"])
        lin("time_embedding.0", p["time_embedding"]["fc1"])
        lin("time_embedding.2", p["time_embedding"]["fc2"])
        lin("time_projection.1", p["time_projection"]["fc"])
        for i, bp in enumerate(_unstack_blocks(p["blocks"], cfg.num_layers)):
            pre = f"blocks.{i}"
            for mod in ("self_attn", "cross_attn"):
                for proj in ("q", "k", "v", "o"):
                    lin(f"{pre}.{mod}.{proj}", bp[mod][proj])
                for nm in ("norm_q", "norm_k"):
                    sd[f"{pre}.{mod}.{nm}.weight"] = torch.tensor(
                        np.asarray(bp[mod][nm]["weight"], np.float32))
            if "norm3" in bp:
                sd[f"{pre}.norm3.weight"] = torch.tensor(
                    np.asarray(bp["norm3"]["weight"], np.float32))
                sd[f"{pre}.norm3.bias"] = torch.tensor(
                    np.asarray(bp["norm3"]["bias"], np.float32))
            lin(f"{pre}.ffn.0", bp["ffn"]["fc1"])
            lin(f"{pre}.ffn.2", bp["ffn"]["fc2"])
            sd[f"{pre}.modulation"] = torch.tensor(
                np.asarray(bp["modulation"], np.float32))
        lin("head.head", p["head"]["head"])
        sd["head.modulation"] = torch.tensor(
            np.asarray(p["head"]["modulation"], np.float32))
        return {f"model.{k}": v for k, v in sd.items()}

    blob = {"generator": to_sd(params)}
    if ema_params is not None:
        blob["generator_ema"] = to_sd(ema_params)
    torch.save(blob, path)
