"""Checkpoint ingestion: torch `.pt`/`.pth`/diffusers-safetensors -> pytrees.

The bit-compatible surfaces (BASELINE.md): base Wan weights live in a
diffusers directory (safetensors shards + config.json) loaded via
`from_pretrained` (utils/wan_wrapper.py:128-133,329), T5/VAE/CLIP as raw
`.pth` state dicts (wan_wrapper.py:25-31,69-72), and MMPL fine-tunes as a
monolithic `.pt` with `{'generator': ..., 'generator_ema': ...}` whose keys
are prefixed `model.` (Wan_fps_inference_1gpu.py:66-68).

torch (CPU build) is used only at load time to deserialise; everything is
converted to numpy and mapped onto the mmpl_tpu parameter pytrees.  Weight
layout conversions:
  * torch Linear weight [out, in] -> kernel [in, out]
  * torch Conv3d weight [out, in, kt, kh, kw] -> kernel [kt, kh, kw, in, out]
  * torch Conv2d weight [out, in, kh, kw] -> kernel [kh, kw, in, out]
  * Conv3d patch embedding (stride == kernel) -> matrix
    [(in*kt*kh*kw), out] with feature order (c, dt, dh, dw)
"""

from __future__ import annotations

import json
import os
import struct
from typing import Any, Dict

import numpy as np

from ..models.vae import decoder_specs, encoder_specs

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Raw tensor loading
# ---------------------------------------------------------------------------

_SAFETENSORS_DTYPES = {
    "F64": np.float64, "F32": np.float32, "F16": np.float16,
    "I64": np.int64, "I32": np.int32, "I16": np.int16, "I8": np.int8,
    "U8": np.uint8, "BOOL": np.bool_,
}


def _load_safetensors(path: str) -> Dict[str, np.ndarray]:
    """Minimal safetensors reader (header json + raw buffers); bf16 aware."""
    out = {}
    with open(path, "rb") as f:
        (hlen,) = struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(hlen))
        base = 8 + hlen
        data = np.memmap(path, dtype=np.uint8, mode="r", offset=base)
        for name, info in header.items():
            if name == "__metadata__":
                continue
            s, e = info["data_offsets"]
            buf = np.asarray(data[s:e])
            if info["dtype"] == "BF16":
                u16 = buf.view(np.uint16).astype(np.uint32) << 16
                arr = u16.view(np.float32)
            else:
                arr = buf.view(_SAFETENSORS_DTYPES[info["dtype"]])
            out[name] = arr.reshape(info["shape"]).copy()
    return out


def _to_numpy(t) -> np.ndarray:
    import torch
    t = t.detach().cpu()
    if t.dtype == torch.bfloat16:
        return t.float().numpy()
    return t.numpy()


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .pt/.pth (or a diffusers dir) into numpy arrays."""
    if os.path.isdir(path):
        tensors: Dict[str, np.ndarray] = {}
        for fn in sorted(os.listdir(path)):
            if fn.endswith(".safetensors"):
                tensors.update(_load_safetensors(os.path.join(path, fn)))
        if tensors:
            return tensors
        for fn in ("diffusion_pytorch_model.bin", "pytorch_model.bin"):
            p = os.path.join(path, fn)
            if os.path.exists(p):
                path = p
                break
    if path.endswith(".safetensors"):
        return _load_safetensors(path)
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: _to_numpy(v) for k, v in sd.items()
            if hasattr(v, "detach")}


def strip_prefix(sd: Dict[str, np.ndarray],
                 prefix: str) -> Dict[str, np.ndarray]:
    return {k[len(prefix):] if k.startswith(prefix) else k: v
            for k, v in sd.items()}


# ---------------------------------------------------------------------------
# Name-mapping helpers
# ---------------------------------------------------------------------------

def _lin(sd, name, dtype) -> Params:
    p = {"kernel": sd[f"{name}.weight"].T.astype(dtype)}
    if f"{name}.bias" in sd:
        p["bias"] = sd[f"{name}.bias"].astype(dtype)
    return p


def _conv3d_p(sd, name, dtype) -> Params:
    return {"kernel": sd[f"{name}.weight"].transpose(2, 3, 4, 1, 0).astype(
        dtype), "bias": sd[f"{name}.bias"].astype(dtype)}


def _conv2d_p(sd, name, dtype) -> Params:
    return {"kernel": sd[f"{name}.weight"].transpose(2, 3, 1, 0).astype(
        dtype), "bias": sd[f"{name}.bias"].astype(dtype)}


def _norm_w(sd, name, dtype) -> Params:
    return {"weight": sd[f"{name}.weight"].astype(dtype)}


def _norm_wb(sd, name, dtype) -> Params:
    return {"weight": sd[f"{name}.weight"].astype(dtype),
            "bias": sd[f"{name}.bias"].astype(dtype)}


def _gamma(sd, name, dtype) -> Params:
    return {"gamma": sd[f"{name}.gamma"].reshape(-1).astype(dtype)}


# ---------------------------------------------------------------------------
# DiT (WanModel / CausalWanModel / CausalFPSWanModel — same weight names)
# ---------------------------------------------------------------------------

def convert_dit(sd: Dict[str, np.ndarray], cfg,
                dtype=np.float32) -> Params:
    """torch WanModel state dict -> mmpl_tpu DiT pytree (blocks stacked)."""
    import jax.numpy as jnp

    d = cfg.dim
    pe_w = sd["patch_embedding.weight"]           # [D, Cin, pt, ph, pw]
    pe = {
        "kernel": pe_w.reshape(d, -1).T.astype(dtype),
        "bias": sd["patch_embedding.bias"].astype(dtype),
    }

    def block(i: int) -> Params:
        pre = f"blocks.{i}"
        p = {
            "self_attn": {
                "q": _lin(sd, f"{pre}.self_attn.q", dtype),
                "k": _lin(sd, f"{pre}.self_attn.k", dtype),
                "v": _lin(sd, f"{pre}.self_attn.v", dtype),
                "o": _lin(sd, f"{pre}.self_attn.o", dtype),
                "norm_q": _norm_w(sd, f"{pre}.self_attn.norm_q", dtype),
                "norm_k": _norm_w(sd, f"{pre}.self_attn.norm_k", dtype),
            },
            "cross_attn": {
                "q": _lin(sd, f"{pre}.cross_attn.q", dtype),
                "k": _lin(sd, f"{pre}.cross_attn.k", dtype),
                "v": _lin(sd, f"{pre}.cross_attn.v", dtype),
                "o": _lin(sd, f"{pre}.cross_attn.o", dtype),
                "norm_q": _norm_w(sd, f"{pre}.cross_attn.norm_q", dtype),
                "norm_k": _norm_w(sd, f"{pre}.cross_attn.norm_k", dtype),
            },
            "ffn": {"fc1": _lin(sd, f"{pre}.ffn.0", dtype),
                    "fc2": _lin(sd, f"{pre}.ffn.2", dtype)},
            "modulation": sd[f"{pre}.modulation"].astype(dtype),
        }
        if cfg.cross_attn_norm:
            p["norm3"] = _norm_wb(sd, f"{pre}.norm3", dtype)
        if cfg.model_type == "i2v":
            p["cross_attn"]["k_img"] = _lin(sd, f"{pre}.cross_attn.k_img",
                                            dtype)
            p["cross_attn"]["v_img"] = _lin(sd, f"{pre}.cross_attn.v_img",
                                            dtype)
            p["cross_attn"]["norm_k_img"] = _norm_w(
                sd, f"{pre}.cross_attn.norm_k_img", dtype)
        return p

    import jax
    blocks = [block(i) for i in range(cfg.num_layers)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(
        [jnp.asarray(x) for x in xs]), *blocks)

    params: Params = {
        "patch_embedding": pe,
        "text_embedding": {"fc1": _lin(sd, "text_embedding.0", dtype),
                           "fc2": _lin(sd, "text_embedding.2", dtype)},
        "time_embedding": {"fc1": _lin(sd, "time_embedding.0", dtype),
                           "fc2": _lin(sd, "time_embedding.2", dtype)},
        "time_projection": {"fc": _lin(sd, "time_projection.1", dtype)},
        "blocks": stacked,
        "head": {"head": _lin(sd, "head.head", dtype),
                 "modulation": sd["head.modulation"].astype(dtype)},
    }
    if cfg.model_type == "i2v":
        params["img_emb"] = {
            "norm1": _norm_wb(sd, "img_emb.proj.0", dtype),
            "fc1": _lin(sd, "img_emb.proj.1", dtype),
            "fc2": _lin(sd, "img_emb.proj.3", dtype),
            "norm2": _norm_wb(sd, "img_emb.proj.4", dtype),
        }
    return jax.tree.map(jnp.asarray, params)


def load_wan_dit(path: str, cfg, dtype=np.float32) -> Params:
    """Load base Wan weights from a diffusers dir / state-dict file."""
    return convert_dit(load_torch_state_dict(path), cfg, dtype)


def load_mmpl_generator(path: str, cfg, use_ema: bool = False,
                        dtype=np.float32) -> Params:
    """Load an MMPL fine-tune (`t2v_14B_8k.pt`-style) generator."""
    import torch
    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob["generator_ema" if use_ema else "generator"]
    sd = {k: _to_numpy(v) for k, v in sd.items()}
    sd = strip_prefix(sd, "model.")
    return convert_dit(sd, cfg, dtype)


# ---------------------------------------------------------------------------
# T5
# ---------------------------------------------------------------------------

def convert_t5(sd: Dict[str, np.ndarray], cfg: dict,
               dtype=np.float32) -> Params:
    import jax
    import jax.numpy as jnp

    def block(i):
        pre = f"blocks.{i}"
        return {
            "norm1": _norm_w(sd, f"{pre}.norm1", dtype),
            "attn": {k: sd[f"{pre}.attn.{k}.weight"].T.astype(dtype)
                     for k in ("q", "k", "v", "o")},
            "norm2": _norm_w(sd, f"{pre}.norm2", dtype),
            "ffn": {"gate": sd[f"{pre}.ffn.gate.0.weight"].T.astype(dtype),
                    "fc1": sd[f"{pre}.ffn.fc1.weight"].T.astype(dtype),
                    "fc2": sd[f"{pre}.ffn.fc2.weight"].T.astype(dtype)},
            "pos_embedding": sd[
                f"{pre}.pos_embedding.embedding.weight"].astype(dtype),
        }

    blocks = [block(i) for i in range(cfg["num_layers"])]
    return jax.tree.map(jnp.asarray, {
        "token_embedding": sd["token_embedding.weight"].astype(dtype),
        "blocks": jax.tree.map(lambda *xs: np.stack(xs), *blocks),
        "norm": _norm_w(sd, "norm", dtype),
    })


def load_t5(path: str, cfg: dict, dtype=np.float32) -> Params:
    return convert_t5(load_torch_state_dict(path), cfg, dtype)


# ---------------------------------------------------------------------------
# VAE
# ---------------------------------------------------------------------------

def _res_p(sd, pre, dtype) -> Params:
    p = {"norm1": _gamma(sd, f"{pre}.residual.0", dtype),
         "conv1": _conv3d_p(sd, f"{pre}.residual.2", dtype),
         "norm2": _gamma(sd, f"{pre}.residual.3", dtype),
         "conv2": _conv3d_p(sd, f"{pre}.residual.6", dtype)}
    if f"{pre}.shortcut.weight" in sd:
        p["shortcut"] = _conv3d_p(sd, f"{pre}.shortcut", dtype)
    return p


def _attn_p(sd, pre, dtype) -> Params:
    return {"norm": _gamma(sd, f"{pre}.norm", dtype),
            "to_qkv": _conv2d_p(sd, f"{pre}.to_qkv", dtype),
            "proj": _conv2d_p(sd, f"{pre}.proj", dtype)}


def _resample_p(sd, pre, kind, dtype) -> Params:
    p = {"resample": _conv2d_p(sd, f"{pre}.resample.1", dtype)}
    if kind in ("downsample3d", "upsample3d"):
        p["time_conv"] = _conv3d_p(sd, f"{pre}.time_conv", dtype)
    return p


def convert_vae(sd: Dict[str, np.ndarray], dtype=np.float32) -> Params:
    import jax
    import jax.numpy as jnp

    def seq(prefix, specs):
        out = []
        for i, (kind, *_dims) in enumerate(specs):
            pre = f"{prefix}.{i}"
            if kind == "res":
                out.append(_res_p(sd, pre, dtype))
            elif kind == "attn":
                out.append(_attn_p(sd, pre, dtype))
            else:
                out.append(_resample_p(sd, pre, kind, dtype))
        return out

    params = {
        "encoder": {
            "conv1": _conv3d_p(sd, "encoder.conv1", dtype),
            "down": seq("encoder.downsamples", encoder_specs()),
            "middle": [_res_p(sd, "encoder.middle.0", dtype),
                       _attn_p(sd, "encoder.middle.1", dtype),
                       _res_p(sd, "encoder.middle.2", dtype)],
            "head_norm": _gamma(sd, "encoder.head.0", dtype),
            "head_conv": _conv3d_p(sd, "encoder.head.2", dtype),
        },
        "conv1": _conv3d_p(sd, "conv1", dtype),
        "conv2": _conv3d_p(sd, "conv2", dtype),
        "decoder": {
            "conv1": _conv3d_p(sd, "decoder.conv1", dtype),
            "middle": [_res_p(sd, "decoder.middle.0", dtype),
                       _attn_p(sd, "decoder.middle.1", dtype),
                       _res_p(sd, "decoder.middle.2", dtype)],
            "up": seq("decoder.upsamples", decoder_specs()),
            "head_norm": _gamma(sd, "decoder.head.0", dtype),
            "head_conv": _conv3d_p(sd, "decoder.head.2", dtype),
        },
    }
    return jax.tree.map(
        lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x, params)


def load_vae(path: str, dtype=np.float32) -> Params:
    return convert_vae(load_torch_state_dict(path), dtype)
