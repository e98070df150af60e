"""CLIP ViT-H/14 visual encoder (XLM-Roberta-CLIP) for i2v conditioning.

Re-design of `MMPL_t2v/wan/modules/clip.py`.  The i2v pipeline consumes only
`CLIPModel.visual(videos)` — the vision tower run through 31 of its 32
blocks (`use_31_block=True`, clip.py:279-300,537-542), producing [B, 257,
1280] image tokens that `MLPProj` maps into DiT cross-attention context
(model.py:469-481).  So the vision tower is implemented fully (conv patch
embed, cls token, learned positions, pre-norm, GELU MLP blocks under
lax.scan); the unused text tower is omitted from the compute path and its
weights are simply ignored by the loader.

ViT-H/14 config (clip.py:471-498): image 224, patch 14, dim 1280,
mlp_ratio 4, 16 heads, 32 layers, activation 'gelu', pre_norm.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from .dit import layer_norm, linear
from ..ops.attention import attention

Params = Dict[str, Any]

VIT_H_14 = dict(image_size=224, patch_size=14, dim=1280, mlp_ratio=4,
                num_heads=16, num_layers=32)

#: OpenCLIP normalisation constants
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def init_clip_visual_params(key, cfg: dict = VIT_H_14,
                            dtype=jnp.float32) -> Params:
    d = cfg["dim"]
    mid = int(d * cfg["mlp_ratio"])
    np_tok = (cfg["image_size"] // cfg["patch_size"]) ** 2
    gain = 1.0 / math.sqrt(d)
    ks = jax.random.split(key, 8)

    def lin(k, din, dout):
        a = 1.0 / math.sqrt(din)
        k1, k2 = jax.random.split(k)
        return {"kernel": jax.random.uniform(k1, (din, dout), jnp.float32,
                                             -a, a).astype(dtype),
                "bias": jnp.zeros((dout,), dtype)}

    def block(k):
        kk = jax.random.split(k, 4)
        return {
            "norm1": {"weight": jnp.ones((d,), dtype),
                      "bias": jnp.zeros((d,), dtype)},
            "attn": {"to_qkv": lin(kk[0], d, 3 * d),
                     "proj": lin(kk[1], d, d)},
            "norm2": {"weight": jnp.ones((d,), dtype),
                      "bias": jnp.zeros((d,), dtype)},
            "mlp": {"fc1": lin(kk[2], d, mid), "fc2": lin(kk[3], mid, d)},
        }

    blocks = [block(k) for k in jax.random.split(ks[0], cfg["num_layers"])]
    return {
        # pre_norm=True -> conv has no bias (clip.py:248-253)
        "patch_embedding": {
            "kernel": (jax.random.normal(
                ks[1], (cfg["patch_size"], cfg["patch_size"], 3, d),
                jnp.float32) * gain).astype(dtype)},
        "cls_embedding": (jax.random.normal(ks[2], (1, 1, d), jnp.float32)
                          * gain).astype(dtype),
        "pos_embedding": (jax.random.normal(ks[3], (1, np_tok + 1, d),
                                            jnp.float32) * gain).astype(dtype),
        "pre_norm": {"weight": jnp.ones((d,), dtype),
                     "bias": jnp.zeros((d,), dtype)},
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
    }


def clip_visual_forward(params: Params, images: jnp.ndarray,
                        cfg: dict = VIT_H_14,
                        use_31_block: bool = True) -> jnp.ndarray:
    """images [B, 3, H, W] (CLIP-normalised) -> tokens [B, 257, dim].

    Matches VisionTransformer.forward with use_31_block (clip.py:279-300).
    """
    B = images.shape[0]
    d = cfg["dim"]
    n = cfg["num_heads"]
    p = cfg["patch_size"]
    x = images.transpose(0, 2, 3, 1)
    y = jax.lax.conv_general_dilated(
        x, params["patch_embedding"]["kernel"].astype(x.dtype),
        window_strides=(p, p), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # flatten(2).permute matches row-major token order
    x = y.reshape(B, -1, d)
    cls = jnp.broadcast_to(params["cls_embedding"].astype(x.dtype),
                           (B, 1, d))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embedding"].astype(x.dtype)
    x = layer_norm(x, 1e-5, params["pre_norm"]["weight"],
                   params["pre_norm"]["bias"])

    num_layers = cfg["num_layers"] - (1 if use_31_block else 0)

    def block_fwd(x, bp):
        h = layer_norm(x, 1e-5, bp["norm1"]["weight"], bp["norm1"]["bias"])
        qkv = linear(bp["attn"]["to_qkv"], h)
        L = h.shape[1]
        q, k, v = [t.squeeze(2) for t in jnp.split(
            qkv.reshape(B, L, 3, n, d // n), 3, axis=2)]
        att = attention(q, k, v).reshape(B, L, d)
        x = x + linear(bp["attn"]["proj"], att)
        h = layer_norm(x, 1e-5, bp["norm2"]["weight"], bp["norm2"]["bias"])
        h = linear(bp["mlp"]["fc2"],
                   jax.nn.gelu(linear(bp["mlp"]["fc1"], h),
                               approximate=False))
        return x + h, None

    trunk = jax.tree.map(lambda a: a[:num_layers], params["blocks"])
    x, _ = jax.lax.scan(block_fwd, x, trunk)
    return x


def preprocess_image(image: jnp.ndarray, image_size: int = 224) -> jnp.ndarray:
    """[B, 3, H, W] in [-1, 1] -> CLIP-normalised [B, 3, 224, 224].

    Mirrors CLIPModel.visual's bicubic resize + normalise (clip.py:525-542).
    """
    B, C, H, W = image.shape
    x = image * 0.5 + 0.5
    x = jax.image.resize(x, (B, C, image_size, image_size), method="cubic")
    mean = jnp.asarray(CLIP_MEAN).reshape(1, 3, 1, 1)
    std = jnp.asarray(CLIP_STD).reshape(1, 3, 1, 1)
    return (x - mean) / std


def xlm_roberta_clip_forward(params: Params, imgs: jnp.ndarray,
                             txt_ids: jnp.ndarray,
                             vis_cfg: dict = VIT_H_14,
                             text_cfg: dict = None):
    """Full XLMRobertaCLIP forward (clip.py:406-416): CLIP-normalised
    images + CLIPTokenizer ids -> (visual tokens [B, 257, 1280], text
    embedding [B, embed_dim]).  Like the reference, the visual branch
    returns the full-depth transformer tokens (no pooling head applied —
    clip.py:279-300 `use_31_block=False` path).

    params: {"visual", "textual", "head", "log_scale"} as produced by
    `convert_xlm_roberta_clip`."""
    from .xlm_roberta import XLM_ROBERTA_LARGE, xlm_roberta_with_head
    text_cfg = text_cfg if text_cfg is not None else XLM_ROBERTA_LARGE
    xi = clip_visual_forward(params["visual"], imgs, vis_cfg,
                             use_31_block=False)
    xt = xlm_roberta_with_head(params["textual"], params["head"], txt_ids,
                               text_cfg)
    return xi, xt


def convert_xlm_roberta_clip(sd: Dict[str, np.ndarray],
                             vis_cfg: dict = VIT_H_14,
                             text_cfg: dict = None,
                             dtype=np.float32) -> Params:
    """Full torch XLMRobertaCLIP state dict -> {"visual", "textual",
    "head", "log_scale"} pytree (both towers; the visual-only i2v path
    keeps using `convert_clip_visual`)."""
    from .xlm_roberta import XLM_ROBERTA_LARGE, convert_xlm_roberta_text
    text_cfg = text_cfg if text_cfg is not None else XLM_ROBERTA_LARGE
    textual, head = convert_xlm_roberta_text(sd, text_cfg, dtype=dtype)
    return {
        "visual": convert_clip_visual(sd, vis_cfg, dtype),
        "textual": textual,
        "head": head,
        "log_scale": jnp.asarray(sd["log_scale"].astype(dtype)),
    }


def convert_clip_visual(sd: Dict[str, np.ndarray], cfg: dict = VIT_H_14,
                        dtype=np.float32) -> Params:
    """torch XLMRobertaCLIP state dict -> visual-tower pytree.

    Accepts full-model dicts (keys prefixed `visual.`); text-tower weights
    are ignored.
    """
    if any(k.startswith("visual.") for k in sd):
        sd = {k[len("visual."):]: v for k, v in sd.items()
              if k.startswith("visual.")}

    def lin(name):
        return {"kernel": sd[f"{name}.weight"].T.astype(dtype),
                "bias": sd[f"{name}.bias"].astype(dtype)}

    def nrm(name):
        return {"weight": sd[f"{name}.weight"].astype(dtype),
                "bias": sd[f"{name}.bias"].astype(dtype)}

    def block(i):
        pre = f"transformer.{i}"
        return {"norm1": nrm(f"{pre}.norm1"),
                "attn": {"to_qkv": lin(f"{pre}.attn.to_qkv"),
                         "proj": lin(f"{pre}.attn.proj")},
                "norm2": nrm(f"{pre}.norm2"),
                "mlp": {"fc1": lin(f"{pre}.mlp.0"),
                        "fc2": lin(f"{pre}.mlp.2")}}

    blocks = [block(i) for i in range(cfg["num_layers"])]
    return jax.tree.map(jnp.asarray, {
        "patch_embedding": {
            "kernel": sd["patch_embedding.weight"].transpose(2, 3, 1, 0)
            .astype(dtype)},
        "cls_embedding": sd["cls_embedding"].astype(dtype),
        "pos_embedding": sd["pos_embedding"].astype(dtype),
        "pre_norm": nrm("pre_norm"),
        "blocks": jax.tree.map(lambda *xs: np.stack(xs), *blocks),
    })
