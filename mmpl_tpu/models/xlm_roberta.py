"""XLM-RoBERTa text encoder (the CLIP text tower's backbone).

Re-design of `MMPL_t2v/wan/modules/xlm_roberta.py` (XLMRoberta :76): token +
position (+type) embeddings with post-LN, post-norm transformer blocks with
GELU MLPs, padding-mask attention.  Used by `XLMRobertaWithHead`
(clip.py:303-325): masked mean-pool over tokens followed by a projection
head.  The MMPL pipelines never call the text tower (i2v conditioning is
visual-only), but it is provided for full CLIP parity and scoring use.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from .dit import layer_norm, linear
from ..ops.attention import dense_attention

Params = Dict[str, Any]

XLM_ROBERTA_LARGE = dict(vocab_size=250002, max_seq_len=514, type_size=1,
                         pad_id=1, dim=1024, num_heads=16, num_layers=24,
                         eps=1e-5)


def init_xlm_roberta_params(key, cfg: dict = XLM_ROBERTA_LARGE,
                            dtype=jnp.float32) -> Params:
    d = cfg["dim"]
    ks = jax.random.split(key, 6)

    def lin(k, din, dout):
        a = 1.0 / math.sqrt(din)
        k1, k2 = jax.random.split(k)
        return {"kernel": jax.random.uniform(k1, (din, dout), jnp.float32,
                                             -a, a).astype(dtype),
                "bias": jnp.zeros((dout,), dtype)}

    def nrm():
        return {"weight": jnp.ones((d,), dtype),
                "bias": jnp.zeros((d,), dtype)}

    def block(k):
        kk = jax.random.split(k, 6)
        return {"attn": {"q": lin(kk[0], d, d), "k": lin(kk[1], d, d),
                         "v": lin(kk[2], d, d), "o": lin(kk[3], d, d)},
                "norm1": nrm(),
                "ffn": {"fc1": lin(kk[4], d, 4 * d),
                        "fc2": lin(kk[5], 4 * d, d)},
                "norm2": nrm()}

    blocks = [block(k) for k in jax.random.split(ks[0], cfg["num_layers"])]
    return {
        "token_embedding": (jax.random.normal(
            ks[1], (cfg["vocab_size"], d), jnp.float32) * 0.02).astype(dtype),
        "pos_embedding": (jax.random.normal(
            ks[2], (cfg["max_seq_len"], d), jnp.float32) * 0.02).astype(dtype),
        "type_embedding": (jax.random.normal(
            ks[3], (cfg["type_size"], d), jnp.float32) * 0.02).astype(dtype),
        "norm": {"weight": jnp.ones((d,), dtype),
                 "bias": jnp.zeros((d,), dtype)},
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
    }


def xlm_roberta_encode(params: Params, ids: jnp.ndarray,
                       cfg: dict = XLM_ROBERTA_LARGE) -> jnp.ndarray:
    """ids [B, L] -> states [B, L, dim]; positions follow RoBERTa's
    pad-offset convention (positions count from pad_id+1 at non-pad)."""
    B, L = ids.shape
    pad = cfg["pad_id"]
    mask = (ids != pad).astype(jnp.int32)
    pos = jnp.cumsum(mask, axis=1) * mask + pad
    x = (params["token_embedding"][ids]
         + params["pos_embedding"][pos]
         + params["type_embedding"][jnp.zeros_like(ids)])
    x = layer_norm(x, cfg["eps"], params["norm"]["weight"],
                   params["norm"]["bias"])

    n = cfg["num_heads"]
    d = cfg["dim"] // n
    attn_mask = (mask[:, None, None, :] > 0)

    def block_fwd(x, bp):
        q = linear(bp["attn"]["q"], x).reshape(B, L, n, d)
        k = linear(bp["attn"]["k"], x).reshape(B, L, n, d)
        v = linear(bp["attn"]["v"], x).reshape(B, L, n, d)
        att = dense_attention(q, k, v, mask=attn_mask).reshape(B, L, -1)
        x = layer_norm(x + linear(bp["attn"]["o"], att), cfg["eps"],
                       bp["norm1"]["weight"], bp["norm1"]["bias"])
        h = linear(bp["ffn"]["fc2"],
                   jax.nn.gelu(linear(bp["ffn"]["fc1"], x),
                               approximate=False))
        x = layer_norm(x + h, cfg["eps"], bp["norm2"]["weight"],
                       bp["norm2"]["bias"])
        return x, None

    x, _ = jax.lax.scan(block_fwd, x, params["blocks"])
    return x


def masked_mean_pool(states: jnp.ndarray, ids: jnp.ndarray,
                     pad_id: int = 1) -> jnp.ndarray:
    """XLMRobertaWithHead's pooling (clip.py:315-322)."""
    mask = (ids != pad_id).astype(states.dtype)[:, :, None]
    return (states * mask).sum(axis=1) / jnp.maximum(mask.sum(axis=1), 1.0)


def init_xlm_roberta_head_params(key, dim: int = 1024, out_dim: int = 1024,
                                 dtype=jnp.float32) -> Params:
    """Projection head of XLMRobertaWithHead (clip.py:303-313):
    Linear(dim, mid, bias=False) -> GELU -> Linear(mid, out_dim, bias=False)
    with mid = (dim + out_dim) // 2."""
    mid = (dim + out_dim) // 2
    k1, k2 = jax.random.split(key)

    def lin(k, din, dout):
        a = 1.0 / math.sqrt(din)
        return {"kernel": jax.random.uniform(k, (din, dout), jnp.float32,
                                             -a, a).astype(dtype)}

    return {"fc1": lin(k1, dim, mid), "fc2": lin(k2, mid, out_dim)}


def xlm_roberta_with_head(params: Params, head: Params, ids: jnp.ndarray,
                          cfg: dict = XLM_ROBERTA_LARGE) -> jnp.ndarray:
    """Full CLIP text tower (XLMRobertaWithHead.forward, clip.py:315-325):
    encode -> masked mean pool -> projection.  Returns [B, out_dim]."""
    states = xlm_roberta_encode(params, ids, cfg)
    pooled = masked_mean_pool(states, ids, cfg["pad_id"])
    h = jax.nn.gelu(linear(head["fc1"], pooled), approximate=False)
    return linear(head["fc2"], h)


def convert_xlm_roberta_text(sd: Dict[str, np.ndarray],
                             cfg: dict = XLM_ROBERTA_LARGE,
                             dtype=np.float32):
    """torch XLMRobertaWithHead state dict -> (backbone, head) pytrees.

    Accepts both a bare text-tower dict and a full XLMRobertaCLIP dict
    (keys prefixed `textual.`, clip.py:393-395).  Torch Linear weights
    [out, in] are stored transposed; `head.0`/`head.2` are the bias-free
    projection (clip.py:310-313)."""
    if any(k.startswith("textual.") for k in sd):
        sd = {k[len("textual."):]: v for k, v in sd.items()
              if k.startswith("textual.")}

    def lin(name):
        p = {"kernel": sd[f"{name}.weight"].T.astype(dtype)}
        if f"{name}.bias" in sd:
            p["bias"] = sd[f"{name}.bias"].astype(dtype)
        return p

    def nrm(name):
        return {"weight": sd[f"{name}.weight"].astype(dtype),
                "bias": sd[f"{name}.bias"].astype(dtype)}

    def block(i):
        pre = f"blocks.{i}"
        return {"attn": {"q": lin(f"{pre}.attn.q"),
                         "k": lin(f"{pre}.attn.k"),
                         "v": lin(f"{pre}.attn.v"),
                         "o": lin(f"{pre}.attn.o")},
                "norm1": nrm(f"{pre}.norm1"),
                "ffn": {"fc1": lin(f"{pre}.ffn.0"),
                        "fc2": lin(f"{pre}.ffn.2")},
                "norm2": nrm(f"{pre}.norm2")}

    blocks = [block(i) for i in range(cfg["num_layers"])]
    params = jax.tree.map(jnp.asarray, {
        "token_embedding": sd["token_embedding.weight"].astype(dtype),
        "pos_embedding": sd["pos_embedding.weight"].astype(dtype),
        "type_embedding": sd["type_embedding.weight"].astype(dtype),
        "norm": nrm("norm"),
        "blocks": jax.tree.map(lambda *xs: np.stack(xs), *blocks),
    })
    head = jax.tree.map(jnp.asarray, {"fc1": lin("head.0"),
                                      "fc2": lin("head.2")})
    return params, head


def load_xlm_roberta_text(path: str, cfg: dict = XLM_ROBERTA_LARGE,
                          dtype=np.float32):
    """Load the CLIP text tower from the reference checkpoint
    (`models_clip_open-clip-xlm-roberta-large-vit-huge-14.pth`)."""
    from ..utils.checkpoint import load_torch_state_dict
    return convert_xlm_roberta_text(load_torch_state_dict(path), cfg, dtype)
