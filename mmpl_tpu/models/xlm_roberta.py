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
from typing import Any, Dict, Optional

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
