"""umT5-XXL text encoder in functional JAX.

Re-design of `MMPL_t2v/wan/modules/t5.py` (T5Encoder/umt5_xxl: vocab 256384,
dim 4096, ffn 10240, 64 heads, 24 layers, 32 relative-position buckets,
per-layer position embeddings — umT5's `shared_pos=False`, t5.py:456-467).
Blocks are stacked on a leading layer axis and run under one `lax.scan`;
the relative-position bucket matrix is a compile-time constant.

T5 specifics preserved: no attention scaling (t5.py:115), fp32 softmax,
gated-GELU feed-forward `fc2(fc1(x) * gelu(gate(x)))` (t5.py:123-141),
pre-norm residuals without bias terms, final RMS-style T5LayerNorm.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

UMT5_XXL = dict(vocab_size=256384, dim=4096, dim_attn=4096, dim_ffn=10240,
                num_heads=64, num_layers=24, num_buckets=32)

TINY_T5 = dict(vocab_size=128, dim=64, dim_attn=64, dim_ffn=128,
               num_heads=4, num_layers=2, num_buckets=8)


def t5_layer_norm(x: jnp.ndarray, weight: jnp.ndarray,
                  eps: float = 1e-6) -> jnp.ndarray:
    """T5LayerNorm (t5.py:53-66): RMS without mean-subtraction, no bias."""
    xf = x.astype(jnp.float32)
    y = x * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1,
                                   keepdims=True) + eps).astype(x.dtype)
    return weight.astype(x.dtype) * y


def relative_position_buckets(length: int, num_buckets: int = 32,
                              max_dist: int = 128) -> np.ndarray:
    """Bidirectional bucket matrix [L, L] (t5.py:239-260)."""
    rel_pos = np.arange(length)[None, :] - np.arange(length)[:, None]
    nb = num_buckets // 2
    buckets = (rel_pos > 0).astype(np.int64) * nb
    rel = np.abs(rel_pos)
    max_exact = nb // 2
    large = max_exact + (
        np.log(np.maximum(rel, 1) / max_exact) /
        math.log(max_dist / max_exact) * (nb - max_exact)).astype(np.int64)
    large = np.minimum(large, nb - 1)
    buckets += np.where(rel < max_exact, rel, large)
    return buckets


def init_t5_params(key, cfg: dict, dtype=jnp.float32) -> Params:
    d, da, dffn = cfg["dim"], cfg["dim_attn"], cfg["dim_ffn"]
    n, L, nb = cfg["num_heads"], cfg["num_layers"], cfg["num_buckets"]

    def nrm(k, shape, std):
        return (jax.random.normal(k, shape, jnp.float32) * std).astype(dtype)

    def block(k):
        ks = jax.random.split(k, 8)
        return {
            "norm1": {"weight": jnp.ones((d,), dtype)},
            "attn": {
                "q": nrm(ks[0], (d, da), (d * da) ** -0.5),
                "k": nrm(ks[1], (d, da), d ** -0.5),
                "v": nrm(ks[2], (d, da), d ** -0.5),
                "o": nrm(ks[3], (da, d), (n * (da // n)) ** -0.5),
            },
            "norm2": {"weight": jnp.ones((d,), dtype)},
            "ffn": {
                "gate": nrm(ks[4], (d, dffn), d ** -0.5),
                "fc1": nrm(ks[5], (d, dffn), d ** -0.5),
                "fc2": nrm(ks[6], (dffn, d), dffn ** -0.5),
            },
            "pos_embedding": nrm(ks[7], (nb, n), (2 * nb * n) ** -0.5),
        }

    ks = jax.random.split(key, 3)
    blocks = [block(k) for k in jax.random.split(ks[0], L)]
    return {
        "token_embedding": nrm(ks[1], (cfg["vocab_size"], d), 1.0),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "norm": {"weight": jnp.ones((d,), dtype)},
    }


def t5_encode(params: Params, cfg: dict, ids: jnp.ndarray,
              mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """ids [B, L] int32, mask [B, L] {0,1} -> states [B, L, dim].

    Matches T5Encoder.forward (t5.py:296-306) and WanTextEncoder's
    padding-zeroing (wan_wrapper.py:38-51): positions beyond the mask are
    zeroed in the output.
    """
    B, L = ids.shape
    n = cfg["num_heads"]
    dh = cfg["dim_attn"] // n
    x = params["token_embedding"][ids]
    buckets = jnp.asarray(relative_position_buckets(L, cfg["num_buckets"]))

    if mask is None:
        mask = jnp.ones((B, L), jnp.int32)
    neg = jnp.finfo(jnp.float32).min
    mask_bias = jnp.where(mask[:, None, None, :] > 0, 0.0, neg)  # [B,1,1,L]

    def block_forward(x, bp):
        pos_bias = bp["pos_embedding"][buckets]          # [L, L, n]
        pos_bias = pos_bias.transpose(2, 0, 1)[None]     # [1, n, L, L]
        h = t5_layer_norm(x, bp["norm1"]["weight"])
        q = (h @ bp["attn"]["q"].astype(h.dtype)).reshape(B, L, n, dh)
        k = (h @ bp["attn"]["k"].astype(h.dtype)).reshape(B, L, n, dh)
        v = (h @ bp["attn"]["v"].astype(h.dtype)).reshape(B, L, n, dh)
        scores = jnp.einsum("binc,bjnc->bnij", q.astype(jnp.float32),
                            k.astype(jnp.float32))       # no T5 scaling
        scores = scores + pos_bias.astype(jnp.float32) + mask_bias
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        att = jnp.einsum("bnij,bjnc->binc", probs, v).reshape(B, L, -1)
        x = x + att @ bp["attn"]["o"].astype(x.dtype)

        h = t5_layer_norm(x, bp["norm2"]["weight"])
        gelu_gate = jax.nn.gelu(h @ bp["ffn"]["gate"].astype(h.dtype),
                                approximate=True)
        y = (h @ bp["ffn"]["fc1"].astype(h.dtype)) * gelu_gate
        x = x + y @ bp["ffn"]["fc2"].astype(x.dtype)
        return x, None

    x, _ = jax.lax.scan(block_forward, x, params["blocks"])
    x = t5_layer_norm(x, params["norm"]["weight"])
    # zero padded positions (wan_wrapper.py:46-47)
    return x * (mask[:, :, None] > 0)
