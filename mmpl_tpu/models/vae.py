"""Wan2.1 causal 3D video VAE in functional JAX.

Re-design of `MMPL_t2v/wan/modules/vae.py` (WanVAE_/Encoder3d/Decoder3d).
The reference streams frames through every causal conv with per-conv
2-frame feature caches (`CACHE_T=2`, vae.py:14,28-36,202-220) and chunks
encode as 1+4+4+... / decode frame-by-frame (vae.py:517-570).  That cache
algebra is *exactly* a zero-front-padded causal temporal conv over the full
sequence (plus two first-frame special cases in the temporal re-samplers),
so on TPU we provide:

  * `encode` / `decode`: whole-sequence XLA convs — mathematically identical
    to the reference's chunked loops, but one fused program;
  * `decode_streaming`: a `lax.scan` over latent frames with an explicit
    carried cache pytree (1 latent -> 4 pixel frames per step) for
    memory-bounded production decode and chunk-pipelined handoff.

First-frame special cases reproduced from the reference:
  * downsample3d: frame 0 bypasses the strided temporal conv; the conv runs
    valid/stride-2 from frame 0 (vae.py:143-159).
  * upsample3d: frame 0 is never temporally doubled and is *excluded* from
    later frames' conv context (the 'Rep' zero-cache branch,
    vae.py:103-137); frames >= 1 see zero history.

Config (vae.py:612-624): dim=96, z_dim=16, dim_mult=[1,2,4,4],
2 res blocks, no attention scales, temporal down [False, True, True].
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

#: per-channel latent statistics (utils/wan_wrapper.py:57-66)
LATENT_MEAN = np.array([
    -0.7571, -0.7089, -0.9113, 0.1075, -0.1745, 0.9653, -0.1517, 1.5508,
    0.4134, -0.0715, 0.5517, -0.3632, -0.1922, -0.9497, 0.2503, -0.2921],
    dtype=np.float32)
LATENT_STD = np.array([
    2.8184, 1.4541, 2.3275, 2.6558, 1.2196, 1.7708, 2.6052, 2.0743,
    3.2687, 2.1526, 2.8652, 1.5579, 1.6382, 1.1253, 2.8251, 1.9160],
    dtype=np.float32)

VAE_DIM = 96
VAE_Z_DIM = 16
DIM_MULT = (1, 2, 4, 4)
NUM_RES_BLOCKS = 2
TEMPORAL_DOWN = (False, True, True)   # per level (vae.py:623)
CACHE_T = 2


# ---------------------------------------------------------------------------
# Block spec tables (mirror the torch Sequential layouts for ckpt mapping)
# ---------------------------------------------------------------------------

def encoder_specs() -> List[Tuple[str, int, int]]:
    """[(kind, in_dim, out_dim)] for Encoder3d.downsamples (vae.py:291-306)."""
    dims = [VAE_DIM * u for u in (1,) + DIM_MULT]
    specs = []
    for i, (din, dout) in enumerate(zip(dims[:-1], dims[1:])):
        d = din
        for _ in range(NUM_RES_BLOCKS):
            specs.append(("res", d, dout))
            d = dout
        if i != len(DIM_MULT) - 1:
            kind = "downsample3d" if TEMPORAL_DOWN[i] else "downsample2d"
            specs.append((kind, dout, dout))
    return specs


def decoder_specs() -> List[Tuple[str, int, int]]:
    """[(kind, in_dim, out_dim)] for Decoder3d.upsamples (vae.py:399-416)."""
    dims = [VAE_DIM * u for u in (DIM_MULT[-1],) + DIM_MULT[::-1]]
    temporal_up = TEMPORAL_DOWN[::-1]
    specs = []
    for i, (din, dout) in enumerate(zip(dims[:-1], dims[1:])):
        d = din // 2 if i in (1, 2, 3) else din
        for _ in range(NUM_RES_BLOCKS + 1):
            specs.append(("res", d, dout))
            d = dout
        if i != len(DIM_MULT) - 1:
            kind = "upsample3d" if temporal_up[i] else "upsample2d"
            specs.append((kind, dout, dout // 2))
    return specs


# ---------------------------------------------------------------------------
# Primitive layers (NDHWC layout: x [B, T, H, W, C])
# ---------------------------------------------------------------------------

def _quant_act(x: jnp.ndarray):
    """Per-tensor dynamic int8 activation quantisation for convs.

    Per-token scales (the DiT gemm recipe, ops/quant.py) are wrong for
    convolutions — each output mixes kt*kh*kw positions with different
    scales — so conv activations use ONE dynamic scale per tensor, the
    dynamic analogue of TensorRT's per-tensor calibration
    (demo_utils/vae_torch2trt.py:139 VAECalibrator)."""
    xf = x.astype(jnp.float32)
    xs = jnp.maximum(jnp.max(jnp.abs(xf)) / 127.0, 1e-12)
    xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    return xq, xs


def _conv3d(p: Params, x: jnp.ndarray, stride=(1, 1, 1),
            t_pad: Optional[int] = None) -> jnp.ndarray:
    """Causal 3D conv: temporal zero-pad in front (2*pad_t), spatial SAME.

    Dispatches to the int8 W8A8 path when `p` holds a quantized kernel
    (see `quantize_vae_decoder`)."""
    kernel = p["kernel_q"] if "kernel_q" in p else p["kernel"]
    kt, kh, kw = kernel.shape[:3]
    t_pad = 2 * (kt // 2) if t_pad is None else t_pad
    pads = [(t_pad, 0), (kh // 2, kh // 2), (kw // 2, kw // 2)]
    if "kernel_q" in p:
        xq, xs = _quant_act(x)
        acc = jax.lax.conv_general_dilated(
            xq, kernel, window_strides=stride, padding=pads,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.int32)
        y = (acc.astype(jnp.float32) * (xs * p["scale"])).astype(x.dtype)
        return y + p["bias"].astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), window_strides=stride,
        padding=pads, dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return y + p["bias"].astype(x.dtype)


def _conv2d(p: Params, x: jnp.ndarray, stride=(1, 1),
            padding="SAME") -> jnp.ndarray:
    """Per-frame 2D conv on [B, T, H, W, C] via batch-fold."""
    B, T, H, W, C = x.shape
    if "kernel_q" in p:
        xq, xs = _quant_act(x.reshape(B * T, H, W, C))
        acc = jax.lax.conv_general_dilated(
            xq, p["kernel_q"], window_strides=stride, padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        y = (acc.astype(jnp.float32) * (xs * p["scale"])).astype(x.dtype)
        y = y + p["bias"].astype(x.dtype)
        return y.reshape(B, T, *y.shape[1:])
    y = jax.lax.conv_general_dilated(
        x.reshape(B * T, H, W, C), p["kernel"].astype(x.dtype),
        window_strides=stride, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y + p["bias"].astype(x.dtype)
    return y.reshape(B, T, *y.shape[1:])


def _rms_norm(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """RMS_norm (vae.py:39-54): F.normalize over channels * sqrt(C) * gamma."""
    C = x.shape[-1]
    xf = x.astype(jnp.float32)
    n = jnp.sqrt(jnp.sum(xf * xf, axis=-1, keepdims=True))
    y = xf / jnp.maximum(n, 1e-12) * math.sqrt(C)
    return (y * p["gamma"].astype(jnp.float32)).astype(x.dtype)


def _res_block(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """ResidualBlock (vae.py:186-220)."""
    h = _conv3d(p["shortcut"], x) if "shortcut" in p else x
    y = _conv3d(p["conv1"], jax.nn.silu(_rms_norm(p["norm1"], x)))
    y = _conv3d(p["conv2"], jax.nn.silu(_rms_norm(p["norm2"], y)))
    return y + h


def _attn_block(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Single-head per-frame spatial attention (vae.py:223-262)."""
    B, T, H, W, C = x.shape
    y = _rms_norm(p["norm"], x)
    qkv = _conv2d(p["to_qkv"], y)                       # [B,T,H,W,3C]
    qkv = qkv.reshape(B * T, H * W, 3, C)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    scores = jnp.einsum("bqc,bkc->bqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) / math.sqrt(C)
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    o = jnp.einsum("bqk,bkc->bqc", probs, v).reshape(B, T, H, W, C)
    return _conv2d(p["proj"], o) + x


def _upsample_nearest2x(x: jnp.ndarray) -> jnp.ndarray:
    B, T, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, :, None, :, None, :],
                         (B, T, H, 2, W, 2, C))
    return x.reshape(B, T, H * 2, W * 2, C)


def _spatial_downsample(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """ZeroPad2d((0,1,0,1)) + 3x3 stride-2 conv (vae.py:88-90)."""
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)))
    return _conv2d(p, x, stride=(2, 2), padding="VALID")


def _temporal_upsample_full(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """upsample3d time path, full-sequence (vae.py:103-137).

    Frame 0 passes through; frames >= 1 run the 2C-channel causal conv with
    zero history and are unpacked to two frames each: T -> 1 + 2*(T-1).
    """
    B, T, H, W, C = x.shape
    # output channels split as (frame_half, C): half 0 is the earlier frame
    z = _conv3d(p, x[:, 1:]).reshape(B, T - 1, H, W, 2, C)
    z = z.transpose(0, 1, 4, 2, 3, 5).reshape(B, (T - 1) * 2, H, W, C)
    return jnp.concatenate([x[:, :1], z], axis=1)


def _temporal_downsample_full(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """downsample3d time path, full-sequence (vae.py:143-159).

    Frame 0 passes through; a valid stride-2 kt=3 conv runs from frame 0:
    T=1+2m -> 1+m.
    """
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), window_strides=(2, 1, 1),
        padding=[(0, 0), (0, 0), (0, 0)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + p["bias"].astype(
            x.dtype)
    return jnp.concatenate([x[:, :1], y], axis=1)


# ---------------------------------------------------------------------------
# Initialisation
# ---------------------------------------------------------------------------

def _init_conv(key, kt, kh, kw, cin, cout, dtype) -> Params:
    fan_in = kt * kh * kw * cin
    a = 1.0 / math.sqrt(fan_in)
    k1, k2 = jax.random.split(key)
    return {"kernel": jax.random.uniform(k1, (kt, kh, kw, cin, cout),
                                         jnp.float32, -a, a).astype(dtype),
            "bias": jax.random.uniform(k2, (cout,), jnp.float32, -a,
                                       a).astype(dtype)}


def _init_conv2d(key, kh, kw, cin, cout, dtype) -> Params:
    p = _init_conv(key, 1, kh, kw, cin, cout, dtype)
    return {"kernel": p["kernel"][0], "bias": p["bias"]}


def _init_res(key, din, dout, dtype) -> Params:
    ks = jax.random.split(key, 3)
    p = {"norm1": {"gamma": jnp.ones((din,), dtype)},
         "conv1": _init_conv(ks[0], 3, 3, 3, din, dout, dtype),
         "norm2": {"gamma": jnp.ones((dout,), dtype)},
         "conv2": _init_conv(ks[1], 3, 3, 3, dout, dout, dtype)}
    if din != dout:
        p["shortcut"] = _init_conv(ks[2], 1, 1, 1, din, dout, dtype)
    return p


def _init_attn(key, dim, dtype) -> Params:
    ks = jax.random.split(key, 2)
    p = {"norm": {"gamma": jnp.ones((dim,), dtype)},
         "to_qkv": _init_conv2d(ks[0], 1, 1, dim, dim * 3, dtype),
         "proj": _init_conv2d(ks[1], 1, 1, dim, dim, dtype)}
    p["proj"]["kernel"] = jnp.zeros_like(p["proj"]["kernel"])
    return p


def _init_block(key, spec, dtype) -> Params:
    kind, din, dout = spec
    if kind == "res":
        return _init_res(key, din, dout, dtype)
    if kind == "attn":
        return _init_attn(key, din, dtype)
    if kind == "downsample2d":
        return {"resample": _init_conv2d(key, 3, 3, din, dout, dtype)}
    if kind == "downsample3d":
        k1, k2 = jax.random.split(key)
        return {"resample": _init_conv2d(k1, 3, 3, din, dout, dtype),
                "time_conv": _init_conv(k2, 3, 1, 1, din, din, dtype)}
    if kind == "upsample2d":
        return {"resample": _init_conv2d(key, 3, 3, din, dout, dtype)}
    if kind == "upsample3d":
        k1, k2 = jax.random.split(key)
        return {"resample": _init_conv2d(k1, 3, 3, din, dout, dtype),
                "time_conv": _init_conv(k2, 3, 1, 1, din, din * 2, dtype)}
    raise ValueError(kind)


def init_vae_params(key, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 16)
    enc_dims = [VAE_DIM * u for u in (1,) + DIM_MULT]
    dec_dims = [VAE_DIM * u for u in (DIM_MULT[-1],) + DIM_MULT[::-1]]
    e_out = enc_dims[-1]
    d0 = dec_dims[0]

    enc_blocks = [
        _init_block(k, s, dtype)
        for k, s in zip(jax.random.split(ks[0], len(encoder_specs())),
                        encoder_specs())]
    dec_blocks = [
        _init_block(k, s, dtype)
        for k, s in zip(jax.random.split(ks[1], len(decoder_specs())),
                        decoder_specs())]
    return {
        "encoder": {
            "conv1": _init_conv(ks[2], 3, 3, 3, 3, enc_dims[0], dtype),
            "down": enc_blocks,
            "middle": [_init_res(ks[3], e_out, e_out, dtype),
                       _init_attn(ks[4], e_out, dtype),
                       _init_res(ks[5], e_out, e_out, dtype)],
            "head_norm": {"gamma": jnp.ones((e_out,), dtype)},
            "head_conv": _init_conv(ks[6], 3, 3, 3, e_out, 2 * VAE_Z_DIM,
                                    dtype),
        },
        "conv1": _init_conv(ks[7], 1, 1, 1, 2 * VAE_Z_DIM, 2 * VAE_Z_DIM,
                            dtype),
        "conv2": _init_conv(ks[8], 1, 1, 1, VAE_Z_DIM, VAE_Z_DIM, dtype),
        "decoder": {
            "conv1": _init_conv(ks[9], 3, 3, 3, VAE_Z_DIM, d0, dtype),
            "middle": [_init_res(ks[10], d0, d0, dtype),
                       _init_attn(ks[11], d0, dtype),
                       _init_res(ks[12], d0, d0, dtype)],
            "up": dec_blocks,
            "head_norm": {"gamma": jnp.ones((VAE_DIM,), dtype)},
            "head_conv": _init_conv(ks[13], 3, 3, 3, VAE_DIM, 3, dtype),
        },
    }


# ---------------------------------------------------------------------------
# Full-sequence encoder / decoder
# ---------------------------------------------------------------------------

def _apply_block(kind: str, p: Params, x: jnp.ndarray) -> jnp.ndarray:
    if kind == "res":
        return _res_block(p, x)
    if kind == "attn":
        return _attn_block(p, x)
    if kind == "downsample2d":
        return _spatial_downsample(p["resample"], x)
    if kind == "downsample3d":
        x = _spatial_downsample(p["resample"], x)
        return _temporal_downsample_full(p["time_conv"], x)
    if kind == "upsample2d":
        return _conv2d(p["resample"], _upsample_nearest2x(x))
    if kind == "upsample3d":
        x = _temporal_upsample_full(p["time_conv"], x)
        return _conv2d(p["resample"], _upsample_nearest2x(x))
    raise ValueError(kind)


def encoder_forward(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """pixels [B, T, H, W, 3] -> raw mu/logvar [B, T', H/8, W/8, 2*z]."""
    x = _conv3d(p["conv1"], x)
    for (kind, *_), blk in zip(encoder_specs(), p["down"]):
        x = _apply_block(kind, blk, x)
    x = _res_block(p["middle"][0], x)
    x = _attn_block(p["middle"][1], x)
    x = _res_block(p["middle"][2], x)
    x = jax.nn.silu(_rms_norm(p["head_norm"], x))
    return _conv3d(p["head_conv"], x)


def decoder_forward(p: Params, z: jnp.ndarray) -> jnp.ndarray:
    """latents [B, T, H/8, W/8, z] -> pixels [B, 1+4(T-1), H, W, 3]."""
    x = _conv3d(p["conv1"], z)
    x = _res_block(p["middle"][0], x)
    x = _attn_block(p["middle"][1], x)
    x = _res_block(p["middle"][2], x)
    for (kind, *_), blk in zip(decoder_specs(), p["up"]):
        x = _apply_block(kind, blk, x)
    x = jax.nn.silu(_rms_norm(p["head_norm"], x))
    return _conv3d(p["head_conv"], x)


def encode(params: Params, pixels: jnp.ndarray) -> jnp.ndarray:
    """[B, T_pix, C=3, H, W] -> normalised latents [B, T_lat, 16, H/8, W/8].

    Matches WanVAE_.encode + the wrapper normalisation
    (vae.py:517-543, wan_wrapper.py:74-88).
    """
    x = pixels.transpose(0, 1, 3, 4, 2)  # -> NDHWC
    out = encoder_forward(params["encoder"], x)
    out = _conv3d(params["conv1"], out)
    mu = out[..., :VAE_Z_DIM]
    mean = jnp.asarray(LATENT_MEAN, mu.dtype)
    std = jnp.asarray(LATENT_STD, mu.dtype)
    mu = (mu - mean) / std
    return mu.transpose(0, 1, 4, 2, 3)   # [B, T, C, H', W']


def quantize_vae_decoder(params: Params) -> Params:
    """int8-quantize every decoder conv (W8A8: per-output-channel weight
    scales, per-tensor dynamic activation scales in `_conv3d`/`_conv2d`).

    The TPU-native analogue of the reference's TensorRT int8 VAE decoder
    engine (demo_utils/vae_torch2trt.py + demo_utils/vae.py:318-389).
    Covers `decoder.*` and the post-latent `conv2`; the encoder and all
    norms stay untouched.  Works with both `decode` and
    `decode_streaming` (the conv dispatch is shared)."""
    def quant_conv(p):
        w = p["kernel"].astype(jnp.float32)
        axes = tuple(range(w.ndim - 1))                  # all but Cout
        scale = jnp.maximum(jnp.max(jnp.abs(w), axis=axes) / 127.0, 1e-12)
        wq = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
        return {"kernel_q": wq, "scale": scale, "bias": p["bias"]}

    def walk(node):
        if isinstance(node, dict):
            if "kernel" in node:
                return quant_conv(node)
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v) for v in node)
        return node

    out = dict(params)
    out["decoder"] = walk(params["decoder"])
    out["conv2"] = quant_conv(params["conv2"])
    return out


def decode(params: Params, latents: jnp.ndarray,
           clamp: bool = True) -> jnp.ndarray:
    """[B, T_lat, 16, H', W'] -> pixels [B, T_pix, 3, 8H', 8W'] in [-1, 1]."""
    z = latents.transpose(0, 1, 3, 4, 2)
    mean = jnp.asarray(LATENT_MEAN, z.dtype)
    std = jnp.asarray(LATENT_STD, z.dtype)
    z = z * std + mean
    z = _conv3d(params["conv2"], z)
    x = decoder_forward(params["decoder"], z)
    if clamp:
        x = jnp.clip(x, -1.0, 1.0)
    return x.transpose(0, 1, 4, 2, 3)


# ---------------------------------------------------------------------------
# Streaming decode (lax.scan over latent frames, explicit conv caches)
# ---------------------------------------------------------------------------
#
# Cache pytree: for every causal temporal conv in decode order, the last
# CACHE_T input frames at that conv's resolution ([B, 2, H_l, W_l, C_l]).
# This is the reference's `_feat_map` (vae.py:602-609) made explicit and
# static, enabling jitted frame-at-a-time decode with O(1) memory.

def _stream_causal_conv(p, x, cache):
    """x [B, t, H, W, C] chunk; cache [B, 2, H, W, C] (past input frames)."""
    full = jnp.concatenate([cache, x], axis=1)
    y = _conv3d(p, full, t_pad=0)
    new_cache = full[:, -CACHE_T:]
    return y, new_cache


def _stream_res_block(p, x, caches: list):
    h = _conv3d(p["shortcut"], x) if "shortcut" in p else x
    y = jax.nn.silu(_rms_norm(p["norm1"], x))
    y, c0 = _stream_causal_conv(p["conv1"], y, caches[0])
    y = jax.nn.silu(_rms_norm(p["norm2"], y))
    y, c1 = _stream_causal_conv(p["conv2"], y, caches[1])
    return y + h, [c0, c1]


def _stream_temporal_upsample(p, x, cache, is_first: bool):
    """upsample3d time path on a chunk; `is_first` statically marks the
    latent-frame-0 chunk (passes through untouched, 'Rep' semantics)."""
    if is_first:
        return x, cache
    B, t, H, W, C = x.shape
    full = jnp.concatenate([cache, x], axis=1)
    y = _conv3d(p, full, t_pad=0).reshape(B, t, H, W, 2, C)
    y = y.transpose(0, 1, 4, 2, 3, 5).reshape(B, t * 2, H, W, C)
    return y, full[:, -CACHE_T:]


def init_decoder_cache(params: Params, batch: int, lat_h: int, lat_w: int,
                       dtype=jnp.float32) -> List[jnp.ndarray]:
    """Zero caches, in decode traversal order."""
    caches = []

    def conv_cache(cin, h, w):
        caches.append(jnp.zeros((batch, CACHE_T, h, w, cin), dtype))

    d0 = VAE_DIM * DIM_MULT[-1]
    h, w = lat_h, lat_w
    conv_cache(VAE_Z_DIM, h, w)                   # decoder.conv1
    for _ in range(2):                            # middle res1 / res2
        conv_cache(d0, h, w)
        conv_cache(d0, h, w)
    for spec, blk in zip(decoder_specs(), params["decoder"]["up"]):
        kind, din, dout = spec
        if kind == "res":
            conv_cache(din, h, w)                 # conv1 input (din ch)
            conv_cache(dout, h, w)                # conv2 input (dout ch)
        elif kind == "upsample3d":
            conv_cache(din, h, w)                 # time_conv cache
            h, w = h * 2, w * 2
        elif kind == "upsample2d":
            h, w = h * 2, w * 2
    conv_cache(VAE_DIM, h, w)                     # head conv
    return caches


def _decode_chunk(params: Params, z: jnp.ndarray, caches: List[jnp.ndarray],
                  is_first: bool):
    """One latent chunk [B, t, h, w, zdim] -> pixel frames + new caches."""
    p = params["decoder"]
    new_caches = []
    i = 0

    def take():
        nonlocal i
        c = caches[i]
        i += 1
        return c

    x, c = _stream_causal_conv(p["conv1"], z, take())
    new_caches.append(c)
    x, cs = _stream_res_block(p["middle"][0], x, [take(), take()])
    new_caches.extend(cs)
    x = _attn_block(p["middle"][1], x)
    x, cs = _stream_res_block(p["middle"][2], x, [take(), take()])
    new_caches.extend(cs)

    for (kind, *_), blk in zip(decoder_specs(), p["up"]):
        if kind == "res":
            x, cs = _stream_res_block(blk, x, [take(), take()])
            new_caches.extend(cs)
        elif kind == "upsample3d":
            x, c = _stream_temporal_upsample(blk["time_conv"], x, take(),
                                             is_first)
            new_caches.append(c)
            x = _conv2d(blk["resample"], _upsample_nearest2x(x))
        elif kind == "upsample2d":
            x = _conv2d(blk["resample"], _upsample_nearest2x(x))
        else:  # attn (not present in default config)
            x = _attn_block(blk, x)

    x = jax.nn.silu(_rms_norm(p["head_norm"], x))
    x, c = _stream_causal_conv(p["head_conv"], x, take())
    new_caches.append(c)
    return x, new_caches


def decode_streaming(params: Params, latents: jnp.ndarray,
                     clamp: bool = True) -> jnp.ndarray:
    """Frame-streaming decode: scan over latent frames with carried caches.

    Identical output to `decode`, O(1) activation memory in T.
    latents [B, T, 16, H', W'] -> [B, 1+4(T-1), 3, H, W].
    """
    B, T, C, H, W = latents.shape
    z = latents.transpose(0, 1, 3, 4, 2)
    mean = jnp.asarray(LATENT_MEAN, z.dtype)
    std = jnp.asarray(LATENT_STD, z.dtype)
    z = z * std + mean
    z = _conv3d(params["conv2"], z)

    caches = init_decoder_cache(params, B, H, W, z.dtype)
    first_px, caches = _decode_chunk(params, z[:, :1], caches, is_first=True)

    def step(caches, z_t):
        px, caches = _decode_chunk(params, z_t[:, None], caches,
                                   is_first=False)
        return caches, px

    if T > 1:
        zs = jnp.swapaxes(z[:, 1:], 0, 1)  # [T-1, B, h, w, c]
        caches, rest = jax.lax.scan(step, caches, zs)
        rest = jnp.moveaxis(rest, 0, 1).reshape(B, (T - 1) * 4,
                                                *rest.shape[3:])
        out = jnp.concatenate([first_px, rest], axis=1)
    else:
        out = first_px
    if clamp:
        out = jnp.clip(out, -1.0, 1.0)
    return out.transpose(0, 1, 4, 2, 3)


def decode_to_frames(params: Params, latents: jnp.ndarray,
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Production decode: bf16 streaming decode to display-ready frames.

    Returns (frames, tail):
      frames [B, T, H, W, 3] uint8 — clip/scale/round/transpose all happen
        on device, so only the 4x-smaller uint8 buffer crosses the host
        link (the tunneled chip moves ~MB/ms with a ~25 ms floor; the f32
        NCTHW window was ~387 MB + 1-core-host numpy postprocess);
      tail [B, 5, 3, H, W] f32 in [-1, 1] — the causal 5-pixel-frame
        suffix the inter-window bridge re-encodes (stays on device, never
        transferred; full precision so the bridge matches the reference's
        float path, casual_fps_inference_1gpu.py:160-205).

    bf16 is the measured production choice (tools/vae_decode_probe.py:
    5.52 s -> 5.01 s at the 21-frame window, 50.8 dB vs f32 — the decode
    is activation-bound, so halving activation bytes is the whole win;
    the reference's TensorRT int8 engine plays this role at
    demo_utils/vae.py:318-389).  Jit this (shapes are per-window static).
    """
    def cast(node):
        if isinstance(node, dict):
            # int8 dequant scales must stay f32 inside the conv (the
            # measured int8_bf16 probe variant keeps them f32)
            return {k: v if k == "scale" else cast(v)
                    for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(cast(v) for v in node)
        return (node.astype(jnp.bfloat16)
                if node.dtype in (jnp.float32, jnp.float64) else node)

    out = decode_streaming(cast(params), latents.astype(jnp.bfloat16))
    out32 = out.astype(jnp.float32)
    u8 = jnp.round((out32 * 0.5 + 0.5) * 255.0).astype(jnp.uint8)
    frames = jnp.transpose(u8, (0, 1, 3, 4, 2))
    return frames, out32[:, -5:]
