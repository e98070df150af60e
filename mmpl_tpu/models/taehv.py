"""TAEHV tiny video VAE (fast preview encode/decode).

Re-design of `MMPL_t2v/demo_utils/taehv.py` (TAEHV, taew2_1.pth weights for
Wan2.1): a small conv autoencoder whose temporal machinery is three
primitives — MemBlock (conv over [x, previous-frame] concat with residual),
TPool (fold `stride` consecutive frames into channels + 1x1 conv), TGrow
(1x1 conv expanding channels into `stride` output frames).

JAX design: the reference's "parallel" mode is already the natural jit form
(MemBlock's `past` is a zero-front-shifted copy of the sequence,
taehv.py:75-84), so the whole model is one fused program over NTCHW.
Layout here is NTHWC.  The sequential graph-traversal mode (O(1) memory,
taehv.py:90-157) is unnecessary on TPU — `decode` is already streaming-
friendly at these tiny channel counts.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

LATENT_CHANNELS = 16
IMAGE_CHANNELS = 3
DEC_NF = (256, 128, 64, 64)

#: (kind, args) rows mirroring the torch nn.Sequential indices for ckpt io.
#: kinds: conv(cin,cout,stride,bias) relu memblock(n) tpool(n,stride)
#:        tgrow(n,stride) upsample(scale) clamp
ENCODER_LAYOUT: Tuple = (
    ("conv", 3, 64, 1, True), ("relu",),
    ("tpool", 64, 2), ("conv", 64, 64, 2, False), ("mem", 64, 64),
    ("mem", 64, 64), ("mem", 64, 64),
    ("tpool", 64, 2), ("conv", 64, 64, 2, False), ("mem", 64, 64),
    ("mem", 64, 64), ("mem", 64, 64),
    ("tpool", 64, 1), ("conv", 64, 64, 2, False), ("mem", 64, 64),
    ("mem", 64, 64), ("mem", 64, 64),
    ("conv", 64, 16, 1, True),
)

DECODER_LAYOUT: Tuple = (
    ("clamp",), ("conv", 16, 256, 1, True), ("relu",),
    ("mem", 256, 256), ("mem", 256, 256), ("mem", 256, 256),
    ("upsample", 2), ("tgrow", 256, 1), ("conv", 256, 128, 1, False),
    ("mem", 128, 128), ("mem", 128, 128), ("mem", 128, 128),
    ("upsample", 2), ("tgrow", 128, 2), ("conv", 128, 64, 1, False),
    ("mem", 64, 64), ("mem", 64, 64), ("mem", 64, 64),
    ("upsample", 2), ("tgrow", 64, 2), ("conv", 64, 64, 1, False),
    ("relu",), ("conv", 64, 3, 1, True),
)

FRAMES_TO_TRIM = 3   # 2**2 - 1 for full temporal upscale (taehv.py:180)


def _conv_p(key, cin, cout, k, bias, dtype):
    a = 1.0 / np.sqrt(cin * k * k)
    k1, k2 = jax.random.split(key)
    p = {"kernel": jax.random.uniform(k1, (k, k, cin, cout), jnp.float32,
                                      -a, a).astype(dtype)}
    if bias:
        p["bias"] = jnp.zeros((cout,), dtype)
    return p


def init_taehv_params(key, dtype=jnp.float32) -> Params:
    def init_seq(key, layout):
        out: List[Params] = []
        ks = jax.random.split(key, len(layout))
        for k, row in zip(ks, layout):
            kind = row[0]
            if kind == "conv":
                _, cin, cout, stride, bias = row
                out.append(_conv_p(k, cin, cout, 3, bias, dtype))
            elif kind == "mem":
                _, cin, cout = row
                kk = jax.random.split(k, 4)
                p = {"c0": _conv_p(kk[0], cin * 2, cout, 3, True, dtype),
                     "c1": _conv_p(kk[1], cout, cout, 3, True, dtype),
                     "c2": _conv_p(kk[2], cout, cout, 3, True, dtype)}
                if cin != cout:
                    p["skip"] = _conv_p(kk[3], cin, cout, 1, False, dtype)
                out.append(p)
            elif kind == "tpool":
                _, n, stride = row
                out.append(_conv_p(k, n * stride, n, 1, False, dtype))
            elif kind == "tgrow":
                _, n, stride = row
                out.append(_conv_p(k, n, n * stride, 1, False, dtype))
            else:
                out.append({})
        return out

    k1, k2 = jax.random.split(key)
    return {"encoder": init_seq(k1, ENCODER_LAYOUT),
            "decoder": init_seq(k2, DECODER_LAYOUT)}


def _conv2d(p, x, stride=1):
    """x [N, T, H, W, C] -> per-frame conv."""
    N, T, H, W, C = x.shape
    # torch Conv2d(padding=1) pads symmetrically even at stride 2, where
    # XLA's "SAME" would pad (0, 1) — explicit padding keeps bit parity
    # with the reference (caught by test_reference_parity::test_taehv_parity)
    pad = ((1, 1), (1, 1)) if p["kernel"].shape[0] == 3 else ((0, 0), (0, 0))
    y = jax.lax.conv_general_dilated(
        x.reshape(N * T, H, W, C), p["kernel"].astype(x.dtype),
        window_strides=(stride, stride), padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y.reshape(N, T, *y.shape[1:])


def _apply_seq(layers: List[Params], layout, x: jnp.ndarray) -> jnp.ndarray:
    """x [N, T, H, W, C]; the reference's parallel mode (taehv.py:75-89)."""
    for p, row in zip(layers, layout):
        kind = row[0]
        if kind == "conv":
            x = _conv2d(p, x, stride=row[3])
        elif kind == "relu":
            x = jax.nn.relu(x)
        elif kind == "clamp":
            x = jnp.tanh(x / 3.0) * 3.0
        elif kind == "mem":
            past = jnp.pad(x, ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0))
                           )[:, :x.shape[1]]
            h = jnp.concatenate([x, past], axis=-1)
            h = jax.nn.relu(_conv2d(p["c0"], h))
            h = jax.nn.relu(_conv2d(p["c1"], h))
            h = _conv2d(p["c2"], h)
            skip = _conv2d(p["skip"], x) if "skip" in p else x
            x = jax.nn.relu(h + skip)
        elif kind == "tpool":
            _, n, stride = row
            if stride > 1:
                N, T, H, W, C = x.shape
                x = x.reshape(N, T // stride, stride, H, W, C)
                x = x.transpose(0, 1, 3, 4, 2, 5).reshape(
                    N, T // stride, H, W, stride * C)
            x = _conv2d(p, x)
        elif kind == "tgrow":
            _, n, stride = row
            x = _conv2d(p, x)
            if stride > 1:
                N, T, H, W, SC = x.shape
                x = x.reshape(N, T, H, W, stride, SC // stride)
                x = x.transpose(0, 1, 4, 2, 3, 5).reshape(
                    N, T * stride, H, W, SC // stride)
        elif kind == "upsample":
            scale = row[1]
            if scale > 1:
                N, T, H, W, C = x.shape
                x = jnp.broadcast_to(
                    x[:, :, :, None, :, None, :],
                    (N, T, H, scale, W, scale, C)).reshape(
                        N, T, H * scale, W * scale, C)
    return x


def _apply_seq_streaming(layers: List[Params], layout, x: jnp.ndarray,
                         state) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    """Chunked variant of `_apply_seq`: each MemBlock's zero-padded "past"
    frame is replaced by the last input frame it saw in the previous chunk
    (carried in `state`, one entry per mem layer).  state=None means first
    chunk (zero past — identical to the parallel mode).  The TPU analogue
    of the reference's sequential graph-traversal mode (taehv.py:90-157):
    O(chunk) memory for arbitrarily long videos, bit-identical to the
    full-sequence decode (tests/test_models.py)."""
    new_state: List[jnp.ndarray] = []
    mem_i = 0
    for p, row in zip(layers, layout):
        kind = row[0]
        if kind == "conv":
            x = _conv2d(p, x, stride=row[3])
        elif kind == "relu":
            x = jax.nn.relu(x)
        elif kind == "clamp":
            x = jnp.tanh(x / 3.0) * 3.0
        elif kind == "mem":
            prev = (jnp.zeros_like(x[:, :1]) if state is None
                    else state[mem_i][:, None].astype(x.dtype))
            past = jnp.concatenate([prev, x[:, :-1]], axis=1)
            new_state.append(x[:, -1])
            mem_i += 1
            h = jnp.concatenate([x, past], axis=-1)
            h = jax.nn.relu(_conv2d(p["c0"], h))
            h = jax.nn.relu(_conv2d(p["c1"], h))
            h = _conv2d(p["c2"], h)
            skip = _conv2d(p["skip"], x) if "skip" in p else x
            x = jax.nn.relu(h + skip)
        elif kind == "tpool":
            _, n, stride = row
            if stride > 1:
                N, T, H, W, C = x.shape
                x = x.reshape(N, T // stride, stride, H, W, C)
                x = x.transpose(0, 1, 3, 4, 2, 5).reshape(
                    N, T // stride, H, W, stride * C)
            x = _conv2d(p, x)
        elif kind == "tgrow":
            _, n, stride = row
            x = _conv2d(p, x)
            if stride > 1:
                N, T, H, W, SC = x.shape
                x = x.reshape(N, T, H, W, stride, SC // stride)
                x = x.transpose(0, 1, 4, 2, 3, 5).reshape(
                    N, T * stride, H, W, SC // stride)
        elif kind == "upsample":
            scale = row[1]
            if scale > 1:
                N, T, H, W, C = x.shape
                x = jnp.broadcast_to(
                    x[:, :, :, None, :, None, :],
                    (N, T, H, scale, W, scale, C)).reshape(
                        N, T, H * scale, W * scale, C)
    return x, new_state


def taehv_decode_streaming(params: Params, latents: jnp.ndarray,
                           state=None):
    """Chunked decode: latents [N, T, 16, h, w] -> (video chunk, state).

    First chunk (state=None) trims the 3 temporal-upscale warmup frames
    exactly like `taehv_decode`; later chunks pass the returned `state`
    back in and get all 4*T frames.  Concatenating the chunks equals the
    full-sequence `taehv_decode` bit-for-bit (same ops, the carried past
    frame replaces the chunk-boundary zero pad)."""
    x = latents.transpose(0, 1, 3, 4, 2)
    x, new_state = _apply_seq_streaming(params["decoder"], DECODER_LAYOUT,
                                        x, state)
    x = x.transpose(0, 1, 4, 2, 3)
    if state is None:
        x = x[:, FRAMES_TO_TRIM:]
    return x, new_state


def taehv_encode(params: Params, video: jnp.ndarray) -> jnp.ndarray:
    """video [N, T, 3, H, W] in [0, 1] -> latents [N, T/4, 16, H/8, W/8]."""
    x = video.transpose(0, 1, 3, 4, 2)
    x = _apply_seq(params["encoder"], ENCODER_LAYOUT, x)
    return x.transpose(0, 1, 4, 2, 3)


def taehv_decode(params: Params, latents: jnp.ndarray,
                 trim: bool = True) -> jnp.ndarray:
    """latents [N, T, 16, h, w] -> video [N, 4T(-3), 3, 8h, 8w] in ~[0,1]."""
    x = latents.transpose(0, 1, 3, 4, 2)
    x = _apply_seq(params["decoder"], DECODER_LAYOUT, x)
    x = x.transpose(0, 1, 4, 2, 3)
    return x[:, FRAMES_TO_TRIM:] if trim else x


def convert_taehv(sd: Dict[str, np.ndarray], dtype=np.float32) -> Params:
    """torch taew2_1.pth state dict -> pytree (indices match the layouts).

    TGrow weights are sliced to the last output channels when temporal
    upscaling is reduced (patch_tgrow_layers, taehv.py:195-208) — full
    upscale here, so weights map 1:1.
    """
    def conv_p(prefix, bias):
        p = {"kernel": sd[f"{prefix}.weight"].transpose(2, 3, 1, 0).astype(
            dtype)}
        if bias:
            p["bias"] = sd[f"{prefix}.bias"].astype(dtype)
        return p

    def seq(prefix, layout):
        out = []
        for i, row in enumerate(layout):
            kind = row[0]
            name = f"{prefix}.{i}"
            if kind == "conv":
                out.append(conv_p(name, row[4]))
            elif kind == "mem":
                p = {"c0": conv_p(f"{name}.conv.0", True),
                     "c1": conv_p(f"{name}.conv.2", True),
                     "c2": conv_p(f"{name}.conv.4", True)}
                if f"{name}.skip.weight" in sd:
                    p["skip"] = conv_p(f"{name}.skip", False)
                out.append(p)
            elif kind in ("tpool", "tgrow"):
                out.append(conv_p(f"{name}.conv", False))
            else:
                out.append({})
        return out

    return jax.tree.map(jnp.asarray, {
        "encoder": seq("encoder", ENCODER_LAYOUT),
        "decoder": seq("decoder", DECODER_LAYOUT)})
