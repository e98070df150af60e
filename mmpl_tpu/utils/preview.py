"""Fast block-wise preview decode via the TAEHV tiny VAE.

The reference ships TAEHV (`MMPL_t2v/demo_utils/taehv.py:159`) as its fast
preview decoder but never wires it into a pipeline; here it is a
first-class streaming previewer: the few-step AR pipeline hands each
denoised block to `TaehvPreviewer`, which decodes it with carried
MemBlock state (O(block) memory, one compiled program per block shape)
and returns uint8 RGB frames — live preview frames while the full-quality
Wan VAE decode happens once at the end.

Latent space: the previewer consumes the pipeline's *diffusion-space*
latents directly — TAEHV's contract is "NTCHW latent tensor with
~Gaussian values" (taehv.py:223), which is the normalized space the
sampler works in.  Pass `denormalize=True` to invert the Wan per-channel
normalization first if a checkpoint trained on raw VAE latents is used.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..models import taehv as _taehv


class TaehvPreviewer:
    """Streaming per-block preview decoder.

    Call with each latent block [B, T, 16, h, w] in generation order;
    returns uint8 frames [B, T*4 (-3 on first block), 8h, 8w, 3].
    `reset()` between independent videos.
    """

    def __init__(self, taehv_params, denormalize: bool = False,
                 dtype=jnp.float32):
        self.params = jax.tree.map(lambda a: jnp.asarray(a, dtype),
                                   taehv_params)
        self.denormalize = denormalize
        self._state = None

        # clip -> scale -> uint8 -> NTHWC happens ON DEVICE: the preview
        # frames cross a slow link (the tunneled chip moves host<->device
        # bytes at ~MB/ms with ~25 ms floor), so transferring f32 NTCHW
        # and converting on the 1-core host cost ~21 s per 1.3B-geometry
        # block (measured, BENCH fewstep_preview_overhead_s); uint8 cuts
        # the bytes 4x and the host does nothing but np.asarray
        def _decode(p, z, state):
            video, new_state = _taehv.taehv_decode_streaming(p, z, state)
            u8 = jnp.clip(video, 0.0, 1.0) * 255.0
            u8 = jnp.round(u8).astype(jnp.uint8)
            return jnp.transpose(u8, (0, 1, 3, 4, 2)), new_state

        self._first = jax.jit(lambda p, z: _decode(p, z, None))
        self._next = jax.jit(_decode)

    def reset(self) -> None:
        self._state = None

    def __call__(self, latents: jnp.ndarray) -> np.ndarray:
        z = latents.astype(jnp.float32)
        if self.denormalize:
            from ..models.vae import LATENT_MEAN, LATENT_STD
            z = (z * jnp.asarray(LATENT_STD)[:, None, None]
                 + jnp.asarray(LATENT_MEAN)[:, None, None])
        if self._state is None:
            frames, self._state = self._first(self.params, z)
        else:
            frames, self._state = self._next(self.params, z, self._state)
        return np.asarray(frames)                      # [B,T,H,W,3] uint8


def make_preview_callback(previewer: TaehvPreviewer,
                          sink: Callable[[int, np.ndarray], None]
                          ) -> Callable:
    """Adapt a previewer to the pipelines' `on_block(start, latents)` hook:
    decodes each block and forwards (start_frame, uint8 frames) to `sink`
    (e.g. a file writer or an HTTP push)."""
    def on_block(start_frame: int, latents: jnp.ndarray) -> None:
        sink(start_frame, previewer(latents))
    return on_block
