"""Exponential moving average of a parameter pytree.

Replaces `EMA_FSDP` (utils/distributed.py:91-125): the reference must
`summon_full_params` to update a shadow copy under torch FSDP; with JAX
sharded pytrees the EMA is just another pytree with the same NamedShardings,
updated by a fused jitted multiply-add.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class EmaParams:
    def __init__(self, params, decay: float = 0.999,
                 offload: bool = False):
        self.decay = float(decay)
        streamed = False
        if offload:
            # park the fp32 shadow in pinned host memory (5.2 GB at 1.3B):
            # the multiply-add streams leaf-by-leaf through HBM instead of
            # keeping a third full model resident.  Born on host (one
            # jitted cast+copy) so the fp32 copy never sits in HBM.
            from mmpl_tpu.utils.memory import (
                stream_to_host, supports_host_compute_offload)
            if supports_host_compute_offload():
                self.shadow = jax.jit(lambda p: stream_to_host(jax.tree.map(
                    lambda x: x.astype(jnp.float32), p)))(params)
                streamed = True
        if not streamed:
            # force a real copy: astype on an already-f32 leaf aliases the
            # input, which may later be donated into a train step
            self.shadow = jax.tree.map(
                lambda x: jnp.array(x, dtype=jnp.float32, copy=True), params)

        def upd(shadow, params, d):
            if streamed:
                from mmpl_tpu.utils.memory import (stream_to_device,
                                                   stream_to_host)
                shadow = stream_to_device(shadow)
            new = jax.tree.map(
                lambda s, p: s * d + p.astype(jnp.float32) * (1.0 - d),
                shadow, params)
            return stream_to_host(new) if streamed else new
        # never donate host-parked buffers: donation aliases by shape
        # across memory spaces (a donated host shadow buffer could back a
        # device output) -> "moved to host" compile aborts on TPU
        self._update = jax.jit(
            upd, donate_argnums=() if streamed else (0,))
        self._offloaded = streamed

    def update(self, params) -> None:
        self.shadow = self._update(self.shadow, params, self.decay)

    def state_dict(self):
        return self.shadow

    def copy_to(self, dtype=None):
        """Return EMA weights cast like the live params (EMA_FSDP.copy_to).
        Host-offloaded shadows are restored to device first (eager compute
        on pinned-host operands is not allowed)."""
        shadow = self.shadow
        if self._offloaded:
            from mmpl_tpu.utils.memory import restore_params
            shadow = restore_params(shadow)
        if dtype is None:
            return shadow
        return jax.tree.map(lambda s: s.astype(dtype), shadow)
