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
    def __init__(self, params, decay: float = 0.999):
        self.decay = float(decay)
        # force a real copy: astype on an already-f32 leaf aliases the input,
        # which may later be donated into a train step
        self.shadow = jax.tree.map(
            lambda x: jnp.array(x, dtype=jnp.float32, copy=True), params)
        self._update = jax.jit(
            lambda shadow, params, d: jax.tree.map(
                lambda s, p: s * d + p.astype(jnp.float32) * (1.0 - d),
                shadow, params),
            donate_argnums=(0,))

    def update(self, params) -> None:
        self.shadow = self._update(self.shadow, params, self.decay)

    def state_dict(self):
        return self.shadow

    def copy_to(self, dtype=None):
        """Return EMA weights cast like the live params (EMA_FSDP.copy_to)."""
        if dtype is None:
            return self.shadow
        return jax.tree.map(lambda s: s.astype(dtype), self.shadow)
