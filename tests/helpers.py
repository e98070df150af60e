"""Shared test utilities."""

import jax
import jax.numpy as jnp


def randomize_head(params, key=None):
    """Give the DiT output head non-zero weights.

    The reference zero-initialises `head.head` (model.py:923), which makes a
    random-init model's flow prediction identically zero — fine for training
    from scratch, but it would make flow-path comparisons in tests vacuous.
    """
    key = key if key is not None else jax.random.PRNGKey(99)
    k = params["head"]["head"]["kernel"]
    params["head"]["head"]["kernel"] = (
        jax.random.normal(key, k.shape, jnp.float32) * 0.05).astype(k.dtype)
    return params
