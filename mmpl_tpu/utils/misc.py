"""Misc helpers (utils/misc.py parity: set_seed, merge_dict_list)."""

from __future__ import annotations

import random
from typing import Dict, List

import numpy as np


def set_seed(seed: int) -> "jax.Array":
    """Seed Python/NumPy and return a JAX PRNG key.

    The reference also flips cuDNN determinism flags (utils/misc.py:6-23);
    JAX programs are deterministic by construction, so the key is the whole
    story here.
    """
    import jax
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def merge_dict_list(dict_list: List[Dict]) -> Dict:
    """Stack/concat a list of step dicts (utils/misc.py:25-39): scalars are
    kept from the first entry, arrays concatenated on axis 0."""
    if not dict_list:
        return {}
    out: Dict = {}
    for key in dict_list[0]:
        vals = [d[key] for d in dict_list]
        first = vals[0]
        if hasattr(first, "ndim") and getattr(first, "ndim", 0) > 0:
            import jax.numpy as jnp
            out[key] = jnp.concatenate([jnp.asarray(v) for v in vals],
                                       axis=0)
        else:
            out[key] = first
    return out
