"""Device-memory management: host offload + HBM introspection.

Analogue of the reference's GPU memory manager
(`MMPL_t2v/demo_utils/memory.py`): `DynamicSwapInstaller` streams torch
module weights CPU<->GPU layer by layer (:13-59) and
`get_cuda_free_memory_gb` / `move_model_to_device_with_memory_preservation`
(:72-133) budget what fits.  On TPU, GSPMD sharding removes the need for
layer-wise swapping on the hot path (a 14B model shards over the mesh
instead), but serving still parks idle models: `offload_params` moves a
parameter pytree into pinned host memory (TPU memory kind `pinned_host`,
falling back to host numpy copies on backends without memory kinds) and
`restore_params` brings it back to HBM, preserving shardings.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np


def _supports_memory_kind(x: jax.Array, kind: str) -> bool:
    try:
        s = x.sharding.with_memory_kind(kind)
        return s.memory_kind == kind
    except (ValueError, NotImplementedError, AttributeError):
        return False


def offload_params(params: Any) -> Any:
    """Move every array leaf off HBM: pinned host memory where the backend
    supports it (TPU), otherwise plain host numpy (CPU tests).  Shardings
    survive the round trip through `restore_params`."""
    def off(leaf):
        if not isinstance(leaf, jax.Array):
            return leaf
        if _supports_memory_kind(leaf, "pinned_host"):
            return jax.device_put(
                leaf, leaf.sharding.with_memory_kind("pinned_host"))
        return np.asarray(leaf)
    return jax.tree.map(off, params)


def restore_params(params: Any, shardings: Optional[Any] = None,
                   device=None) -> Any:
    """Inverse of `offload_params`.

    shardings: optional pytree of NamedShardings (e.g. from
    `parallel.mesh.dit_param_shardings`) for sharded restore; `device` puts
    everything on one device; with neither, pinned-host arrays return to
    their original device sharding and numpy leaves to the default device.
    """
    if shardings is not None:
        return jax.device_put(params, shardings)

    def back(leaf):
        if isinstance(leaf, jax.Array):
            if getattr(leaf.sharding, "memory_kind", None) == "pinned_host":
                return jax.device_put(
                    leaf, leaf.sharding.with_memory_kind("device"))
            return leaf if device is None else jax.device_put(leaf, device)
        return jax.device_put(leaf, device) if device is not None \
            else jax.device_put(leaf)
    return jax.tree.map(back, params)


def hbm_bytes_in_use(device=None) -> Optional[int]:
    """Live HBM usage of a device (get_cuda_free_memory_gb analogue,
    demo_utils/memory.py:72-83); None where the backend has no stats."""
    device = device or jax.devices()[0]
    try:
        stats = device.memory_stats()
    except Exception:
        return None
    if not stats:
        return None
    return stats.get("bytes_in_use")


def free_hbm_gb(device=None) -> Optional[float]:
    device = device or jax.devices()[0]
    try:
        stats = device.memory_stats()
        return (stats["bytes_limit"] - stats["bytes_in_use"]) / 2**30
    except Exception:
        return None
