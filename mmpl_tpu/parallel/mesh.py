"""Device mesh construction and sharding rules.

Replaces the reference's torch.distributed/NCCL substrate
(`MMPL_t2v/utils/distributed.py:75-89`, `wan/distributed/fsdp.py`) with
`jax.sharding.Mesh` + NamedSharding: FSDP == parameter sharding over an
`fsdp` axis, DP == batch sharding over `dp`, TP == head/ffn sharding over
`tp`, and the chunk pipeline uses its own `pipe` axis (see
`parallel/chunk_pipeline.py`).  XLA/GSPMD inserts the collectives the
reference issues manually through NCCL.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Dict[str, int]] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a mesh; default folds all devices into axes (dp, fsdp, tp).

    shape: ordered {axis: size} mapping; sizes must multiply to #devices.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        # default: fsdp-major layout
        fsdp = _largest_pow2_divisor(n, cap=8)
        dp = n // fsdp
        shape = {"dp": dp, "fsdp": fsdp, "tp": 1}
    sizes = tuple(shape.values())
    need = math.prod(sizes)
    assert need <= n, (shape, n)
    arr = np.asarray(devices[:need]).reshape(sizes)
    return Mesh(arr, tuple(shape.keys()))


def _largest_pow2_divisor(n: int, cap: int) -> int:
    d = 1
    while d * 2 <= cap and n % (d * 2) == 0:
        d *= 2
    return d


# ---------------------------------------------------------------------------
# Parameter sharding rules (FSDP + TP hybrid)
# ---------------------------------------------------------------------------

def _dit_param_spec(path: Tuple, leaf) -> P:
    """PartitionSpec for one DiT parameter leaf.

    Stacked block leaves have a leading layer axis (scanned, never sharded).
    Matmul kernels shard their contraction dim over `fsdp` (ZeRO-3-style
    gather per layer, wan/distributed/fsdp.py:10-33 equivalent) and their
    output dim over `tp` where it is a head/ffn dimension.
    """
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    is_block = "blocks" in names
    ndim = leaf.ndim

    if "kernel" in names and ndim >= 2:
        tp_ok = any(k in names for k in ("q", "k", "v", "fc1", "gate"))
        if is_block and ndim == 3:
            return P(None, "fsdp", "tp" if tp_ok else None)
        if ndim == 2:
            return P("fsdp", "tp" if tp_ok else None)
    if "bias" in names and ndim >= 1:
        tp_ok = any(k in names for k in ("q", "k", "v", "fc1", "gate"))
        if is_block and ndim == 2:
            return P(None, "tp" if tp_ok else None)
        return P("tp" if tp_ok else None)
    return P()  # replicate small leaves (norms, modulations)


def dit_param_shardings(mesh: Mesh, params):
    """NamedSharding pytree for DiT params under the (dp, fsdp, tp) mesh."""
    def spec(path, leaf):
        s = _dit_param_spec(path, leaf)
        # drop axes that don't divide the dim
        dims = []
        for i, ax in enumerate(s):
            if ax is None:
                dims.append(None)
            elif leaf.shape[i] % mesh.shape[ax] == 0:
                dims.append(ax)
            else:
                dims.append(None)
        return NamedSharding(mesh, P(*dims))

    return jax.tree_util.tree_map_with_path(spec, params)


def replicate(mesh: Mesh):
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int, axis: str = "dp"):
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


# ---------------------------------------------------------------------------
# Sharded inference (tensor parallelism over heads / ffn)
# ---------------------------------------------------------------------------

def shard_params_for_inference(params, mesh: Mesh):
    """Place DiT params with (fsdp, tp) NamedShardings for multi-chip
    inference (14B does not fit one v5e; sharding the contraction dim over
    `fsdp` and head/ffn dims over `tp` lets GSPMD insert the collectives
    the reference gets from torch FSDP + xDiT)."""
    return jax.device_put(params, dit_param_shardings(mesh, params))


def shard_kv_cache(cache, mesh: Mesh, tp_axis: str = "tp"):
    """KV cache [L, B, SLOTS, S, N, d]: shard the head dim over tp."""
    def spec(leaf):
        dims = [None] * leaf.ndim
        if leaf.ndim >= 2 and leaf.shape[-2] % mesh.shape[tp_axis] == 0:
            dims[-2] = tp_axis
        return NamedSharding(mesh, P(*dims))
    return jax.tree.map(lambda x: jax.device_put(x, spec(x)), cache)
