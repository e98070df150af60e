"""Profiling: phase timers + jax.profiler trace capture.

Replaces the reference's CUDA-event instrumentation
(`pipeline/causal_inference.py:98-110,237-271`) and free-memory probes
(`demo_utils/memory.py:72-83`).  `PhaseTimer` reproduces the reference's
init / diffusion / per-block / VAE breakdown report format; `trace()`
wraps `jax.profiler` for perfetto-compatible traces.
"""

from __future__ import annotations

import contextlib
import sys
import time
from typing import Dict, List

import jax
import jax.numpy as jnp


def _sync(x=None):
    """Device sync that works on the experimental axon platform (where
    block_until_ready can return early): force a tiny host transfer."""
    if x is not None:
        jax.block_until_ready(x)
        leaves = jax.tree.leaves(x)
        if leaves:
            jnp.asarray(leaves[0]).ravel()[:1].block_until_ready()
            float(jnp.sum(leaves[0].ravel()[:1]))


class PhaseTimer:
    """Named phase timing with the reference's report format
    (causal_inference.py:258-271)."""

    def __init__(self):
        self.phases: Dict[str, float] = {}
        self.blocks: List[float] = []

    @contextlib.contextmanager
    def phase(self, name: str, result=None):
        t0 = time.perf_counter()
        yield
        self.phases[name] = self.phases.get(name, 0.0) + \
            (time.perf_counter() - t0)

    def record_block(self, seconds: float) -> None:
        self.blocks.append(seconds)

    def report(self, file=None) -> str:
        file = file if file is not None else sys.stderr  # resolve at call
        total = sum(self.phases.values())
        lines = ["Profiling results:"]
        for name, t in self.phases.items():
            ms = t * 1e3
            pct = 100 * t / total if total else 0.0
            lines.append(f"  - {name} time: {ms:.2f} ms ({pct:.2f}%)")
            if name.lower().startswith("diffusion") and self.blocks:
                for i, bt in enumerate(self.blocks):
                    bpct = 100 * bt / t if t else 0.0
                    lines.append(
                        f"    - Block {i} generation time: "
                        f"{bt * 1e3:.2f} ms ({bpct:.2f}% of diffusion)")
        lines.append(f"  - Total time: {total * 1e3:.2f} ms")
        out = "\n".join(lines)
        print(out, file=file, flush=True)
        return out


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/mmpl_tpu_trace"):
    """Capture a jax.profiler trace (open with Perfetto/TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> Dict[str, float]:
    """Free/used HBM in GB (demo_utils/memory.py:72-83 equivalent)."""
    dev = jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    if not stats:
        return {}
    gb = 1024 ** 3
    return {
        "bytes_in_use_gb": stats.get("bytes_in_use", 0) / gb,
        "bytes_limit_gb": stats.get("bytes_limit", 0) / gb,
        "peak_bytes_in_use_gb": stats.get("peak_bytes_in_use", 0) / gb,
    }
