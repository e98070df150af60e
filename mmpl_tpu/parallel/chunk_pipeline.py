"""Chunk-pipelined multi-window generation across TPU devices.

Re-design of the reference's multi-GPU pipelining
(`MMPL_t2v/Wan_fps_inference_parallel_4gpu_20s.py:180-261`): one pipeline
replica per GPU, a Python thread per chunk, and the *filesystem* as the
inter-GPU channel (producer `torch.save`s the anchors mid-generation;
consumer busy-polls `os.path.exists`, loads, deletes).

TPU design: no threads, no files.  Each pipeline stage is pinned to one
device; the host only *enqueues* jitted work (JAX dispatch is async), so the
per-device execution queues overlap naturally and the anchor handoff is a
device-to-device array transfer whose data dependency IS the
synchronisation.  Chunk k+1's context bridge starts as soon as chunk k's
anchor group finishes — the same overlap the reference gets from
threads+polling, with deterministic ordering and no races (SURVEY.md §5
"race detection": the file protocol's partial-read/stale-file races vanish
by construction).

The inter-chunk pixel bridge (…_4gpu_20s.py:191-205) is reproduced exactly
but on a causal-prefix: the reference decodes a full 21-frame masked window
and re-encodes an 81-frame mostly-empty video only to keep 2 latents; since
the VAE is temporally causal, decoding latent frames [0:5) and re-encoding
pixel frames [0:5) yields bit-identical results at ~4x less work.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp

from ..core.geometry import ChunkPlan, t2v_plan
from ..models import vae as vae_mod
from ..pipelines.fps_inference import CausalFPSInferencePipeline


# jit cache shared across stages/instances (keyed on param shapes)
_decode_u8 = jax.jit(vae_mod.decode_to_frames)


def make_bridge_fn(vae_params, num_handoff: int):
    """jitted: handoff latents [B, n, C, H, W] -> initial_latent [B, 2, C, H, W].

    Follows Wan_fps_inference_parallel_4gpu_20s.py:191-205:
      mask[0]=handoff[0]; mask[1]=handoff[-2]; mask[2:4]=handoff[-2:];
      decode -> pixels; keep pixel frames 8:13 as the head of a blank clip;
      re-encode; keep the first two latent frames.
    """

    def bridge(vp, handoff):
        B, n, C, H, W = handoff.shape
        mask = jnp.zeros((B, 5, C, H, W), handoff.dtype)
        mask = mask.at[:, 0].set(handoff[:, 0])
        mask = mask.at[:, 1].set(handoff[:, -2])
        mask = mask.at[:, 2].set(handoff[:, -2])
        mask = mask.at[:, 3].set(handoff[:, -1])
        # decode latent frames [0:5) -> pixel frames [0:17); causal prefix
        vid = vae_mod.decode(vp, mask.astype(jnp.float32))    # [-1, 1]
        vid01 = vid * 0.5 + 0.5
        clip = vid01[:, 8:13]                                 # 5 pixel frames
        clip = clip * 2.0 - 1.0
        lat = vae_mod.encode(vp, clip)                        # 2 latent frames
        return lat[:, :2]

    return jax.jit(bridge), vae_params


class ChunkParallelPipeline:
    """W chunks pipelined over S device-pinned pipeline stages."""

    def __init__(self, cfg, params, vae_params,
                 devices: Optional[Sequence] = None,
                 plan: Optional[ChunkPlan] = None,
                 stage_meshes: Optional[Sequence] = None,
                 **pipe_kwargs):
        """stage_meshes: optional list of jax.sharding.Mesh, one per pipeline
        stage.  Each stage's DiT params are (fsdp, tp)-sharded over its own
        sub-mesh — required for 14B, which does not fit one chip.  Without it
        each stage is one device with replicated params (the reference's
        one-pipeline-per-GPU layout)."""
        self.plan = plan or t2v_plan()
        self.stages = []
        if stage_meshes is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            self.devices = [d for m in stage_meshes
                            for d in m.devices.flatten()]
            for mesh in stage_meshes:
                repl = NamedSharding(mesh, P())
                vp = jax.device_put(vae_params, repl)
                pipe = CausalFPSInferencePipeline(
                    cfg, params, plan=self.plan, mesh=mesh, **pipe_kwargs)
                bridge_fn, _ = make_bridge_fn(vp,
                                              len(self.plan.handoff_frames))
                self.stages.append({"put": repl, "pipe": pipe, "vae": vp,
                                    "bridge": bridge_fn})
            return
        self.devices = list(devices if devices is not None else jax.devices())
        for dev in self.devices:
            p = jax.device_put(params, dev)
            vp = jax.device_put(vae_params, dev)
            pipe = CausalFPSInferencePipeline(cfg, p, plan=self.plan,
                                              **pipe_kwargs)
            bridge_fn, _ = make_bridge_fn(vp, len(self.plan.handoff_frames))
            self.stages.append({"put": dev, "pipe": pipe, "vae": vp,
                                "bridge": bridge_fn})

    def generate(self, noise_per_chunk: Sequence[jnp.ndarray],
                 cond_context: jnp.ndarray, uncond_context: jnp.ndarray,
                 rng: Optional[jax.Array] = None,
                 initial_latent: Optional[jnp.ndarray] = None
                 ) -> List[jnp.ndarray]:
        """Generate len(noise_per_chunk) chunks, round-robin over stages.

        Returns the list of denoised latent windows ([B, 21, C, H, W] each).
        The host never blocks between chunks: each stage's work is enqueued
        with the previous chunk's handoff as a data dependency, so chunk k+1
        runs concurrently with chunk k's fill groups.
        """
        import time
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        outputs: List[jnp.ndarray] = []
        handoff = None
        #: host-side dispatch timeline of the last generate() call — the
        #: overlap evidence (see tests/test_chunk_parallel.py): chunk k+1's
        #: whole program is enqueued long before chunk k finishes executing,
        #: so the per-device queues overlap by construction.
        self.dispatch_log: List[dict] = []
        for ci, noise in enumerate(noise_per_chunk):
            stage = self.stages[ci % len(self.stages)]
            dev = stage["put"]
            t_start = time.perf_counter()
            rng, sub = jax.random.split(rng)
            noise_d = jax.device_put(noise, dev)
            cond_d = jax.device_put(cond_context, dev)
            uncond_d = jax.device_put(uncond_context, dev)

            initial = None
            if ci == 0 and initial_latent is not None:
                # i2v: the first chunk starts from the encoded image
                initial = jax.device_put(initial_latent, dev)
            elif handoff is not None:
                # device-to-device anchor transfer + causal pixel bridge
                initial = stage["bridge"](stage["vae"],
                                          jax.device_put(handoff, dev))

            captured = {}
            out = stage["pipe"].inference(
                noise_d, cond_d, uncond_d, initial_latent=initial,
                rng=jax.device_put(sub, dev),
                on_anchor=lambda a: captured.__setitem__("anchors", a))
            outputs.append(out)
            handoff = captured.get("anchors")
            self.dispatch_log.append({
                "chunk": ci, "stage": ci % len(self.stages),
                "dispatch_start": t_start,
                "dispatch_end": time.perf_counter(),
                "phase_times": dict(stage["pipe"].phase_times),
            })
        return outputs

    def decode_chunks(self, chunks: Sequence[jnp.ndarray],
                      streaming: bool = True,
                      uint8: bool = False) -> List[jnp.ndarray]:
        """Decode each chunk on its producing stage (overlaps across devices).

        uint8=True returns display-ready [B, T, H, W, 3] uint8 frames via
        the production bf16 decode (vae.decode_to_frames) — clip/scale/
        transpose run on the producing device, so only the 4x-smaller
        uint8 buffer is ever materialised on the host.
        """
        vids = []
        for ci, lat in enumerate(chunks):
            stage = self.stages[ci % len(self.stages)]
            vp = stage["vae"]
            if uint8:
                vids.append(_decode_u8(vp, lat)[0])
                continue
            dec = vae_mod.decode_streaming if streaming else vae_mod.decode
            vids.append(dec(vp, lat.astype(jnp.float32)))
        return vids
