"""Mesh-sharded inference through the public pipelines (the 14B path).

VERDICT r1 item 1: `CausalFPSInferencePipeline` / `ChunkParallelPipeline`
must accept a `jax.sharding.Mesh` so 14B (dim 5120, 40 layers —
wan/configs/wan_t2v_14B.py:21-25) can run (fsdp, tp)-sharded with a
dp-split CFG pair; a sharded full window must equal the replicated window.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmpl_tpu.core.config import tiny_test_config
from mmpl_tpu.models import dit, vae
from mmpl_tpu.parallel.chunk_pipeline import ChunkParallelPipeline
from mmpl_tpu.parallel.mesh import make_mesh, make_stage_meshes
from mmpl_tpu.pipelines.fps_inference import CausalFPSInferencePipeline
from helpers import randomize_head


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_config()
    params = randomize_head(
        dit.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.float32))
    B, C, h, w = 1, 16, 4, 4
    noise = jax.random.normal(jax.random.PRNGKey(1), (B, 21, C, h, w))
    cond = jax.random.normal(jax.random.PRNGKey(2),
                             (B, cfg.text_len, cfg.text_dim))
    uncond = jax.random.normal(jax.random.PRNGKey(3),
                               (B, cfg.text_len, cfg.text_dim))
    return cfg, params, noise, cond, uncond


def _run_window(cfg, params, noise, cond, uncond, mesh):
    pipe = CausalFPSInferencePipeline(cfg, params, sampling_steps=2,
                                      mesh=mesh, dtype=jnp.float32)
    got = {}
    out = pipe.inference(noise, cond, uncond, rng=jax.random.PRNGKey(7),
                         on_anchor=lambda a: got.__setitem__("a", a))
    return np.asarray(out), np.asarray(got["a"])


def test_sharded_window_matches_replicated(setup):
    """Full 21-frame FPS window: (dp2, fsdp2, tp2) mesh == single device."""
    cfg, params, noise, cond, uncond = setup
    out_ref, anchors_ref = _run_window(cfg, params, noise, cond, uncond,
                                       mesh=None)
    mesh = make_mesh({"dp": 2, "fsdp": 2, "tp": 2})
    out_s, anchors_s = _run_window(cfg, params, noise, cond, uncond, mesh)
    assert out_s.shape == out_ref.shape
    np.testing.assert_allclose(out_s, out_ref, atol=5e-4, rtol=1e-4)
    np.testing.assert_allclose(anchors_s, anchors_ref, atol=5e-4, rtol=1e-4)


def test_sharded_window_with_initial_latent(setup):
    """Video-extension path (committed context frames) under the mesh."""
    cfg, params, noise, cond, uncond = setup
    init = jax.random.normal(jax.random.PRNGKey(9),
                             (1, 2, 16, 4, 4)) * 0.1
    pipe_r = CausalFPSInferencePipeline(cfg, params, sampling_steps=2,
                                        dtype=jnp.float32)
    out_ref = np.asarray(pipe_r.inference(noise, cond, uncond,
                                          initial_latent=init,
                                          rng=jax.random.PRNGKey(7)))
    mesh = make_mesh({"dp": 2, "fsdp": 2, "tp": 2})
    pipe_s = CausalFPSInferencePipeline(cfg, params, sampling_steps=2,
                                        mesh=mesh, dtype=jnp.float32)
    out_s = np.asarray(pipe_s.inference(noise, cond, uncond,
                                        initial_latent=init,
                                        rng=jax.random.PRNGKey(7)))
    np.testing.assert_allclose(out_s, out_ref, atol=5e-4, rtol=1e-4)
    # the context frames pass through bit-exactly
    np.testing.assert_allclose(out_s[:, :2], np.asarray(init))


def test_chunk_pipeline_over_stage_meshes(setup):
    """2 stages x (fsdp2, tp2) sub-meshes == 2 single-device stages."""
    cfg, params, noise, cond, uncond = setup
    vae_params = vae.init_vae_params(jax.random.PRNGKey(4), jnp.float32)
    noises = [noise, jax.random.normal(jax.random.PRNGKey(5), noise.shape)]

    ref_pipe = ChunkParallelPipeline(cfg, params, vae_params,
                                     devices=jax.devices()[:2],
                                     sampling_steps=2, dtype=jnp.float32)
    ref = ref_pipe.generate(noises, cond, uncond, rng=jax.random.PRNGKey(6))

    meshes = make_stage_meshes(2, {"dp": 1, "fsdp": 2, "tp": 2})
    mesh_pipe = ChunkParallelPipeline(cfg, params, vae_params,
                                      stage_meshes=meshes,
                                      sampling_steps=2, dtype=jnp.float32)
    got = mesh_pipe.generate(noises, cond, uncond, rng=jax.random.PRNGKey(6))

    assert len(got) == len(ref) == 2
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=5e-4,
                                   rtol=1e-4)


def test_sharded_fewstep_rolling_matches_replicated(setup):
    """The few-step distilled pipeline (the production-latency path) under
    the mesh: (dp2, fsdp2, tp2)-sharded params/cache/batch must reproduce
    the replicated output through warm-up AND rolling steady-state blocks
    (the 14B few-step serving path)."""
    from mmpl_tpu.pipelines.causal_inference import CausalInferencePipeline
    cfg, params, _, cond, _ = setup
    B, F, C, h, w = 2, 12, 16, 4, 4       # B=2: dp carries plain batch
    noise = jax.random.normal(jax.random.PRNGKey(11), (B, F, C, h, w))
    cond2 = jnp.concatenate([cond, cond], 0)

    def run(mesh):
        pipe = CausalInferencePipeline(
            cfg, params, denoising_step_list=(1000, 500),
            num_frame_per_block=3, max_attention_frames=6, mesh=mesh,
            dtype=jnp.float32)
        return np.asarray(pipe.inference(noise, cond2,
                                         rng=jax.random.PRNGKey(7)))

    ref = run(None)
    out = run(make_mesh({"dp": 2, "fsdp": 2, "tp": 2}))
    assert out.shape == ref.shape == (B, F, C, h, w)
    np.testing.assert_allclose(out, ref, atol=5e-4, rtol=1e-4)


def test_sharded_window_quantized_cache(setup):
    """int8 KV cache under the mesh: value leaves tp-shard on channels,
    scale planes dp-only; the sharded quantized window must match the
    single-device quantized window."""
    cfg, params, noise, cond, uncond = setup
    ref = CausalFPSInferencePipeline(
        cfg, params, sampling_steps=2, quantize_cache=True,
        dtype=jnp.float32).inference(noise, cond, uncond,
                                     rng=jax.random.PRNGKey(7))
    mesh = make_mesh({"dp": 2, "fsdp": 2, "tp": 2})
    pipe = CausalFPSInferencePipeline(cfg, params, sampling_steps=2,
                                      mesh=mesh, quantize_cache=True,
                                      dtype=jnp.float32)
    out = pipe.inference(noise, cond, uncond, rng=jax.random.PRNGKey(7))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)
