"""Mesh/sharding + sequence-parallel teacher path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from mmpl_tpu.core.config import tiny_test_config
from mmpl_tpu.models import dit
from mmpl_tpu.parallel.mesh import dit_param_shardings, make_mesh
from mmpl_tpu.parallel.sequence_parallel import usp_dit_forward
from helpers import randomize_head


def test_make_mesh_default():
    mesh = make_mesh()
    assert set(mesh.shape.keys()) == {"dp", "fsdp", "tp"}
    assert np.prod(list(mesh.shape.values())) == len(jax.devices())


def test_param_shardings_divisibility():
    cfg = tiny_test_config()
    params = dit.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    mesh = make_mesh({"dp": 2, "fsdp": 2, "tp": 2})
    sh = dit_param_shardings(mesh, params)
    # every sharding must evenly divide its leaf
    def check(leaf, s):
        spec = s.spec
        for i, ax in enumerate(spec):
            if ax is not None:
                assert leaf.shape[i] % mesh.shape[ax] == 0
    jax.tree.map(check, params, sh)


def test_usp_forward_matches_single_device():
    cfg = tiny_test_config()
    params = randomize_head(
        dit.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.float32))
    mesh = make_mesh({"sp": 2})
    B, F, C, H, W = 1, 3, 16, 8, 8   # L = 3*16 = 48, sp=2 -> 24/shard
    lat = jax.random.normal(jax.random.PRNGKey(1), (B, F, C, H, W))
    t = jnp.asarray([500.0])
    ctx = jax.random.normal(jax.random.PRNGKey(2),
                            (B, cfg.text_len, cfg.text_dim))

    want = np.asarray(dit.dit_forward(params, cfg, lat, t, ctx))
    got = np.asarray(usp_dit_forward(params, cfg, lat, t, ctx, mesh))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_sharded_inference_matches_single_device():
    """FPS group forward with (fsdp, tp)-sharded params + tp-sharded KV
    cache must reproduce the single-device result (GSPMD collectives)."""
    from mmpl_tpu.core.geometry import t2v_plan
    from mmpl_tpu.models.fps_dit import fps_forward_group, init_kv_cache
    from mmpl_tpu.parallel.mesh import (shard_kv_cache,
                                        shard_params_for_inference)

    cfg = tiny_test_config()
    params = randomize_head(
        dit.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.float32))
    plan = t2v_plan()
    group = plan.groups[1]
    B, C, H, W = 1, 16, 4, 4
    S = (H // 2) * (W // 2)
    ctx = jax.random.normal(jax.random.PRNGKey(1),
                            (B, cfg.text_len, cfg.text_dim))
    emb = dit.embed_text(params, ctx)
    ctx_kv = dit.precompute_context_kv(params, cfg, emb)
    lat = jax.random.normal(jax.random.PRNGKey(2),
                            (B, group.num_frames, C, H, W))
    t = jnp.full((B, group.num_frames), 500.0)
    cache = init_kv_cache(cfg, B, S, dtype=jnp.float32)

    flow_ref, cache_ref = jax.jit(
        lambda p, c: fps_forward_group(p, cfg, lat, t, ctx_kv, c, group))(
            params, cache)

    mesh = make_mesh({"dp": 1, "fsdp": 2, "tp": 2})
    params_s = shard_params_for_inference(params, mesh)
    cache_s = shard_kv_cache(init_kv_cache(cfg, B, S, dtype=jnp.float32),
                             mesh)
    ctx_kv_s = dit.precompute_context_kv(params_s, cfg, emb)
    flow_s, cache_s2 = jax.jit(
        lambda p, c: fps_forward_group(p, cfg, lat, t, ctx_kv_s, c, group))(
            params_s, cache_s)

    np.testing.assert_allclose(np.asarray(flow_s), np.asarray(flow_ref),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(cache_s2["k"]),
                               np.asarray(cache_ref["k"]), atol=2e-4,
                               rtol=1e-4)


def test_ring_attention_matches_dense():
    """Ring-only sp=4 with only 2 heads (more shards than heads — the case
    Ulysses alone cannot serve, VERDICT r1 item 8)."""
    from functools import partial
    from jax.sharding import PartitionSpec as P
    from jax import shard_map
    from mmpl_tpu.ops.attention import dense_attention
    from mmpl_tpu.parallel.sequence_parallel import ring_attention

    B, L, N, D = 2, 32, 2, 16
    q = jax.random.normal(jax.random.PRNGKey(0), (B, L, N, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, L, N, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, L, N, D))
    mesh = make_mesh({"ring": 4})
    ring = shard_map(partial(ring_attention, axis_name="ring"), mesh=mesh,
                     in_specs=(P(None, "ring"),) * 3,
                     out_specs=P(None, "ring"))
    got = np.asarray(ring(q, k, v))
    want = np.asarray(dense_attention(q, k, v))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)

    # differentiable (the teacher trains under USP)
    g = jax.grad(lambda qq: jnp.sum(ring(qq, k, v) ** 2))(q)
    gd = jax.grad(lambda qq: jnp.sum(dense_attention(qq, k, v) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gd), atol=2e-4,
                               rtol=1e-4)


def test_usp_ulysses_plus_ring_forward():
    """Full USP: heads over sp=2, sequence ring over ring=2; sp_total=4 > a
    2-head model's head count; must match the single-device forward."""
    import copy
    cfg = copy.deepcopy(tiny_test_config())
    cfg.num_heads = 2
    params = randomize_head(
        dit.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.float32))
    mesh = make_mesh({"sp": 2, "ring": 2})
    B, F, C, H, W = 1, 4, 16, 8, 8   # L = 64, sp*ring = 4 -> 16/shard
    lat = jax.random.normal(jax.random.PRNGKey(1), (B, F, C, H, W))
    t = jnp.asarray([500.0])
    ctx = jax.random.normal(jax.random.PRNGKey(2),
                            (B, cfg.text_len, cfg.text_dim))

    want = np.asarray(dit.dit_forward(params, cfg, lat, t, ctx))
    got = np.asarray(usp_dit_forward(params, cfg, lat, t, ctx, mesh,
                                     sp_axis="sp", ring_axis="ring"))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_init_distributed_flag_path(monkeypatch):
    """Multi-host surface (utils/distributed.py:75-89 analogue): no-op
    single-process by default; flags/env vars reach
    jax.distributed.initialize."""
    import jax
    from mmpl_tpu.parallel.mesh import init_distributed
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("NUM_PROCESSES", raising=False)
    monkeypatch.delenv("PROCESS_ID", raising=False)
    assert init_distributed() is False        # single-process no-op

    calls = {}

    def fake_init(coordinator_address=None, num_processes=None,
                  process_id=None):
        calls.update(coordinator_address=coordinator_address,
                     num_processes=num_processes, process_id=process_id)

    monkeypatch.setattr(jax.distributed, "initialize", fake_init)
    assert init_distributed("host:1234", 8, 3) is True
    assert calls == {"coordinator_address": "host:1234",
                     "num_processes": 8, "process_id": 3}
    calls.clear()
    monkeypatch.setenv("COORDINATOR_ADDRESS", "envhost:99")
    monkeypatch.setenv("NUM_PROCESSES", "2")
    monkeypatch.setenv("PROCESS_ID", "1")
    assert init_distributed() is True
    assert calls == {"coordinator_address": "envhost:99",
                     "num_processes": 2, "process_id": 1}


def test_ring_flash_attention_fwd_and_grads_match_dense():
    """Differentiable ring FLASH attention (VERDICT r3 item 4): the
    ring-level custom VJP (global-lse per-chunk flash backward, dk/dv
    accumulators riding the ring) matches the dense ring in both the
    forward and all three input gradients.  Pallas runs in interpret mode
    on the CPU mesh."""
    from functools import partial
    from jax.sharding import PartitionSpec as P
    from jax import shard_map
    from mmpl_tpu.ops.attention import dense_attention
    from mmpl_tpu.parallel.sequence_parallel import ring_attention

    B, L, N, D = 1, 512, 2, 128          # lane-aligned head dim
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    q = jax.random.normal(ks[0], (B, L, N, D))
    k = jax.random.normal(ks[1], (B, L, N, D))
    v = jax.random.normal(ks[2], (B, L, N, D))
    mesh = make_mesh({"ring": 4})
    ring = shard_map(partial(ring_attention, axis_name="ring",
                             impl="flash"), mesh=mesh,
                     in_specs=(P(None, "ring"),) * 3,
                     out_specs=P(None, "ring"),
                     check_vma=False)     # pallas_call can't declare vma
    got = np.asarray(ring(q, k, v))
    want = np.asarray(dense_attention(q, k, v))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)

    def loss_ring(q, k, v):
        return jnp.sum(ring(q, k, v) ** 2)

    def loss_dense(q, k, v):
        return jnp.sum(dense_attention(q, k, v) ** 2)

    g = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g, gd):
        a, b = np.asarray(a), np.asarray(b)
        rel = np.linalg.norm(a - b) / np.linalg.norm(b)
        assert rel < 1e-2, (name, rel)
        np.testing.assert_allclose(a, b, atol=5e-4, rtol=5e-3,
                                   err_msg=f"d{name}")


@pytest.mark.parametrize("rolling", [False, True],
                         ids=["windowed", "rolling"])
def test_sharded_dmd_step_matches_replicated(rolling):
    """Full-depth distillation is the sharded path (PERF.md): a DMD
    generator loss+grad over (dp, fsdp, tp)-sharded models must equal
    the replicated computation.  The rolling variant runs a 12-frame
    rollout through the steady-state scan (evict-rotate cache + traced
    RoPE) sliced to a 6-frame score window — the long-rollout training
    path must shard identically."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from mmpl_tpu.schedulers.flow_match import FlowMatchScheduler
    from mmpl_tpu.training.distillation import (DistillationConfig,
                                                Distiller)
    from mmpl_tpu.training.self_forcing import SelfForcingRollout
    cfg = tiny_test_config()
    sch = FlowMatchScheduler(shift=8.0, sigma_min=0.0, extra_one_step=True)
    sch.set_timesteps(1000, training=True)
    ro = SelfForcingRollout(cfg, sch, num_frame_per_block=3,
                            num_max_frames=6, grad_frame_window=6,
                            rolling=rolling)
    dist = Distiller(cfg, DistillationConfig(
        timestep_shift=8.0,
        window_frames=6 if rolling else None), ro, sch)
    models = {
        k: randomize_head(
            dit.init_dit_params(jax.random.PRNGKey(i), cfg, jnp.float32))
        for i, k in enumerate(("generator", "fake_score", "real_score"))
    }
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(5), 3)
    ctx = jax.random.normal(k1, (2, cfg.text_len, cfg.text_dim))
    batch = {
        "noise": jax.random.normal(k2, (2, 12 if rolling else 6,
                                        16, 8, 8)),
        "ctx_kv": dit.precompute_context_kv(
            models["generator"], cfg,
            dit.embed_text(models["generator"], ctx)),
        "context": ctx,
        "uncond_context": jnp.zeros_like(ctx),
    }

    def loss_and_grad(models, batch):
        return jax.value_and_grad(lambda g: dist.dmd_generator_loss(
            {**models, "generator": g}, batch, k3)[0])(models["generator"])

    loss_r, grad_r = jax.jit(loss_and_grad)(models, batch)

    mesh = make_mesh({"dp": 2, "fsdp": 2, "tp": 2})
    models_s = {k: jax.device_put(v, dit_param_shardings(mesh, v))
                for k, v in models.items()}
    dp = NamedSharding(mesh, P("dp"))
    batch_s = {k: (jax.device_put(v, dp)
                   if isinstance(v, jnp.ndarray) and v.shape[0] == 2
                   else jax.device_put(v, NamedSharding(mesh, P())))
               for k, v in batch.items()}
    loss_s, grad_s = jax.jit(loss_and_grad)(models_s, batch_s)

    assert float(loss_s) == pytest.approx(float(loss_r), rel=1e-5)
    for a, b in zip(jax.tree_util.tree_flatten(grad_r)[0],
                    jax.tree_util.tree_flatten(grad_s)[0]):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-5, rtol=1e-3)
